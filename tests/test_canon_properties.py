"""Property-based robustness for the URL kernels (hypothesis):
the canonicalizer is on the hot path of every crawl stage and must be
total (never raise) and idempotent on its own output."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from walk_ray.functions.canon import (
    normalize_url,
    resolve_and_normalize,
    surt_key,
    url_host,
)
from walk_ray.sources.pages import request_key

_host_label = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8)
_path_seg = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~%", min_size=0, max_size=10
)


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=3)))
    www = draw(st.sampled_from(["", "www."]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_path_seg, min_size=0, max_size=4))
    path = "/" + "/".join(segs) if segs else draw(st.sampled_from(["", "/"]))
    query = draw(st.sampled_from(["", "?b=2&a=1", "?x=%20y", "?k"]))
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"{scheme}://{www}{host}{port}{path}{query}{frag}"


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=64))
def test_total_on_arbitrary_text(s):
    # never raises, always returns a string
    assert isinstance(normalize_url(s), str)
    assert isinstance(url_host(s), str)
    assert isinstance(surt_key(s), str)
    assert isinstance(request_key(s), str)
    r = resolve_and_normalize("http://base.test/x", s)
    assert r is None or isinstance(r, str)


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_idempotent_on_wellformed(u):
    once = normalize_url(u)
    # purell's own non-idempotence: https + explicit :80 becomes the
    # http default port on the second pass — excluded, like purell.
    if ":80" in once:
        return
    assert normalize_url(once) == once


@settings(max_examples=200, deadline=None)
@given(http_urls())
def test_normalized_invariants(u):
    n = normalize_url(u)
    assert not n.startswith("https://")  # force-http
    assert "#" not in n  # fragment dropped
    host = url_host(n)
    assert not host.startswith("www.")
    assert host == host.lower()
    assert not n.endswith("/") or n == "/"  # trailing slash dropped


@settings(max_examples=200, deadline=None)
@given(http_urls(), http_urls())
def test_request_key_scheme_insensitive(a, b):
    # request keys ignore scheme: http vs https of the same URL hit
    # the same page (HTTP-serving emulation)
    swapped = a.replace("https://", "http://") if a.lower().startswith("https") \
        else a.replace("http://", "https://", 1)
    assert request_key(a) == request_key(swapped)
