"""Normalization golden table for the purell FlagsUnsafeGreedy port.

The first case is the reference's own golden
(/root/reference/lib/sitemap_test.go:52-76). The rest pin down each
flag's behavior so regressions are caught per-flag.
"""

import pytest

from walk_ray.functions.canon import (
    normalize_url,
    resolve_and_normalize,
    surt_key,
    url_host,
)

GOLDEN = [
    # the reference golden: lowercase + strip www + force http + drop trailing slash
    ("https://www.a.com", "http://a.com"),
    ("https://www.a.com/a", "http://a.com/a"),
    ("https://www.a.com/", "http://a.com"),
    # scheme/host case
    ("HTTP://WWW.EXAMPLE.COM/Path", "http://example.com/Path"),
    # default ports (evaluated before force-http)
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "http://a.com/x"),
    ("https://a.com:80/x", "http://a.com:80/x"),  # 80 not default for https
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # fragments
    ("http://a.com/x#frag", "http://a.com/x"),
    ("http://a.com/#frag", "http://a.com"),
    # duplicate slashes
    ("http://a.com//x///y", "http://a.com/x/y"),
    # dot segments
    ("http://a.com/a/b/../c", "http://a.com/a/c"),
    ("http://a.com/a/./b", "http://a.com/a/b"),
    ("http://a.com/../a", "http://a.com/a"),
    # directory index
    ("http://a.com/sub/index.html", "http://a.com/sub"),
    ("http://a.com/index.html", "http://a.com"),
    ("http://a.com/default.aspx", "http://a.com"),
    ("http://a.com/myindex.html", "http://a.com/myindex.html"),
    # query sort
    ("http://a.com/x?b=2&a=1", "http://a.com/x?a=1&b=2"),
    ("http://a.com/x?a=2&a=1", "http://a.com/x?a=1&a=2"),
    ("http://a.com/x?", "http://a.com/x"),
    # www only stripped as prefix
    ("http://www.www2.com", "http://www2.com"),
    ("http://notwww.a.com", "http://notwww.a.com"),
    # escapes: uppercase hex, decode unnecessary
    ("http://a.com/%7euser", "http://a.com/~user"),
    ("http://a.com/a%2Fb c", "http://a.com/a/b%20c"),
    # combined
    ("HTTPS://WWW.A.com:443//x/./y/../z/index.html?b=1&a=2#f",
     "http://a.com/x/z?a=2&b=1"),
]


@pytest.mark.parametrize("raw,expect", GOLDEN)
def test_normalize_golden(raw, expect):
    assert normalize_url(raw) == expect


def test_resolve_and_normalize():
    assert resolve_and_normalize("http://a.com/sub/page.html", "other.html") == \
        "http://a.com/sub/other.html"
    assert resolve_and_normalize("http://a.com/sub/", "/abs") == "http://a.com/abs"
    assert resolve_and_normalize("http://a.com/x", "https://www.b.com/") == "http://b.com"
    assert resolve_and_normalize("http://a.com/x", "#frag") == "http://a.com/x"
    assert resolve_and_normalize("http://a.com/x", "../up") == "http://a.com/up"


def test_url_host():
    assert url_host("http://A.com:8080/x") == "a.com"
    assert url_host("http://u:p@b.com/x") == "b.com"
    assert url_host(":::") == ""


def test_surt_key():
    assert surt_key("http://a.b.com/x?q=1") == "com,b,a)/x?q=1"
    assert surt_key("http://a.com") == "com,a)"
    # SURT ordering groups hosts by registered domain
    keys = sorted([surt_key("http://z.a.com/p"), surt_key("http://a.com/q")])
    assert keys == ["com,a)/q", "com,a,z)/p"]


def test_idempotent():
    for raw, expect in GOLDEN:
        # purell itself is non-idempotent on 'https with explicit :80'
        # (after force-http, :80 becomes the default port) — skip it.
        if expect == "http://a.com:80/x":
            continue
        assert normalize_url(expect) == expect, raw


def test_canonical_fast_path_is_fixed_point():
    """Any URL the fast-path detector accepts must be a fixed point of
    the full (slow) normalization — property-checked over generated
    canonical-looking URLs and the golden table inputs."""
    import random
    import string

    import walk_ray.functions.canon as c

    def rand_host(rng):
        return ".".join(
            ("".join(rng.choices(string.ascii_lowercase + "0123456789-", k=rng.randint(1, 8)))
             .strip("-") or "a")
            for _ in range(rng.randint(2, 4))
        )

    def rand_seg(rng):
        base = "".join(rng.choices(string.ascii_letters + string.digits + "_~-",
                                   k=rng.randint(1, 8)))
        if rng.random() < 0.5:
            base += "." + "".join(rng.choices(string.ascii_letters + string.digits,
                                              k=rng.randint(1, 5)))
        return base

    rng = random.Random(7)
    orig = c._is_canonical
    try:
        for _ in range(5000):
            u = "http://" + rand_host(rng) + "".join(
                "/" + rand_seg(rng) for _ in range(rng.randint(0, 4))
            )
            if not orig(u):
                continue
            c._is_canonical = lambda s: False  # force the slow path
            c.normalize_url.cache_clear()
            assert c.normalize_url(u) == u, u
            c._is_canonical = orig
    finally:
        c._is_canonical = orig
        c.normalize_url.cache_clear()


def test_canonical_fast_path_rejects_non_fixed_points():
    from walk_ray.functions.canon import _is_canonical

    for u in [
        "https://a.com",          # force-http applies
        "http://www.a.com",       # www strip
        "http://a.com/",          # trailing slash
        "http://a.com//x",        # dup slashes
        "http://a.com/./x",       # dot segment
        "http://a.com/index.html",  # directory index
        "http://a.com:80/x",      # default port
        "http://A.com/x",         # case
        "http://a.com/x?b=1",     # query
        "http://a.com/x#f",       # fragment
        "http://a.com/%41",       # escapes
        "http://u@a.com/x",       # userinfo
    ]:
        assert not _is_canonical(u), u
