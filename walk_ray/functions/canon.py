"""URL canonicalization matching walk's ``NormalizeURL``.

The reference normalizes with purell's ``FlagsUnsafeGreedy``
(``/root/reference/lib/resource.go:136-148``). This module is a
from-scratch Python re-derivation of that flag set's observable
behavior (anchored on the golden in
``/root/reference/lib/sitemap_test.go:52-76``: ``https://www.a.com``
-> ``http://a.com``), NOT a translation of purell's Go source.

Flag set reproduced (purell ``FlagsUnsafeGreedy``), in application
order:

1.  lowercase scheme
2.  lowercase host
3.  remove default port (``:80`` for http / ``:443`` for https,
    evaluated against the *current* scheme — i.e. BEFORE force-http)
4.  remove directory index  (``(^|/)(default|index).ext`` at path end)
5.  remove dot segments     (RFC 3986 ``remove_dot_segments``)
6.  remove fragment
7.  force http              (https -> http)
8.  remove duplicate slashes in path
9.  remove leading ``www.`` from host
10. sort query              (keys sorted, values sorted per key;
    keys emitted raw, values query-escaped)
11. remove empty port separator (host ending in ``:``)
12. remove trailing slash   (single trailing ``/`` of path)
13. re-escape per RFC 3986 (uppercase hex, decode unnecessary
    escapes, encode necessary ones)

All functions are pure; the vectorized entry point
:func:`normalize_url_array` is the one used inside ``map_batches``.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import quote, unquote, urlsplit

__all__ = [
    "normalize_url",
    "normalize_url_array",
    "resolve_and_normalize",
    "url_host",
    "surt_key",
]

_RX_DIR_INDEX = re.compile(r"(^|/)((?:default|index)\.\w{1,4})$")
_RX_DUP_SLASHES = re.compile(r"/{2,}")
_RX_WWW = re.compile(r"^www\.")

# RFC 3986 unreserved + chars urlesc leaves raw in a path component.
_PATH_SAFE = "-._~:@!$&'()*+,;=/[]"
_QUERY_VALUE_SAFE = "-._~"  # Go QueryEscape escapes everything else (space -> +)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    output: list[str] = []
    # Split retaining structure: walk segment by segment.
    segments = path.split("/")
    # Leading '' marks absolute path.
    absolute = path.startswith("/")
    out: list[str] = []
    for i, seg in enumerate(segments):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    # Re-add trailing slash when the final segment was . or ..
    if segments and segments[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if absolute and not res.startswith("/"):
        res = "/" + res
    return res


def _escape_path(path: str) -> str:
    # Decode then re-encode: yields uppercase escapes, decodes
    # unnecessary ones, encodes necessary ones (purell FlagsSafe trio).
    try:
        decoded = unquote(path, errors="strict")
    except Exception:  # malformed escapes: leave as-is
        decoded = path
    return quote(decoded, safe=_PATH_SAFE)


def _sort_query(query: str) -> str:
    """purell sortQuery: sorted keys, sorted values; raw keys,
    query-escaped values, joined with ``&`` / ``=``."""
    if not query:
        return ""
    pairs: dict[str, list[str]] = {}
    for part in query.split("&"):
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
        else:
            k, v = part, ""
        k = unquote(k)
        v = unquote(v.replace("+", " "))
        pairs.setdefault(k, []).append(v)
    out = []
    for k in sorted(pairs):
        for v in sorted(pairs[k]):
            out.append(f"{k}={quote(v, safe=_QUERY_VALUE_SAFE).replace('%20', '+')}")
    return "&".join(out)


# Conservative already-canonical detector: any match is provably a
# fixed point of the full normalization (http scheme, bare lowercase
# dotted host without www./port/userinfo, dot-separated safe path
# segments — never "."/"..", no trailing slash, no query/fragment/%),
# pinned by a hypothesis property test against the slow path.
_RX_CANONICAL = re.compile(
    r"^http://(?!www\.)[a-z0-9-]+(?:\.[a-z0-9-]+)+"
    r"(?:/[A-Za-z0-9_~-]+(?:\.[A-Za-z0-9_~-]+)*)*$"
)
_RX_DIR_INDEX_END = re.compile(r"/(?:default|index)\.\w{1,4}$")


def _is_canonical(urlstr: str) -> bool:
    return bool(
        _RX_CANONICAL.match(urlstr) and not _RX_DIR_INDEX_END.search(urlstr)
    )


@lru_cache(maxsize=1 << 18)
def normalize_url(urlstr: str) -> str:
    """Canonicalize one URL under the purell FlagsUnsafeGreedy rules.

    Returns the input unchanged when it cannot be parsed (matching the
    reference's behavior of skipping unparseable links).

    Memoized (pure function; link targets repeat heavily within a
    crawl, so the cache turns the hot path into a dict hit); inputs
    the detector can prove canonical skip the parse entirely.
    """
    if _is_canonical(urlstr):
        return urlstr
    try:
        parts = urlsplit(urlstr)
    except ValueError:
        return urlstr

    scheme = parts.scheme.lower()
    netloc = parts.netloc
    # Split host/port/userinfo ourselves so edge cases stay explicit.
    userinfo = ""
    hostport = netloc
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)
    host = hostport.lower()
    path = parts.path
    query = parts.query

    # 3. remove default port (against the *current* scheme)
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]

    # 4. remove directory index
    path = _RX_DIR_INDEX.sub(r"\1", path)
    # 5. remove dot segments
    path = _remove_dot_segments(path)
    # 6. fragment dropped (never reassembled)
    # 7. force http
    if scheme == "https":
        scheme = "http"
    # 8. remove duplicate slashes
    path = _RX_DUP_SLASHES.sub("/", path)
    # 9. remove www.
    host = _RX_WWW.sub("", host)
    # 10. sort query
    query = _sort_query(query)
    # 11. remove empty port separator
    if host.endswith(":"):
        host = host[:-1]
    # 12. remove trailing slash
    if path.endswith("/"):
        path = path[:-1]

    # 13. reassemble + escape
    netloc_out = f"{userinfo}@{host}" if userinfo else host
    out = []
    if scheme:
        out.append(scheme + ":")
    if netloc_out or scheme:
        out.append("//" + netloc_out)
    if path and not path.startswith("/") and netloc_out:
        out.append("/")
    out.append(_escape_path(path))
    if query:
        out.append("?" + query)
    return "".join(out)


@lru_cache(maxsize=1 << 18)
def resolve_and_normalize(base_url: str, href: str) -> str | None:
    """Resolve ``href`` against ``base_url`` (RFC 3986 reference
    resolution, as goquery/walk do with ``pURL.Parse(val)``,
    ``/root/reference/lib/resource.go:169-176``) then normalize.

    Returns ``None`` for unresolvable hrefs. Memoized like
    :func:`normalize_url`.
    """
    from urllib.parse import urljoin

    if _is_canonical(href):  # absolute + already canonical: no work
        return href
    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        return None
    if not absolute:
        return None
    return normalize_url(absolute)


def url_host(urlstr: str) -> str:
    """Host (without port) of a URL; '' when unparseable."""
    try:
        netloc = urlsplit(urlstr).netloc
    except ValueError:
        return ""
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if ":" in netloc:
        netloc = netloc.rsplit(":", 1)[0]
    return netloc.lower()


def surt_key(urlstr: str) -> str:
    """SURT-style sort key (reversed host), as walk's CDXJ index keys
    sort (``/root/reference/lib/walk.go:112-118``).

    ``http://a.b.com/x?q=1`` -> ``com,b,a)/x?q=1``.
    """
    try:
        parts = urlsplit(urlstr)
    except ValueError:
        return urlstr
    host = parts.netloc.lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    port = ""
    if ":" in host:
        host, port = host.rsplit(":", 1)
        port = ":" + port
    rev = ",".join(reversed(host.split(".")))
    tail = parts.path or ""
    if parts.query:
        tail += "?" + parts.query
    return f"{rev}{port}){tail}"


def normalize_url_array(urls) -> list[str]:
    """Vectorized-entry canonicalizer for a batch column.

    Accepts any iterable of strings (e.g. a pyarrow ChunkedArray via
    ``.to_pylist()`` or a numpy object array) and returns a Python
    list. URL normalization is branch-heavy string work; a tight
    Python loop over a batch with precompiled regexes is the fastest
    pure-Python shape (no per-row Arrow crossing).
    """
    norm = normalize_url
    return [norm(u) for u in urls]
