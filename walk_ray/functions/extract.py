"""HTML resource extraction kernels.

Re-derivation of walk's response handling
(``/root/reference/lib/resource.go:89-189``):

- content sniffing (Go ``http.DetectContentType`` subset — WHATWG
  mimesniff, ``lib/resource.go:102``),
- HTML gate: parse only when the sniff is ``text/html; charset=utf-8``
  or ``text/plain; charset=utf-8`` (``lib/resource.go:117-119``),
- title = text of ``<title>`` elements (``lib/resource.go:126``),
- links = every element carrying an ``href`` attribute, in document
  order, resolved against the page URL, normalized, de-duplicated
  keeping the first occurrence (``lib/resource.go:158-189``),
- body hash = multihash SHA2-256, base58 (``lib/resource.go:113-115``),
- visible-text extraction (this engine's addition; walk stores raw
  bodies only). Deterministic rule: drop ``<script>``/``<style>``
  subtrees, strip tags, unescape entities, collapse whitespace runs to
  single spaces, strip ends. The synthetic pages generator writes the
  ``text`` column with this exact rule, giving the byte-identical
  per-url invariant a concrete anchor.

Everything here is pure-Python per batch with precompiled regexes:
HTML work is inherently per-document, so the vectorization boundary is
the batch loop, not the row internals.
"""

from __future__ import annotations

import hashlib
import re
from html import unescape as html_unescape

__all__ = [
    "detect_content_type",
    "extract_title",
    "extract_links",
    "extract_text",
    "multihash_b58",
    "multihash_b58_batch",
    "extract_batch",
]

# --- content sniffing (Go http.DetectContentType subset) -------------

_HTML_SIGS = [
    b"<!DOCTYPE HTML",
    b"<HTML",
    b"<HEAD",
    b"<SCRIPT",
    b"<IFRAME",
    b"<H1",
    b"<DIV",
    b"<FONT",
    b"<TABLE",
    b"<A",
    b"<STYLE",
    b"<TITLE",
    b"<B",
    b"<BODY",
    b"<BR",
    b"<P",
    b"<!--",
]

_BINARY_BYTES = frozenset(
    list(range(0x00, 0x09)) + [0x0B] + list(range(0x0E, 0x1A)) + list(range(0x1C, 0x20))
)

_EXACT_SIGS = [
    (b"%PDF-", "application/pdf"),
    (b"%!PS-Adobe-", "application/postscript"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"BM", "image/bmp"),
    (b"\x00\x00\x01\x00", "image/x-icon"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b\x08", "application/x-gzip"),
    (b"OggS", "application/ogg"),
    (b"ID3", "audio/mpeg"),
]


def detect_content_type(body: bytes) -> str:
    """WHATWG-mimesniff content type of ``body``'s first 512 bytes,
    matching Go ``http.DetectContentType`` for the types this engine
    emits (HTML, XML, plain text, common image/binary signatures)."""
    data = bytes(body[:512])
    stripped = data.lstrip(b"\t\n\x0c\r ")
    upper = stripped.upper()
    for sig in _HTML_SIGS:
        if upper.startswith(sig):
            # Go requires a tag-terminating byte (space or '>').
            rest = upper[len(sig) : len(sig) + 1]
            if rest in (b" ", b">"):
                return "text/html; charset=utf-8"
    if stripped.startswith(b"<?xml"):
        return "text/xml; charset=utf-8"
    for sig, ctype in _EXACT_SIGS:
        if data.startswith(sig):
            return ctype
    if data[:3] == b"\xef\xbb\xbf":
        return "text/plain; charset=utf-8"
    if data[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return "text/plain; charset=utf-16be" if data[:2] == b"\xfe\xff" else "text/plain; charset=utf-16le"
    if any(b in _BINARY_BYTES for b in data):
        return "application/octet-stream"
    return "text/plain; charset=utf-8"


# --- HTML parsing kernels --------------------------------------------

_RX_TITLE = re.compile(rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
# Any tag with an href attribute; capture the value in double quotes,
# single quotes, or bare.
_RX_HREF_TAG = re.compile(
    rb"<[a-zA-Z][^>]*?\shref\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.DOTALL,
)
_RX_SCRIPT_STYLE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_RX_TAG = re.compile(rb"<[^>]*>")
_RX_WS = re.compile(r"\s+")

# RE2 (Arrow) twins of canon._is_canonical's pieces — no lookahead in
# RE2, so the www. rejection is applied separately (extract_links_batch)
_RE2_CANONICAL = (
    r"^http://[a-z0-9-]+(?:\.[a-z0-9-]+)+"
    r"(?:/[A-Za-z0-9_~-]+(?:\.[A-Za-z0-9_~-]+)*)*$"
)
_RE2_DIR_INDEX_END = r"/(?:default|index)\.[0-9A-Za-z_]{1,4}$"


def _decode(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


def extract_title(html: bytes) -> str:
    """Concatenated text of all ``<title>`` elements (goquery
    ``Find("title").Text()`` semantics), entity-unescaped."""
    parts = [_decode(m.group(1)) for m in _RX_TITLE.finditer(html)]
    return html_unescape("".join(parts))


def extract_links(html: bytes, page_url: str) -> list[str]:
    """Normalized absolute link targets of every ``[href]`` element in
    document order, first occurrence wins (``lib/resource.go:158-189``)."""
    return extract_links_batch([page_url], [html])[0]


def extract_links_batch(page_urls: list[str], htmls: list[bytes]) -> list[list[str]]:
    """Batch variant of :func:`extract_links`: the already-canonical
    detector (the overwhelmingly common case for in-crawl hrefs) runs
    as THREE Arrow RE2 kernels over every href in the batch instead of
    a compiled-Python-regex match per href. Arrow's RE2 lacks the
    ``(?!www\\.)`` lookahead, so the www rejection is a separate
    ``starts_with``; the conjunction is exactly ``_is_canonical``
    (pinned by ``test_extract``'s equivalence fuzz). Non-canonical
    hrefs take the scalar resolve path unchanged."""
    from .canon import resolve_and_normalize

    raw_per_doc: list[list[str]] = []
    flat: list[str] = []
    for html in htmls:
        hs = []
        for m in _RX_HREF_TAG.finditer(html):
            raw = m.group(2) or m.group(3) or m.group(4) or b""
            hs.append(html_unescape(_decode(raw)))
        raw_per_doc.append(hs)
        flat.extend(hs)
    if not flat:
        return [[] for _ in htmls]

    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(flat, pa.string())
    canonical = pc.and_(
        pc.and_(
            pc.match_substring_regex(arr, _RE2_CANONICAL),
            pc.invert(pc.starts_with(arr, "http://www.")),
        ),
        pc.invert(pc.match_substring_regex(arr, _RE2_DIR_INDEX_END)),
    ).to_numpy(zero_copy_only=False)

    out: list[list[str]] = []
    i = 0
    for hs, page_url in zip(raw_per_doc, page_urls):
        seen: set[str] = set()
        lst: list[str] = []
        for h in hs:
            norm = h if canonical[i] else resolve_and_normalize(page_url, h)
            i += 1
            if norm is None or norm in seen:
                continue
            seen.add(norm)
            lst.append(norm)
        out.append(lst)
    return out


def extract_text(html: bytes) -> str:
    """Deterministic visible-text extraction (documented rule above).

    ``" ".join(text.split())`` is the whitespace-collapse step: it is
    equivalent to ``re.sub(r"\\s+", " ", text).strip()`` (str.split()
    with no argument splits on the same Unicode whitespace set \\s
    matches) and ~2.7x faster on the hot path.
    """
    no_scripts = _RX_SCRIPT_STYLE.sub(b" ", html)
    no_tags = _RX_TAG.sub(b" ", no_scripts)
    text = html_unescape(_decode(no_tags))
    return " ".join(text.split())


# NOTE on why there is no Arrow batch twin for extract_text: it was
# built and measured (round 5) — Arrow RE2 replace loses on every
# piece of this kernel at bench-page sizes (script/style 7.7 vs 5.9
# µs/row, tag strip 20.1 vs 13.5, and the whitespace collapse is
# 51-53 µs/row in RE2 vs 35 for ``" ".join(s.split())`` because
# Arrow's per-match replace machinery dominates on dense short
# matches). The compiled-bytes-regex scalar below IS the fast path;
# the batch loop is the vectorization boundary.


# --- hashing ----------------------------------------------------------

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


_B58_POW10 = 58**10


def _b58encode(raw: bytes) -> str:
    # peel 10 digits per bigint divmod (58^10 < 2^64), then split the
    # machine-word remainder with cheap small-int divmods — ~2x faster
    # than one bigint divmod per digit on 34-byte multihashes
    n = int.from_bytes(raw, "big")
    out = []
    while n:
        n, r = divmod(n, _B58_POW10)
        if n:
            for _ in range(10):
                r, d = divmod(r, 58)
                out.append(_B58_ALPHABET[d])
        else:
            while r:
                r, d = divmod(r, 58)
                out.append(_B58_ALPHABET[d])
    pad = 0
    for b in raw:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def multihash_b58(body: bytes) -> str:
    """Base58 multihash (SHA2-256) of ``body``, matching
    ``multihash.Sum(body, SHA2_256, -1).String()``
    (``lib/resource.go:113-115``): varint fn code 0x12, length 0x20,
    then the digest."""
    digest = hashlib.sha256(body).digest()
    return _b58encode(b"\x12\x20" + digest)


def multihash_b58_batch(bodies) -> list[str]:
    """Batch :func:`multihash_b58`: sha256 stays per row (hashlib is
    C), but the base58 conversion — the profile's hottest scalar
    kernel at ~46 µs/row — runs as ONE numpy multi-precision base
    conversion over the whole batch: each 34-byte multihash is 9
    big-endian uint32 limbs (front-padded to 36 bytes), each pass
    divmods the full limb matrix by 58^5 (fits: carry < 2^30, so
    ``carry<<32 | limb`` < 2^62), and the 5-digit chunks expand with
    vectorized divmods. Leading zero base58 digits are trimmed per
    row exactly like the scalar loop's ``while n`` termination; the
    ``\\x12`` multihash prefix guarantees no leading zero BYTES, so
    the scalar path's '1'-padding never applies here (asserted
    against :func:`multihash_b58` by ``test_multihash_batch``)."""
    import numpy as np

    n = len(bodies)
    if n == 0:
        return []
    sha = hashlib.sha256
    concat = b"".join(
        b"\x00\x00\x12\x20" + sha(b if b is not None else b"").digest()
        for b in bodies
    )
    limbs = (
        np.frombuffer(concat, dtype=">u4")
        .reshape(n, 9)
        .astype(np.uint64)
        .T.copy()  # (9, n) limb-major: each pass walks limbs once
    )
    D = np.uint64(58**5)
    SHIFT = np.uint64(32)
    chunks = []  # least-significant 5-digit chunk first
    # 2^288 < 58^50: ten passes always exhaust 36-byte values
    for _ in range(10):
        carry = np.zeros(n, dtype=np.uint64)
        for i in range(9):
            cur = (carry << SHIFT) | limbs[i]
            limbs[i] = cur // D
            carry = cur % D
        chunks.append(carry)
        if not limbs.any():
            break
    n_chunks = len(chunks)
    # digit matrix, most-significant digit first: (n, n_chunks*5)
    digits = np.empty((n, n_chunks * 5), dtype=np.uint64)
    f58 = np.uint64(58)
    for c, chunk in enumerate(chunks):
        base = (n_chunks - 1 - c) * 5
        for d in range(4, -1, -1):
            digits[:, base + d] = chunk % f58
            chunk = chunk // f58
    alpha = np.frombuffer(_B58_ALPHABET.encode(), dtype=np.uint8)
    chars = alpha[digits.astype(np.int64)]
    # trim leading zero digits (value 0 → alphabet '1'), matching the
    # scalar loop; an all-zero row (empty value) yields ""
    keep = np.cumsum(digits != 0, axis=1) > 0
    lengths = keep.sum(axis=1).astype(np.int64)
    data = chars[keep].tobytes()
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    return [
        data[offs[i]:offs[i + 1]].decode("ascii") for i in range(n)
    ]


# --- batch kernel -----------------------------------------------------

_HTML_SNIFFS = ("text/html; charset=utf-8", "text/plain; charset=utf-8")


def extract_batch(urls, bodies):
    """Per-batch extraction: returns dict of equal-length lists
    ``(content_sniff, content_length, hash, title, links, text)``.

    The HTML gate mirrors ``lib/resource.go:117-119``: title/links/text
    are only produced when the sniff is text/html or text/plain (both
    utf-8); other content types get empty values.
    """
    sniffs: list[str] = []
    lengths: list[int] = []
    titles: list[str] = []
    links: list[list[str]] = []
    texts: list[str] = []
    html_idx: list[int] = []
    html_urls: list[str] = []
    html_bodies: list[bytes] = []
    norm_bodies: list[bytes] = []
    for i, (url, body) in enumerate(zip(urls, bodies)):
        body = bytes(body) if body is not None else b""
        norm_bodies.append(body)
        sniff = detect_content_type(body)
        sniffs.append(sniff)
        lengths.append(len(body))
        if sniff in _HTML_SNIFFS:
            titles.append(extract_title(body))
            texts.append(extract_text(body))
            links.append([])
            html_idx.append(i)
            html_urls.append(url)
            html_bodies.append(body)
        else:
            titles.append("")
            links.append([])
            texts.append("")
    if html_idx:
        for i, lst in zip(html_idx, extract_links_batch(html_urls, html_bodies)):
            links[i] = lst
    return {
        "content_sniff": sniffs,
        "content_length": lengths,
        "hash": multihash_b58_batch(norm_bodies),
        "title": titles,
        "links": links,
        "text": texts,
    }


def headers_map(flat: list[str]) -> dict[str, str]:
    """walk Resource.HeadersMap (lib/resource.go:58-67): flat
    [k, v, k, v, ...] slice → dict."""
    return {flat[i]: flat[i + 1] for i in range(0, len(flat) - 1, 2)}
