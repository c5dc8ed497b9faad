from walk_ray.functions.extract import (
    detect_content_type,
    extract_batch,
    extract_links,
    extract_text,
    extract_title,
    multihash_b58,
)
from walk_ray.functions.urlfilter import CandidateFilter, ok_status


def test_detect_content_type():
    assert detect_content_type(b"<!DOCTYPE html><html></html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"  \n<html><body>hi</body></html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"<?xml version=\"1.0\"?><r/>") == "text/xml; charset=utf-8"
    assert detect_content_type(b"just some text") == "text/plain; charset=utf-8"
    assert detect_content_type(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"
    assert detect_content_type(b"\x00\x01\x02binary") == "application/octet-stream"
    # '<htmlx' has no tag-terminating byte -> not html
    assert detect_content_type(b"<htmlx>") == "text/plain; charset=utf-8"


def test_extract_title():
    assert extract_title(b"<html><head><title>Hi &amp; Bye</title></head></html>") == "Hi & Bye"
    assert extract_title(b"<html><title>a</title><title>b</title></html>") == "ab"
    assert extract_title(b"<html><body>none</body></html>") == ""


def test_extract_links_order_and_dedup():
    html = (
        b'<html><head><link rel="stylesheet" href="/css/site.css">'
        b'<title>t</title></head><body>'
        b'<a href="b.html">b</a>'
        b"<a href='a.html'>a</a>"
        b'<a href=bare.html>bare</a>'
        b'<a href="b.html">dup</a>'
        b'<a href="https://www.ext.com/">ext</a>'
        b'<a href="#frag">self</a>'
        b"</body></html>"
    )
    links = extract_links(html, "http://site.test/sub/page.html")
    assert links == [
        "http://site.test/css/site.css",
        "http://site.test/sub/b.html",
        "http://site.test/sub/a.html",
        "http://site.test/sub/bare.html",
        "http://ext.com",
        "http://site.test/sub/page.html",
    ]


def test_extract_text():
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style>"
        b"<script>var x=1;</script></head>"
        b"<body><h1>Head</h1><p>one  two\nthree</p></body></html>"
    )
    assert extract_text(html) == "T Head one two three"


def test_multihash_b58():
    import hashlib

    # base58 vector: decode the multihash back and check the prefix+digest
    mh = multihash_b58(b"abc")
    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    n = 0
    for ch in mh:
        n = n * 58 + alphabet.index(ch)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    assert raw[:2] == b"\x12\x20"
    assert raw[2:] == hashlib.sha256(b"abc").digest()
    assert multihash_b58(b"abc") != multihash_b58(b"abd")


def test_multihash_batch():
    """The numpy multi-precision base58 batch kernel is row-for-row
    identical to the scalar bigint encoder — including empty bodies,
    None (normalized to b"" like extract_batch does), and random
    binary of every small length."""
    import random

    from walk_ray.functions.extract import multihash_b58_batch

    assert multihash_b58_batch([]) == []
    rng = random.Random(77)
    bodies = [b"", None, b"abc", b"\x00" * 64]
    bodies += [rng.randbytes(rng.randrange(0, 500)) for _ in range(300)]
    got = multihash_b58_batch(bodies)
    want = [multihash_b58(b if b is not None else b"") for b in bodies]
    assert got == want


def test_extract_batch_gate():
    out = extract_batch(
        ["http://a.com/x", "http://a.com/img.png"],
        [b"<html><title>T</title><a href=\"y\">y</a></html>", b"\x89PNG\r\n\x1a\nxx"],
    )
    assert out["title"] == ["T", ""]
    assert out["links"][0] == ["http://a.com/y"]
    assert out["links"][1] == []
    assert out["content_sniff"][1] == "image/png"
    assert out["content_length"] == [46, 10]


def test_candidate_filter():
    f = CandidateFilter(["http://site.test/sub"], ["logout"])
    assert f("http://site.test/sub/page.html")
    assert f("http://site.test")  # empty path passes (reference quirk)
    assert not f("http://site.test/other/page.html")
    assert not f("http://elsewhere.test/sub/x")
    assert not f("http://site.test/sub/logout.html")
    f2 = CandidateFilter(["http://site.test"])
    assert f2("http://site.test/anything")


def test_ok_status():
    assert ok_status(200) and ok_status(308)
    assert not ok_status(199) and not ok_status(309) and not ok_status(404)
