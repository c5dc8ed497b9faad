"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
SIGMOD'03): the numpy selection is pinned by a pure-python reference
implementation, plus the algorithm's defining properties."""

import hashlib

import pytest

from walk_ray.pipelines.text import winnow_doc


def _reference_winnow(text, k=5, window=4):
    # gram hash = polynomial fold (odd 64-bit multiplier) over
    # per-token blake2b hashes — the rolling-hash construction the
    # winnowing paper assumes; re-derived here independently of the
    # production kernel
    P, M = 0x9E3779B97F4A7C15, (1 << 64) - 1

    def tok_h(w):
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")

    def gram_h(ws):
        h = 0
        for w in ws:
            h = (h * P + tok_h(w)) & M
        return h >> 1

    words = text.split()
    if len(words) < k:
        grams = [words] if words else []
    else:
        grams = [words[i:i + k] for i in range(len(words) - k + 1)]
    if not grams:
        return []
    hs = [gram_h(g) for g in grams]
    if len(hs) <= window:
        return [min(hs)]
    out, last_pos = [], -1
    for start in range(len(hs) - window + 1):
        w = hs[start:start + window]
        m = min(w)
        # rightmost minimum
        idx = max(i for i, v in enumerate(w) if v == m)
        pos = start + idx
        if pos != last_pos:
            out.append(m)
            last_pos = pos
    return out


SAMPLES = [
    "",
    "one two",
    "the quick brown fox jumps over the lazy dog again and again",
    " ".join(f"w{i % 7}" for i in range(100)),
    " ".join(f"tok{i}" for i in range(50)),
]


@pytest.mark.parametrize("text", SAMPLES)
def test_matches_pure_python_reference(text):
    assert winnow_doc(text) == _reference_winnow(text)


def test_identical_docs_identical_fingerprints():
    t = " ".join(f"tok{i}" for i in range(60))
    assert winnow_doc(t) == winnow_doc(t)


def test_near_dup_docs_share_fingerprints():
    base = [f"tok{i}" for i in range(80)]
    edited = list(base)
    edited[40] = "CHANGED"
    a = set(winnow_doc(" ".join(base)))
    b = set(winnow_doc(" ".join(edited)))
    # a single-token edit perturbs only a local region of k-grams
    assert len(a & b) / len(a) > 0.5


@pytest.mark.usefixtures("ray_session")
def test_winnow_fingerprints_dataset():
    from walk_ray.pipelines.text import winnow_fingerprints

    df = winnow_fingerprints("/root/testdata/sf0.001").to_pandas()
    assert set(df.columns) == {"doc_id", "n_fingerprints", "fp_min", "fp_xor"}
    assert (df["n_fingerprints"] > 0).all()
    assert df["doc_id"].is_unique


def test_winnow_batch_matches_winnow_doc():
    """The batch-vectorized Arrow kernel equals the per-doc reference
    on every doc shape: empty, whitespace-only, < k words, == k words,
    m <= window grams, long docs, repeated tokens, doubled spaces."""
    import pyarrow as pa

    from walk_ray.pipelines.text import _winnow_batch

    texts = SAMPLES + [
        "   ",                                # whitespace-only -> 0 words
        "a b c d e",                          # exactly k words, 1 gram
        "a b c d e f g h",                    # m=4 == window -> min path
        "a b c d e f g h i",                  # m=5 > window -> window path
        "x  y   z",                           # interior doubled spaces
        " lead trail ",                       # boundary whitespace
        " ".join(["same"] * 30),              # constant token stream
        " ".join(f"v{i % 3}" for i in range(25)),
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = _winnow_batch(t, 5, 4).to_pandas()
    for i, txt in enumerate(texts):
        fps = winnow_doc(txt, 5, 4)
        row = out.iloc[i]
        assert row["n_fingerprints"] == len(fps), (i, txt)
        assert row["fp_min"] == (min(fps) if fps else 0), (i, txt)
        x = 0
        for v in fps:
            x ^= v
        assert row["fp_xor"] == x, (i, txt)
