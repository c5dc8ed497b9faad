"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
SIGMOD'03): the numpy selection is pinned by a pure-python reference
implementation, plus the algorithm's defining properties."""

import hashlib

import pytest

from walk_ray.pipelines.text import winnow_doc


def _reference_winnow(text, k=5, window=4):
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return []
    hs = [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big") >> 1
          for g in grams]
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
