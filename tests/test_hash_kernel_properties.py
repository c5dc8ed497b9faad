"""Property-based parity for the rolling-hash batch kernels
(hypothesis): the Arrow/numpy batch implementations must equal their
per-doc pure-python references on arbitrary corpora — whitespace
shapes, unicode, repeats, and short/empty docs included. These pin the
round-5 semantic change (polynomial token-hash folds) end to end."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

# texts exercise: empty, whitespace runs, unicode words, repeats
_word = st.one_of(
    st.sampled_from(["the", "a", "tok", "tok", "wörd", "émoji", "x1"]),
    st.text(alphabet="abcδλ0", min_size=1, max_size=5),
)
_text = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(_word, min_size=0, max_size=30).map(" ".join),
    st.lists(_word, min_size=0, max_size=30).map("  ".join),
)
_corpus = st.lists(_text, min_size=1, max_size=12)


@settings(max_examples=60, deadline=None)
@given(_corpus)
def test_winnow_batch_equals_reference(texts):
    from walk_ray.pipelines.text import _winnow_batch, winnow_doc

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = _winnow_batch(t, 5, 4).to_pandas()
    for i, txt in enumerate(texts):
        fps = winnow_doc(txt, 5, 4)
        assert out["n_fingerprints"][i] == len(fps), (i, txt)
        assert out["fp_min"][i] == (min(fps) if fps else 0), (i, txt)
        x = 0
        for v in fps:
            x ^= v
        assert out["fp_xor"][i] == x, (i, txt)


@settings(max_examples=60, deadline=None)
@given(_corpus, st.sampled_from([1, 2, 3, 5]))
def test_minhash_shingle_rows_equal_reference(texts, ngram):
    from walk_ray.pipelines.dedup import MinHasher, _doc_shingle_hashes

    mh = MinHasher(num_perm=8, ngram=ngram)
    col = pc.fill_null(pa.array(texts, pa.string()), "")
    rows, h = mh._batch_shingle_rows(col)
    for i, txt in enumerate(texts):
        ref = set(_doc_shingle_hashes(txt.split(), ngram).tolist())
        assert set(h[rows == i].tolist()) == ref, (i, txt, ngram)


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_simhash_batch_equals_reference(texts):
    from walk_ray.pipelines.dedup import SimHasher

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = SimHasher()(t)
    for i, txt in enumerate(texts):
        assert out["simhash"][i].as_py() == SimHasher.simhash(txt), (i, txt)


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_quality_arrays_equal_pandas_path(texts):
    """The Arrow quality kernel equals the former pandas regex
    formulas (re-derived here) on arbitrary corpora."""
    import pandas as pd
    import re

    from walk_ray.pipelines.text import STOPWORDS, _quality_arrays

    stop_re = re.compile(
        r"(?:^|\s)(?:" + "|".join(re.escape(w) for w in STOPWORDS)
        + r")(?=\s|$)")
    s = pd.Series(texts).fillna("")
    qa = _quality_arrays(pc.fill_null(pa.array(s, pa.string()), ""))
    n_words = s.str.count(r"\S+").astype("int64")
    n_stop = s.str.count(stop_re).astype("int64")
    total_wlen = s.str.count(r"\S").astype("int64")
    assert (qa["n_words"] == n_words.values).all()
    assert (qa["n_stopwords"] == n_stop.values).all()
    assert (qa["n_chars"] == s.str.len().values).all()
    assert np.allclose(
        qa["mean_word_len"],
        (total_wlen / n_words.clip(lower=1)).round(6).values)
    stop_ratio = (n_stop / n_words.clip(lower=1)).round(6)
    assert np.allclose(
        qa["quality"],
        ((n_words / 100).clip(upper=1.0) * (1 - stop_ratio)).round(6).values)
