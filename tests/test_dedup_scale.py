"""Quantitative gates for the approximate dedup paths (the ops the
driver can only rows-only check): pin them against exact computations
at small scale so regressions in the LSH/banding logic are caught.

Also locks in the round-2 scale contract: no driver-side
materialization of per-doc state in any dedup pipeline — signatures
ride on band rows, candidate pairs are the broadcast side, and pair
emission is at-most-once by first-colliding-band, so outputs need no
dedup shuffle.
"""

import itertools

import pandas as pd

import pytest

from walk_ray.pipelines import dedup

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_minhash_precision_recall_vs_exact():
    """Estimated-Jaccard LSH pairs vs exact unigram Jaccard at the
    bench threshold: precision ≥ 0.85, recall ≥ 0.5 (measured 0.93 /
    0.69 at these parameters — the est filter at high thresholds is
    conservative by design)."""
    est = dedup.minhash_lsh_pairs(SF, ngram=1, threshold=0.9).to_pandas()
    exact = dedup.ngram_jaccard_pairs(SF, n=1, threshold=0.9, exact=True).to_pandas()
    est_set = set(zip(est["a"], est["b"]))
    ex_set = set(zip(exact["a"], exact["b"]))
    assert est_set, "LSH produced no pairs"
    tp = len(est_set & ex_set)
    assert tp / len(est_set) >= 0.85  # precision
    assert tp / len(ex_set) >= 0.5  # recall


@pytest.mark.usefixtures("ray_session")
def test_minhash_pairs_globally_unique():
    est = dedup.minhash_lsh_pairs(SF, ngram=1, threshold=0.9).to_pandas()
    assert not est.duplicated(["a", "b"]).any()
    assert (est["a"] < est["b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_simhash_equals_bruteforce():
    """4×16-bit banding has EXACT recall at Hamming ≤ 3 (pigeonhole:
    ≤3 differing bits leave one band clean), so the pipeline must
    equal the all-pairs scan over the same signatures."""
    sigs = dedup._docs(SF).map_batches(dedup.SimHasher(), batch_format="pyarrow").to_pandas()
    brute = set()
    rows = sorted(zip(sigs["doc_id"], sigs["simhash"]))
    for (a, ha), (b, hb) in itertools.combinations(rows, 2):
        if bin(int(ha) ^ int(hb)).count("1") <= 3:
            brute.add((int(a), int(b)))
    pipe = dedup.simhash_dedup(SF, max_hamming=3).to_pandas()
    assert set(zip(pipe["a"], pipe["b"])) == brute
    assert not pipe.duplicated(["a", "b"]).any()


@pytest.mark.usefixtures("ray_session")
def test_ngram_scale_path_equals_exact():
    """The pairs ⋈ grams verification path must agree with the
    all-pairs baseline wherever LSH recall allows; at unigram/0.9 on
    this data the candidate set covers every exact pair."""
    scale = dedup.ngram_jaccard_pairs(SF, n=1, threshold=0.9, exact=False).to_pandas()
    exact = dedup.ngram_jaccard_pairs(SF, n=1, threshold=0.9, exact=True).to_pandas()
    s = set(zip(scale["a"], scale["b"]))
    e = set(zip(exact["a"], exact["b"]))
    assert s <= e  # exact verify → no false positives, ever
    assert len(s & e) / len(e) >= 0.95  # recall via LSH blocking


@pytest.mark.usefixtures("ray_session")
def test_embedding_ivf_blocked_agrees_with_exact():
    """IVF-cell blocking is a recall refinement of the exact all-pairs
    path: identical clusters at small scale (multi-assign cells give
    full recall here), and blocked pairs are always a subset with
    exactly-computed cosines."""
    ivf = dedup.embedding_dedup(SF, threshold=0.4, method="ivf").to_pandas()
    exact = dedup.embedding_dedup(SF, threshold=0.4, method="exact").to_pandas()
    assert ivf.equals(exact)

    pairs = dedup.embedding_cosine_pairs_blocked(SF, threshold=0.4).to_pandas()
    exact_pairs = dedup.embedding_cosine_pairs(SF, threshold=0.4).to_pandas()
    p = set(zip(pairs["a"], pairs["b"]))
    ep = set(zip(exact_pairs["a"], exact_pairs["b"]))
    assert p <= ep
    assert len(p) / max(len(ep), 1) >= 0.95
    assert not pairs.duplicated(["a", "b"]).any()


@pytest.mark.usefixtures("ray_session")
def test_minhash_plans_agree():
    """The two physical plans (sig-on-band single exchange vs skinny
    three-exchange) must emit the identical pair set with identical
    est values — plan choice is a size threshold, not semantics."""
    a = (dedup.minhash_lsh_pairs(SF, plan="sig-on-band").to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    b = (dedup.minhash_lsh_pairs(SF, plan="skinny").to_pandas()
         .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(SF, plan="bogus")


def test_verify_sig_partition_matches_bruteforce():
    """The run-factorized in-bucket verify kernel (band equality,
    first-band ownership, est filter, run→doc expansion) against a
    per-pair brute force, on a synthetic partition heavy in identical
    signatures — the regime the factorization exists for."""
    import numpy as np
    import pyarrow as pa

    num_perm, bands = 16, 4
    rpb = num_perm // bands
    rng = np.random.default_rng(7)
    n_runs, n_docs = 6, 40
    U = rng.integers(0, 2**63, size=(n_runs, num_perm), dtype=np.uint64)
    # make runs 0/1 equal at band 0 only, runs 2/3 equal at band 2 only
    U[1, :rpb] = U[0, :rpb]
    U[3, 2 * rpb:3 * rpb] = U[2, 2 * rpb:3 * rpb]
    assign = rng.integers(0, n_runs, size=n_docs)
    M = U[assign]
    doc = np.arange(100, 100 + n_docs, dtype=np.int64)
    # band rows: every (doc, band), bucket ignored (single partition)
    C = M.reshape(n_docs, bands, rpb)
    rows = {"doc_id": [], "band_id": [], "band_hash": [], "sig": []}
    for d in range(n_docs):
        for b in range(bands):
            rows["doc_id"].append(int(doc[d]))
            rows["band_id"].append(b)
            # hash = the chunk itself mixed; any injective-enough key
            rows["band_hash"].append(int(C[d, b].sum() % (2**63)))
            rows["sig"].append(M[d].tobytes())
    g = pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "band_id": pa.array(rows["band_id"], pa.int64()),
        "band_hash": pa.array(rows["band_hash"], pa.uint64()),
        "sig": pa.array(rows["sig"], pa.binary(num_perm * 8)),
    })
    for threshold in (0.0, 0.4, 0.9):
        got = dedup._verify_sig_partition(g, num_perm, bands, threshold)
        got = got.sort_values(["a", "b"]).reset_index(drop=True)
        # brute force: pair iff chunks equal at some band; owning band
        # = first equal band; est = fraction of equal perms
        exp = {"a": [], "b": [], "est_jaccard": []}
        for i in range(n_docs):
            for j in range(i + 1, n_docs):
                eq_bands = [b for b in range(bands)
                            if (C[i, b] == C[j, b]).all()]
                if not eq_bands:
                    continue
                est = float((M[i] == M[j]).mean())
                if est >= threshold:
                    exp["a"].append(int(doc[i]))
                    exp["b"].append(int(doc[j]))
                    exp["est_jaccard"].append(round(est, 6))
        exp = pd.DataFrame(exp).sort_values(["a", "b"]).reset_index(drop=True)
        assert len(got) == len(exp), (threshold, len(got), len(exp))
        pd.testing.assert_frame_equal(got.astype(
            {"a": "int64", "b": "int64"}), exp.astype(
            {"a": "int64", "b": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_ngram_tuned_banding_subset_of_default():
    """bands=16 (r=8, the high-threshold tuning) trades candidate
    recall at the boundary for a steeper sensitivity curve; its output
    must be a subset of the default-band output with the same exact
    jaccard values, and near-complete on this dup-heavy table."""
    base = dedup.ngram_jaccard_pairs(SF, n=1, threshold=0.8,
                                     exact=False).to_pandas()
    tuned = dedup.ngram_jaccard_pairs(SF, n=1, threshold=0.8,
                                      exact=False, bands=16).to_pandas()
    bk = set(map(tuple, base[["a", "b"]].itertuples(index=False)))
    tk = set(map(tuple, tuned[["a", "b"]].itertuples(index=False)))
    assert tk <= bk
    assert len(tk) >= 0.9 * len(bk), (len(tk), len(bk))
    merged = tuned.merge(base, on=["a", "b"], suffixes=("_t", "_b"))
    assert (merged["jaccard_t"] == merged["jaccard_b"]).all()


def test_gram_bytes_rows_byte_parity():
    """The pure-Arrow gram-serialization kernel is byte-identical to
    the per-doc Python construction across n, including empty, null,
    whitespace-heavy, unicode and shorter-than-n docs."""
    import pyarrow as pa

    from walk_ray.pipelines.dedup import _gram_bytes_rows, _word_ngrams

    texts = ["the quick brown fox", "", "  spaced   out  tokens ", None,
             "a b a b a", "one", "unicode héllo zèta alpha héllo",
             "t1 t2 t3 t4 t5 t6 t7 t2 t3 t4"]
    ids = list(range(10, 10 + len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    for n in (1, 2, 3):
        out = _gram_bytes_rows(t, n, 7)
        got = dict(zip(out["doc_id"].to_pylist(), out["gbytes"].to_pylist()))
        for i, tx in zip(ids, texts):
            ref = "\x00".join(
                sorted(set(_word_ngrams((tx or "").split(), n)))).encode()
            assert got[i] == ref, (n, i)
        db = dict(zip(out["doc_id"].to_pylist(), out["dbucket"].to_pylist()))
        assert all(db[i] == i % 7 for i in ids)


def test_gram_bytes_rows_property():
    """Property check of the Arrow gram kernel against the Python
    reference over random unicode docs (whitespace runs, empties,
    repeats) and every n in 1..4."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from walk_ray.pipelines.dedup import _gram_bytes_rows, _word_ngrams

    word = st.text(
        alphabet=st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
        min_size=1, max_size=6)
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8), st.integers(1, 4))
    def check(texts, n):
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = _gram_bytes_rows(t, n, 5)
        got = dict(zip(out["doc_id"].to_pylist(), out["gbytes"].to_pylist()))
        for i, tx in zip(ids, texts):
            ref = "\x00".join(
                sorted(set(_word_ngrams(tx.split(), n)))).encode()
            assert got[i] == ref, (n, i, tx)

    check()
