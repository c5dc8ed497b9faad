"""tf-idf / hash-split invariants beyond the DuckDB oracle gate:
shard-count independence (bucket count is a physical knob, not a
semantic one) and split-fraction sanity."""

import pytest

from walk_ray.pipelines.text import hash_split, tfidf_scores, tfidf_top_terms

SF = "/root/testdata/sf0.001"


def _sorted_df(ds, cols):
    return ds.to_pandas().sort_values(cols).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_shard_count_independent():
    a = _sorted_df(tfidf_scores(SF, n_buckets=8), ["doc_id", "term"])
    b = _sorted_df(tfidf_scores(SF, n_buckets=64), ["doc_id", "term"])
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_topk_rank_contract():
    out = tfidf_top_terms(SF, k=3, n_buckets=8).to_pandas()
    per_doc = out.groupby("doc_id")["rank"].agg(["min", "max", "size"])
    assert (per_doc["min"] == 1).all()
    assert (per_doc["max"] <= 3).all()
    assert (per_doc["size"] == per_doc["max"]).all()  # ranks are dense


@pytest.mark.usefixtures("ray_session")
def test_hash_split_fractions_and_stability():
    a = hash_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = hash_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    frac = a["split"].value_counts(normalize=True)
    assert 0.8 < frac.get("train", 0) < 1.0
    assert 0 < frac.get("val", 0) < 0.15
    assert 0 < frac.get("test", 0) < 0.15


def test_hash_split_bad_weights_raise():
    """Weights that don't sum to 1 are a hard error (ValueError, not a
    -O-strippable assert): a short last boundary would otherwise
    silently drop rows (round-3 advisory)."""
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(SF, weights=(("train", 0.5), ("val", 0.25)))


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_rates_and_determinism():
    """Per-stratum survival tracks the configured ppm rates; the
    sample is a pure function of the corpus (identical across runs);
    a row's fate is independent of other rows (the sample of a
    half-corpus equals the matching subset of the full sample)."""
    from walk_ray.pipelines.text import stratified_sample

    a = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    full = docs["lang"].value_counts()
    kept = a["lang"].value_counts()
    # en at 30% +- sampling noise, everything else at 70%
    assert 0.15 < kept.get("en", 0) / full["en"] < 0.45
    for lang in full.index.drop("en"):
        assert 0.5 < kept.get(lang, 0) / full[lang] < 0.9, lang
    # independence: restricting the corpus doesn't change any row's fate
    # — run the sampler on a REAL half-corpus written to disk and check
    # its kept set equals the full sample intersected with that half
    # (round-4 advisory: the previous set-identity form was a tautology)
    import os
    import tempfile

    import pyarrow.compute as pc

    half_ids = set(docs["doc_id"][docs["doc_id"] % 2 == 0])
    full_docs = pq.read_table(f"{SF}/documents.parquet")
    half_tbl = full_docs.filter(pc.equal(pc.bit_wise_and(full_docs["doc_id"], 1), 0))
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(half_tbl, os.path.join(td, "documents.parquet"))
        half_kept = set(stratified_sample(td).to_pandas()["doc_id"])
    assert half_kept == set(a["doc_id"]) & half_ids


@pytest.mark.usefixtures("ray_session")
def test_tfidf_cache_invalidates_on_corpus_change(tmp_path):
    """Round-4 advisory: the scores cache must miss when the parquet at
    the same path is regenerated (key carries file mtime+size)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from walk_ray.pipelines.text import tfidf_scores

    p = str(tmp_path / "documents.parquet")

    def write(texts):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}), p)

    write(["alpha beta", "alpha gamma"])
    t1 = set(tfidf_scores(str(tmp_path), n_buckets=4).to_pandas()["term"])
    assert "alpha" in t1 and "zeta" not in t1
    write(["zeta eta", "zeta theta"])
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on fast FS
    t2 = set(tfidf_scores(str(tmp_path), n_buckets=4).to_pandas()["term"])
    assert "zeta" in t2 and "alpha" not in t2
