"""Semantic gates for the round-4 data-hygiene operators (the
entry-parity suite already hash-checks each against its DuckDB oracle
at sf0.001; these pin the *behavioral* claims)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ray_ok(ray_session):
    return True


def test_regex_redact_counts_and_replacement(ray_ok):
    from walk_ray.pipelines.text import regex_redact

    df = regex_redact(SF).to_pandas()
    # the demo stop rule fires on the word-salad corpus...
    assert df["n_stop"].sum() > 0
    # ...and every counted match was actually replaced
    hit = df[df["n_stop"] > 0]
    assert (hit["clean_text"].str.contains("<STOP>")).all()
    assert not hit["clean_text"].str.contains(r"\bthe\b", regex=True).any()
    # no PII in the synthetic corpus → zero counts, text untouched
    assert df["n_email"].eq(0).all() and df["n_phone"].eq(0).all()


def test_decontaminate_flags_benchmark_members(ray_ok):
    from walk_ray.pipelines.text import DECON_EVERY, DECON_MAX_ID, decontaminate

    df = decontaminate(SF).to_pandas().set_index("doc_id")
    seeds = [d for d in df.index if d % DECON_EVERY == 0 and d < DECON_MAX_ID]
    assert seeds, "benchmark derivation must select at least one doc"
    # every benchmark member contains its own snippet verbatim
    assert df.loc[seeds, "contaminated"].eq(1).all()
    # and the flag is not degenerate (some docs are clean)
    assert (df["contaminated"] == 0).any()


def test_repetition_stats_known_doc(ray_ok):
    from walk_ray.pipelines.text import repetition_stats

    df = repetition_stats(SF).to_pandas()
    assert (df["n_bigrams"] == (df["n_words"] - 1).clip(lower=0)).all()
    assert (df["top_bigram_n"] <= df["n_bigrams"]).all()
    assert (df["dup_bigram_excess"] >= 0).all()
    # corpus has repeated phrases → the signal is non-trivial somewhere
    assert (df["dup_bigram_excess"] > 0).any()


def test_chunk_dedup_removes_and_reassembles(ray_ok):
    from walk_ray.pipelines.dedup import chunk_dedup

    df = chunk_dedup(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    # duplicates exist at chunk granularity → something was dropped
    assert (df["n_chunks_kept"] < df["n_chunks_total"]).any()
    # a doc whose chunks all survived reassembles to its exact text
    merged = df.merge(docs, on="doc_id")
    intact = merged[merged["n_chunks_kept"] == merged["n_chunks_total"]]
    assert len(intact) > 0
    assert (intact["clean_text"] == intact["text"].fillna("")).all()
    # kept chunks per doc never exceed the doc's own chunk count
    assert (df["n_chunks_kept"] >= 1).all()


def test_chunk_dedup_shard_independent(ray_ok):
    """Result is a pure function of the corpus — bucket count must not
    change the output (the partitioning-assumption regression gate)."""
    from walk_ray.pipelines.dedup import chunk_dedup

    a = (chunk_dedup(SF, n_buckets=4).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (chunk_dedup(SF, n_buckets=17).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_classifier_scores_bounds(ray_ok):
    from walk_ray.pipelines.text import classifier_scores

    df = classifier_scores(SF).to_pandas()
    assert df["score"].between(0.0, 1.0).all()
    # deterministic model → identical on rerun
    df2 = classifier_scores(SF).to_pandas()
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = df2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lm_perplexity_semantics(ray_ok):
    from walk_ray.pipelines.text import lm_perplexity

    df = lm_perplexity(SF).to_pandas()
    assert (df["perplexity"] > 0).all()
    # every doc surfaces, including bigram-less ones at exactly 1.0
    assert len(df) == len(df["doc_id"].unique())
    assert (df.loc[df["n_bigrams"] == 0, "perplexity"] == 1.0).all()
    # the corpus LM must fit its own corpus far better than the
    # smoothed-unseen ceiling (LM_SMOOTH)
    assert df.loc[df["n_bigrams"] > 0, "perplexity"].median() < 4096


def test_lm_perplexity_shard_independent(ray_ok):
    from walk_ray.pipelines.text import lm_perplexity

    a = (lm_perplexity(SF, n_buckets=4).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_perplexity(SF, n_buckets=17).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_prepare_corpus_composition(ray_ok):
    """The composed pipeline agrees with its stages run separately."""
    from walk_ray.pipelines.prepare import PREP_MIN_QUALITY, prepare_corpus
    from walk_ray.pipelines.text import quality_of

    out = prepare_corpus(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    q = quality_of(docs["text"].fillna(""))
    kept = set(docs.loc[(q >= PREP_MIN_QUALITY).to_numpy(), "doc_id"])
    # only quality-passing docs can appear (dedup may drop more)
    assert set(out["doc_id"]).issubset(kept)
    assert 0 < len(out) < len(docs)
    assert set(out["split"]) <= {"train", "val", "test"}
    # the filtered sub-corpus has fewer chunk collisions than the full
    # corpus, but reassembly invariants still hold
    assert (out["n_chunks_kept"] <= out["n_chunks_total"]).all()


def test_classifier_cache_capped(monkeypatch):
    """Round-4 advisory: the per-actor token→index memo must stay
    bounded — web-scale vocabulary would otherwise grow a long-lived
    actor's heap forever. Past the cap the memo clears (md5 recomputes,
    scores unchanged)."""
    from walk_ray.pipelines import text as text_mod

    import pyarrow as pa

    monkeypatch.setattr(text_mod, "CLF_CACHE_MAX", 100)
    scorer = text_mod.BoWScorer()
    big = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([" ".join(f"tok{i}" for i in range(500))]),
    })
    out1 = scorer(big)
    assert len(scorer.idx_cache) <= 100  # cleared after overflow
    out2 = scorer(big)  # recompute path gives identical scores
    assert out1.equals(out2)
    small = pa.table({"doc_id": pa.array([2], pa.int64()),
                      "text": pa.array(["a b c"])})
    scorer(small)
    assert len(scorer.idx_cache) <= 100
