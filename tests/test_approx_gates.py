"""Quantitative gates for the APPROXIMATE dedup ops, grounded in
DuckDB exact similarity over the same table (the conformance spirit of
walk's golden-file tests, lib/sitemap_test.go:19-81): the rows-only
queries get pinned precision/recall bounds instead of running
unchecked.

- minhash_lsh_pairs (est-Jaccard from 128-perm signatures, banded LSH
  blocking): recall — every DuckDB-exact 3-gram-Jaccard pair at
  threshold+3.4σ appears; precision — every emitted pair's exact
  Jaccard is within 3.4σ below the threshold (σ ≈ sqrt(j(1-j)/128)
  ≈ 0.044 at j=0.5).
- simhash_dedup: EXACT equality with DuckDB bit_count(xor) Hamming ≤ 3
  over the engine's signatures — band blocking guarantees exact recall
  by pigeonhole, so the pair set must match exactly, not approximately.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.5
EPS = 0.15  # ≈ 3.4σ of the 128-perm estimator at the boundary


def _exact_trigram_pairs(min_j: float) -> set[tuple[int, int]]:
    """DuckDB-exact word-3-gram Jaccard pairs (the engine's shingle
    definition: texts shorter than n words collapse to one gram)."""
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    q = f"""
        WITH words AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents
        ), grams AS (
            SELECT doc_id, list_distinct(
                CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                     ELSE list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                END) AS g
            FROM words
        ), pairs AS (
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                   / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
            FROM grams a, grams b WHERE a.doc_id < b.doc_id
        )
        SELECT a, b FROM pairs WHERE j >= {min_j}
    """
    df = con.sql(q).df()
    return set(zip(df["a"].astype(int), df["b"].astype(int)))


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_pairs_recall_and_precision_vs_duckdb():
    from walk_ray.pipelines import dedup

    est = dedup.minhash_lsh_pairs(SF, threshold=THRESHOLD).to_pandas()
    est_set = set(zip(est["a"].astype(int), est["b"].astype(int)))

    # recall: exact pairs comfortably above the threshold must all be
    # found (LSH blocking + estimator noise may only lose pairs inside
    # the ±EPS boundary band)
    must_find = _exact_trigram_pairs(THRESHOLD + EPS)
    assert must_find, "fixture produced no high-similarity pairs"
    missed = must_find - est_set
    assert not missed, f"LSH missed {len(missed)} pairs above {THRESHOLD + EPS}"

    # precision: nothing far below the threshold sneaks in
    allowed = _exact_trigram_pairs(THRESHOLD - EPS)
    false_pos = est_set - allowed
    assert not false_pos, (
        f"{len(false_pos)} emitted pairs have exact Jaccard < {THRESHOLD - EPS}"
    )


@pytest.mark.usefixtures("ray_session")
def test_simhash_dedup_exact_vs_duckdb_hamming():
    import ray.data as rd

    from walk_ray.pipelines import dedup

    # the engine's own signatures (the gate pins the BLOCKING, which
    # claims exact recall at Hamming ≤ 3 by pigeonhole)
    sigs = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(dedup.SimHasher(), batch_format="pyarrow")
        .to_pandas()
    )
    sigs["sh"] = sigs["simhash"].to_numpy(dtype="uint64").view("int64")
    con = duckdb.connect()
    con.register("sigs", sigs[["doc_id", "sh"]])
    exact = con.sql("""
        SELECT a.doc_id AS a, b.doc_id AS b,
               bit_count(xor(a.sh, b.sh)) AS hamming
        FROM sigs a, sigs b
        WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
        ORDER BY a, b
    """).df()

    got = dedup.simhash_dedup(SF).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(exact)
    assert (got["a"].to_numpy() == exact["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == exact["b"].to_numpy()).all()
    assert (got["hamming"].to_numpy() == exact["hamming"].to_numpy()).all()
