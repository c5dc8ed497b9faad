"""auto_buckets: the round-5 bucket-count policy — derived from
parquet footer bytes, floored by cluster parallelism, capped by the
single-level exchange's driver-metadata bound."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from walk_ray.stages import sizing


def _write(tmp_path, n_rows, payload_bytes):
    # unique payloads: parquet's total_byte_size is the ENCODED
    # uncompressed size, so repetitive strings dictionary-collapse
    rng = np.random.default_rng(7)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, payload_bytes))
             for _ in range(n_rows)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n_rows), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p)
    return p


def test_footer_bytes_no_data_read(tmp_path):
    p = _write(tmp_path, 100, 1000)
    b = sizing.parquet_uncompressed_bytes(p)
    # encoded-uncompressed row-group size tracks the ~100 KB of payload
    assert b > 90_000


def test_auto_buckets_floor_and_scaling(tmp_path):
    p = _write(tmp_path, 10, 10)
    # tiny input → parallelism floor (lo pinned to make it deterministic)
    assert sizing.auto_buckets(p, lo=16) == 16
    # the byte term: force a small target so the size branch wins
    b = sizing.parquet_uncompressed_bytes(p)
    assert sizing.auto_buckets(p, target_bytes=max(b // 7, 1), lo=1) >= 7
    # cap: never past MAX_BUCKETS / hi
    assert sizing.auto_buckets(p, target_bytes=1, lo=1, hi=8) == 8
    big = _write(tmp_path, 200, 30)
    assert sizing.auto_buckets(big, target_bytes=1, lo=1,
                               hi=100) == 100


def test_auto_buckets_parallelism_floor_tracks_cluster(ray_session):
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 0))
    expected = max(sizing.MIN_BUCKETS, 2 * cpus)
    assert sizing._parallelism_floor() == expected


@pytest.mark.usefixtures("ray_session")
def test_auto_default_matches_explicit(tmp_path):
    """n_buckets=None (auto) must give the same ROWS as any explicit
    count — bucket count is physical, not semantic."""
    from walk_ray.pipelines.text import lm_perplexity

    sf = "/root/testdata/sf0.001"
    a = (lm_perplexity(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_perplexity(sf, n_buckets=8).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
