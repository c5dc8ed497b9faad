"""End-to-end training-corpus preparation — the composed flagship of
the data-hygiene suite: quality filter → chunk-level exact dedup (with
document reassembly) → deterministic split assignment, all as ONE lazy
Dataset program.

Composition is the point: each stage is an existing operator
(`text.quality_of`, `dedup.chunk_dedup`, `text.hash_split`'s md5-
boundary rule) chained without materialization — the filter is a
vectorized map, the dedup's two bounded bucket exchanges are the only
wide steps, and split assignment is a pure map on the survivors. The
whole pipeline is SQL-expressible, so the full chain is DuckDB-oracle
checked end to end (the strongest correctness gate a composition can
carry).
"""

from __future__ import annotations

import hashlib

import pandas as pd

__all__ = ["prepare_corpus", "PREP_MIN_QUALITY"]

PREP_MIN_QUALITY = 0.5  # keeps ~54% of the synthetic corpus — a real
                        # filter, not a pass-through

_SPLIT_BOUNDS = (("train", 900_000), ("val", 950_000), ("test", 1_000_000))


def prepare_corpus(sf_dir: str, min_quality: float = PREP_MIN_QUALITY,
                   chunk_words: int = 5, n_buckets: int | None = None,
                   out_dir: str | None = None, resume: bool = False):
    """documents → (doc_id, clean_text, n_chunks_kept, n_chunks_total,
    split) for every doc that (a) scores ≥ ``min_quality`` on the
    repo-wide clamped linear quality heuristic and (b) still owns at
    least one first-occurrence chunk after global chunk dedup.

    With ``out_dir`` the result is not returned as a Dataset but
    written as resumable split-partitioned parquet
    (``out_dir/split=train/...`` + per-partition ``_SUCCESS``; see
    :func:`walk_ray.stages.sink.write_partitioned`) and the write
    summary dict is returned; ``resume=True`` skips finished
    partitions of an interrupted previous run."""
    import ray.data as rd

    from .dedup import chunk_dedup
    from .text import _quality_arrays

    def keep_quality(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        qa = _quality_arrays(pc.fill_null(t["text"].combine_chunks(), ""))
        return t.filter(pa.array(qa["quality"] >= min_quality))

    docs = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(keep_quality, batch_format="pyarrow")
    )

    deduped = chunk_dedup(sf_dir, chunk_words=chunk_words,
                          n_buckets=n_buckets, docs=docs)

    import numpy as np
    import pyarrow as pa

    his = np.array([hi for _, hi in _SPLIT_BOUNDS], dtype=np.int64)
    names = np.array([name for name, _ in _SPLIT_BOUNDS], dtype=object)

    def assign_split(t: pa.Table) -> pa.Table:
        # hash_split's vectorized boundary rule (md5 per row is the
        # semantic contract shared with the oracle; the bounds lookup
        # is one searchsorted, no per-row inner loop or table copy)
        vals = t["doc_id"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 1_000_000
             for v in vals), dtype=np.int64, count=len(vals))
        idx = np.minimum(np.searchsorted(his, h, side="right"), len(his) - 1)
        return t.append_column("split", pa.array(names[idx], pa.string()))

    out = deduped.map_batches(assign_split, batch_format="pyarrow")
    if out_dir is not None:
        from ..stages.sink import write_partitioned

        return write_partitioned(out, out_dir, by="split", resume=resume)
    return out
