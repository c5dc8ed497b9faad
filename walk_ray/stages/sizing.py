"""Bucket-count sizing: derive ``n_buckets`` from input volume.

The exchange contract (``stages/exchange.py:27-31``) requires the
caller to pick ``n_buckets`` so ONE bucket's rows fit one worker's
heap. Through round 4 every bucketed op hardcoded 64 — fine at sandbox
scale, silently wrong at 100 TB (64 buckets over 100 TB ≈ 1.6 TB per
bucket). This module makes the default a function of the input:

    n_buckets = clamp(ceil(uncompressed_bytes / BUCKET_TARGET_BYTES),
                      parallelism_floor, MAX_BUCKETS)

- **bytes** come from parquet footers only (row-group
  ``total_byte_size`` = encoded-but-uncompressed bytes — what actually
  moves through an exchange; dictionary-heavy columns count small,
  which is the honest measure) — O(#files) metadata reads, never a
  data scan, same pattern as ``text._docs_count``.
- **BUCKET_TARGET_BYTES** (256 MB) is sized to the reference worker
  shape this repo designs for (128 GiB / 32 CPUs → ~4 GiB heap per
  worker slot): a reduce materializes one bucket plus pandas/Arrow
  working copies, so 256 MB input leaves >10× headroom.
- **parallelism floor**: at least 2 reduce tasks per cluster CPU so
  the reduce wave saturates the cluster even on small inputs (16 when
  Ray isn't up yet — the 4-CPU test fixture's shape).
- **MAX_BUCKETS** (4096) bounds the driver-side blocks×buckets
  ObjectRef matrix of the single-level exchange. 4096 × 256 MB ≈ 1 TB
  of *exchanged rows* per op — note the exchanged rows are usually a
  skinny projection of the input (ids + one key column), so the
  corpus this supports is far larger. Past that, raise the cap
  explicitly or use the staged exchange (see SCALE.md §exchange).

Callers pass ``n_buckets=None`` (the new default) to opt in; an
explicit integer still wins — bucket count stays a physical knob, and
every op's semantics are bucket-count independent (pinned by the
shard-independence tests).
"""

from __future__ import annotations

import glob
import os

__all__ = ["auto_buckets", "parquet_uncompressed_bytes",
           "BUCKET_TARGET_BYTES", "MIN_BUCKETS", "MAX_BUCKETS"]

BUCKET_TARGET_BYTES = 256 << 20
MIN_BUCKETS = 16
MAX_BUCKETS = 4096


def parquet_uncompressed_bytes(path: str) -> int:
    """Total uncompressed byte size of a parquet file or directory,
    from row-group footer metadata only (no data read)."""
    import pyarrow.parquet as pq

    files = (sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True))
             if os.path.isdir(path) else [path])
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
    return total


def _parallelism_floor() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(MIN_BUCKETS,
                       2 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return MIN_BUCKETS


def auto_buckets(path: str,
                 target_bytes: int = BUCKET_TARGET_BYTES,
                 lo: int | None = None,
                 hi: int = MAX_BUCKETS) -> int:
    """Bucket count for an exchange whose rows derive from the parquet
    input at ``path``: enough buckets that one bucket's share of the
    input fits ``target_bytes``, at least the parallelism floor, at
    most ``hi`` (the single-level exchange's driver-metadata bound)."""
    n_bytes = parquet_uncompressed_bytes(path)
    need = -(-n_bytes // target_bytes)  # ceil
    floor = _parallelism_floor() if lo is None else lo
    return int(min(max(need, floor), hi))
