"""Resumable partitioned parquet sink — the engine's output contract
for corpus-scale jobs.

At 100 TB an output is never one giant file and never a write the job
cannot pick up after a mid-run failure. This sink writes Hive-style
``out_dir/<key>=<value>/part-*.parquet`` — one directory per distinct
value of a LOW-cardinality partition key (``split``, ``lang``,
``source``, a shard id) — and drops a ``_SUCCESS`` marker in each
directory only AFTER its data file is fully written and renamed into
place. A re-run with ``resume=True`` skips every partition whose
marker exists and rewrites only the missing/incomplete ones (a
partition with files but no marker is treated as torn and rewritten
from scratch).

Mechanics: rows are co-located per key value with ONE
:func:`walk_ray.stages.exchange.bucket_exchange` (``hash(value) %
n_buckets``, hashing fused into the split task), so each reduce task
owns every row of the values it writes and the write is one
sequential parquet file per (value, bucket) with no cross-task
coordination. The driver never sees data — only the skinny manifest
(value, rows, action) each reduce task returns, which is itself
reduced to a summary dict with a Dataset aggregate and persisted as
``out_dir/_manifest/`` (the ``_`` prefix keeps it invisible to
``read_parquet`` over ``out_dir``).

Scale notes: the manifest is one row per distinct key value — pick a
partition key whose cardinality is bounded (splits, languages,
input-shard ids), not ``doc_id``. Hot values are bounded by the
hottest SINGLE value's volume, same contract as every bucketed op in
this repo; a value's file is written with bounded row groups so
downstream readers can split it.
"""

from __future__ import annotations

import json
import os
from urllib.parse import quote

import numpy as np
import pyarrow as pa

__all__ = ["write_partitioned"]

_MANIFEST_SCHEMA = pa.schema([
    ("value", pa.string()),
    ("rows", pa.int64()),
    ("action", pa.string()),  # written | skipped
])


def _part_dir(out_dir: str, by: str, value) -> str:
    # quote() is injective on str(value), so distinct values never
    # collide in one directory name (Hive-compatible for the common
    # alnum case)
    return os.path.join(out_dir, f"{by}={quote(str(value), safe='')}")


def _write_one(table: pa.Table, pdir: str, bucket_id: int,
               resume: bool) -> str:
    """Write one partition's rows (all of them — the exchange
    co-located the value): data file first via tmp+rename, marker
    last. Returns the action taken."""
    marker = os.path.join(pdir, "_SUCCESS")
    if resume and os.path.exists(marker):
        return "skipped"
    import pyarrow.parquet as pq

    os.makedirs(pdir, exist_ok=True)
    for f in os.listdir(pdir):  # torn previous attempt: start clean
        os.unlink(os.path.join(pdir, f))
    fname = os.path.join(pdir, f"part-{bucket_id:05d}.parquet")
    tmp = fname + ".tmp"
    pq.write_table(table, tmp, row_group_size=65536)
    os.replace(tmp, fname)
    with open(marker, "w"):
        pass
    return "written"


def write_partitioned(ds, out_dir: str, by: str,
                      n_buckets: int | None = None,
                      resume: bool = False) -> dict:
    """Write ``ds`` as ``out_dir/<by>=<value>/part-*.parquet`` with a
    per-partition ``_SUCCESS`` marker; ``resume=True`` skips finished
    partitions. Returns a summary dict (partition/row counts by
    action); the full per-value manifest lands in
    ``out_dir/_manifest/``."""
    import ray.data as rd

    from .exchange import bucket_exchange
    from .sizing import _parallelism_floor

    if n_buckets is None:
        n_buckets = _parallelism_floor()

    def tag(t: pa.Table) -> pa.Table:
        # lazy import: the vectorized any-dtype key hasher lives with
        # the join code; importing it here (inside the task) keeps
        # stages/ free of an import-time dependency on pipelines/
        from ..pipelines.relational import _key_buckets

        if by not in t.column_names:
            raise KeyError(
                f"write_partitioned: partition column {by!r} not in "
                f"dataset columns {t.column_names}")
        vals = t[by].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part_bucket", pa.array(_key_buckets(vals, n_buckets),
                                      pa.int64()))

    def write_bucket(b: int, t: pa.Table | None) -> pa.Table:
        if t is None or t.num_rows == 0:
            return _MANIFEST_SCHEMA.empty_table()
        t = t.drop_columns(["__part_bucket"])
        import pandas as pd

        keys = t[by].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(pd.Series(keys), sort=True)
        order = np.argsort(codes, kind="stable")
        sorted_t = t.take(pa.array(order))
        bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
        values, rows, actions = [], [], []
        for i, v in enumerate(uniq):
            part = sorted_t.slice(int(bounds[i]),
                                  int(bounds[i + 1] - bounds[i]))
            action = _write_one(part, _part_dir(out_dir, by, v), b, resume)
            values.append(str(v))
            rows.append(part.num_rows)
            actions.append(action)
        return pa.table({"value": pa.array(values, pa.string()),
                         "rows": pa.array(rows, pa.int64()),
                         "action": pa.array(actions, pa.string())})

    os.makedirs(out_dir, exist_ok=True)
    manifest = bucket_exchange([(ds, "__part_bucket")], n_buckets,
                               write_bucket, map_fns=[tag])
    mdir = os.path.join(out_dir, "_manifest")
    if os.path.isdir(mdir):  # stale manifest from the failed attempt
        for f in os.listdir(mdir):
            os.unlink(os.path.join(mdir, f))
    manifest = manifest.materialize()
    manifest.write_parquet(mdir)
    # summary via Dataset aggregate — the driver never materializes
    # the manifest rows themselves
    agg = (manifest.groupby("action")
           .aggregate(rd.aggregate.Count(), rd.aggregate.Sum("rows"))
           .take_all())
    summary = {"out_dir": out_dir, "by": by, "n_buckets": int(n_buckets),
               "partitions_written": 0, "partitions_skipped": 0,
               "rows_written": 0, "rows_skipped": 0}
    for row in agg:
        act = row["action"]
        summary[f"partitions_{act}"] = int(row["count()"])
        summary[f"rows_{act}"] = int(row["sum(rows)"])
    with open(os.path.join(out_dir, "_summary.json"), "w") as f:
        json.dump(summary, f)
    return summary
