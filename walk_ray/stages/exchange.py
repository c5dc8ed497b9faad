"""Raw-task hash exchange: the engine's bounded-bucket co-partition
primitive.

``Dataset.groupby(bucket).map_groups(fn)`` expresses the same thing,
but Ray Data's groupby is a SORT-based shuffle: every map block is
sorted, range-partitioned against sampled boundaries, and merged —
~5 s of fixed overhead per exchange on this cluster even for a few
hundred MB. The dedup/verify pipelines chain 3-4 such exchanges whose
keys are ALREADY small dense bucket ids (0..n_buckets-1, the repo-wide
"group by hash(key) % B, vectorize keys inside" pattern), so the sort
buys nothing. This module does the exchange directly as plain Ray
tasks over Arrow blocks:

  split:  one task per input block — optional fused ``map_fn`` first
          (map-side fusion: a row-expanding transform like an LSH
          band explosion runs HERE, so the expanded table never
          materializes in the object store as its own Dataset — at
          volume that is the difference between fitting the store
          and spilling the whole expansion to disk), then stable
          argsort by bucket id, slice into per-bucket sub-tables
          (zero Python per row)
  reduce: one task per bucket — ``pa.concat_tables`` of its slices
          from every block (per input), then the caller's reduce_fn

The all-to-all moves through the object store exactly like a Dataset
shuffle (map side materializes to plasma, spills under pressure;
blocks × buckets objects), but with no sort, no boundary sampling, no
block re-encoding. Multiple input datasets co-partition in ONE
exchange (the reduce_fn sees one concatenated table per input), which
replaces the union-with-null-columns + tag-column idiom a Dataset-only
join/verify needs.

Partitioning assumption (same as every bucketed op in this repo): the
caller picks ``n_buckets`` so one bucket's rows fit one worker's heap;
keys are hashed into buckets, so skew is bounded by the hottest
SINGLE key's volume, and reduce_fns process keys vectorized inside a
bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["bucket_exchange", "MAX_DRIVER_REFS"]

# Driver-metadata bound for the split side: the single-level exchange
# holds one ObjectRef per (input block × bucket) on the driver. Past
# this count, blocks are GROUPED and one task splits a whole group
# (reads its blocks from plasma, emits n_buckets pre-concatenated
# sub-tables), so driver refs collapse to (blocks/group × buckets).
# 2^20 refs ≈ 90 MB of driver metadata (~85 B/ref) — comfortable; at
# the auto-bucket policy (sizing.py: ≤4096 buckets) this supports
# ≥256 ungrouped input blocks per input and any count grouped.
MAX_DRIVER_REFS = 1 << 20


def _split_impl(table: pa.Table, n_buckets: int, key_cols, schema: pa.Schema,
                map_fn=None):
    """One input block → ``n_buckets`` sub-tables, bucketed by the
    (single) int bucket column named by ``key_cols[0]``.

    ``map_fn`` (optional) is applied to the block FIRST, inside this
    task — map-side fusion: a row-expanding transform (e.g. LSH band
    explosion) goes straight from its source block to bucket slices
    without the expanded table ever materializing in the object store
    as a separate Dataset."""
    if map_fn is not None:
        table = map_fn(table)
    if table.num_rows == 0 or key_cols[0] not in table.column_names:
        # empty map_groups artifacts carry no schema; emit typed empties
        empty = schema.empty_table() if schema is not None else table
        out = tuple(empty for _ in range(n_buckets))
        return out[0] if n_buckets == 1 else out
    buck = np.asarray(table[key_cols[0]].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.argsort(buck, kind="stable")
    t = table.take(pa.array(order))
    bounds = np.searchsorted(buck[order], np.arange(n_buckets + 1))
    out = tuple(t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                for i in range(n_buckets))
    return out[0] if n_buckets == 1 else out


def _split_group_impl(n_buckets: int, key_cols, schema: pa.Schema, map_fn,
                      *tables):
    """Staged split: one task handles a GROUP of input blocks — split
    each, pre-concat per bucket — so the driver holds n_buckets refs
    per group instead of per block. The concat work is the same the
    reduce side would do; it just happens one tree level earlier."""
    per_block = [_split_impl(t, n_buckets, key_cols, schema, map_fn)
                 for t in tables]
    if n_buckets == 1:
        per_block = [(p,) for p in per_block]
    out = []
    for b in range(n_buckets):
        chunk = [p[b] for p in per_block if p[b].num_rows]
        if chunk:
            out.append(pa.concat_tables(chunk, promote_options="default"))
        else:
            out.append(per_block[0][b])  # empty, carries a schema
    return tuple(out) if n_buckets > 1 else out[0]


def _reduce_impl(fn, bucket_id: int, n_inputs: int, counts, *parts):
    """One bucket: concat each input's slices, apply ``fn``."""
    tables = []
    off = 0
    for k in range(n_inputs):
        chunk = [p for p in parts[off:off + counts[k]] if p.num_rows]
        off += counts[k]
        if chunk:
            tables.append(pa.concat_tables(chunk, promote_options="default"))
        else:
            tables.append(None)
    return fn(bucket_id, *tables)


def bucket_exchange(inputs, n_buckets: int, reduce_fn, schemas=None,
                    max_driver_refs: int | None = None, map_fns=None):
    """Co-partition one or more datasets by a precomputed bucket column
    and apply ``reduce_fn`` once per bucket.

    ``inputs``: list of ``(dataset, bucket_col)`` — each dataset must
    carry an int64 column of bucket ids in ``[0, n_buckets)`` (after
    its ``map_fn``, if any).
    ``reduce_fn(bucket_id, *tables)``: one ``pa.Table`` per input (or
    ``None`` when the bucket got no rows from that input); returns a
    ``pa.Table``. Runs as a plain Ray task — it must be a module-level
    function or small closure (it is pickled once per bucket).
    ``schemas``: optional per-input schemas for typed empty blocks.
    ``max_driver_refs``: driver-metadata bound (default
    :data:`MAX_DRIVER_REFS`); when blocks × buckets would exceed it,
    the split side runs STAGED — one task per block GROUP returning
    pre-concatenated per-bucket sub-tables — so driver refs stay
    bounded at any input block count (SCALE.md §exchange).
    ``map_fns``: optional per-input ``table → table`` callables fused
    into the split task (map-side fusion). A row-EXPANDING map (LSH
    band explosion: 32 rows out per row in) should run here rather
    than as a ``map_batches`` stage: the expanded table goes straight
    to bucket slices and never materializes in the object store —
    at volume that's the difference between fitting the store and
    spilling the whole expansion to disk.

    Returns a ``ray.data.Dataset`` of the concatenated reduce outputs.
    """
    import ray
    import ray.data as rd

    if max_driver_refs is None:
        max_driver_refs = MAX_DRIVER_REFS
    split = ray.remote(_split_impl)
    split_group = ray.remote(_split_group_impl)
    reduce_ = ray.remote(_reduce_impl)

    per_input_refs = []
    for idx, (ds, col) in enumerate(inputs):
        schema = None if schemas is None else schemas[idx]
        map_fn = None if map_fns is None else map_fns[idx]
        block_refs = ds.to_arrow_refs() if hasattr(ds, "to_arrow_refs") else list(ds)
        refs = []
        group_size = -(-len(block_refs) * n_buckets // max(max_driver_refs, n_buckets))
        if group_size > 1:
            for lo in range(0, len(block_refs), group_size):
                s = split_group.options(
                    num_returns=n_buckets if n_buckets > 1 else None,
                ).remote(n_buckets, (col,), schema, map_fn,
                         *block_refs[lo:lo + group_size])
                refs.append([s] if n_buckets == 1 else s)
        else:
            for r in block_refs:
                s = split.options(
                    num_returns=n_buckets if n_buckets > 1 else None,
                ).remote(r, n_buckets, (col,), schema, map_fn)
                refs.append([s] if n_buckets == 1 else s)
        per_input_refs.append(refs)

    counts = tuple(len(refs) for refs in per_input_refs)
    out_refs = []
    for b in range(n_buckets):
        parts = [refs[bi][b] for refs in per_input_refs for bi in range(len(refs))]
        out_refs.append(reduce_.remote(reduce_fn, b, len(inputs), counts, *parts))
    return rd.from_arrow_refs(out_refs)
