"""Relational / streaming-shaped operators over the TPC-H-ish testdata
tables — the generic query capabilities of the engine (grouped
aggregates with partial pre-aggregation, broadcast joins, windowed and
sessionized event analytics, as-of lookups).

Column names are chosen to match the DuckDB oracle SQL exactly
(driver compare is name-sensitive).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "pricing_summary",
    "orders_by_nation",
    "events_tumbling_window",
    "events_hopping_window",
    "events_sessionize",
    "latest_event_per_user",
    "top_parts_by_revenue",
    "hash_join",
    "asof_join",
    "orders_by_nation_shuffle",
    "events_last_order",
]


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: lineitem grouped pricing summary.

    Pre-aggregates inside map_batches (partials per batch), then a
    small groupby over partials — the shuffle moves one row per
    (flag, status) per batch instead of every lineitem row.
    """
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow kernels end-to-end: compute + hash-aggregate
        # in C++, no pandas materialization
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.append_column("revenue", revenue)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("revenue", "sum"), ("l_quantity", "count")]
        )
        renames = {"l_quantity_sum": "sum_qty", "l_extendedprice_sum": "sum_base_price",
                   "revenue_sum": "sum_revenue", "l_quantity_count": "count_order"}
        return g.rename_columns([renames.get(c, c) for c in g.column_names])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_revenue", alias_name="sum_revenue"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def round_cols(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base_price", "sum_revenue"):
            batch[c] = batch[c].round(4)
        batch["count_order"] = batch["count_order"].astype("int64")
        return batch

    return out.map_batches(round_cols, batch_format="pandas")


def orders_by_nation(sf_dir: str):
    """Broadcast join: orders ⋈ customer ⋈ nation (dimension sides are
    small → ``ray.put`` once, dict-merge per block; no shuffle join).
    The broadcast lookup + per-block partial aggregation fuse into the
    exchange split task and the 25-key final sum completes per hash
    bucket — the Dataset sort-shuffle this replaced paid its ~1.5 s
    fixed cost to sort one row per nation per block."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust_map = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nation_map = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put((cust_map, nation_map))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        # ray.get on a shared plasma object is a zero-copy read per task
        cust_m, nation_m = ray.get(ref)
        df = t.to_pandas()
        df["n_name"] = df["o_custkey"].map(cust_m).map(nation_m)
        g = (df.groupby("n_name", as_index=False)
             .agg(n_orders=("o_totalprice", "size"),
                  total_price=("o_totalprice", "sum")))
        return _nation_partial_table(g)

    return _nation_sum_exchange(orders, partial)


_NATION_NB = 8  # 25 nations → a handful of buckets is plenty

_NATION_PART_SCHEMA = None


def _nation_part_schema():
    global _NATION_PART_SCHEMA
    if _NATION_PART_SCHEMA is None:
        _NATION_PART_SCHEMA = pa.schema([
            ("n_name", pa.string()), ("n_orders", pa.int64()),
            ("total_price", pa.float64()), ("bucket", pa.int64())])
    return _NATION_PART_SCHEMA


def _nation_partial_table(g: pd.DataFrame) -> pa.Table:
    """Partial rows (one per nation per block) + bucket id."""
    from zlib import crc32

    names = g["n_name"].to_numpy()
    bucket = np.fromiter((crc32(s.encode()) % _NATION_NB for s in names),
                         dtype=np.int64, count=len(names))
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_orders": pa.array(g["n_orders"].to_numpy(), pa.int64()),
        "total_price": pa.array(g["total_price"].to_numpy(), pa.float64()),
        "bucket": pa.array(bucket, pa.int64())}).cast(_nation_part_schema())


def _nation_sum_exchange(ds, partial_fn):
    """Shared finish for both orders_by_nation variants: fuse the
    partial into the split task, sum per bucket, round like the SQL."""
    from walk_ray.stages.exchange import bucket_exchange

    out_schema = pa.schema([("n_name", pa.string()),
                            ("n_orders", pa.int64()),
                            ("total_price", pa.float64())])

    def combine(_b: int, t) -> pa.Table:
        if t is None or not t.num_rows:
            return out_schema.empty_table()
        g = t.group_by("n_name").aggregate(
            [("n_orders", "sum"), ("total_price", "sum")])
        # np.round, not pc.round: Arrow rounds to a different nearest
        # double in the last ulp and the oracle hash compares reprs
        tp = np.round(g["total_price_sum"].to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "n_name": g["n_name"],
            "n_orders": g["n_orders_sum"].cast(pa.int64()),
            "total_price": pa.array(tp, pa.float64())})

    return bucket_exchange([(ds, "bucket")], _NATION_NB, combine,
                           schemas=[_nation_part_schema()],
                           map_fns=[partial_fn])


def events_tumbling_window(sf_dir: str, window_sec: int = 3600):
    """Streaming-shaped tumbling window: count + sum(value) per
    (event_type, hour window). Window id + per-block partial agg fuse
    into the exchange split task; the exchange moves one row per
    (type, window) per block and each hash bucket completes the sums
    (exchange instead of Dataset.groupby: dense-hash-bucket keys,
    see stages/exchange.py)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    from zlib import crc32

    from walk_ray.stages.exchange import bucket_exchange

    NB = 32
    win_schema = pa.schema([("event_type", pa.string()),
                            ("window_start", pa.int64()),
                            ("n_events", pa.int64()),
                            ("sum_value", pa.float64()),
                            ("bucket", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        # fused split-side map: window id + per-block partial agg —
        # the exchange moves one row per (type, window) per block
        secs = pc.divide(pc.cast(batch["ts"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.floor(pc.divide(pc.cast(secs, pa.float64()), window_sec)), window_sec)
        t = pa.table({"event_type": batch["event_type"],
                      "window_start": pc.cast(win, pa.int64()),
                      "value": batch["value"]})
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")])
        et = g["event_type"].combine_chunks()
        enc = pc.dictionary_encode(et)
        th = np.fromiter((crc32(s.encode()) for s in enc.dictionary.to_pylist()),
                         dtype=np.int64, count=len(enc.dictionary))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ws = g["window_start"].to_numpy(zero_copy_only=False)
        bucket = (th[codes] ^ ws) % np.int64(NB)
        return pa.table({"event_type": et,
                         "window_start": g["window_start"],
                         "n_events": g["value_count"].cast(pa.int64()),
                         "sum_value": g["value_sum"].cast(pa.float64()),
                         "bucket": pa.array(bucket, pa.int64())})

    out_schema = pa.schema([("event_type", pa.string()),
                            ("window_start", pa.int64()),
                            ("n_events", pa.int64()),
                            ("sum_value", pa.float64())])

    def combine(_b: int, t) -> pa.Table:
        if t is None or not t.num_rows:
            return out_schema.empty_table()
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")])
        # np.round, not pc.round: Arrow rounds to a different nearest
        # double in the last ulp and the oracle hash compares reprs
        sv = np.round(g["sum_value_sum"].to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "event_type": g["event_type"],
            "window_start": g["window_start"],
            "n_events": g["n_events_sum"].cast(pa.int64()),
            "sum_value": pa.array(sv, pa.float64())})

    return bucket_exchange([(ds, "bucket")], NB, combine,
                           schemas=[win_schema], map_fns=[partial])


def _bucket_col(vals, n_buckets: int = 64) -> np.ndarray:
    """Stable key → verify-partition bucket (bounded group count; the
    per-key work is vectorized WITHIN each bucket, so group overhead
    never scales with key cardinality)."""
    return (np.asarray(vals, dtype=np.int64) % n_buckets).astype(np.int64)


def _key_buckets(vals, n_buckets: int) -> np.ndarray:
    """Vectorized join-key → bucket: a u64 mix for integer keys; for
    other dtypes, blake2b once per UNIQUE value (factorized) — never
    one Python hash call per row."""
    import hashlib as _hl

    arr = np.asarray(vals)
    if arr.dtype.kind in "iu":
        x = arr.astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(29)
        return (x % np.uint64(n_buckets)).astype(np.int64)
    codes, uniq = pd.factorize(pd.Series(vals))
    hb = np.fromiter(
        (int.from_bytes(_hl.blake2b(str(v).encode(), digest_size=4).digest(),
                        "big") % n_buckets for v in uniq),
        dtype=np.int64, count=len(uniq))
    return hb[codes]


def _tag_bucket(key: str, n_buckets: int):
    """Split-side map_fn: append the join-key bucket column."""
    def _t(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket",
            pa.array(_key_buckets(t[key].to_numpy(zero_copy_only=False),
                                  n_buckets), pa.int64()))
    return _t


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset; pandas-block datasets report numpy
    dtypes (and bare ``object`` for strings) — map those best-effort,
    it only seeds typed EMPTY frames."""
    s = ds.schema()
    fields = []
    for nm, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, ValueError, pa.ArrowNotImplementedError):
                t = pa.string()
        fields.append((nm, t))
    return pa.schema(fields)


def events_sessionize(sf_dir: str, gap_sec: int = 1800):
    """Session windows per user: a new session starts when the gap
    from the previous event exceeds ``gap_sec``. Users co-partition
    into a bounded number of hash buckets; sessions for EVERY user in
    a bucket compute in one vectorized pass (sort + boundary cumsum),
    so group count — and per-group overhead — is independent of user
    cardinality."""
    from walk_ray.stages.exchange import bucket_exchange

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket",
            pa.array(_bucket_col(t["user_id"].to_numpy(zero_copy_only=False)),
                     pa.int64()))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = (g["ts"].astype("int64") // 1_000_000).to_numpy()
        users = g["user_id"].to_numpy()
        new_user = np.r_[True, users[1:] != users[:-1]]
        gap = np.r_[gap_sec + 1, ts[1:] - ts[:-1]]
        sid = np.cumsum(new_user | (gap > gap_sec))  # global session ids
        agg = (
            pd.DataFrame({"user_id": users, "ts_sec": ts, "value": g["value"].to_numpy(),
                          "session": sid})
            .groupby("session", as_index=False)
            .agg(user_id=("user_id", "first"), session_start=("ts_sec", "min"),
                 n_events=("ts_sec", "size"), sum_value=("value", "sum"))
        )
        agg["sum_value"] = agg["sum_value"].round(4)
        return agg[["user_id", "session_start", "n_events", "sum_value"]]

    sess_schema = pa.schema([("user_id", pa.int64()),
                             ("session_start", pa.int64()),
                             ("n_events", pa.int64()),
                             ("sum_value", pa.float64())])

    def sessions_reduce(_b: int, t) -> pa.Table:
        # every user in the bucket sessionizes in one vectorized pass
        # (exchange instead of Dataset.groupby(bucket).map_groups: the
        # key is already a dense hash bucket, the sort buys nothing)
        if t is None or not t.num_rows:
            return sess_schema.empty_table()
        return pa.Table.from_pandas(
            sessions(t.drop_columns(["__bucket"]).to_pandas()),
            preserve_index=False).cast(sess_schema)

    return bucket_exchange([(ds, "__bucket")], 64, sessions_reduce,
                           map_fns=[add_bucket])


def latest_event_per_user(sf_dir: str):
    """As-of-style lookup (J3 analog on the events log): each user's
    latest event (max ts; ties broken by max event_id). Bucketed like
    sessionize — one vectorized drop_duplicates per bucket."""
    from walk_ray.stages.exchange import bucket_exchange

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        # per-block partial: keep only each user's block-local latest
        # row, so the exchange moves ≤ users-per-block rows per block
        g = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                      kind="mergesort")
        g = g.drop_duplicates("user_id", keep="last")
        g["__bucket"] = _bucket_col(g["user_id"])
        return pa.Table.from_pandas(g, preserve_index=False)

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = g.drop_duplicates("user_id", keep="last")
        return g[["user_id", "event_id", "event_type", "value"]]

    def latest_reduce(_b: int, t) -> pa.Table:
        if t is None or not t.num_rows:
            return pa.schema([("user_id", pa.int64()),
                              ("event_id", pa.int64()),
                              ("event_type", pa.string()),
                              ("value", pa.float64())]).empty_table()
        return pa.Table.from_pandas(
            latest(t.drop_columns(["__bucket"]).to_pandas()),
            preserve_index=False)

    return bucket_exchange([(ds, "__bucket")], 64, latest_reduce,
                           map_fns=[add_bucket])


def top_parts_by_revenue(sf_dir: str, k: int = 20):
    """Top-k: revenue per part over lineitem. The per-batch partial
    aggregation fuses into the exchange split task, each hash(part)
    bucket completes its sums and emits only its LOCAL top-k (a part
    lives wholly in one bucket, so the union of per-bucket top-ks
    contains the global top-k), and the final sort touches just
    n_buckets × k rows. A Dataset.groupby+sort here would sort-shuffle
    every part row to produce 20 — the dense-hash-bucket case
    stages/exchange.py exists for."""
    import numpy as np

    from walk_ray.stages.exchange import bucket_exchange

    NB = 64
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    part_schema = pa.schema([("l_partkey", pa.int64()),
                             ("revenue", pa.float64()),
                             ("bucket", pa.int64())])

    def rev(batch: pa.Table) -> pa.Table:
        # fused split-side map: the exchange carries one row per
        # distinct partkey per block
        r = pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"l_partkey": batch["l_partkey"], "revenue": r})
        g = t.group_by(["l_partkey"]).aggregate([("revenue", "sum")])
        pk = g["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_partkey": pa.array(pk, pa.int64()),
                         "revenue": g["revenue_sum"].cast(pa.float64()),
                         "bucket": pa.array(pk % np.int64(NB), pa.int64())})

    out_schema = pa.schema([("l_partkey", pa.int64()),
                            ("revenue", pa.float64())])

    def topk_reduce(_b: int, t) -> pa.Table:
        if t is None or not t.num_rows:
            return out_schema.empty_table()
        g = t.group_by(["l_partkey"]).aggregate([("revenue", "sum")])
        pk = g["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rv = g["revenue_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, -rv))[:k]
        return pa.table({"l_partkey": pa.array(pk[order], pa.int64()),
                         "revenue": pa.array(rv[order], pa.float64())})

    out = (
        bucket_exchange([(ds, "bucket")], NB, topk_reduce,
                        schemas=[part_schema], map_fns=[rev])
        .sort(["revenue", "l_partkey"], descending=[True, False])
        .limit(k)
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue"] = batch["revenue"].round(4)
        return batch

    return out.map_batches(finish, batch_format="pandas")


def orders_by_nation_shuffle(sf_dir: str, engine: str = "bucketed",
                             n_buckets: int = 64):
    """orders ⋈ customer via the partitioned hash join (the
    no-broadcast path for when the dimension side is NOT small), then
    the nation lookup (25 rows — genuinely broadcastable) and the same
    grouped aggregate as :func:`orders_by_nation`. Same oracle SQL.
    ``engine`` selects the join implementation (see :func:`hash_join`)."""
    import ray

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = hash_join(orders, customer, "o_custkey", "c_custkey", engine=engine,
                       n_buckets=n_buckets)

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nation_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def partial(t: pa.Table) -> pa.Table:
        nation_m = ray.get(nation_ref)
        df = t.select(["c_nationkey", "o_totalprice"]).to_pandas()
        df["n_name"] = df["c_nationkey"].map(nation_m)
        g = (df.groupby("n_name", as_index=False)
             .agg(n_orders=("o_totalprice", "size"),
                  total_price=("o_totalprice", "sum")))
        return _nation_partial_table(g)

    return _nation_sum_exchange(joined, partial)


def hash_join(left, right, left_on: str, right_on: str, n_buckets: int = 64,
              how: str = "inner", engine: str = "bucketed"):
    """Distributed partitioned hash join.

    ``engine="native"`` delegates to ``Dataset.join`` (Ray ≥2.46's
    hash-shuffle join) with ``n_buckets`` partitions — NOTE its
    aggregator actor pool needs CPU headroom and can stall a
    fully-subscribed small cluster, so it is opt-in.
    ``engine="bucketed"`` (default) is this engine's own portable
    construction —
    both sides bucket by ``hash(key) % n_buckets``, union, and each
    bucket merges locally with a vectorized pandas merge inside
    ``map_groups`` — kept as the fallback for Ray builds without the
    native operator and as the substrate :func:`asof_join` (which has
    no native equivalent) builds on. Buckets (not keys) are the
    groups, so group count stays bounded regardless of key cardinality
    — the shape for joining two LARGE tables where neither side can
    broadcast.

    Schemas are aligned for the bucketed union by adding the other
    side's columns as nulls; ``__side`` tags rows. Key columns may
    differ in name (``left_on``/``right_on``).
    """
    import hashlib as _hl

    if engine == "native" and hasattr(type(left), "join"):
        j = left.join(
            right,
            "inner" if how == "inner" else f"{how}_outer",
            num_partitions=n_buckets,
            on=(left_on,),
            right_on=(right_on,),
            aggregator_ray_remote_args={"num_cpus": 0.5},
        )
        if right_on != left_on:
            # the native join drops the right key column; restore it
            # (equal to the left key on inner matches) for schema
            # parity with the bucketed path / pandas merge
            def restore_key(batch: pd.DataFrame) -> pd.DataFrame:
                if right_on not in batch.columns:
                    batch[right_on] = batch[left_on]
                return batch

            j = j.map_batches(restore_key, batch_format="pandas")
        return j

    from walk_ray.stages.exchange import bucket_exchange

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lempty = lschema.empty_table().to_pandas()
    rempty = rschema.empty_table().to_pandas()
    out_dtypes = lempty.merge(rempty, left_on=left_on, right_on=right_on,
                              how=how).dtypes

    def merge_reduce(_b: int, lt, rt) -> pa.Table:
        # both sides arrive co-partitioned with native dtypes — no
        # union, no null-padding upcast, no __side split
        lg = (lt.drop_columns(["__bucket"]).to_pandas()
              if lt is not None and lt.num_rows else lempty)
        rg = (rt.drop_columns(["__bucket"]).to_pandas()
              if rt is not None and rt.num_rows else rempty)
        out = lg.merge(rg, left_on=left_on, right_on=right_on, how=how)
        for c, dt in out_dtypes.items():
            # canonical per-bucket schema; tolerate outer-join NaN
            # upcasts that a lossless cast can't undo
            if out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (TypeError, ValueError):
                    pass
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucket_exchange(
        [(left, "__bucket"), (right, "__bucket")], n_buckets, merge_reduce,
        map_fns=[_tag_bucket(left_on, n_buckets),
                 _tag_bucket(right_on, n_buckets)])


def asof_join(left, right, left_key: str, right_key: str, left_time: str,
              right_time: str, n_buckets: int = 64, suffix: str = "_r"):
    """Distributed AS-OF join: each left row matches the LATEST right
    row with the same key and ``right_time <= left_time`` (inner —
    unmatched left rows drop). Same bucketed co-partition as
    :func:`hash_join`; inside a bucket the match is a vectorized
    ``pandas.merge_asof`` (backward direction) over time-sorted
    frames. Group count = n_buckets, independent of key cardinality.
    """
    from walk_ray.stages.exchange import bucket_exchange

    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    lempty = _arrow_schema(left).empty_table().to_pandas()
    rempty = _arrow_schema(right).empty_table().to_pandas()

    rename_right = {c: c + suffix for c in right_cols if c in left_cols}
    rk = rename_right.get(right_key, right_key)
    rt = rename_right.get(right_time, right_time)

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        rg = rg.rename(columns=rename_right)
        # distinct time dtypes across sides (e.g. timestamp vs date)
        # — align pairwise before the ordered merge (also on the
        # empty path, so every bucket emits the same schema)
        for a_col, b_col in ((left_time, rt), (left_key, rk)):
            if lg[a_col].dtype != rg[b_col].dtype:
                try:
                    rg[b_col] = rg[b_col].astype(lg[a_col].dtype)
                except (TypeError, ValueError):
                    lg[a_col] = lg[a_col].astype(rg[b_col].dtype)
        if lg.empty or rg.empty:
            out = lg.copy()
            for c in rg.columns:
                if c not in out.columns:
                    out[c] = rg[c][:0]
            return out[:0]
        lg = lg.sort_values(left_time, kind="mergesort")
        rg = rg.sort_values(rt, kind="mergesort")
        out = pd.merge_asof(
            lg, rg, left_on=left_time, right_on=rt,
            left_by=left_key, right_by=rk, direction="backward",
        )
        return out[out[rt].notna()]  # inner semantics

    out_dtypes = merge(lempty.copy(), rempty.copy()).dtypes

    def merge_reduce(_b: int, lt, rt_) -> pa.Table:
        lg = (lt.drop_columns(["__bucket"]).to_pandas()
              if lt is not None and lt.num_rows else lempty.copy())
        rg = (rt_.drop_columns(["__bucket"]).to_pandas()
              if rt_ is not None and rt_.num_rows else rempty.copy())
        out = merge(lg, rg)
        for c, dt in out_dtypes.items():
            # canonical per-bucket schema: the NaN-upcasts merge_asof
            # introduces are cast back losslessly after the inner
            # filter (no nulls survive it)
            if out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (TypeError, ValueError):
                    pass
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucket_exchange(
        [(left, "__bucket"), (right, "__bucket")], n_buckets, merge_reduce,
        map_fns=[_tag_bucket(left_key, n_buckets),
                 _tag_bucket(right_key, n_buckets)])


def events_last_order(sf_dir: str):
    """AS-OF join over the testdata: each event matched to its user's
    most recent order at/before the event time. Output (event_id,
    last_order_ts epoch-seconds) — deterministic even under order-date
    ties (the matched DATE is the value). DuckDB twin: native
    ``ASOF JOIN``."""
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    j = asof_join(events, orders, "user_id", "o_custkey", "ts", "o_orderdate")

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"event_id": batch["event_id"].astype("int64")})
        out["last_order_ts"] = (
            pd.to_datetime(batch["o_orderdate"]).astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        ).astype("int64")
        return out

    return j.map_batches(project, batch_format="pandas")


def events_hopping_window(sf_dir: str, window_sec: int = 3600, hop_sec: int = 900):
    """Hopping (sliding) window aggregate: count + sum(value) per
    (event_type, window) where windows are ``window_sec`` wide and
    start every ``hop_sec`` — each event lands in
    ``window_sec/hop_sec`` overlapping windows.

    Same exchange shape as :func:`events_tumbling_window` (the keys
    hash into dense buckets, so the Dataset sort-shuffle this replaced
    paid its fixed cost for nothing): the k-way expansion, the
    per-block partial aggregation and the bucket id all fuse into the
    exchange split task, over dictionary CODES — event types repeat as
    int32 codes, the (code, window) partial is one factorize+bincount,
    and type strings materialize once per distinct output row."""
    from zlib import crc32

    from walk_ray.stages.exchange import bucket_exchange

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    k = window_sec // hop_sec  # windows per event
    NB = 32

    win_schema = pa.schema([("event_type", pa.string()),
                            ("window_start", pa.int64()),
                            ("n_events", pa.int64()),
                            ("sum_value", pa.float64()),
                            ("bucket", pa.int64())])

    def expand_partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n:
            return win_schema.empty_table()
        secs = (pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
                // 1_000_000)
        base = (secs // hop_sec) * hop_sec  # latest window containing t
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch["value"].to_numpy(zero_copy_only=False)
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_sec, n)
        # (code, window) composite fits int64: epoch seconds < 2^31
        comp = (np.repeat(codes, k) << np.int64(32)) | starts
        grp, uniq = pd.factorize(comp)
        cnt = np.bincount(grp).astype(np.int64)
        sv = np.bincount(grp, weights=np.repeat(vals, k))
        uniq = np.asarray(uniq, dtype=np.int64)
        ucode, ustart = uniq >> np.int64(32), uniq & np.int64(0xFFFFFFFF)
        th = np.fromiter((crc32(s.encode())
                          for s in enc.dictionary.to_pylist()),
                         dtype=np.int64, count=len(enc.dictionary))
        return pa.table({
            "event_type": pc.take(enc.dictionary, pa.array(ucode)),
            "window_start": pa.array(ustart, pa.int64()),
            "n_events": pa.array(cnt, pa.int64()),
            "sum_value": pa.array(sv, pa.float64()),
            "bucket": pa.array((th[ucode] ^ ustart) % np.int64(NB),
                               pa.int64())}).cast(win_schema)

    out_schema = pa.schema([("event_type", pa.string()),
                            ("window_start", pa.int64()),
                            ("n_events", pa.int64()),
                            ("sum_value", pa.float64())])

    def combine(_b: int, t) -> pa.Table:
        if t is None or not t.num_rows:
            return out_schema.empty_table()
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")])
        # np.round, not pc.round: Arrow rounds to a different nearest
        # double in the last ulp and the oracle hash compares reprs
        sv = np.round(g["sum_value_sum"].to_numpy(zero_copy_only=False), 4)
        return pa.table({
            "event_type": g["event_type"],
            "window_start": g["window_start"],
            "n_events": g["n_events_sum"].cast(pa.int64()),
            "sum_value": pa.array(sv, pa.float64())})

    return bucket_exchange([(ds, "bucket")], NB, combine,
                           schemas=[win_schema], map_fns=[expand_partial])
