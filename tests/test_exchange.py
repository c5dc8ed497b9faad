"""bucket_exchange: the raw-task co-partition primitive. Ops exercise
it indirectly everywhere; these pin the primitive's own contract —
especially the round-5 STAGED split path (driver-ref bound)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from walk_ray.stages.exchange import bucket_exchange


def _mk_ds(n_rows, n_buckets, n_blocks, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": rng.integers(0, 1000, n_rows),
        "v": rng.integers(0, 100, n_rows),
    })
    df["bucket"] = (df["k"] % n_buckets).astype("int64")
    return rd.from_pandas(df).repartition(n_blocks), df


def _make_sum_reduce():
    # a CLOSURE (cloudpickled by value): a module-level function here
    # would pickle by reference and fail to import inside workers
    schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])

    def _sum_reduce(b: int, t):
        if t is None or t.num_rows == 0:
            return schema.empty_table()
        g = t.to_pandas().groupby("k", sort=True)["v"].sum().reset_index(name="s")
        return pa.Table.from_pandas(g, schema=schema, preserve_index=False)

    return _sum_reduce


@pytest.mark.usefixtures("ray_session")
def test_staged_split_matches_single_level():
    """Forcing the driver-ref bound low makes every block group —
    results must be identical to the per-block split."""
    ds, df = _mk_ds(5000, 8, 12)
    a = (bucket_exchange([(ds, "bucket")], 8, _make_sum_reduce())
         .to_pandas().sort_values("k").reset_index(drop=True))
    ds2, _ = _mk_ds(5000, 8, 12)
    b = (bucket_exchange([(ds2, "bucket")], 8, _make_sum_reduce(),
                         max_driver_refs=8)  # 12 blocks x 8 buckets >> 8
         .to_pandas().sort_values("k").reset_index(drop=True))
    expected = (df.groupby("k", sort=True)["v"].sum().reset_index(name="s")
                .astype({"k": "int64", "s": "int64"}))
    pd.testing.assert_frame_equal(a, expected)
    pd.testing.assert_frame_equal(b, expected)


@pytest.mark.usefixtures("ray_session")
def test_staged_split_multi_input():
    """Two inputs co-partition in one exchange under the staged path."""
    ds1, df1 = _mk_ds(2000, 4, 6, seed=5)
    ds2, df2 = _mk_ds(1000, 4, 5, seed=9)

    out_schema = pa.schema([("bucket", pa.int64()), ("n1", pa.int64()),
                            ("n2", pa.int64())])

    def count_both(b: int, t1, t2):
        return pa.table({
            "bucket": pa.array([b], pa.int64()),
            "n1": pa.array([0 if t1 is None else t1.num_rows], pa.int64()),
            "n2": pa.array([0 if t2 is None else t2.num_rows], pa.int64()),
        }).cast(out_schema)

    got = (bucket_exchange([(ds1, "bucket"), (ds2, "bucket")], 4, count_both,
                           max_driver_refs=4)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    want1 = df1.groupby("bucket").size()
    want2 = df2.groupby("bucket").size()
    for _, r in got.iterrows():
        assert r["n1"] == want1.get(r["bucket"], 0)
        assert r["n2"] == want2.get(r["bucket"], 0)


def _make_expander():
    """A row-expanding fused map: each input row emits 3 rows whose
    bucket column the map itself derives (the source has none) — the
    map-side-fusion shape every LSH/bigram explosion uses."""
    schema = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                        ("bucket", pa.int64())])

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.arange(3, dtype=np.int64)
        kk = np.repeat(k, 3)
        vv = np.repeat(v, 3) + np.tile(rep, len(k))
        return pa.table({"k": pa.array(kk, pa.int64()),
                         "v": pa.array(vv, pa.int64()),
                         "bucket": pa.array((kk + np.tile(rep, len(k))) % 4,
                                            pa.int64())})

    return schema, expand


@pytest.mark.usefixtures("ray_session")
def test_fused_map_matches_prestaged_dataset():
    """map_fns fusion must equal the same expansion run as its own
    map_batches Dataset feeding a plain exchange — on BOTH the
    single-level and the staged split path."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 50, 400),
                       "v": rng.integers(0, 9, 400)})
    schema, expand = _make_expander()

    # reference plan: materialized expansion Dataset -> exchange
    base = rd.from_pandas(df.copy()).repartition(7)
    pre = base.map_batches(expand, batch_format="pyarrow")
    want = (bucket_exchange([(pre, "bucket")], 4, _make_sum_reduce())
            .to_pandas().sort_values("k").reset_index(drop=True))

    for bound in (None, 4):  # single-level, then forced staged
        src = rd.from_pandas(df.copy()).repartition(7)
        got = (bucket_exchange([(src, "bucket")], 4, _make_sum_reduce(),
                               schemas=[schema], map_fns=[expand],
                               max_driver_refs=bound)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_fused_map_multi_input_mixed():
    """[fn, None] per-input fusion: one side expands inside the split
    task, the other passes through untouched."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    df1 = pd.DataFrame({"k": rng.integers(0, 20, 150),
                        "v": rng.integers(0, 5, 150)})
    schema, expand = _make_expander()
    ds1 = rd.from_pandas(df1).repartition(5)
    ds2, df2 = _mk_ds(300, 4, 3, seed=7)

    out_schema = pa.schema([("bucket", pa.int64()), ("n1", pa.int64()),
                            ("n2", pa.int64())])

    def count_both(b: int, t1, t2):
        return pa.table({
            "bucket": pa.array([b], pa.int64()),
            "n1": pa.array([0 if t1 is None else t1.num_rows], pa.int64()),
            "n2": pa.array([0 if t2 is None else t2.num_rows], pa.int64()),
        }).cast(out_schema)

    got = (bucket_exchange([(ds1, "bucket"), (ds2, "bucket")], 4, count_both,
                           schemas=[schema, None], map_fns=[expand, None])
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    exp = pa.Table.from_pandas(df1, preserve_index=False).cast(
        pa.schema([("k", pa.int64()), ("v", pa.int64())]))
    want1 = expand(exp).to_pandas().groupby("bucket").size()
    want2 = df2.groupby("bucket").size()
    for _, r in got.iterrows():
        assert r["n1"] == want1.get(r["bucket"], 0)
        assert r["n2"] == want2.get(r["bucket"], 0)


@pytest.mark.usefixtures("ray_session")
def test_group_size_arithmetic():
    """The staged path triggers exactly when blocks x buckets exceeds
    the bound, and driver refs stay <= bound + one group's buckets."""
    ds, df = _mk_ds(600, 16, 10)
    # 10 blocks x 16 buckets = 160 refs; bound 64 -> group_size ceil(160/64)=3
    out = (bucket_exchange([(ds, "bucket")], 16, _make_sum_reduce(),
                           max_driver_refs=64)
           .to_pandas().sort_values("k").reset_index(drop=True))
    expected = (df.groupby("k", sort=True)["v"].sum().reset_index(name="s")
                .astype({"k": "int64", "s": "int64"}))
    pd.testing.assert_frame_equal(out, expected)
