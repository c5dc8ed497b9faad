"""Partitioned hash join (bucketed co-partition + local pandas merge):
Ray Data has no native join; this is the engine's no-broadcast path."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_hash_join_matches_pandas_merge():
    import ray.data as rd

    from walk_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"rk": [2, 2, 3, 4], "rv": [10, 20, 30, 40]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk", n_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert got[want.columns.tolist()].equals(want)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_join_equals_broadcast_join():
    from walk_ray.pipelines.relational import orders_by_nation, orders_by_nation_shuffle

    sf = "/root/testdata/sf0.001"
    a = orders_by_nation(sf).to_pandas().sort_values("n_name").reset_index(drop=True)
    b = orders_by_nation_shuffle(sf).to_pandas().sort_values("n_name").reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_pandas_merge_asof():
    import ray.data as rd

    from walk_ray.pipelines.relational import asof_join

    left = pd.DataFrame({"k": [1, 1, 2, 2, 3], "t": [10, 20, 10, 30, 5],
                         "lv": ["a", "b", "c", "d", "e"]})
    right = pd.DataFrame({"rk": [1, 1, 2, 4], "rt": [5, 15, 25, 1],
                          "rv": [100, 200, 300, 400]})
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk", "t", "rt",
                  n_buckets=4)
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(left.sort_values("t"), right.sort_values("rt"),
                      left_on="t", right_on="rt", left_by="k", right_by="rk",
                      direction="backward")
        .dropna(subset=["rt"])
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["k", "t", "rv"]:
        assert (got[c].astype("int64").values == want[c].astype("int64").values).all(), c


@pytest.mark.usefixtures("ray_session")
def test_native_join_engine_matches_bucketed():
    """Ray's native Dataset.join (opt-in engine) agrees with the
    portable bucketed construction."""
    import ray.data as rd

    from walk_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"rk": [2, 2, 3, 4], "rv": [100, 200, 300, 400]})

    def run(engine):
        return (
            hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", "rk",
                      n_buckets=2, engine=engine)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )

    b = run("bucketed")
    n = run("native")
    for c in ["k", "lv", "rk", "rv"]:
        assert (b[c].astype("int64").values == n[c].astype("int64").values).all(), c


@pytest.mark.usefixtures("ray_session")
def test_orders_by_nation_shuffle_native_engine():
    """The full orders-by-nation pipeline agrees across join engines
    at sf0.001 — covers the native Dataset.join path end-to-end in CI,
    not just the toy-frame agreement above."""
    from walk_ray.pipelines.relational import orders_by_nation_shuffle

    sf = "/root/testdata/sf0.001"
    # few partitions: the native join's aggregator actors need CPU
    # headroom and the test session has only 4 CPUs
    b = (orders_by_nation_shuffle(sf, n_buckets=4)
         .to_pandas().sort_values("n_name").reset_index(drop=True))
    n = (orders_by_nation_shuffle(sf, engine="native", n_buckets=4)
         .to_pandas().sort_values("n_name").reset_index(drop=True))
    assert b.equals(n)
