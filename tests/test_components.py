import pandas as pd
import pytest

@pytest.mark.usefixtures("ray_session")
def test_components_distributed_matches_driver():
    import ray.data as rd
    from walk_ray.pipelines.dedup import _components, components_distributed
    # multi-component fixture incl. a CHAIN (diameter 5 -> multiple
    # propagation rounds), a clique, a 2-cycle, and high ids
    edges = pd.DataFrame({
        "a": [1, 2, 3, 4, 5,   10, 10, 11,   100,   7000, 9001],
        "b": [2, 3, 4, 5, 6,   11, 12, 12,   101,   9001, 8000],
    })
    pairs = rd.from_pandas(edges)
    got = components_distributed(pairs, id_col="doc_id").to_pandas()
    want = _components(edges, id_col="doc_id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

@pytest.mark.usefixtures("ray_session")
def test_components_distributed_empty():
    import ray.data as rd
    from walk_ray.pipelines.dedup import components_distributed
    pairs = rd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                         "b": pd.Series([], dtype="int64")}))
    out = components_distributed(pairs).to_pandas()
    # empty Ray datasets drop column schema in to_pandas (engine-wide
    # gotcha); the contract here is just zero rows and no crash
    assert len(out) == 0
    assert list(out.columns) in ([], ["doc_id", "cluster_id"])
