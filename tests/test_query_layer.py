"""Query-layer pipelines over a shared crawl output (SURVEY §2.4-2.7
read-model operators)."""

import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_index_sorted_by_surt(qri_crawl):
    from walk_ray.pipelines.query import build_index

    idx = build_index(qri_crawl["resources_dir"]).to_pandas()
    assert len(idx) > 0
    surts = idx["surt_url"].tolist()
    assert surts == sorted(surts)
    assert surts[0].startswith("test,qri)")


@pytest.mark.usefixtures("ray_session")
def test_inbound_links(qri_crawl):
    from walk_ray.pipelines.query import inbound_links, link_graph

    target = "http://qri.test/blog/p0.html"
    srcs = sorted(inbound_links(qri_crawl["resources_dir"], target).to_pandas()["url"])
    # cross-check against the full inverted graph
    g = link_graph(qri_crawl["resources_dir"]).to_pandas()
    row = g[g["dst"] == target]
    assert len(row) == 1
    assert sorted(row.iloc[0]["srcs"]) == srcs
    assert row.iloc[0]["n_inbound"] == len(srcs)
    assert len(srcs) > 0


@pytest.mark.usefixtures("ray_session")
def test_clean_sitemap(qri_crawl, tmp_path):
    from walk_ray.pipelines.query import clean_sitemap

    out = str(tmp_path / "cleaned.json")
    counts = clean_sitemap(qri_crawl["sitemap_path"], out, ["http://qri.test/blog"])
    cleaned = json.load(open(out))
    assert counts["kept"] == len(cleaned)
    assert counts["total"] == counts["kept"] + counts["removed"]
    assert counts["removed"] > 0
    assert not any(k.startswith("http://qri.test/blog") for k in cleaned)


@pytest.mark.usefixtures("ray_session")
def test_latest_capture_and_timespan(qri_crawl):
    from walk_ray.pipelines.query import latest_capture, timespan

    latest = latest_capture(qri_crawl["resources_dir"]).to_pandas()
    assert latest["url"].is_unique
    lo, hi = timespan(qri_crawl["resources_dir"])
    assert lo <= hi


@pytest.mark.usefixtures("ray_session")
def test_union_walks(qri_crawl, redirect_crawl):
    from walk_ray.pipelines.query import latest_capture, union_walks

    u = union_walks([qri_crawl["resources_dir"], redirect_crawl["resources_dir"]])
    n1 = pq.read_table(qri_crawl["resources_dir"]).num_rows
    n2 = pq.read_table(redirect_crawl["resources_dir"]).num_rows
    assert u.count() == n1 + n2
    latest = latest_capture([qri_crawl["resources_dir"], redirect_crawl["resources_dir"]]).to_pandas()
    assert latest["url"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_resolve_redirects(redirect_crawl):
    from walk_ray.pipelines.query import resolve_redirects

    assert resolve_redirects(redirect_crawl["resources_dir"], "http://redir.test/hop/0") == \
        "http://redir.test/hop/4"
    # hop/2 joins the chain midway
    assert resolve_redirects(redirect_crawl["resources_dir"], "http://redir.test/hop/2") == \
        "http://redir.test/hop/4"
    # non-redirect url resolves to itself
    assert resolve_redirects(redirect_crawl["resources_dir"], "http://redir.test/") == \
        "http://redir.test"
