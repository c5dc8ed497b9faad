"""M7 headers capture: response headers round-trip through the pages
meta → PageStore → FetchStage → resources when `record_headers` is set
(walk RecordResponseHeaders, lib/config.go:147,173-174 +
lib/resource.go:104-107), and stay empty when it is off (the default,
matching walk)."""

import os

import pyarrow.parquet as pq
import pytest

from walk_ray.functions.extract import headers_map
from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.sources.testgen import generate_pages


def _run(tmp, **cfg_over):
    gen = generate_pages("self_linking", os.path.join(tmp, "gen"))
    cfg = CrawlConfig.from_job_json(
        gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2, **cfg_over
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"],
                   os.path.join(tmp, f"run_{len(os.listdir(tmp))}"))
    return job.run()


@pytest.mark.usefixtures("ray_session")
def test_headers_recorded_when_enabled(tmp_path):
    res = _run(str(tmp_path), record_headers=True)
    rt = pq.read_table(res["resources_dir"],
                       columns=["url", "headers", "content_type", "is_hop"])
    n_checked = 0
    for u, h, ct, hop in zip(rt["url"].to_pylist(), rt["headers"].to_pylist(),
                             rt["content_type"].to_pylist(), rt["is_hop"].to_pylist()):
        if hop:
            assert h == []  # hop resources are synthesized without headers
            continue
        hm = headers_map(h)
        assert hm["Content-Type"] == ct, u
        assert hm["Server"] == "testgen"
        n_checked += 1
    assert n_checked >= 4


@pytest.mark.usefixtures("ray_session")
def test_headers_empty_by_default(tmp_path):
    res = _run(str(tmp_path))
    rt = pq.read_table(res["resources_dir"], columns=["headers"])
    assert all(h == [] for h in rt["headers"].to_pylist())


def test_headers_map_mirrors_walk():
    # lib/resource.go:58-67 semantics incl. odd-length tolerance
    assert headers_map([]) == {}
    assert headers_map(["A", "1", "B", "2"]) == {"A": "1", "B": "2"}
