"""Termination safety: crawls whose frontier can only fail must still
reach the done-scan fixed point (retry budget exhausts, frontier
empties)."""

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.sources.testgen import generate_pages


@pytest.mark.usefixtures("ray_session")
def test_unfetchable_seed_terminates(tmp_path):
    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    cfg = CrawlConfig.from_job_json(
        {**gen["job"], "seeds": ["http://self.test/missing.html"], "max_attempts": 2},
        n_frontier_shards=2, n_seen_shards=2, n_page_parts=2,
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp_path / "run"))
    res = job.run()
    assert res["done_total"] == 0
    t = pq.read_table(res["url_seen_path"])
    # 404s retried until MaxAttempts then Failed (lib/coordinator.go:381-387)
    by_url = {u: (s, a) for u, s, a in zip(t["url"].to_pylist(), t["status"].to_pylist(),
                                           t["attempts"].to_pylist())}
    assert by_url["http://self.test/missing.html"] == (5, 3)  # failed, 1+2 attempts
    assert open(res["sitemap_path"]).read() == "{}"


@pytest.mark.usefixtures("ray_session")
def test_no_crawl_mode(tmp_path):
    """crawl=false: fetch seeds only, never expand (the commented
    no-crawl invariant, lib/job_test.go:55-88)."""
    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    cfg = CrawlConfig.from_job_json(
        {**gen["job"], "crawl": False},
        n_frontier_shards=2, n_seen_shards=2, n_page_parts=2,
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp_path / "run"))
    res = job.run()
    assert res["done_total"] == 1  # the seed only
    t = pq.read_table(res["url_seen_path"])
    assert len(t) == 2  # raw seed (queued) + normalized (done)
