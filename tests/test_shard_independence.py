"""Crawl results must be independent of physical shard counts — the
canonical linearization (epoch, fetch_after, parent_seq, link_idx) and
commutative min-disc dedup guarantee it, so scaling the actor fleet
(more nodes) never changes the answer."""

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.sources.testgen import generate_pages


def _run(tmp, tag, **phys):
    gen = generate_pages("qri_io_shaped", f"{tmp}/gen", seed=42)
    cfg = CrawlConfig.from_job_json(gen["job"], **phys)
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], f"{tmp}/run_{tag}")
    return job.run()


def _state(res):
    seen = pq.read_table(res["url_seen_path"]).sort_by("url").to_pydict()
    order_t = pq.read_table(res["order_dir"]).sort_by(
        [("epoch", "ascending"), ("seq", "ascending")]
    )
    order = list(zip(order_t["epoch"].to_pylist(), order_t["url"].to_pylist()))
    return seen, order, open(res["sitemap_path"]).read()


@pytest.mark.usefixtures("ray_session")
def test_shard_count_independence(tmp_path):
    a = _run(str(tmp_path), "a", n_frontier_shards=2, n_seen_shards=2, n_page_parts=2)
    b = _run(str(tmp_path), "b", n_frontier_shards=3, n_seen_shards=5, n_page_parts=4,
             fetch_batch_size=64)
    sa, oa, ma = _state(a)
    sb, ob, mb = _state(b)
    assert sa == sb
    assert oa == ob
    assert ma == mb
