"""Coverage for S2 (seed file), S6/D4 (content-addressed bodies),
O3 (paginated index) and the §2.10 extension registry."""

import os

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.sources.testgen import generate_pages


@pytest.mark.usefixtures("ray_session")
def test_seeds_path_and_bodies(tmp_path):
    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://self.test/a.html\nhttp://self.test/b.html\n")
    cfg = CrawlConfig.from_job_json(
        {**gen["job"], "seeds": [], "seeds_path": str(seeds_file)},
        n_frontier_shards=2, n_seen_shards=2, n_page_parts=2, store_bodies=True,
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp_path / "run"))
    res = job.run()
    t = pq.read_table(res["url_seen_path"])
    seen = set(t["url"].to_pylist())
    assert "http://self.test/a.html" in seen and "http://self.test/b.html" in seen
    # bodies: all 4 pages share identical HTML -> content addressing
    # collapses them to very few rows
    bodies = pq.read_table(os.path.join(str(tmp_path / "run"), "bodies"))
    uniq = bodies.to_pandas().drop_duplicates("hash")
    assert len(uniq) == 1
    # hash matches the resources hash column
    rt = pq.read_table(res["resources_dir"], columns=["hash"])
    assert set(uniq["hash"]) == set(rt["hash"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_sorted_index_pagination(qri_crawl):
    from walk_ray.pipelines.query import build_index, sorted_index

    full = build_index(qri_crawl["resources_dir"]).to_pandas()
    page = sorted_index(qri_crawl["resources_dir"], limit=10, offset=5).to_pandas()
    assert len(page) == 10
    assert page["surt_url"].tolist() == full["surt_url"].iloc[5:15].tolist()
    tail = sorted_index(qri_crawl["resources_dir"], offset=len(full) - 3).to_pandas()
    assert len(tail) == 3


def test_registry():
    from walk_ray import registry

    assert "PARQUET" in registry.registered("page_source")
    assert "SITEMAP" in registry.registered("sink")
    with pytest.raises(KeyError):
        registry.create("sink", "nope")

    created = {}

    def my_sink(**kw):
        created.update(kw)
        return "sink-instance"

    registry.register("sink", "custom", my_sink)
    assert registry.create("sink", "CUSTOM", x=1) == "sink-instance"
    assert created == {"x": 1}
