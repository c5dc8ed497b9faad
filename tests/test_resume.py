"""Checkpoint/resume conformance: kill after epoch k, resume, final
state identical to an uninterrupted run (SURVEY §5 plan item c)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.sources.testgen import generate_pages


class _StopAfterEpoch(Exception):
    pass


@pytest.mark.usefixtures("ray_session")
def test_resume_matches_uninterrupted(tmp_path):
    gen = generate_pages("qri_io_shaped", str(tmp_path / "gen"), seed=42)

    def mk(workdir):
        cfg = CrawlConfig.from_job_json(
            gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2,
            checkpoint_every=1,
        )
        return CrawlJob(cfg, gen["pages"], gen["pages_meta"], workdir)

    # uninterrupted reference run
    ref = mk(str(tmp_path / "ref")).run()

    # interrupted run: crash after epoch 1's checkpoint
    crash_dir = str(tmp_path / "crash")
    job = mk(crash_dir)
    orig_ckpt = job._checkpoint

    def exploding_ckpt(epoch, final=False):
        orig_ckpt(epoch, final=final)
        if not final and epoch >= 1:
            raise _StopAfterEpoch()

    job._checkpoint = exploding_ckpt
    with pytest.raises(_StopAfterEpoch):
        job.run()

    manifest = json.load(open(os.path.join(crash_dir, "checkpoint", "MANIFEST.json")))
    assert manifest["epoch"] == 1 and not manifest["final"]

    # resume in a fresh job object (fresh actors)
    resumed = mk(crash_dir).run(resume=True)

    def seen(res):
        t = pq.read_table(res["url_seen_path"])
        return sorted(
            zip(t["url"].to_pylist(), t["status"].to_pylist(), t["attempts"].to_pylist())
        )

    assert seen(resumed) == seen(ref)
    # done_total is restored from the manifest and continues counting
    assert resumed["done_total"] == ref["done_total"]
    # sitemaps byte-identical
    assert open(resumed["sitemap_path"]).read() == open(ref["sitemap_path"]).read()
    # crawl order identical across interrupt
    def order(res):
        t = pq.read_table(res["order_dir"]).sort_by([("epoch", "ascending"), ("seq", "ascending")])
        return list(zip(t["epoch"].to_pylist(), t["seq"].to_pylist(), t["url"].to_pylist()))

    assert order(resumed) == order(ref)


@pytest.mark.usefixtures("ray_session")
def test_resume_with_politeness_delay_keeps_order(tmp_path):
    """A delayed (paced) crawl resumed from checkpoint assigns the
    SAME fetch_after values and crawl order as an uninterrupted run —
    requires host_next persisting in the frontier checkpoint."""
    gen = generate_pages("self_linking", str(tmp_path / "gen"))

    def mk(workdir):
        cfg = CrawlConfig.from_job_json(
            gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2,
            checkpoint_every=1, delay_milli=400,
        )
        return CrawlJob(cfg, gen["pages"], gen["pages_meta"], workdir)

    ref = mk(str(tmp_path / "ref")).run()

    crash_dir = str(tmp_path / "crash")
    job = mk(crash_dir)
    orig_ckpt = job._checkpoint

    def exploding_ckpt(epoch, final=False):
        orig_ckpt(epoch, final=final)
        if not final and epoch >= 0:
            raise _StopAfterEpoch()

    job._checkpoint = exploding_ckpt
    with pytest.raises(_StopAfterEpoch):
        job.run()

    resumed = mk(crash_dir).run(resume=True)

    def order(res):
        t = pq.read_table(res["order_dir"]).sort_by(
            [("epoch", "ascending"), ("seq", "ascending")]
        )
        return list(zip(t["epoch"].to_pylist(), t["seq"].to_pylist(),
                        t["url"].to_pylist(), t["fetch_after"].to_pylist()))

    assert order(resumed) == order(ref)
