"""Self-healing epoch loop: a state actor killed mid-crawl (the
deterministic chaos hook — the sandbox analog of losing a node on a
real cluster) triggers automatic fleet rebuild + checkpoint replay,
and the final outputs are byte-identical to an uninterrupted run."""

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import (
    CrawlConfig,
    CrawlJob,
    _is_distributed_state_loss,
)
from walk_ray.sources.testgen import generate_pages


def _mk(gen, workdir, **kw):
    cfg = CrawlConfig.from_job_json(
        gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2, **kw
    )
    return CrawlJob(cfg, gen["pages"], gen["pages_meta"], workdir)


def _seen(res):
    t = pq.read_table(res["url_seen_path"])
    return sorted(
        zip(t["url"].to_pylist(), t["status"].to_pylist(), t["attempts"].to_pylist())
    )


def _order(res):
    t = pq.read_table(res["order_dir"]).sort_by(
        [("epoch", "ascending"), ("seq", "ascending")]
    )
    return list(zip(t["epoch"].to_pylist(), t["seq"].to_pylist(), t["url"].to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_actor_death_recovers_from_checkpoint(tmp_path, monkeypatch):
    gen = generate_pages("qri_io_shaped", str(tmp_path / "gen"), seed=42)
    ref = _mk(gen, str(tmp_path / "ref"), checkpoint_every=1).run()
    assert ref["recoveries"] == 0 and ref["epochs"] >= 3

    monkeypatch.setenv("WALK_RAY_CHAOS_KILL", "2:0")
    rec = _mk(gen, str(tmp_path / "chaos"), checkpoint_every=1).run()
    assert rec["recoveries"] == 1
    assert _seen(rec) == _seen(ref)
    assert _order(rec) == _order(ref)
    assert open(rec["sitemap_path"]).read() == open(ref["sitemap_path"]).read()
    assert rec["done_total"] == ref["done_total"]


@pytest.mark.usefixtures("ray_session")
def test_actor_death_without_checkpoint_reseeds(tmp_path, monkeypatch):
    """No checkpoint yet (checkpoint_every=0): recovery wipes partial
    epoch outputs and replays the whole crawl from the seed list."""
    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    ref = _mk(gen, str(tmp_path / "ref")).run()
    assert ref["epochs"] >= 2

    monkeypatch.setenv("WALK_RAY_CHAOS_KILL", "1:1")
    rec = _mk(gen, str(tmp_path / "chaos")).run()
    assert rec["recoveries"] == 1
    assert _seen(rec) == _seen(ref)
    assert _order(rec) == _order(ref)
    assert open(rec["sitemap_path"]).read() == open(ref["sitemap_path"]).read()


@pytest.mark.usefixtures("ray_session")
def test_recovery_disabled_fails_fast(tmp_path, monkeypatch):
    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    monkeypatch.setenv("WALK_RAY_CHAOS_KILL", "1:0")
    job = _mk(gen, str(tmp_path / "chaos"), auto_recover=False)
    with pytest.raises(Exception) as ei:
        job.run()
    # the propagated error is exactly the distributed-state-loss class
    # the recovery path keys on — nothing else was swallowed
    assert _is_distributed_state_loss(ei.value)


@pytest.mark.parametrize("kind", ["seen", "store"])
@pytest.mark.usefixtures("ray_session")
def test_other_shard_kinds_recover(tmp_path, monkeypatch, kind):
    """Seen-shard and page-store deaths take the same recovery path as
    frontier loss (the classifier keys on the error class, not the
    actor kind) and replay byte-identically from the checkpoint."""
    gen = generate_pages("qri_io_shaped", str(tmp_path / "gen"), seed=42)
    ref = _mk(gen, str(tmp_path / "ref"), checkpoint_every=1).run()

    monkeypatch.setenv("WALK_RAY_CHAOS_KILL", f"2:0:{kind}")
    rec = _mk(gen, str(tmp_path / f"chaos_{kind}"), checkpoint_every=1).run()
    assert rec["recoveries"] == 1
    assert _seen(rec) == _seen(ref)
    assert _order(rec) == _order(ref)
