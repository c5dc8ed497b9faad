"""Conformance fixes from the round-1 advisory review.

- candidate links expand from EVERY completed resource regardless of
  status (lib/coordinator.go:289-298), not just ok-status rows;
- StopURL fires on any dequeued resource URL (lib/coordinator.go:355-366);
- robots.txt multi-agent group parsing (RFC 9309 §2.1 runs);
- frontier checkpoint persists the per-host politeness clock;
- the 10-redirect cap error carries the redirect-target URL (Go
  url.Error semantics, lib/worker.go:222-224).
"""

import os

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.sources.testgen import generate_pages


def _run(kind, tmp, **cfg_over):
    gen = generate_pages(kind, os.path.join(tmp, f"gen_{kind}"))
    cfg = CrawlConfig.from_job_json(
        gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2, **cfg_over
    )
    job = CrawlJob(cfg, gen["pages"], gen["pages_meta"],
                   os.path.join(tmp, f"run_{len(os.listdir(tmp))}"))
    return job.run()


def _seen_map(result):
    t = pq.read_table(result["url_seen_path"])
    return {
        u: (s, a)
        for u, s, a in zip(t["url"].to_pylist(), t["status"].to_pylist(),
                           t["attempts"].to_pylist())
    }


@pytest.mark.usefixtures("ray_session")
def test_links_expand_from_non_ok_pages(tmp_path):
    """A custom 404 page and a flaky 500 page both carry nav links to
    otherwise-unreachable pages; walk crawls them anyway."""
    res = _run("custom_404", str(tmp_path))
    seen = _seen_map(res)
    assert seen["http://notfound.test/only-via-404.html"] == (4, 1)  # done
    assert seen["http://notfound.test/only-via-500.html"] == (4, 1)  # done
    # the non-ok sources themselves retried to failure (404/500 not ok)
    assert seen["http://notfound.test/missing.html"][0] == 5  # failed
    assert seen["http://notfound.test/broken.html"][0] == 5


@pytest.mark.usefixtures("ray_session")
def test_stop_url_fires_on_non_ok_status(tmp_path):
    """stop_url returning a 404 still stops the crawl."""
    res = _run("custom_404", str(tmp_path),
               stop_url="http://notfound.test/missing.html")
    seen = _seen_map(res)
    # the 404 stop page was dequeued -> crawl stopped before its links
    # (and the 500 page's links) could be fetched
    assert seen.get("http://notfound.test/only-via-404.html", (2, 0))[0] != 4
    assert res["done_total"] <= 1  # at most the root completed


def test_robots_multi_agent_group():
    from walk_ray.state.robots import parse_robots

    # * declared first in a multi-agent run: rules apply to *
    rules = parse_robots(b"User-agent: *\nUser-agent: foo\nDisallow: /x\n")
    assert ("/x", False) in rules
    # * declared second in the run: still applies
    rules = parse_robots(b"User-agent: foo\nUser-agent: *\nDisallow: /y\n")
    assert ("/y", False) in rules
    # a NEW group after rules does not inherit *
    rules = parse_robots(
        b"User-agent: *\nDisallow: /a\n\nUser-agent: foo\nDisallow: /b\n"
    )
    assert ("/a", False) in rules
    assert ("/b", False) not in rules


def test_frontier_checkpoint_persists_host_next(tmp_path):
    from walk_ray.state.frontier import FrontierShard

    f = FrontierShard(0, delay_sec=0.5)
    f.push({
        "url": [f"http://a.com/{i}" for i in range(4)],
        "host": ["a.com"] * 4,
        "job_id": ["1"] * 4,
        "attempts": [0] * 4,
        "prev_status": [0] * 4,
        "epoch": [0] * 4,
        "parent_seq": [-1] * 4,
        "link_idx": list(range(4)),
    })
    first = f.pop_ready(0.0, 1.0)  # pops 2 of 4 (0.0s and 0.5s slots)
    assert len(first["url"]) == 2
    f.checkpoint(str(tmp_path))

    g = FrontierShard(0, delay_sec=0.5)
    g.restore(str(tmp_path))
    assert g.host_next == f.host_next
    # the resumed shard paces exactly like the uninterrupted one
    h = f.pop_ready(0.0, 10.0)
    k = g.pop_ready(0.0, 10.0)
    assert h["url"] == k["url"]
    assert h["fetch_after"] == k["fetch_after"]


@pytest.mark.usefixtures("ray_session")
def test_redirect_cap_error_names_target_url(tmp_path):
    """The capped-chain error resource carries the redirect-target URL
    (error resources are retried, never handled, so probe the fetch
    stage directly)."""
    import pyarrow as pa
    import ray

    from walk_ray.sources.pages import PageStore, prepare_page_partitions
    from walk_ray.stages.fetch import FetchStage

    gen = generate_pages("redirect_chain", os.path.join(str(tmp_path), "gen"))
    parts = os.path.join(str(tmp_path), "parts")
    prepare_page_partitions(gen["pages"], gen["pages_meta"], parts, 2)
    stores = [ray.remote(PageStore).remote(parts, i) for i in range(2)]
    stage = FetchStage(stores, record_redirects=True)
    batch = pa.table(
        {
            "url": ["http://redir.test/long/0"],
            "job_id": ["1"],
            "epoch": pa.array([0], pa.int32()),
            "seq": pa.array([0], pa.int64()),
            "parent_seq": pa.array([-1], pa.int64()),
            "link_idx": pa.array([0], pa.int32()),
            "attempts": pa.array([0], pa.int32()),
            "fetch_after": pa.array([0.0], pa.float64()),
        }
    )
    out = stage(batch)
    errs = {e for e in out["error"].to_pylist() if e}
    # Go's url.Error wraps the ATTEMPTED request URL: the 11th request
    # in the long chain is /long/10
    assert 'Get "http://redir.test/long/10": stopped after 10 redirects' in errs


@pytest.mark.usefixtures("ray_session")
def test_hot_host_salting_spreads_single_host(tmp_path):
    """With per-host pacing inert (delay 0, no politeness/backoff) a
    single mega-host spreads across ALL frontier shards instead of
    pinning one; crawl results stay identical to host-sharding."""
    from walk_ray.sources.testgen import SiteBuilder

    b = SiteBuilder()
    n = 64
    for i in range(n):
        links = [(f"/p{c}.html", f"c{c}") for c in (2 * i + 1, 2 * i + 2) if c < n]
        b.page(f"http://mega.test/p{i}.html", f"P{i}", [], links)
    pages, meta = b.tables()
    gen = tmp_path / "gen"
    os.makedirs(gen)
    import pyarrow.parquet as pq_

    pq_.write_table(pages, str(gen / "pages.parquet"))
    pq_.write_table(meta, str(gen / "meta.parquet"))

    cfg = CrawlConfig(
        seeds=["http://mega.test/p0.html"], domains=["http://mega.test"],
        n_frontier_shards=4, n_seen_shards=2, n_page_parts=2,
    )
    assert cfg._salt_hosts
    job = CrawlJob(cfg, str(gen / "pages.parquet"), str(gen / "meta.parquet"),
                   str(tmp_path / "run"))
    res = job.run()
    assert res["done_total"] == n
    mt = pq.read_table(str(tmp_path / "run" / "metrics.parquet")).to_pandas()
    # mid-crawl the single host's queue lives on SEVERAL shards
    spread = max(sum(1 for v in sizes if v > 0)
                 for sizes in mt["frontier_shard_sizes"])
    assert spread >= 2, mt["frontier_shard_sizes"].tolist()

    # paced config keeps host-ownership sharding (politeness needs it)
    cfg2 = CrawlConfig(seeds=[], delay_milli=100)
    assert not cfg2._salt_hosts
    cfg3 = CrawlConfig(seeds=[], polite=True)
    assert not cfg3._salt_hosts


def test_job_json_round_trip():
    """Every key `cli job new` prints must round-trip through
    CrawlConfig.from_job_json (round-2 advisory: polite /
    record_redirects / enable_backoff were silently dropped)."""
    from dataclasses import asdict

    defaults = asdict(CrawlConfig())
    # the template keys exactly as cmd_job_new prints them
    job_keys = ["seeds", "seeds_path", "domains", "ignore_patterns", "crawl",
                "delay_milli", "max_attempts", "stop_url", "stop_after_entries",
                "backoff_response_codes", "enable_backoff", "record_headers",
                "polite", "record_redirects"]
    nondefault = {
        "seeds": ["http://a.example/"], "seeds_path": "/tmp/seeds.txt",
        "domains": ["a.example"], "ignore_patterns": ["\\.png$"],
        "crawl": False, "delay_milli": 250, "max_attempts": 7,
        "stop_url": "http://a.example/stop", "stop_after_entries": 9,
        "backoff_response_codes": [429, 503], "enable_backoff": True,
        "record_headers": True, "polite": True, "record_redirects": False,
    }
    for k in job_keys:
        assert k in nondefault, f"template key {k} missing a non-default probe"
        assert nondefault[k] != defaults[k], f"probe for {k} equals the default"
    cfg = CrawlConfig.from_job_json(nondefault)
    for k in job_keys:
        assert getattr(cfg, k) == nondefault[k], f"{k} did not round-trip"


@pytest.mark.usefixtures("ray_session")
def test_resume_with_binding_pop_budget_keeps_order(tmp_path):
    """Resume determinism when max_pop_per_epoch BINDS: the
    proportional pop budgets depend on _shard_sizes (queue sizes after
    the previous epoch), which must be restored from the checkpoint
    manifest — otherwise the first post-resume epoch pops with uniform
    budgets and the crawl order diverges (round-2 advisory)."""
    gen = generate_pages("qri_io_shaped", str(tmp_path / "gen"), seed=7)

    def mk(workdir):
        cfg = CrawlConfig.from_job_json(
            gen["job"], n_frontier_shards=3, n_seen_shards=2, n_page_parts=2,
            checkpoint_every=1, max_pop_per_epoch=17,
        )
        return CrawlJob(cfg, gen["pages"], gen["pages_meta"], workdir)

    ref = mk(str(tmp_path / "ref")).run()
    # the budget must actually bind for this test to mean anything
    mrows = pq.read_table(os.path.join(str(tmp_path / "ref"), "metrics.parquet"))
    assert max(mrows["popped"].to_pylist()) <= 17 + 3  # per-shard +1 rounding
    assert len(mrows) > 3  # capped epochs => many epochs

    class _Stop(Exception):
        pass

    crash_dir = str(tmp_path / "crash")
    job = mk(crash_dir)
    orig_ckpt = job._checkpoint

    def exploding_ckpt(epoch, final=False):
        orig_ckpt(epoch, final=final)
        if not final and epoch >= 2:
            raise _Stop()

    job._checkpoint = exploding_ckpt
    with pytest.raises(_Stop):
        job.run()

    resumed = mk(crash_dir).run(resume=True)

    def order(res):
        t = pq.read_table(res["order_dir"]).sort_by(
            [("epoch", "ascending"), ("seq", "ascending")]
        )
        return list(zip(t["epoch"].to_pylist(), t["seq"].to_pylist(),
                        t["url"].to_pylist()))

    assert order(resumed) == order(ref)
