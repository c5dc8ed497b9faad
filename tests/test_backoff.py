"""Per-host backoff (the reference's declared-but-commented-out
slow-down, lib/job.go:113-131 + lib/coordinator.go:264-275), activated
via ``enable_backoff``: hosts serving backoff response codes get paced
down; healthy hosts keep the configured delay; default config stays a
parity no-op."""

import os

import pyarrow.parquet as pq
import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.state.frontier import FrontierShard
from walk_ray.sources.testgen import SiteBuilder


def _push(f, host, urls):
    f.push({
        "url": urls,
        "host": [host] * len(urls),
        "job_id": ["1"] * len(urls),
        "attempts": [0] * len(urls),
        "prev_status": [0] * len(urls),
        "epoch": [0] * len(urls),
        "parent_seq": [-1] * len(urls),
        "link_idx": list(range(len(urls))),
    })


def test_backoff_paces_only_reported_host():
    f = FrontierShard(0, delay_sec=0.1)
    _push(f, "slow.test", [f"http://slow.test/{i}" for i in range(3)])
    _push(f, "ok.test", [f"http://ok.test/{i}" for i in range(3)])
    f.backoff(["slow.test"], step=0.05)
    out = f.pop_ready(0.0, 10.0)
    fa = dict()
    for h, t in zip(out["host"], out["fetch_after"]):
        fa.setdefault(h, []).append(t)
    ok_deltas = [b - a for a, b in zip(fa["ok.test"], fa["ok.test"][1:])]
    slow_deltas = [b - a for a, b in zip(fa["slow.test"], fa["slow.test"][1:])]
    assert all(abs(d - 0.1) < 1e-9 for d in ok_deltas)
    assert all(abs(d - 0.15) < 1e-9 for d in slow_deltas)


def test_speed_up_recovers_to_base():
    f = FrontierShard(0, delay_sec=0.1)
    f.backoff(["slow.test"], step=0.05)
    f.backoff(["slow.test"], step=0.05)
    f.speed_up(0.05)
    assert abs(f.host_delay["slow.test"] - 0.05) < 1e-12
    f.speed_up(0.05)
    assert "slow.test" not in f.host_delay  # fully recovered
    f.speed_up(0.05)  # no-op below base
    assert not f.host_delay


def test_backoff_sidecar_checkpoint(tmp_path):
    f = FrontierShard(0, delay_sec=0.1)
    _push(f, "slow.test", ["http://slow.test/0"])
    f.backoff(["slow.test"], step=0.07)
    f.checkpoint(str(tmp_path))
    g = FrontierShard(0, delay_sec=0.1)
    g.restore(str(tmp_path))
    assert g.host_delay == f.host_delay


@pytest.mark.usefixtures("ray_session")
def test_e2e_429_host_paced_down_while_others_proceed(tmp_path):
    b = SiteBuilder()
    # slow.test: every page 429s but still links onward (links expand
    # from non-ok resources); ok.test: healthy chain
    for i in range(4):
        b.page(f"http://slow.test/p{i}.html", f"S{i}", [],
               [(f"/p{i+1}.html", "next")], status=429)
    b.page("http://slow.test/p4.html", "S4", [], [], status=429)
    for i in range(4):
        b.page(f"http://ok.test/p{i}.html", f"O{i}", [], [(f"/p{i+1}.html", "next")])
    b.page("http://ok.test/p4.html", "O4", [], [])
    pages, meta = b.tables()
    gen = tmp_path / "gen"
    os.makedirs(gen)
    pq.write_table(pages, str(gen / "pages.parquet"))
    pq.write_table(meta, str(gen / "meta.parquet"))

    def run(enable):
        cfg = CrawlConfig(
            seeds=["http://slow.test/p0.html", "http://ok.test/p0.html"],
            domains=["http://slow.test", "http://ok.test"],
            delay_milli=200,
            max_attempts=1,
            backoff_response_codes=[429],
            enable_backoff=enable,
            n_frontier_shards=1,  # both hosts on one shard: pacing is per-host
            n_seen_shards=2,
            n_page_parts=2,
        )
        job = CrawlJob(cfg, str(gen / "pages.parquet"), str(gen / "meta.parquet"),
                       str(tmp_path / f"run_{enable}"))
        job.run()
        t = pq.read_table(str(tmp_path / f"run_{enable}" / "order"))
        per_host = {}
        for u, fa in sorted(zip(t["url"].to_pylist(), t["fetch_after"].to_pylist()),
                            key=lambda x: x[1]):
            host = u.split("/")[2]
            per_host.setdefault(host, []).append(fa)
        return per_host

    fa = run(True)
    slow_deltas = [b_ - a for a, b_ in zip(fa["slow.test"], fa["slow.test"][1:])]
    ok_deltas = [b_ - a for a, b_ in zip(fa["ok.test"], fa["ok.test"][1:])]
    # the 429 host got paced beyond the base delay; the healthy host
    # never slowed beyond it
    assert max(slow_deltas) > 0.2 + 1e-9
    assert all(d <= 0.2 + 1e-9 for d in ok_deltas)

    # gate off (default): both hosts keep the base pace — parity no-op
    fa0 = run(False)
    slow0 = [b_ - a for a, b_ in zip(fa0["slow.test"], fa0["slow.test"][1:])]
    assert all(d <= 0.2 + 1e-9 for d in slow0)


@pytest.mark.usefixtures("ray_session")
def test_robots_crawl_delay_paces_host(tmp_path):
    """Polite crawls honor robots.txt Crawl-delay per host (fetchbot
    behavior the reference delegates to): the declaring host paces at
    max(configured, Crawl-delay); others keep the configured delay."""
    b = SiteBuilder()
    for i in range(3):
        b.page(f"http://slowbot.test/p{i}.html", f"S{i}", [],
               [(f"/p{i+1}.html", "next")])
    b.page("http://slowbot.test/p3.html", "S3", [], [])
    b.asset("http://slowbot.test/robots.txt",
            b"User-agent: *\nCrawl-delay: 2\n", "text/plain; charset=utf-8")
    for i in range(3):
        b.page(f"http://fast.test/p{i}.html", f"F{i}", [], [(f"/p{i+1}.html", "next")])
    b.page("http://fast.test/p3.html", "F3", [], [])
    b.asset("http://fast.test/robots.txt", b"User-agent: *\n",
            "text/plain; charset=utf-8")
    pages, meta = b.tables()
    gen = tmp_path / "gen"
    os.makedirs(gen)
    pq.write_table(pages, str(gen / "pages.parquet"))
    pq.write_table(meta, str(gen / "meta.parquet"))

    cfg = CrawlConfig(
        seeds=["http://slowbot.test/p0.html", "http://fast.test/p0.html"],
        domains=["http://slowbot.test", "http://fast.test"],
        delay_milli=100,
        polite=True,
        n_frontier_shards=1,
        n_seen_shards=2,
        n_page_parts=2,
    )
    job = CrawlJob(cfg, str(gen / "pages.parquet"), str(gen / "meta.parquet"),
                   str(tmp_path / "run"))
    job.run()
    t = pq.read_table(str(tmp_path / "run" / "order"))
    per_host = {}
    for u, fa in sorted(zip(t["url"].to_pylist(), t["fetch_after"].to_pylist()),
                        key=lambda x: x[1]):
        per_host.setdefault(u.split("/")[2], []).append(fa)
    slow = [b_ - a for a, b_ in zip(per_host["slowbot.test"], per_host["slowbot.test"][1:])]
    fast = [b_ - a for a, b_ in zip(per_host["fast.test"], per_host["fast.test"][1:])]
    assert all(d >= 2.0 - 1e-9 for d in slow), slow
    assert all(d <= 0.1 + 1e-9 for d in fast), fast
