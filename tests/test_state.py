import numpy as np

from walk_ray.state.cuckoo import CuckooFilter
from walk_ray.state.frontier import FRONTIER_COLS, FrontierShard
from walk_ray.state.seen import SeenShard, shard_of, url_hash64_batch


def test_cuckoo_basic():
    f = CuckooFilter(10_000)
    rng = np.random.default_rng(3)
    h = rng.integers(1, 2**63, 5000).astype(np.uint64)
    f.insert_batch(h)
    assert f.contains_batch(h).all()
    other = rng.integers(1, 2**63, 5000).astype(np.uint64)
    fp_rate = f.contains_batch(other).mean()
    assert fp_rate < 0.01
    assert f.kicked_out == 0


def test_cuckoo_shard_correlated_hashes():
    """Regression: seen-shards route by ``h % n_shards``, so a shard's
    hashes share their low bits. The filter must remix before indexing
    or only 1/n_shards of primary buckets are reachable and inserts
    near nominal load degenerate into the kick loop (measured 75×
    slowdown + thousands of kicked-out fingerprints before the fix)."""
    f = CuckooFilter(1 << 15)
    rng = np.random.default_rng(0)
    n = int(0.79 * f.n_buckets * f.bucket_size)
    h = rng.integers(0, 2**63, n).astype(np.uint64)
    h = (h // np.uint64(16)) * np.uint64(16) + np.uint64(5)  # h % 16 == 5
    f.insert_batch(h)
    assert f.kicked_out == 0
    assert f.contains_batch(h).all()
    other = rng.integers(0, 2**63, 20_000).astype(np.uint64)
    assert f.contains_batch(other).mean() < 0.01


def test_seen_shard_antijoin():
    s = SeenShard(0)
    r = s.check_and_add(["http://a.com", "http://b.com", "http://a.com"])
    # in-batch duplicate: second occurrence of a.com is already seen
    assert r == [True, True, False]
    assert s.check_and_add(["http://b.com", "http://c.com"]) == [False, True]
    assert s.size() == 3


def test_seen_shard_dequeue():
    s = SeenShard(0)
    s.check_and_add(["http://a.com", "http://bad.com"])
    assert s.dequeue(["http://a.com"], [200], max_attempts=3) == ["done"]
    assert s.dequeue(["http://bad.com"], [500], 3) == ["retry"]
    assert s.dequeue(["http://bad.com"], [500], 3) == ["retry"]
    assert s.dequeue(["http://bad.com"], [500], 3) == ["retry"]
    assert s.dequeue(["http://bad.com"], [500], 3) == ["failed"]
    # dequeue of a never-enqueued url creates the entry (normalized
    # resource url path, lib/coordinator.go:332-335)
    assert s.dequeue(["http://new.com"], [301], 3) == ["done"]
    t = s.dump()
    by_url = {u: (st, at) for u, st, at in zip(t["url"].to_pylist(), t["status"].to_pylist(), t["attempts"].to_pylist())}
    assert by_url["http://a.com"] == (4, 1)      # done
    assert by_url["http://bad.com"] == (5, 4)    # failed after 4 attempts
    assert by_url["http://new.com"] == (4, 1)


def test_seen_checkpoint_roundtrip(tmp_path):
    s = SeenShard(2)
    s.check_and_add([f"http://h{i}.com" for i in range(100)])
    s.dequeue(["http://h5.com"], [200], 3)
    s.checkpoint(str(tmp_path))
    s2 = SeenShard(2)
    assert s2.restore(str(tmp_path)) == 100
    assert s2.check_and_add(["http://h5.com", "http://hx.com"]) == [False, True]


def _push(shard, urls, hosts, epoch=0, parents=None, idxs=None):
    n = len(urls)
    shard.push(
        {
            "url": urls,
            "host": hosts,
            "job_id": ["1"] * n,
            "attempts": [0] * n,
            "prev_status": [0] * n,
            "epoch": [epoch] * n,
            "parent_seq": parents or list(range(n)),
            "link_idx": idxs or [0] * n,
        }
    )


def test_frontier_order_and_politeness():
    f = FrontierShard(0, delay_sec=1.0)
    # push out of discovery order; pops must come back in discovery order
    _push(f, ["http://a.com/3", "http://a.com/1", "http://a.com/2"], ["a.com"] * 3,
          parents=[3, 1, 2])
    out = f.pop_ready(now=0.0, horizon=2.5)
    assert out["url"] == ["http://a.com/1", "http://a.com/2", "http://a.com/3"]
    assert out["fetch_after"] == [0.0, 1.0, 2.0]
    assert f.size() == 0

    # politeness: two hosts proceed in parallel virtual time
    _push(f, ["http://a.com/x", "http://b.com/x", "http://a.com/y"], ["a.com", "b.com", "a.com"],
          epoch=1, parents=[10, 11, 12])
    out = f.pop_ready(now=10.0, horizon=1.5)
    assert sorted(out["url"]) == ["http://a.com/x", "http://a.com/y", "http://b.com/x"]
    by_url = dict(zip(out["url"], out["fetch_after"]))
    assert by_url["http://a.com/x"] == 10.0 and by_url["http://a.com/y"] == 11.0
    assert by_url["http://b.com/x"] == 10.0


def test_frontier_horizon_blocks():
    f = FrontierShard(0, delay_sec=5.0)
    _push(f, ["http://a.com/1", "http://a.com/2"], ["a.com"] * 2, parents=[1, 2])
    out = f.pop_ready(now=0.0, horizon=1.0)
    assert out["url"] == ["http://a.com/1"]
    assert f.size() == 1
    assert f.next_ready_time() == 5.0
    out = f.pop_ready(now=5.0, horizon=1.0)
    assert out["url"] == ["http://a.com/2"]


def test_frontier_checkpoint(tmp_path):
    f = FrontierShard(1, delay_sec=0.0)
    _push(f, [f"http://h{i%3}.com/p{i}" for i in range(20)], [f"h{i%3}.com" for i in range(20)],
          parents=list(range(20)))
    f.checkpoint(str(tmp_path))
    f2 = FrontierShard(1, delay_sec=0.0)
    assert f2.restore(str(tmp_path)) == 20
    a = f2.pop_ready(0.0, 1.0)
    assert len(a["url"]) == 20


def test_shard_routing_stable():
    urls = [f"http://x.com/{i}" for i in range(1000)]
    h1 = shard_of(url_hash64_batch(urls), 8)
    h2 = shard_of(url_hash64_batch(urls), 8)
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == 8


def test_proportional_pop_budgets():
    from walk_ray.pipelines.crawl import _proportional_budgets

    # unknown sizes -> uniform
    assert _proportional_budgets(None, 100, 4) == [26, 26, 26, 26]
    # skewed sizes -> hot shard gets most of the global budget
    b = _proportional_budgets([970, 10, 10, 10], 100, 4)
    assert b[0] >= 90 and all(x >= 1 for x in b[1:])
    # empty shards still get the minimum
    assert _proportional_budgets([0, 0, 0, 0], 100, 4) == [26, 26, 26, 26]
