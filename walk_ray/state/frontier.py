"""Frontier shards: per-host politeness-paced priority queues.

Walk's frontier is one FIFO channel of capacity 150
(``/root/reference/lib/queue.go:24-72``) with per-host crawl delays
delegated to fetchbot (``lib/worker.go:81-83``). Here the frontier is
sharded by ``hash(host)`` so a host's entries are always owned by one
shard — preserving per-host FIFO order and politeness pacing no matter
how many shards exist — and each shard paces hosts with a virtual
clock: host ``h`` may fetch again ``delay`` seconds after its previous
fetch.

Deterministic ordering (SURVEY §2.9): walk's own enqueue order is
nondeterministic (Go map iteration, ``lib/coordinator.go:301``); this
engine defines the canonical linearization — entries sort by
``(epoch, parent_seq, link_idx)`` (discovery order) within a host, and
pops are reported with an assigned virtual ``fetch_after`` so the
global crawl order is ``(epoch, fetch_after, parent_seq, link_idx)``.
"""

from __future__ import annotations

import os
from collections import deque

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["FrontierShard", "FRONTIER_COLS"]

FRONTIER_COLS = ("url", "host", "job_id", "attempts", "prev_status", "epoch", "parent_seq", "link_idx")

_CKPT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("job_id", pa.string()),
        ("attempts", pa.int32()),
        ("prev_status", pa.int32()),
        ("epoch", pa.int32()),
        ("parent_seq", pa.int64()),
        ("link_idx", pa.int32()),
    ]
)


class FrontierShard:
    """One frontier shard (plain class; the driver wraps it in
    ``ray.remote``)."""

    def __init__(self, shard_id: int = 0, delay_sec: float = 0.0, robots_handles=None):
        self.shard_id = shard_id
        self.delay = float(delay_sec)
        self.queues: dict[str, deque] = {}      # host -> deque of entry tuples
        self.host_next: dict[str, float] = {}   # host -> next allowed virtual fetch time
        self.host_delay: dict[str, float] = {}  # host -> extra backoff delay (429/5xx)
        # host -> robots Crawl-delay base (lazily resolved from the
        # robots cache shards on first pop of the host; polite mode)
        self.host_base: dict[str, float] = {}
        self.robots = robots_handles or []
        self.buffer: list[tuple] = []           # un-sorted arrivals since last pop
        self.total = 0

    def _resolve_robots_delays(self) -> None:
        """Fill host_base for queued hosts not yet resolved (grouped
        RPC per robots shard; the effective per-host pace is
        max(configured delay, robots Crawl-delay))."""
        if not self.robots:
            return
        missing = [h for h in self.queues if h not in self.host_base]
        if not missing:
            return
        import ray

        from .seen import shard_of, url_hash64_batch

        shards = shard_of(url_hash64_batch(missing), len(self.robots))
        futures = {}
        for sh in set(shards.tolist()):
            hs = [h for h, x in zip(missing, shards) if x == sh]
            futures[sh] = (hs, self.robots[sh].crawl_delays.remote(hs))
        for hs, fut in futures.values():
            for h, d in zip(hs, ray.get(fut)):
                self.host_base[h] = float(d) if d else 0.0

    # -- producers -----------------------------------------------------

    def push(self, rows: dict) -> int:
        """Accept a batch of frontier entries (dict of equal-length
        lists keyed by FRONTIER_COLS)."""
        n = len(rows["url"])
        self.buffer.extend(zip(*(rows[c] for c in FRONTIER_COLS)))
        self.total += n
        return n

    def _drain_buffer(self) -> None:
        if not self.buffer:
            return
        # Canonical discovery order within the arrival window.
        self.buffer.sort(key=lambda e: (e[5], e[6], e[7]))
        for e in self.buffer:
            self.queues.setdefault(e[1], deque()).append(e)
        self.buffer.clear()

    # -- consumer ------------------------------------------------------

    def pop_ready(self, now: float, horizon: float, max_total: int = 1 << 30) -> dict:
        """Pop every entry whose politeness slot falls inside
        ``[now, now + horizon)``, assigning each its virtual
        ``fetch_after``. Hosts are visited in sorted order for
        determinism."""
        self._drain_buffer()
        self._resolve_robots_delays()
        out = {c: [] for c in FRONTIER_COLS}
        out["fetch_after"] = []
        deadline = now + horizon
        popped = 0
        empty_hosts = []
        for host in sorted(self.queues):
            q = self.queues[host]
            t = max(self.host_next.get(host, 0.0), now)
            step = max(self.delay, self.host_base.get(host, 0.0))                 + self.host_delay.get(host, 0.0)
            while q and t < deadline and popped < max_total:
                e = q.popleft()
                for c, v in zip(FRONTIER_COLS, e):
                    out[c].append(v)
                out["fetch_after"].append(t)
                t += step
                popped += 1
            self.host_next[host] = t
            if not q:
                empty_hosts.append(host)
        for host in empty_hosts:
            del self.queues[host]
        self.total -= popped
        return out

    def pop_ready_refs(self, now: float, horizon: float, max_total: int = 1 << 30):
        """Scale variant of :meth:`pop_ready` for the epoch hot path:
        the popped rows stay OUT of the driver entirely. Returns
        ``(n, max_fetch_after, keys_ref, table_ref)`` — two scalars for
        the driver plus object-store references: ``keys_ref`` holds the
        narrow linearization-key arrays (epoch, fetch_after,
        parent_seq, link_idx) consumed by the remote global-seq
        assignment task, and ``table_ref`` the full popped rows as one
        Arrow table (URLs and all) that downstream fetch tasks consume
        directly. The driver never touches a per-row value."""
        import numpy as np
        import ray

        popped = self.pop_ready(now, horizon, max_total)
        keys = {
            "epoch": np.asarray(popped["epoch"], dtype=np.int32),
            "fetch_after": np.asarray(popped["fetch_after"], dtype=np.float64),
            "parent_seq": np.asarray(popped["parent_seq"], dtype=np.int64),
            "link_idx": np.asarray(popped["link_idx"], dtype=np.int32),
        }
        table = pa.table(
            {
                "url": pa.array(popped["url"], pa.string()),
                "host": pa.array(popped["host"], pa.string()),
                "job_id": pa.array(popped["job_id"], pa.string()),
                "attempts": pa.array(popped["attempts"], pa.int32()),
                "prev_status": pa.array(popped["prev_status"], pa.int32()),
                "epoch": pa.array(popped["epoch"], pa.int32()),
                "parent_seq": pa.array(popped["parent_seq"], pa.int64()),
                "link_idx": pa.array(popped["link_idx"], pa.int32()),
                "fetch_after": pa.array(popped["fetch_after"], pa.float64()),
            }
        )
        n = table.num_rows
        max_fa = float(keys["fetch_after"].max()) if n else 0.0
        return n, max_fa, ray.put(keys), ray.put(table)

    def backoff(self, hosts: list[str], step: float) -> None:
        """Per-host slow-down on backoff response codes: each report
        adds ``step`` (= delay/2, the reference's commented-out
        increment, lib/job.go:113 + lib/coordinator.go:264-275) to the
        host's politeness delay. Only the reported hosts slow down;
        other hosts on this shard keep their pace."""
        for h in hosts:
            self.host_delay[h] = self.host_delay.get(h, 0.0) + step

    def speed_up(self, step: float) -> None:
        """The reference's recovery ticker (lib/job.go:121-131) on the
        engine's epoch clock: shrink each host's extra delay by
        ``step`` toward the configured base."""
        for h in list(self.host_delay):
            d = self.host_delay[h] - step
            if d <= 1e-12:
                del self.host_delay[h]
            else:
                self.host_delay[h] = d

    def next_ready_time(self) -> float | None:
        """Earliest virtual time any queued host could fetch; None when
        the shard is empty."""
        self._drain_buffer()
        if not self.queues:
            return None
        return min(self.host_next.get(h, 0.0) for h in self.queues)

    # -- introspection / persistence ----------------------------------

    def size(self) -> int:
        return self.total

    def host_sizes(self) -> dict[str, int]:
        self._drain_buffer()
        return {h: len(q) for h, q in self.queues.items()}

    def checkpoint(self, directory: str) -> str:
        self._drain_buffer()
        os.makedirs(directory, exist_ok=True)
        entries = [e for h in sorted(self.queues) for e in self.queues[h]]
        cols = list(zip(*entries)) if entries else [[] for _ in FRONTIER_COLS]
        table = pa.table(
            {c: pa.array(list(v), _CKPT_SCHEMA.field(c).type) for c, v in zip(FRONTIER_COLS, cols)},
            schema=_CKPT_SCHEMA,
        )
        path = os.path.join(directory, f"frontier-{self.shard_id:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        # host_next (per-host politeness virtual clock) rides in a
        # sidecar — without it a resumed delayed crawl would assign
        # different fetch_after values than the uninterrupted run.
        import json

        hpath = os.path.join(directory, f"frontier-{self.shard_id:05d}.hosts.json")
        tmp = hpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"host_next": self.host_next, "host_delay": self.host_delay,
                       "host_base": self.host_base}, f)
        os.replace(tmp, hpath)
        return path

    def restore(self, directory: str) -> int:
        path = os.path.join(directory, f"frontier-{self.shard_id:05d}.parquet")
        t = pq.read_table(path)
        self.queues.clear()
        self.host_next.clear()
        import json

        hpath = os.path.join(directory, f"frontier-{self.shard_id:05d}.hosts.json")
        self.host_delay.clear()
        if os.path.exists(hpath):
            with open(hpath) as f:
                d = json.load(f)
            if "host_next" in d:  # sidecar format v2
                self.host_next = {h: float(v) for h, v in d["host_next"].items()}
                self.host_delay = {h: float(v) for h, v in d.get("host_delay", {}).items()}
                self.host_base = {h: float(v) for h, v in d.get("host_base", {}).items()}
            else:
                self.host_next = {h: float(v) for h, v in d.items()}
        self.buffer = list(zip(*(t[c].to_pylist() for c in FRONTIER_COLS))) if t.num_rows else []
        self.total = t.num_rows
        return t.num_rows
