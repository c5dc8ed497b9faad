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

import numpy as np
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
    ``ray.remote``).

    Internals are COLUMNAR: per-host queues are lists of Arrow table
    segments (zero-copy slices of pushed/sorted batches), so push,
    drain, pop and checkpoint are all array ops — no per-row Python
    tuples anywhere in the epoch hot path. Pop counts per host come
    from the politeness arithmetic in O(1); ``fetch_after`` values are
    a sequential ``np.cumsum`` so they are bit-identical to the
    accumulated ``t += step`` loop they replaced (crawl-order goldens
    depend on exact float equality)."""

    def __init__(self, shard_id: int = 0, delay_sec: float = 0.0, robots_handles=None):
        self.shard_id = shard_id
        self.delay = float(delay_sec)
        self.queues: dict[str, list[pa.Table]] = {}  # host -> table segments
        self.qlen: dict[str, int] = {}          # host -> queued entry count
        self.host_next: dict[str, float] = {}   # host -> next allowed virtual fetch time
        self.host_delay: dict[str, float] = {}  # host -> extra backoff delay (429/5xx)
        # host -> robots Crawl-delay base (lazily resolved from the
        # robots cache shards on first pop of the host; polite mode)
        self.host_base: dict[str, float] = {}
        self.robots = robots_handles or []
        self.buffer: list[pa.Table] = []        # un-sorted arrivals since last pop
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
        lists keyed by FRONTIER_COLS) — one vectorized Arrow encode,
        no per-row work."""
        n = len(rows["url"])
        if n:
            self.buffer.append(pa.table(
                {c: pa.array(rows[c], _CKPT_SCHEMA.field(c).type) for c in FRONTIER_COLS},
                schema=_CKPT_SCHEMA,
            ))
            self.total += n
        return n

    def _drain_buffer(self) -> None:
        if not self.buffer:
            return
        # Canonical discovery order within the arrival window: one
        # multi-key Arrow sort, then zero-copy per-host slices appended
        # as queue segments (existing queued entries stay ahead).
        t = pa.concat_tables(self.buffer)
        self.buffer.clear()
        t = t.sort_by([("host", "ascending"), ("epoch", "ascending"),
                       ("parent_seq", "ascending"), ("link_idx", "ascending")])
        t = t.combine_chunks()
        hosts = t["host"].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.r_[True, hosts[1:] != hosts[:-1], True])
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            host = hosts[lo]
            self.queues.setdefault(host, []).append(t.slice(lo, hi - lo))
            self.qlen[host] = self.qlen.get(host, 0) + (hi - lo)

    # -- consumer ------------------------------------------------------

    def _pop_table(self, now: float, horizon: float, max_total: int) -> pa.Table:
        """Pop every entry whose politeness slot falls inside
        ``[now, now + horizon)`` as ONE Arrow table with an appended
        ``fetch_after`` column. Hosts are visited in sorted order for
        determinism; per-host pop counts come from the pacing
        arithmetic, rows move as table slices."""
        self._drain_buffer()
        self._resolve_robots_delays()
        deadline = now + horizon
        budget = max_total
        taken: list[pa.Table] = []
        fas: list[np.ndarray] = []
        empty_hosts = []
        for host in sorted(self.queues):
            t0 = max(self.host_next.get(host, 0.0), now)
            step = max(self.delay, self.host_base.get(host, 0.0)) \
                + self.host_delay.get(host, 0.0)
            qn = self.qlen[host]
            if budget <= 0 or t0 >= deadline:
                self.host_next[host] = t0
                continue
            if step <= 0.0:
                k = min(qn, budget)
                fa = np.full(k, t0, dtype=np.float64)
                t_end = t0
            else:
                # fetch_after values accumulate (cumsum == the old
                # ``t += step`` loop bit-for-bit); k = how many stay
                # strictly under the deadline
                est = np.ceil((deadline - t0) / step) + 2
                kmax = int(min(qn, budget, est))
                fa = np.cumsum(np.r_[t0, np.full(kmax - 1, step)])
                k = min(int(np.searchsorted(fa, deadline, side="left")), qn, budget)
                fa = fa[:k]
                t_end = float(fa[-1]) + step if k else t0
            self.host_next[host] = t_end
            if k == 0:
                continue
            segs = self.queues[host]
            got = 0
            while got < k:
                s = segs[0]
                need = k - got
                if s.num_rows <= need:
                    taken.append(s)
                    got += s.num_rows
                    segs.pop(0)
                else:
                    taken.append(s.slice(0, need))
                    segs[0] = s.slice(need)
                    got = k
            fas.append(fa)
            self.qlen[host] = qn - k
            budget -= k
            self.total -= k
            if not segs:
                empty_hosts.append(host)
        for host in empty_hosts:
            del self.queues[host]
            del self.qlen[host]
        if taken:
            out = pa.concat_tables(taken)
            fa_col = pa.array(np.concatenate(fas), pa.float64())
        else:
            out = _CKPT_SCHEMA.empty_table()
            fa_col = pa.array([], pa.float64())
        return out.append_column("fetch_after", fa_col)

    def pop_ready(self, now: float, horizon: float, max_total: int = 1 << 30) -> dict:
        """Compat/introspection variant: the popped batch as a dict of
        Python lists (tests, registry protocol). The crawl hot path
        uses :meth:`pop_ready_refs` and never converts to Python."""
        t = self._pop_table(now, horizon, max_total)
        return {c: t[c].to_pylist() for c in (*FRONTIER_COLS, "fetch_after")}

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
        import ray

        table = self._pop_table(now, horizon, max_total).combine_chunks()
        fa = table["fetch_after"].to_numpy()
        keys = {
            "epoch": table["epoch"].to_numpy().astype(np.int32, copy=False),
            "fetch_after": fa,
            "parent_seq": table["parent_seq"].to_numpy().astype(np.int64, copy=False),
            "link_idx": table["link_idx"].to_numpy().astype(np.int32, copy=False),
        }
        n = table.num_rows
        max_fa = float(fa.max()) if n else 0.0
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
        return dict(self.qlen)

    def checkpoint(self, directory: str) -> str:
        self._drain_buffer()
        os.makedirs(directory, exist_ok=True)
        segs = [s for h in sorted(self.queues) for s in self.queues[h]]
        table = pa.concat_tables(segs) if segs else _CKPT_SCHEMA.empty_table()
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
        self.qlen.clear()
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
        self.buffer = [t.cast(_CKPT_SCHEMA)] if t.num_rows else []
        self.total = t.num_rows
        return t.num_rows
