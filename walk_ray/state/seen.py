"""URL-seen / request-store shards.

Walk's ``RequestStore`` (``/root/reference/lib/request_store.go:11-16``)
is a single mutex-guarded map keyed by the *raw* URL string; the
coordinator consults it for the seen anti-join
(``lib/coordinator.go:301-309``) and updates status/attempts on dequeue
(``lib/coordinator.go:330-388``). Here the store is sharded across an
actor pool by a stable 64-bit hash of the URL so the anti-join becomes
a hash-partitioned batch RPC instead of a global lock, and each shard
fronts its exact dict with a cuckoo filter (see
``walk_ray.state.cuckoo``) for 10^10-frontier arithmetic.

Conformance notes kept intact:
- keys are URL strings exactly as enqueued — links arrive normalized
  (``lib/resource.go:177``) but seeds enter raw
  (``lib/coordinator.go:176``); the asymmetry is part of walk's
  observable behavior and is reproduced, not fixed.
- dequeue semantics (``lib/coordinator.go:330-388``): the entry is
  keyed by the *resource's* URL (normalized by the worker), created on
  miss; ``prev_status`` updated, ``attempts`` incremented; ok-status →
  Done, attempts ≤ max → retry (re-queued), else Failed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import (
    STATUS_DONE,
    STATUS_FAILED,
    STATUS_QUEUED,
    URL_SEEN,
)
from .cuckoo import CuckooFilter

__all__ = ["SeenShard", "url_hash64", "shard_of", "url_hash64_batch",
           "push_rows_to_frontier"]


def push_rows_to_frontier(frontier_handles, rows: dict, by_url: bool = False) -> None:
    """Route frontier entries to shards (see FrontierShard.push).
    Default: by hash(host) so one shard owns each host's politeness
    clock; ``by_url`` salts hot hosts across all shards when per-host
    pacing is inert."""
    import ray

    from .frontier import FRONTIER_COLS

    keys = rows["url"] if by_url else rows["host"]
    shard_ids = shard_of(url_hash64_batch(keys), len(frontier_handles))
    waits = []
    for s in set(shard_ids.tolist()):
        idxs = [i for i, x in enumerate(shard_ids) if x == s]
        shard_rows = {c: [rows[c][i] for i in idxs] for c in FRONTIER_COLS}
        waits.append(frontier_handles[s].push.remote(shard_rows))
    ray.get(waits)


def url_hash64(url: str) -> int:
    """Stable (process-independent) 64-bit hash of a URL string."""
    return int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big")


def url_hash64_batch(urls) -> np.ndarray:
    b2b = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(b2b(u.encode("utf-8"), digest_size=8).digest(), "big") for u in urls),
        dtype=np.uint64,
        count=len(urls),
    )


def shard_of(hashes: np.ndarray, n_shards: int) -> np.ndarray:
    return (hashes % np.uint64(n_shards)).astype(np.int64)


class SeenShard:
    """One shard of the request store. Wrapped in ``ray.remote`` by the
    crawl driver; kept a plain class so unit tests run without Ray."""

    def __init__(self, shard_id: int = 0, capacity: int = 1 << 16):
        self.shard_id = shard_id
        # url -> [status, attempts, prev_status]
        self.entries: dict[str, list[int]] = {}
        self.filter = CuckooFilter(capacity)
        self.filter_false_positives = 0  # filter said maybe, exact store said new
        self.filter_rebuilds = 0
        self._epoch_new: dict[str, int] = {}  # url -> min disc key this epoch

    def _ensure_filter_capacity(self, incoming: int = 0) -> None:
        """Grow (rebuild) the cuckoo filter before it saturates: past
        ~80% load every insert degenerates into the full kick-eviction
        loop (hundreds of Python steps per URL — a silent scale
        cliff). The exact entries dict is authoritative, so a rebuild
        at 2× capacity restores a clean filter including any
        previously kicked-out memberships. Amortized O(1) per URL."""
        f = self.filter
        slots = f.n_buckets * f.bucket_size
        if f.count + f.kicked_out + incoming <= 0.8 * slots:
            return
        cap = max(slots * 2, int(len(self.entries) * 2.5) + 1024)
        nf = CuckooFilter(cap)
        if self.entries:
            nf.insert_batch(url_hash64_batch(list(self.entries.keys())))
        self.filter = nf
        self.filter_rebuilds += 1

    # -- enqueue path --------------------------------------------------

    def check_and_add(self, urls: list[str], failed: bool = False) -> list[bool]:
        """Anti-join + insert: for each URL return True when it was
        unseen (now marked Queued / Failed-at-shutdown). Mirrors
        ``coord.enqueue`` + ``GetRequest`` (lib/coordinator.go:301-328).
        """
        if not urls:
            return []
        hashes = url_hash64_batch(urls)
        maybe_seen = self.filter.contains_batch(hashes)
        status = STATUS_FAILED if failed else STATUS_QUEUED
        out = []
        new_hashes = []
        entries = self.entries
        for i, u in enumerate(urls):
            if maybe_seen[i]:
                if u in entries:
                    out.append(False)
                    continue
                self.filter_false_positives += 1
            elif u in entries:  # filter overflow fallback (kicked_out > 0)
                out.append(False)
                continue
            entries[u] = [status, 0, 0]
            new_hashes.append(hashes[i])
            out.append(True)
        if new_hashes:
            self._ensure_filter_capacity(len(new_hashes))
            self.filter.insert_batch(np.asarray(new_hashes, dtype=np.uint64))
        return out

    # -- candidate path (J1 without a Dataset shuffle) -----------------

    def observe_candidates(self, urls: list[str], discs: list[int]) -> int:
        """Accumulate this epoch's candidate URLs with their MIN
        discovery key. Deterministic without any ordering guarantee:
        min() is commutative, so first-discovery attribution is exact
        no matter how batches race (replaces a groupby(url).min(disc)
        shuffle — the anti-join's wide step becomes sharded state).

        Membership itself is checked at drain time (after all epoch
        work), so same-epoch dequeue-created entries win over
        candidates — the engine's documented linearization.
        """
        if not urls:
            return 0
        hashes = url_hash64_batch(urls)
        maybe_seen = self.filter.contains_batch(hashes)
        epoch_new = self._epoch_new
        entries = self.entries
        n = 0
        for i, u in enumerate(urls):
            if maybe_seen[i] and u in entries:
                continue
            if not maybe_seen[i] and self.filter.kicked_out and u in entries:
                continue
            d = discs[i]
            prev = epoch_new.get(u)
            if prev is None or d < prev:
                epoch_new[u] = d
                n += 1
        return n

    def drain_epoch_new(self, failed: bool = False) -> tuple[list[str], list[int]]:
        """End-of-epoch: register the epoch's new URLs (Queued, or
        Failed when the job is stopping — enqueue-during-shutdown,
        lib/coordinator.go:314-328) and return (urls, min_discs) for
        the frontier push, sorted by URL for determinism."""
        out_urls: list[str] = []
        out_discs: list[int] = []
        status = STATUS_FAILED if failed else STATUS_QUEUED
        entries = self.entries
        for u in sorted(self._epoch_new):
            if u in entries:  # dequeue-created during this epoch
                continue
            entries[u] = [status, 0, 0]
            out_urls.append(u)
            out_discs.append(self._epoch_new[u])
        if out_urls:
            self._ensure_filter_capacity(len(out_urls))
            self.filter.insert_batch(url_hash64_batch(out_urls))
        self._epoch_new = {}
        return out_urls, out_discs

    def drain_and_push(self, failed: bool, frontier_handles, job_id: str,
                       next_epoch: int, salt_by_url: bool,
                       disc_shift: int) -> tuple[int, int]:
        """Epoch drain with the frontier push done SHARD-TO-SHARD:
        the driver receives only ``(pushed_count, shard_size)`` — the
        size rides along so the end-of-epoch metrics need no separate
        per-shard RPC round. Removes the last per-epoch driver
        serialization hop (row lists for hundreds of thousands of new
        URLs used to transit the driver each epoch).
        """
        from ..functions.canon import url_host

        out_urls, out_discs = self.drain_epoch_new(failed)
        if failed or not out_urls:
            return len(out_urls), self.size()
        rows = {
            "url": out_urls,
            "host": [url_host(u) for u in out_urls],
            "job_id": [job_id] * len(out_urls),
            "attempts": [0] * len(out_urls),
            "prev_status": [0] * len(out_urls),
            "epoch": [next_epoch] * len(out_urls),
            "parent_seq": [d // disc_shift for d in out_discs],
            "link_idx": [d % disc_shift for d in out_discs],
        }
        push_rows_to_frontier(frontier_handles, rows, salt_by_url)
        return len(out_urls), self.size()

    # -- dequeue path --------------------------------------------------

    def dequeue(self, urls: list[str], statuses: list[int], max_attempts: int) -> list[str]:
        """Record fetch results; returns per-URL disposition
        ``done`` | ``retry`` | ``failed`` (lib/coordinator.go:330-388)."""
        out = []
        for u, s in zip(urls, statuses):
            e = self.entries.get(u)
            if e is None:
                e = [STATUS_QUEUED, 0, 0]
                self.entries[u] = e
                self._ensure_filter_capacity(1)
                self.filter.insert_batch(url_hash64_batch([u]))
            e[2] = int(s)
            e[1] += 1
            if 200 <= s <= 308:
                e[0] = STATUS_DONE
                out.append("done")
            elif e[1] <= max_attempts:
                e[0] = STATUS_QUEUED
                out.append("retry")
            else:
                e[0] = STATUS_FAILED
                out.append("failed")
        return out

    # -- introspection / persistence ----------------------------------

    def size(self) -> int:
        return len(self.entries)

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "entries": len(self.entries),
            "filter_count": self.filter.count,
            "filter_load": self.filter.load_factor,
            "filter_false_positives": self.filter_false_positives,
            "filter_kicked_out": self.filter.kicked_out,
            "filter_rebuilds": self.filter_rebuilds,
        }

    def dump(self) -> pa.Table:
        urls = list(self.entries.keys())
        vals = list(self.entries.values())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array([v[0] for v in vals], pa.uint8()),
                "attempts": pa.array([v[1] for v in vals], pa.int32()),
                "prev_status": pa.array([v[2] for v in vals], pa.int32()),
            },
            schema=URL_SEEN,
        )

    def finalize(self, directory: str) -> int:
        """Write this shard's url-seen contents as its own sorted
        parquet (``seen-K.parquet``). The driver never sees the rows —
        only this count — so finalize stays O(shard) everywhere; a
        global order is recoverable by merge-reading the shard files
        (each is sorted, rows are hash-partitioned by url)."""
        os.makedirs(directory, exist_ok=True)
        t = self.dump().sort_by("url")
        path = os.path.join(directory, f"seen-{self.shard_id:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return t.num_rows

    def checkpoint(self, directory: str) -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"seen-{self.shard_id:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(self.dump(), tmp)
        os.replace(tmp, path)
        return path

    def restore(self, directory: str) -> int:
        path = os.path.join(directory, f"seen-{self.shard_id:05d}.parquet")
        t = pq.read_table(path)
        self.entries = {
            u: [s, a, p]
            for u, s, a, p in zip(
                t["url"].to_pylist(),
                t["status"].to_pylist(),
                t["attempts"].to_pylist(),
                t["prev_status"].to_pylist(),
            )
        }
        self.filter = CuckooFilter(max(len(self.entries) * 2, 1 << 16))
        if self.entries:
            self.filter.insert_batch(url_hash64_batch(list(self.entries.keys())))
        return len(self.entries)
