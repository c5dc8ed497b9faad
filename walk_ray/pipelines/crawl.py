"""The crawl: a driver-side BSP epoch loop over Ray.

Walk's fixed-point fetch-and-expand loop
(``/root/reference/lib/coordinator.go:261-312``) becomes BSP
supersteps (SURVEY §2.9): each epoch pops every politeness-ready
frontier entry and runs the fused per-batch stage chain

    pops → FetchStage (PageStore plasma tables + row-index RPCs)
         → extract_resources (vectorized kernels, bodies dropped)
         → CommitStage (resources sink + dequeue via SeenShards +
                        candidate observe: sharded min-disc accumulate)
    then an epoch drain: each SeenShard registers its new URLs
    (commutative min over discovery keys → deterministic
    first-discovery attribution without a Dataset shuffle) and pushes
    the survivors shard-to-shard into the frontier.

Epoch chunks execute as PLAIN Ray tasks over object-store Arrow
blocks rather than a per-epoch ``ray.data`` pipeline: the stage chain
is exactly what map_batches fusion would produce, but the BSP loop
launches a fresh pipeline every epoch and the streaming executor's
per-execution setup (~2-4 s at 32 CPUs) dwarfs most epochs' useful
work. This is the documented "drop to raw tasks where the Dataset API
genuinely can't express the semantics" case: a latency-sensitive
fixed-point loop of many short executions. All offline/query
pipelines remain Dataset programs.

and loops until the frontier is empty and nothing is in flight —
walk's done-scan condition (``lib/coordinator.go:181-216``).

Determinism: walk's completion-batch link iteration is Go-map-ordered
(nondeterministic, ``lib/coordinator.go:301``); this engine's
canonical linearization is ``(epoch, fetch_after, parent_seq,
link_idx)`` — the per-epoch ``groupby(url).min(disc_key)`` barrier
makes first-discovery attribution exact, so two runs produce identical
crawl order, URL-seen set and sitemap.

Scale notes (10^10-frontier arithmetic):
- NO per-row data ever reaches the driver: pops ship as object-store
  refs, the global seq lexsort runs as a remote task over those refs
  (``_assign_seqs_impl``), and the crawl-order golden is written by a
  remote task off the hot path — the driver handles counts, refs and
  the epoch clock only; bodies stay inside the epoch pipeline and are
  dropped before the only shuffle (the candidate groupby);
- the seen anti-join is a hash-partitioned batch RPC against sharded
  cuckoo-fronted stores, not a Dataset join;
- per-epoch outputs land in ``resources/epoch=K/`` so a resumed run
  (``resume=True``) restores the last checkpoint manifest and replays
  only unfinished epochs.

Side-effecting stages (CommitStage) assume Ray Data does not
re-execute their tasks mid-epoch; observe_candidates is idempotent
(min-accumulate) and the epoch checkpoint is the recovery unit.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.canon import url_host
from ..functions.urlfilter import CandidateFilter
from ..sources.pages import PageStore, prepare_page_partitions
from ..stages.extract_stage import RESOURCE_STAGE_SCHEMA, extract_resources
from ..stages.fetch import FetchStage
from ..state.frontier import FRONTIER_COLS, FrontierShard
from ..state.robots import RobotsCache
from ..state.seen import SeenShard, shard_of, url_hash64_batch

__all__ = ["CrawlConfig", "CrawlJob"]

_DISC_SHIFT = 1 << 20  # link_idx fits in 20 bits


@dataclass
class CrawlConfig:
    """Mirror of walk's JobConfig + worker/coordinator knobs
    (``/root/reference/lib/config.go:89-190``)."""

    seeds: list[str] = field(default_factory=list)
    # newline-delimited seed file (walk SeedsPath, lib/job.go:210-235)
    seeds_path: str = ""
    domains: list[str] = field(default_factory=list)
    ignore_patterns: list[str] = field(default_factory=list)
    crawl: bool = True
    delay_milli: int = 0
    max_attempts: int = 3
    stop_url: str = ""
    stop_after_entries: int = 0
    # The reference declares backoff codes but its slow-down path is
    # commented out (lib/coordinator.go:264-275) — with
    # ``enable_backoff=False`` (default) this stays a parity no-op.
    # Enabling it activates the declared-but-dead design, sharpened to
    # per-HOST pacing: each backoff response adds delay/2 to that
    # host's politeness delay; the per-epoch speed_up tick recovers it
    # (lib/job.go:113-131).
    backoff_response_codes: list[int] = field(default_factory=list)
    enable_backoff: bool = False
    polite: bool = False
    record_redirects: bool = True
    # walk RecordResponseHeaders (lib/config.go:147,173-174): capture
    # response headers as a flat [k,v,...] column; default off
    record_headers: bool = False
    job_id: str = "1"
    # physical knobs; shard counts default to half the CPU budget
    # (the sandbox analog of one shard per node-core on a cluster) —
    # results are shard-count-independent (deterministic linearization)
    n_frontier_shards: int = 0
    n_seen_shards: int = 0
    n_page_parts: int = 0
    fetch_concurrency: int = 4
    fetch_batch_size: int = 1024
    max_pop_per_epoch: int = 500_000
    horizon_sec: float = 3600.0
    checkpoint_every: int = 0  # epochs between checkpoints; 0 = final only
    # self-healing: on a state-actor death mid-crawl (node loss on a
    # real cluster), rebuild the actor fleet, restore the last
    # checkpoint (or re-seed when none exists yet) and replay — the
    # deterministic linearization makes the recovered crawl
    # byte-identical to an uninterrupted one. 0 recoveries = fail fast.
    auto_recover: bool = True
    max_recoveries: int = 3
    # content-addressed body store (walk's CBOR body archive,
    # lib/resource_handler.go:104-155): bodies/epoch-K parquet keyed by
    # multihash, deduplicated within epoch (identical bodies stored once)
    store_bodies: bool = False
    # shared page-partition cache dir; empty → per-workdir (the
    # partitioning job is deterministic and fingerprint-stamped, so a
    # shared dir lets repeated runs of the same pages table skip it)
    page_parts_dir: str = ""

    # walk-compat single-file JSON sitemap (serial driver write). At
    # scale, set False → distributed sorted parquet sitemap instead.
    sitemap_json: bool = True

    @property
    def _salt_hosts(self) -> bool:
        """Hot-host splitting is safe exactly when per-host pacing is
        inert: no configured delay, no robots politeness, no backoff.
        Then frontier shard ownership is just load balancing and a
        mega-host spreads across every shard."""
        return (self.delay_milli == 0 and not self.polite
                and not self.enable_backoff)

    @classmethod
    def from_job_json(cls, job: dict, **overrides) -> "CrawlConfig":
        cfg = cls(
            seeds=job.get("seeds", []),
            domains=job.get("domains", []),
            ignore_patterns=job.get("ignore_patterns", []),
            crawl=job.get("crawl", True),
            delay_milli=job.get("delay_milli", 0),
            max_attempts=job.get("max_attempts", 3),
            stop_url=job.get("stop_url", ""),
            stop_after_entries=job.get("stop_after_entries", 0),
            seeds_path=job.get("seeds_path", ""),
            backoff_response_codes=job.get("backoff_response_codes", []),
            record_headers=job.get("record_headers", False),
            polite=job.get("polite", False),
            record_redirects=job.get("record_redirects", True),
            enable_backoff=job.get("enable_backoff", False),
            auto_recover=job.get("auto_recover", True),
            max_recoveries=job.get("max_recoveries", 3),
        )
        # physical knobs ride in the same job body (a submitted job is
        # sized for its cluster, not the server's defaults); explicit
        # **overrides still win
        for k in ("n_frontier_shards", "n_seen_shards", "checkpoint_every",
                  "store_bodies", "sitemap_json", "max_pop_per_epoch"):
            if k in job:
                setattr(cfg, k, job[k])
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg


class BodyStage:
    """Optional content-addressed body sink (S6/D4): writes
    (hash, html) parquet per batch, deduplicated by multihash within
    the batch — identical bodies collapse to one row, mirroring walk's
    content-addressed body files (lib/resource_handler.go:104-155,
    same hash → same path → one copy). Cross-batch duplicates are
    collapsed by readers via drop_duplicates(hash)."""

    def __init__(self, bodies_dir: str = ""):
        self.bodies_dir = bodies_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.extract import multihash_b58

        hops = batch["is_hop"].to_pylist()
        errors = batch["error"].to_pylist()
        htmls = batch["html"].to_pylist()
        seen: dict[str, bytes] = {}
        for i in range(batch.num_rows):
            if hops[i] or errors[i]:
                continue
            body = bytes(htmls[i] or b"")
            seen.setdefault(multihash_b58(body), body)
        if seen:
            t = pa.table(
                {
                    "hash": pa.array(list(seen.keys()), pa.string()),
                    "html": pa.array(list(seen.values()), pa.large_binary()),
                }
            )
            pq.write_table(t, os.path.join(self.bodies_dir, f"part-{uuid.uuid4().hex}.parquet"))
        return batch


class CommitStage:
    """Dequeue + resources sink + candidate emit (one map_batches
    stage; SURVEY §3.1 step 6 re-expressed)."""

    def __init__(self, seen_handles, frontier_handles, robots_handle, cfg: CrawlConfig,
                 resources_dir: str, metrics_handle):
        self.seen = seen_handles
        self.frontier = frontier_handles
        self.robots = robots_handle
        self.cfg = cfg
        self.resources_dir = resources_dir
        self.metrics = metrics_handle
        self.filter = CandidateFilter(cfg.domains, cfg.ignore_patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        cfg = self.cfg
        urls = batch["url"].to_pylist()
        statuses = batch["status"].to_pylist()
        epochs = batch["epoch"].to_pylist()
        seqs = batch["seq"].to_pylist()
        attempts_in = batch["attempts"].to_pylist()
        n = batch.num_rows

        # 1. dequeue via seen shards (keyed by the RESOURCE url,
        #    lib/coordinator.go:330-340)
        shard_ids = shard_of(url_hash64_batch(urls), len(self.seen))
        by_shard: dict[int, list[int]] = {}
        for i, s in enumerate(shard_ids):
            by_shard.setdefault(int(s), []).append(i)
        dispositions = [""] * n
        futures = {
            s: self.seen[s].dequeue.remote([urls[i] for i in idxs], [statuses[i] for i in idxs],
                                           cfg.max_attempts)
            for s, idxs in by_shard.items()
        }
        for s, idxs in by_shard.items():
            for i, d in zip(idxs, ray.get(futures[s])):
                dispositions[i] = d

        done_mask = [d == "done" for d in dispositions]
        retry_mask = [d == "retry" for d in dispositions]

        # 2. resources sink: handled (ok-status) rows only, mirroring
        #    walk where handlers see only ok resources
        #    (lib/coordinator.go:369-377)
        handled = batch.filter(pa.array(done_mask))
        if handled.num_rows:
            out = handled.select([f.name for f in RESOURCE_STAGE_SCHEMA if f.name != "orig_url"])
            path = os.path.join(self.resources_dir, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(out, path)

        # 3. retries re-enter the frontier (lib/coordinator.go:381-385)
        retried = 0
        if any(retry_mask):
            r_idx = [i for i in range(n) if retry_mask[i]]
            rows = {
                "url": [urls[i] for i in r_idx],
                "host": [url_host(urls[i]) for i in r_idx],
                "job_id": [cfg.job_id] * len(r_idx),
                "attempts": [attempts_in[i] + 1 for i in r_idx],
                "prev_status": [statuses[i] for i in r_idx],
                "epoch": [epochs[i] + 1 for i in r_idx],
                "parent_seq": [seqs[i] for i in r_idx],
                "link_idx": [0] * len(r_idx),
            }
            self._push_frontier(rows)
            retried = len(r_idx)

        # 4. candidate links from EVERY completed resource regardless
        #    of status — walk expands r.Links for all resources in the
        #    completion batch (lib/coordinator.go:289-298), including
        #    404/500 pages and to-be-retried ones; hop/error rows carry
        #    empty link lists so they contribute nothing.
        #    (candidate filter lib/job.go:250-271)
        links_total = 0
        cand_urls: list[str] = []
        cand_disc: list[int] = []
        if cfg.crawl:
            import pyarrow.compute as pc

            # per-completion-batch dedup with min discovery key (walk's
            # links map, lib/coordinator.go:277-300 / A1+D3) — shrinks
            # the filter + observe volume before any RPC leaves the
            # task. Vectorized: flatten the list column, compute each
            # link's discovery key positionally, dictionary-encode for
            # first-occurrence-ordered uniques (same order the dict
            # accumulate produced), min-reduce per unique.
            lc = batch["links"].combine_chunks()
            flat = lc.flatten()
            links_total = len(flat)
            if links_total:
                counts = pc.fill_null(pc.list_value_length(lc), 0).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                base = np.repeat(np.asarray(seqs, np.int64), counts) * _DISC_SHIFT
                starts = np.cumsum(counts) - counts
                intra = np.arange(links_total, dtype=np.int64) - np.repeat(starts, counts)
                disc = base + intra
                de = pc.dictionary_encode(flat)
                inv = de.indices.to_numpy(zero_copy_only=False)
                uniq = de.dictionary
                minv = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
                np.minimum.at(minv, inv, disc)
                m = self.filter.mask_array(uniq)
                cand_urls = uniq.filter(pa.array(m)).to_pylist()
                cand_disc = minv[m].tolist()
            if cand_urls and cfg.polite and self.robots is not None:
                hosts = [url_host(u) for u in cand_urls]
                r_shards = shard_of(url_hash64_batch(hosts), len(self.robots))
                allowed = [True] * len(cand_urls)
                futures = {}
                for sh in set(r_shards.tolist()):
                    idxs = [i for i, x in enumerate(r_shards) if x == sh]
                    futures[sh] = (idxs, self.robots[sh].allowed.remote(
                        [cand_urls[i] for i in idxs]))
                for idxs, fut in futures.values():
                    for i, a in zip(idxs, ray.get(fut)):
                        allowed[i] = a
                cand_urls = [u for u, a in zip(cand_urls, allowed) if a]
                cand_disc = [d for d, a in zip(cand_disc, allowed) if a]

        # 5. candidates flow straight into the sharded seen state
        #    (observe = commutative min-disc accumulate; the J1
        #    anti-join resolves at epoch drain — no Dataset shuffle)
        if cand_urls:
            c_shards = np.asarray(shard_of(url_hash64_batch(cand_urls), len(self.seen)))
            # stable sort-by-shard: each shard's slice keeps the same
            # relative order the per-shard gather produced, at O(n log n)
            # instead of O(shards x n) scans
            order = np.argsort(c_shards, kind="stable")
            sorted_sh = c_shards[order]
            urls_np = np.array(cand_urls, dtype=object)[order]
            disc_np = np.asarray(cand_disc, dtype=np.int64)[order]
            bounds = np.searchsorted(sorted_sh, np.arange(len(self.seen) + 1))
            waits = []
            for sh in range(len(self.seen)):
                lo, hi = int(bounds[sh]), int(bounds[sh + 1])
                if lo == hi:
                    continue
                waits.append(
                    self.seen[sh].observe_candidates.remote(
                        urls_np[lo:hi].tolist(), disc_np[lo:hi].tolist()
                    )
                )
            ray.get(waits)

        # StopURL fires on every dequeued resource URL regardless of
        # status — walk checks job.cfg.StopURL == fr.URL in the
        # dequeue defer for all completions (lib/coordinator.go:355-366)
        # per-host backoff on backoff response codes (config-gated)
        if cfg.enable_backoff and cfg.backoff_response_codes:
            bad = {url_host(urls[i]) for i in range(n)
                   if statuses[i] in cfg.backoff_response_codes}
            if bad:
                hosts = sorted(bad)
                step = (cfg.delay_milli / 1000.0) / 2
                h_shards = shard_of(url_hash64_batch(hosts), len(self.frontier))
                waits = []
                for sh in set(h_shards.tolist()):
                    hs = [h for h, x in zip(hosts, h_shards) if x == sh]
                    waits.append(self.frontier[sh].backoff.remote(hs, step))
                ray.get(waits)

        stop_hit = bool(cfg.stop_url) and any(u == cfg.stop_url for u in urls)
        self.metrics.add.remote(
            {
                "fetched": n,
                "done": sum(done_mask),
                "failed": dispositions.count("failed"),
                "retried": retried,
                "links_total": links_total,
                "links_candidates": len(cand_urls),
                "stop_hit": int(stop_hit),
            }
        )
        return pa.table({"rows": pa.array([n], pa.int64())})

    def _push_frontier(self, rows: dict) -> None:
        _push_rows_to_frontier(self.frontier, rows, self.cfg._salt_hosts)


def _push_rows_to_frontier(frontier_handles, rows: dict, by_url: bool = False) -> None:
    from ..state.seen import push_rows_to_frontier

    push_rows_to_frontier(frontier_handles, rows, by_url)


def _epoch_chunk_impl(table: pa.Table, fetch_stage, body_stage, commit_stage,
                      batch_size: int) -> int:
    """One epoch chunk through the fused stage chain (fetch → [body]
    → extract → commit) as a PLAIN Ray task. The BSP loop launches a
    fresh pipeline every epoch, and Ray Data's streaming executor
    costs ~2-4s of setup per execution at 32 CPUs — more than most
    epochs' useful work. The stages are per-batch callables either
    way; this is the same fusion map_batches would apply, minus the
    per-epoch executor spin-up. Memory stays bounded: bodies live
    only inside the task (extract drops them before commit)."""
    n_done = 0
    if os.environ.get("WALK_RAY_CHUNK_CPROF"):
        import cProfile
        import time as _tm
        prof = cProfile.Profile()
        prof.enable()
        for off in range(0, table.num_rows, batch_size):
            batch = table.slice(off, batch_size)
            t = fetch_stage(batch)
            if body_stage is not None:
                t = body_stage(t)
            t = extract_resources(t)
            commit_stage(t)
            n_done += batch.num_rows
        prof.disable()
        prof.dump_stats(f"/tmp/chunkprof/{os.getpid()}_{_tm.monotonic_ns()}.pstats")
        return n_done
    if os.environ.get("WALK_RAY_CHUNK_PROF"):
        import time as _tm
        acc = [0.0, 0.0, 0.0, 0.0]
        for off in range(0, table.num_rows, batch_size):
            batch = table.slice(off, batch_size)
            m0 = _tm.monotonic(); t = fetch_stage(batch); m1 = _tm.monotonic()
            if body_stage is not None:
                t = body_stage(t)
            m2 = _tm.monotonic(); t = extract_resources(t); m3 = _tm.monotonic()
            commit_stage(t); m4 = _tm.monotonic()
            acc[0] += m1 - m0; acc[1] += m2 - m1; acc[2] += m3 - m2; acc[3] += m4 - m3
            n_done += batch.num_rows
        with open(f"/tmp/chunkprof/{os.getpid()}_{_tm.monotonic_ns()}", "w") as f:
            f.write(f"{n_done} {acc[0]:.4f} {acc[1]:.4f} {acc[2]:.4f} {acc[3]:.4f}\n")
        return n_done
    for off in range(0, table.num_rows, batch_size):
        batch = table.slice(off, batch_size)
        t = fetch_stage(batch)
        if body_stage is not None:
            t = body_stage(t)
        t = extract_resources(t)
        commit_stage(t)
        n_done += batch.num_rows
    return n_done


def _attach_seq_impl(table: pa.Table, seqs, epoch: int, n_chunks: int):
    """Remote task: stamp the epoch + globally-assigned seq column onto
    one frontier shard's popped rows (which never visit the driver) and
    return the table pre-split into ``n_chunks`` blocks for the epoch
    fetch tasks. The crawl-order golden is written separately by
    :func:`_write_order_impl` (one file per epoch, off the hot path)."""
    n = table.num_rows
    table = table.set_column(
        table.schema.get_field_index("epoch"), "epoch", pa.array([epoch] * n, pa.int32())
    )
    table = table.append_column("seq", pa.array(seqs, pa.int64()))
    step = (n + n_chunks - 1) // n_chunks
    chunks = [table.slice(i, step) for i in range(0, n, step)]
    while len(chunks) < n_chunks:
        chunks.append(table.schema.empty_table())
    return chunks[0] if n_chunks == 1 else tuple(chunks)


def _assign_seqs_impl(seq_start: int, n_shards: int, *keys_list):
    """Remote task: global dense seq assignment over the canonical
    linearization ``(epoch, fetch_after, parent_seq, link_idx)``.

    The per-shard key arrays arrive as object-store references straight
    from the frontier shards' pops — the driver never sees a per-row
    value (it holds only counts and refs). One vectorized stable
    lexsort, identical ordering to the old driver-side sort, then the
    dense seq range splits back into per-shard arrays returned as
    ``n_shards`` separate objects so each shard's fetch chain can start
    as soon as its slice lands."""
    import numpy as np

    ep = np.concatenate([k["epoch"] for k in keys_list])
    fa = np.concatenate([k["fetch_after"] for k in keys_list])
    ps = np.concatenate([k["parent_seq"] for k in keys_list])
    li = np.concatenate([k["link_idx"] for k in keys_list])
    n = len(ep)
    order = np.lexsort((li, ps, fa, ep))  # last key is primary
    seqs_all = np.empty(n, dtype=np.int64)
    seqs_all[order] = seq_start + np.arange(n, dtype=np.int64)
    out, off = [], 0
    for k in keys_list:
        ln = len(k["epoch"])
        out.append(seqs_all[off : off + ln])
        off += ln
    return out[0] if n_shards == 1 else tuple(out)


def _write_order_impl(epoch: int, order_path: str, n_shards: int, *parts):
    """Remote task: ONE crawl-order golden file per epoch (seq-sorted),
    instead of one per (epoch × shard) — file count stays O(epochs) on
    a long crawl. Runs off the hot path; the driver awaits the write
    only at checkpoint/finalize."""
    import numpy as np

    seq_arrs, tables = parts[:n_shards], parts[n_shards:]
    subs = [
        pa.table({"seq": pa.array(np.asarray(sa, dtype=np.int64)),
                  "url": t["url"], "fetch_after": t["fetch_after"]})
        for sa, t in zip(seq_arrs, tables) if t.num_rows
    ]
    cat = pa.concat_tables(subs) if subs else pa.table(
        {"seq": pa.array([], pa.int64()), "url": pa.array([], pa.string()),
         "fetch_after": pa.array([], pa.float64())}
    )
    seq = cat["seq"].to_numpy()
    order_t = pa.table(
        {
            "epoch": pa.array(np.full(len(cat), epoch, dtype=np.int32)),
            "seq": cat["seq"],
            "url": cat["url"],
            "fetch_after": cat["fetch_after"],
        }
    ).take(np.argsort(seq, kind="stable"))
    tmp = order_path + ".tmp"
    pq.write_table(order_t, tmp)
    os.replace(tmp, order_path)
    return len(seq)


def _proportional_budgets(sizes, total_budget: int, n: int) -> list[int]:
    """Split a global pop budget across frontier shards proportionally
    to their queue sizes (uniform when sizes are unknown or zero).
    Every non-empty shard gets at least 1 so no shard starves."""
    if not sizes or sum(sizes) == 0:
        return [total_budget // n + 1] * n
    total = sum(sizes)
    return [max(1, (total_budget * sz) // total + 1) for sz in sizes]


def _is_distributed_state_loss(err) -> bool:
    """True when ``err`` means distributed crawl state was lost — an
    actor died (node loss) or objects it owned became unavailable —
    as opposed to a crawl bug. Walks the RayTaskError cause chain: the
    fused epoch chunks call into the state actors, so a shard death
    surfaces as a task error wrapping the actor error."""
    import ray.exceptions as rex

    kinds = tuple(
        t for t in (
            getattr(rex, n, None)
            for n in ("RayActorError", "ActorUnavailableError",
                      "ObjectLostError", "OwnerDiedError",
                      "ObjectReconstructionFailedError")
        ) if t is not None
    )
    seen = 0
    while err is not None and seen < 16:
        if isinstance(err, kinds):
            return True
        err = getattr(err, "cause", None)
        seen += 1
    return False


class _Metrics:
    """Tiny counter actor: per-epoch counters accumulated from stages."""

    def __init__(self):
        self.counters: dict[str, int] = {}

    def add(self, d: dict) -> None:
        for k, v in d.items():
            self.counters[k] = self.counters.get(k, 0) + int(v)

    def drain(self) -> dict:
        out, self.counters = self.counters, {}
        return out


class CrawlJob:
    def __init__(self, cfg: CrawlConfig, pages_path: str, meta_path: str, workdir: str):
        self.cfg = cfg
        self.pages_path = pages_path
        self.meta_path = meta_path
        self.workdir = workdir
        self.resources_root = os.path.join(workdir, "resources")
        self.order_root = os.path.join(workdir, "order")
        self.ckpt_root = os.path.join(workdir, "checkpoint")
        os.makedirs(self.resources_root, exist_ok=True)
        os.makedirs(self.order_root, exist_ok=True)
        self.metrics_rows: list[dict] = []
        # persist the job config for later introspection (the read
        # model's /jobs route and `walk_ray.cli jobs`, mirroring
        # api/job_handlers.go:15-70 / cmd/config.go)
        from dataclasses import asdict

        with open(os.path.join(workdir, "job.json"), "w") as f:
            json.dump(asdict(cfg), f, indent=2)

    # -- actor fleet ---------------------------------------------------

    def _start_actors(self):
        import ray

        cfg = self.cfg
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        self._ncpu = ncpu
        if cfg.n_frontier_shards <= 0:
            cfg.n_frontier_shards = max(2, ncpu // 2)
        if cfg.n_seen_shards <= 0:
            cfg.n_seen_shards = max(2, ncpu // 2)
        if cfg.n_page_parts <= 0:
            cfg.n_page_parts = max(2, ncpu // 2)
        part_dir = cfg.page_parts_dir or os.path.join(self.workdir, "page_parts")
        prepare_page_partitions(self.pages_path, self.meta_path, part_dir, cfg.n_page_parts)
        Store = ray.remote(PageStore)
        self.stores = [Store.remote(part_dir, i) for i in range(cfg.n_page_parts)]
        Seen = ray.remote(SeenShard)
        self.seen = [Seen.remote(i) for i in range(cfg.n_seen_shards)]
        # robots caches shard by hash(host) like the frontier — a
        # single cache actor would serialize every polite epoch at
        # cluster scale
        self.robots = (
            [ray.remote(RobotsCache).remote(self.stores)
             for _ in range(max(2, cfg.n_frontier_shards // 2))]
            if cfg.polite else None
        )
        Front = ray.remote(FrontierShard)
        self.frontier = [
            Front.remote(i, cfg.delay_milli / 1000.0, self.robots)
            for i in range(cfg.n_frontier_shards)
        ]
        self.metrics_actor = ray.remote(_Metrics).remote()
        self._attach_seq = ray.remote(_attach_seq_impl)
        self._assign_seqs = ray.remote(_assign_seqs_impl)
        self._write_order = ray.remote(_write_order_impl)
        self._epoch_chunk = ray.remote(_epoch_chunk_impl)
        self.fetch_stage = FetchStage(self.stores, cfg.record_redirects, cfg.record_headers)
        self.commit_stage = CommitStage(self.seen, self.frontier, self.robots, cfg, "",
                                        self.metrics_actor)
        # wait for every actor to be live (page stores loaded, state
        # shards imported) so first-RPC costs land in boot, not epochs
        pings = [s.size.remote() for s in self.stores]
        pings += [s.size.remote() for s in self.seen]
        pings += [f.size.remote() for f in self.frontier]
        pings.append(self.metrics_actor.drain.remote())
        if self.robots is not None:
            pings += [r.allowed.remote([]) for r in self.robots]
        ray.get(pings)

    # -- seeding -------------------------------------------------------

    def _seed(self):
        """Seeds enter RAW (lib/coordinator.go:174-179) in list order;
        a seeds_path file is appended line by line (lib/job.go:184-208:
        inline seeds first, then the SeedsPath scanner)."""
        import ray

        cfg = self.cfg
        urls = list(cfg.seeds)
        if cfg.seeds_path:
            import ray.data as rd

            for row in rd.read_text(cfg.seeds_path).take_all():
                line = row["text"].strip()
                if line:
                    urls.append(line)
        if not urls:
            return
        shard_ids = shard_of(url_hash64_batch(urls), len(self.seen))
        new = [False] * len(urls)
        for s in sorted(set(shard_ids.tolist())):
            idxs = [i for i, x in enumerate(shard_ids) if x == s]
            res = ray.get(self.seen[s].check_and_add.remote([urls[i] for i in idxs]))
            for i, r in zip(idxs, res):
                new[i] = r
        keep = [i for i in range(len(urls)) if new[i]]
        rows = {
            "url": [urls[i] for i in keep],
            "host": [url_host(urls[i]) for i in keep],
            "job_id": [cfg.job_id] * len(keep),
            "attempts": [0] * len(keep),
            "prev_status": [0] * len(keep),
            "epoch": [0] * len(keep),
            "parent_seq": [-1] * len(keep),
            "link_idx": keep,
        }
        if keep:
            _push_rows_to_frontier(self.frontier, rows, cfg._salt_hosts)

    def _pop_budgets(self, max_pop: int) -> list[int]:
        return _proportional_budgets(self._shard_sizes, max_pop, len(self.frontier))

    # -- epoch loop ----------------------------------------------------

    def run(self, resume: bool = False) -> dict:
        cfg = self.cfg
        t_run0 = time.monotonic()
        self._start_actors()

        self.vnow = 0.0
        self._last_speedup_v = 0.0  # virtual time of last backoff recovery tick
        self._shard_sizes: list[int] | None = None  # queue sizes after last epoch
        self._order_refs: list = []  # in-flight crawl-order golden writes
        self.seq_counter = 0
        self.done_total = 0
        self._chaos_fired = False
        epoch = 0
        if resume and self._restore_checkpoint():
            epoch = self.epoch_restored + 1
        else:
            self._seed()

        t_start = time.monotonic()
        self.boot_sec = t_start - t_run0
        self.recoveries = 0
        while True:
            try:
                epoch = self._epoch_loop(epoch)
                break
            except Exception as e:
                # self-healing: a dead state actor (node loss on a real
                # cluster) rebuilds the fleet and replays from the last
                # checkpoint; anything else — or recovery exhaustion —
                # propagates
                if (not cfg.auto_recover
                        or self.recoveries >= cfg.max_recoveries
                        or not _is_distributed_state_loss(e)):
                    raise
                self.recoveries += 1
                epoch = self._recover()

        loop_sec = time.monotonic() - t_start
        self._checkpoint(epoch, final=True)
        t_fin = time.monotonic()
        out = self._finalize(time.monotonic() - t_run0)
        out["boot_sec"] = round(self.boot_sec, 3)
        out["loop_sec"] = round(loop_sec, 3)
        out["finalize_sec"] = round(time.monotonic() - t_fin, 3)
        out["recoveries"] = self.recoveries
        return out

    def _epoch_loop(self, epoch: int) -> int:
        """Run epochs from ``epoch`` until the crawl terminates and
        return the final epoch. Raises on distributed-state loss (actor
        death / lost objects) — ``run`` recovers and re-enters."""
        import ray

        cfg = self.cfg
        stopping = False
        debug = bool(os.environ.get("WALK_RAY_EPOCH_DEBUG"))
        # deterministic chaos hook for the recovery tests: kill one
        # state shard at the start of epoch E — "E:idx[:kind]", kind ∈
        # frontier (default) | seen | store
        chaos = os.environ.get("WALK_RAY_CHAOS_KILL", "")
        while True:
            if chaos and not self._chaos_fired and epoch >= int(chaos.split(":")[0]):
                self._chaos_fired = True
                parts = chaos.split(":")
                pool = {"frontier": self.frontier, "seen": self.seen,
                        "store": self.stores}[parts[2] if len(parts) > 2 else "frontier"]
                ray.kill(pool[int(parts[1]) % len(pool)], no_restart=True)
            t_epoch = time.monotonic()
            _marks = [("start", t_epoch)]
            def _mark(label):
                if debug:
                    _marks.append((label, time.monotonic()))
            # pops stay in the object store: each shard ships the
            # driver two scalars (count, max fetch_after) plus
            # ObjectRefs to its key arrays and popped rows. URLs and
            # all other payload go straight from shard to fetch tasks;
            # even the linearization keys never visit the driver.
            # per-shard pop budgets proportional to queue sizes (from
            # the previous epoch's size scan): under host skew a hot
            # shard gets most of max_pop_per_epoch instead of an equal
            # 1/n slice while the others idle. Deterministic — sizes
            # are a pure function of the crawl state.
            budgets = self._pop_budgets(cfg.max_pop_per_epoch)
            results = ray.get(
                [
                    f.pop_ready_refs.remote(self.vnow, cfg.horizon_sec, b)
                    for f, b in zip(self.frontier, budgets)
                ]
            )
            lens = [r[0] for r in results]
            keys_refs = [r[2] for r in results]
            table_refs = [r[3] for r in results]
            n_pop = int(sum(lens))
            max_fa_epoch = max((r[1] for r in results if r[0]), default=0.0)
            _mark("pop")
            if n_pop == 0:
                sizes = ray.get([f.size.remote() for f in self.frontier])
                if sum(sizes) == 0 or stopping:
                    return epoch  # done-scan: queue empty ∧ nothing in flight
                nexts = [t for t in ray.get([f.next_ready_time.remote() for f in self.frontier])
                         if t is not None]
                self.vnow = max(self.vnow, min(nexts))
                continue

            # canonical linearization (epoch, fetch_after, parent_seq,
            # link_idx) + global dense seq assignment runs as a REMOTE
            # task over the shards' key refs (_assign_seqs_impl): the
            # driver's only role is counting — no O(pop) work remains
            # on the driver anywhere in the epoch loop.
            n_shards = len(self.frontier)
            seq_refs = self._assign_seqs.options(
                num_returns=n_shards if n_shards > 1 else 1
            ).remote(self.seq_counter, n_shards, *keys_refs)
            if n_shards == 1:
                seq_refs = [seq_refs]
            self.seq_counter += n_pop
            # crawl-order golden: one seq-sorted file per EPOCH,
            # written off the hot path (awaited at checkpoint/finalize)
            self._order_refs.append(
                self._write_order.remote(
                    epoch,
                    os.path.join(self.order_root, f"epoch-{epoch:05d}.parquet"),
                    n_shards, *seq_refs, *table_refs,
                )
            )
            _mark("order_sort_write")

            res_dir = os.path.join(self.resources_root, f"epoch-{epoch:05d}")
            shutil.rmtree(res_dir, ignore_errors=True)  # replay safety
            os.makedirs(res_dir, exist_ok=True)

            # Stages are pre-built instances holding only actor handles
            # + config → they run as stateless Ray TASKS (no per-epoch
            # actor-pool spin-up); the heavy state lives in the
            # PageStore/Seen/Frontier actors they call into.
            self.commit_stage.resources_dir = res_dir
            # seq columns attach in per-shard remote tasks that
            # pre-split into blocks; the driver handles only ObjectRefs
            # chunk grain: ~6 waves per core bounds straggler loss from
            # skewed chunks at ~1/6 of one wave (measured ~5-8% faster
            # than a flat 64 at 32 CPUs); still coarse enough that task
            # dispatch (~ms) stays noise
            cap = int(os.environ.get("WALK_RAY_MAX_CHUNKS", "0")) or 6 * self._ncpu
            total_blocks = max(1, min(cap, n_pop // cfg.fetch_batch_size + 1))
            chunk_refs = []
            for si, (ln, tref) in enumerate(zip(lens, table_refs)):
                if ln == 0:
                    continue
                n_chunks = max(1, round(total_blocks * ln / n_pop))
                refs = self._attach_seq.options(num_returns=n_chunks).remote(
                    tref, seq_refs[si], epoch, n_chunks
                )
                if n_chunks == 1:
                    chunk_refs.append(refs)
                else:
                    chunk_refs.extend(refs)
            body_stage = None
            if cfg.store_bodies:
                bodies_dir = os.path.join(self.workdir, "bodies", f"epoch-{epoch:05d}")
                shutil.rmtree(bodies_dir, ignore_errors=True)
                os.makedirs(bodies_dir, exist_ok=True)
                body_stage = BodyStage(bodies_dir)
            # one fused task per chunk (see _epoch_chunk_impl: the
            # stage chain IS the map_batches fusion, minus the per-
            # epoch streaming-executor spin-up that otherwise costs
            # more than most epochs' useful work)
            ray.get(
                [
                    self._epoch_chunk.remote(
                        ref, self.fetch_stage, body_stage, self.commit_stage,
                        cfg.fetch_batch_size,
                    )
                    for ref in chunk_refs
                ]
            )
            _mark("pipeline")
            # epoch drain: each seen shard registers its new URLs (min
            # disc key wins — deterministic) and hands them back for
            # the frontier push. Narrow rows only; volume is the
            # epoch's NEW frontier, already deduplicated shard-side.
            # drain + push happen shard-to-shard; the driver sees
            # only per-shard counts
            drained = ray.get(
                [
                    sh.drain_and_push.remote(
                        stopping, self.frontier, cfg.job_id, epoch + 1,
                        cfg._salt_hosts, _DISC_SHIFT,
                    )
                    for sh in self.seen
                ]
            )
            pushed = sum(d[0] for d in drained)
            seen_sizes = [d[1] for d in drained]
            if stopping:
                pushed = 0
            _mark("drain_push")

            if cfg.enable_backoff and cfg.backoff_response_codes:
                # recovery ticker (lib/job.go:121-131): one speed-up
                # step per elapsed VIRTUAL minute (fetch_after is the
                # crawl's virtual clock), so recovery is much slower
                # than the per-response slow-down, like the reference's
                # real-time minute ticker.
                epoch_vend = max_fa_epoch
                if epoch_vend - self._last_speedup_v >= 60.0:
                    ray.get([f.speed_up.remote((cfg.delay_milli / 1000.0) / 2)
                             for f in self.frontier])
                    self._last_speedup_v = epoch_vend
            # single bookkeeping RPC round: metrics drain + frontier
            # sizes together (seen sizes already rode on drain_and_push)
            got = ray.get([self.metrics_actor.drain.remote()]
                          + [f.size.remote() for f in self.frontier])
            counters, sizes = got[0], got[1:]
            if debug:
                # label each delta by the phase that ENDED at the mark
                deltas = [(l2, round(t2 - t1, 2)) for (_, t1), (l2, t2) in zip(_marks, _marks[1:])]
                print(f"EPOCHDBG {epoch} n_pop={n_pop} " + " ".join(f"{l}={d}" for l, d in deltas),
                      flush=True)
            self.done_total += counters.get("done", 0)
            self._shard_sizes = sizes
            self.metrics_rows.append(
                {
                    "epoch": epoch,
                    "popped": n_pop,
                    "fetched": counters.get("fetched", 0),
                    "done": counters.get("done", 0),
                    "failed": counters.get("failed", 0),
                    "retried": counters.get("retried", 0),
                    "links_total": counters.get("links_total", 0),
                    "links_candidates": counters.get("links_candidates", 0),
                    "links_deduped_in_epoch": counters.get("links_candidates", 0),
                    "links_new": pushed,
                    "frontier_size": sum(sizes),
                    "frontier_shard_sizes": list(sizes),
                    "seen_size": sum(seen_sizes),
                    "wall_sec": time.monotonic() - t_epoch,
                }
            )

            if counters.get("stop_hit", 0):
                stopping = True  # StopURL (lib/coordinator.go:358-366)
            if cfg.stop_after_entries and self.done_total >= cfg.stop_after_entries:
                stopping = True  # StopAfterEntries (SURVEY O4)
            if stopping:
                return epoch
            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                self._checkpoint(epoch)
            epoch += 1

    # -- recovery ------------------------------------------------------

    def _teardown_actors(self) -> None:
        import ray

        for h in (list(self.stores) + list(self.seen) + list(self.frontier)
                  + (list(self.robots) if self.robots else [])
                  + [self.metrics_actor]):
            try:
                ray.kill(h, no_restart=True)
            except Exception:
                pass

    def _recover(self) -> int:
        """Node-loss recovery: rebuild the whole actor fleet, restore
        the last checkpoint (or wipe partial outputs and re-seed when
        none exists yet) and return the epoch to resume from. The
        deterministic linearization makes the replayed crawl
        byte-identical to an uninterrupted one (tests/test_recovery.py)."""
        self._teardown_actors()
        self._start_actors()
        # in-flight order writes may reference lineage owned by dead
        # actors; the surviving files are replayed/overwritten anyway
        self._order_refs = []
        self.vnow = 0.0
        self._last_speedup_v = 0.0
        self._shard_sizes = None
        self.seq_counter = 0
        self.done_total = 0
        self.metrics_rows = []
        if self._restore_checkpoint():
            return self.epoch_restored + 1
        for d in glob.glob(os.path.join(self.resources_root, "epoch-*")):
            shutil.rmtree(d, ignore_errors=True)
        for p in glob.glob(os.path.join(self.order_root, "epoch-*.parquet")):
            os.remove(p)
        self._seed()
        return 0

    # -- checkpoint / resume ------------------------------------------

    def _checkpoint(self, epoch: int, final: bool = False) -> None:
        import ray

        # the checkpoint must cover every epoch's crawl-order golden:
        # settle the off-hot-path order writes before the manifest
        if self._order_refs:
            ray.get(self._order_refs)
            self._order_refs.clear()
        ck = os.path.join(self.ckpt_root, f"epoch-{epoch:05d}")
        ray.get(
            [f.checkpoint.remote(ck) for f in self.frontier]
            + [s.checkpoint.remote(ck) for s in self.seen]
        )
        manifest = {
            "epoch": epoch,
            "last_speedup_v": self._last_speedup_v,
            "vnow": self.vnow,
            "seq_counter": self.seq_counter,
            "done_total": self.done_total,
            "n_frontier_shards": len(self.frontier),
            "n_seen_shards": len(self.seen),
            "final": final,
            "metrics_rows": self.metrics_rows,
        }
        tmp = os.path.join(self.ckpt_root, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.ckpt_root, "MANIFEST.json"))

    def _restore_checkpoint(self) -> bool:
        import ray

        path = os.path.join(self.ckpt_root, "MANIFEST.json")
        if not os.path.exists(path):
            return False
        with open(path) as f:
            m = json.load(f)
        ck = os.path.join(self.ckpt_root, f"epoch-{m['epoch']:05d}")
        ray.get(
            [f.restore.remote(ck) for f in self.frontier]
            + [s.restore.remote(ck) for s in self.seen]
        )
        self.vnow = m["vnow"]
        self._last_speedup_v = m.get("last_speedup_v", 0.0)
        self.seq_counter = m["seq_counter"]
        self.done_total = m["done_total"]
        self.metrics_rows = list(m.get("metrics_rows", []))
        self.epoch_restored = m["epoch"]
        # restore the proportional-pop-budget input: an uninterrupted
        # run enters epoch K+1 with _shard_sizes = queue sizes after
        # epoch K (checkpointed in the last metrics row). Without this
        # a resumed crawl pops with uniform budgets where the
        # uninterrupted run used proportional ones and — when
        # max_pop_per_epoch binds — diverges from the deterministic
        # crawl order.
        if self.metrics_rows:
            sizes = self.metrics_rows[-1].get("frontier_shard_sizes")
            if sizes and len(sizes) == len(self.frontier):
                self._shard_sizes = [int(s) for s in sizes]
        # drop partial outputs of epochs after the checkpoint
        for d in glob.glob(os.path.join(self.resources_root, "epoch-*")):
            if int(os.path.basename(d)[6:]) > m["epoch"]:
                shutil.rmtree(d, ignore_errors=True)
        for d in glob.glob(os.path.join(self.order_root, "epoch-*.parquet")):
            if int(os.path.basename(d)[6:11]) > m["epoch"]:
                os.remove(d)
        return True

    # -- finalize ------------------------------------------------------

    def _finalize(self, wall_sec: float) -> dict:
        import ray

        from ..schema import METRICS
        from .sitemap import build_and_write_sitemap

        # shard-local finalize: each SeenShard writes its own sorted
        # parquet under url_seen/; the driver touches only counts.
        # (The old path dump()-ed every shard to the driver and sorted
        # there — fine at 640k URLs, fatal at 10^10.)
        url_seen_dir = os.path.join(self.workdir, "url_seen")
        shutil.rmtree(url_seen_dir, ignore_errors=True)  # replay safety
        ray.get([s.finalize.remote(url_seen_dir) for s in self.seen])

        if self.metrics_rows:
            mt = pa.table(
                {f.name: pa.array([r[f.name] for r in self.metrics_rows], f.type) for f in METRICS},
                schema=METRICS,
            )
            pq.write_table(mt, os.path.join(self.workdir, "metrics.parquet"))

        if self.cfg.sitemap_json:
            sitemap_path = os.path.join(self.workdir, "sitemap.json")
            n_entries = build_and_write_sitemap(self.resources_root, sitemap_path)
        else:
            # scale path: distributed sorted parquet sitemap (the JSON
            # object file is a walk-compat artifact, inherently a
            # serial single-file write)
            from .sitemap import build_sitemap_dataset

            sitemap_path = os.path.join(self.workdir, "sitemap_parquet")
            import glob as _glob

            if _glob.glob(f"{self.resources_root}/**/*.parquet", recursive=True):
                ds = build_sitemap_dataset(self.resources_root)
                ds.write_parquet(sitemap_path)
                n_entries = -1  # not reduced to unique keys in parquet mode
            else:
                n_entries = 0

        seen_stats = ray.get([s.stats.remote() for s in self.seen])
        return {
            "workdir": self.workdir,
            "resources_dir": self.resources_root,
            "order_dir": self.order_root,
            "url_seen_path": url_seen_dir,
            "sitemap_path": sitemap_path,
            "sitemap_entries": n_entries,
            "epochs": len(self.metrics_rows),
            "done_total": self.done_total,
            "seen_total": sum(s["entries"] for s in seen_stats),
            "seen_stats": seen_stats,
            "wall_sec": wall_sec,
        }
