"""Benchmark harness.

Headline metric (BASELINE.json): **URLs fetched+deduped/sec** — a full
crawl of a deterministic synthetic web graph (Zipf host skew, spanning
chain) through the frontier/seen/fetch/extract/sitemap engine.
Secondary: representative operator pipelines over ``$GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``).

Usage:
    python bench.py              # one JSON line on stdout
    python bench.py --scaling    # run at 8 and 32 CPUs in fresh
                                 # processes; report both + efficiency
    python bench.py --scaling-paired  # variance-reduced: K interleaved
                                 # (8,32) pairs, median per-pair ratio

Env:
    RAY_GRAFT_CPUS  parallelism level (default 32)
    GRAFT_SF_DIR    testdata dir (default /root/testdata/sf0.1)
    BENCH_HOSTS / BENCH_PAGES_PER_HOST  crawl graph size
                    (default 100 x 300 = 30k pages)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HOSTS = int(os.environ.get("BENCH_HOSTS", "400"))
PAGES_PER_HOST = int(os.environ.get("BENCH_PAGES_PER_HOST", "1600"))
# repetitions of the timed crawl; the MEDIAN run is the headline
# (single-node loop times vary ±15% run-to-run from worker-pool, OS
# and VM-host noise — a robust statistic, not max-of-N, per the
# round-2 advisory; best + all runs ride as supplementary fields)
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _warm_up() -> None:
    """Untimed warm-up: spawns the Ray worker pool and imports the
    engine in every worker (the guide's warm-the-cache rule), so the
    timed crawl measures compute + shuffle, not process cold-start."""
    from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
    from walk_ray.sources.testgen import generate_pages

    import ray
    import ray.data as rd

    # force the worker pool to FULL width with tasks that import the
    # engine (worker spawn + module import otherwise lands inside the
    # first big epochs and poisons the timing)
    def _touch(b):
        import time as _t

        from walk_ray.functions import canon, extract  # noqa: F401
        from walk_ray.pipelines import crawl  # noqa: F401

        _t.sleep(0.5)
        return b

    rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
        _touch, batch_size=1
    ).count()
    gen = generate_pages("bench", "/tmp/walk_ray_bench/gen_warm", hosts=8,
                         pages_per_host=40, seed=7)
    cfg = CrawlConfig.from_job_json(gen["job"])
    warm_dir = f"/tmp/walk_ray_bench/warm_{NUM_CPUS}_{time.monotonic_ns()}"
    CrawlJob(cfg, gen["pages"], gen["pages_meta"], warm_dir).run()
    import shutil as _sh

    _sh.rmtree(warm_dir, ignore_errors=True)


def _bench_crawl() -> dict:
    """Headline: crawl the bench web graph; urls fetched+deduped/sec.

    Throughput is computed over the crawl loop (epochs): actor boot /
    page-partition load and the final sitemap write are reported
    separately — they are per-job constants that amortize to noise on
    a multi-day 10^10-URL crawl, while the loop is the part that must
    scale with cluster size.
    """
    from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
    from walk_ray.sources.testgen import generate_pages

    gen_dir = f"/tmp/walk_ray_bench/gen_h{HOSTS}_p{PAGES_PER_HOST}"
    gen = generate_pages("bench", gen_dir, hosts=HOSTS, pages_per_host=PAGES_PER_HOST, seed=42)

    workdir = f"/tmp/walk_ray_bench/run_{NUM_CPUS}_{time.monotonic_ns()}"
    cfg = CrawlConfig.from_job_json(
        gen["job"], fetch_batch_size=2048, sitemap_json=False,
        page_parts_dir=os.path.join(gen_dir, f"parts_{max(2, NUM_CPUS // 2)}"),
    )
    import pyarrow.parquet as pq
    import shutil as _sh

    # one UNTIMED full-size crawl first (default on): the first timed
    # run otherwise pays one-off cache fills inside its loop — OS page
    # cache for the pages parquet, the worker-process page-table cache,
    # worker-pool rebalancing — and medians ride a warming ramp
    # (measured 208k→254k→312k across 3 cold-start reps) instead of
    # sampling the steady state a long-running crawl actually lives in.
    if os.environ.get("BENCH_WARM_FULL", "1") != "0":
        warm_dir = f"{workdir}_warmfull"
        CrawlJob(cfg, gen["pages"], gen["pages_meta"], warm_dir).run()
        _sh.rmtree(warm_dir, ignore_errors=True)

    recs = []
    for rep in range(max(1, REPEATS)):
        run_dir = f"{workdir}_{rep}"
        job = CrawlJob(cfg, gen["pages"], gen["pages_meta"], run_dir)
        t0 = time.monotonic()
        res = job.run()
        wall = time.monotonic() - t0
        # fetched+deduped = pages fetched + candidate links deduped
        mt = pq.read_table(os.path.join(run_dir, "metrics.parquet")).to_pandas()
        deduped = int(mt["links_deduped_in_epoch"].sum())
        fetched = int(mt["fetched"].sum())
        # bench outputs are throwaway: reclaim the run dir immediately
        # (repeated runs otherwise fill /tmp with resources parquet
        # and disk pressure poisons later timings)
        _sh.rmtree(run_dir, ignore_errors=True)
        rate = round((fetched + deduped) / res["loop_sec"], 1)
        recs.append({
            "crawl_sec": round(wall, 3),
            "boot_sec": res["boot_sec"],
            "loop_sec": res["loop_sec"],
            "finalize_sec": res["finalize_sec"],
            "pages": HOSTS * PAGES_PER_HOST,
            "fetched": fetched,
            "deduped_candidates": deduped,
            "done": res["done_total"],
            "epochs": res["epochs"],
            "urls_per_sec": rate,
        })
    # headline = the MEDIAN run (robust statistic; max-of-N is a
    # biased optimistic estimator — round-2 advisory). For even N the
    # lower-middle run is reported so the record is a real run.
    recs.sort(key=lambda r: r["urls_per_sec"])
    med = recs[(len(recs) - 1) // 2]
    med["best_urls_per_sec"] = recs[-1]["urls_per_sec"]
    med["all_runs_urls_per_sec"] = [r["urls_per_sec"] for r in recs]
    return med


def _bench_queries() -> dict:
    """Secondary: representative operators over the sf tables."""
    from walk_ray.pipelines import dedup, relational, similarity, text

    timings = {}

    # untimed settle: the crawl leaves worker churn / stats traffic
    # behind; a throwaway pipeline absorbs it so the first timed query
    # measures itself, not cluster settling
    import ray.data as rd

    rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS).map_batches(lambda b: b).count()
    # one-time index materializations stay untimed (fingerprint-cached,
    # amortized across queries like the page partitions)
    import hashlib as _hl
    import os as _os

    h = _hl.sha256(_os.path.abspath(SF_DIR).encode()).hexdigest()[:12]
    similarity.build_ivf_index(SF_DIR, f"/tmp/walk_ray_ivf/{h}_n16_s4096_r11")

    def run(name, fn):
        t0 = time.monotonic()
        r = fn()
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        timings[name] = round(time.monotonic() - t0, 3)

    run("pricing_summary", lambda: relational.pricing_summary(SF_DIR))
    run("orders_by_nation", lambda: relational.orders_by_nation(SF_DIR))
    run("events_tumbling_window", lambda: relational.events_tumbling_window(SF_DIR))
    run("events_sessionize", lambda: relational.events_sessionize(SF_DIR))
    run("top_parts_by_revenue", lambda: relational.top_parts_by_revenue(SF_DIR))
    run("token_stats", lambda: text.token_stats(SF_DIR))
    run("quality_scores", lambda: text.quality_scores(SF_DIR))
    run("tfidf_top_terms", lambda: text.tfidf_top_terms(SF_DIR))
    run("hash_split", lambda: text.hash_split(SF_DIR))
    run("classifier_scores", lambda: text.classifier_scores(SF_DIR))
    run("lm_perplexity", lambda: text.lm_perplexity(SF_DIR))
    run("repetition_stats", lambda: text.repetition_stats(SF_DIR))
    run("exact_dedup", lambda: dedup.exact_dedup(SF_DIR))
    run("chunk_dedup", lambda: dedup.chunk_dedup(SF_DIR))
    from walk_ray.pipelines import prepare

    run("prepare_corpus", lambda: prepare.prepare_corpus(SF_DIR))
    run("minhash_lsh_dedup", lambda: dedup.minhash_lsh_dedup(SF_DIR, ngram=3, threshold=0.5))
    run("simhash_dedup", lambda: dedup.simhash_dedup(SF_DIR))
    run("unigram_jaccard_lsh",
        lambda: dedup.ngram_jaccard_pairs(SF_DIR, n=1, threshold=0.9, exact=False))
    run("embedding_cosine_pairs", lambda: dedup.embedding_cosine_pairs(SF_DIR, threshold=0.4))
    run("embedding_dedup_ivf", lambda: dedup.embedding_dedup(SF_DIR, threshold=0.4))
    run("ann_brute_topk", lambda: similarity.ann_brute_topk(SF_DIR))
    run("ann_ivf_topk", lambda: similarity.ann_ivf_topk(SF_DIR))
    from walk_ray.pipelines import multimodal

    run("media_features", lambda: multimodal.media_features(SF_DIR))
    return timings


def run_once() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # worker/raylet log lines otherwise forward to the DRIVER'S
            # STDOUT (e.g. the many-workers raylet warning) and corrupt
            # the one-JSON-line stdout contract
            log_to_driver=False,
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    _warm_up()
    t0 = time.monotonic()
    crawl = _bench_crawl()
    # crawl-only mode for the paired scaling protocol (the per-op
    # query suite rides in the classic --scaling samples already)
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") == "1" else _bench_queries()
    total = time.monotonic() - t0
    out = {
        "metric": "URLs fetched+deduped/sec (bench web graph crawl); secondary per-op secs",
        "value": round(total, 3),
        "unit": "sec",
        "urls_per_sec": crawl["urls_per_sec"],
        "crawl": crawl,
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job at 8 and 32 CPUs in fresh processes (the sandbox
    stand-in for N→4N nodes, per BASELINE.md).

    Each level is pinned to that many PHYSICAL cores with taskset:
    Ray's ``num_cpus`` only budgets Data tasks, while the state actors
    (frontier/seen/page-store shards) float outside it — without
    affinity the small "cluster" silently borrows real cores for its
    actors and the efficiency ratio is meaningless. Pinning makes N
    CPUs mean N cores for everything, as on an N-node cluster.
    """

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_REPEATS=os.environ.get("BENCH_REPEATS", "5"))
        cmd = [sys.executable, os.path.abspath(__file__)]
        import shutil as _sh

        if _sh.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            # surface the child's actual failure, not just the exit code
            sys.stderr.write(f"--- {ncpu}-CPU leg failed (exit "
                             f"{proc.returncode}); last stderr ---\n")
            sys.stderr.write("\n".join(proc.stderr.splitlines()[-40:]) + "\n")
            raise SystemExit(proc.returncode)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo = int(os.environ.get("BENCH_SCALE_LO", "8"))
    hi = int(os.environ.get("BENCH_SCALE_HI", "32"))
    r_lo = run(lo)
    r_hi = run(hi)
    tp_lo = r_lo["urls_per_sec"]
    tp_hi = r_hi["urls_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": (f"crawl throughput scaling efficiency ({lo} → {hi} "
                   "CPUs, median-of-N per level)"),
        "value": round(eff, 3),
        "unit": "efficiency",
        f"urls_per_sec_{lo}": tp_lo,
        f"urls_per_sec_{hi}": tp_hi,
        f"all_runs_{lo}": r_lo["crawl"]["all_runs_urls_per_sec"],
        f"all_runs_{hi}": r_hi["crawl"]["all_runs_urls_per_sec"],
        f"crawl_sec_{lo}": r_lo["crawl"]["crawl_sec"],
        f"crawl_sec_{hi}": r_hi["crawl"]["crawl_sec"],
        "queries": {f"bench_{lo}": r_lo["value"],
                    f"bench_{hi}": r_hi["value"]},
        f"queries_{lo}": r_lo["queries"],
        f"queries_{hi}": r_hi["queries"],
        "sf": SF_DIR,
        "num_cpus": hi,
    }


def run_scaling_paired() -> dict:
    """Variance-reduced scaling estimator: K PAIRS of back-to-back
    (8-core, 32-core) crawl-only legs, each leg a fresh taskset-pinned
    process; efficiency = median over pairs of (tp32/tp8)/4.

    Why: the classic ``--scaling`` protocol runs ALL 8-core reps, then
    ALL 32-core reps — ~10 minutes apart — and divides one host window
    by another. The sandbox VM's documented ±40% host-speed swings
    (BASELINE.md round-3 A/B) then dominate the ratio: same-code
    efficiencies span 0.66–0.96 across nine sequential-legs samples.
    Pairing puts the two levels seconds apart so window drift hits
    numerator and denominator together and cancels in the ratio;
    the median over pairs is robust to the residual burst noise.
    Pair order alternates (8→32, 32→8, ...) to cancel any first-mover
    effect. Env: BENCH_PAIRS (default 6), BENCH_PAIR_REPEATS (default
    2, timed crawl reps per leg)."""

    def run_leg(ncpu: int, reps: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_REPEATS=str(reps), BENCH_SKIP_QUERIES="1")
        cmd = [sys.executable, os.path.abspath(__file__)]
        import shutil as _sh

        if _sh.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        proc = subprocess.run(
            cmd, env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            sys.stderr.write(f"--- {ncpu}-CPU leg failed (exit "
                             f"{proc.returncode}); last stderr ---\n")
            sys.stderr.write("\n".join(proc.stderr.splitlines()[-40:]) + "\n")
            raise SystemExit(proc.returncode)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo = int(os.environ.get("BENCH_SCALE_LO", "8"))
    hi = int(os.environ.get("BENCH_SCALE_HI", "32"))
    n_pairs = int(os.environ.get("BENCH_PAIRS", "6"))
    reps = int(os.environ.get("BENCH_PAIR_REPEATS", "2"))
    pairs = []
    for k in range(n_pairs):
        order = (lo, hi) if k % 2 == 0 else (hi, lo)
        legs = {}
        for ncpu in order:
            legs[ncpu] = run_leg(ncpu, reps)
        tp_lo, tp_hi = legs[lo]["urls_per_sec"], legs[hi]["urls_per_sec"]
        eff = (tp_hi / tp_lo) / (hi / lo)
        pairs.append({
            "order": f"{order[0]}->{order[1]}",
            f"urls_per_sec_{lo}": tp_lo, f"urls_per_sec_{hi}": tp_hi,
            f"runs_{lo}": legs[lo]["crawl"]["all_runs_urls_per_sec"],
            f"runs_{hi}": legs[hi]["crawl"]["all_runs_urls_per_sec"],
            "efficiency": round(eff, 3),
        })
        sys.stderr.write(f"pair {k + 1}/{n_pairs}: {tp_lo:.0f} -> "
                         f"{tp_hi:.0f} urls/s, eff {eff:.3f}\n")
    effs = sorted(p["efficiency"] for p in pairs)
    med_eff = effs[(len(effs) - 1) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
    med8 = sorted(p[f"urls_per_sec_{lo}"] for p in pairs)[len(pairs) // 2]
    med32 = sorted(p[f"urls_per_sec_{hi}"] for p in pairs)[len(pairs) // 2]
    return {
        "metric": ("crawl throughput scaling efficiency "
                   f"({lo} -> {hi} CPUs, median of per-pair ratios, "
                   f"{n_pairs} interleaved pairs x {reps} reps/leg)"),
        "value": med_eff,
        "unit": "efficiency",
        f"urls_per_sec_{lo}": med8,
        f"urls_per_sec_{hi}": med32,
        "pair_efficiencies": effs,
        "pairs": pairs,
        "sf": SF_DIR,
        "num_cpus": hi,
    }


def _hostcal_burn_cpu(q, dur: float):
    """Fixed-work integer chunks — L1-resident, no memory traffic."""
    import time as _t

    t_end = _t.time() + dur
    n = 0
    while _t.time() < t_end:
        x = 0
        for i in range(200000):
            x += i * i
        n += 1
    q.put(n)


def _hostcal_burn_mem(q, dur: float):
    """Streaming copy+sum over a 64 MB array — pure DRAM bandwidth."""
    import time as _t

    import numpy as _np

    a = _np.random.rand(8_000_000)
    b = _np.empty_like(a)
    t_end = _t.time() + dur
    n = 0
    while _t.time() < t_end:
        _np.copyto(b, a)
        float(b.sum())
        n += 1
    q.put(n)


def run_hostcal() -> dict:
    """Host-scaling calibration: how much MORE aggregate work the bare
    host delivers going lo → hi parallel pinned processes, measured
    separately for CPU cycles (L1-resident integer loop) and DRAM
    bandwidth (streaming 64 MB copy+sum). Interprets the crawl's
    paired-scaling numbers: if the host's own bandwidth efficiency at
    lo → hi is X, no data-moving job can measure above ~X on it —
    the ceiling is the machine's memory system, not the engine's
    partitioning (observed on the round-5 post-reboot host: CPU 0.86,
    DRAM 0.40-0.48, crawl 0.40-0.54 — the crawl tracked DRAM exactly).
    Env: BENCH_SCALE_LO/HI (default 8/32), HOSTCAL_SECS (default 8),
    HOSTCAL_TRIALS (default 3)."""
    import multiprocessing as mp

    lo = int(os.environ.get("BENCH_SCALE_LO", "8"))
    hi = int(os.environ.get("BENCH_SCALE_HI", "32"))
    dur = float(os.environ.get("HOSTCAL_SECS", "8"))
    trials = int(os.environ.get("HOSTCAL_TRIALS", "3"))

    def agg(burn, k: int) -> float:
        os.sched_setaffinity(0, set(range(k)))
        try:
            q = mp.Queue()
            ps = [mp.Process(target=burn, args=(q, dur)) for _ in range(k)]
            for p in ps:
                p.start()
            tot = sum(q.get() for _ in ps)
            for p in ps:
                p.join()
        finally:
            os.sched_setaffinity(0, set(range(os.cpu_count())))
        return tot / dur

    out = {"metric": f"host aggregate-work scaling {lo} -> {hi} pinned "
                     "processes (cpu = L1 integer loop, mem = 64MB "
                     "streaming copy+sum)",
           "unit": "efficiency", "lo": lo, "hi": hi, "trials": []}
    for _ in range(trials):
        c_lo, c_hi = agg(_hostcal_burn_cpu, lo), agg(_hostcal_burn_cpu, hi)
        m_lo, m_hi = agg(_hostcal_burn_mem, lo), agg(_hostcal_burn_mem, hi)
        t = {"cpu_eff": round((c_hi / c_lo) / (hi / lo), 3),
             "mem_eff": round((m_hi / m_lo) / (hi / lo), 3),
             "cpu_rate_lo": round(c_lo, 1), "cpu_rate_hi": round(c_hi, 1),
             "mem_rate_lo": round(m_lo, 1), "mem_rate_hi": round(m_hi, 1)}
        out["trials"].append(t)
        sys.stderr.write(f"hostcal: cpu {t['cpu_eff']}, mem {t['mem_eff']}\n")
    med = sorted(t["mem_eff"] for t in out["trials"])[(trials - 1) // 2]
    out["value"] = med
    return out


def run_volume() -> dict:
    """The hygiene suite at volume (round-4 verdict item 3): a
    deterministic ~5M-doc corpus (1000× the sf0.1 documents table,
    ~1.5 GB text, 20 parquet shards, 5% exact + 2% near dup structure
    from ``sources/docgen.py``), through the three headline corpus
    ops end to end with auto-derived bucket counts.

    Env: VOLUME_DOCS (default 5_000_000), VOLUME_DIR (default
    /tmp/walk_ray_volume/docs_<n>), VOLUME_OPS (comma-separated
    subset of the four op names — a >16 GB corpus that exercises the
    auto_buckets byte term doesn't fit ALL ops on one sandbox disk:
    minhash's skinny band rows alone are ~2.9x the corpus text)."""
    import ray

    from walk_ray.sources.docgen import generate_documents

    n_docs = int(os.environ.get("VOLUME_DOCS", "5000000"))
    vol_dir = os.environ.get("VOLUME_DIR",
                             f"/tmp/walk_ray_volume/docs_{n_docs}")
    t0 = time.monotonic()
    generate_documents(vol_dir, n_docs=n_docs)
    gen_sec = round(time.monotonic() - t0, 1)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from walk_ray.pipelines import dedup, prepare, text
    from walk_ray.stages.sizing import auto_buckets, parquet_uncompressed_bytes

    tbl = f"{vol_dir}/documents.parquet"
    ops = {}

    all_ops = {
        "prepare_corpus": lambda: prepare.prepare_corpus(vol_dir),
        "lm_perplexity": lambda: text.lm_perplexity(vol_dir),
        "winnow_fingerprints": lambda: text.winnow_fingerprints(vol_dir),
        "minhash_lsh_dedup":
            lambda: dedup.minhash_lsh_dedup(vol_dir, ngram=3, threshold=0.5),
        # opt-in only (VOLUME_OPS): skinny exchanged rows, useful as a
        # second op at byte-term corpus sizes where the token-volume
        # ops outgrow a single sandbox node's disk
        "exact_dedup": lambda: dedup.exact_dedup(vol_dir),
    }
    default_ops = ["prepare_corpus", "lm_perplexity",
                   "winnow_fingerprints", "minhash_lsh_dedup"]
    wanted = os.environ.get("VOLUME_OPS")
    wanted = [s.strip() for s in wanted.split(",")] if wanted else default_ops

    def run(name, fn):
        t0 = time.monotonic()
        ds = fn()
        rows = ds.count() if hasattr(ds, "count") else len(ds)
        ops[name] = {"sec": round(time.monotonic() - t0, 2), "rows": int(rows)}

    t0 = time.monotonic()
    for name in wanted:
        run(name, all_ops[name])
    total = round(time.monotonic() - t0, 2)
    out = {
        "metric": "hygiene suite at volume (prepare/lm_ppl/minhash), sec",
        "value": total,
        "unit": "sec",
        "n_docs": n_docs,
        "table_bytes_encoded": parquet_uncompressed_bytes(tbl),
        "auto_buckets": auto_buckets(tbl),
        "gen_sec": gen_sec,
        "ops": ops,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_stats(name: str) -> None:
    """Execute one queries() entry and print its Ray Data stage stats
    (`ds.stats()`) — the per-stage wall/cpu/output evidence used to
    tune batch sizes and shuffle shapes."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    qs = entry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; available: {', '.join(sorted(qs))}",
              file=sys.stderr)
        raise SystemExit(2)
    fn = qs[name]
    r = fn(SF_DIR)
    if hasattr(r, "materialize"):
        r = r.materialize()
        print(r.stats())
    else:
        print(f"{name} returned {type(r).__name__} (no Dataset stats)")
    ray.shutdown()


def _scaling_graph_default() -> None:
    """Scaling modes default to a 2M-page graph (1250 hosts x 1600)
    instead of the headline 640k: as of the round-5 kernel work the
    32-CPU crawl finishes 640k pages in ~9 s, where per-epoch executor
    floors dominate and the measured ratio saturates (paired samples
    read 0.5-0.7 with BOTH legs far above every historical number).
    Scaling needs enough work per core that the parallel region, not
    the fixed cost, is what's being ratioed. Explicit BENCH_HOSTS /
    BENCH_PAGES_PER_HOST still win; legs inherit this env."""
    os.environ.setdefault("BENCH_HOSTS", "1250")
    os.environ.setdefault("BENCH_PAGES_PER_HOST", "1600")


if __name__ == "__main__":
    if "--scaling-paired" in sys.argv:
        _scaling_graph_default()
        print(json.dumps(run_scaling_paired()))
    elif "--scaling" in sys.argv:
        _scaling_graph_default()
        print(json.dumps(run_scaling()))
    elif "--volume" in sys.argv:
        print(json.dumps(run_volume()))
    elif "--hostcal" in sys.argv:
        print(json.dumps(run_hostcal()))
    elif "--stats" in sys.argv:
        i = sys.argv.index("--stats") + 1
        if i >= len(sys.argv):
            print("usage: bench.py --stats <query-name>", file=sys.stderr)
            raise SystemExit(2)
        run_stats(sys.argv[i])
    else:
        print(json.dumps(run_once()))
