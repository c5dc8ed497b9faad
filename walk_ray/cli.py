"""Command-line surface mirroring walk's cmd/ tree
(``/root/reference/cmd/``): ``start``, ``normalize-url``,
``inbound-links``, ``clean``, plus read-model queries (``index``,
``resolve``, ``timespan``) standing in for the HTTP API
(``/root/reference/api/``).

Usage:
    python -m walk_ray.cli start --job job.json --pages pages.parquet \\
        --meta pages_meta.parquet --workdir /tmp/crawl [--resume]
    python -m walk_ray.cli normalize-url URL [URL...]
    python -m walk_ray.cli inbound-links RESOURCES_DIR TARGET_URL
    python -m walk_ray.cli clean SITEMAP_JSON OUT_JSON PREFIX [PREFIX...]
    python -m walk_ray.cli index RESOURCES_DIR OUT_DIR
    python -m walk_ray.cli resolve RESOURCES_DIR URL
    python -m walk_ray.cli timespan RESOURCES_DIR
    python -m walk_ray.cli prepare SF_DIR OUT_DIR [--resume]

CLI entry points own their Ray session (init guarded; shutdown on
exit), per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import os

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # several commands print one parseable JSON result line;
            # forwarded worker/raylet log lines otherwise land on the
            # same stdout (errors still surface as raised exceptions)
            log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_start(args) -> int:
    ray = _ray_session()
    from .pipelines.crawl import CrawlConfig, CrawlJob

    with open(args.job) as f:
        job_cfg = json.load(f)
    cfg = CrawlConfig.from_job_json(job_cfg)
    job = CrawlJob(cfg, args.pages, args.meta, args.workdir)
    res = job.run(resume=args.resume)
    print(json.dumps({k: v for k, v in res.items() if not isinstance(v, list)}, default=str))
    ray.shutdown()
    return 0


def cmd_normalize_url(args) -> int:
    # mirror of cmd/normalize_url.go:12-30 — no Ray needed
    from .functions.canon import normalize_url

    for u in args.urls:
        print(normalize_url(u))
    return 0


def cmd_inbound_links(args) -> int:
    ray = _ray_session()
    from .pipelines.query import inbound_links

    df = inbound_links(args.resources, args.target).to_pandas()
    urls = sorted(df["url"]) if "url" in df.columns else []
    print(json.dumps({"target": args.target, "found": len(urls), "sources": urls}, indent=2))
    ray.shutdown()
    return 0


def cmd_clean(args) -> int:
    from .pipelines.query import clean_sitemap

    counts = clean_sitemap(args.sitemap, args.out, args.prefixes)
    print(json.dumps(counts))
    return 0


def cmd_index(args) -> int:
    ray = _ray_session()
    from .pipelines.query import build_index

    build_index(args.resources).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_resolve(args) -> int:
    from .pipelines.query import resolve_redirects

    print(resolve_redirects(args.resources, args.url))
    return 0


def cmd_get(args) -> int:
    """Capture retrieval (walk Get(url, t), lib/walk.go:167-210):
    meta JSON, optionally redirect-resolved, with --body printing the
    stored content from the content-addressed bodies dir."""
    ray = _ray_session()
    from datetime import datetime

    from .pipelines.query import get_capture

    at = None
    if args.at:
        at = datetime.strptime(args.at, "%Y-%m-%dT%H:%M:%SZ")
    r = get_capture(args.resources, args.url, at=at, resolve=args.resolve,
                    bodies_dir=args.bodies or "")
    if r is None:
        print("not found", file=sys.stderr)
        ray.shutdown()
        return 1
    body = r.pop("body", None)
    r.pop("html", None)
    if args.bodies and body is not None:
        sys.stdout.buffer.write(bytes(body))
    else:
        print(json.dumps(r, default=str, indent=2))
    ray.shutdown()
    return 0


def cmd_serve(args) -> int:
    """HTTP query API over one or more crawl workdirs
    (api/server.go:47-68; default port 2783 like walk)."""
    ray = _ray_session()
    from .server import Collection, JobRunner, make_server

    coll = Collection(args.workdirs)
    runner = JobRunner(coll, args.job_root) if args.job_root else None
    srv = make_server(coll, args.port, runner=runner)
    print(json.dumps({"serving": f"http://127.0.0.1:{srv.server_address[1]}",
                      "walks": sorted(coll.walks),
                      "jobs_enabled": runner is not None}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
        ray.shutdown()
    return 0


def cmd_jobs(args) -> int:
    # api/job_handlers.go:29-53 as a CLI listing
    from .server import Collection

    print(json.dumps(Collection(args.workdirs).jobs(), indent=2))
    return 0


def cmd_job_new(args) -> int:
    """`job new` (cmd/job.go:17-28): print a blank job config with
    starting defaults, in the shape `start --job` consumes."""
    from dataclasses import asdict

    from .pipelines.crawl import CrawlConfig

    cfg = asdict(CrawlConfig())
    job_keys = ["seeds", "seeds_path", "domains", "ignore_patterns", "crawl",
                "delay_milli", "max_attempts", "stop_url", "stop_after_entries",
                "backoff_response_codes", "enable_backoff", "record_headers",
                "polite", "record_redirects"]
    print(json.dumps({k: cfg[k] for k in job_keys}, indent=2))
    return 0


def cmd_config(args) -> int:
    # cmd/config.go analog: show a crawl's persisted job config
    import os

    path = os.path.join(args.workdir, "job.json")
    with open(path) as f:
        print(f.read().rstrip())
    return 0


def cmd_timespan(args) -> int:
    ray = _ray_session()
    from .pipelines.query import timespan

    lo, hi = timespan(args.resources)
    print(json.dumps({"min": str(lo), "max": str(hi)}))
    ray.shutdown()
    return 0


def cmd_prepare(args) -> int:
    """Corpus preparation with resumable partitioned output: quality
    filter → chunk dedup → split, written as
    ``out/split=train|val|test/`` with per-partition ``_SUCCESS``
    markers (re-run with ``--resume`` to skip finished partitions)."""
    ray = _ray_session()
    from .pipelines.prepare import prepare_corpus

    kw = {} if args.min_quality is None else {"min_quality": args.min_quality}
    summary = prepare_corpus(args.sf_dir, out_dir=args.out,
                             resume=args.resume, **kw)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="walk_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("start", help="run a crawl job")
    s.add_argument("--job", required=True)
    s.add_argument("--pages", required=True)
    s.add_argument("--meta", required=True)
    s.add_argument("--workdir", required=True)
    s.add_argument("--resume", action="store_true")
    s.set_defaults(fn=cmd_start)

    s = sub.add_parser("normalize-url", help="canonicalize URLs")
    s.add_argument("urls", nargs="+")
    s.set_defaults(fn=cmd_normalize_url)

    s = sub.add_parser("inbound-links", help="pages linking to a target")
    s.add_argument("resources")
    s.add_argument("target")
    s.set_defaults(fn=cmd_inbound_links)

    s = sub.add_parser("clean", help="filter a sitemap.json")
    s.add_argument("sitemap")
    s.add_argument("out")
    s.add_argument("prefixes", nargs="+")
    s.set_defaults(fn=cmd_clean)

    s = sub.add_parser("index", help="write the SURT-sorted index")
    s.add_argument("resources")
    s.add_argument("out")
    s.set_defaults(fn=cmd_index)

    s = sub.add_parser("resolve", help="resolve a redirect chain")
    s.add_argument("resources")
    s.add_argument("url")
    s.set_defaults(fn=cmd_resolve)

    s = sub.add_parser("timespan", help="min/max capture timestamps")
    s.add_argument("resources")
    s.set_defaults(fn=cmd_timespan)

    s = sub.add_parser("get", help="capture meta/body at a time")
    s.add_argument("resources")
    s.add_argument("url")
    s.add_argument("--at", default="")
    s.add_argument("--resolve", action="store_true")
    s.add_argument("--bodies", default="")
    s.set_defaults(fn=cmd_get)

    s = sub.add_parser("serve", help="HTTP query API over crawl workdirs")
    s.add_argument("workdirs", nargs="+")
    s.add_argument("--port", type=int, default=2783)
    s.add_argument("--job-root", default="",
                   help="enable POST /jobs; new walks land under this dir")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("jobs", help="list job configs of crawl workdirs")
    s.add_argument("workdirs", nargs="+")
    s.set_defaults(fn=cmd_jobs)

    s = sub.add_parser("job", help="work with job files")
    jsub = s.add_subparsers(dest="jobcmd", required=True)
    jn = jsub.add_parser("new", help="print a blank job config")
    jn.set_defaults(fn=cmd_job_new)

    s = sub.add_parser("config", help="show a crawl's job config")
    s.add_argument("workdir")
    s.set_defaults(fn=cmd_config)

    s = sub.add_parser(
        "prepare",
        help="corpus prep (quality→dedup→split) to resumable "
             "split-partitioned parquet")
    s.add_argument("sf_dir", help="dir containing documents.parquet")
    s.add_argument("out", help="output dir (split=... partitions)")
    s.add_argument("--min-quality", type=float,
                   default=None, dest="min_quality")
    s.add_argument("--resume", action="store_true",
                   help="skip partitions whose _SUCCESS marker exists")
    s.set_defaults(fn=cmd_prepare)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"walk_ray: file not found: {e.filename or e}", file=sys.stderr)
        return 2
    except json.JSONDecodeError as e:
        print(f"walk_ray: invalid JSON: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
