"""HTTP query API over crawl outputs — walk's second entry point
(``/root/reference/api/server.go:47-68``) re-expressed over the
parquet read model.

Routes (1:1 with walk's mux):

- ``GET /status`` — health check (``api/server.go:29-33``)
- ``GET /collection`` — walk ids in the collection, paginated
  (``api/collection_handlers.go:19-42``)
- ``GET /collection/{id}`` — one walk's SURT-sorted index, paginated
  (``api/collection_handlers.go:62-78``)
- ``GET /captures`` — collection-wide sorted index, paginated
  (``api/collection_handlers.go:81-93``)
- ``GET /captures/meta/raw/{ts}/{url}`` — latest capture meta at/before
  ts (``api/collection_handlers.go:95-110``)
- ``GET /captures/meta/resolved/{ts}/{url}`` — redirect-resolved meta,
  ≤20 hops (``api/collection_handlers.go:113-127,163-186``)
- ``GET /captures/raw/{ts}/{url}`` — raw stored body bytes
  (``api/collection_handlers.go:129-144``; needs a ``store_bodies``
  crawl)
- ``GET /captures/resolved/{ts}/{url}`` — resolved body bytes
- ``GET /jobs`` — job configs (``api/job_handlers.go:29-53``)
- ``GET /jobs/{id}`` — one job's config, 404 on unknown id
  (``api/job_handlers.go:57-70``)
- ``POST /jobs`` — submit + run a crawl job (walk declares this route
  but stubs it, ``api/job_handlers.go:26-28``; live here when the
  server is given a job root — see :class:`JobRunner`)

Timestamps: RFC3339, or the literals ``now`` / ``zero``
(``api/collection_handlers.go:188-218``); ``now``/``zero`` mean "no
as-of bound" here (walk's CBOR reader ignores t as well,
``lib/walk.go:167-210``).

Pagination: ``page``/``pageSize`` (datatogether apiutil style, default
size 25) or explicit ``limit``/``offset``.

Scale note: the server is a READ MODEL process. Walk ids and job
configs load at startup; index pages and captures are served by
predicate-pushdown parquet reads per request — the full resources
table is never resident. Responses use the ``{"meta": ..., "data":
...}`` envelope walk's apiutil writes.
"""

from __future__ import annotations

import json
import os
import re
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

__all__ = ["Collection", "JobRunner", "make_server", "serve"]


def _rfc3339(ts) -> str:
    if ts is None:
        return ""
    if isinstance(ts, datetime):
        dt = ts
    else:  # microseconds since epoch
        dt = datetime.fromtimestamp(int(ts) / 1_000_000, tz=timezone.utc)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


class Collection:
    """A set of crawl workdirs served as one read model
    (walk Collection, ``lib/collection.go:9-92``)."""

    def __init__(self, workdirs: list[str]):
        self.walks: dict[str, dict] = {}
        self._index_cache: dict[str, object] = {}
        # handler threads iterate walks while the job runner publishes
        # into it; every read snapshots and every write holds this lock
        # so a mid-request add_walk can't blow up the iteration
        self._walks_lock = threading.Lock()
        for wd in workdirs:
            self.add_walk(wd)

    def _snapshot(self) -> list[dict]:
        with self._walks_lock:
            return list(self.walks.values())

    def add_walk(self, wd: str) -> bool:
        """Register one crawl workdir (also used by the job runner to
        publish a just-finished crawl); invalidates the collection-wide
        index cache so /captures sees the new walk."""
        wid = os.path.basename(os.path.normpath(wd))
        res = os.path.join(wd, "resources")
        if not os.path.isdir(res):
            return False
        job_path = os.path.join(wd, "job.json")
        job = None
        if os.path.exists(job_path):
            with open(job_path) as f:
                job = json.load(f)
        bodies = os.path.join(wd, "bodies")
        with self._walks_lock:
            self.walks[wid] = {
                "id": wid,
                "workdir": wd,
                "resources": res,
                "bodies": bodies if os.path.isdir(bodies) else "",
                "job": job,
            }
            self._index_cache.pop("", None)
        return True

    # -- index ---------------------------------------------------------

    def walk_ids(self) -> list[str]:
        with self._walks_lock:
            return sorted(self.walks)

    def _index_ds(self, walk_id: str | None):
        """SURT-sorted index Dataset for one walk or the collection,
        built once and MATERIALIZED (narrow metadata blocks pinned in
        the object store, spillable) — requests page out of the cached
        sort instead of re-sorting per hit. Mirrors walk loading
        ``index.cdxj`` once at open (lib/walk.go:42-64)."""
        key = walk_id or ""
        with self._walks_lock:
            ds = self._index_cache.get(key)
            if ds is not None:
                return ds
            dirs = (
                [self.walks[walk_id]["resources"]]
                if walk_id
                else [w["resources"] for w in self.walks.values()]
            )
        from .pipelines.query import build_index

        if not dirs:
            return None
        if len(dirs) == 1:
            src = dirs[0]
        else:
            import ray.data as rd

            parts = [rd.read_parquet(d) for d in dirs]
            src = parts[0]
            for p in parts[1:]:
                src = src.union(p)
        ds = build_index(src).materialize()
        with self._walks_lock:
            self._index_cache[key] = ds
        return ds

    def sorted_index(self, walk_id: str | None, limit: int, offset: int) -> list[dict]:
        """SURT-sorted index rows [offset, offset+limit) over one walk
        or the whole collection (lib/walk.go:89-109, lib/collection.go:57-73)."""
        ds = self._index_ds(walk_id)
        if ds is None:
            return []
        if offset > 0:
            ds = ds.split_at_indices([offset])[1]
        if limit >= 0:
            ds = ds.limit(limit)
        rows = ds.take_all() if limit < 0 else ds.take(limit) if limit else []
        for r in rows:
            r["timestamp"] = _rfc3339(r.get("timestamp"))
        return rows

    # -- captures ------------------------------------------------------

    def get_capture(self, url: str, at=None, resolve: bool = False,
                    with_body: bool = False) -> dict | None:
        from .pipelines.query import get_capture

        snap = self._snapshot()
        dirs = [w["resources"] for w in snap]
        # every member walk's bodies store is searched — in a
        # multi-walk collection a capture's body may live in a
        # different walk's store than the one that indexed it
        bodies = [w["bodies"] for w in snap if w["bodies"]]
        r = get_capture(dirs, url, at=at, resolve=resolve,
                        bodies_dir=bodies if with_body else "")
        return r

    def jobs(self) -> list[dict]:
        with self._walks_lock:
            items = sorted(self.walks.items())
        return [
            {"id": wid, **({"config": w["job"]} if w["job"] else {})}
            for wid, w in items
        ]

    def job(self, walk_id: str) -> dict | None:
        """One walk's job entry (walk ``GET /jobs/{id}``,
        api/job_handlers.go:57-70); None for an unknown id."""
        with self._walks_lock:
            w = self.walks.get(walk_id)
        if w is None:
            return None
        return {"id": walk_id, **({"config": w["job"]} if w["job"] else {})}


class JobRunner:
    """Crawl-job execution behind ``POST /jobs`` — the route walk
    declares but leaves an empty stub (``api/job_handlers.go:26-28``);
    here it is live: a submitted job crawls in a background worker and
    the finished walk is published into the collection.

    Body: ``{"job": {<walk job config>}, "pages": <pages.parquet>,
    "meta": <pages_meta.parquet>, "id": <optional>}`` — pages/meta
    point at the page table the engine fetches from (this engine's
    stand-in for walk's live HTTP fetcher). Jobs run one at a time on
    a single worker thread (a crawl saturates the Ray cluster; queuing
    is backpressure, not a limitation), with status ``queued →
    running → done | failed`` served by ``GET /jobs[/{id}]``."""

    def __init__(self, collection: Collection, job_root: str):
        import queue
        import threading

        self.collection = collection
        self.job_root = job_root
        self.jobs: dict[str, dict] = {}
        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # the id becomes a path component under job_root; anything outside
    # this alphabet ('/', '..', …) could escape it — and recovery
    # rmtree's partial epoch dirs under the workdir, so an escaped id
    # is a delete primitive, not just a bad URL
    _ID_RE = re.compile(r"^[A-Za-z0-9_-][A-Za-z0-9._-]{0,63}$")

    def submit(self, body: dict) -> tuple[dict | None, str]:
        import uuid

        job = body.get("job")
        pages, meta = body.get("pages", ""), body.get("meta", "")
        if not isinstance(job, dict):
            return None, "body must carry a 'job' config object"
        jid = str(body.get("id") or uuid.uuid4().hex[:8])
        if not self._ID_RE.fullmatch(jid):
            return None, ("invalid job id (allowed: [A-Za-z0-9._-], "
                          "max 64 chars, no leading '.')")
        if not (pages and os.path.exists(pages)):
            return None, f"pages table not found: {pages!r}"
        if not (meta and os.path.exists(meta)):
            return None, f"meta table not found: {meta!r}"
        with self._lock:
            if jid in self.jobs or jid in self.collection.walks:
                return None, f"job id already exists: {jid}"
            rec = {"id": jid, "status": "queued", "error": ""}
            self.jobs[jid] = rec
        self._q.put((jid, job, pages, meta))
        return dict(rec), ""

    def status(self, jid: str) -> dict | None:
        with self._lock:
            rec = self.jobs.get(jid)
            return dict(rec) if rec else None

    def statuses(self) -> list[dict]:
        with self._lock:
            return [dict(r) for r in self.jobs.values()]

    def _loop(self):
        from .pipelines.crawl import CrawlConfig, CrawlJob

        while True:
            jid, job, pages, meta = self._q.get()
            with self._lock:
                self.jobs[jid]["status"] = "running"
            workdir = os.path.join(self.job_root, jid)
            try:
                cfg = CrawlConfig.from_job_json(job)
                res = CrawlJob(cfg, pages, meta, workdir).run()
                with self._lock:
                    self.jobs[jid].update(
                        status="done",
                        result={k: res[k] for k in
                                ("epochs", "done_total", "seen_total",
                                 "recoveries", "sitemap_entries")
                                if k in res},
                    )
                self.collection.add_walk(workdir)
            except Exception as e:  # surfaced via GET /jobs/{id}
                with self._lock:
                    self.jobs[jid].update(status="failed", error=str(e))


def _parse_ts(part: str):
    """walk pathTimestampURL (api/collection_handlers.go:188-218)."""
    if part in ("now", "zero"):
        return None
    return datetime.strptime(part, "%Y-%m-%dT%H:%M:%SZ")


def _page(qs: dict) -> tuple[int, int]:
    if "limit" in qs or "offset" in qs:
        return int(qs.get("limit", ["25"])[0]), int(qs.get("offset", ["0"])[0])
    size = int(qs.get("pageSize", ["25"])[0])
    page = max(1, int(qs.get("page", ["1"])[0]))
    return size, (page - 1) * size


def make_server(collection: Collection, port: int = 0,
                log_requests: bool = False,
                runner: JobRunner | None = None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port 0`` picks a free
    ephemeral port (``server.server_address[1]``).

    ``log_requests`` enables the request log line — the one live piece
    of walk's API middleware (api/middleware.go:15; its CORS/TLS
    branches are commented out in the reference). ``runner`` enables
    ``POST /jobs`` (job create + execute; 405 without a runner,
    matching the reference's declared-but-stub route)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            if log_requests:
                print(f"{self.command} {self.path}", flush=True)

        def _json(self, data, code=200):
            body = json.dumps(
                {"meta": {"code": code, "status": "ok" if code == 200 else "error"},
                 "data": data},
                default=str,
            ).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, data: bytes, code=200):
            self.send_response(code)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _not_found(self):
            self._json([], code=404)

        def _capture(self, prefix: str):
            rest = self.path[len(prefix):]
            if "/" not in rest:
                return self._json({"error": "invalid {timestamp}/{url} combination"}, 400)
            ts_part, url = rest.split("/", 1)
            if not url:
                return self._json({"error": "invalid {timestamp}/{url} combination"}, 400)
            try:
                at = _parse_ts(ts_part)
            except ValueError:
                return self._json({"error": f"bad timestamp: {ts_part}"}, 400)
            resolve = "resolved" in prefix
            with_body = "/meta/" not in prefix
            try:
                r = collection.get_capture(url, at=at, resolve=resolve,
                                           with_body=with_body)
            except ValueError as e:  # max redirects
                return self._json({"error": str(e)}, 500)
            if r is None:
                return self._not_found()
            body = r.pop("body", None)
            if with_body:
                if body is None:
                    # a body route with no stored body is a miss, not
                    # an empty 200 (round-2 advisory)
                    return self._not_found()
                return self._bytes(bytes(body))
            r.pop("html", None)
            r["timestamp"] = _rfc3339(r.get("timestamp"))
            return self._json(r)

        def do_GET(self):  # noqa: N802 (stdlib casing)
            u = urlsplit(self.path)
            path, qs = u.path, parse_qs(u.query)
            self.path = path
            if path == "/status":
                return self._json([])
            if path == "/collection":
                limit, offset = _page(qs)
                return self._json(collection.walk_ids()[offset : offset + limit])
            if path.startswith("/collection/"):
                wid = path[len("/collection/"):]
                if wid not in collection.walks:
                    return self._not_found()
                limit, offset = _page(qs)
                return self._json(collection.sorted_index(wid, limit, offset))
            if path in ("/captures", "/captures/"):
                limit, offset = _page(qs)
                return self._json(collection.sorted_index(None, limit, offset))
            for prefix in ("/captures/meta/raw/", "/captures/meta/resolved/",
                           "/captures/raw/", "/captures/resolved/"):
                if path.startswith(prefix):
                    return self._capture(prefix)
            if path in ("/jobs", "/jobs/"):
                limit, offset = _page(qs)
                jobs = collection.jobs()
                if runner is not None:
                    done_ids = {j["id"] for j in jobs}
                    jobs += [r for r in runner.statuses() if r["id"] not in done_ids]
                return self._json(jobs[offset : offset + limit])
            if path.startswith("/jobs/"):
                # single-job route (api/job_handlers.go:57-70); ids of
                # runner-submitted jobs resolve to their status until
                # the finished walk supersedes them in the collection
                jid = path[len("/jobs/"):]
                j = collection.job(jid)
                if j is None and runner is not None:
                    j = runner.status(jid)
                return self._json(j) if j is not None else self._not_found()
            return self._not_found()

        def do_POST(self):  # noqa: N802 (stdlib casing)
            u = urlsplit(self.path)
            if u.path not in ("/jobs", "/jobs/"):
                return self._not_found()
            if runner is None:
                # parity mode: the reference declares POST /jobs but
                # leaves it an empty stub (api/job_handlers.go:26-28)
                return self._json({"error": "job submission not enabled"}, 405)
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._json({"error": "invalid JSON body"}, 400)
            rec, err = runner.submit(body)
            if rec is None:
                return self._json({"error": err}, 400)
            return self._json(rec, 200)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve(workdirs: list[str], port: int = 2783, job_root: str = ""):
    """Blocking serve (walk's default port is 2783, cmd/server.go).
    ``job_root`` enables POST /jobs; new walks land under it."""
    coll = Collection(workdirs)
    runner = JobRunner(coll, job_root) if job_root else None
    srv = make_server(coll, port, runner=runner)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
