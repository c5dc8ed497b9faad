"""HTTP query API conformance (api/server.go:47-68 route map,
api/collection_handlers.go semantics, api/job_handlers.go listing)."""

import json
import os
import threading
import urllib.request

import pytest

from walk_ray.pipelines.crawl import CrawlConfig, CrawlJob
from walk_ray.server import Collection, make_server
from walk_ray.sources.testgen import generate_pages


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("server")
    gen = generate_pages("self_linking", str(tmp / "gen_self"))
    cfg = CrawlConfig.from_job_json(
        gen["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2,
        store_bodies=True,
    )
    CrawlJob(cfg, gen["pages"], gen["pages_meta"], str(tmp / "walk_self")).run()

    gen2 = generate_pages("redirect_chain", str(tmp / "gen_redir"))
    cfg2 = CrawlConfig.from_job_json(
        gen2["job"], n_frontier_shards=2, n_seen_shards=2, n_page_parts=2
    )
    CrawlJob(cfg2, gen2["pages"], gen2["pages_meta"], str(tmp / "walk_redir")).run()

    coll = Collection([str(tmp / "walk_self"), str(tmp / "walk_redir")])
    srv = make_server(coll, 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, tmp
    srv.shutdown()
    srv.server_close()


def _get_json(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _get_bytes(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.read()


def test_status(served):
    base, _ = served
    code, body = _get_json(base + "/status")
    assert code == 200 and body["meta"]["code"] == 200


def test_list_walks(served):
    base, _ = served
    _, body = _get_json(base + "/collection")
    assert body["data"] == ["walk_redir", "walk_self"]


def test_walk_index_paginated(served):
    base, _ = served
    _, body = _get_json(base + "/collection/walk_self?limit=2&offset=1")
    rows = body["data"]
    assert len(rows) == 2
    # SURT order; offset skipped the first entry
    surts = [r["surt_url"] for r in rows]
    assert surts == sorted(surts)
    _, all_rows = _get_json(base + "/collection/walk_self?limit=25")
    assert all_rows["data"][1]["surt_url"] == surts[0]


def test_collection_index_unions_walks(served):
    base, _ = served
    _, body = _get_json(base + "/captures?limit=100")
    urls = {r["url"] for r in body["data"]}
    assert any("self.test" in u for u in urls)
    assert any("redir.test" in u for u in urls)


def test_capture_meta_raw(served):
    base, _ = served
    _, body = _get_json(base + "/captures/meta/raw/now/http://self.test/a.html")
    meta = body["data"]
    assert meta["url"] == "http://self.test/a.html"
    assert meta["status"] == 200
    assert "html" not in meta and "body" not in meta
    assert meta["timestamp"].endswith("Z")


def test_capture_meta_resolved_follows_redirects(served):
    base, _ = served
    _, raw = _get_json(base + "/captures/meta/raw/now/http://redir.test/hop/0")
    assert raw["data"]["redirect_to"] == "http://redir.test/hop/1"
    _, resolved = _get_json(base + "/captures/meta/resolved/now/http://redir.test/hop/0")
    assert resolved["data"]["url"] == "http://redir.test/hop/4"
    assert resolved["data"]["redirect_to"] == ""


def test_capture_raw_body(served):
    """walk Get(url, t) returns the resource WITH body
    (lib/walk.go:167-210): served from the content-addressed bodies
    store by hash lookup."""
    base, tmp = served
    code, body = _get_bytes(base + "/captures/raw/now/http://self.test/a.html")
    assert code == 200
    import pyarrow.parquet as pq

    pages = pq.read_table(str(tmp / "gen_self" / "pages.parquet"))
    want = {u: h for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist())}
    assert bytes(body) == bytes(want["http://self.test/a.html"])


def test_jobs_listing(served):
    base, _ = served
    _, body = _get_json(base + "/jobs")
    jobs = {j["id"]: j for j in body["data"]}
    assert jobs["walk_self"]["config"]["seeds"] == ["http://self.test/"]


def test_not_found_routes(served):
    base, _ = served
    for path in ("/", "/nope", "/collection/unknown-walk"):
        try:
            with urllib.request.urlopen(base + path) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 404, path


def test_bad_timestamp(served):
    base, _ = served
    try:
        with urllib.request.urlopen(base + "/captures/meta/raw/not-a-ts/http://x") as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_capture_asof_timestamp(served):
    base, _ = served
    # an as-of bound before the crawl's capture times -> not found
    code = None
    try:
        with urllib.request.urlopen(
            base + "/captures/meta/raw/2017-01-01T00:00:00Z/http://self.test/a.html"
        ) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404


def test_single_job_route(served):
    """GET /jobs/{id} (api/job_handlers.go:57-70): one job's config,
    404 on unknown id."""
    base, _ = served
    code, body = _get_json(base + "/jobs/walk_self")
    assert code == 200
    assert body["data"]["id"] == "walk_self"
    assert body["data"]["config"]["seeds"] == ["http://self.test/"]
    try:
        with urllib.request.urlopen(base + "/jobs/unknown-job") as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404


def test_raw_body_missing_is_404(served):
    """A body route whose capture has no stored body (walk_redir ran
    without store_bodies) is a 404, not an empty 200 (round-2
    advisory)."""
    base, _ = served
    try:
        with urllib.request.urlopen(
            base + "/captures/raw/now/http://redir.test/hop/1"
        ) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404


def test_request_log_line(capsys):
    """make_server(log_requests=True) emits walk's middleware log line
    (api/middleware.go:15) per request."""
    import threading

    coll = Collection([])
    srv = make_server(coll, 0, log_requests=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    _get_json(base + "/status")
    srv.shutdown()
    srv.server_close()
    assert "GET /status" in capsys.readouterr().out


def _post_json(url, payload):
    import urllib.error

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_post_jobs_without_runner_is_405(served):
    """Parity mode: walk declares POST /jobs but stubs it
    (api/job_handlers.go:26-28); without a job root ours refuses too."""
    base, _ = served
    code, body = _post_json(base + "/jobs", {"job": {}})
    assert code == 405


@pytest.mark.usefixtures("ray_session")
def test_post_jobs_submits_runs_and_publishes(tmp_path):
    """POST /jobs with a runner: the job crawls in the background, its
    status is served while running, and the finished walk is published
    into the collection (index + captures + /jobs/{id} config)."""
    import threading
    import time

    from walk_ray.server import JobRunner

    gen = generate_pages("self_linking", str(tmp_path / "gen"))
    coll = Collection([])
    runner = JobRunner(coll, str(tmp_path / "walks"))
    srv = make_server(coll, 0, runner=runner)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # invalid bodies are 400 with a reason
        code, body = _post_json(base + "/jobs", {"job": "nope"})
        assert code == 400 and "job" in body["data"]["error"]
        code, body = _post_json(
            base + "/jobs", {"job": gen["job"], "pages": "/no/such", "meta": "/no/such"})
        assert code == 400 and "pages" in body["data"]["error"]

        # ids that would escape job_root (or hide behind '/') are 400
        # before any filesystem work (round-3 advisory)
        # (an empty id is "no id" — the runner assigns a uuid instead)
        for bad in ("../evil", "a/b", ".", "..", ".hidden", "x" * 65):
            code, body = _post_json(base + "/jobs", {
                "id": bad, "job": gen["job"],
                "pages": gen["pages"], "meta": gen["pages_meta"],
            })
            assert code == 400 and "job id" in body["data"]["error"], bad

        # physical knobs ride in the job body and reach the crawl config
        job_body = dict(gen["job"], n_frontier_shards=2, n_seen_shards=2,
                        checkpoint_every=2, sitemap_json=False)
        code, body = _post_json(base + "/jobs", {
            "id": "svc1", "job": job_body,
            "pages": gen["pages"], "meta": gen["pages_meta"],
        })
        assert code == 200 and body["data"]["status"] in ("queued", "running")
        # duplicate id rejected while queued/running
        code, _ = _post_json(base + "/jobs", {
            "id": "svc1", "job": gen["job"],
            "pages": gen["pages"], "meta": gen["pages_meta"],
        })
        assert code == 400

        deadline = time.monotonic() + 180
        st = None
        while time.monotonic() < deadline:
            _, j = _get_json(base + "/jobs/svc1")
            d = j["data"]
            if "config" in d:  # finished walk superseded the status
                st = "published"
                break
            st = d.get("status")
            assert st != "failed", d.get("error")
            time.sleep(0.5)
        assert st == "published"
        assert runner.status("svc1")["result"]["done_total"] > 0

        # the new walk serves index rows collection-wide
        _, idx = _get_json(base + "/captures?limit=5")
        assert len(idx["data"]) > 0
        _, walks = _get_json(base + "/collection")
        assert walks["data"] == ["svc1"]

        # the published walk's job.json records the submitted physical
        # knobs — the job ran with them, not the server defaults
        import json as _json

        with open(tmp_path / "walks" / "svc1" / "job.json") as f:
            jj = _json.load(f)
        assert jj["n_frontier_shards"] == 2
        assert jj["n_seen_shards"] == 2
        assert jj["checkpoint_every"] == 2
        assert jj["sitemap_json"] is False
        # sitemap_json=False → distributed parquet sitemap, no JSON file
        assert not (tmp_path / "walks" / "svc1" / "sitemap.json").exists()
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.usefixtures("ray_session")
def test_post_jobs_failure_surfaces_as_status(tmp_path):
    """A job whose crawl raises lands in status=failed with the error
    string served by GET /jobs/{id} — not a dead worker."""
    import threading
    import time

    from walk_ray.server import JobRunner

    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"not a parquet file")
    coll = Collection([])
    runner = JobRunner(coll, str(tmp_path / "walks"))
    srv = make_server(coll, 0, runner=runner)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body = _post_json(base + "/jobs", {
            "id": "boom", "job": {"seeds": ["http://x.test/"]},
            "pages": str(bad), "meta": str(bad),
        })
        assert code == 200
        deadline = time.monotonic() + 60
        st = None
        while time.monotonic() < deadline:
            st = runner.status("boom")["status"]
            if st in ("done", "failed"):
                break
            time.sleep(0.25)
        assert st == "failed"
        _, j = _get_json(base + "/jobs/boom")
        assert j["data"]["status"] == "failed" and j["data"]["error"]
        # the worker survives: a valid follow-up submission still runs
        assert runner._worker.is_alive()
    finally:
        srv.shutdown()
        srv.server_close()
