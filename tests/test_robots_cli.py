from walk_ray.state.robots import RobotsCache, parse_robots


def test_parse_robots():
    body = b"""
# comment
User-agent: googlebot
Disallow: /private

User-agent: *
Disallow: /admin
Allow: /admin/public
Disallow: /tmp
"""
    rules = parse_robots(body)
    assert ("/admin", False) in rules
    assert ("/admin/public", True) in rules
    assert ("/tmp", False) in rules
    assert ("/private", False) not in rules  # googlebot group ignored


def test_robots_cache_no_store():
    c = RobotsCache([])
    # no robots.txt loadable -> allow everything
    assert c.allowed(["http://a.com/admin", "http://a.com/"]) == [True, True]


def test_robots_longest_match():
    c = RobotsCache([])
    c.rules["a.com"] = [("/admin", False), ("/admin/public", True)]
    out = c.allowed(
        ["http://a.com/admin/x", "http://a.com/admin/public/y", "http://a.com/other"]
    )
    assert out == [False, True, True]


def test_cli_normalize_url(capsys):
    from walk_ray.cli import main

    assert main(["normalize-url", "https://www.a.com", "HTTP://B.com:80/x/../y#f"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["http://a.com", "http://b.com/y"]


def test_cli_clean(tmp_path, capsys):
    import json

    from walk_ray.cli import main

    sm = {
        "http://a.com": {"url": "http://a.com", "title": "", "status": 200,
                          "timestamp": "1999-11-30T00:00:00Z", "links": None},
        "http://a.com/drop": {"url": "http://a.com/drop", "title": "", "status": 200,
                               "timestamp": "1999-11-30T00:00:00Z", "links": None},
    }
    src = tmp_path / "sm.json"
    src.write_text(json.dumps(sm))
    out = tmp_path / "out.json"
    assert main(["clean", str(src), str(out), "http://a.com/drop"]) == 0
    cleaned = json.loads(out.read_text())
    assert list(cleaned) == ["http://a.com"]


def test_cli_job_new(capsys):
    import json

    from walk_ray.cli import main

    assert main(["job", "new"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    # the printed job is directly consumable by `start --job`
    from walk_ray.pipelines.crawl import CrawlConfig

    c = CrawlConfig.from_job_json(cfg)
    assert c.max_attempts == 3 and c.crawl is True and c.seeds == []


def test_cli_inbound_links_empty_result(tmp_path, capsys, monkeypatch):
    """No sources link to the target -> clean empty listing, not a
    KeyError (empty datasets lose their column schema in to_pandas)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    t = pa.table({"url": ["http://a.com/x"], "links": [["http://a.com/y"]]})
    pq.write_table(t, str(tmp_path / "part-0.parquet"))
    from walk_ray.cli import main

    # the CLI owns its Ray session and shuts it down on exit; keep the
    # test session alive
    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    assert main(["inbound-links", str(tmp_path), "http://nobody.links/here"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["found"] == 0 and out["sources"] == []
