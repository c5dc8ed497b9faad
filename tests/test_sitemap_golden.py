"""Byte-for-byte port of the reference sitemap golden
(/root/reference/lib/sitemap_test.go:19-81, fixtures
lib/resource_test.go:7-28)."""

from datetime import datetime, timezone

from walk_ray.pipelines.sitemap import _go_rfc3339, write_sitemap_json

GOLDEN = """{
  "http://a.com": {
    "url": "https://www.a.com",
    "title": "",
    "timestamp": "1999-11-30T00:00:00Z",
    "status": 200,
    "redirects": null,
    "resources": null,
    "links": [
      "https://www.a.com/a",
      "https://www.a.com/b"
    ]
  },
  "http://a.com/a": {
    "url": "https://www.a.com/a",
    "title": "",
    "timestamp": "1999-11-30T00:00:00Z",
    "status": 200,
    "redirects": null,
    "resources": null,
    "links": [
      "https://www.a.com"
    ]
  }
}"""


def _ts_us(y, m, d):
    return int(datetime(y, m, d, tzinfo=timezone.utc).timestamp() * 1_000_000)


def test_sitemap_golden_bytes(tmp_path):
    # Go time.Date(2000, 0, 0, ...) normalizes to 1999-11-30.
    ts = _ts_us(1999, 11, 30)
    entries = [
        {
            "key": "http://a.com",
            "url": "https://www.a.com",
            "title": "",
            "timestamp": ts,
            "status": 200,
            "links": ["https://www.a.com/a", "https://www.a.com/b"],
        },
        {
            "key": "http://a.com/a",
            "url": "https://www.a.com/a",
            "title": "",
            "timestamp": ts,
            "status": 200,
            "links": ["https://www.a.com"],
        },
    ]
    path = str(tmp_path / "map.json")
    n = write_sitemap_json(entries, path)
    assert n == 2
    assert open(path).read() == GOLDEN


def test_go_rfc3339():
    assert _go_rfc3339(_ts_us(1999, 11, 30)) == "1999-11-30T00:00:00Z"
    assert _go_rfc3339(_ts_us(2018, 1, 1) + 1_500_000) == "2018-01-01T00:00:01.5Z"


def test_empty_sitemap(tmp_path):
    path = str(tmp_path / "empty.json")
    assert write_sitemap_json([], path) == 0
    assert open(path).read() == "{}"


def test_go_escaping(tmp_path):
    entries = [
        {
            "key": "http://a.com/x?a=1&b=2",
            "url": "http://a.com/x?a=1&b=2",
            "title": "A <b> & more",
            "timestamp": _ts_us(1999, 11, 30),
            "status": 200,
            "links": None,
        }
    ]
    path = str(tmp_path / "esc.json")
    write_sitemap_json(entries, path)
    data = open(path).read()
    assert "\\u0026" in data and "\\u003c" in data and "&" not in data.replace("\\u0026", "")
