"""Sitemap sink: resources → Go-byte-compatible ``sitemap.json``.

Walk upserts an Entry per handled resource into badger keyed by the
NORMALIZED url (``/root/reference/lib/sitemap.go:33-59,71-77``) and
finalizes by iterating keys lexicographically and writing
``json.MarshalIndent`` output (``lib/sitemap.go:84-116``). The byte
format is anchored on the golden at ``lib/sitemap_test.go:52-76``:

- top-level JSON object, keys (normalized URLs) byte-sorted, indent 2,
- entry field order ``url, title, timestamp, status, redirects,
  resources, links``; empty lists rendered as ``null``,
- timestamps RFC3339 (``Z``, no trailing zero fraction),
- Go's HTML-safe escaping (``&`` ``<`` ``>`` → ``\\u0026`` etc.),
- no trailing newline.

Last-write-wins per key: walk's handler goroutines race
(``lib/coordinator.go:376``); the deterministic linearization here is
``(epoch, seq, is_hop)`` — the final resource of a fetch supersedes
its redirect-hop record for the same key.
"""

from __future__ import annotations

import pandas as pd

from ..functions.canon import normalize_url

__all__ = ["build_sitemap_dataset", "write_sitemap_json", "build_and_write_sitemap"]


def _go_rfc3339(ts_us: int) -> str:
    """Go time.Time JSON format for UTC microsecond timestamps."""
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        frac = f"{dt.microsecond:06d}".rstrip("0")
        base += f".{frac}"
    return base + "Z"


def _go_json_string(s: str) -> str:
    """JSON-encode a string the way Go encoding/json does (HTML-safe
    escaping, raw UTF-8 output)."""
    import json

    out = json.dumps(s, ensure_ascii=False)
    return out.replace("&", "\\u0026").replace("<", "\\u003c").replace(">", "\\u003e")


def build_sitemap_dataset(resources_dir: str):
    """Resources parquet → Dataset of sitemap entries (one per
    normalized URL, last write wins), sorted by key.

    The reduction is ``groupby(key).map_groups(last)`` — walk's badger
    upsert re-expressed as a shuffle by normalized URL (SURVEY S8).
    """
    import ray.data as rd

    ds = rd.read_parquet(
        resources_dir,
        columns=["url", "title", "timestamp", "status", "links", "epoch", "seq", "is_hop"],
    )

    def add_key(batch):
        batch = batch.copy()
        batch["key"] = [normalize_url(u) for u in batch["url"]]
        return batch

    ds = ds.map_batches(add_key, batch_format="pandas")

    def last_entry(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["epoch", "seq", "is_hop"], ascending=[True, True, False])
        return g.tail(1)[["key", "url", "title", "timestamp", "status", "links"]]

    return ds.groupby("key").map_groups(last_entry, batch_format="pandas").sort("key")


def write_sitemap_json(entries, path: str) -> int:
    """Serialize sorted entries to the golden byte format. ``entries``
    is an iterable of dicts with keys key/url/title/timestamp/status/links."""
    chunks = ["{"]
    n = 0
    for e in entries:
        if n:
            chunks.append(",")
        links = list(e["links"]) if e["links"] is not None and len(e["links"]) else None
        if links is None:
            links_json = "null"
        else:
            inner = ",\n      ".join(_go_json_string(l) for l in links)
            links_json = "[\n      " + inner + "\n    ]"
        ts = e["timestamp"]
        ts_us = int(ts.value // 1000) if hasattr(ts, "value") else int(ts)
        chunks.append(
            "\n  " + _go_json_string(e["key"]) + ": {"
            + "\n    \"url\": " + _go_json_string(e["url"]) + ","
            + "\n    \"title\": " + _go_json_string(e["title"] or "") + ","
            + "\n    \"timestamp\": \"" + _go_rfc3339(ts_us) + "\","
            + "\n    \"status\": " + str(int(e["status"])) + ","
            + "\n    \"redirects\": null,"
            + "\n    \"resources\": null,"
            + "\n    \"links\": " + links_json
            + "\n  }"
        )
        n += 1
    chunks.append("\n}" if n else "}")
    data = "".join(chunks)
    with open(path, "w") as f:
        f.write(data)
    return n


def build_and_write_sitemap(resources_dir: str, path: str) -> int:
    """End-to-end: resources dir → sitemap.json. Streams sorted batches
    to the writer (order preserved via execution options)."""
    import glob as _glob

    if not _glob.glob(f"{resources_dir}/**/*.parquet", recursive=True):
        with open(path, "w") as f:
            f.write("{}")
        return 0
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        ds = build_sitemap_dataset(resources_dir)

        def rows():
            for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
                for _, row in batch.iterrows():
                    yield row
        return write_sitemap_json(rows(), path)
    finally:
        ctx.execution_options.preserve_order = prev
