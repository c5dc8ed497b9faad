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
``(epoch, seq, hop-before-final)`` — the final resource of a fetch
supersedes its redirect-hop record for the same key.

Implementation shape: ONE global sort by ``(key, epoch, seq,
final_rank)`` (walk's badger iteration order re-expressed), then a
streaming last-wins scan over ordered batches — no per-key map_groups,
no driver materialization of the full table; the JSON file is written
incrementally.
"""

from __future__ import annotations

import pyarrow as pa

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
    """Resources parquet → Dataset sorted so that the LAST row of each
    ``key`` run is the winning sitemap entry."""
    import ray.data as rd

    ds = rd.read_parquet(
        resources_dir,
        columns=["url", "title", "timestamp", "status", "links", "epoch", "seq", "is_hop"],
    )

    def add_key(batch: pa.Table) -> pa.Table:
        key = pa.array([normalize_url(u) for u in batch["url"].to_pylist()], pa.string())
        final_rank = pa.array(
            [0 if h else 1 for h in batch["is_hop"].to_pylist()], pa.int8()
        )
        return batch.append_column("key", key).append_column("final_rank", final_rank)

    ds = ds.map_batches(add_key, batch_format="pyarrow")
    # sort-partition count scales with the resources volume (~64 MB a
    # partition), floored at 8: the input is many small per-epoch
    # files, and without coalescing sort fan-out grows with cluster
    # size while small-data sorts drown in partition overhead — but a
    # FIXED 8 caps finalize parallelism on a big crawl
    import glob as _glob
    import os as _os

    nbytes = sum(
        _os.path.getsize(p)
        for p in _glob.glob(f"{resources_dir}/**/*.parquet", recursive=True)
    )
    ds = ds.repartition(min(64, max(8, nbytes // (64 << 20) + 1)))
    return ds.sort(["key", "epoch", "seq", "final_rank"])


def write_sitemap_json(entries, path: str) -> int:
    """Serialize sorted entries to the golden byte format. ``entries``
    is an iterable of dicts with keys key/url/title/timestamp/status/links."""
    n = 0
    with open(path, "w") as f:
        f.write("{")
        for e in entries:
            if n:
                f.write(",")
            links = list(e["links"]) if e["links"] is not None and len(e["links"]) else None
            if links is None:
                links_json = "null"
            else:
                inner = ",\n      ".join(_go_json_string(l) for l in links)
                links_json = "[\n      " + inner + "\n    ]"
            ts = e["timestamp"]
            ts_us = int(ts.value // 1000) if hasattr(ts, "value") else int(ts)
            f.write(
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
        f.write("\n}" if n else "}")
    return n


def _last_wins(sorted_batches):
    """Streaming last-wins over key-sorted arrow batches: yields the
    final row of every key run (runs may span batch boundaries)."""
    pending = None  # candidate winning row for the current key run
    for batch in sorted_batches:
        if batch.num_rows == 0:
            continue
        keys = batch["key"].to_pylist()
        urls = batch["url"].to_pylist()
        titles = batch["title"].to_pylist()
        ts = batch["timestamp"].cast(pa.int64()).to_pylist()
        statuses = batch["status"].to_pylist()
        links = batch["links"].to_pylist()
        for i in range(len(keys)):
            row = {
                "key": keys[i],
                "url": urls[i],
                "title": titles[i],
                "timestamp": ts[i],
                "status": statuses[i],
                "links": links[i],
            }
            if pending is not None and pending["key"] != keys[i]:
                yield pending
            pending = row
    if pending is not None:
        yield pending


def build_and_write_sitemap(resources_dir: str, path: str) -> int:
    """End-to-end: resources dir → sitemap.json, streaming the sorted
    dataset through a last-wins scan into the incremental writer."""
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
        batches = ds.iter_batches(batch_size=8192, batch_format="pyarrow")
        return write_sitemap_json(_last_wins(batches), path)
    finally:
        ctx.execution_options.preserve_order = prev
