"""Page source: the graft's stand-in for live HTTP fetching.

Walk fetches over HTTP (``/root/reference/lib/worker.go:79-117``); this
engine draws pages from a Parquet table of Common-Crawl-style pages
(driver input_hint). "Fetching" a URL = a point lookup against the
pages table, honoring the HTTP-ish behaviors walk's tests rely on:

- path resolution: ``http://h/`` and ``http://h`` hit the same page
  (request keys are host+path+query, scheme- and fragment-insensitive),
- misses return a 404 with body ``404 page not found\n`` (Go
  ``http.FileServer`` behavior walk's httptest harness produces),
- redirect rows (``pages_meta.redirect_to``) are followed up to 10
  hops, each hop emitting a synthetic redirect resource
  (``lib/worker.go:195-228``), the 11th failing the fetch.

Scale shape: the table is hash-partitioned by request key once
(`prepare_page_partitions`, a Ray Data job) and each partition is
pinned in one ``PageStore`` actor; a fetch batch groups its URLs by
partition and issues one RPC per touched partition. The ready-side is
small relative to the pages table, so this is the broadcast-the-keys
side of a partitioned hash join (SURVEY §2.4 J6) — no shuffle of page
bodies ever happens.
"""

from __future__ import annotations

import glob
import os
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.seen import url_hash64_batch

__all__ = ["request_key", "prepare_page_partitions", "PageStore", "partition_of"]


def request_key(url: str) -> str:
    """HTTP-serving key of a URL: ``host[:port]`` + path (empty → /) +
    ``?query``; scheme, fragment and userinfo ignored.

    The manual split below is exactly urlsplit's netloc/path/query
    decomposition for ``http(s)://`` URLs (the only scheme the crawl
    emits post-normalization) at ~1/8 the cost; anything else falls
    back to urlsplit. Hot path: called once per fetch lookup."""
    if url.startswith("http://"):
        rest = url[7:]
    elif url.startswith("https://"):
        rest = url[8:]
    else:
        rest = None
    if rest is not None:
        # netloc ends at the first of "/?#"
        j = len(rest)
        for sep in "/?#":
            k = rest.find(sep, 0, j)
            if k >= 0:
                j = k
        netloc = rest[:j]
        if "@" in netloc:
            netloc = netloc.rsplit("@", 1)[1]
        tail = rest[j:]
        f = tail.find("#")
        if f >= 0:
            tail = tail[:f]
        q = tail.find("?")
        if q >= 0:
            path, query = tail[:q], tail[q + 1 :]
        else:
            path, query = tail, ""
        return f"{netloc.lower()}{path or '/'}" + (f"?{query}" if query else "")
    try:
        p = urlsplit(url)
    except ValueError:
        return url
    netloc = p.netloc
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    return f"{netloc.lower()}{p.path or '/'}" + (f"?{p.query}" if p.query else "")


def partition_of(urls: list[str], n_parts: int) -> np.ndarray:
    keys = [request_key(u) for u in urls]
    return (url_hash64_batch(keys) % np.uint64(n_parts)).astype(np.int64)


def prepare_page_partitions(pages_path: str, meta_path: str, out_dir: str, n_parts: int) -> str:
    """Hash-partition pages ⋈ meta by request key into
    ``out_dir/part={k}/``. One-time Ray Data job, fingerprint-cached.
    """
    import ray.data as rd

    stamp = os.path.join(out_dir, "DONE")
    tag = f"{pages_path}|{meta_path}|{n_parts}|v3"  # v3: + headers column, clean rebuild
    if os.path.exists(stamp) and open(stamp).read() == tag:
        return out_dir
    # stale or partial cache: wipe before re-partitioning (write_parquet
    # appends new files; leftovers from an older schema must not linger)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    # meta is narrow — broadcast it as a dict.
    meta_t = pq.read_table(meta_path)
    hdr_col = (
        meta_t["headers"].to_pylist()
        if "headers" in meta_t.column_names
        else [[]] * meta_t.num_rows
    )
    meta = {
        u: (s, r, c, h or [])
        for u, s, r, c, h in zip(
            meta_t["url"].to_pylist(),
            meta_t["status"].to_pylist(),
            meta_t["redirect_to"].to_pylist(),
            meta_t["content_type"].to_pylist(),
            hdr_col,
        )
    }
    import ray

    meta_ref = ray.put(meta)

    class AddPart:
        """Broadcast meta is fetched ONCE per actor (zero-copy plasma
        read), not per batch."""

        def __init__(self):
            self.meta = ray.get(meta_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = self.meta
            urls = batch["url"].to_pylist()
            part = partition_of(urls, n_parts)
            default = (200, "", "", [])
            statuses = pa.array([m.get(u, default)[0] for u in urls], pa.int32())
            redirects = pa.array([m.get(u, default)[1] for u in urls], pa.string())
            ctypes = pa.array([m.get(u, default)[2] for u in urls], pa.string())
            headers = pa.array([m.get(u, default)[3] for u in urls], pa.list_(pa.string()))
            keys = pa.array([request_key(u) for u in urls], pa.string())
            return (
                batch.append_column("part", pa.array(part))
                .append_column("status", statuses)
                .append_column("redirect_to", redirects)
                .append_column("content_type", ctypes)
                .append_column("headers", headers)
                .append_column("req_key", keys)
            )

    ds = rd.read_parquet(pages_path).map_batches(AddPart, batch_format="pyarrow", concurrency=(1, 4))
    ds.write_parquet(out_dir, partition_cols=["part"])
    with open(stamp, "w") as f:
        f.write(tag)
    return out_dir


_STORE_COLS = ["status", "redirect_to", "html", "ts_us", "content_type", "headers"]


class PageStore:
    """Actor holding one hash partition of the pages table, keyed by
    request key. Load happens once in ``__init__`` (actor-pool rule).

    Scale shape of the fetch path: the partition's page data lives in
    the OBJECT STORE as one Arrow table (``table_handle``); lookups
    return only row indices (a few bytes each), and fetch tasks read
    the shared table zero-copy from plasma and ``take`` just their
    rows. Bodies therefore never pass through the actor's RPC
    serializer — at 4 stores × 640k pages that RPC path serialized
    ~525 MB per store per peak epoch."""

    def __init__(self, partition_dir: str, part_id: int):
        self.part_id = part_id
        pattern = os.path.join(partition_dir, f"part={part_id}", "*.parquet")
        tables = []
        for path in sorted(glob.glob(pattern)):
            t = pq.read_table(
                path,
                columns=["req_key", "status", "redirect_to", "html", "warc_ts",
                         "content_type", "headers"],
            )
            tables.append(t)
        if tables:
            t = pa.concat_tables(tables).combine_chunks()
        else:
            t = pa.table(
                {"req_key": pa.array([], pa.string()),
                 "status": pa.array([], pa.int32()),
                 "redirect_to": pa.array([], pa.string()),
                 "html": pa.array([], pa.large_binary()),
                 "warc_ts": pa.array([], pa.timestamp("us")),
                 "content_type": pa.array([], pa.string()),
                 "headers": pa.array([], pa.list_(pa.string()))}
            )
        t = t.append_column("ts_us", t["warc_ts"].cast(pa.int64()))
        self.index: dict[str, int] = {
            k: i for i, k in enumerate(t["req_key"].to_pylist())
        }
        self.table = t.select(_STORE_COLS)
        self._ref = None  # plasma handle, created lazily (needs Ray)

    def table_handle(self):
        """ObjectRef to this partition's page table (put once)."""
        if self._ref is None:
            import ray

            self._ref = ray.put(self.table)
        return self._ref

    def lookup_idx(self, keys: list[str]) -> list[int]:
        """Row indices into the shared table; -1 = miss. The narrow
        RPC of the fetch path — bodies ride the object store."""
        idx = self.index
        return [idx.get(k, -1) for k in keys]

    # Go's FileServer 404 response headers (miss path)
    _MISS = (False, 404, "", b"", 0, "text/plain; charset=utf-8",
             ["Content-Type", "text/plain; charset=utf-8"])

    def lookup(self, keys: list[str]):
        """Batch point lookup;
        (found, status, redirect_to, html, ts_us, content_type, headers).
        Serves small-volume callers (robots.txt); the crawl fetch path
        uses ``lookup_idx`` + ``table_handle`` instead."""
        out = []
        rows = self.lookup_idx(keys)
        cols = {c: self.table[c] for c in _STORE_COLS}
        for i in rows:
            if i < 0:
                out.append(self._MISS)
            else:
                out.append(
                    (True, cols["status"][i].as_py(),
                     cols["redirect_to"][i].as_py() or "",
                     cols["html"][i].as_py() or b"",
                     cols["ts_us"][i].as_py() or 0,
                     cols["content_type"][i].as_py() or "",
                     cols["headers"][i].as_py() or [])
                )
        return out

    def size(self) -> int:
        return len(self.index)
