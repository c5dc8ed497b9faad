"""Offline query layer over crawl outputs — walk's read model
re-expressed as small Dataset programs.

- :func:`build_index` — CDXJ-style index sorted by SURT URL
  (``/root/reference/lib/walk.go:20-22,130-152``,
  ``lib/resource_handler.go:157-175``).
- :func:`inbound_links` — ``walk inbound-links`` reverse semi-join
  (``cmd/inbound_links.go:14-87``).
- :func:`link_graph` — full inverted link graph (J5 generalization):
  ``flat_map(links) → groupby(dst)``.
- :func:`clean_sitemap` — ``walk clean`` filter + counts
  (``cmd/clean.go:20-107``).
- :func:`latest_capture` — Collection as-of lookup: latest resource
  per URL at/before a time (``lib/collection.go:75-92``,
  ``lib/walk.go:167-210``).
- :func:`resolve_redirects` — iterative redirect-chain resolution,
  ≤20 hops (``api/collection_handlers.go:164-187``).
- :func:`timespan` — min/max capture timestamp (``lib/walk.go:66-76``).
- :func:`union_walks` — Collection over several crawl roots
  (``lib/collection.go:26-55``).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from ..functions.canon import normalize_url, surt_key

__all__ = [
    "build_index",
    "sorted_index",
    "inbound_links",
    "link_graph",
    "clean_sitemap",
    "latest_capture",
    "resolve_redirects",
    "timespan",
    "union_walks",
    "get_body",
    "get_capture",
]


def _read_resources(resources_dir, columns=None):
    import ray.data as rd

    return rd.read_parquet(resources_dir, columns=columns)


def build_index(resources_dir):
    """Resources → index Dataset sorted by SURT url (global sort —
    the only wide step; rows are narrow metadata). Accepts a resources
    dir or an already-loaded Dataset (e.g. a collection union)."""
    if hasattr(resources_dir, "map_batches"):
        ds = resources_dir.select_columns(
            ["url", "timestamp", "hash", "content_length", "status"]
        )
    else:
        ds = _read_resources(
            resources_dir, columns=["url", "timestamp", "hash", "content_length", "status"]
        )

    def add_surt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "surt_url", pa.array([surt_key(u) for u in batch["url"].to_pylist()], pa.string())
        )

    return ds.map_batches(add_surt, batch_format="pyarrow").sort("surt_url")


def sorted_index(resources_dir: str, limit: int = -1, offset: int = 0):
    """Paginated SortedIndex (walk Walk.SortedIndex(limit, offset),
    lib/walk.go:89-109,130-152): SURT-sorted index rows [offset,
    offset+limit). offset via split_at_indices (no full materialize);
    limit -1 = everything after offset."""
    ds = build_index(resources_dir)
    if offset > 0:
        ds = ds.split_at_indices([offset])[1]
    if limit >= 0:
        ds = ds.limit(limit)
    return ds


def inbound_links(sitemap_or_resources, target_url: str):
    """URLs of pages whose links contain the (normalized) target.

    Accepts a resources dir or an already-loaded Dataset with
    ``url``/``links`` columns. The scan is a vectorized flat_map +
    filter, not walk's driver-side linear scan.
    """
    import ray.data as rd

    ds = (
        sitemap_or_resources
        if hasattr(sitemap_or_resources, "map_batches")
        else rd.read_parquet(sitemap_or_resources, columns=["url", "links"])
    )
    target = normalize_url(target_url)

    def scan(batch: pa.Table) -> pa.Table:
        out = []
        for u, links in zip(batch["url"].to_pylist(), batch["links"].to_pylist()):
            if links and target in links:
                out.append(u)
        return pa.table({"url": pa.array(out, pa.string())})

    return ds.map_batches(scan, batch_format="pyarrow")


def link_graph(resources_dir: str):
    """Inverted link graph: (dst, list<src>, n_inbound) via flat_map +
    a BUCKETED groupby — targets co-partition into 64 hash buckets and
    every dst in a bucket collects in one vectorized pandas pass, so
    group overhead is independent of URL cardinality."""
    import hashlib as _hl

    ds = _read_resources(resources_dir, columns=["url", "links"])

    def edges(batch: pa.Table) -> pa.Table:
        srcs, dsts, buckets = [], [], []
        for u, links in zip(batch["url"].to_pylist(), batch["links"].to_pylist()):
            for l in links or []:
                srcs.append(u)
                dsts.append(l)
                buckets.append(
                    int.from_bytes(_hl.blake2b(l.encode(), digest_size=4).digest(), "big") % 64
                )
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string()),
                         "bucket": pa.array(buckets, pa.int64())})

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["dst", "src"]).sort_values(["dst", "src"], kind="mergesort")
        agg = g.groupby("dst", as_index=False).agg(srcs=("src", list),
                                                   n_inbound=("src", "size"))
        return agg[["dst", "srcs", "n_inbound"]]

    return (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(collect, batch_format="pandas")
    )


def clean_sitemap(sitemap_path: str, out_path: str, remove_prefixes: list[str]) -> dict:
    """walk clean: drop entries whose KEY starts with any prefix;
    rewrite JSON; report counts (cmd/clean.go:39-95)."""
    import json

    with open(sitemap_path) as f:
        sm = json.load(f)
    total = len(sm)
    kept = {
        k: v for k, v in sm.items() if not any(k.startswith(p) for p in remove_prefixes)
    }
    from .sitemap import write_sitemap_json

    entries = []
    for k in sorted(kept):
        v = kept[k]
        from datetime import datetime, timezone

        ts = datetime.fromisoformat(v["timestamp"].replace("Z", "+00:00"))
        entries.append(
            {
                "key": k,
                "url": v["url"],
                "title": v.get("title", ""),
                "timestamp": int(ts.timestamp() * 1_000_000),
                "status": v.get("status", 0),
                "links": v.get("links"),
            }
        )
    write_sitemap_json(entries, out_path)
    return {"total": total, "removed": total - len(kept), "kept": len(kept)}


def latest_capture(resources_dirs, at=None):
    """As-of join J3: per URL, the resource with max timestamp ≤ ``at``
    (None = latest overall) across one or more walks."""
    ds = union_walks(resources_dirs)
    if at is not None:
        at64 = pa.scalar(at, pa.timestamp("us"))

        def cut(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.less_equal(batch["timestamp"], at64))

        ds = ds.map_batches(cut, batch_format="pyarrow")

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _hl

        batch = batch.copy()
        batch["__bucket"] = [
            int.from_bytes(_hl.blake2b(u.encode(), digest_size=4).digest(), "big") % 64
            for u in batch["url"]
        ]
        return batch

    def argmax_ts(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per bucket: latest row of every url run
        g = g.sort_values(["url", "timestamp", "epoch", "seq"], kind="mergesort")
        return g.drop_duplicates("url", keep="last").drop(columns="__bucket")

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(argmax_ts, batch_format="pandas")
    )


def resolve_redirects(resources_dir: str, url: str, max_hops: int = 20) -> str:
    """Follow recorded RedirectTo links ≤20 hops
    (api/collection_handlers.go:164-187). Point query: loads only the
    redirect edges (two narrow columns)."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(resources_dir, columns=["url", "redirect_to", "is_hop"])
    edges = {
        u: r
        for u, r, h in zip(
            t["url"].to_pylist(), t["redirect_to"].to_pylist(), t["is_hop"].to_pylist()
        )
        if h and r
    }
    cur = normalize_url(url)
    for _ in range(max_hops):
        nxt = edges.get(cur)
        if not nxt:
            return cur
        cur = nxt
    return cur


def timespan(resources_dir: str) -> tuple:
    """Walk timespan A4 (lib/walk.go:66-76)."""
    from ray.data.aggregate import Max, Min

    ds = _read_resources(resources_dir, columns=["timestamp"])
    row = ds.aggregate(Min("timestamp"), Max("timestamp"))
    return row["min(timestamp)"], row["max(timestamp)"]


def get_body(bodies_dir: str, content_hash: str) -> bytes | None:
    """Content-addressed body lookup (the read side of the BodyStage
    sink): hash → html bytes via a predicate-pushdown parquet read of
    ``bodies/epoch-*/part-*.parquet`` — only row groups containing the
    hash are decoded (walk reads ``body/<hash[:2]>/<hash[2:]>``,
    lib/walk.go:156-210)."""
    import glob as _glob

    import pyarrow.parquet as pq_

    paths = sorted(_glob.glob(os.path.join(bodies_dir, "**", "*.parquet"), recursive=True))
    if not paths:
        return None
    t = pq_.read_table(paths, filters=[("hash", "==", content_hash)], columns=["html"])
    if t.num_rows == 0:
        return None
    return bytes(t["html"][0].as_py())


def get_capture(resources_dirs, url: str, at=None, bodies_dir: str = "",
                resolve: bool = False, max_hops: int = 20) -> dict | None:
    """Walk ``Get(url, t)`` (lib/walk.go:167-210 +
    api/collection_handlers.go:95-218): the latest capture of a
    (normalized) URL at/before ``at``, as a meta dict, optionally with
    the stored body attached (``bodies_dir``) and redirects resolved
    (≤ ``max_hops``, api maxRedirects).

    Point query: reads only the target URL's rows via parquet
    predicate pushdown — never the full resources table.
    """
    import pyarrow.parquet as pq_

    if isinstance(resources_dirs, str):
        resources_dirs = [resources_dirs]
    cur = normalize_url(url)
    for _ in range(max_hops + 1):
        tables = []
        for d in resources_dirs:
            t = pq_.read_table(d, filters=[("url", "==", cur)])
            if t.num_rows:
                tables.append(t)
        if not tables:
            return None
        t = pa.concat_tables(tables)
        rows = t.to_pylist()
        if at is not None:
            rows = [r for r in rows if r["timestamp"] <= at]
            if not rows:
                return None
        # latest capture; ties broken by (epoch, seq) like latest_capture
        rows.sort(key=lambda r: (r["timestamp"], r["epoch"], r["seq"]))
        r = rows[-1]
        if resolve and r.get("redirect_to"):
            cur = r["redirect_to"]
            continue
        if bodies_dir and r.get("hash"):
            # a collection capture's body may live in ANY member
            # walk's bodies store — search each (first hit wins; the
            # store is content-addressed so all hits are identical)
            dirs = [bodies_dir] if isinstance(bodies_dir, str) else list(bodies_dir)
            for d in dirs:
                body = get_body(d, r["hash"])
                if body is not None:
                    r["body"] = body
                    break
        return r
    raise ValueError(f"max {max_hops} redirects exceeded")


def union_walks(resources_dirs):
    """Collection reader S5/D5: union of several crawl outputs."""
    import ray.data as rd

    if isinstance(resources_dirs, str):
        resources_dirs = [resources_dirs]
    parts = [rd.read_parquet(d) for d in resources_dirs]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
