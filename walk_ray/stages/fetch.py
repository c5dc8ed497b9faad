"""Fetch stage: frontier rows → raw fetched-resource rows.

A ``map_batches`` callable class (actor pool). Each batch of popped
frontier entries is resolved against the partitioned ``PageStore``
actors (grouped RPC per touched partition, per redirect round).

Faithful to walk's worker/mux/redirect-client semantics
(``/root/reference/lib/worker.go:126-228``):

- with ``record_redirects`` (reference default), the produced resource
  is attributed to the NORMALIZED final URL (``lib/worker.go:146``),
  each followed redirect emits a synthetic resource
  ``{url: norm(prev), redirect_to: norm(next), status}`` (only when the
  two normalize differently, ``lib/worker.go:215-224``), and the chain
  errors once 10 requests are on the chain (``lib/worker.go:222-224``)
  producing a URL-less error resource (``lib/worker.go:131-136``);
- without it, the resource keeps the raw requested URL;
- a miss behaves like Go's ``http.FileServer``: 404 with body
  ``404 page not found\n``;
- timestamps come from the page's ``warc_ts`` (vs walk's
  ``time.Now()``, ``lib/resource.go:110``) for determinism.

Output rows carry the request bookkeeping (attempts, epoch, seq,
discovery key) the downstream dequeue stage needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.canon import normalize_url
from ..sources.pages import partition_of, request_key

__all__ = ["FetchStage", "FETCHED_SCHEMA"]

_404_BODY = b"404 page not found\n"
_BASE_TS_US = 1_514_764_800_000_000

# worker-process-level page-table cache (see FetchStage._part_table)
_PART_TABLE_CACHE: dict = {}

FETCHED_SCHEMA = pa.schema(
    [
        ("job_id", pa.string()),
        ("url", pa.string()),
        ("orig_url", pa.string()),
        ("status", pa.int32()),
        ("redirect_to", pa.string()),
        ("redirect_from", pa.string()),
        ("content_type", pa.string()),
        ("headers", pa.list_(pa.string())),
        ("error", pa.string()),
        ("html", pa.large_binary()),
        ("timestamp", pa.timestamp("us")),
        ("epoch", pa.int32()),
        ("seq", pa.int64()),
        ("parent_seq", pa.int64()),
        ("link_idx", pa.int32()),
        ("attempts", pa.int32()),
        ("fetch_after", pa.float64()),
        ("is_hop", pa.bool_()),
    ]
)


class FetchStage:
    def __init__(self, store_handles: list, record_redirects: bool = True,
                 record_headers: bool = False):
        import ray  # noqa: F401  (actor handles already materialized)

        self.stores = store_handles
        self.n_parts = len(store_handles)
        self.record_redirects = record_redirects
        # walk RecordResponseHeaders (lib/config.go:147,173-174,
        # lib/resource.go:104-107): default-off flat [k,v,...] capture
        # on terminal responses only (hop resources are synthesized
        # without headers, lib/worker.go:215-224)
        self.record_headers = record_headers
        self._tables: dict[int, pa.Table] = {}  # per-task plasma-backed cache

    # Go's FileServer 404 miss row (see PageStore._MISS)
    _MISS = (False, 404, "", b"", 0, "text/plain; charset=utf-8",
             ["Content-Type", "text/plain; charset=utf-8"])

    def _part_table(self, p: int):
        """Zero-copy plasma read of partition ``p``'s page table,
        cached for this WORKER PROCESS. The stage object is
        re-deserialized for every plain epoch task, so an
        instance-level cache would re-pay the handle RPC + plasma get
        each task (~38s of a 640k-page crawl's profile); the
        module-level LRU keyed by (actor id, partition) survives
        across tasks on the same worker. Table buffers mmap from the
        local object store either way — the cache holds references,
        not copies."""
        import ray

        t = self._tables.get(p)
        if t is None:
            store = self.stores[p]
            aid = getattr(store, "_actor_id", None)
            key = (aid.hex() if aid is not None else id(store), p)
            t = _PART_TABLE_CACHE.get(key)
            if t is None:
                t = ray.get(ray.get(store.table_handle.remote()))
                _PART_TABLE_CACHE[key] = t
                while len(_PART_TABLE_CACHE) > 64:
                    _PART_TABLE_CACHE.pop(next(iter(_PART_TABLE_CACHE)))
            self._tables[p] = t
        return t

    def _lookup(self, urls: list[str]):
        """Grouped batch lookup across page partitions: the actor RPC
        carries only request keys out and ROW INDICES back; page rows
        (bodies included) come from the shared object-store table via
        ``take`` — the fetch path's data never crosses an actor
        serializer."""
        import ray

        from ..state.seen import url_hash64_batch

        keys = [request_key(u) for u in urls]
        # hash the keys directly — partition_of would recompute
        # request_key per URL (it was ~7% of chunk time, duplicated)
        parts = (url_hash64_batch(keys) % np.uint64(self.n_parts)).astype(np.int64)
        by_part: dict[int, list[int]] = {}
        for i, p in enumerate(parts):
            by_part.setdefault(int(p), []).append(i)
        results: list = [None] * len(urls)
        futures = {
            p: self.stores[p].lookup_idx.remote([keys[i] for i in idxs])
            for p, idxs in by_part.items()
        }
        for p, idxs in by_part.items():
            rows = ray.get(futures[p])
            tbl = self._part_table(p)
            hit_pos = [j for j, r in enumerate(rows) if r >= 0]
            if hit_pos:
                sub = tbl.take(pa.array([rows[j] for j in hit_pos], pa.int64()))
                statuses = sub["status"].to_pylist()
                redirects = sub["redirect_to"].to_pylist()
                htmls = sub["html"].to_pylist()
                tss = sub["ts_us"].to_pylist()
                ctypes = sub["content_type"].to_pylist()
                headers = sub["headers"].to_pylist()
            k = 0
            for j, r in zip(idxs, rows):
                if r < 0:
                    results[j] = self._MISS
                else:
                    results[j] = (True, statuses[k], redirects[k] or "",
                                  htmls[k] or b"", tss[k] or 0, ctypes[k] or "",
                                  headers[k] or [])
                    k += 1
        return results

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: batch[c].to_pylist() for c in batch.column_names}
        out: list[dict] = []

        # iterative redirect-follow: rounds of grouped lookups
        active = list(range(n))
        current = list(cols["url"])
        hop_counts = [0] * n
        last_prev = [""] * n  # normalized URL of the request that caused the current one
        while active:
            rows = self._lookup([current[i] for i in active])
            next_active = []
            for idx, (found, status, redirect_to, html, ts_us, content_type,
                      hdrs) in zip(active, rows):
                req = {
                    "job_id": cols["job_id"][idx],
                    "orig_url": cols["url"][idx],
                    "epoch": cols["epoch"][idx],
                    "seq": cols["seq"][idx],
                    "parent_seq": cols["parent_seq"][idx],
                    "link_idx": cols["link_idx"][idx],
                    "attempts": cols["attempts"][idx],
                    "fetch_after": cols["fetch_after"][idx],
                }
                ts = ts_us or _BASE_TS_US
                is_redirect = found and redirect_to and 300 <= status < 400
                if is_redirect and self.record_redirects:
                    prev_norm = normalize_url(current[idx])
                    next_norm = normalize_url(redirect_to)
                    if prev_norm != next_norm:
                        out.append(
                            dict(
                                req,
                                url=prev_norm,
                                status=status,
                                redirect_to=next_norm,
                                redirect_from="",
                                content_type="",
                                headers=[],
                                error="",
                                html=b"",
                                timestamp=ts,
                                is_hop=True,
                            )
                        )
                    if hop_counts[idx] + 1 >= 10:
                        out.append(
                            dict(
                                req,
                                url="",
                                status=0,
                                redirect_to="",
                                redirect_from="",
                                content_type="",
                                headers=[],
                                # Go's net/http wraps the CheckRedirect
                                # error in a url.Error carrying the URL
                                # of the attempted (target) request, not
                                # the original one (lib/worker.go:222-224)
                                error=f'Get "{redirect_to}": stopped after 10 redirects',
                                html=b"",
                                timestamp=ts,
                                is_hop=False,
                            )
                        )
                        continue
                    hop_counts[idx] += 1
                    last_prev[idx] = prev_norm
                    current[idx] = redirect_to
                    next_active.append(idx)
                    continue
                if is_redirect:
                    # non-recording client still follows silently
                    if hop_counts[idx] + 1 >= 10:
                        out.append(
                            dict(req, url=cols["url"][idx], status=0, redirect_to="",
                                 redirect_from="", content_type="", headers=[],
                                 error="stopped after 10 redirects",
                                 html=b"", timestamp=ts, is_hop=False)
                        )
                        continue
                    hop_counts[idx] += 1
                    current[idx] = redirect_to
                    next_active.append(idx)
                    continue

                # terminal response
                body = html if found else _404_BODY
                if self.record_redirects:
                    url_attr = normalize_url(current[idx])
                    # walk records the immediately-previous hop's URL
                    # (res.Request.Response.Request.URL, lib/worker.go:148-151)
                    redirect_from = last_prev[idx] if hop_counts[idx] > 0 else ""
                else:
                    url_attr = cols["url"][idx]
                    redirect_from = ""
                out.append(
                    dict(
                        req,
                        url=url_attr,
                        status=status if found else 404,
                        redirect_to="",
                        redirect_from=redirect_from,
                        content_type=content_type,
                        headers=list(hdrs) if self.record_headers else [],
                        error="",
                        html=bytes(body),
                        timestamp=ts,
                        is_hop=False,
                    )
                )
            active = next_active

        if not out:
            return FETCHED_SCHEMA.empty_table()
        arrays = {
            f.name: pa.array([r[f.name] for r in out], f.type) for f in FETCHED_SCHEMA
        }
        return pa.table(arrays, schema=FETCHED_SCHEMA)
