"""Extract stage: fetched rows → resource rows (body dropped).

Stateless ``map_batches`` kernel applying the extraction kernels
(``walk_ray.functions.extract``) to terminal fetch rows; redirect-hop
and error rows pass through with empty extraction, mirroring walk
where only ``HandleResponse`` parses bodies
(``/root/reference/lib/resource.go:89-134``).

The ``html`` column is dropped here — bodies never cross a shuffle
(SURVEY §7.4 hard part 5); the body hash and extracted text ride on.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extract import extract_batch

__all__ = ["extract_resources", "RESOURCE_STAGE_SCHEMA"]

RESOURCE_STAGE_SCHEMA = pa.schema(
    [
        ("job_id", pa.string()),
        ("url", pa.string()),
        ("orig_url", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("headers", pa.list_(pa.string())),
        ("content_sniff", pa.string()),
        ("content_length", pa.int64()),
        ("title", pa.string()),
        ("hash", pa.string()),
        ("links", pa.list_(pa.string())),
        ("text", pa.string()),
        ("redirect_to", pa.string()),
        ("redirect_from", pa.string()),
        ("error", pa.string()),
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


def extract_resources(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = batch.num_rows
    ctypes = batch["content_type"].to_pylist() if "content_type" in batch.column_names else [""] * n

    # only terminal, non-error rows get body extraction; the common
    # case (every row terminal and clean) skips the per-row gather
    mask = pc.and_(
        pc.invert(batch["is_hop"].combine_chunks()),
        pc.fill_null(pc.equal(batch["error"], ""), True),
    )
    if pc.all(mask).as_py() is True:
        idxs = None
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        ext = extract_batch(urls, htmls)
    else:
        m = mask.to_pylist()
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        idxs = [i for i in range(n) if m[i]]
        ext = extract_batch([urls[i] for i in idxs], [htmls[i] for i in idxs])
    pos = None if idxs is None else {i: j for j, i in enumerate(idxs)}

    def pick(field, default):
        if pos is None:
            return ext[field]
        return [ext[field][pos[i]] if i in pos else default for i in range(n)]

    cols = {
        "job_id": batch["job_id"],
        "url": batch["url"],
        "orig_url": batch["orig_url"],
        "status": batch["status"],
        "content_type": pa.array(ctypes, pa.string()),
        "headers": batch["headers"],
        "content_sniff": pa.array(pick("content_sniff", ""), pa.string()),
        "content_length": pa.array(pick("content_length", 0), pa.int64()),
        "title": pa.array(pick("title", ""), pa.string()),
        "hash": pa.array(pick("hash", ""), pa.string()),
        "links": pa.array(pick("links", []), pa.list_(pa.string())),
        "text": pa.array(pick("text", ""), pa.string()),
        "redirect_to": batch["redirect_to"],
        "redirect_from": batch["redirect_from"],
        "error": batch["error"],
        "timestamp": batch["timestamp"],
        "epoch": batch["epoch"],
        "seq": batch["seq"],
        "parent_seq": batch["parent_seq"],
        "link_idx": batch["link_idx"],
        "attempts": batch["attempts"],
        "fetch_after": batch["fetch_after"],
        "is_hop": batch["is_hop"],
    }
    return pa.table(cols, schema=RESOURCE_STAGE_SCHEMA)
