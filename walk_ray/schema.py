"""Fixed Arrow schemas for every table the engine produces or consumes.

Walk's data model is static Go structs (``/root/reference/lib/request.go:10-18``,
``lib/resource.go:20-56``, ``lib/sitemap.go:122-130``); here each becomes a
declared ``pyarrow.Schema`` — no inference anywhere.
"""

from __future__ import annotations

import pyarrow as pa

# The crawl input table (driver input_hint: Common-Crawl-style pages).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Generator sidecar: HTTP behavior of each url (status / redirect), kept
# out of `pages` so the public shape matches the input_hint exactly.
PAGES_META = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),
        ("redirect_to", pa.string()),
        ("content_type", pa.string()),
        # response headers as walk's flat [k, v, k, v, ...] slice
        # (lib/resource.go:41-43); HeadersMap-style dict via
        # functions.extract.headers_map
        ("headers", pa.list_(pa.string())),
    ]
)

# Frontier entries (walk Request, lib/request.go:10-18).
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("job_id", pa.string()),
        ("status", pa.uint8()),
        ("attempts", pa.int32()),
        ("prev_status", pa.int32()),
        ("fetch_after", pa.float64()),  # virtual-clock seconds
        ("epoch", pa.int32()),
        ("seq", pa.int64()),  # deterministic discovery order
    ]
)

# Request status enum (lib/request.go:21-36).
STATUS_UNKNOWN, STATUS_FETCH, STATUS_QUEUED, STATUS_REQUESTING, STATUS_DONE, STATUS_FAILED = range(6)

# Fetched resources (walk Resource, lib/resource.go:20-56, minus Body by
# default — Meta projection lib/resource.go:69-87).
RESOURCES = pa.schema(
    [
        ("job_id", pa.string()),
        ("url", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("content_sniff", pa.string()),
        ("content_length", pa.int64()),
        ("title", pa.string()),
        ("hash", pa.string()),
        ("links", pa.list_(pa.string())),
        ("text", pa.string()),
        ("redirect_to", pa.string()),
        ("epoch", pa.int32()),
        ("seq", pa.int64()),
    ]
)

# Final request-store contents (conformance golden `url_seen`).
URL_SEEN = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.uint8()),
        ("attempts", pa.int32()),
        ("prev_status", pa.int32()),
    ]
)

# Sitemap entries (walk Entry, lib/sitemap.go:122-130).
SITEMAP = pa.schema(
    [
        ("key", pa.string()),  # normalized URL (badger key, lib/sitemap.go:71-77)
        ("url", pa.string()),
        ("title", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("status", pa.int32()),
        ("links", pa.list_(pa.string())),
    ]
)

# CDXJ-style index (lib/resource_handler.go:157-175, lib/walk.go:20-22).
INDEX = pa.schema(
    [
        ("surt_url", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("url", pa.string()),
        ("hash", pa.string()),
        ("content_length", pa.int64()),
        ("status", pa.int32()),
    ]
)

# Per-epoch crawl metrics.
METRICS = pa.schema(
    [
        ("epoch", pa.int32()),
        ("popped", pa.int64()),
        ("fetched", pa.int64()),
        ("done", pa.int64()),
        ("failed", pa.int64()),
        ("retried", pa.int64()),
        ("links_total", pa.int64()),
        ("links_candidates", pa.int64()),
        ("links_deduped_in_epoch", pa.int64()),
        ("links_new", pa.int64()),
        ("frontier_size", pa.int64()),
        # per-shard queue sizes at epoch end — skew visibility for the
        # host-partitioned frontier (BASELINE.md metrics contract)
        ("frontier_shard_sizes", pa.list_(pa.int64())),
        ("seen_size", pa.int64()),
        ("wall_sec", pa.float64()),
    ]
)
