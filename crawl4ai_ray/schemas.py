"""Arrow schemas for every logical table in the engine.

The reference is row-oriented (Pydantic models, dicts — see
/root/reference/crawl4ai/models.py:129-157). Here every moving piece is a
columnar Arrow table; these schemas are the contract between stages.

The authoritative payload shape comes from BASELINE.json input_hint:
    doc_id:string,
    spans:array<struct<kind:string,text:string,media_ref:string,offset:int32>>
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Span payload (interleaved text + media documents)
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # 'text'|'image'|'video'|'audio'|'link'|'table'
        pa.field("text", pa.string()),       # markdown text for 'text'; alt/desc otherwise
        pa.field("media_ref", pa.string()),  # URL for media/link kinds; '' for text
        pa.field("offset", pa.int32()),      # 0-based source-order position within doc
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("parent", pa.string()),
        pa.field("seq", pa.int64()),          # discovery sequence (crawl-order key)
        pa.field("status", pa.int32()),
        pa.field("success", pa.bool_()),
        pa.field("markdown", pa.large_string()),
        pa.field("title", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("fetch_ms", pa.float32()),
        pa.field("parse_ms", pa.float32()),
    ]
)

# The minimal BASELINE shape (what external consumers read):
INTERLEAVED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ---------------------------------------------------------------------------
# Frontier (the central dataset; reference keeps this as in-process lists /
# priority queues — bfs_strategy.py:154, bff_strategy.py:141-143)
# ---------------------------------------------------------------------------

FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),         # canonical URL (functions.urlkit.canonicalize)
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("host_hash", pa.uint32()),
        pa.field("depth", pa.int32()),
        pa.field("score", pa.float32()),
        pa.field("parent", pa.string()),
        pa.field("seq", pa.int64()),          # global discovery sequence
    ]
)

LINKS_STRUCT = pa.struct(
    [
        pa.field("href", pa.string()),        # canonicalized absolute URL
        pa.field("text", pa.string()),
        pa.field("title", pa.string()),
        pa.field("internal", pa.bool_()),
    ]
)

# ---------------------------------------------------------------------------
# Bookkeeping tables (reference: CrawlStats models.py:45-76, adaptive state)
# ---------------------------------------------------------------------------

LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("superstep", pa.int32()),
        pa.field("partition", pa.int32()),
        pa.field("frontier_in", pa.int64()),
        pa.field("fetched", pa.int64()),
        pa.field("skipped_seen", pa.int64()),
        pa.field("skipped_filtered", pa.int64()),
        pa.field("deferred", pa.int64()),
        pa.field("discovered", pa.int64()),
        pa.field("fetch_ms_sum", pa.float64()),
        pa.field("parse_ms_sum", pa.float64()),
    ]
)

SEEN_SHARD_SCHEMA = pa.schema(
    [
        pa.field("shard", pa.int32()),
        pa.field("superstep", pa.int32()),
        pa.field("filter_blob", pa.large_binary()),   # serialized cuckoo filter
        pa.field("exact_hashes", pa.large_binary()),  # uint64 ndarray bytes (ground truth)
    ]
)

SYNTHETIC_WEB_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("html", pa.large_string()),
        pa.field("status", pa.int32()),
        pa.field("latency_ms", pa.int32()),
    ]
)
