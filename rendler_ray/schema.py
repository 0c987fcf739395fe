"""Arrow schemas for every table the engine produces or consumes.

The data model (SURVEY.md §1.2, BASELINE.json ``input_hint``): the primary
input is a table of interleaved text+media documents

    docs: doc_id: string,
          spans:  list<struct<kind: string, text: string,
                              media_ref: string, offset: int32>>

The per-row invariant every pipeline must preserve is span-sequence
equality — (kind, text, media_ref, order) per doc_id.

Reference data shapes these replace (mesosphere/RENDLER, SURVEY.md §1.1):
URL work-items (``python/rendler.py`` task data), CrawlResult
(``python/results.py``: taskId/url/links), RenderResult (url/imageUrl),
and the scheduler-memory edge set / render map — all become columnar
Arrow tables flowing between ``map_batches`` stages.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "image" | ...
        pa.field("text", pa.string()),       # non-empty iff kind == "text"
        pa.field("media_ref", pa.string()),  # non-empty iff kind != "text"
        pa.field("offset", pa.int32()),      # monotonically increasing per doc
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),     # doubles as the page URL
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

SEEDS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("priority", pa.float32()),
        pa.field("added_at", pa.int64()),
    ]
)

# Per-round crawl frontier (FIXTURES.md F3). ``seq`` is the global crawl
# order (dense, assigned when the round frontier is built); sort key
# (depth, seq) reproduces the reference's FIFO discovery order.
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("canon_url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("seq", pa.int64()),
    ]
)

# Crawl-graph edges (conformance artifact #1). ``ord`` = link position in
# the source page, ``src_seq`` = crawl order of the source page.
EDGES_SCHEMA = pa.schema(
    [
        pa.field("src", pa.string()),
        pa.field("dst", pa.string()),
        pa.field("ord", pa.int32()),
        pa.field("src_seq", pa.int64()),
        pa.field("depth", pa.int32()),
    ]
)

# Fetch results: the document content travels as its span sequence
# (zero-copy from the web shard), preserving the per-row invariant.
FETCH_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("seq", pa.int64()),
        pa.field("status", pa.int32()),      # 200 | 404
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Render output (conformance artifact #2). The sandbox "render" is a
# deterministic canonical serialization of the full span sequence,
# standing in for the reference's PhantomJS PNG (SURVEY.md §2.1 S3).
RENDERS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("image", pa.large_binary()),
        pa.field("rendered_round", pa.int32()),
    ]
)

ROBOTS_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("robots_txt", pa.string()),
        pa.field("crawl_delay_ms", pa.int32()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
