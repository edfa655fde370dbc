"""Arrow schemas for the engine's tables.

The docs shape is authoritative per BASELINE.json input_hint:
``doc_id: string, spans: list<struct<kind,text,media_ref,offset:int32>>``
plus provenance columns. The PageRunner stage emits one *union* batch (all
row kinds, nullable superset of columns) that downstream stages split by
``row_kind`` — this keeps fetch+parse+extract fused in a single map_batches
with zero-copy Arrow blocks between stages.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

SPANS_TYPE = pa.list_(SPAN_TYPE)

# row kinds in the PageRunner union output
KIND_EMIT = "emit"       # a docs row
KIND_EXPAND = "expand"   # a frontier candidate (child page / pagination)
KIND_PAGE = "page"       # per-page fetch log row
KIND_DEFER = "defer"     # politeness-deferred frontier row (already deduped)

FRONTIER_FIELDS = [
    ("url", pa.string()),
    ("canon_url", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("host_hash", pa.uint64()),
    ("page_class", pa.string()),
    ("input_json", pa.binary()),
    ("source_spec", pa.binary()),
    ("depth", pa.int32()),
    ("priority", pa.int64()),
    ("order_key", pa.list_(pa.int64())),
    ("order_bytes", pa.binary()),
    ("pre_admitted", pa.bool_()),   # defers skip re-dedup next wave
]

FRONTIER_SCHEMA = pa.schema(FRONTIER_FIELDS)

DOCS_FIELDS = [
    ("doc_id", pa.string()),
    ("spans", SPANS_TYPE),
    ("page_class", pa.string()),
    ("source_url", pa.string()),
    ("order_key", pa.list_(pa.int64())),
    ("order_bytes", pa.binary()),
    ("record_json", pa.binary()),
]

DOCS_SCHEMA = pa.schema(DOCS_FIELDS)

PAGE_LOG_FIELDS = [
    ("page_class", pa.string()),
    ("source_url", pa.string()),
    ("status", pa.string()),     # ok|handled_error|skipped|rejected|error|robots_denied
    ("order_key", pa.list_(pa.int64())),
    ("order_bytes", pa.binary()),
    ("fetch_attempts", pa.int32()),
    ("n_emitted", pa.int32()),
    ("error", pa.string()),
    ("wave", pa.int32()),
]

PAGE_LOG_SCHEMA = pa.schema(PAGE_LOG_FIELDS)

# union: row_kind + all fields (names are disjoint except shared ones which
# carry the same meaning/type everywhere)
_union_fields: dict = {}
for name, typ in [("row_kind", pa.string())] + FRONTIER_FIELDS + DOCS_FIELDS + PAGE_LOG_FIELDS:
    if name in _union_fields:
        assert _union_fields[name] == typ, f"type clash for {name}"
        continue
    _union_fields[name] = typ

UNION_SCHEMA = pa.schema(list(_union_fields.items()))
UNION_COLUMNS = list(_union_fields.keys())


def empty_union_table() -> pa.Table:
    return UNION_SCHEMA.empty_table()


def rows_to_table(rows: list, schema: pa.Schema) -> pa.Table:
    """dict rows -> Arrow table with explicit schema (missing keys -> null)."""
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return pa.Table.from_pydict(cols, schema=schema)
