"""Schema-driven JSON-CSS extraction (reference M26).

Reimplements the reference's JsonCssExtractionStrategy semantics
(/root/reference/crawl4ai/extraction_strategy.py:804-1242): a user schema

    {"name": ..., "baseSelector": "...",
     "fields": [{"name": ..., "selector": "...",
                 "type": "text"|"attribute"|"html"|"regex"|"nested"|"list",
                 "attribute": ..., "pattern": ..., "fields": [...],
                 "default": ...}]}

is walked per base element; output is one JSON object per base element.
Runs as a stateless ``map_batches`` UDF producing a JSON-string column
(dynamic schemas stay out of Arrow blocks — SURVEY.md §1.3).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from .selectors import Node, parse_dom, select


def _extract_field(el: Node, field: dict):
    sel = field.get("selector")
    targets = select(el, sel) if sel else [el]
    ftype = field.get("type", "text")
    if ftype == "list":
        sub = field.get("fields")
        if sub:
            return [
                {f["name"]: _extract_field(t, f) for f in sub}
                for t in targets
            ]
        return [t.text() for t in targets]
    if ftype == "nested":
        if not targets:
            return field.get("default")
        return {
            f["name"]: _extract_field(targets[0], f)
            for f in field.get("fields", [])
        }
    if not targets:
        return field.get("default")
    t = targets[0]
    if ftype == "text":
        value = t.text()
    elif ftype == "attribute":
        value = t.attrs.get(field.get("attribute", ""), field.get("default"))
    elif ftype == "html":
        value = t.html()
    elif ftype == "regex":
        m = re.search(field.get("pattern", ""), t.text())
        value = m.group(1) if (m and m.groups()) else (
            m.group(0) if m else field.get("default")
        )
    else:
        value = t.text()
    if value is None:
        return field.get("default")
    transform = field.get("transform")
    if transform == "lowercase":
        value = value.lower()
    elif transform == "uppercase":
        value = value.upper()
    elif transform == "strip":
        value = value.strip()
    return value


def extract(html: str, schema: dict) -> list[dict]:
    """Extract one dict per baseSelector match."""
    dom = parse_dom(html)
    out = []
    for el in select(dom, schema["baseSelector"]):
        out.append(
            {f["name"]: _extract_field(el, f)
             for f in schema.get("fields", [])}
        )
    return out


class JsonCssExtractor:
    """map_batches stage: html column → exploded (doc_key, item_json) rows."""

    def __init__(self, schema: dict, html_col: str = "html",
                 key_col: str = "url"):
        self.schema = schema
        self.html_col = html_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, items = [], []
        for key, html in zip(batch.column(self.key_col).to_pylist(),
                             batch.column(self.html_col).to_pylist()):
            for obj in extract(html or "", self.schema):
                keys.append(key)
                items.append(json.dumps(obj, ensure_ascii=False,
                                        sort_keys=True))
        return pa.table(
            {
                "doc_key": pa.array(keys),
                "item": pa.array(items, type=pa.string()),
            }
        )
