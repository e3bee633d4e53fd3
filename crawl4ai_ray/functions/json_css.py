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

from .selectors import Node, css_to_xpath, parse_dom, select, xpath_select


def _extract_field(el: Node, field: dict, sel_fn=select):
    sel = field.get("selector")
    targets = sel_fn(el, sel) if sel else [el]
    ftype = field.get("type", "text")
    if ftype == "list":
        sub = field.get("fields")
        if sub:
            return [
                {f["name"]: _extract_field(t, f, sel_fn) for f in sub}
                for t in targets
            ]
        return [t.text() for t in targets]
    if ftype == "nested":
        if not targets:
            return field.get("default")
        return {
            f["name"]: _extract_field(targets[0], f, sel_fn)
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
    """Extract one dict per baseSelector match (CSS selectors)."""
    dom = parse_dom(html)
    out = []
    for el in select(dom, schema["baseSelector"]):
        out.append(
            {f["name"]: _extract_field(el, f)
             for f in schema.get("fields", [])}
        )
    return out


def _xpath_sel(el: Node, sel: str):
    return xpath_select(el, css_to_xpath(sel))


def extract_xpath(html: str, schema: dict) -> list[dict]:
    """XPath variant of ``extract`` — the reference's
    JsonXPathExtractionStrategy (extraction_strategy.py:1612-1674): same
    schema walk, selectors evaluated as XPath (with the reference's naive
    CSS→XPath passthrough for selectors without '/')."""
    dom = parse_dom(html)
    out = []
    for el in xpath_select(dom, css_to_xpath(schema["baseSelector"])):
        out.append(
            {f["name"]: _extract_field(el, f, _xpath_sel)
             for f in schema.get("fields", [])}
        )
    return out


class JsonCssExtractor:
    """map_batches stage: html column → exploded (doc_key, item_json) rows.

    ``flavor="xpath"`` switches the selector engine to the XPath variant
    (JsonXPathExtractionStrategy parity)."""

    def __init__(self, schema: dict, html_col: str = "html",
                 key_col: str = "url", flavor: str = "css"):
        self.schema = schema
        self.html_col = html_col
        self.key_col = key_col
        self._extract = extract_xpath if flavor == "xpath" else extract

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, items = [], []
        for key, html in zip(batch.column(self.key_col).to_pylist(),
                             batch.column(self.html_col).to_pylist()):
            for obj in self._extract(html or "", self.schema):
                keys.append(key)
                items.append(json.dumps(obj, ensure_ascii=False,
                                        sort_keys=True))
        return pa.table(
            {
                "doc_key": pa.array(keys),
                "item": pa.array(items, type=pa.string()),
            }
        )
