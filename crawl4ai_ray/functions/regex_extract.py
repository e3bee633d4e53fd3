"""Regex entity extraction — the reference's zero-LLM extraction strategy
(/root/reference/crawl4ai/extraction_strategy.py:1678-1975) as a stateful
map_batches stage: patterns compiled once per actor/closure, each batch of
text rows exploded into ``{doc_id, label, value, start, end}`` rows.
"""

from __future__ import annotations

import re

import pyarrow as pa

# Built-in catalog, same labels/patterns as the reference DEFAULT_PATTERNS
# (extraction_strategy.py:1784-1812).
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+\.[\w.-]+",
    "phone_intl": r"\+?\d[\d .()-]{7,}\d",
    "phone_us": r"\(?\d{3}\)?[ -. ]?\d{3}[ -. ]?\d{4}",
    "url": r"https?://[^\s\"'<>]+",
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "ipv6": r"[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    "uuid": r"[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    "currency": r"(?:USD|EUR|RM|\$|€|£)\s?\d+(?:[.,]\d{2})?",
    "percentage": r"\d+(?:\.\d+)?%",
    "number": r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
    "date_us": r"\d{1,2}/\d{1,2}/\d{2,4}",
    "time_24h": r"\b(?:[01]?\d|2[0-3]):[0-5]\d(?:[:.][0-5]\d)?\b",
    "postal_us": r"\b\d{5}(?:-\d{4})?\b",
    "postal_uk": r"\b[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}\b",
    "html_color_hex": r"#[0-9A-Fa-f]{6}\b",
    "twitter_handle": r"@[\w]{1,15}",
    "hashtag": r"#[\w-]+",
    "mac_addr": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban": r"[A-Z]{2}\d{2}[A-Z0-9]{11,30}",
    "credit_card": r"\b(?:4\d{12}(?:\d{3})?|5[1-5]\d{14}|3[47]\d{13}|6(?:011|5\d{2})\d{12})\b",
}

_FLAGS = re.IGNORECASE | re.MULTILINE


class RegexExtractor:
    """Callable class for ``map_batches`` (actor pool or task closure):
    compile once in ``__init__``, explode matches per batch.

    Input batch: ``id_col`` + ``text_col``. Output rows:
    (doc_id, label, value, start, end) — the reference's result shape
    (extraction_strategy.py:1713-1720) with span split into two int32s.
    """

    def __init__(self, labels=None, custom: dict | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        pats = {}
        if labels is None and custom is None:
            pats = dict(DEFAULT_PATTERNS)
        else:
            for lbl in labels or []:
                pats[lbl] = DEFAULT_PATTERNS[lbl]
            pats.update(custom or {})
        self.patterns = [(lbl, re.compile(p, _FLAGS)) for lbl, p in pats.items()]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_label, out_value, out_start, out_end = [], [], [], [], []
        for did, text in zip(ids, texts):
            if not text:
                continue
            for label, rx in self.patterns:
                for m in rx.finditer(text):
                    out_id.append(did)
                    out_label.append(label)
                    out_value.append(m.group(0))
                    out_start.append(m.start())
                    out_end.append(m.end())
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "label": pa.array(out_label, type=pa.string()),
                "value": pa.array(out_value, type=pa.string()),
                "start": pa.array(out_start, type=pa.int32()),
                "end": pa.array(out_end, type=pa.int32()),
            }
        )
