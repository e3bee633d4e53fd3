"""LLM table extraction: chunking + merge laws (A5 family).

Behavioral port of the reference's ``LLMTableExtraction`` strategy
(reference table_extraction.py:320-1396).  Everything around the model
call is real, law-for-law data-plane logic; the completion itself is
behind a pluggable client (same policy as ``FakeLLMClient`` /
``FakeCodec`` — no network, no model weights in this environment).

Laws replicated from the reference (file:line cites):

- token estimation  (:892-906) — ``len(text) // 4`` (the tiktoken path
  only engages for ``gpt`` providers; absent here, so the documented
  4-chars-per-token fallback is the law).
- chunk decision    (:908-921) — chunk iff estimated tokens strictly
  exceed ``chunk_token_threshold``.
- table structure   (:923-982) — first ``<table>`` only; headers from
  ``<thead>`` else the *leading* run of ``<tr>`` containing ``<th>``;
  footers from ``<tfoot>``; body from ``<tbody>`` else the slice
  ``all_rows[header_count : -footer_count or None]``; QUIRK kept: when
  there are no headers and no ``<tbody>``, body = ALL rows, so footer
  rows appear twice in the row stream.
- smart chunks      (:984-1054) — greedy accumulation by estimated
  tokens; the header HTML is re-counted into every chunk; a chunk
  always holds >= 1 row (the threshold check requires a non-empty
  chunk before flushing); footer only in the last chunk; QUIRK kept:
  ``_rebalance_chunks`` is a documented no-op (:1076-1083), so
  ``min_rows_per_chunk`` never actually merges small chunks.
- chunk HTML        (:1056-1074) — ``<table>`` + header + ``<tbody>``
  rows ``</tbody>`` + footer + ``</table>``.
- chunk prompt      (:1085-1106) — "part i+1 of N" context and the
  NO-headers instruction when the table has no header rows.
- response unwrap   (:816-836, 1131-1147) — unwrap ``result`` >
  ``tables`` > ``data`` wrapper keys in that order, wrap a bare dict,
  then flatten single-element nested lists.
- merge law         (:1172-1206) — sort by chunk_index, drop failed
  chunks, shallow-copy the FIRST chunk's table (its headers win),
  concatenate rows from all valid chunks, set
  ``row_count``/``chunked``/``chunk_count`` metadata.
- validation        (:1304-1351) — flatten nested headers/rows,
  require list-of-lists rows.
- format law        (:1353-1396) — defaults for caption/summary,
  derived metadata, and row padding/truncation to the header width
  (only when there is at least one header).
- CSS selection     (:1259-1302) — the reference's "basic conversion"
  accepts only ``#id`` / ``.class`` / ``tag.class`` / ``tag#id`` /
  ``tag``; class matching is substring-``contains`` (not token) —
  replicated directly over our DOM.
- prompt escaping   (utils.py:751-773) — ``sanitize_html`` escapes
  double and single quotes before embedding HTML into the prompt.

The stub client, ``FakeTableLLMClient``, deterministically "answers"
the extraction prompt by grid-expanding the embedded table HTML
(rowspan/colspan duplication — the behavior the prompt instructs,
:380-431) and honors the no-headers chunk instruction.  It wraps its
answer under a ``{"tables": [...]}`` key so the unwrap law is
exercised end to end.
"""

from __future__ import annotations

import json
import re
from concurrent.futures import ThreadPoolExecutor, as_completed

import pyarrow as pa

from .llm_extract import LLMResponse, TokenUsage
from .selectors import Node, parse_dom

__all__ = [
    "LLMTableExtraction",
    "FakeTableLLMClient",
    "LLMTableExtractStage",
    "llm_extract_tables",
    "estimate_tokens",
    "sanitize_html",
]


def estimate_tokens(text: str) -> int:
    """Reference table_extraction.py:892-906 fallback: 1 token ~ 4 chars."""
    return len(text) // 4


def sanitize_html(html: str) -> str:
    """Reference utils.py:751-773 — escape double then single quotes."""
    return html.replace('"', '\\"').replace("'", "\\'")


def _unsanitize_html(html: str) -> str:
    return html.replace('\\"', '"').replace("\\'", "'")


# ---------------------------------------------------------------------------
# deterministic stub client


def _grid_expand(table: Node) -> list[list[str]]:
    """Expand a <table> Node's <tr> rows into a rectangular grid with
    rowspan/colspan values duplicated — the extraction behavior the
    reference's prompt instructs (:380-431)."""
    rows = [n for n in table.iter() if n.tag == "tr"]
    grid: list[list[str]] = []
    pending: dict[int, list] = {}  # col -> [remaining_rows, value]
    for r, tr in enumerate(rows):
        out: list[str] = []
        col = 0
        cells = [c for c in tr.children if c.tag in ("td", "th")]
        ci = 0
        while ci < len(cells) or col in pending:
            if col in pending:
                rem = pending[col]
                out.append(rem[1])
                rem[0] -= 1
                if rem[0] <= 0:
                    del pending[col]
                col += 1
                continue
            if ci >= len(cells):
                break
            cell = cells[ci]
            ci += 1
            val = cell.text()
            try:
                cs = max(1, int(cell.attrs.get("colspan") or 1))
            except ValueError:
                cs = 1
            try:
                rs = max(1, int(cell.attrs.get("rowspan") or 1))
            except ValueError:
                rs = 1
            for k in range(cs):
                out.append(val)
                if rs > 1:
                    pending[col + k] = [rs - 1, val]
            col += cs
        grid.append(out)
    return grid


class FakeTableLLMClient:
    """DETERMINISTIC STUB — no model, no network.  Parses the table HTML
    embedded in the prompt and returns the JSON the reference prompt
    asks a real model for: grid-expanded rows, headers from thead/th
    rows (or [] when the chunk prompt declares NO headers), caption,
    and metadata.  Wrapped under ``tables`` to exercise the unwrap law.
    """

    _HTML_RE = re.compile(r"```html\n(.*?)\n```", re.S)

    def complete(self, prompt: str) -> LLMResponse:
        m = self._HTML_RE.search(prompt)
        html = _unsanitize_html(m.group(1)) if m else ""
        no_headers = "This table has NO headers" in prompt
        dom = parse_dom(html)
        tables = [n for n in dom.iter() if n.tag == "table"]
        out = []
        for t in tables[:1]:
            thead = next((n for n in t.iter() if n.tag == "thead"), None)
            if thead is not None:
                n_header = len([n for n in thead.iter() if n.tag == "tr"])
            else:
                n_header = 0
                for tr in (n for n in t.iter() if n.tag == "tr"):
                    if any(c.tag == "th" for c in tr.children):
                        n_header += 1
                    else:
                        break
            grid = _grid_expand(t)
            header_rows, data_rows = grid[:n_header], grid[n_header:]
            headers = header_rows[-1] if (header_rows and not no_headers) \
                else []
            if no_headers:
                data_rows = grid
            caption = next(
                (n.text() for n in t.iter() if n.tag == "caption"), "")
            width = max((len(r) for r in grid), default=0)
            out.append({
                "headers": headers,
                "rows": data_rows,
                "caption": caption,
                "summary": t.attrs.get("summary", ""),
                "metadata": {
                    "row_count": len(data_rows),
                    "column_count": width,
                    "has_headers": bool(headers),
                    "has_merged_cells": ("colspan" in html
                                         or "rowspan" in html),
                    "nested_tables": False,
                    "table_type": "data",
                },
            })
        payload = json.dumps({"tables": out})
        n_in, n_out = len(prompt) // 4, len(payload) // 4
        return LLMResponse(payload, TokenUsage(n_out, n_in, n_in + n_out))


# ---------------------------------------------------------------------------
# the strategy


class LLMTableExtraction:
    """Reference table_extraction.py:320-1396, data-plane laws only."""

    def __init__(self, *, client=None, css_selector: str | None = None,
                 max_tries: int = 3, enable_chunking: bool = True,
                 chunk_token_threshold: int = 3000,
                 min_rows_per_chunk: int = 10,
                 max_parallel_chunks: int = 5):
        if client is None:
            # same env-gated resolution as LLMExtractionStrategy: a real
            # HTTP client iff LLM_API_BASE is set, else the labeled fake
            from .llm_extract import HttpLLMClient

            client = HttpLLMClient.from_env(json_response=True) \
                or FakeTableLLMClient()
        self.client = client
        self.css_selector = css_selector
        self.max_tries = max(1, max_tries)              # :726
        self.enable_chunking = enable_chunking
        self.chunk_token_threshold = chunk_token_threshold
        self.min_rows_per_chunk = max(5, min_rows_per_chunk)  # :729
        self.max_parallel_chunks = max(1, max_parallel_chunks)
        self.total_usage = TokenUsage()

    # -- selection (:1259-1302) ---------------------------------------------

    def _css_select(self, root: Node, css_selector: str) -> list[Node]:
        sel = css_selector
        if sel.startswith("#"):
            want = sel[1:]
            return [n for n in root.iter() if n.attrs.get("id") == want]
        if sel.startswith("."):
            want = sel[1:]
            return [n for n in root.iter()
                    if want in (n.attrs.get("class") or "")]
        if "." in sel:
            tag, _, cls = sel.partition(".")
            return [n for n in root.iter()
                    if n.tag == tag and cls in (n.attrs.get("class") or "")]
        if "#" in sel:
            tag, _, idv = sel.partition("#")
            return [n for n in root.iter()
                    if n.tag == tag and n.attrs.get("id") == idv]
        return [n for n in root.iter() if n.tag == sel]

    # -- entry (:733-890) -----------------------------------------------------

    def extract_tables(self, html: str, *,
                       css_selector: str | None = None) -> list[dict]:
        sel = css_selector or self.css_selector
        if sel:
            root = parse_dom(html)
            nodes = self._css_select(root, sel)
            if not nodes:
                return []
            html_content = "".join(n.html() for n in nodes)
        else:
            html_content = html
        if "<table" not in html_content.lower():        # :761
            return []
        if self.enable_chunking and self._needs_chunking(html_content):
            return self._extract_with_chunking(html_content)

        user_prompt = (
            "GENERATE THE TABULATED DATA from the following HTML "
            "content:\n\n```html\n" + sanitize_html(html_content)
            + "\n```\n\nReturn only a JSON array of extracted tables "
            "following the specified format."
        )
        for attempt in range(1, self.max_tries + 1):
            try:
                response = self.client.complete(user_prompt)
                self._account(response)
                tables_data = self._unwrap(json.loads(response.content))
                validated = [self._ensure_table_format(t)
                             for t in tables_data
                             if self._validate_table_structure(t)]
                if validated:
                    return validated
                if attempt < self.max_tries:
                    continue
                return []
            except Exception:
                if attempt < self.max_tries:
                    continue
                return []
        return []

    def _account(self, response: LLMResponse):
        u = response.usage
        self.total_usage.completion_tokens += u.completion_tokens
        self.total_usage.prompt_tokens += u.prompt_tokens
        self.total_usage.total_tokens += u.total_tokens

    @staticmethod
    def _unwrap(tables_data) -> list:
        """Wrapper-key and nesting law (:816-836)."""
        if isinstance(tables_data, dict):
            if "result" in tables_data:
                tables_data = tables_data["result"]
            elif "tables" in tables_data:
                tables_data = tables_data["tables"]
            elif "data" in tables_data:
                tables_data = tables_data["data"]
            else:
                tables_data = [tables_data]
        while (isinstance(tables_data, list) and len(tables_data) == 1
               and isinstance(tables_data[0], list)):
            tables_data = tables_data[0]
        if not isinstance(tables_data, list):
            tables_data = [tables_data]
        return tables_data

    # -- chunking (:892-1083) -------------------------------------------------

    def _needs_chunking(self, html_content: str) -> bool:
        if not self.enable_chunking:
            return False
        return estimate_tokens(html_content) > self.chunk_token_threshold

    def _extract_table_structure(self, html_content: str):
        dom = parse_dom(html_content)
        tables = [n for n in dom.iter() if n.tag == "table"]
        if not tables:
            return [], [], [], False
        table = tables[0]                               # first table only

        header_rows: list[Node] = []
        thead = next((n for n in table.iter() if n.tag == "thead"), None)
        if thead is not None:
            header_rows = [n for n in thead.iter() if n.tag == "tr"]
        else:
            for row in (n for n in table.iter() if n.tag == "tr"):
                if any(c.tag == "th" for c in row.iter()):
                    header_rows.append(row)
                else:
                    break
        has_headers = len(header_rows) > 0

        footer_rows: list[Node] = []
        tfoot = next((n for n in table.iter() if n.tag == "tfoot"), None)
        if tfoot is not None:
            footer_rows = [n for n in tfoot.iter() if n.tag == "tr"]

        tbody = next((n for n in table.iter() if n.tag == "tbody"), None)
        if tbody is not None:
            body_rows = [n for n in tbody.iter() if n.tag == "tr"]
        else:
            all_rows = [n for n in table.iter() if n.tag == "tr"]
            hc, fc = len(header_rows), len(footer_rows)
            body_rows = all_rows[hc:-fc] if fc > 0 else all_rows[hc:]
        if not has_headers and tbody is None:
            # QUIRK (:978-980): footer rows re-enter the body stream
            body_rows = [n for n in tables[0].iter() if n.tag == "tr"]
        return header_rows, body_rows, footer_rows, has_headers

    def _create_smart_chunks(self, html_content: str):
        header_rows, body_rows, footer_rows, has_headers = \
            self._extract_table_structure(html_content)
        if not body_rows:
            return [html_content], has_headers

        header_html = ""
        if header_rows:
            header_html = ("<thead>"
                           + "".join(r.html() for r in header_rows)
                           + "</thead>")

        chunks: list[str] = []
        current_rows: list[str] = []
        current_tokens = estimate_tokens(header_html)
        for row in body_rows:
            row_html = row.html()
            row_tokens = estimate_tokens(row_html)
            if current_rows and (current_tokens + row_tokens
                                 > self.chunk_token_threshold):
                chunks.append(
                    self._create_chunk_html(header_html, current_rows, None))
                current_rows = [row_html]
                current_tokens = estimate_tokens(header_html) + row_tokens
            else:
                current_rows.append(row_html)
                current_tokens += row_tokens
        if current_rows:
            footer_html = None
            if footer_rows:
                footer_html = ("<tfoot>"
                               + "".join(r.html() for r in footer_rows)
                               + "</tfoot>")
            chunks.append(
                self._create_chunk_html(header_html, current_rows,
                                        footer_html))
        if len(chunks) > 1:
            chunks = self._rebalance_chunks(chunks, self.min_rows_per_chunk)
        return chunks, has_headers

    @staticmethod
    def _create_chunk_html(header_html: str, body_rows: list[str],
                           footer_html: str | None) -> str:
        parts = ["<table>"]
        if header_html:
            parts.append(header_html)
        parts.append("<tbody>")
        parts.extend(body_rows)
        parts.append("</tbody>")
        if footer_html:
            parts.append(footer_html)
        parts.append("</table>")
        return "".join(parts)

    @staticmethod
    def _rebalance_chunks(chunks: list[str], min_rows: int) -> list[str]:
        # QUIRK kept (:1076-1083): the reference never implemented
        # rebalancing; min_rows_per_chunk is accepted but inert.
        return chunks

    # -- per-chunk + merge (:1085-1257) ---------------------------------------

    def _process_chunk(self, chunk_html: str, chunk_index: int,
                       total_chunks: int, has_headers: bool = True) -> dict:
        header_context = ""
        if not has_headers:
            header_context = ("\nIMPORTANT: This table has NO headers. "
                              "Return an empty array for 'headers' field "
                              "and extract all rows as data rows.")
        chunk_prompt = (
            f"Extract table data from this HTML chunk.\n"
            f"This is part {chunk_index + 1} of {total_chunks} of a larger "
            f"table.\nFocus on extracting the data rows accurately."
            f"{header_context}\n\n```html\n{sanitize_html(chunk_html)}\n```"
            f"\n\nReturn only a JSON array of extracted tables following "
            f"the specified format."
        )
        for attempt in range(1, self.max_tries + 1):
            try:
                response = self.client.complete(chunk_prompt)
                self._account(response)
                tables_data = self._unwrap(json.loads(response.content))
                for table in tables_data:
                    if self._validate_table_structure(table):
                        return {"chunk_index": chunk_index,
                                "table": self._ensure_table_format(table)}
                return {"chunk_index": chunk_index, "table": None}
            except Exception as e:
                if attempt < self.max_tries:
                    continue
                return {"chunk_index": chunk_index, "table": None,
                        "error": str(e)}
        return {"chunk_index": chunk_index, "table": None}

    @staticmethod
    def _merge_chunk_results(chunk_results: list[dict]) -> list[dict]:
        chunk_results.sort(key=lambda x: x.get("chunk_index", 0))
        valid = [r for r in chunk_results if r.get("table")]
        if not valid:
            return []
        merged = valid[0]["table"].copy()               # headers of chunk 0 win
        all_rows: list = []
        for r in valid:
            all_rows.extend(r["table"].get("rows", []))
        merged["rows"] = all_rows
        merged["metadata"]["row_count"] = len(all_rows)
        merged["metadata"]["chunked"] = True
        merged["metadata"]["chunk_count"] = len(valid)
        return [merged]

    def _extract_with_chunking(self, html_content: str) -> list[dict]:
        chunks, has_headers = self._create_smart_chunks(html_content)
        if len(chunks) == 1:
            result = self._process_chunk(chunks[0], 0, 1, has_headers)
            return [result["table"]] if result.get("table") else []
        chunk_results: list[dict] = []
        with ThreadPoolExecutor(
                max_workers=self.max_parallel_chunks) as pool:
            futs = {
                pool.submit(self._process_chunk, chunk, i, len(chunks),
                            has_headers): i
                for i, chunk in enumerate(chunks)
            }
            for fut in as_completed(futs):
                i = futs[fut]
                try:
                    chunk_results.append(fut.result())
                except Exception as e:
                    chunk_results.append({"chunk_index": i, "table": None,
                                          "error": str(e)})
        return self._merge_chunk_results(chunk_results)

    # -- validation + format (:1304-1396) -------------------------------------

    @staticmethod
    def _validate_table_structure(table) -> bool:
        if not isinstance(table, dict):
            return False
        if "headers" not in table or "rows" not in table:
            return False
        headers = table.get("headers")
        if not isinstance(headers, list):
            return False
        while (isinstance(headers, list) and len(headers) == 1
               and isinstance(headers[0], list)):
            table["headers"] = headers[0]
            headers = table["headers"]
        rows = table.get("rows")
        if not isinstance(rows, list):
            return False
        cleaned = []
        for row in rows:
            while (isinstance(row, list) and len(row) == 1
                   and isinstance(row[0], list)):
                row = row[0]
            cleaned.append(row)
        table["rows"] = cleaned
        return all(isinstance(r, list) for r in table["rows"])

    @staticmethod
    def _ensure_table_format(table: dict) -> dict:
        formatted = {
            "headers": table.get("headers", []),
            "rows": table.get("rows", []),
            "caption": table.get("caption", ""),
            "summary": table.get("summary", ""),
            "metadata": table.get("metadata", {}) or {},
        }
        md = formatted["metadata"]
        if "row_count" not in md:
            md["row_count"] = len(formatted["rows"])
        if "column_count" not in md:
            md["column_count"] = len(formatted["headers"])
        if "has_headers" not in md:
            md["has_headers"] = bool(formatted["headers"])
        col_count = len(formatted["headers"])
        if col_count > 0:
            for i, row in enumerate(formatted["rows"]):
                if len(row) < col_count:
                    formatted["rows"][i] = row + [""] * (col_count - len(row))
                elif len(row) > col_count:
                    formatted["rows"][i] = row[:col_count]
        return formatted


# ---------------------------------------------------------------------------
# Ray stage + query


def synth_table_html(doc_id: str, text: str, *, cols: int = 3) -> str:
    """Deterministic per-document table HTML derived from the documents
    table (no external data): words laid out row-major under a fixed
    header, captioned by doc_id."""
    words = (text or "").split()
    header = "<thead><tr>" + "".join(
        f"<th>c{i}</th>" for i in range(cols)) + "</tr></thead>"
    rows = []
    for r in range(0, len(words), cols):
        cells = "".join(f"<td>{w}</td>" for w in words[r:r + cols])
        rows.append(f"<tr>{cells}</tr>")
    return (f"<table><caption>{doc_id}</caption>{header}<tbody>"
            + "".join(rows) + "</tbody></table>")


class LLMTableExtractStage:
    """Actor-pool map_batches stage: (doc_id, html) rows → one row per
    extracted table (strategy built once per actor)."""

    def __init__(self, *, html_col: str = "html", key_col: str = "doc_id",
                 **strategy_kwargs):
        self.strategy = LLMTableExtraction(**strategy_kwargs)
        self.html_col = html_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, caps, nrows, ncols, chunked, nchunks, first, last = \
            [], [], [], [], [], [], [], []
        for key, html in zip(batch.column(self.key_col).to_pylist(),
                             batch.column(self.html_col).to_pylist()):
            for t in self.strategy.extract_tables(html or ""):
                md = t.get("metadata", {})
                rows = t.get("rows", [])
                keys.append(key)
                caps.append(str(t.get("caption", "")))
                nrows.append(int(md.get("row_count", len(rows))))
                ncols.append(int(md.get("column_count", 0)))
                chunked.append(bool(md.get("chunked", False)))
                nchunks.append(int(md.get("chunk_count", 1)))
                first.append(str(rows[0][0]) if rows and rows[0] else "")
                last.append(str(rows[-1][-1]) if rows and rows[-1] else "")
        return pa.table({
            "doc_id": pa.array(keys, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "row_count": pa.array(nrows, pa.int64()),
            "column_count": pa.array(ncols, pa.int64()),
            "chunked": pa.array(chunked, pa.bool_()),
            "chunk_count": pa.array(nchunks, pa.int64()),
            "first_cell": pa.array(first, pa.string()),
            "last_cell": pa.array(last, pa.string()),
        })


def _synth_batch(batch: pa.Table) -> pa.Table:
    ids = [str(i) for i in batch.column("doc_id").to_pylist()]
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "html": pa.array([synth_table_html(i, t) for i, t in
                          zip(ids, texts)], pa.string()),
    })


def llm_extract_tables(sf_dir: str, *,
                       chunk_token_threshold: int = 300):
    """Pipeline entry: documents table → synthetic per-doc table HTML →
    LLM table extraction (rows-only; stub client).  The low threshold
    makes longer documents exercise the chunk/merge path at test scale.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return (
        ds.map_batches(_synth_batch, batch_format="pyarrow",
                       batch_size=2048)
        .map_batches(
            LLMTableExtractStage,
            fn_constructor_kwargs={
                "chunk_token_threshold": chunk_token_threshold},
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
    )
