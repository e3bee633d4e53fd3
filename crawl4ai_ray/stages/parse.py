"""HTML → interleaved spans / links / media / metadata / markdown, one pass.

Re-expresses the reference's scrape+markdown pipeline
(/root/reference/crawl4ai/content_scraping_strategy.py:590-892 `_scrap`,
markdown_generation_strategy.py:148-260, table_extraction.py:132-296) as a
SINGLE event-driven pass over the HTML (stdlib ``html.parser`` — lxml is not
available in this environment) that directly materializes the BASELINE
interleaved-span invariant:

    spans: list<struct<kind, text, media_ref, offset>>

- ``kind='text'``  : contiguous markdown segment (links inline as
  ``[text](url)``; citation mode rewrites to ``text⟨n⟩`` + references)
- ``kind='image'|'video'|'audio'`` : media element in source order,
  ``media_ref`` = resolved src, ``text`` = alt/desc; images below the score
  threshold are dropped (reference heuristic at
  content_scraping_strategy.py:406-511, default threshold 3 per
  async_configs.py:981)
- ``kind='table'`` : data table passing the reference's scoring heuristic
  (table_extraction.py:132-211, threshold 7); ``text`` = JSON
  ``{"headers": [...], "rows": [...]}``

The per-batch entry point ``parse_html_batch`` is a stateless
``map_batches`` UDF (Arrow in / Arrow out). Parsing is inherently
per-document string work; everything around it (column assembly) is Arrow.
"""

from __future__ import annotations

import json
import os
import re
from html import unescape as _unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa

from ..functions import urlkit
from ..schemas import LINKS_STRUCT, SPAN_STRUCT

# Tags whose content is removed entirely (reference
# content_scraping_strategy.py:695-698 + noscript/template).
_SKIP_CONTENT = {"script", "style", "noscript", "template", "iframe", "svg", "head"}
# head is special-cased: we harvest <title>/<meta> but emit no text.

_BLOCK_BREAK = {
    "p", "div", "section", "article", "main", "header", "footer", "aside",
    "ul", "ol", "li", "blockquote", "pre", "table", "tr",
    "h1", "h2", "h3", "h4", "h5", "h6",
}
_HEADING = {"h1": "#", "h2": "##", "h3": "###", "h4": "####", "h5": "#####", "h6": "######"}

_WS_RE = re.compile(r"[ \t\r\n\f]+")
# cheap pre-test: data needs collapsing only if it holds a non-space
# whitespace char or a double space — a single regex SEARCH (early exit)
# instead of the sub machinery for the common already-collapsed chunk
_WS_NEED = re.compile(r"[\t\r\n\f]|  ").search
_GENERIC_IMG = re.compile(r"(icon|logo|button|spacer|pixel|tracking)", re.I)


def _origin_of(url: str) -> str | None:
    """scheme://netloc prefix by string slicing (no urlparse)."""
    i = url.find("://")
    if i < 0:
        return None
    j = url.find("/", i + 3)
    return url if j < 0 else url[:j]


class _Table:
    __slots__ = ("rows", "cur_row", "in_th", "has_thead", "has_tbody", "th_count",
                 "caption", "has_summary", "presentation", "nested", "data_attrs",
                 "in_cell", "cell_text", "header_rows", "_caption_mode",
                 "_colspan")

    def __init__(self):
        self.rows = []          # list[list[str]]
        self.header_rows = []   # rows made entirely of <th>
        self.cur_row = None
        self._caption_mode = False
        self._colspan = 1
        self.in_th = False
        self.has_thead = False
        self.has_tbody = False
        self.th_count = 0
        self.caption = ""
        self.has_summary = False
        self.presentation = False
        self.nested = False
        self.data_attrs = 0
        self.in_cell = False
        self.cell_text = []


class SpanHTMLParser(HTMLParser):
    """Event-driven extractor; builds spans/links/metadata in one pass."""

    def __init__(self, page_url: str, *, image_score_threshold: int = 3,
                 table_score_threshold: int = 7, citations: bool = False):
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.base_url = page_url          # overridden by <base href>
        self.image_score_threshold = image_score_threshold
        self.table_score_threshold = table_score_threshold
        self.citations = citations

        self.spans: list[dict] = []
        self.links: list[dict] = []
        self.metadata: dict = {}
        self._md: list[str] = []          # current markdown text segment pieces
        self._skip_depth = 0
        self._in_head = False
        self._in_title = False
        self._title_parts: list[str] = []
        self._pre_depth = 0
        self._list_depth = 0
        self._a_href: str | None = None
        self._a_title: str = ""
        self._a_text: list[str] = []
        self._tables: list[_Table] = []
        self._cite_order: list[str] = []
        self._cite_index: dict[str, int] = {}
        self._seen_hrefs: set[str] = set()
        self._origin = _origin_of(page_url)

    # -- hot-path overrides ---------------------------------------------------

    def updatepos(self, i, j):
        """Line/offset bookkeeping disabled: the stdlib implementation
        counts newlines over every advanced byte (str.count per goahead
        step — a full extra pass of memory traffic per document) purely
        for error positions, which this extractor never reads."""
        return j

    def _resolve(self, href: str) -> str:
        """urljoin with string fast paths for the two dominant shapes —
        absolute and root-relative hrefs — which need no parsing at all;
        everything else falls back to urljoin. Byte-identical results
        (golden-gated spans/markdown)."""
        if href.startswith(("http://", "https://")):
            return href
        if self._origin is not None and href.startswith("/") \
                and not href.startswith("//"):
            return self._origin + href
        return urljoin(self.base_url, href)

    # -- span helpers -------------------------------------------------------

    def _flush_text(self):
        text = "".join(self._md)
        # normalize: collapse 3+ newlines, strip trailing spaces per line
        text = re.sub(r"\n{3,}", "\n\n", text).strip()
        if text:
            self.spans.append(
                {"kind": "text", "text": text, "media_ref": "",
                 "offset": len(self.spans)}
            )
        self._md = []

    def _emit(self, kind: str, text: str, media_ref: str):
        self._flush_text()
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref,
             "offset": len(self.spans)}
        )

    def _append_md(self, s: str):
        # an OPEN anchor wins over table-cell routing: anchor text inside
        # a <td> must reach the link record (and the rendered link then
        # lands in the cell via _close_link -> _append_md)
        if self._a_href is not None:
            self._a_text.append(s)
        elif self._tables:
            self._tables[-1].cell_text.append(s)
        else:
            self._md.append(s)

    # -- tag handling -------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT and tag != "head":
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        a = dict(attrs)
        if tag == "body":
            # HTML parsing rules imply </head> at <body>; without this a
            # page omitting </head> would drop its entire body
            self._in_head = False
        if tag == "head":
            self._in_head = True
        elif tag == "title":
            self._in_title = True
        elif tag == "meta" and self._in_head:
            name = (a.get("name") or a.get("property") or "").lower()
            content = a.get("content") or ""
            if name in ("description", "keywords", "author", "robots") or \
                    name.startswith("og:") or name.startswith("twitter:"):
                self.metadata[name] = content
        elif tag == "base" and a.get("href"):
            self.base_url = urljoin(self.page_url, a["href"])
            self._origin = _origin_of(self.base_url)
        elif self._in_head:
            return
        elif tag == "a":
            if self._a_href is not None:
                self._close_link()   # browsers auto-close unclosed anchors
            self._a_href = a.get("href") or ""
            self._a_title = a.get("title") or ""
            self._a_text = []
        elif tag == "img":
            self._handle_img(a)
        elif tag in ("video", "audio"):
            src = a.get("src") or ""
            if src:
                self._emit(tag, a.get("title") or a.get("alt") or "",
                           self._resolve(src))
            else:
                # defer to <source> child
                self._pending_media = tag
        elif tag == "source" and getattr(self, "_pending_media", None):
            src = a.get("src") or ""
            if src:
                self._emit(self._pending_media, "", self._resolve(src))
                self._pending_media = None
        elif tag == "table":
            if self._tables:
                self._tables[-1].nested = True
            t = _Table()
            t.has_summary = "summary" in a
            t.presentation = a.get("role") == "presentation"
            t.data_attrs = sum(1 for k in a if k.startswith("data-"))
            self._tables.append(t)
        elif self._tables:
            t = self._tables[-1]
            if tag == "thead":
                t.has_thead = True
            elif tag == "tbody":
                t.has_tbody = True
            elif tag == "tr":
                t.cur_row = []
            elif tag in ("td", "th"):
                t.in_cell = True
                t.in_th = tag == "th"
                if tag == "th":
                    t.th_count += 1
                t.cell_text = []
                try:
                    t._colspan = max(1, int(a.get("colspan", 1)))
                except (ValueError, TypeError):
                    t._colspan = 1
            elif tag == "caption":
                t.cell_text = []
                t.in_cell = True
                t.in_th = False
                t._caption_mode = True
        elif tag in _HEADING:
            self._md.append("\n\n" + _HEADING[tag] + " ")
        elif tag == "p":
            self._md.append("\n\n")
        elif tag == "br":
            self._append_md("\n")
        elif tag == "li":
            self._md.append("\n- ")
        elif tag in ("ul", "ol"):
            self._list_depth += 1
        elif tag == "pre":
            self._pre_depth += 1
            self._md.append("\n\n```\n")
        elif tag == "code" and not self._pre_depth:
            self._append_md("`")
        elif tag in ("strong", "b"):
            self._append_md("**")
        elif tag in ("em", "i"):
            self._append_md("*")
        elif tag in ("div", "section", "article", "blockquote", "main",
                     "header", "footer", "aside"):
            self._md.append("\n\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _SKIP_CONTENT and tag != "head":
            # a self-closing skip tag (<iframe/>, <svg/>) opens and closes
            # in one event — incrementing _skip_depth here would never be
            # matched by an end tag and silently drop the rest of the doc
            return
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT and tag != "head":
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "head":
            self._in_head = False
            return
        if tag == "title":
            self._in_title = False
            self.metadata["title"] = _WS_RE.sub(" ", "".join(self._title_parts)).strip()
            return
        if self._in_head:
            return
        if tag == "a" and self._a_href is not None:
            self._close_link()
        elif tag in ("video", "audio"):
            self._pending_media = None
        elif self._tables:
            t = self._tables[-1]
            if tag in ("td", "th") and t.in_cell:
                txt = _WS_RE.sub(" ", "".join(t.cell_text)).strip()
                if getattr(t, "_caption_mode", False):
                    t.caption = txt
                    t._caption_mode = False
                elif t.cur_row is not None:
                    t.cur_row.extend([txt] * getattr(t, "_colspan", 1))
                t.in_cell = False
                t.cell_text = []
            elif tag == "caption" and t.in_cell:
                t.caption = _WS_RE.sub(" ", "".join(t.cell_text)).strip()
                t.in_cell = False
                t._caption_mode = False
            elif tag == "tr" and t.cur_row is not None:
                if t.cur_row:
                    t.rows.append(t.cur_row)
                t.cur_row = None
            elif tag == "table":
                self._close_table(self._tables.pop())
        elif tag in _HEADING or tag == "p":
            self._md.append("\n\n")
        elif tag in ("ul", "ol"):
            self._list_depth = max(0, self._list_depth - 1)
            self._md.append("\n")
        elif tag == "pre":
            self._pre_depth = max(0, self._pre_depth - 1)
            self._md.append("\n```\n\n")
        elif tag == "code" and not self._pre_depth:
            self._append_md("`")
        elif tag in ("strong", "b"):
            self._append_md("**")
        elif tag in ("em", "i"):
            self._append_md("*")
        elif tag in ("div", "section", "article", "blockquote", "main",
                     "header", "footer", "aside"):
            self._md.append("\n")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self._title_parts.append(data)
            return
        if self._in_head:
            return
        if self._pre_depth:
            self._append_md(data)
            return
        text = data if _WS_NEED(data) is None else _WS_RE.sub(" ", data)
        if text and text != " ":
            self._append_md(text)
        elif text == " " and (self._md or self._a_text or
                              (self._tables and self._tables[-1].cell_text)):
            self._append_md(" ")

    # -- element finalizers -------------------------------------------------

    def _handle_img(self, a: dict):
        src = a.get("src") or ""
        if not src or src.startswith("data:"):
            return  # reference strips base64 srcs (content_scraping_strategy.py:753)
        alt = a.get("alt") or ""
        score = 0
        try:
            if int(re.sub(r"\D", "", a.get("width") or "0") or 0) > 150:
                score += 1
            if int(re.sub(r"\D", "", a.get("height") or "0") or 0) > 150:
                score += 1
        except ValueError:
            pass
        if alt:
            score += 1
        fmt = src.rsplit(".", 1)[-1].lower() if "." in src.rsplit("/", 1)[-1] else ""
        if fmt in ("jpg", "jpeg", "png", "webp", "avif"):
            score += 1
        if a.get("srcset"):
            score += 1
        if _GENERIC_IMG.search(src):
            score -= 2
        if score >= self.image_score_threshold:
            self._emit("image", alt or a.get("title") or "",
                       self._resolve(src))

    def _close_link(self):
        href, title = self._a_href, self._a_title
        text = _WS_RE.sub(" ", "".join(self._a_text)).strip()
        self._a_href = None
        self._a_text = []
        if href and not href.startswith(("javascript:", "mailto:", "#")):
            resolved = self._resolve(href)
            if resolved not in self._seen_hrefs:  # per-page dedupe (ref :299-303)
                self._seen_hrefs.add(resolved)
                self.links.append(
                    {
                        "href": resolved,
                        "text": text,
                        "title": title,
                        "internal": not urlkit.is_external(resolved, self.page_url),
                    }
                )
            if self.citations:
                idx = self._cite_index.get(resolved)
                if idx is None:
                    idx = len(self._cite_order) + 1
                    self._cite_index[resolved] = idx
                    self._cite_order.append(resolved)
                self._append_md(f"{text}⟨{idx}⟩")
            else:
                self._append_md(f"[{text}]({resolved})")
        elif text:
            self._append_md(text)

    def _close_table(self, t: _Table):
        score = 0
        if t.has_thead:
            score += 2
        if t.has_tbody:
            score += 1
        if t.th_count > 0:
            score += 2
        if t.th_count > 5:
            score += 1
        if t.nested:
            score -= 3
        if t.presentation:
            score -= 3
        if t.caption:
            score += 2
        if t.has_summary:
            score += 1
        score += 0.5 * min(2, t.data_attrs)
        ncols = [len(r) for r in t.rows]
        if ncols:
            if max(ncols) >= 2:
                score += 2
            if len(set(ncols)) == 1:   # column-count variance < 1
                score += 2
        cells = [c for r in t.rows for c in r]
        if cells:
            ratio = sum(1 for c in cells if c) / len(cells)
            score += 2 if ratio > 0.5 else 0
        if score < self.table_score_threshold:
            return
        if t.has_thead or t.th_count:
            # first row is headers when it came from thead/th
            headers = t.rows[0] if t.rows else []
            body = t.rows[1:]
        else:
            headers = [f"col_{i}" for i in range(max(ncols or [0]))]
            body = t.rows
        width = len(headers)
        body = [r[:width] + [""] * (width - len(r)) for r in body]
        payload = {"headers": headers, "rows": body}
        if t.caption:
            payload["caption"] = t.caption
        self._emit("table", json.dumps(payload, ensure_ascii=False), "")

    # -- result -------------------------------------------------------------

    def finish(self) -> dict:
        self._flush_text()
        if self.citations and self._cite_order:
            refs = "\n".join(
                f"⟨{i + 1}⟩ {u}" for i, u in enumerate(self._cite_order)
            )
            self.spans.append(
                {"kind": "text", "text": "## References\n\n" + refs,
                 "media_ref": "", "offset": len(self.spans)}
            )
        markdown = "\n\n".join(
            s["text"] for s in self.spans if s["kind"] == "text"
        )
        return {
            "spans": self.spans,
            "links": self.links,
            "metadata": self.metadata,
            "markdown": markdown,
            "title": self.metadata.get("title", ""),
        }


# ---------------------------------------------------------------------------
# fast tokenizer
# ---------------------------------------------------------------------------
# The stdlib HTMLParser spends ~60% of parse wall-time in its incremental
# goahead/parse_starttag machinery (profiled: goahead + parse_starttag +
# parse_endtag + their regexes = 0.32s of a 0.52s corpus pass) — overhead a
# single-shot document parse doesn't need. `_fast_feed` drives the SAME
# handler methods on SpanHTMLParser from a lean scan loop:
#   - a one-regex "simple tag" path for the dominant shape
#     (<name a="v" b>), one regex match + one attr finditer per tag
#   - a tolerant path that mirrors stdlib parse_starttag semantics
#     (attrfind_tolerant char classes, '=+' values, stray-'/' skipping,
#     '/>' detection AFTER attr consumption — so '<img src=a.png/>'
#     stays a plain starttag with value 'a.png/', like stdlib)
#   - script/style CDATA content found via a case-insensitive '</tag'
#     search (stdlib set_cdata_mode law)
#   - comments / doctype / PIs skipped at stdlib event granularity
# Anything outside the mirrored subset raises _FastBail and parse_html
# re-parses the WHOLE document on a fresh stdlib-driven parser, so the
# fast path can never change output — only speed. Differential equality
# against the stdlib path is test-gated (tests/test_parse.py).

_FAST_ENABLED = os.environ.get("C4R_PARSE_FAST", "1") != "0"


class _FastBail(Exception):
    """Document uses a construct outside the fast subset — reparse."""


# simple path: quoted values without & (no unescape) / bare attrs
_SIMPLE_TAG_RE = re.compile(
    r'([a-zA-Z][a-zA-Z0-9-]*)'
    r'((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:="[^"&]*")?)*)'
    r'\s*(/?)>')
_SIMPLE_ATTR_RE = re.compile(
    r'\s+([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:="([^"&]*)")?')
_SIMPLE_END_RE = re.compile(r'([a-zA-Z][a-zA-Z0-9-]*)\s*>')

# tolerant path: stdlib html.parser tagfind_tolerant / attrfind_tolerant
# char classes, applied to s[lt+1 : gt+1] (the '>' is kept in the slice so
# the /(?!>) stray-slash lookahead sees it, exactly like stdlib).
_TAGFIND_RE = re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_ATTRFIND_RE = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)'
    r'(\s*=+\s*(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?'
    r'(?:\s|/(?!>))*')
_ENDTAG_INNER_RE = re.compile(r'\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*')
_CDATA_CLOSE = {
    "script": re.compile(r'</\s*script', re.I),
    "style": re.compile(r'</\s*style', re.I),
}
_CDATA_END_RE = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')


def _fast_tolerant_tag(p: SpanHTMLParser, s: str, lt: int) -> int:
    """Start tag outside the simple shape: mirror stdlib parse_starttag.
    Returns the scan position after '>'."""
    # locate '>' skipping quoted attribute values
    k, n = lt + 1, len(s)
    gt = -1
    while k < n:
        c = s[k]
        if c == ">":
            gt = k
            break
        if c == '"' or c == "'":
            k = s.find(c, k + 1)
            if k < 0:
                raise _FastBail
        k += 1
    if gt < 0:
        raise _FastBail
    tseg = s[lt + 1:gt + 1]          # keep '>' for the /(?!>) lookahead
    m = _TAGFIND_RE.match(tseg)
    name = m.group(1).lower()
    k = m.end()
    attrs = []
    limit = len(tseg)
    while k < limit:
        am = _ATTRFIND_RE.match(tseg, k)
        if not am:
            break
        aname, aval = am.group(1), am.group(3)
        if aval is not None:
            if aval[:1] in ('"', "'"):
                aval = aval[1:-1]
            if "&" in aval:
                aval = _unescape(aval)
        attrs.append((aname.lower(), aval))
        k = am.end()
    end = tseg[k:].strip()
    if end == ">":
        p.handle_starttag(name, attrs)
        if name in ("script", "style"):
            return _fast_cdata(p, s, gt + 1, name)
    elif end == "/>":
        p.handle_startendtag(name, attrs)
    else:
        raise _FastBail
    return gt + 1


def _fast_cdata(p: SpanHTMLParser, s: str, i: int, name: str) -> int:
    """Raw content of an open <script>/<style> up to its end tag (stdlib
    CDATA mode: no entity conversion, no tag parsing inside)."""
    m = _CDATA_CLOSE[name].search(s, i)
    if m is None:
        raise _FastBail
    em = _CDATA_END_RE.match(s, m.start())
    if em is None or em.group(1).lower() != name:
        raise _FastBail        # '</scripty>' stays data in stdlib — rare
    if m.start() > i:
        p.handle_data(s[i:m.start()])
    p.handle_endtag(name)
    return em.end()


def _fast_feed(p: SpanHTMLParser, s: str) -> None:
    """Single-shot event loop over a whole document (see block comment)."""
    find = s.find
    handle_data = p.handle_data
    n = len(s)
    i = 0
    while i < n:
        lt = find("<", i)
        if lt < 0:
            d = s[i:]
            handle_data(_unescape(d) if "&" in d else d)
            break
        if lt > i:
            d = s[i:lt]
            handle_data(_unescape(d) if "&" in d else d)
        nxt = s[lt + 1:lt + 2]
        if nxt == "/":
            m = _SIMPLE_END_RE.match(s, lt + 2)
            if m is not None:
                p.handle_endtag(m.group(1).lower())
                i = m.end()
                continue
            gt = find(">", lt + 2)
            if gt < 0:
                raise _FastBail
            em = _ENDTAG_INNER_RE.fullmatch(s, lt + 2, gt)
            if em is None:
                raise _FastBail    # '</a b>'-style tolerant endtags: rare
            p.handle_endtag(em.group(1).lower())
            i = gt + 1
        elif nxt.isascii() and nxt.isalpha():
            m = _SIMPLE_TAG_RE.match(s, lt + 1)
            if m is not None:
                name = m.group(1).lower()
                aseg = m.group(2)
                attrs = ([(am.group(1).lower(), am.group(2))
                          for am in _SIMPLE_ATTR_RE.finditer(aseg)]
                         if aseg else [])
                if m.group(3):
                    p.handle_startendtag(name, attrs)
                    i = m.end()
                else:
                    p.handle_starttag(name, attrs)
                    i = m.end()
                    if name in ("script", "style"):
                        i = _fast_cdata(p, s, i, name)
                continue
            i = _fast_tolerant_tag(p, s, lt)
        elif nxt == "!":
            if s.startswith("<!--", lt):
                e = find("-->", lt + 4)
                if e < 0:
                    raise _FastBail
                i = e + 3
            elif s.startswith("<![", lt):
                raise _FastBail    # marked sections can hold bare '>'
            else:
                gt = find(">", lt + 2)     # doctype / declaration: no event
                if gt < 0:
                    raise _FastBail
                i = gt + 1
        elif nxt == "?":
            gt = find(">", lt + 2)         # processing instruction: no event
            if gt < 0:
                raise _FastBail
            i = gt + 1
        else:
            # bogus '<' is literal data in stdlib ('x < y' → 'x ', '<', ' y')
            handle_data("<")
            i = lt + 1


def parse_html(html: str, page_url: str, *, citations: bool = False,
               image_score_threshold: int = 3,
               fast: bool | None = None) -> dict:
    """Parse one document. Deterministic; errors yield an empty doc.

    ``fast`` pins the tokenizer for differential tests; default tries the
    fast loop and re-parses via stdlib on any bail (fresh parser, so a
    partial fast pass never leaks into the output)."""
    if fast is None:
        fast = _FAST_ENABLED
    if fast:
        p = SpanHTMLParser(page_url, citations=citations,
                           image_score_threshold=image_score_threshold)
        try:
            _fast_feed(p, html or "")
            return p.finish()
        except Exception:
            pass
    p = SpanHTMLParser(page_url, citations=citations,
                       image_score_threshold=image_score_threshold)
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return p.finish()


def parse_html_batch(batch: pa.Table, *, html_col: str = "html",
                     url_col: str = "url", citations: bool = False,
                     image_score_threshold: int = 3) -> pa.Table:
    """Stateless map_batches UDF: html/url columns in → spans/links/markdown/
    title/metadata columns appended (Arrow in / Arrow out)."""
    htmls = batch.column(html_col).to_pylist()
    urls = batch.column(url_col).to_pylist()
    spans_col, links_col, md_col, title_col, meta_col = [], [], [], [], []
    for h, u in zip(htmls, urls):
        r = parse_html(h, u, citations=citations,
                       image_score_threshold=image_score_threshold)
        spans_col.append(r["spans"])
        links_col.append(r["links"])
        md_col.append(r["markdown"])
        title_col.append(r["title"])
        meta_col.append(json.dumps(r["metadata"], ensure_ascii=False, sort_keys=True))
    out = batch
    for name, arr in (
        ("spans", pa.array(spans_col, type=pa.list_(SPAN_STRUCT))),
        ("links", pa.array(links_col, type=pa.list_(LINKS_STRUCT))),
        ("markdown", pa.array(md_col, type=pa.large_string())),
        ("title", pa.array(title_col, type=pa.string())),
        ("metadata", pa.array(meta_col, type=pa.string())),
    ):
        out = out.append_column(name, arr)
    return out
