"""Fit-markdown content filters: PruningContentFilter + BM25ContentFilter.

Behavioral port of the reference's fit-markdown pipeline
(/root/reference/crawl4ai/content_filter_strategy.py:533-779 Pruning,
:381-532 BM25, :33-379 shared base): filter_content(html) -> list of
cleaned HTML block strings; ``fit_html`` = their join, ``fit_markdown`` =
the engine's markdown conversion of that. Mirrors the behaviors pinned by
the reference's own tests (tests/async/test_content_filter_prune.py,
test_content_filter_bm25.py): threshold modes (fixed/dynamic),
min_word_threshold, link-density pruning, tag importance, determinism.

Environment adaptations (documented divergences, same policy as the
markdown converter — SURVEY.md §7.5):
- bs4/lxml are absent → a minimal stdlib-html.parser DOM below. Metric
  inputs that depend on byte-exact bs4 serialization (``tag_len`` =
  len(encode_contents())) use this module's serializer, so scores can
  differ from the reference in the last decimals on exotic markup; the
  decision laws are identical.
- snowballstemmer is absent → BM25 stemming is OFF by default (reference
  default is on); tokens are compared unstemmed.

BM25Okapi (k1=1.5, b=0.75, epsilon=0.25 with the negative-idf epsilon
floor) follows Robertson/Sparck Jones BM25 as implemented by the public
rank_bm25 package the reference depends on.
"""

from __future__ import annotations

import math
import re
from collections import deque
from html.parser import HTMLParser

__all__ = [
    "PruningContentFilter",
    "BM25ContentFilter",
    "fit_markdown_from_html",
    "parse_tree",
]

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}

_NEGATIVE = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share",
    re.I,
)

_EXCLUDED_TAGS = {"nav", "footer", "header", "aside", "script", "style",
                  "form", "iframe", "noscript"}


class Node:
    """Minimal DOM node; text children are plain ``str``."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict | None = None, parent=None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list = []
        self.parent = parent

    # -- bs4-equivalent helpers used by the filter laws ---------------------

    def get_text(self, strip: bool = False) -> str:
        out = []
        stack = [self]
        order = []
        while stack:
            n = stack.pop()
            order.append(n)
            if isinstance(n, Node):
                stack.extend(reversed(n.children))
        for n in order:
            if isinstance(n, str):
                out.append(n.strip() if strip else n)
        return "".join(s for s in out if s) if strip else "".join(out)

    def find(self, name: str):
        for n in self.iter_tags():
            if n.name == name:
                return n
        return None

    def find_all(self, name: str, recursive: bool = True) -> list:
        if recursive:
            return [n for n in self.iter_tags() if n.name == name]
        return [c for c in self.children
                if isinstance(c, Node) and c.name == name]

    def iter_tags(self):
        """Descendant tags in document order (self excluded)."""
        stack = list(reversed([c for c in self.children
                               if isinstance(c, Node)]))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed([c for c in n.children
                                   if isinstance(c, Node)]))

    @property
    def string(self):
        """bs4 ``.string``: the single text child, else None."""
        if len(self.children) == 1 and isinstance(self.children[0], str):
            return self.children[0]
        return None

    def decompose(self) -> None:
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
        self.children = []

    def inner_html(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    def outer_html(self) -> str:
        return _serialize(self)


def _serialize(n) -> str:
    if isinstance(n, str):
        return n
    attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
    if n.name in _VOID:
        return f"<{n.name}{attrs}/>"
    return f"<{n.name}{attrs}>{n.inner_html()}</{n.name}>"


class _TreeParser(HTMLParser):
    """html.parser → Node tree; comments dropped (the reference removes
    them before scoring anyway); unclosed tags close when an ancestor
    closes (stack pop-to-match, unmatched end tags ignored)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[root]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                    parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(
            Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                 parent=self.stack[-1])
        )

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_tree(html: str) -> Node:
    """Parse to a tree and return the <body> node (synthesized around the
    whole document when absent, like the reference's body wrap)."""
    p = _TreeParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    body = p.root.find("body")
    if body is None:
        body = Node("body")
        body.children = p.root.children
        for c in body.children:
            if isinstance(c, Node):
                c.parent = body
        return body
    return body


def _root_of(body: Node) -> Node:
    r = body
    while r.parent is not None:
        r = r.parent
    return r


# ---------------------------------------------------------------------------
# Shared filter base behaviors (content_filter_strategy.py:33-379)
# ---------------------------------------------------------------------------

_INLINE_TAGS = {
    "a", "abbr", "acronym", "b", "bdo", "big", "br", "button", "cite",
    "code", "dfn", "em", "i", "img", "input", "kbd", "label", "map",
    "object", "q", "samp", "script", "select", "small", "span", "strong",
    "sub", "sup", "textarea", "time", "tt", "var",
}
_HEADER_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "header"}

_CLEAN_UNWANTED_TAGS = {"script", "style", "aside", "form", "iframe",
                        "noscript"}
_CLEAN_UNWANTED_ATTRS = {"style", "onclick", "onmouseover", "align",
                         "bgcolor", "class", "id"}


def extract_page_query(body: Node, user_query: str | None = None) -> str:
    """Title + h1 + meta keywords/description, falling back to the first
    paragraph over 150 chars (content_filter_strategy.py:125-160)."""
    if user_query:
        return user_query
    root = _root_of(body)
    parts = []
    title = root.find("title")
    if title is not None and title.get_text():
        parts.append(title.get_text())
    h1 = root.find("h1")
    if h1 is not None:
        parts.append(h1.get_text())
    temp = ""
    # First occurrence per name wins, matching bs4 soup.find semantics
    # (content_filter_strategy.py uses soup.find which returns the FIRST
    # matching <meta>; a dict comprehension would keep the last).
    metas: dict = {}
    for m in root.find_all("meta"):
        metas.setdefault(m.attrs.get("name"), m.attrs.get("content", ""))
    for meta_name in ("keywords", "description"):
        content = metas.get(meta_name)
        if content:
            parts.append(content)
            temp += content
    if not temp:
        for pnode in body.find_all("p"):
            if len(pnode.get_text()) > 150:
                parts.append(pnode.get_text()[:150])
                break
    return " ".join(filter(None, parts))


def extract_text_chunks(body: Node, min_word_threshold: int | None = None):
    """Block-boundary text chunking (content_filter_strategy.py:161-257):
    inline tags don't break the flow; flushing happens when a block
    element's subtree ends. Returns (index, text, 'header'|'content',
    node) tuples."""
    chunks = []
    current_text: list[str] = []
    chunk_index = 0

    def should_break_chunk(tag: Node) -> bool:
        return tag.name not in _INLINE_TAGS and not (
            tag.name == "p" and len(current_text) == 0
        )

    stack = deque([(body, False)])
    while stack:
        element, visited = stack.pop()
        if visited:
            if current_text and should_break_chunk(element):
                text = " ".join("".join(current_text).split())
                if text:
                    tag_type = ("header" if element.name in _HEADER_TAGS
                                else "content")
                    chunks.append((chunk_index, text, tag_type, element))
                    chunk_index += 1
                current_text = []
            continue
        if isinstance(element, str):
            if element.strip():
                current_text.append(element.strip())
            continue
        children = list(element.children)
        if not children:
            continue
        stack.append((element, True))
        for child in reversed(children):
            stack.append((child, False))
    if current_text:
        text = " ".join("".join(current_text).split())
        if text:
            chunks.append((chunk_index, text, "content", body))
    if min_word_threshold:
        chunks = [c for c in chunks
                  if len(c[1].split()) >= min_word_threshold]
    return chunks


def clean_element(tag: Node) -> str:
    """Render a kept element, dropping script-ish tags and style/event/
    class/id attributes (content_filter_strategy.py:329-379); strings are
    stripped exactly as the reference does."""
    if not isinstance(tag, Node):
        return ""
    builder: list[str] = []

    def render(elem):
        if isinstance(elem, str):
            builder.append(elem.strip())
            return
        if elem.name in _CLEAN_UNWANTED_TAGS:
            return
        builder.append(f"<{elem.name}")
        for k, v in elem.attrs.items():
            if k not in _CLEAN_UNWANTED_ATTRS:
                builder.append(f' {k}="{v}"')
        builder.append(">")
        for child in elem.children:
            render(child)
        builder.append(f"</{elem.name}>")

    render(tag)
    return "".join(builder)


_STOP_WORDS = set("""a an and are as at be by for from has he in is it its
of on that the to was were will with i you we they me him her us them my
your his our their mine yours hers ours theirs myself yourself himself
herself itself ourselves themselves am been being have had having do does
did doing about above across after against along among around before
behind below beneath beside between beyond down during except inside into
near off out outside over past through toward under underneath until up
upon within but or nor yet so although because since unless this these
those what which who whom whose when where why how all any both each few
more most other some such can cannot can't could couldn't may might must
mustn't shall should shouldn't won't would wouldn't not n't no none""".split())
_NOISE = {"ccp", "up", "↑", "▲", "⬆️", "a", "an", "at", "by", "in", "of",
          "on", "to", "the"}


def clean_tokens(tokens: list[str]) -> list[str]:
    """Stop-word / noise / short-token removal (utils.py:2425-2652).

    Deliberately DISTINCT from functions/textutils.clean_tokens: this one
    ports the reference's full BM25 stop list (len>2, noise set, arrow
    prefixes) because BM25ContentFilter score parity depends on it; the
    textutils variant is the r1-tested tokenizer the adaptive crawler and
    cosine extraction share. Keep them separate — merging would shift
    BM25 scores or adaptive confidence trajectories."""
    return [
        t for t in tokens
        if len(t) > 2 and t not in _NOISE and t not in _STOP_WORDS
        and not t.startswith("↑") and not t.startswith("▲")
        and not t.startswith("⬆")
    ]


class _BM25Okapi:
    """BM25 with the rank_bm25 package's exact parameterization (the
    reference's scorer): k1=1.5, b=0.75, negative idf floored at
    epsilon × mean idf."""

    def __init__(self, corpus: list[list[str]], k1=1.5, b=0.75,
                 epsilon=0.25):
        self.k1, self.b = k1, b
        self.doc_len = [len(d) for d in corpus]
        self.avgdl = (sum(self.doc_len) / len(corpus)) if corpus else 0.0
        self.doc_freqs = []
        nd: dict[str, int] = {}
        for doc in corpus:
            freqs: dict[str, int] = {}
            for w in doc:
                freqs[w] = freqs.get(w, 0) + 1
            self.doc_freqs.append(freqs)
            for w in freqs:
                nd[w] = nd.get(w, 0) + 1
        n_docs = len(corpus)
        self.idf: dict[str, float] = {}
        negative = []
        idf_sum = 0.0
        for w, n in nd.items():
            idf = math.log(n_docs - n + 0.5) - math.log(n + 0.5)
            self.idf[w] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(w)
        avg_idf = idf_sum / len(self.idf) if self.idf else 0.0
        eps = epsilon * avg_idf
        for w in negative:
            self.idf[w] = eps

    def get_scores(self, query: list[str]) -> list[float]:
        out = []
        for freqs, dl in zip(self.doc_freqs, self.doc_len):
            s = 0.0
            for q in query:
                f = freqs.get(q, 0)
                if not f:
                    continue
                s += self.idf.get(q, 0.0) * f * (self.k1 + 1) / (
                    f + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
                )
            out.append(s)
        return out


# ---------------------------------------------------------------------------
# BM25ContentFilter (content_filter_strategy.py:381-532)
# ---------------------------------------------------------------------------


class BM25ContentFilter:
    PRIORITY_TAGS = {
        "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0,
        "b": 1.5, "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5,
        "th": 1.5,
    }

    def __init__(self, user_query: str | None = None,
                 bm25_threshold: float = 1.0):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold

    def filter_content(self, html: str,
                       min_word_threshold: int | None = None) -> list[str]:
        if not html or not isinstance(html, str):
            return []
        body = parse_tree(html)
        query = extract_page_query(body, self.user_query)
        if not query:
            return []
        candidates = extract_text_chunks(body, min_word_threshold)
        if not candidates:
            return []
        corpus = [clean_tokens(chunk.lower().split())
                  for _, chunk, _, _ in candidates]
        tokenized_query = clean_tokens(query.lower().split())
        bm25 = _BM25Okapi(corpus)
        scores = bm25.get_scores(tokenized_query)
        selected = []
        for score, (index, chunk, tag_type, tag) in zip(scores, candidates):
            weight = self.PRIORITY_TAGS.get(tag.name, 1.0)
            if score * weight >= self.bm25_threshold:
                selected.append((index, chunk, tag))
        if not selected:
            return []
        selected.sort(key=lambda x: x[0])   # original document order
        return [clean_element(tag) for _, _, tag in selected]


# ---------------------------------------------------------------------------
# PruningContentFilter (content_filter_strategy.py:533-779)
# ---------------------------------------------------------------------------


class PruningContentFilter:
    TAG_IMPORTANCE = {
        "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
        "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
    }
    TAG_WEIGHTS = {
        "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
        "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
        "h4": 0.9, "h5": 0.8, "h6": 0.7,
    }
    METRIC_WEIGHTS = {
        "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
        "class_id_weight": 0.1, "text_length": 0.1,
    }

    def __init__(self, user_query: str | None = None,
                 min_word_threshold: int | None = None,
                 threshold_type: str = "fixed", threshold: float = 0.48):
        self.min_word_threshold = min_word_threshold
        self.threshold_type = threshold_type
        self.threshold = threshold

    def filter_content(self, html: str,
                       min_word_threshold: int | None = None) -> list[str]:
        # reference quirk kept: PruningContentFilter.filter_content accepts
        # min_word_threshold but never reads it — only the CONSTRUCTOR's
        # value reaches _compute_composite_score
        # (content_filter_strategy.py:626-665)
        if not html or not isinstance(html, str):
            return []
        body = parse_tree(html)
        root = _root_of(body)
        for tag in _EXCLUDED_TAGS:
            for el in root.find_all(tag):
                el.decompose()
        self._prune_tree(body)
        blocks = []
        for el in body.children:
            if isinstance(el, str):
                continue
            if len(el.get_text(strip=True)) > 0:
                blocks.append(el.outer_html())
        return blocks

    def _prune_tree(self, node: Node) -> None:
        if not isinstance(node, Node):
            return
        text_len = len(node.get_text(strip=True))
        tag_len = len(node.inner_html())
        link_text_len = sum(
            len(s.strip())
            for s in (a.string for a in node.find_all("a", recursive=False))
            if s
        )
        score = self._composite_score(node, text_len, tag_len,
                                      link_text_len)
        if self.threshold_type == "fixed":
            should_remove = score < self.threshold
        else:
            tag_importance = self.TAG_IMPORTANCE.get(node.name, 0.7)
            text_ratio = text_len / tag_len if tag_len > 0 else 0
            link_ratio = link_text_len / text_len if text_len > 0 else 1
            threshold = self.threshold
            if tag_importance > 1:
                threshold *= 0.8
            if text_ratio > 0.4:
                threshold *= 0.9
            if link_ratio > 0.6:
                threshold *= 1.2
            should_remove = score < threshold
        if should_remove:
            node.decompose()
        else:
            for child in [c for c in node.children if isinstance(c, Node)]:
                self._prune_tree(child)

    def _composite_score(self, node: Node, text_len: int, tag_len: int,
                         link_text_len: int) -> float:
        if self.min_word_threshold:
            word_count = node.get_text(strip=True).count(" ") + 1
            if word_count < self.min_word_threshold:
                return -1.0
        score = 0.0
        total = 0.0
        w = self.METRIC_WEIGHTS
        score += w["text_density"] * (text_len / tag_len if tag_len else 0)
        total += w["text_density"]
        score += w["link_density"] * (
            1 - (link_text_len / text_len if text_len else 0))
        total += w["link_density"]
        score += w["tag_weight"] * self.TAG_WEIGHTS.get(node.name, 0.5)
        total += w["tag_weight"]
        class_score = 0.0
        classes = node.attrs.get("class", "")
        if classes and _NEGATIVE.search(classes):
            class_score -= 0.5
        element_id = node.attrs.get("id", "")
        if element_id and _NEGATIVE.search(element_id):
            class_score -= 0.5
        score += w["class_id_weight"] * max(0, class_score)
        total += w["class_id_weight"]
        score += w["text_length"] * math.log(text_len + 1)
        total += w["text_length"]
        return score / total if total > 0 else 0.0


def fit_markdown_from_html(html: str, url: str = "",
                           content_filter=None) -> dict:
    """The reference fit-markdown contract
    (markdown_generation_strategy.py / MarkdownGenerationResult): run the
    content filter, join the surviving blocks into ``fit_html`` and
    convert THAT through the html2text-fidelity converter (md_compat —
    the same converter the reference applies to fit_html). Returns
    {fit_html, fit_markdown, n_blocks}."""
    from .md_compat import html_to_markdown_compat

    flt = content_filter or PruningContentFilter()
    blocks = flt.filter_content(html)
    fit_html = "\n".join(blocks)
    fit_md = html_to_markdown_compat(fit_html, url) if fit_html else ""
    return {"fit_html": fit_html, "fit_markdown": fit_md,
            "n_blocks": len(blocks)}


def markdown_result(html: str, url: str = "", content_filter=None,
                    citations: bool = True) -> dict:
    """The full MarkdownGenerationResult surface (models.py:119-127):
    raw_markdown via the html2text-fidelity converter,
    markdown_with_citations + references_markdown via the reference's
    citation law, fit_html/fit_markdown via the content filter."""
    from .md_compat import convert_links_to_citations, \
        html_to_markdown_compat

    raw = html_to_markdown_compat(html, url)
    with_cit, refs = (convert_links_to_citations(raw, url)
                      if citations else (raw, ""))
    fit = fit_markdown_from_html(html, url, content_filter)
    return {
        "raw_markdown": raw,
        "markdown_with_citations": with_cit,
        "references_markdown": refs,
        "fit_html": fit["fit_html"],
        "fit_markdown": fit["fit_markdown"],
    }
