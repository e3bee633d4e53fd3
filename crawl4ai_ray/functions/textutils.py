"""Scalar text/JSON utilities (SURVEY §2.8) — behavior-parity with the
reference's utils helpers, as pure batch-UDF functions.

- chunk_documents / merge semantics: token-threshold chunking with overlap
  (/root/reference/crawl4ai/utils.py:75-159)
- sanitize_input_encode (:776-791), escape_json_string (:793-822)
- split_and_parse_json_objects (:706-749)
- clean_tokens: stopword/punctuation cleanup (:2425-2652 behavioral subset)
- calculate_link_intrinsic_score (M24, :3143-3256 behavioral subset):
  URL-structure + link-text quality + context relevance in [0, 10]
"""

from __future__ import annotations

import json
import re
from collections import deque


def chunk_documents(documents, chunk_token_threshold: int, overlap: int,
                    word_token_rate: float = 0.75, tokenizer=None):
    """Streaming token-threshold chunker with overlap (reference
    utils.py:75-159 law: contribution-weighted counts, overlap re-queued)."""
    token_queue: deque = deque()
    contribution_queue: deque = deque()
    current = 0.0
    for doc in documents:
        if tokenizer:
            tokens = tokenizer(doc)
            contribs = [1.0] * len(tokens)
        else:
            tokens = doc.split()
            contribs = [word_token_rate] * len(tokens)
        token_queue.extend(tokens)
        contribution_queue.extend(contribs)
        current += sum(contribs)
        while current >= chunk_token_threshold:
            chunk_tokens: list = []
            chunk_contrib: list = []
            total = 0.0
            while contribution_queue:
                nxt = contribution_queue[0]
                if total + nxt > chunk_token_threshold:
                    break
                total += nxt
                chunk_contrib.append(contribution_queue.popleft())
                chunk_tokens.append(token_queue.popleft())
            if not chunk_contrib:
                chunk_contrib.append(contribution_queue.popleft())
                chunk_tokens.append(token_queue.popleft())
            overlap_total = 0.0
            overlap_idx = 0
            for c in reversed(chunk_contrib):
                if overlap_total + c > overlap:
                    break
                overlap_total += c
                overlap_idx += 1
            if overlap_idx > 0:
                token_queue.extendleft(reversed(chunk_tokens[-overlap_idx:]))
                contribution_queue.extendleft(
                    reversed(chunk_contrib[-overlap_idx:])
                )
                current += overlap_total
            current -= sum(chunk_contrib)
            yield " ".join(
                chunk_tokens[: len(chunk_tokens) - overlap_idx]
                if overlap_idx else chunk_tokens
            )
    if token_queue:
        yield " ".join(token_queue)


def sanitize_input_encode(text: str) -> str:
    if not text:
        return ""
    return text.encode("utf-8", errors="ignore").decode("utf-8")


def escape_json_string(s: str) -> str:
    s = s.replace("\\", "\\\\").replace('"', '\\"')
    for ch, esc in (("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"),
                    ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(ch, esc)
    return re.sub(
        r"[\x00-\x1f\x7f-\x9f]",
        lambda m: "\\u{:04x}".format(ord(m.group())), s,
    )


def split_and_parse_json_objects(json_string: str):
    """Brace-depth splitter + per-segment parse → (parsed, unparsed)."""
    if json_string.startswith("[") and json_string.endswith("]"):
        json_string = json_string[1:-1].strip()
    segments = []
    depth = 0
    start = 0
    for i, ch in enumerate(json_string):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                segments.append(json_string[start:i + 1])
    parsed, unparsed = [], []
    for seg in segments:
        try:
            parsed.append(json.loads(seg))
        except json.JSONDecodeError:
            unparsed.append(seg)
    return parsed, unparsed


_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with this these those i you your we our they them "
    "or not but if then else when where who whom which what how why all "
    "any both each few more most other some such no nor only own same so "
    "than too very can just should now".split()
)
_PUNCT_RE = re.compile(r"[^\w\s]")


def clean_tokens(tokens) -> list[str]:
    """Drop stopwords, punctuation-only and single-char tokens (reference
    clean_tokens behavioral subset)."""
    out = []
    for t in tokens:
        t = t.strip().lower()
        if len(t) <= 1:
            continue
        if t in _STOPWORDS:
            continue
        if _PUNCT_RE.fullmatch(t):
            continue
        out.append(t)
    return out


def preprocess_html_for_schema(html: str, *, text_threshold: int = 500,
                               attr_value_threshold: int = 200,
                               max_size: int = 300_000) -> str:
    """M8 fit_html preprocessor (reference utils.py:2883-3026 law): truncate
    long text runs and attribute values, cap total size — prunes HTML for
    schema-extraction work without altering structure."""
    if not html:
        return ""

    def _trunc_attr(m: re.Match) -> str:
        val = m.group(2)
        if len(val) > attr_value_threshold:
            val = val[:attr_value_threshold] + "..."
        return f'{m.group(1)}="{val}"'

    out = re.sub(r'([\w-]+)="([^"]*)"', _trunc_attr, html)
    # truncate long text between tags
    parts = re.split(r"(<[^>]+>)", out)
    for i, p in enumerate(parts):
        if not p.startswith("<") and len(p) > text_threshold:
            parts[i] = p[:text_threshold] + "..."
    out = "".join(parts)
    return out[:max_size] if len(out) > max_size else out


_BLOCKY = frozenset(
    "html head body div section article main header footer nav ul ol li "
    "table thead tbody tr p h1 h2 h3 h4 h5 h6 form".split()
)


def fast_format_html(html: str, indent: str = "  ") -> str:
    """M11 pretty-printer (reference fast_format_html utils.py:2076-2120
    behavior): newline+indent block-level tags; inline content untouched."""
    parts = re.split(r"(<[^>]+>)", html or "")
    out: list[str] = []
    depth = 0
    for p in parts:
        if not p.strip():
            continue
        if p.startswith("</"):
            tag = p[2:].strip(" >").lower()
            if tag in _BLOCKY:
                depth = max(0, depth - 1)
                out.append("\n" + indent * depth + p)
            else:
                out.append(p)
        elif p.startswith("<"):
            tag = p[1:].split()[0].strip(">/").lower()
            if tag in _BLOCKY:
                out.append("\n" + indent * depth + p)
                if not p.endswith("/>"):
                    depth += 1
            else:
                out.append(p)
        else:
            out.append(p.strip())
    return "".join(out).strip()


_GENERIC_LINK_TEXT = frozenset(
    {"click here", "read more", "more", "here", "link", "this"}
)


def calculate_link_intrinsic_score(href: str, text: str,
                                   context: str = "",
                                   page_keywords=None) -> float:
    """Link quality in [0, 10]: URL structure (depth, params, extension),
    link-text quality (length, genericity), context keyword relevance —
    the reference's factor families (utils.py:3143-3256)."""
    from urllib.parse import urlparse

    score = 5.0
    try:
        p = urlparse(href)
    except Exception:
        return 0.0
    segs = [s for s in p.path.split("/") if s]
    if len(segs) <= 3:
        score += 1.0
    elif len(segs) > 6:
        score -= 1.0
    if p.query:
        score -= 0.5
    if p.fragment:
        score -= 0.5
    ext = segs[-1].rsplit(".", 1)[-1].lower() if segs and "." in segs[-1] else ""
    if ext in ("html", "htm", ""):
        score += 0.5
    elif ext in ("jpg", "png", "gif", "zip", "pdf", "exe"):
        score -= 1.5
    t = (text or "").strip()
    if 3 <= len(t.split()) <= 10:
        score += 1.5
    elif not t:
        score -= 1.5
    if t.lower() in _GENERIC_LINK_TEXT:
        score -= 1.0
    if page_keywords:
        blob = (t + " " + context).lower()
        hits = sum(1 for k in page_keywords if k.lower() in blob)
        score += min(2.0, hits * 0.5)
    return max(0.0, min(10.0, score))
