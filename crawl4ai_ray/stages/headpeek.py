"""Head-peek stage + network-touching URL filters (M15/M16, S10).

The reference's ContentRelevanceFilter (BM25 over head content,
/root/reference/crawl4ai/deep_crawling/filters.py:501-573) and SEOFilter
(:576-686) fetch the page head before deciding — so in this engine they are
an actor-pool ``map_batches`` stage over candidate URLs, not pure
predicates (SURVEY.md §2.2 M15/M16). HeadPeekr semantics (utils.py:
2826-2881): fetch only up to ``</head>``, extract title + meta tags.

Scoring laws mirror the reference: simplified-IDF BM25 with k1=1.2 b=0.75
avgdl=1000 over title×3 + description×2 + keywords + all meta values; SEO
factors/weights per DEFAULT_WEIGHTS with threshold 0.65.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np
import pyarrow as pa

# reference HeadPeekr laws (utils.py:2859-2881), quirks included: the
# title regex matches BARE <title> only and returns the raw capture (no
# whitespace collapse); meta tags match name/property and content in ANY
# attribute order, keys preserve case (so <meta name="Description"> does
# NOT feed the description factors — the reference reads exact keys)
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.I | re.S)
_META_TAG_RE = re.compile(r"<meta[^>]+>")
_META_NAME_RE = re.compile(r"name=[\"'](.*?)[\"']")
_META_PROP_RE = re.compile(r"property=[\"'](.*?)[\"']")
_META_CONTENT_RE = re.compile(r"content=[\"'](.*?)[\"']")
_LDJSON_RE = re.compile(r'<script[^>]+type=["\']application/ld\+json', re.I)


def peek_head(html: str) -> str:
    """Truncate at </head> (HeadPeekr.fetch_head_section semantics)."""
    idx = html.lower().find("</head>")
    return html[: idx + 7] if idx != -1 else html


def get_title(head: str) -> str:
    m = _TITLE_RE.search(head)
    return m.group(1) if m else ""


def extract_meta_tags(head: str) -> dict:
    out: dict = {}
    for m in _META_TAG_RE.finditer(head):
        tag = m.group(0)
        name = _META_NAME_RE.search(tag)
        prop = _META_PROP_RE.search(tag)
        content = _META_CONTENT_RE.search(tag)
        if content and (name or prop):
            key = name.group(1) if name else prop.group(1)
            out[key] = content.group(1)
    return out


def bm25_head_score(head: str, query: str, *, k1: float = 1.2,
                    b: float = 0.75, avgdl: int = 1000) -> float:
    """Reference _bm25 over the weighted head document (filters.py:539-573)."""
    meta = extract_meta_tags(head)
    title = get_title(head)
    doc = " ".join(
        [title * 3, meta.get("description", "") * 2,
         meta.get("keywords", ""), " ".join(meta.values())]
    )
    doc_terms = doc.lower().split()
    doc_len = len(doc_terms)
    tf: dict = defaultdict(int)
    for t in doc_terms:
        tf[t] += 1
    score = 0.0
    for term in set(query.lower().split()):
        f = tf[term]
        idf = math.log((1 + 1) / (f + 0.5) + 1)
        score += idf * (f * (k1 + 1)) / (
            f + k1 * (1 - b + b * (doc_len / avgdl))
        )
    return score


def seo_score(head: str, url: str, keywords=None, weights=None) -> float:
    """Reference SEOFilter factor law (filters.py:576-686)."""
    from urllib.parse import urlparse

    w = weights or {
        "title_length": 0.15, "title_kw": 0.18, "meta_description": 0.12,
        "canonical": 0.10, "robot_ok": 0.20, "schema_org": 0.10,
        "url_quality": 0.15,
    }
    meta = extract_meta_tags(head)
    title = get_title(head)
    kw_re = (
        re.compile(r"\b(" + "|".join(map(re.escape, keywords)) + r")\b", re.I)
        if keywords else None
    )

    tl = len(title)
    title_length = 1.0 if 50 <= tl <= 60 else (
        0.7 if 40 <= tl < 50 or 60 < tl <= 70 else 0.3
    )
    title_kw = min(len(kw_re.findall(title)) * 0.3, 1.0) if kw_re else 0.0
    dl = len(meta.get("description", ""))
    meta_description = 1.0 if 140 <= dl <= 160 else (
        0.5 if 120 <= dl <= 200 else 0.2
    )
    canonical = meta.get("canonical")
    canonical_s = 0.5 if not canonical else (1.0 if canonical == url else 0.2)
    robot_ok = 1.0 if "noindex" not in meta.get("robots", "") else 0.0
    schema_org = 1.0 if _LDJSON_RE.search(head) else 0.0
    p = urlparse(url)
    uq = 1.0
    path = p.path.lower()
    if len(path) > 80:
        uq *= 0.7
    if re.search(r"\d{4}", path):
        uq *= 0.8
    if p.query:
        uq *= 0.6
    if "_" in path:
        uq *= 0.9
    scores = {
        "title_length": title_length, "title_kw": title_kw,
        "meta_description": meta_description, "canonical": canonical_s,
        "robot_ok": robot_ok, "schema_org": schema_org, "url_quality": uq,
    }
    return sum(w[k] * scores[k] for k in w)


class HeadPeekStage:
    """Actor-pool stage: fetch heads for a batch of candidate URLs and
    append title / meta / bm25 / seo columns. The fetcher is pluggable
    exactly like the crawl fetch stage (synthetic in tests)."""

    def __init__(self, site_cfg: dict | None = None, *, query: str = "",
                 seo_keywords=None):
        from ..sources.synthetic_web import SiteConfig, SyntheticWeb

        self.site = SyntheticWeb(SiteConfig(**site_cfg) if site_cfg else None)
        self.query = query
        self.seo_keywords = list(seo_keywords or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        titles, bm25s, seos = [], [], []
        for u in urls:
            page = self.site.page(u)
            head = peek_head(page["html"]) if page["status"] == 200 else ""
            titles.append(get_title(head))
            bm25s.append(bm25_head_score(head, self.query)
                         if self.query else 0.0)
            seos.append(seo_score(head, u, self.seo_keywords))
        return (
            batch.append_column("head_title",
                                pa.array(titles, type=pa.string()))
            .append_column(
                "bm25",
                pa.array(np.round(np.array(bm25s), 6), type=pa.float64()),
            )
            .append_column(
                "seo",
                pa.array(np.round(np.array(seos), 6), type=pa.float64()),
            )
        )


def relevance_filter_pipeline(urls, site_cfg: dict, query: str,
                              threshold: float):
    """ContentRelevanceFilter as a pipeline: urls in → urls with
    bm25 >= threshold out."""
    import ray.data as rd
    import pyarrow.compute as pc

    ds = rd.from_items([{"url": u} for u in urls])
    scored = ds.map_batches(
        HeadPeekStage,
        fn_constructor_kwargs={"site_cfg": site_cfg, "query": query},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )
    return scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("bm25"),
                                            pa.scalar(threshold))),
        batch_format="pyarrow",
    )
