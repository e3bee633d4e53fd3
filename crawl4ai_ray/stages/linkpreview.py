"""M24 — per-link head_data extraction + link preview scoring.

Behavioral port of the reference's link-preview subsystem re-expressed
Ray-Data-first:

- filter law: link_preview.py:112-176 (_filter_links — include internal/
  external, fnmatch include/exclude, max_links cap BEFORE the ordered
  dedup);
- head parse law: async_url_seeder.py:89-141 (_parse_head — title,
  lowercased meta keys, charset, link rels split on spaces, JSON-LD);
- text context law: async_url_seeder.py:1143-1194 (_extract_text_context
  — title + standard/OG/Twitter/DC meta + JSON-LD fields incl. @graph);
- scoring law: async_url_seeder.py:645-677 + 1380-1420 — BM25Okapi
  (k1=1.5 b=0.75 epsilon=0.25, negative idf → eps·avg_idf) over the
  page's link contexts, min-max normalized (all-equal → 0.5); URL
  string-match fallback (async_url_seeder.py:1196-1283) when a valid
  link has no head text;
- total-score law: utils.py:3258-3302 (calculate_total_score — 5.0
  neutral, intrinsic-only clamp, 70/30 intrinsic/contextual·10 blend);
- merge law: link_preview.py:276-394 (_merge_head_data — head_data /
  status / error / contextual / total attach, relevance_score echoed
  into head_data, per-page re-sort by relevance desc when any link
  scored).

Ray shape: the reference loops per page and fetches each link head inline
(async worker queue, link_preview.py:177-223). Here the *page batch* is
the parallel unit — ``link_preview_pipeline`` explodes links, dedups
target URLs across the batch (many pages link to the same target; the
reference refetches per page), head-fetches each unique target ONCE in
an actor pool, joins head rows back and rebuilds the per-page link
structs with a groupby(page) — no driver loop, no per-page refetch.
"""

from __future__ import annotations

import fnmatch
import json
import math
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions.textutils import calculate_link_intrinsic_score


@dataclass
class LinkPreviewConfig:
    """async_configs.py:668-708 surface."""
    include_internal: bool = True
    include_external: bool = False
    include_patterns: list | None = None
    exclude_patterns: list | None = None
    concurrency: int = 10
    timeout: int = 5
    max_links: int = 100
    query: str | None = None
    score_threshold: float | None = None
    verbose: bool = False


# ---------------------------------------------------------------------------
# head parsing (stdlib _parse_head)
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_META_RE = re.compile(r"<meta\b[^>]*>", re.I)
_LINK_RE = re.compile(r"<link\b[^>]*>", re.I)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+)")
_JSONLD_RE = re.compile(
    r"<script[^>]+type=[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    re.I | re.S)


def _attrs(tag: str) -> dict:
    out = {}
    for m in _ATTR_RE.finditer(tag):
        v = m.group(2)
        if v[:1] in "\"'":
            v = v[1:-1]
        out[m.group(1).lower()] = v
    return out


def parse_head_data(src: str) -> dict:
    """_parse_head law (async_url_seeder.py:89-141): title (stripped),
    meta keyed by lowercase name|property|http-equiv, charset, link rels
    (space-separated rel values each get an entry), JSON-LD list."""
    info: dict = {"title": None, "charset": None, "meta": {}, "link": {},
                  "jsonld": []}
    m = _TITLE_RE.search(src)
    if m:
        info["title"] = m.group(1).strip()
    for tag in _META_RE.findall(src):
        a = _attrs(tag)
        k = a.get("name") or a.get("property") or a.get("http-equiv")
        if k:
            info["meta"][k.lower()] = a.get("content", "")
        elif "charset" in a:
            info["charset"] = a["charset"].lower()
    for tag in _LINK_RE.findall(src):
        a = _attrs(tag)
        rel_attr = a.get("rel", "")
        if not rel_attr:
            continue
        entry = {k: a[k] for k in ("href", "as", "type", "hreflang")
                 if k in a}
        for rel in rel_attr.lower().split():
            info["link"].setdefault(rel, []).append(entry)
    for m in _JSONLD_RE.finditer(src):
        try:
            info["jsonld"].append(json.loads(m.group(1).strip()))
        except json.JSONDecodeError:
            pass
    return info


_META_CONTEXT_KEYS = (
    "description", "keywords", "author", "subject", "summary", "abstract",
    "og:title", "og:description", "og:site_name", "article:tag",
    "twitter:title", "twitter:description", "twitter:image:alt",
    "dc.title", "dc.description", "dc.subject", "dc.creator",
)


def extract_text_context(head_data: dict) -> str:
    """_extract_text_context law (async_url_seeder.py:1143-1194)."""
    parts = []
    if head_data.get("title"):
        parts.append(head_data["title"])
    meta = head_data.get("meta", {})
    for key in _META_CONTEXT_KEYS:
        if meta.get(key):
            parts.append(meta[key])
    for jd in head_data.get("jsonld", []):
        if isinstance(jd, dict):
            for f in ("name", "headline", "description", "abstract",
                      "keywords"):
                if f in jd:
                    if isinstance(jd[f], str):
                        parts.append(jd[f])
                    elif isinstance(jd[f], list):
                        parts.extend(str(x) for x in jd[f] if x)
            if isinstance(jd.get("@graph"), list):
                for item in jd["@graph"]:
                    if isinstance(item, dict):
                        for f in ("name", "headline", "description"):
                            if isinstance(item.get(f), str):
                                parts.append(item[f])
    return " ".join(filter(None, parts))


# ---------------------------------------------------------------------------
# scoring laws
# ---------------------------------------------------------------------------


def bm25_okapi_scores(query: str, documents: list[str],
                      k1: float = 1.5, b: float = 0.75,
                      epsilon: float = 0.25) -> list[float]:
    """BM25Okapi over the page's link contexts + min-max normalization
    (async_url_seeder.py:1380-1420 law, incl. the all-equal → 0.5 rule).
    BM25Okapi per the published algorithm: idf = ln((N-df+0.5)/(df+0.5)),
    negative idfs replaced by epsilon × average idf."""
    if not query or not documents:
        return [0.0] * len(documents)
    q_tokens = query.lower().split()
    docs = [d.lower().split() for d in documents]
    if all(len(d) == 0 for d in docs):
        return [0.0] * len(documents)
    n = len(docs)
    doc_len = np.array([len(d) for d in docs], dtype=np.float64)
    avgdl = doc_len.mean()
    freqs = [dict() for _ in docs]
    df: dict[str, int] = {}
    for i, d in enumerate(docs):
        for w in d:
            freqs[i][w] = freqs[i].get(w, 0) + 1
        for w in set(d):
            df[w] = df.get(w, 0) + 1
    idf: dict[str, float] = {}
    neg = []
    s = 0.0
    for w, f in df.items():
        v = math.log(n - f + 0.5) - math.log(f + 0.5)
        idf[w] = v
        s += v
        if v < 0:
            neg.append(w)
    avg_idf = s / len(idf)
    for w in neg:
        idf[w] = epsilon * avg_idf
    scores = np.zeros(n)
    denom_base = k1 * (1 - b + b * doc_len / avgdl)
    for q in q_tokens:
        qf = np.array([f.get(q, 0) for f in freqs], dtype=np.float64)
        scores += idf.get(q, 0.0) * (qf * (k1 + 1) / (qf + denom_base))
    lo, hi = scores.min(), scores.max()
    if hi == lo:
        return [0.5] * n
    return [float((x - lo) / (hi - lo)) for x in scores]


def url_relevance_score(query: str, url: str) -> float:
    """URL string-match fallback (async_url_seeder.py:1196-1283)."""
    from urllib.parse import urlparse

    query_lower = query.lower()
    parsed = urlparse(url)
    domain = parsed.netloc.replace("www.", "")
    path = parsed.path.strip("/")
    parts = domain.split(".") + [p for p in path.split("/") if p]
    if parsed.query:
        for param in parsed.query.split("&"):
            if "=" in param:
                k, v = param.split("=", 1)
                parts.extend([k, v])
    scores = []
    q_tokens = query_lower.split()
    for part in parts:
        pl = part.lower()
        if query_lower in pl:
            scores.append(1.0)
        elif pl in query_lower:
            scores.append(0.9)
    for token in q_tokens:
        token_scores = []
        for part in parts:
            pl = part.lower()
            if token in pl:
                token_scores.append(0.7 * len(token) / len(pl))
            elif pl in token:
                token_scores.append(0.6 * len(pl) / len(token))
        if token_scores:
            scores.append(max(token_scores))

    def ngrams(t, k=3):
        return set(t[i:i + k] for i in range(len(t) - k + 1))

    url_text = " ".join(parts).lower()
    if len(query_lower) >= 3 and len(url_text) >= 3:
        qn, un = ngrams(query_lower), ngrams(url_text)
        if qn and un:
            union = len(qn | un)
            scores.append(0.5 * (len(qn & un) / union if union else 0))
    if not scores:
        return 0.0
    scores.sort(reverse=True)
    num = sum(s / (i + 1) for i, s in enumerate(scores))
    den = sum(1 / (i + 1) for i in range(len(scores)))
    return min(num / den, 1.0)


def calculate_total_score(intrinsic_score=None, contextual_score=None,
                          score_links_enabled=False,
                          query_provided=False) -> float:
    """utils.py:3258-3302 law."""
    if not score_links_enabled:
        return 5.0
    intrinsic = intrinsic_score if intrinsic_score is not None else 0.0
    contextual = contextual_score if contextual_score is not None else 0.0
    if not query_provided or contextual_score is None:
        return max(0.0, min(intrinsic, 10.0))
    contextual_scaled = min(contextual * 10.0, 10.0)
    total = intrinsic * 0.7 + contextual_scaled * 0.3
    return max(0.0, min(total, 10.0))


# ---------------------------------------------------------------------------
# filter + merge laws
# ---------------------------------------------------------------------------


def filter_preview_links(links: list[dict],
                         cfg: LinkPreviewConfig) -> list[str]:
    """_filter_links law (link_preview.py:112-176) over one page's link
    structs ({'href', 'internal', ...}). Quirk preserved: max_links is
    applied BEFORE the ordered dedup."""
    urls = []
    if cfg.include_internal:
        urls.extend(l["href"] for l in links if l.get("internal")
                    and l.get("href"))
    if cfg.include_external:
        urls.extend(l["href"] for l in links if not l.get("internal")
                    and l.get("href"))
    if cfg.include_patterns:
        urls = [u for u in urls
                if any(fnmatch.fnmatch(u, p) for p in cfg.include_patterns)]
    if cfg.exclude_patterns:
        urls = [u for u in urls
                if not any(fnmatch.fnmatch(u, p)
                           for p in cfg.exclude_patterns)]
    if cfg.max_links > 0 and len(urls) > cfg.max_links:
        urls = urls[:cfg.max_links]
    seen: set = set()
    out = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def score_head_results(results: list[dict],
                       cfg: LinkPreviewConfig) -> list[dict]:
    """_apply_bm25_scoring + threshold + sort laws
    (async_url_seeder.py:626-677): BM25 over the contexts of valid
    results with head text, URL fallback otherwise; then score_threshold
    filter and relevance sort."""
    if cfg.query:
        contexts, with_ctx = [], []
        for r in results:
            if r.get("status") == "valid" and r.get("head_data"):
                ctx = extract_text_context(r["head_data"])
                if ctx:
                    contexts.append(ctx)
                    with_ctx.append(r)
                else:
                    r["relevance_score"] = float(
                        url_relevance_score(cfg.query, r["url"]))
            elif r.get("status") == "valid":
                r["relevance_score"] = float(
                    url_relevance_score(cfg.query, r["url"]))
        if contexts:
            for r, s in zip(with_ctx, bm25_okapi_scores(cfg.query,
                                                        contexts)):
                r["relevance_score"] = float(s)
    if cfg.score_threshold is not None:
        results = [r for r in results
                   if r.get("relevance_score", 0) >= cfg.score_threshold]
    if any("relevance_score" in r for r in results):
        results = sorted(results,
                         key=lambda x: x.get("relevance_score", 0),
                         reverse=True)
    return results


def merge_head_data(links: list[dict], head_results: list[dict],
                    *, score_links: bool = False,
                    query_provided: bool = False) -> list[dict]:
    """_merge_head_data law (link_preview.py:276-394) on link dicts.
    Returns new link dicts with head_data/head_extraction_status/
    contextual/total attached and the per-page relevance re-sort
    applied (internal and external sorted separately, stable)."""
    by_url = {}
    for r in head_results:
        if r.get("url"):
            by_url[r["url"]] = r

    def enrich(link: dict) -> dict:
        r = by_url.get(link.get("href"))
        if r is None:
            return dict(link)
        contextual = r.get("relevance_score")
        head = dict(r.get("head_data") or {})
        if contextual is not None:
            head["relevance_score"] = contextual
        out = dict(link)
        out.update({
            "head_data": head,
            "head_extraction_status": r.get("status", "unknown"),
            "head_extraction_error": r.get("error"),
            "contextual_score": contextual,
            "total_score": calculate_total_score(
                intrinsic_score=link.get("intrinsic_score"),
                contextual_score=contextual,
                score_links_enabled=score_links,
                query_provided=query_provided,
            ),
        })
        return out

    internal = [enrich(l) for l in links if l.get("internal")]
    external = [enrich(l) for l in links if not l.get("internal")]

    def relevance(l):
        hd = l.get("head_data")
        if hd and "relevance_score" in hd:
            return hd["relevance_score"]
        return 0.0

    if any(l.get("head_data") and "relevance_score" in l["head_data"]
           for l in internal + external):
        internal.sort(key=relevance, reverse=True)
        external.sort(key=relevance, reverse=True)
    return internal + external


def preview_total_scores(links: list[dict], cfg: LinkPreviewConfig,
                         fetch_stage: "HeadDataFetchStage",
                         *, score_links: bool = True) -> dict:
    """One page's links → {href: total_score} for the crawl integration:
    filter law → head fetch → scoring law → merge law; links the filter
    skipped (or the threshold dropped) still get the total-score law with
    contextual=None (intrinsic clamp / 5.0 neutral), so best-first always
    has a number per candidate."""
    query_provided = bool(cfg.query)
    enriched_links = [
        {**l, "intrinsic_score": calculate_link_intrinsic_score(
            l.get("href") or "", l.get("text") or "")
            if score_links else None}
        for l in links
    ]
    head_results = []
    for u in filter_preview_links(links, cfg):
        try:
            st, err, hd = fetch_stage.fetch_head(u)
        except Exception as exc:
            st, err, hd = "failed", str(exc), {}
        head_results.append({"url": u, "status": st, "error": err,
                             "head_data": hd})
    head_results = score_head_results(head_results, cfg)
    merged = merge_head_data(enriched_links, head_results,
                             score_links=score_links,
                             query_provided=query_provided)
    out = {}
    for l in merged:
        total = l.get("total_score")
        if total is None:
            total = calculate_total_score(
                intrinsic_score=l.get("intrinsic_score"),
                contextual_score=None,
                score_links_enabled=score_links,
                query_provided=query_provided,
            )
        out[l["href"]] = float(total)
    return out


_PREVIEW_STAGE_CACHE: dict = {}


def cached_head_stage(site_cfg: dict | None) -> "HeadDataFetchStage":
    """Per-worker HeadDataFetchStage cache for in-task preview scoring
    (same pattern as the fetch stage's site cache — the synthetic site is
    a pure function of its config)."""
    key = json.dumps(site_cfg or {}, sort_keys=True)
    st = _PREVIEW_STAGE_CACHE.get(key)
    if st is None:
        st = HeadDataFetchStage(site_cfg)
        _PREVIEW_STAGE_CACHE[key] = st
    return st


# ---------------------------------------------------------------------------
# Ray stages
# ---------------------------------------------------------------------------


class HeadDataFetchStage:
    """Actor-pool stage: unique target URLs → head_data rows. One fetch
    per unique URL per batch pipeline (the reference refetches per page;
    the cross-page dedup is the Ray-side win). Fetcher is pluggable
    exactly like the crawl fetch stage (synthetic site here; an HTTP
    head-fetcher drops in via ``fetcher``)."""

    def __init__(self, site_cfg: dict | None = None):
        from ..sources.synthetic_web import SiteConfig, SyntheticWeb

        self.site = SyntheticWeb(SiteConfig(**site_cfg) if site_cfg
                                 else None)

    def fetch_head(self, url: str) -> tuple[str, str | None, dict]:
        """→ (status, error, head_data)."""
        from .headpeek import peek_head

        page = self.site.page(url)
        if page["status"] != 200:
            return "not_valid", f"HTTP {page['status']}", {}
        return "valid", None, parse_head_data(peek_head(page["html"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        status, errors, heads = [], [], []
        for u in urls:
            try:
                st, err, hd = self.fetch_head(u)
            except Exception as exc:  # failed entry law (seeder :597)
                st, err, hd = "failed", str(exc), {}
            status.append(st)
            errors.append(err)
            heads.append(json.dumps(hd))
        return pa.table({
            "url": batch.column("url"),
            "status": pa.array(status, type=pa.string()),
            "error": pa.array(errors, type=pa.string()),
            "head_json": pa.array(heads, type=pa.large_string()),
        })


def link_preview_pipeline(docs_ds, cfg: LinkPreviewConfig,
                          site_cfg: dict | None = None,
                          *, score_links: bool = False,
                          concurrency=(1, 4)):
    """Documents (page_url/seq + links list<struct>) → per-page enriched
    link rows. Explode → per-page filter law → cross-page URL dedup →
    actor-pool head fetch → hash-join back → groupby(page).map_groups
    merge law. Returns one row per (page, link) with head/contextual/
    total columns, links ordered per the re-sort law (link_rank)."""
    import ray.data as rd

    from ..pipelines.dedup import _join_parts

    query_provided = bool(cfg.query)

    def explode(batch: pa.Table) -> pa.Table:
        rows = []
        for seq, url, links in zip(batch.column("seq").to_pylist(),
                                   batch.column("url").to_pylist(),
                                   batch.column("links").to_pylist()):
            links = links or []
            wanted = set(filter_preview_links(links, cfg))
            for idx, l in enumerate(links):
                rows.append({
                    "page_seq": seq,
                    "page_url": url,
                    "link_idx": idx,
                    "href": l.get("href") or "",
                    "text": l.get("text") or "",
                    "title": l.get("title") or "",
                    "internal": bool(l.get("internal")),
                    "peek": l.get("href") in wanted,
                })
        if not rows:
            return pa.table({
                "page_seq": pa.array([], pa.int64()),
                "page_url": pa.array([], pa.string()),
                "link_idx": pa.array([], pa.int32()),
                "href": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "title": pa.array([], pa.string()),
                "internal": pa.array([], pa.bool_()),
                "peek": pa.array([], pa.bool_()),
            })
        return pa.Table.from_pylist(rows)

    exploded = docs_ds.map_batches(explode, batch_format="pyarrow") \
        .materialize()

    # unique peek targets across ALL pages — fetched once each
    # (distributed distinct: per-batch unique combiner + groupby)
    from ray.data.aggregate import Count

    targets_ds = exploded.filter(expr="peek == True") \
        .map_batches(lambda t: pa.table(
            {"url": pa.array(sorted(set(t.column("href").to_pylist())),
                             type=pa.string())}),
            batch_format="pyarrow") \
        .groupby("url").aggregate(Count(alias_name="_n")) \
        .select_columns(["url"])
    heads = targets_ds.map_batches(
        HeadDataFetchStage,
        fn_constructor_kwargs={"site_cfg": site_cfg},
        batch_format="pyarrow", batch_size=256,
        concurrency=concurrency,
    )

    joined = exploded.join(
        heads, "left_outer",
        num_partitions=_join_parts(exploded, heads),
        on=("href",), right_on=("url",),
    )

    def per_page(g):
        import pandas as pd

        g = g.sort_values("link_idx", kind="mergesort")
        links = []
        head_results = []
        head_seen: set = set()
        for _, row in g.iterrows():
            link = {
                "href": row["href"], "text": row["text"],
                "title": row["title"], "internal": bool(row["internal"]),
                "intrinsic_score": calculate_link_intrinsic_score(
                    row["href"], row["text"]) if score_links else None,
            }
            links.append(link)
            if bool(row["peek"]) and isinstance(row.get("status"), str) \
                    and row["href"] not in head_seen:
                head_seen.add(row["href"])
                head_results.append({
                    "url": row["href"],
                    "status": row["status"],
                    "error": row["error"],
                    "head_data": json.loads(row["head_json"])
                    if row["head_json"] else {},
                })
        head_results = score_head_results(head_results, cfg)
        merged = merge_head_data(links, head_results,
                                 score_links=score_links,
                                 query_provided=query_provided)
        return pd.DataFrame({
            "page_seq": [int(g["page_seq"].iloc[0])] * len(merged),
            "page_url": [g["page_url"].iloc[0]] * len(merged),
            "link_rank": np.arange(len(merged), dtype=np.int32),
            "href": [l["href"] for l in merged],
            "internal": [l["internal"] for l in merged],
            "head_status": [l.get("head_extraction_status") or ""
                            for l in merged],
            "head_title": [(l.get("head_data") or {}).get("title") or ""
                           for l in merged],
            "intrinsic_score": [l.get("intrinsic_score") for l in merged],
            "contextual_score": [l.get("contextual_score")
                                 for l in merged],
            "total_score": [l.get("total_score") for l in merged],
        })

    return joined.groupby("page_seq").map_groups(per_page,
                                                 batch_format="pandas")
