"""M24 link preview: head-parse / scoring / filter / merge laws, the
distributed pipeline vs a pure-driver application of the same laws, and
the best-first crawl consuming total_score."""

import json
import math

import numpy as np
import pytest

from crawl4ai_ray.stages.linkpreview import (
    HeadDataFetchStage,
    LinkPreviewConfig,
    bm25_okapi_scores,
    calculate_total_score,
    extract_text_context,
    filter_preview_links,
    link_preview_pipeline,
    merge_head_data,
    parse_head_data,
    preview_total_scores,
    score_head_results,
    url_relevance_score,
)

SITE = {"n_hosts": 3}


# -- laws --------------------------------------------------------------------


def test_parse_head_data():
    html = """<html><head><title> My Page </title>
    <meta charset="UTF-8">
    <meta name="Description" content="about things">
    <meta property="og:title" content="OG Title">
    <meta http-equiv="refresh" content="30">
    <link rel="canonical icon" href="/c" type="text/html">
    <script type="application/ld+json">{"name": "Thing", "@graph":
      [{"headline": "H1"}]}</script>
    </head><body></body></html>"""
    h = parse_head_data(html)
    assert h["title"] == "My Page"
    assert h["charset"] == "utf-8"
    assert h["meta"]["description"] == "about things"   # lowercased key
    assert h["meta"]["og:title"] == "OG Title"
    assert h["meta"]["refresh"] == "30"
    assert [e["href"] for e in h["link"]["canonical"]] == ["/c"]
    assert [e["href"] for e in h["link"]["icon"]] == ["/c"]
    assert h["jsonld"][0]["name"] == "Thing"
    ctx = extract_text_context(h)
    assert "My Page" in ctx and "about things" in ctx
    assert "OG Title" in ctx and "Thing" in ctx and "H1" in ctx


def test_bm25_okapi_matches_published_algorithm():
    docs = ["the quick brown fox", "lazy dogs sleep all day",
            "quick quick foxes", "unrelated text entirely"]
    query = "quick fox"
    got = bm25_okapi_scores(query, docs)

    # independent computation of the published BM25Okapi algorithm
    k1, b, eps = 1.5, 0.75, 0.25
    tokenized = [d.lower().split() for d in docs]
    n = len(tokenized)
    avgdl = sum(len(d) for d in tokenized) / n
    df = {}
    for d in tokenized:
        for w in set(d):
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log(n - f + 0.5) - math.log(f + 0.5)
           for w, f in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    idf = {w: (eps * avg_idf if v < 0 else v) for w, v in idf.items()}
    raw = []
    for d in tokenized:
        s = 0.0
        for q in query.lower().split():
            f = d.count(q)
            s += idf.get(q, 0.0) * (f * (k1 + 1)
                                    / (f + k1 * (1 - b + b * len(d) / avgdl)))
        raw.append(s)
    lo, hi = min(raw), max(raw)
    want = [(x - lo) / (hi - lo) for x in raw]
    assert got == pytest.approx(want)


def test_bm25_edge_rules():
    assert bm25_okapi_scores("", ["a"]) == [0.0]
    assert bm25_okapi_scores("q", []) == []
    assert bm25_okapi_scores("q", ["", ""]) == [0.0, 0.0]
    # identical docs → identical raw scores → all 0.5
    assert bm25_okapi_scores("a", ["a b", "a b"]) == [0.5, 0.5]


def test_url_relevance_score():
    hi = url_relevance_score("widgets", "http://shop.test/widgets/blue")
    lo = url_relevance_score("widgets", "http://news.test/politics/x")
    assert 0.0 <= lo < hi <= 1.0
    assert url_relevance_score("anything", "http://x.test/") >= 0.0


def test_calculate_total_score_law():
    assert calculate_total_score(8.0, 0.9, False, True) == 5.0
    assert calculate_total_score(8.0, None, True, True) == 8.0
    assert calculate_total_score(12.0, None, True, False) == 10.0
    assert calculate_total_score(None, 0.5, True, True) == \
        pytest.approx(0.0 * 0.7 + 5.0 * 0.3)
    assert calculate_total_score(8.0, 0.5, True, True) == \
        pytest.approx(8.0 * 0.7 + 5.0 * 0.3)
    assert calculate_total_score(10.0, 1.0, True, True) == \
        pytest.approx(10.0)


def test_filter_law_max_links_before_dedup():
    links = [{"href": f"http://h.test/{i % 2}", "internal": True}
             for i in range(6)]
    # quirk: the cap truncates the raw (pre-dedup) list — 3 raw → 2 unique
    cfg = LinkPreviewConfig(max_links=3)
    assert filter_preview_links(links, cfg) == ["http://h.test/0",
                                                "http://h.test/1"]
    cfg = LinkPreviewConfig(max_links=1)
    assert filter_preview_links(links, cfg) == ["http://h.test/0"]
    # patterns
    cfg = LinkPreviewConfig(include_patterns=["*/0"])
    assert filter_preview_links(links, cfg) == ["http://h.test/0"]
    cfg = LinkPreviewConfig(exclude_patterns=["*/0"])
    assert filter_preview_links(links, cfg) == ["http://h.test/1"]
    # external links excluded by default
    ext = [{"href": "http://other.test/a", "internal": False}]
    assert filter_preview_links(ext, LinkPreviewConfig()) == []
    assert filter_preview_links(
        ext, LinkPreviewConfig(include_external=True)) == \
        ["http://other.test/a"]


def test_merge_law_enrich_and_resort():
    links = [
        {"href": "http://h.test/a", "text": "A", "internal": True,
         "intrinsic_score": 6.0},
        {"href": "http://h.test/b", "text": "B", "internal": True,
         "intrinsic_score": 4.0},
        {"href": "http://h.test/c", "text": "C", "internal": True,
         "intrinsic_score": 2.0},
    ]
    heads = [
        {"url": "http://h.test/a", "status": "valid", "error": None,
         "head_data": {"title": "A"}, "relevance_score": 0.2},
        {"url": "http://h.test/b", "status": "valid", "error": None,
         "head_data": {"title": "B"}, "relevance_score": 0.9},
    ]
    out = merge_head_data(links, heads, score_links=True,
                          query_provided=True)
    # re-sorted by relevance desc; unmatched link keeps original shape
    assert [l["href"] for l in out] == [
        "http://h.test/b", "http://h.test/a", "http://h.test/c"]
    b = out[0]
    assert b["head_data"]["relevance_score"] == 0.9
    assert b["contextual_score"] == 0.9
    assert b["total_score"] == pytest.approx(4.0 * 0.7 + 9.0 * 0.3)
    assert "total_score" not in out[2]


def test_score_head_results_threshold_and_fallback():
    cfg = LinkPreviewConfig(query="catalog product",
                            score_threshold=None)
    results = [
        {"url": "http://h.test/catalog", "status": "valid",
         "head_data": {}},     # no context → URL fallback
        {"url": "http://h.test/x", "status": "not_valid",
         "head_data": {}},     # not valid → unscored
    ]
    out = score_head_results(results, cfg)
    scored = {r["url"]: r.get("relevance_score") for r in out}
    assert scored["http://h.test/catalog"] == pytest.approx(
        url_relevance_score("catalog product", "http://h.test/catalog"))
    assert scored["http://h.test/x"] is None
    # threshold drops the unscored row
    cfg2 = LinkPreviewConfig(query="catalog product", score_threshold=0.01)
    out2 = score_head_results(list(results), cfg2)
    assert [r["url"] for r in out2] == ["http://h.test/catalog"]


# -- distributed pipeline vs driver laws ------------------------------------


def _driver_reference(docs, cfg, site_cfg, score_links):
    """Pure-driver application of the same laws, page by page (the
    reference's own loop shape)."""
    stage = HeadDataFetchStage(site_cfg)
    out = []
    for doc in docs:
        links = doc["links"]
        links = list(links) if links is not None else []
        head_results = []
        for u in filter_preview_links(links, cfg):
            st, err, hd = stage.fetch_head(u)
            head_results.append({"url": u, "status": st, "error": err,
                                 "head_data": hd})
        head_results = score_head_results(head_results, cfg)
        enriched = [
            {**l, "intrinsic_score":
                __import__("crawl4ai_ray.functions.textutils",
                           fromlist=["calculate_link_intrinsic_score"])
                .calculate_link_intrinsic_score(l["href"], l["text"] or "")
                if score_links else None}
            for l in links
        ]
        merged = merge_head_data(enriched, head_results,
                                 score_links=score_links,
                                 query_provided=bool(cfg.query))
        def _n(v):
            return -1 if v is None else round(float(v), 9)

        for rank, l in enumerate(merged):
            out.append((doc["seq"], rank, l["href"],
                        l.get("head_extraction_status") or "",
                        _n(l.get("contextual_score")),
                        _n(l.get("total_score"))))
    return sorted(out)


def test_pipeline_matches_driver_laws(ray_session, tmp_path):
    import ray.data as rd

    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(**SITE)
    site = SyntheticWeb(site_cfg)
    cfg = CrawlConfig(strategy="bfs", max_depth=2,
                      out_dir=str(tmp_path / "c"), n_seen_shards=2,
                      fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    docs_ds = rd.read_parquet(res.docs_dir,
                              columns=["seq", "url", "links", "success"])
    docs_ds = docs_ds.filter(expr="success == True")

    lp = LinkPreviewConfig(query="catalog product items", max_links=10)
    got_df = link_preview_pipeline(docs_ds, lp, SITE,
                                   score_links=True).to_pandas()
    def _num(v):
        return -1 if v is None or (isinstance(v, float) and np.isnan(v)) \
            else round(float(v), 9)

    got = sorted(
        (int(r.page_seq), int(r.link_rank), r.href, r.head_status,
         _num(r.contextual_score), _num(r.total_score))
        for r in got_df.itertuples()
    )
    docs = docs_ds.to_pandas().to_dict("records")
    want = _driver_reference(docs, lp, SITE, True)
    assert got == want
    assert len(got) > 0


# -- best-first integration --------------------------------------------------


def test_best_first_consumes_total_score(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.crawl import (
        CrawlConfig,
        CrawlEngine,
        _parse_stage,
    )
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb
    from crawl4ai_ray.stages.fetch import SyntheticFetcher
    import pyarrow as pa

    site_cfg = SiteConfig(**SITE)
    site = SyntheticWeb(site_cfg)
    lp_cfg = {"query": "catalog product items", "max_links": 20}

    # unit: parse-stage candidate scores == law totals for the page
    fetcher = SyntheticFetcher(site_cfg.__dict__)
    seed = site.seed_urls()[0]
    page = fetcher.fetch_one(seed)
    batch = pa.table({
        "url": [seed], "url_hash": pa.array([0], pa.uint64()),
        "host": [site_cfg.__dict__ and "h0000.test"],
        "depth": pa.array([0], pa.int32()),
        "score": pa.array([0.0], pa.float32()), "parent": [""],
        "seq": pa.array([0], pa.int64()),
        "html": [page["html"]], "status": pa.array([200], pa.int32()),
        "success": [True], "fetch_ms": pa.array([0.0], pa.float32()),
        "from_cache": [False],
    })
    out = _parse_stage(batch, image_score_threshold=3, keep_html=False,
                       link_preview_cfg=lp_cfg,
                       link_preview_site=site_cfg.__dict__)
    cands = out.column("cand").to_pylist()[0]
    links = out.column("links").to_pylist()[0]
    stage = HeadDataFetchStage(site_cfg.__dict__)
    want_totals = preview_total_scores(
        [l for l in links if l["internal"]],
        LinkPreviewConfig(**lp_cfg), stage, score_links=True)
    assert len(cands) > 0
    for c in cands:
        # candidate score is the law total of its raw href
        raws = [l["href"] for l in links if l["internal"]]
        assert any(abs(c["score"] - want_totals[r]) < 1e-6 for r in raws)
    assert any(abs(c["score"] - 5.0) > 1e-9 for c in cands), \
        "scores should not all be neutral"

    # e2e: best-first pops by total_score, deterministically
    def run(sub):
        cfg = CrawlConfig(strategy="best_first", max_depth=2,
                          max_pages=12, out_dir=str(tmp_path / sub),
                          n_seen_shards=2, fetch_concurrency=2,
                          link_preview=lp_cfg)
        eng = CrawlEngine(cfg,
                          fetcher_kwargs={"site_cfg": site_cfg.__dict__})
        return eng.run(site.seed_urls())

    r1, r2 = run("a"), run("b")
    order1 = [(r["url"], r["seq"]) for r in r1.order]
    assert order1 == [(r["url"], r["seq"]) for r in r2.order]
    assert len(order1) > 2
