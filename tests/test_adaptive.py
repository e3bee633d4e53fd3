"""Adaptive crawl: confidence math (reference laws) + stop behavior."""

from collections import Counter

from crawl4ai_ray.pipelines.adaptive import (
    AdaptiveCrawl,
    AdaptiveState,
    confidence,
    consistency,
    coverage,
    saturation,
)
from crawl4ai_ray.pipelines.crawl import CrawlConfig
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb


def test_coverage_law():
    s = AdaptiveState(query="crawl engine")
    assert coverage(s) == 0.0
    s.total_documents = 10
    s.term_frequencies = Counter({"crawl": 20, "engine": 5, "other": 30})
    s.document_frequencies = Counter({"crawl": 8, "engine": 3, "other": 10})
    c = coverage(s)
    assert 0.0 < c <= 1.0
    # more coverage → higher score
    s2 = AdaptiveState(query="crawl engine", total_documents=10,
                       term_frequencies=Counter({"crawl": 20, "engine": 20}),
                       document_frequencies=Counter({"crawl": 10,
                                                     "engine": 10}))
    assert coverage(s2) > c


def test_consistency_and_saturation():
    s = AdaptiveState()
    assert consistency(s) == 1.0            # <2 docs
    s.doc_term_sets = [{"a", "b"}, {"a", "b"}, {"a", "c"}]
    assert 0.0 < consistency(s) <= 1.0
    assert saturation(AdaptiveState(new_terms_history=[100])) == 0.0
    assert saturation(AdaptiveState(new_terms_history=[100, 10])) == 0.9
    assert saturation(AdaptiveState(new_terms_history=[100, 100])) == 0.0


def test_adaptive_crawl_stops_before_exhausting(ray_session, tmp_path):
    site_cfg = SiteConfig(n_hosts=6, base_cats=3, n_subs=2,
                          base_products=5, hot_hosts=6)
    site = SyntheticWeb(site_cfg)
    total_pages = len(site.all_urls())
    cfg = CrawlConfig(max_depth=3, out_dir=str(tmp_path / "o"),
                      n_seen_shards=2, fetch_concurrency=2)
    ac = AdaptiveCrawl(cfg, query="product category data",
                       confidence_threshold=0.55, max_pages=500,
                       fetcher_kwargs={"site_cfg": site_cfg.__dict__})
    res, state = ac.run(site.seed_urls())
    assert state.total_documents > 0
    assert state.confidence_history, "confidence tracked per superstep"
    # saturation-driven stop: crawled meaningfully fewer pages than exist
    assert res.pages_crawled < total_pages
    assert state.metrics["coverage"] > 0


# -- EmbeddingStrategy variant (adaptive_crawler.py:593-1100) ---------------


def test_embedding_query_space_split():
    from crawl4ai_ray.pipelines.adaptive import (EmbeddingAdaptiveCrawl,
                                                 query_variations)
    from crawl4ai_ray.pipelines.crawl import CrawlConfig

    vs = query_variations("product data")
    assert len(vs) == 12 and len(set(vs)) == 12
    ac = EmbeddingAdaptiveCrawl(CrawlConfig(out_dir="/tmp/_ea1"),
                                "product data")
    # original query always trains; 80/20 seeded split; disjoint
    assert ac.state.train_queries[0] == "product data"
    assert len(ac.state.val_queries) >= 2
    assert not (set(ac.state.train_queries) & set(ac.state.val_queries))
    # deterministic across constructions
    ac2 = EmbeddingAdaptiveCrawl(CrawlConfig(out_dir="/tmp/_ea2"),
                                 "product data")
    assert ac2.state.train_queries == ac.state.train_queries


def test_embedding_confidence_laws():
    import numpy as np

    from crawl4ai_ray.pipelines.adaptive import EmbeddingAdaptiveCrawl
    from crawl4ai_ray.pipelines.crawl import CrawlConfig

    ac = EmbeddingAdaptiveCrawl(CrawlConfig(out_dir="/tmp/_ea3"), "alpha")
    assert ac.calculate_confidence() == 0.0          # empty KB
    # KB identical to the train queries → best cosine 1 per query
    ac._kb = ac._q_train.copy()
    c = ac.calculate_confidence()
    assert abs(c - 1.0) < 1e-9
    assert ac.validate_coverage() <= 1.0
    # orthogonal KB → ~0 confidence
    ac._kb = np.zeros_like(ac._q_train)
    ac._kb[:, :] = 0.0
    assert ac.calculate_confidence() <= 0.0 + 1e-9
    # tau hit-rate form
    ac.coverage_tau = 0.99
    ac._kb = ac._q_train.copy()
    assert ac.calculate_confidence() == 1.0


def test_embedding_adaptive_run_stops(ray_session, tmp_path):
    from crawl4ai_ray.pipelines.adaptive import EmbeddingAdaptiveCrawl
    from crawl4ai_ray.pipelines.crawl import CrawlConfig
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    cfg = CrawlConfig(max_depth=3, out_dir=str(tmp_path / "o"),
                      n_seen_shards=2, fetch_concurrency=2)
    ac = EmbeddingAdaptiveCrawl(
        cfg, "product category data", confidence_threshold=0.35,
        max_pages=300, fetcher_kwargs={"site_cfg": site_cfg.__dict__})
    res, state = ac.run(site.seed_urls())
    assert state.kb_doc_count > 0
    assert state.confidence_history
    assert all(0.0 <= c <= 1.0 for c in state.confidence_history)
    assert state.stopped_reason in ("confidence_threshold", "plateau", "")
    assert "validation_confidence" in state.metrics
