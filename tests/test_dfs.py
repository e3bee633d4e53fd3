"""DFS engine-vs-oracle equality (LIFO traversal, single-URL supersteps)."""

import numpy as np

from crawl4ai_ray.functions.urlkit import hash64
from crawl4ai_ray.oracle import oracle_dfs
from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

SITE_CFG = SiteConfig(n_hosts=2, base_cats=2, n_subs=2, base_products=2)
SITE = SyntheticWeb(SITE_CFG)


def _order_key(rows):
    return [(r["url"], int(r["depth"]), r["parent"], int(r["seq"]),
             bool(r["success"]), int(r["status"])) for r in rows]


def test_dfs_matches_oracle(ray_session, tmp_path):
    golden = oracle_dfs(SITE, SITE.seed_urls(), max_depth=2)
    cfg = CrawlConfig(strategy="dfs", max_depth=2,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=1)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    res = eng.run(SITE.seed_urls())
    assert _order_key(res.order) == _order_key(golden.order)
    want = np.sort(np.array([hash64(u) for u in golden.seen],
                            dtype=np.uint64))
    assert np.array_equal(res.seen_hashes, want)
    # DFS property: parent of each non-seed row was crawled before it and
    # is exactly one level up
    pos = {r["url"]: i for i, r in enumerate(res.order)}
    for r in res.order:
        if r["parent"]:
            assert pos[r["parent"]] < pos[r["url"]]


def test_dfs_max_pages(ray_session, tmp_path):
    golden = oracle_dfs(SITE, SITE.seed_urls(), max_depth=2, max_pages=5)
    cfg = CrawlConfig(strategy="dfs", max_depth=2, max_pages=5,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=1)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    res = eng.run(SITE.seed_urls())
    assert _order_key(res.order) == _order_key(golden.order)
    assert res.pages_crawled == golden.pages_crawled == 5
