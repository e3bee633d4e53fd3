"""CacheMode (S8) tests: write-then-read round trip, mode semantics,
identical outputs from cached rerun."""

import numpy as np

from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb
from crawl4ai_ray.state.cache import CacheStore, should_read, should_write

SITE_CFG = SiteConfig(n_hosts=3)
SITE = SyntheticWeb(SITE_CFG)


def test_mode_law():
    assert should_read("enabled") and should_write("enabled")
    assert should_read("read_only") and not should_write("read_only")
    assert not should_read("write_only") and should_write("write_only")
    assert not should_read("bypass") and not should_write("bypass")
    assert not should_read("disabled") and not should_write("disabled")


def _run(tmp_path, run_name, cache_dir, mode):
    cfg = CrawlConfig(
        strategy="bfs", max_depth=2, out_dir=str(tmp_path / run_name),
        n_seen_shards=2, fetch_concurrency=2,
        cache_dir=cache_dir, cache_mode=mode,
    )
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    return eng.run(SITE.seed_urls())


def test_cache_roundtrip_identical_results(ray_session, tmp_path):
    cache = str(tmp_path / "cache")
    cold = _run(tmp_path, "cold", cache, "enabled")
    assert all(not r["from_cache"] for r in cold.order)
    store = CacheStore(cache)
    assert store.size() == cold.pages_crawled  # only successes cached

    warm = _run(tmp_path, "warm", cache, "enabled")
    # every previously-successful fetch served from cache
    cached_rows = [r for r in warm.order if r["from_cache"]]
    assert len(cached_rows) == cold.pages_crawled
    # failures (404/503) were not cached → refetched
    assert all(not r["from_cache"] for r in warm.order if not r["success"])
    # identical crawl order + seen set
    key = lambda rows: [(r["url"], r["seq"], r["status"]) for r in rows]
    assert key(warm.order) == key(cold.order)
    assert np.array_equal(warm.seen_hashes, cold.seen_hashes)


def test_cache_bypass_and_write_only(ray_session, tmp_path):
    cache = str(tmp_path / "cache")
    _run(tmp_path, "w", cache, "write_only")
    assert CacheStore(cache).size() > 0
    # bypass: cache present but ignored
    res = _run(tmp_path, "b", cache, "bypass")
    assert all(not r["from_cache"] for r in res.order)
    # read_only: reads but adds nothing new
    before = CacheStore(cache).size()
    res2 = _run(tmp_path, "r", cache, "read_only")
    assert any(r["from_cache"] for r in res2.order)
    assert CacheStore(cache).size() == before
