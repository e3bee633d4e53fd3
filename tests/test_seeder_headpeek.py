"""Seeder (sitemap recursion, nonsense filter) + head-peek filter tests."""

import pyarrow as pa
import pytest

from crawl4ai_ray.sources.seeder import (
    SitemapSeeder,
    is_nonsense_url,
    parse_sitemap,
    seed_from_sitemaps,
)
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb
from crawl4ai_ray.stages.headpeek import (
    HeadPeekStage,
    bm25_head_score,
    extract_meta_tags,
    get_title,
    peek_head,
    relevance_filter_pipeline,
    seo_score,
)

SITE_CFG = SiteConfig(n_hosts=3)
SITE = SyntheticWeb(SITE_CFG)


def test_nonsense_url_filter():
    assert is_nonsense_url("http://a.com/robots.txt")
    assert is_nonsense_url("http://a.com/favicon.ico")
    assert is_nonsense_url("http://a.com/static/style.css")
    assert is_nonsense_url("http://a.com/sitemap-9.xml")
    assert is_nonsense_url("mailto:x@y.z")
    assert not is_nonsense_url("http://a.com/page.html")
    assert not is_nonsense_url("http://a.com/products")


def test_parse_sitemap():
    idx = SITE.sitemap_xml("h0001.test")
    children, urls = parse_sitemap(idx)
    assert children and not urls
    child_xml = SITE.sitemap_cat_xml("h0001.test", 0)
    children2, urls2 = parse_sitemap(child_xml)
    assert not children2 and urls2
    assert "http://h0001.test/cat0" in urls2


def test_seeder_recurses_index():
    s = SitemapSeeder(SITE_CFG.__dict__)
    urls = s.seed_domain("h0000.test")
    # host 0: 3 cats × (1 + 2 subs × (1 + 5 products)) = 3 + 6 + 30 = 39
    assert len(urls) == 39
    assert "http://h0000.test/cat2/sub1/p4.html" in urls
    assert not any(u.endswith(".xml") for u in urls)
    # pattern filter
    s2 = SitemapSeeder(SITE_CFG.__dict__, pattern="*/cat1/*")
    urls2 = s2.seed_domain("h0000.test")
    assert urls2 and all("/cat1/" in u for u in urls2)


def test_seed_pipeline(ray_session):
    df = seed_from_sitemaps(["h0000.test", "h0001.test"],
                            SITE_CFG.__dict__).to_pandas()
    assert len(df) > 40
    assert set(df["domain"]) == {"h0000.test", "h0001.test"}
    assert df["url"].is_unique


def test_head_peek_functions():
    html = SITE.page("http://h0000.test/cat1")["html"]
    head = peek_head(html)
    assert head.endswith("</head>")
    assert get_title(head) == "Category 1"
    meta = extract_meta_tags(head)
    assert "description" in meta and "og:title" in meta
    score = bm25_head_score(head, "category synthetic")
    assert score > 0
    assert bm25_head_score(head, "zzz qqq") == 0.0
    s = seo_score(head, "http://h0000.test/cat1", keywords=["category"])
    assert 0.0 <= s <= 1.0


def test_head_peek_stage_and_relevance_pipeline(ray_session):
    urls = ["http://h0000.test/cat0", "http://h0000.test/cat1",
            "http://h0000.test/nope"]
    batch = pa.table({"url": urls})
    out = HeadPeekStage(SITE_CFG.__dict__, query="category fixture")(batch)
    assert out.column("head_title").to_pylist()[:2] == \
        ["Category 0", "Category 1"]
    bm25 = out.column("bm25").to_pylist()
    assert bm25[0] > 0 and bm25[2] == 0.0
    kept = relevance_filter_pipeline(urls, SITE_CFG.__dict__,
                                     "category fixture", 0.1).to_pandas()
    assert set(kept["url"]) == set(urls[:2])


# -- Common Crawl seeder (S3, offline fixture index) ------------------------


def _cc_fixture(tmp_path, urls_by_domain, index_id="CC-MAIN-2024-51"):
    import json
    import os

    idx = tmp_path / "index" / index_id
    idx.mkdir(parents=True, exist_ok=True)
    for dom, urls in urls_by_domain.items():
        with open(idx / f"{dom}.jsonl", "w") as fp:
            for u in urls:
                fp.write(json.dumps({"url": u}) + "\n")
    return str(tmp_path / "index"), str(tmp_path / "cache")


def test_cc_seeder_normalization_pattern_and_cache(tmp_path):
    from crawl4ai_ray.sources.seeder import CommonCrawlSeeder

    urls = ["http://ex.test/cat1/a", "http://ex.test/cat1/b.css",
            "http://ex.test/other/c", "mailto:x@ex.test"]
    index_dir, cache_dir = _cc_fixture(tmp_path, {"ex.test": urls})
    s = CommonCrawlSeeder(index_dir, cache_dir, pattern="*/cat1/*")
    # reference normalization: scheme/query/fragment stripped, dots lstripped
    assert s.normalize_domain("https://ex.test?q=1#frag") == "ex.test"
    assert s.normalize_domain(".ex.test") == "ex.test"
    got = s.seed_domain("https://ex.test")
    # nonsense (.css, mailto) and non-matching paths dropped
    assert got == ["http://ex.test/cat1/a"]
    # cache file stores EVERY url unfiltered (reference law), named by
    # (index_id, safe domain, md5(pattern)[:8])
    import glob
    import hashlib

    digest = hashlib.md5(b"*/cat1/*").hexdigest()[:8]
    files = glob.glob(f"{cache_dir}/CC-MAIN-2024-51_ex.test_{digest}.jsonl")
    assert len(files) == 1
    assert open(files[0]).read().splitlines() == urls
    # second run hits the cache even if the index disappears
    import shutil

    shutil.rmtree(index_dir)
    s2 = CommonCrawlSeeder(index_dir, cache_dir, pattern="*/cat1/*")
    assert s2.seed_domain("ex.test") == ["http://ex.test/cat1/a"]


def test_cc_seeder_retry_ladder(tmp_path):
    from crawl4ai_ray.sources.seeder import CcIndexUnavailable, \
        CommonCrawlSeeder

    index_dir, cache_dir = _cc_fixture(
        tmp_path, {"ex.test": ["http://ex.test/cat1/a"]})
    slept = []
    s = CommonCrawlSeeder(index_dir, cache_dir, fail_503={"ex.test": 2},
                          sleep_fn=slept.append)
    assert s.seed_domain("ex.test") == ["http://ex.test/cat1/a"]
    assert slept == [1, 3]          # reference ladder (1, 3, 7)
    # budget beyond the ladder → raise after sleeping 1, 3, 7
    slept2 = []
    s3 = CommonCrawlSeeder(index_dir, cache_dir, index_id="CC-OTHER",
                           fail_503={"ex.test": 4}, sleep_fn=slept2.append)
    import pytest as _pytest

    with _pytest.raises(CcIndexUnavailable):
        s3.seed_domain("ex.test")
    assert slept2 == [1, 3, 7]


def test_seed_cc_pipeline(ray_session, tmp_path):
    from crawl4ai_ray.sources.seeder import seed_from_cc

    index_dir, cache_dir = _cc_fixture(
        tmp_path,
        {"a.test": [f"http://a.test/cat1/p{i}" for i in range(5)],
         "b.test": ["http://b.test/cat2/x", "http://b.test/skip.png"]})
    ds = seed_from_cc(["a.test", "https://b.test"], index_dir, cache_dir)
    rows = sorted(r["url"] for r in ds.take_all())
    assert rows == sorted(
        [f"http://a.test/cat1/p{i}" for i in range(5)]
        + ["http://b.test/cat2/x"])


# ---------------------------------------------------------------------------
# live-endpoint opt-in (SEEDER_LIVE=1) — scripted-transport law tests;
# the fixture path stays the CI default and its rows are unchanged.
# ---------------------------------------------------------------------------

def test_cc_live_query_url_glob_law(tmp_path):
    from crawl4ai_ray.sources.seeder import CommonCrawlSeeder

    s = CommonCrawlSeeder(str(tmp_path), str(tmp_path), live=True)
    # bare domain appends /* ; explicit path keeps it; quote(safe='*')
    # escapes the slash (reference async_url_seeder.py:731-732)
    assert s._index_query_url("a.test") == (
        "https://index.commoncrawl.org/CC-MAIN-2024-51-index"
        "?url=*.a.test%2F*&output=json")
    assert "*.a.test%2Fdocs*" in s._index_query_url("a.test/docs")


def test_cc_live_retry_ladder_and_cache(tmp_path):
    import json

    from crawl4ai_ray.sources.seeder import CommonCrawlSeeder

    body = "\n".join(json.dumps({"url": u}) for u in
                     ["http://a.test/x", "http://a.test/style.css",
                      "http://a.test/y"]).encode()
    script = [(503, b""), (503, b""), (200, body)]
    calls = []

    def fake_get(url):
        calls.append(url)
        return script.pop(0)

    s = CommonCrawlSeeder(str(tmp_path / "ix"), str(tmp_path / "cache"),
                          live=True, http_get=fake_get,
                          sleep_fn=lambda d: None)
    urls = s.seed_domain("https://a.test")
    assert s.slept == [1.0, 3.0]              # reference ladder prefix
    assert urls == ["http://a.test/x", "http://a.test/y"]  # nonsense dropped
    assert len(calls) == 3 and all("index.commoncrawl.org" in c
                                   for c in calls)
    # second call reads the cache, no new requests
    assert s.seed_domain("https://a.test") == urls
    assert len(calls) == 3


def test_cc_live_non_503_raises(tmp_path):
    import pytest as _pytest

    from crawl4ai_ray.sources.seeder import CommonCrawlSeeder

    s = CommonCrawlSeeder(str(tmp_path), str(tmp_path / "c"), live=True,
                          http_get=lambda u: (404, b""),
                          sleep_fn=lambda d: None)
    with _pytest.raises(RuntimeError):
        s.seed_domain("a.test")


def test_sitemap_live_path_scripted():
    from crawl4ai_ray.sources.seeder import SitemapSeeder

    site = {
        "http://a.test/robots.txt": (200, b"Sitemap: http://a.test/sm1.xml"),
        "http://a.test/sm1.xml": (200,
            b"<sitemapindex><loc>http://a.test/sm2.xml</loc></sitemapindex>"),
        "http://a.test/sm2.xml": (200,
            b"<urlset><loc>http://a.test/p1</loc>"
            b"<loc>http://a.test/p2</loc></urlset>"),
        "http://a.test/sitemap.xml": (404, b""),
    }
    s = SitemapSeeder(live=True, http_get=lambda u: site.get(u, (404, b"")))
    assert s.seed_domain("a.test") == ["http://a.test/p1",
                                       "http://a.test/p2"]


def test_live_rate_gate_law():
    from crawl4ai_ray.sources.seeder import _RateGate

    now = [100.0]
    slept = []

    def sleep(d):
        slept.append(round(d, 6))
        now[0] += d

    g = _RateGate(2.0, clock=lambda: now[0], sleep_fn=sleep)
    g.wait()                      # first request: no wait
    g.wait()                      # 0.5s interval enforced
    now[0] += 0.2
    g.wait()
    assert slept == [0.5, 0.3]
    assert _RateGate(None).interval == 0.0


@pytest.mark.skipif("SEEDER_LIVE" not in __import__("os").environ,
                    reason="live network integration (SEEDER_LIVE=1)")
def test_cc_live_integration(tmp_path):
    from crawl4ai_ray.sources.seeder import CommonCrawlSeeder

    s = CommonCrawlSeeder(str(tmp_path / "ix"), str(tmp_path / "cache"),
                          live=True, hits_per_sec=1.0)
    urls = s.seed_domain("example.com")
    assert isinstance(urls, list)
