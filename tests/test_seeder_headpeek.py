"""Seeder (sitemap recursion, nonsense filter) + head-peek filter tests."""

import pyarrow as pa

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
