"""Crawler hub registry: discovery, meta attach, interface validation,
and the example site crawler's JSON contract."""

import json

import pytest

from crawl4ai_ray.sources.hub import BaseCrawler, CrawlerHub


def test_discovery_and_meta():
    cls = CrawlerHub.get("synthetic_catalog")
    assert cls is not None
    assert cls.meta["version"] == "1.0.0"
    assert "description" in cls.meta
    assert CrawlerHub.get("nonexistent") is None


def test_interface_validation():
    with pytest.raises(TypeError, match="must implement"):
        class BadArity(BaseCrawler):          # noqa: F811
            def run(self):                    # missing url arg
                return "{}"

    with pytest.raises(TypeError, match="synchronous"):
        class BadAsync(BaseCrawler):          # noqa: F811
            async def run(self, url="", **kwargs):
                return "{}"


def test_synthetic_catalog_crawler():
    cls = CrawlerHub.get("synthetic_catalog")
    crawler = cls(site_cfg={"n_hosts": 1})
    out = json.loads(crawler.run("http://h0000.test/cat0/sub0/p0.html"))
    assert out[0]["title"].startswith("Product")
    assert out[0]["photo"].endswith(".jpg")
    assert any(l["href"].startswith("/cat0") for l in out[0]["links"])
    err = json.loads(crawler.run("http://h0000.test/missing-page"))
    assert "error" in err
