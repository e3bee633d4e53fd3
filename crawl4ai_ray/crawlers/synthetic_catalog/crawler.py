"""Example hub crawler: the synthetic catalog site, schema-extracted.

The reference ships browser-driven site crawlers
(crawlers/google_search/crawler.py:11-131, crawlers/amazon_product): fetch
a page, apply a JSON-CSS schema, return a JSON string. This engine's data
plane replaces the browser — the crawler drives the synthetic fetcher +
the M26 JSON-CSS extractor and honors the same JSON-string ``run``
contract and ``__meta__`` registration law (hub.py:60)."""

from __future__ import annotations

import json

from ...functions.json_css import extract
from ...sources.hub import BaseCrawler

__meta__ = {
    "version": "1.0.0",
    "tested_on": ["h*.test/cat*/sub*/p*.html"],
    "rate_limit": "none (synthetic)",
    "description": "Extracts product fields from synthetic catalog pages",
}

_SCHEMA = {
    "name": "product",
    "baseSelector": "main",
    "fields": [
        {"name": "title", "selector": "h1", "type": "text"},
        {"name": "summary", "selector": "p strong", "type": "text"},
        {"name": "photo", "selector": "img", "type": "attribute",
         "attribute": "src"},
        {"name": "links", "selector": "a", "type": "list",
         "fields": [{"name": "href", "type": "attribute",
                     "attribute": "href"}]},
    ],
}


class SyntheticCatalogCrawler(BaseCrawler):
    def __init__(self, site_cfg: dict | None = None):
        super().__init__()
        self.site_cfg = dict(site_cfg or {})

    def run(self, url: str = "", **kwargs) -> str:
        from ...stages.fetch import SyntheticFetcher

        fetcher = SyntheticFetcher(
            kwargs.get("site_cfg") or self.site_cfg)
        page = fetcher.fetch_one(url)
        if page["status"] != 200:
            return json.dumps({"error": f"HTTP {page['status']}"})
        return json.dumps(extract(page["html"], _SCHEMA), indent=None)
