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


# ---------------------------------------------------------------------------
# live-endpoint opt-in (SEEDER_LIVE=1)
# ---------------------------------------------------------------------------


def _seeder_live_default() -> bool:
    import os

    return os.environ.get("SEEDER_LIVE") == "1"


class _RateGate:
    """Per-actor hits-per-second gate for live endpoints (the reference
    caps request concurrency via an asyncio.Semaphore sized hits_per_sec,
    async_url_seeder.py:314-320,403-407; a synchronous actor's equivalent
    is a min-interval between its own requests). Clock/sleep injectable
    so tests don't wall-sleep."""

    def __init__(self, hits_per_sec: float | None, *, clock=None,
                 sleep_fn=None):
        import time as _time

        self.interval = 1.0 / hits_per_sec if hits_per_sec else 0.0
        self.clock = clock or _time.monotonic
        self.sleep = sleep_fn or _time.sleep
        self._last = None

    def wait(self):
        if not self.interval:
            return
        now = self.clock()
        if self._last is not None:
            remaining = self._last + self.interval - now
            if remaining > 0:
                self.sleep(remaining)
                now = self._last + self.interval
        self._last = now


def live_http_get(url: str, timeout: float = 15.0) -> tuple[int, bytes]:
    """stdlib GET for the live seeder paths: follows redirects (urllib
    default, reference follow_redirects=True), returns (status, body);
    HTTP errors return their status instead of raising so callers can
    apply the reference's per-status laws. ``.gz`` sitemap bodies are
    gunzipped (async_url_seeder.py:850)."""
    import gzip
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "crawl4ai-ray"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            status = resp.status
    except urllib.error.HTTPError as e:
        return e.code, e.read()
    if url.split("?")[0].endswith(".gz"):
        try:
            body = gzip.decompress(body)
        except OSError:
            pass
    return status, body


class SitemapSeeder:
    """Actor-pool stage: domain rows in → discovered URL rows out.

    One fetcher per actor (like the reference's per-seeder httpx client,
    async_url_seeder.py:198-229); recursive index expansion bounded by
    ``max_depth`` to survive sitemap loops."""

    def __init__(self, site_cfg: dict | None = None, *, pattern: str = "*",
                 max_depth: int = 4, max_urls_per_domain: int = 100_000,
                 live: bool | None = None, hits_per_sec: float | None = None,
                 http_get=None):
        # live opt-in (SEEDER_LIVE=1 or live=True): fetch robots/sitemaps
        # over real HTTP instead of the synthetic web. The fixture path
        # stays the CI default; rows from it are unchanged by this branch.
        self.live = (_seeder_live_default() if live is None else live) \
            and site_cfg is None
        if self.live:
            self.fetcher = None
            self._http_get = http_get or live_http_get
            self._gate = _RateGate(hits_per_sec)
        else:
            from ..sources.synthetic_web import SiteConfig
            from ..stages.fetch import SyntheticFetcher

            self.fetcher = SyntheticFetcher(
                SiteConfig(**site_cfg) if site_cfg else None
            )
        self.pattern = pattern
        self.max_depth = max_depth
        self.max_urls = max_urls_per_domain

    def _fetch(self, url: str) -> str:
        if self.live:
            self._gate.wait()
            try:
                status, body = self._http_get(url)
            except Exception:
                return ""      # network errors skip the sitemap (ref :836-846)
            if not 200 <= status < 300:
                return ""
            return body.decode("utf-8", errors="replace")
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



def _dedupe_urls(urls):
    """One row per URL across domains (the documented contract): a tiny
    (url -> min domain) groupby — the url column is compact next to the
    pages it seeds."""
    from ray.data.aggregate import Min

    return (
        urls.groupby("url")
        .aggregate(Min("domain", alias_name="domain"))
        .select_columns(["domain", "url"])
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
    urls = _dedupe_urls(urls)
    if max_urls is not None:
        urls = urls.limit(max_urls)
    return urls


# ---------------------------------------------------------------------------
# Common Crawl seeder (S3) — offline, against a fixture index directory
# ---------------------------------------------------------------------------


class CcIndexUnavailable(Exception):
    """Stand-in for the CC index's 503 (reference retries on it)."""


class CommonCrawlSeeder:
    """Actor-pool stage: domain rows → Common Crawl index URL rows.

    Mirrors the reference's ``_from_cc`` (async_url_seeder.py:709-763)
    law for law:
    - domain normalization: strip scheme, drop ``?query``/``#fragment``,
      lstrip leading dots; the sanitized form (``[/?#]+`` → ``_``) names
      the cache file ``{index_id}_{safe}_{md5(pattern)[:8]}.jsonl``;
    - the JSONL cache stores EVERY index URL unfiltered; the glob
      ``pattern`` is applied on read (so one cache file serves any
      pattern with the same digest-keyed name);
    - retry ladder (1, 3, 7) seconds on index 503, then raise.

    The live ``index.commoncrawl.org`` endpoint needs network this
    sandbox doesn't have, so the index is read from JSONL fixture files
    ``<index_dir>/<index_id>/<normalized-domain>.jsonl`` (one JSON record
    per line with a ``url`` key — the CC index response shape). The
    ``fail_503`` map simulates index 503s for retry testing; ``sleep_fn``
    is injectable so tests don't wall-sleep."""

    RETRIES = (1, 3, 7)

    def __init__(self, index_dir: str, cache_dir: str,
                 index_id: str = "CC-MAIN-2024-51", *, pattern: str = "*",
                 force: bool = False, fail_503: dict | None = None,
                 sleep_fn=None, live: bool | None = None,
                 hits_per_sec: float | None = None, http_get=None):
        import time as _time

        self.index_dir = index_dir
        self.cache_dir = cache_dir
        self.index_id = index_id
        self.pattern = pattern
        self.force = force
        self.fail_503 = dict(fail_503 or {})
        self.sleep = sleep_fn or _time.sleep
        self.slept: list[float] = []   # observable retry trace
        # live opt-in (SEEDER_LIVE=1 or live=True): query the real
        # index.commoncrawl.org instead of the JSONL fixture directory.
        # The same seed_domain retry ladder / cache layer wraps both.
        self.live = _seeder_live_default() if live is None else live
        self._http_get = http_get or live_http_get
        self._gate = _RateGate(hits_per_sec)

    # -- reference normalization (async_url_seeder.py:713-720) --------------

    @staticmethod
    def normalize_domain(domain: str) -> str:
        raw = re.sub(r"^https?://", "", domain)
        raw = raw.split("#", 1)[0].split("?", 1)[0].lstrip(".")
        return raw

    def _cache_path(self, raw: str) -> str:
        import hashlib
        import os

        digest = hashlib.md5(self.pattern.encode()).hexdigest()[:8]
        safe = re.sub("[/?#]+", "_", raw)
        return os.path.join(self.cache_dir,
                            f"{self.index_id}_{safe}_{digest}.jsonl")

    def _index_query_url(self, raw: str) -> str:
        """The reference's CC index request (async_url_seeder.py:731-732):
        glob keeps an explicit path, else appends '/*'."""
        from urllib.parse import quote

        glob = f"*.{raw}*" if "/" in raw else f"*.{raw}/*"
        return (f"https://index.commoncrawl.org/{self.index_id}-index"
                f"?url={quote(glob, safe='*')}&output=json")

    def _fetch_index_live(self, raw: str) -> list[str]:
        """One request to the real index; 503 raises CcIndexUnavailable so
        seed_domain applies the (1, 3, 7) ladder (reference :736-747);
        any other non-2xx raises (reference raise_for_status law)."""
        import json

        self._gate.wait()
        status, body = self._http_get(self._index_query_url(raw))
        if status == 503:
            raise CcIndexUnavailable(raw)
        if not 200 <= status < 300:
            raise RuntimeError(f"CC index HTTP {status} for {raw}")
        urls = []
        for line in body.decode("utf-8", errors="replace").splitlines():
            line = line.strip()
            if line:
                urls.append(json.loads(line)["url"])
        return urls

    def _fetch_index(self, raw: str) -> list[str]:
        """One 'request' to the (fixture) index; raises CcIndexUnavailable
        while the domain's simulated-503 budget lasts."""
        import json
        import os

        if self.fail_503.get(raw, 0) > 0:
            self.fail_503[raw] -= 1
            raise CcIndexUnavailable(raw)
        if self.live:
            return self._fetch_index_live(raw)
        path = os.path.join(self.index_dir, self.index_id,
                            f"{re.sub('[/?#]+', '_', raw)}.jsonl")
        if not os.path.exists(path):
            return []
        urls = []
        with open(path) as fp:
            for line in fp:
                line = line.strip()
                if not line:
                    continue
                urls.append(json.loads(line)["url"])
        return urls

    def seed_domain(self, domain: str) -> list[str]:
        import fnmatch as _fn
        import os

        raw = self.normalize_domain(domain)
        cache = self._cache_path(raw)
        if os.path.exists(cache) and not self.force:
            with open(cache) as fp:
                urls = [line.strip() for line in fp if line.strip()]
        else:
            for i, delay in enumerate(self.RETRIES + (-1,)):
                try:
                    urls = self._fetch_index(raw)
                    break
                except CcIndexUnavailable:
                    if delay < 0:          # ladder exhausted
                        raise
                    self.slept.append(float(self.RETRIES[i]))
                    self.sleep(self.RETRIES[i])
            os.makedirs(self.cache_dir, exist_ok=True)
            tmp = cache + ".tmp"
            with open(tmp, "w") as fp:
                for u in urls:
                    fp.write(u + "\n")
            os.replace(tmp, cache)
        out = []
        for u in urls:
            if is_nonsense_url(u):
                continue
            if self.pattern != "*" and not _fn.fnmatch(u, self.pattern):
                continue
            out.append(u)
        return out

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


def seed_from_cc(domains: list[str], index_dir: str, cache_dir: str, *,
                 index_id: str = "CC-MAIN-2024-51", pattern: str = "*",
                 max_urls: int | None = None, force: bool = False):
    """Pipeline entry (S3): domains → deduped CC-index URL dataset."""
    import ray.data as rd

    ds = rd.from_items([{"domain": d} for d in domains])
    urls = ds.map_batches(
        CommonCrawlSeeder,
        fn_constructor_kwargs={
            "index_dir": index_dir, "cache_dir": cache_dir,
            "index_id": index_id, "pattern": pattern, "force": force,
        },
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    urls = _dedupe_urls(urls)
    if max_urls is not None:
        urls = urls.limit(max_urls)
    return urls
