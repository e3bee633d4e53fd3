"""Fetch stage — stateful actor pool (`map_batches(FetcherCls, concurrency=N)`).

Re-expresses the reference's AsyncHTTPCrawlerStrategy
(/root/reference/crawl4ai/async_crawler_strategy.py:2153-2392: pooled
aiohttp session, DNS cache, charset sniff, timeouts) as a callable class:
session/state built once per actor in ``__init__``, each ``__call__``
fetches one Arrow batch of URLs.

Two implementations:

- ``SyntheticFetcher`` — serves the deterministic synthetic web (tests and
  bench; the sandbox has no network). Pages are computed on demand from the
  small ``SiteConfig`` — no page corpus is shipped to actors.
- ``HttpFetcher`` — a real urllib-based fetcher with the reference's pool
  semantics, gated for environments with network access. Raw ``file://``
  and ``raw:`` schemes are handled inline like the reference's
  _handle_file/_handle_raw (async_crawler_strategy.py:2267-2286).
"""

from __future__ import annotations

import concurrent.futures
import json
import time

import numpy as np
import pyarrow as pa

from ..sources.synthetic_web import SiteConfig, SyntheticWeb


class SyntheticFetcher:
    """Actor-pool fetch stage over the synthetic web.

    Input batch columns: ``url`` (canonical). Appends ``html``, ``status``,
    ``success``, ``fetch_ms``. ``simulate_latency=True`` sleeps the page's
    deterministic latency (politeness/throughput experiments); default off
    so correctness tests run fast.
    """

    def __init__(self, site_cfg: dict | SiteConfig | None = None,
                 simulate_latency: bool = False):
        if isinstance(site_cfg, dict):
            site_cfg = SiteConfig(**site_cfg)
        self.site = SyntheticWeb(site_cfg or SiteConfig())
        self.simulate_latency = simulate_latency

    def fetch_one(self, url: str) -> dict:
        return self.site.page(url)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls, statuses, fetch_ms = [], [], []
        for u in urls:
            t0 = time.perf_counter()
            page = self.site.page(u)
            if self.simulate_latency:
                time.sleep(page["latency_ms"] / 1000.0)
            htmls.append(page["html"])
            statuses.append(page["status"])
            fetch_ms.append((time.perf_counter() - t0) * 1000.0)
        return (
            batch.append_column("html", pa.array(htmls, type=pa.large_string()))
            .append_column("status", pa.array(statuses, type=pa.int32()))
            .append_column(
                "success",
                pa.array([s == 200 for s in statuses], type=pa.bool_()),
            )
            .append_column(
                "fetch_ms",
                pa.array(np.asarray(fetch_ms, dtype=np.float32), type=pa.float32()),
            )
            .append_column(
                "from_cache",
                pa.array(np.zeros(len(urls), dtype=bool)),
            )
        )


_SITE_CACHE: dict = {}


def make_task_fetcher(site_cfg: dict, simulate_latency: bool = False,
                      cache_ref=None):
    """Stateless-task variant of SyntheticFetcher for ``map_batches(fn)``.

    The synthetic site is a pure function of its (tiny) config, so no
    actor state is needed: each worker process lazily builds one
    SyntheticWeb per config and reuses it across batches (module-level
    cache — the actor-pool spin-up cost per superstep disappears).
    Real fetchers with session state (HttpFetcher) still use actor pools.
    """
    key = json.dumps(site_cfg, sort_keys=True) + f"|{simulate_latency}"

    def fetch_batch(batch: pa.Table) -> pa.Table:
        fetcher = _SITE_CACHE.get(key)
        if fetcher is None:
            fetcher = SyntheticFetcher(dict(site_cfg), simulate_latency)
            _SITE_CACHE[key] = fetcher
        if cache_ref is None:
            return fetcher(batch)
        # CacheMode read path: serve hits from the broadcast store, fetch
        # only misses (state/cache.py)
        import ray as _ray

        store = _ray.get(cache_ref)
        hashes = batch.column("url_hash").to_pylist()
        hit_mask = np.array([int(h) in store for h in hashes], dtype=bool)
        miss = fetcher(batch.filter(pa.array(~hit_mask)))
        hits_in = batch.filter(pa.array(hit_mask))
        if hits_in.num_rows == 0:
            return miss
        hhtml, hstatus = [], []
        for h in hits_in.column("url_hash").to_pylist():
            html, status = store[int(h)]
            hhtml.append(html)
            hstatus.append(status)
        hits = (
            hits_in.append_column("html",
                                  pa.array(hhtml, type=pa.large_string()))
            .append_column("status", pa.array(hstatus, type=pa.int32()))
            .append_column("success",
                           pa.array([s == 200 for s in hstatus],
                                    type=pa.bool_()))
            .append_column("fetch_ms",
                           pa.array(np.zeros(len(hhtml), dtype=np.float32),
                                    type=pa.float32()))
            .append_column("from_cache",
                           pa.array(np.ones(len(hhtml), dtype=bool)))
        )
        out = pa.concat_tables([miss, hits]).combine_chunks()
        return out.sort_by("seq")

    return fetch_batch


class HttpFetcher:
    """Real HTTP fetcher (urllib + thread pool). Per-actor connection reuse;
    timeout 30s and pool size min(32, cpu*4) mirror the reference defaults
    (async_crawler_strategy.py:2160-2163). Unusable in this sandbox (no
    network) but kept API-complete; ``file://`` and ``raw:`` handled inline."""

    def __init__(self, timeout: float = 30.0, max_workers: int | None = None,
                 user_agent: str = "crawl4ai-ray/0.1",
                 ua_seed: int | None = None,
                 proxies: list | None = None):
        """``ua_seed``: derive the identity from functions.fetchprofile's
        UserAgentGenerator (one UA + matching Sec-CH-UA per actor,
        deterministic per shard). ``proxies``: proxy strings/dicts fed to
        a per-actor RoundRobinProxyStrategy — each request takes the next
        proxy in rotation (the reference's dispatcher law)."""
        import os

        self.timeout = timeout
        self.user_agent = user_agent
        self.client_hints = None
        if ua_seed is not None:
            from ..functions.fetchprofile import UserAgentGenerator

            gen = UserAgentGenerator(seed=ua_seed)
            self.user_agent, self.client_hints = \
                gen.generate_with_client_hints()
        self.proxy_rotation = None
        if proxies:
            from ..functions.fetchprofile import (ProxyConfig,
                                                  RoundRobinProxyStrategy)

            cfgs = [p if isinstance(p, ProxyConfig)
                    else ProxyConfig.from_dict(p) if isinstance(p, dict)
                    else ProxyConfig.from_string(p) for p in proxies]
            self.proxy_rotation = RoundRobinProxyStrategy(cfgs)
        workers = max_workers or min(32, (os.cpu_count() or 8) * 4)
        self.pool = concurrent.futures.ThreadPoolExecutor(max_workers=workers)

    def fetch_one(self, url: str) -> dict:
        t0 = time.perf_counter()
        try:
            if url.startswith("raw:"):
                return {"html": url[4:], "status": 200, "latency_ms": 0}
            if url.startswith("file://"):
                with open(url[7:], encoding="utf-8", errors="replace") as f:
                    return {"html": f.read(), "status": 200, "latency_ms": 0}
            import urllib.request

            headers = {"User-Agent": self.user_agent}
            if self.client_hints:
                headers["Sec-CH-UA"] = self.client_hints
            req = urllib.request.Request(url, headers=headers)
            opener = urllib.request.urlopen
            if self.proxy_rotation is not None:
                proxy = self.proxy_rotation.get_next_proxy()
                if proxy is not None:
                    handler = urllib.request.ProxyHandler(
                        {"http": proxy.server, "https": proxy.server})
                    opener = urllib.request.build_opener(handler).open
            with opener(req, timeout=self.timeout) as resp:
                raw = resp.read()
                charset = resp.headers.get_content_charset() or "utf-8"
                return {
                    "html": raw.decode(charset, errors="replace"),
                    "status": resp.status,
                    "latency_ms": int((time.perf_counter() - t0) * 1000),
                }
        except Exception:
            return {"html": "", "status": 599,
                    "latency_ms": int((time.perf_counter() - t0) * 1000)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        pages = list(self.pool.map(self.fetch_one, urls))
        return (
            batch.append_column(
                "html", pa.array([p["html"] for p in pages], type=pa.large_string())
            )
            .append_column(
                "status", pa.array([p["status"] for p in pages], type=pa.int32())
            )
            .append_column(
                "success",
                pa.array([p["status"] == 200 for p in pages], type=pa.bool_()),
            )
            .append_column(
                "fetch_ms",
                # per-request latency (fetch_one measures it) — a batch
                # average would smear one slow timeout across every row
                pa.array(np.array([p["latency_ms"] for p in pages],
                                  dtype=np.float32), type=pa.float32()),
            )
            .append_column(
                "from_cache",
                pa.array(np.zeros(len(urls), dtype=bool)),
            )
        )
