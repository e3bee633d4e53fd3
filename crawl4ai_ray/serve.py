"""REST serving layer (S11) — the reference Docker API surface, offline.

Mirrors the data-plane endpoints of the reference's FastAPI server
(/root/reference/deploy/docker/server.py): ``GET /health``,
``GET /schema``, ``POST /md`` (filter f = raw | fit | bm25 with query q —
schemas.py:12-18), ``POST /html`` (schema-extraction preprocessing),
``POST /crawl`` (url list → results), ``POST /config/dump`` (single
config-call expression → dict). FastAPI/uvicorn are not in this
environment, so the server is a stdlib ``ThreadingHTTPServer`` bound to
loopback; the browser-dependent endpoints (/screenshot, /pdf,
/execute_js) and the LLM proxy are out of scope like the rest of the
browser stack.

The server owns no Ray session: it serves from whatever Ray runtime the
embedding process already holds (the same contract as the engine
library). Fetching goes through the pluggable fetcher stage — the
synthetic web in tests, ``HttpFetcher`` where real fetching is possible.
"""

from __future__ import annotations

import ast
import json
import threading
import time
from dataclasses import fields
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _md_for(html: str, url: str, flt: str, query: str | None) -> str:
    from .functions.content_filter import (BM25ContentFilter,
                                           PruningContentFilter,
                                           fit_markdown_from_html)
    from .functions.md_compat import html_to_markdown_compat

    if flt == "raw":
        return html_to_markdown_compat(html, url)
    if flt == "bm25":
        f = BM25ContentFilter(user_query=query)
        return fit_markdown_from_html(html, url, f)["fit_markdown"]
    # default: fit (PruningContentFilter), reference FilterType.FIT
    return fit_markdown_from_html(html, url,
                                  PruningContentFilter())["fit_markdown"]


def safe_config_dump(code: str) -> dict:
    """The /config/dump law: accept exactly ONE top-level call to
    CrawlConfig(...) with literal keyword arguments (the reference
    restricts /config/dump to a single CrawlerRunConfig/BrowserConfig
    expression and rejects anything else — server.py:224-231)."""
    from .pipelines.crawl import CrawlConfig

    tree = ast.parse(code.strip(), mode="eval")
    call = tree.body
    if not (isinstance(call, ast.Call) and isinstance(call.func, ast.Name)
            and call.func.id == "CrawlConfig" and not call.args):
        raise ValueError("expected a single CrawlConfig(...) call")
    kwargs = {}
    for kw in call.keywords:
        if kw.arg is None:
            raise ValueError("**kwargs not allowed")
        kwargs[kw.arg] = ast.literal_eval(kw.value)
    # the reference endpoint returns obj.dump() — the {type, params}
    # serialization format (server.py:209, async_configs.py:44-115)
    return CrawlConfig(**kwargs).dump()


class EngineHTTPServer:
    """Loopback HTTP facade over the engine."""

    def __init__(self, *, site_cfg: dict | None = None, host="127.0.0.1",
                 port: int = 0):
        self.site_cfg = site_cfg
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):    # silent
                pass

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok",
                                     "timestamp": time.time()})
                elif self.path == "/schema":
                    self._json(200, outer.schema())
                else:
                    self._json(404, {"detail": "not found"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._json(400, {"detail": "invalid json"})
                    return
                try:
                    if self.path == "/md":
                        self._json(200, outer.md(req))
                    elif self.path == "/html":
                        self._json(200, outer.html(req))
                    elif self.path == "/crawl":
                        self._json(200, outer.crawl(req))
                    elif self.path == "/config/dump":
                        self._json(200, safe_config_dump(req["code"]))
                    else:
                        self._json(404, {"detail": "not found"})
                except (KeyError, ValueError, TypeError, AttributeError,
                        SyntaxError) as exc:
                    # SyntaxError surfaces from /config/dump parsing;
                    # AttributeError from non-string payload fields
                    self._json(422, {"detail": str(exc)})
                except Exception as exc:  # noqa: BLE001 — engine failures
                    # (RuntimeError/OSError/...) must yield an HTTP status,
                    # not a dropped connection.
                    self._json(500, {"detail": f"internal error: {exc}"})

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.port = self._srv.server_address[1]
        self._thread: threading.Thread | None = None

    # -- endpoint bodies -----------------------------------------------------

    def _fetch(self, url: str) -> dict:
        from .stages.fetch import SyntheticFetcher

        # SyntheticFetcher already normalizes dict | SiteConfig | None
        return SyntheticFetcher(self.site_cfg).fetch_one(url)

    def md(self, req: dict) -> dict:
        url = req["url"]
        flt = req.get("f", "fit")
        query = req.get("q")
        page = self._fetch(url)
        if page["status"] != 200:
            raise ValueError(f"fetch failed with {page['status']}")
        return {
            "url": url,
            "filter": flt,
            "query": query,
            "cache": req.get("c", "0"),
            "markdown": _md_for(page["html"], url, flt, query),
            "success": True,
        }

    def html(self, req: dict) -> dict:
        from .functions.textutils import preprocess_html_for_schema

        url = req["url"]
        page = self._fetch(url)
        return {"url": url, "success": page["status"] == 200,
                "html": preprocess_html_for_schema(page["html"])}

    def crawl(self, req: dict) -> dict:
        import tempfile

        from .pipelines.crawl import CrawlConfig, CrawlEngine

        urls = req["urls"]
        if not isinstance(urls, list) or not (1 <= len(urls) <= 100):
            raise ValueError("urls must be a list of 1..100")
        raw_cfg = dict(req.get("crawler_config") or {})
        # Only behavioural knobs are accepted over HTTP. Filesystem-path
        # fields (out_dir / cache_dir / checkpoint_dir) are server-owned:
        # a client that can reach the socket must not direct writes to
        # arbitrary paths (the CLI allows non-loopback binds).
        allowed = {
            "strategy", "max_depth", "max_pages", "include_external",
            "score_threshold", "bff_batch_size", "n_seen_shards",
            "fetch_concurrency", "fetch_batch_size", "parse_batch_size",
            "keep_html", "image_score_threshold", "simulate_latency",
            "politeness", "politeness_partitions", "superstep_seconds",
            "politeness_jitter", "check_robots", "cache_mode",
            "compat_markdown",
        }
        rejected = sorted(set(raw_cfg) - allowed)
        if rejected:
            raise ValueError(
                f"crawler_config fields not accepted over HTTP: {rejected}")
        ccfg = {k: v for k, v in raw_cfg.items() if k in allowed}
        ccfg.setdefault("max_depth", 1)
        ccfg.setdefault("n_seen_shards", 2)
        ccfg.setdefault("fetch_concurrency", 2)
        srv_root = tempfile.mkdtemp(prefix="c4r_srv_")
        ccfg["out_dir"] = srv_root
        if ccfg.get("cache_mode", "bypass") != "bypass":
            ccfg["cache_dir"] = srv_root + "/cache"
        cfg = CrawlConfig(**ccfg)
        eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": self.site_cfg})
        res = eng.run(urls)
        return {
            "success": True,
            "count": len(res.order),
            "pages_crawled": res.pages_crawled,
            "results": [
                {"url": r["url"], "status": r["status"],
                 "success": r["success"], "depth": r["depth"]}
                for r in res.order
            ],
            "docs_dir": res.docs_dir,
        }

    def schema(self) -> dict:
        from .pipelines.crawl import CrawlConfig

        return {
            "CrawlConfig": {
                f.name: repr(f.default) for f in fields(CrawlConfig)
            }
        }

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> "EngineHTTPServer":
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread:
            self._thread.join(timeout=5)
