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


class _FakeQAClient:
    """DETERMINISTIC STUB QA answerer — no model, no network (the A5
    environment gap; same policy as functions/llm_extract.FakeLLMClient).
    Picks the context sentence with the highest query-term overlap."""

    def complete(self, prompt: str):
        import re as _re

        from .functions.llm_extract import LLMResponse, TokenUsage

        m = _re.search(r"Content:\n(.*)\n\n\s*Question: (.*)\n",
                       prompt, _re.S)
        content, q = (m.group(1), m.group(2)) if m else (prompt, "")
        terms = {w.lower() for w in q.split() if len(w) > 2}
        best, best_score = "", -1.0
        for s in _re.split(r"(?<=[.!?])\s+|\n+", content):
            s = s.strip()
            if not s:
                continue
            words = {w.lower().strip(".,!?") for w in s.split()}
            score = len(terms & words) / (1.0 + 0.01 * len(words))
            if score > best_score:
                best, best_score = s, score
        n_in = len(prompt.split())
        n_out = len(best.split())
        return LLMResponse(best, TokenUsage(n_out, n_in, n_in + n_out))


class EngineHTTPServer:
    """Loopback HTTP facade over the engine."""

    def __init__(self, *, site_cfg: dict | None = None, host="127.0.0.1",
                 port: int = 0, job_ttl_seconds: float = 3600.0,
                 jwt_enabled: bool = False, jwt_required: bool = False,
                 secret_key: str | None = None, llm_client=None):
        import os
        import tempfile

        self.site_cfg = site_cfg
        # auth (reference deploy/docker/auth.py): HS256 JWT, enabled by
        # config flag; SECRET_KEY env default "mysecret" (auth.py:14).
        # jwt_enabled alone reproduces the reference quirk
        # (HTTPBearer(auto_error=False): a MISSING header passes);
        # jwt_required=True is the opt-in strict mode that 401s missing
        # or non-Bearer headers — use it for non-loopback binds, where
        # the quirk means the JWT layer provides zero access control.
        self.jwt_enabled = jwt_enabled or jwt_required
        self.jwt_required = jwt_required
        self.secret_key = secret_key or os.environ.get("SECRET_KEY",
                                                       "mysecret")
        # all per-request crawl output lives under ONE server-owned root
        # (removed in stop()); synchronous /crawl dirs are pruned oldest-
        # first past _keep_dirs, job dirs are removed with their task
        # record at TTL cleanup — a long-lived server stays bounded.
        self._tmp_root = tempfile.mkdtemp(prefix="c4r_srv_")
        self._req_dirs: list[str] = []
        self._keep_dirs = 32
        self.llm_client = llm_client
        # in-process job store — the Redis-hash analog of the reference's
        # job layer (deploy/docker/job.py + api.py:563-608): task_id →
        # {status, created_at, url, result, error}
        self._jobs: dict[str, dict] = {}
        self._jobs_lock = threading.Lock()
        self.job_ttl_seconds = job_ttl_seconds
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

            def _authorized(self) -> bool:
                """The reference token-dependency quirk (auth.py:31-43,
                HTTPBearer(auto_error=False)): with JWT enabled, a
                MISSING Authorization header passes (payload None) —
                only a PRESENT-but-invalid/expired token 401s."""
                if not outer.jwt_enabled:
                    return True
                hdr = self.headers.get("Authorization", "")
                if not hdr.startswith("Bearer "):
                    if outer.jwt_required:   # strict opt-in: no header
                        self._json(401, {"detail":
                                         "Authorization required"})
                        return False
                    return True
                from .functions.authkit import AuthError, verify_token

                try:
                    verify_token(hdr[len("Bearer "):], outer.secret_key)
                    return True
                except AuthError:
                    self._json(401,
                               {"detail": "Invalid or expired token"})
                    return False

            def do_GET(self):
                if self.path == "/health":
                    self._json(200, {"status": "ok",
                                     "timestamp": time.time()})
                elif self.path == "/schema":
                    self._json(200, outer.schema())
                elif not self._authorized():
                    pass
                elif self.path.startswith("/crawl/job/"):
                    task_id = self.path[len("/crawl/job/"):]
                    code, obj = outer.job_status(task_id)
                    self._json(code, obj)
                elif self.path.startswith("/llm/"):
                    try:
                        self._json(200, outer.llm_qa(
                            self.path[len("/llm/"):]))
                    except (KeyError, ValueError) as exc:
                        self._json(400, {"detail": str(exc)})
                    except Exception as exc:  # noqa: BLE001
                        self._json(500,
                                   {"detail": f"internal error: {exc}"})
                else:
                    self._json(404, {"detail": "not found"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._json(400, {"detail": "invalid json"})
                    return
                if self.path == "/token":
                    code, obj = outer.token(req)
                    self._json(code, obj)
                    return
                if not self._authorized():
                    return
                try:
                    if self.path == "/md":
                        self._json(200, outer.md(req))
                    elif self.path == "/html":
                        self._json(200, outer.html(req))
                    elif self.path == "/crawl":
                        self._json(200, outer.crawl(req))
                    elif self.path == "/crawl/stream":
                        outer.crawl_stream(req, self)
                    elif self.path == "/crawl/job":
                        self._json(200, outer.crawl_job(req))
                    elif self.path == "/screenshot":
                        self._json(200, outer.screenshot(req))
                    elif self.path == "/pdf":
                        self._json(200, outer.pdf(req))
                    elif self.path == "/execute_js":
                        self._json(200, outer.execute_js(req))
                    elif self.path == "/mcp":
                        resp = outer.mcp().handle(req)
                        if resp is None:   # JSON-RPC notification
                            self._json(202, {})
                        else:
                            self._json(200, resp)
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

    def _crawl_cfg(self, req: dict, *, validate_only: bool = False):
        """Shared /crawl request validation → (CrawlConfig, urls).
        ``validate_only`` skips output-dir allocation (the /crawl/job
        enqueue path validates twice; only the runner needs a dir)."""
        import tempfile

        from .pipelines.crawl import CrawlConfig

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
        if validate_only:
            ccfg["out_dir"] = self._tmp_root   # never written
        else:
            req_dir = tempfile.mkdtemp(prefix="req_", dir=self._tmp_root)
            ccfg["out_dir"] = req_dir
            self._track_dir(req_dir)
            if ccfg.get("cache_mode", "bypass") != "bypass":
                ccfg["cache_dir"] = req_dir + "/cache"
        return CrawlConfig(**ccfg), urls

    def _track_dir(self, path: str) -> None:
        """Bounded request-dir ledger: prune oldest past _keep_dirs."""
        import shutil

        with self._jobs_lock:
            self._req_dirs.append(path)
            stale = self._req_dirs[:-self._keep_dirs]
            self._req_dirs = self._req_dirs[-self._keep_dirs:]
        for d in stale:
            shutil.rmtree(d, ignore_errors=True)

    def crawl(self, req: dict) -> dict:
        from .pipelines.crawl import CrawlEngine

        cfg, urls = self._crawl_cfg(req)
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

    def crawl_stream(self, req: dict, handler) -> None:
        """POST /crawl/stream — NDJSON streaming (reference
        server.py:449-471 + api.py:385-417): one JSON line per crawled
        page AS SUPERSTEPS COMMIT (the engine's ``on_superstep`` hook is
        the stream grain — the BSP analog of the reference's
        ``stream=True`` generator), a ``{"status": "completed"}``
        terminator, and mid-stream failures emitted as
        ``{"error": ...}`` lines rather than dropped connections.
        Validation errors raise BEFORE headers are sent, so they still
        map to the normal 422/500 JSON responses."""
        import resource

        from .pipelines.crawl import CrawlEngine

        cfg, urls = self._crawl_cfg(req)

        handler.send_response(200)
        handler.send_header("Content-Type", "application/x-ndjson")
        handler.send_header("Cache-Control", "no-cache")
        handler.send_header("X-Stream-Status", "active")
        handler.send_header("Connection", "close")
        handler.end_headers()

        def emit(obj: dict) -> None:
            handler.wfile.write((json.dumps(obj) + "\n").encode("utf-8"))
            handler.wfile.flush()

        def hook(k: int, docs_dir: str, order_tbl) -> None:
            if order_tbl is None or order_tbl.num_rows == 0:
                return
            mem_mb = round(resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
            for r in order_tbl.to_pylist():
                emit({
                    "url": r.get("url"), "status": r.get("status"),
                    "success": r.get("success"),
                    "depth": r.get("depth"), "superstep": k,
                    "server_memory_mb": mem_mb,
                })

        try:
            eng = CrawlEngine(cfg,
                              fetcher_kwargs={"site_cfg": self.site_cfg},
                              on_superstep=hook)
            eng.run(urls)
            emit({"status": "completed"})
        except Exception as exc:  # noqa: BLE001 — headers already sent:
            # the error must reach the client as a stream line
            emit({"error": str(exc)})

    def crawl_job(self, req: dict) -> dict:
        """POST /crawl/job — fire-and-forget enqueue (reference
        api.py:563-608): validate now (bad requests 422 at enqueue, not
        at poll), store a processing task, run the crawl in a background
        thread, let GET /crawl/job/{task_id} polling fetch the result."""
        import datetime
        import uuid

        self._crawl_cfg(req, validate_only=True)  # runner allocates
        task_id = f"crawl_{uuid.uuid4().hex[:8]}"
        created = datetime.datetime.now().isoformat()
        with self._jobs_lock:
            self._jobs[task_id] = {
                "status": "processing", "created_at": created,
                "url": json.dumps(req["urls"]), "result": "", "error": "",
            }

        def _runner() -> None:
            try:
                result = self.crawl(req)
                update = {"status": "completed",
                          "result": json.dumps(result)}
            except Exception as exc:  # noqa: BLE001 — failures must land
                # in the task record, not kill the worker thread
                update = {"status": "failed", "error": str(exc)}
            with self._jobs_lock:
                if task_id in self._jobs:
                    self._jobs[task_id].update(update)

        threading.Thread(target=_runner, daemon=True).start()
        return {"task_id": task_id}

    def job_status(self, task_id: str) -> tuple[int, dict]:
        """GET /crawl/job/{task_id} — the task-status law
        (api.py:294-383): 404 for unknown ids; response carries
        task_id/status/created_at/url + _links; ``result`` only when
        completed, ``error`` only when failed; terminal tasks past the
        TTL are deleted on read (should_cleanup_task,
        deploy/docker/utils.py:63-66)."""
        import datetime

        with self._jobs_lock:
            task = dict(self._jobs.get(task_id) or {})
        if not task:
            return 404, {"detail": "Task not found"}
        response = {
            "task_id": task_id,
            "status": task["status"],
            "created_at": task["created_at"],
            "url": task["url"],
            "_links": {
                "self": {"href": f"/crawl/job/{task_id}"},
                "refresh": {"href": f"/crawl/job/{task_id}"},
            },
        }
        if task["status"] == "completed":
            response["result"] = json.loads(task["result"])
        elif task["status"] == "failed":
            response["error"] = task["error"]
        if task["status"] in ("completed", "failed"):
            created = datetime.datetime.fromisoformat(task["created_at"])
            age = (datetime.datetime.now() - created).total_seconds()
            if age > self.job_ttl_seconds:
                with self._jobs_lock:
                    self._jobs.pop(task_id, None)
        return 200, response

    # -- render-backed endpoints (S7 contract through the serve facade) ------

    def _render(self, url: str, **cfg_kwargs) -> "object":
        """One render through the pluggable S7 contract. The fixture
        renderer serves in-container; a Playwright pool swaps in by
        replacing the renderer class — the endpoint bodies don't change."""
        from .stages.render import FixtureRenderer, RenderConfig

        r = getattr(self, "_renderer", None)
        if r is None:
            r = FixtureRenderer(self.site_cfg)
            r.start()
            self._renderer = r
        return r.render(url, RenderConfig(**cfg_kwargs))

    def screenshot(self, req: dict) -> dict:
        """POST /screenshot (reference server.py:281-303). Divergence by
        design: the reference writes to a client-supplied output_path;
        this server never writes client paths (the r3 path-whitelist law)
        — the PNG always returns base64."""
        res = self._render(req["url"], screenshot=True,
                           screenshot_wait_for=req.get(
                               "screenshot_wait_for"))
        if not res.screenshot:
            raise ValueError("screenshot capture failed")
        return {"success": True, "screenshot": res.screenshot}

    def pdf(self, req: dict) -> dict:
        """POST /pdf (reference server.py:308-331); base64-only, same
        path law as /screenshot."""
        import base64 as _b64

        res = self._render(req["url"], pdf=True)
        if not res.pdf_data:
            raise ValueError("pdf capture failed")
        return {"success": True,
                "pdf": _b64.b64encode(res.pdf_data).decode()}

    def execute_js(self, req: dict) -> dict:
        """POST /execute_js (reference server.py:334-427): run the
        snippet list on the page, return the crawl-result view (url,
        html, js_execution_result, success)."""
        scripts = req.get("scripts") or req.get("js_code")
        if not scripts:
            raise ValueError("scripts (list of JS snippets) required")
        res = self._render(req["url"], js_code=scripts)
        return {
            "url": req["url"],
            "html": res.html,
            "success": res.status_code == 200,
            "status_code": res.status_code,
            "js_execution_result": res.js_execution_result,
        }

    def token(self, req: dict) -> tuple[int, dict]:
        """POST /token (reference server.py:216-221): email-domain check
        then an HS256 access token with the ``sub`` claim."""
        from .functions.authkit import (create_access_token,
                                        verify_email_domain)

        email = str(req.get("email") or "")
        if not verify_email_domain(email):
            return 400, {"detail": "Invalid email domain"}
        return 200, {
            "email": email,
            "access_token": create_access_token({"sub": email},
                                                self.secret_key),
            "token_type": "bearer",
        }

    def llm_qa(self, path_and_query: str) -> dict:
        """GET /llm/{url}?q=... (reference server.py:395-407 +
        api.py:61-108): crawl the url, take fit-markdown (raw fallback),
        build the exact QA prompt, answer via the pluggable LLM client
        (deterministic labeled stub in this environment — the same A5
        policy as functions/llm_extract)."""
        from urllib.parse import parse_qs, unquote, urlsplit

        parts = urlsplit(path_and_query)
        q = (parse_qs(parts.query).get("q") or [""])[0]
        if not q:
            raise ValueError("Query parameter 'q' is required")
        url = unquote(parts.path)
        if not url.startswith(("http://", "https://")) \
                and not url.startswith(("raw:", "raw://")):
            url = "https://" + url
        # reference quirk: strip a trailing '?q=' remnant from the url
        last_q = url.rfind("?q=")
        if last_q != -1:
            url = url[:last_q]

        page = self._fetch(url.replace("https://", "http://", 1)
                           if url.startswith("https://") else url)
        if page["status"] != 200:
            raise RuntimeError(f"fetch failed with {page['status']}")
        content = _md_for(page["html"], url, "fit", None) \
            or _md_for(page["html"], url, "raw", None)
        prompt = f"""Use the following content as context to answer the question.
    Content:
    {content}

    Question: {q}

    Answer:"""
        client = self.llm_client or _FakeQAClient()
        return {"answer": client.complete(prompt).content}

    def mcp(self):
        """Lazily-built MCP bridge over this server (deploy/docker/
        mcp_bridge.py analog); POST /mcp speaks JSON-RPC 2.0."""
        b = getattr(self, "_mcp", None)
        if b is None:
            from .mcp_bridge import MCPBridge

            b = MCPBridge(self)
            self._mcp = b
        return b

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
        import shutil

        self._srv.shutdown()
        self._srv.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        shutil.rmtree(self._tmp_root, ignore_errors=True)
