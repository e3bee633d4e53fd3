"""Browser-render stage contract (S7 interface) + DOM-snapshot fixture.

The reference renders js-heavy pages with
AsyncPlaywrightCrawlerStrategy.crawl(url, config)
(/root/reference/crawl4ai/async_crawler_strategy.py:45-2134): one call per
URL, the config carrying js_code / wait_for / screenshot / pdf /
capture_mhtml knobs, returning an AsyncCrawlResponse
(/root/reference/crawl4ai/models.py:310-323). This module fixes the
Ray-side contract so a real browser pool drops into the engine with zero
engine changes:

- ``RenderConfig``: the per-crawl knob subset the Playwright strategy
  consumes (js_code, wait_for, screenshot/pdf/mhtml flags, timeouts).
- ``Renderer``: the plug-in protocol — ``start()`` once per actor (browser
  launch), ``render(url, cfg) -> RenderResult`` per URL, ``close()`` at
  actor teardown. A Playwright-backed implementation satisfies it
  directly (crawl() is this signature minus the async plumbing).
- ``RenderResult``: field-for-field mirror of AsyncCrawlResponse
  (html, response_headers, js_execution_result, status_code, screenshot
  [base64 str, as the reference stores it], pdf_data, mhtml_data,
  downloaded_files, redirected_url, network_requests, console_messages).
- ``RenderStage``: the actor-pool ``map_batches`` callable. ``__init__``
  builds the renderer ONCE per actor (browser launch is the model-load
  analog — never per batch); ``__call__`` renders a URL batch and appends
  typed Arrow columns. The html/status/success/fetch_ms/from_cache
  columns match the engine fetch contract, so the parse stage and the
  whole crawl pipeline run unchanged downstream; screenshots/PDF/MHTML
  ride as opaque binary columns with typed metadata.
- ``FixtureRenderer``: the DOM-snapshot fixture — deterministic
  pre-rendered HTML over the synthetic web (hydration marker + js_code
  effect nodes), deterministic screenshot PNG bytes (own encoder),
  deterministic page-PDF bytes. The container has no browser, so the
  fixture is what keeps the contract TESTED: an interface mismatch in a
  future browser pool fails these tests, not production.

``smart_wait`` classification (js:/css:/auto — the reference's
async_crawler_strategy.py:231-293 law) is ported as ``classify_wait_for``
so schedulers can validate wait_for strings without a browser.
"""

from __future__ import annotations

import base64
import hashlib
import json
import time
import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.pdfkit import png_encode
from ..functions.urlkit import hash64
from ..sources.synthetic_web import SiteConfig, SyntheticWeb


@dataclass
class RenderConfig:
    """Per-crawl render knobs — the CrawlerRunConfig subset the reference's
    Playwright strategy consumes (async_configs.py fields read inside
    async_crawler_strategy._crawl_web)."""

    js_code: str | list[str] | None = None
    wait_for: str | None = None
    wait_for_timeout: float = 30_000.0      # ms
    page_timeout: float = 60_000.0          # ms
    screenshot: bool = False
    screenshot_wait_for: float | None = None
    pdf: bool = False
    capture_mhtml: bool = False
    capture_console_messages: bool = False
    capture_network_requests: bool = False
    session_id: str | None = None
    js_only: bool = False


@dataclass
class RenderResult:
    """Field-for-field mirror of the reference's AsyncCrawlResponse
    (models.py:310-323), minus the async-only get_delayed_content hook."""

    html: str
    response_headers: dict = field(default_factory=dict)
    js_execution_result: dict | None = None
    status_code: int = 200
    screenshot: str | None = None           # base64, like the reference
    pdf_data: bytes | None = None
    mhtml_data: str | None = None
    downloaded_files: list[str] | None = None
    ssl_certificate: Any | None = None
    redirected_url: str | None = None
    network_requests: list[dict] | None = None
    console_messages: list[dict] | None = None


def classify_wait_for(wait_for: str | None) -> tuple[str, str] | None:
    """The smart_wait dispatch law (async_crawler_strategy.py:231-293):
    'js:' prefix → JS predicate; 'css:' prefix → selector; otherwise a
    string starting with '()' or 'function' is JS, anything else is tried
    as a CSS selector first with a JS-wrap fallback ('auto-css')."""
    if wait_for is None:
        return None
    wait_for = wait_for.strip()
    if wait_for.startswith("js:"):
        return ("js", wait_for[3:].strip())
    if wait_for.startswith("css:"):
        return ("css", wait_for[4:].strip())
    if wait_for.startswith("()") or wait_for.startswith("function"):
        return ("js", wait_for)
    return ("auto-css", wait_for)


class Renderer:
    """Plug-in protocol for browser pools. Implementations hold the
    browser; the engine holds only this interface."""

    def start(self) -> None:  # browser/context launch — once per actor
        pass

    def render(self, url: str, cfg: RenderConfig) -> RenderResult:
        raise NotImplementedError

    def close(self) -> None:  # teardown at actor exit
        pass


class FixtureRenderer(Renderer):
    """DOM-snapshot fixture renderer over the deterministic synthetic web.

    "Rendering" = the fetcher html plus a hydration marker and one
    deterministic effect node per js_code script — a pure function of
    (site config, url, render config), so golden-gated pipelines stay
    byte-stable. Screenshots are real PNG bytes (8x8 RGB, pixels derived
    from the url hash) through the same encoder the PDF pipeline uses;
    page-PDF is a deterministic byte stub with a valid %PDF header.
    """

    def __init__(self, site_cfg: dict | SiteConfig | None = None):
        if isinstance(site_cfg, dict):
            site_cfg = SiteConfig(**site_cfg)
        self.site = SyntheticWeb(site_cfg or SiteConfig())
        self.started = False

    def start(self) -> None:
        self.started = True

    def close(self) -> None:
        self.started = False

    # -- deterministic artifacts ---------------------------------------------

    def _screenshot_png(self, url: str) -> bytes:
        h = hash64(f"shot:{url}")
        rng = np.random.default_rng(h % (1 << 32))
        raw = rng.integers(0, 256, size=8 * 8 * 3, dtype=np.uint8)
        return png_encode(raw.tobytes(), 8, 8, mode="RGB")

    def _page_pdf(self, url: str, html: str) -> bytes:
        # valid-header deterministic stub (no layout engine in-container)
        digest = hashlib.sha256(html.encode()).hexdigest()
        body = f"%PDF-1.4\n% fixture page-pdf {url} {digest}\n%%EOF\n"
        return body.encode()

    def render(self, url: str, cfg: RenderConfig) -> RenderResult:
        if not self.started:
            raise RuntimeError("Renderer.render before start() — the "
                               "actor must launch the browser in __init__")
        page = self.site.page(url)
        html, status = page["html"], page["status"]
        headers = {
            "content-type": "text/html; charset=utf-8",
            "x-render-engine": "fixture-dom-snapshot",
        }

        js_result = None
        effects = []
        if cfg.js_code is not None:
            scripts = [cfg.js_code] if isinstance(cfg.js_code, str) \
                else list(cfg.js_code)
            results = []
            for i, script in enumerate(scripts):
                sid = hash64(f"js:{url}:{i}:{script}") % 100000
                effects.append(
                    f'<div class="js-effect" data-script="{i}" '
                    f'data-sid="{sid}"></div>')
                # per-script entry law: result object, or {"success": True}
                # when the script returns nothing
                # (async_crawler_strategy.py:1863)
                results.append({"success": True, "result": int(sid)})
            js_result = {"success": True, "results": results}

        wait = classify_wait_for(cfg.wait_for)
        if wait is not None:
            headers["x-render-wait-kind"] = wait[0]

        hydrated = ('<div id="__hydrated" data-render="fixture"'
                    + (f' data-wait="{wait[0]}"' if wait else "")
                    + ">" + "".join(effects) + "</div>")
        if "</body>" in html:
            html = html.replace("</body>", hydrated + "</body>", 1)
        else:
            html = html + hydrated

        shot = None
        if cfg.screenshot:
            shot = base64.b64encode(self._screenshot_png(url)).decode()
        pdf = self._page_pdf(url, html) if cfg.pdf else None
        mhtml = None
        if cfg.capture_mhtml:
            mhtml = ("MIME-Version: 1.0\nContent-Type: multipart/related;"
                     " boundary=\"fixture\"\n\n--fixture\n"
                     f"Content-Location: {url}\n\n{html}\n--fixture--\n")
        console = None
        if cfg.capture_console_messages:
            console = [{"type": "log",
                        "text": f"fixture:rendered:{url}"}]
        network = None
        if cfg.capture_network_requests:
            network = [{"url": url, "method": "GET",
                        "resource_type": "document"}]
        return RenderResult(
            html=html,
            response_headers=headers,
            js_execution_result=js_result,
            status_code=status,
            screenshot=shot,
            pdf_data=pdf,
            mhtml_data=mhtml,
            network_requests=network,
            console_messages=console,
        )


try:  # real browser path — activates iff the package is installed
    from playwright.sync_api import sync_playwright  # noqa: F401

    PLAYWRIGHT_AVAILABLE = True
except ImportError:  # pragma: no cover - sandbox has no playwright
    PLAYWRIGHT_AVAILABLE = False


def default_renderer_cls():
    """The model_loader activation pattern for S7: a real browser when
    ``playwright`` imports, the DOM-snapshot fixture otherwise. Engine
    call sites that don't pin a renderer use this."""
    return PlaywrightRenderer if PLAYWRIGHT_AVAILABLE else FixtureRenderer


class PlaywrightRenderer(Renderer):
    """Real-browser renderer satisfying the S7 ``Renderer`` contract via
    Playwright's sync API (one browser per Ray actor — the actor IS the
    event loop, so the async plumbing of the reference adds nothing).

    Behavioral port of the reference's Playwright strategy
    (async_crawler_strategy.py:45-2134), laws kept:

    - smart_wait dispatch (async_crawler_strategy.py:231-293) through the
      shared ``classify_wait_for``: ``js:`` → wait_for_function, ``css:``
      → wait_for_selector (Timeout → TimeoutError, other errors →
      ValueError), auto → selector first with a ``() => {...}`` JS-wrap
      fallback on non-timeout errors;
    - per-script js result law (async_crawler_strategy.py:1863-1875):
      each script appends its evaluate() result or ``{"success": True}``
      when it returns nothing, failures append ``{"success": False,
      "error": ...}``, the envelope is ``{"success": True, "results":
      [...]}``;
    - session reuse (async_crawler_strategy.py:418-427,1050-1053):
      ``cfg.session_id`` pins a page that survives across render() calls
      (``js_only=True`` skips navigation and operates on it);
      ``kill_session`` closes it;
    - screenshot → base64 str, pdf → bytes, mhtml via the CDP
      ``Page.captureSnapshot`` call (chromium), console/network capture
      behind their flags — the AsyncCrawlResponse field contract.

    Construction succeeds only when ``playwright`` is importable; the
    class raises ImportError otherwise so a misconfigured pool fails at
    actor __init__, not mid-crawl.
    """

    def __init__(self, browser_type: str = "chromium",
                 headless: bool = True, user_agent: str | None = None,
                 viewport: tuple[int, int] = (1280, 720),
                 java_script_enabled: bool = True,
                 launch_args: list[str] | None = None):
        if not PLAYWRIGHT_AVAILABLE:
            raise ImportError(
                "PlaywrightRenderer requires the 'playwright' package "
                "(pip install playwright && playwright install "
                f"{browser_type})")
        self.browser_type = browser_type
        self.headless = headless
        self.user_agent = user_agent
        self.viewport = viewport
        self.java_script_enabled = java_script_enabled
        self.launch_args = launch_args or []
        self._pw = None
        self._browser = None
        self._ctx = None
        self._sessions: dict[str, Any] = {}

    def start(self) -> None:
        from playwright.sync_api import sync_playwright

        self._pw = sync_playwright().start()
        self._browser = getattr(self._pw, self.browser_type).launch(
            headless=self.headless, args=self.launch_args)
        ctx_kwargs: dict[str, Any] = {
            "viewport": {"width": self.viewport[0],
                         "height": self.viewport[1]},
            "java_script_enabled": self.java_script_enabled,
        }
        if self.user_agent:
            ctx_kwargs["user_agent"] = self.user_agent
        self._ctx = self._browser.new_context(**ctx_kwargs)

    def close(self) -> None:
        for sid in list(self._sessions):
            self.kill_session(sid)
        for obj, meth in ((self._ctx, "close"), (self._browser, "close"),
                          (self._pw, "stop")):
            try:
                if obj is not None:
                    getattr(obj, meth)()
            except Exception:
                pass
        self._pw = self._browser = self._ctx = None

    def kill_session(self, session_id: str) -> None:
        page = self._sessions.pop(session_id, None)
        if page is not None:
            try:
                page.close()
            except Exception:
                pass

    # -- law implementations ---------------------------------------------

    def _smart_wait(self, page, wait_for: str, timeout: float) -> None:
        kind, expr = classify_wait_for(wait_for)
        if kind == "js":
            page.wait_for_function(expr, timeout=timeout)
            return
        if kind == "css":
            try:
                page.wait_for_selector(expr, timeout=timeout)
            except Exception as e:
                if "Timeout" in str(e):
                    raise TimeoutError(
                        f"Timeout after {timeout}ms waiting for "
                        f"selector '{expr}'") from None
                raise ValueError(
                    f"Invalid CSS selector: '{expr}'") from None
            return
        # auto: CSS first, JS-wrap fallback on non-timeout errors
        try:
            page.wait_for_selector(expr, timeout=timeout)
        except Exception as e:
            if "Timeout" in str(e):
                raise TimeoutError(
                    f"Timeout after {timeout}ms waiting for "
                    f"selector '{expr}'") from None
            try:
                page.wait_for_function(f"() => {{{expr}}}",
                                       timeout=timeout)
            except Exception:
                raise ValueError(
                    f"Invalid wait_for parameter: '{expr}'. It should "
                    "be either a valid CSS selector, a JavaScript "
                    "function, or explicitly prefixed with 'js:' or "
                    "'css:'.") from None

    def _execute_js(self, page, js_code) -> dict:
        scripts = [js_code] if isinstance(js_code, str) else list(js_code)
        results = []
        for script in scripts:
            try:
                result = page.evaluate(script)
                try:
                    page.wait_for_load_state("domcontentloaded",
                                             timeout=5000)
                except Exception:
                    pass  # reference logs and continues (":1843")
                results.append(result if result else {"success": True})
            except Exception as e:
                results.append({"success": False, "error": str(e)})
        return {"success": True, "results": results}

    def render(self, url: str, cfg: RenderConfig) -> RenderResult:
        if self._ctx is None:
            raise RuntimeError("Renderer.render before start() — the "
                               "actor must launch the browser in __init__")
        sid = cfg.session_id
        page = self._sessions.get(sid) if sid else None
        owns_page = page is None
        if page is None:
            page = self._ctx.new_page()
            if sid:
                self._sessions[sid] = page
                owns_page = False

        console: list[dict] | None = \
            [] if cfg.capture_console_messages else None
        network: list[dict] | None = \
            [] if cfg.capture_network_requests else None
        if console is not None:
            page.on("console", lambda m: console.append(
                {"type": m.type, "text": m.text}))
        if network is not None:
            page.on("request", lambda r: network.append(
                {"url": r.url, "method": r.method,
                 "resource_type": r.resource_type}))

        try:
            status, headers = 200, {}
            if not cfg.js_only:
                resp = page.goto(url, timeout=cfg.page_timeout,
                                 wait_until="domcontentloaded")
                if resp is not None:
                    status, headers = resp.status, dict(resp.headers)

            js_result = None
            if cfg.js_code is not None:
                js_result = self._execute_js(page, cfg.js_code)
            if cfg.wait_for:
                self._smart_wait(page, cfg.wait_for,
                                 cfg.wait_for_timeout)

            shot = None
            if cfg.screenshot:
                if cfg.screenshot_wait_for:
                    time.sleep(cfg.screenshot_wait_for)
                shot = base64.b64encode(
                    page.screenshot(full_page=True)).decode()
            pdf = None
            if cfg.pdf:
                try:
                    pdf = page.pdf()   # chromium-only in playwright
                except Exception:
                    pdf = None
            mhtml = None
            if cfg.capture_mhtml:
                try:
                    cdp = self._ctx.new_cdp_session(page)
                    mhtml = cdp.send("Page.captureSnapshot",
                                     {"format": "mhtml"})["data"]
                    cdp.detach()
                except Exception:
                    mhtml = None

            final_url = page.url
            return RenderResult(
                html=page.content(),
                response_headers=headers,
                js_execution_result=js_result,
                status_code=status,
                screenshot=shot,
                pdf_data=pdf,
                mhtml_data=mhtml,
                redirected_url=(final_url
                                if final_url and final_url != url
                                else None),
                network_requests=network,
                console_messages=console,
            )
        finally:
            if owns_page:
                try:
                    page.close()
                except Exception:
                    pass


class RenderStage:
    """Actor-pool render stage: ``map_batches(RenderStage,
    fn_constructor_kwargs=..., concurrency=(1, N), num_cpus=c)``.

    ``__init__`` constructs and starts the renderer once per actor —
    browser launch cost amortizes over every batch the actor sees.
    ``__call__`` renders each url of the batch and appends:

    - the engine fetch contract: ``html`` (large_string), ``status``
      (int32), ``success`` (bool), ``fetch_ms`` (float32), ``from_cache``
      (bool) — so ``_parse_stage`` and the rest of the crawl pipeline run
      unchanged on rendered DOM;
    - render extras as opaque typed columns: ``screenshot``
      (large_binary PNG), ``pdf_data`` (large_binary), ``mhtml``
      (large_string), ``js_result`` / ``response_headers`` /
      ``console_messages`` / ``network_requests`` (JSON strings),
      ``redirected_url`` (string).

    Screenshot/PDF payloads are large: size ``batch_size`` small (the
    multimodal law — batch x concurrency must fit the worker heap).
    """

    def __init__(self, renderer_cls=FixtureRenderer,
                 renderer_kwargs: dict | None = None,
                 render_cfg: dict | RenderConfig | None = None):
        if isinstance(render_cfg, dict):
            render_cfg = RenderConfig(**render_cfg)
        self.cfg = render_cfg or RenderConfig()
        self.renderer = renderer_cls(**(renderer_kwargs or {}))
        self.renderer.start()

    def __del__(self):
        try:
            self.renderer.close()
        except Exception:
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "html", "status", "fetch_ms", "screenshot", "pdf_data",
            "mhtml", "js_result", "response_headers", "console_messages",
            "network_requests", "redirected_url")}
        for u in urls:
            t0 = time.perf_counter()
            r = self.renderer.render(u, self.cfg)
            cols["html"].append(r.html)
            cols["status"].append(r.status_code)
            cols["fetch_ms"].append((time.perf_counter() - t0) * 1000.0)
            cols["screenshot"].append(
                base64.b64decode(r.screenshot) if r.screenshot else None)
            cols["pdf_data"].append(r.pdf_data)
            cols["mhtml"].append(r.mhtml_data)
            cols["js_result"].append(
                json.dumps(r.js_execution_result, sort_keys=True)
                if r.js_execution_result is not None else None)
            cols["response_headers"].append(
                json.dumps(r.response_headers, sort_keys=True))
            cols["console_messages"].append(
                json.dumps(r.console_messages)
                if r.console_messages is not None else None)
            cols["network_requests"].append(
                json.dumps(r.network_requests)
                if r.network_requests is not None else None)
            cols["redirected_url"].append(r.redirected_url)
        statuses = cols["status"]
        return (
            batch.append_column("html", pa.array(cols["html"],
                                                 type=pa.large_string()))
            .append_column("status", pa.array(statuses, type=pa.int32()))
            .append_column("success", pa.array(
                [s == 200 for s in statuses], type=pa.bool_()))
            .append_column("fetch_ms", pa.array(
                np.asarray(cols["fetch_ms"], dtype=np.float32),
                type=pa.float32()))
            .append_column("from_cache", pa.array(
                np.zeros(len(urls), dtype=bool)))
            .append_column("screenshot", pa.array(
                cols["screenshot"], type=pa.large_binary()))
            .append_column("pdf_data", pa.array(
                cols["pdf_data"], type=pa.large_binary()))
            .append_column("mhtml", pa.array(
                cols["mhtml"], type=pa.large_string()))
            .append_column("js_result", pa.array(
                cols["js_result"], type=pa.string()))
            .append_column("response_headers", pa.array(
                cols["response_headers"], type=pa.string()))
            .append_column("console_messages", pa.array(
                cols["console_messages"], type=pa.string()))
            .append_column("network_requests", pa.array(
                cols["network_requests"], type=pa.string()))
            .append_column("redirected_url", pa.array(
                cols["redirected_url"], type=pa.string()))
        )


def crawl_rendered(sf_dir: str | None = None, n_hosts: int = 2,
                   screenshot: bool = True, pdf: bool = True):
    """The `crawl_rendered` query: render every page of a small synthetic
    site through the browser-stage contract (FixtureRenderer) and emit a
    deterministic per-page summary — url, status, hydration flag, js
    execution outcome, screenshot/pdf digests and sizes. Golden-gated
    (sha-pinned parquet); a real browser pool swaps in via
    ``RenderStage(renderer_cls=...)`` with zero engine changes.

    ``sf_dir`` is accepted for queries() signature uniformity; the input
    is the deterministic synthetic web, not the relational tables.
    """
    import ray.data as rd

    site = SyntheticWeb(SiteConfig(n_hosts=n_hosts))
    urls = sorted(site.all_urls())
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    n_slices = max(1, min(8, len(urls) // 8 or 1))
    per = -(-len(urls) // n_slices)
    ds = rd.from_arrow([t.slice(i * per, per) for i in range(n_slices)
                        if i * per < len(urls)])
    stage_kwargs = {
        "renderer_kwargs": {"site_cfg": {"n_hosts": n_hosts}},
        "render_cfg": {
            "js_code": ["document.title", "window.scrollTo(0, 99)"],
            "wait_for": "css:#__hydrated",
            "screenshot": screenshot,
            "pdf": pdf,
            "capture_console_messages": True,
        },
    }
    rendered = ds.map_batches(
        RenderStage, fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow", batch_size=16, concurrency=(1, 4),
        num_cpus=1,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        shots = batch.column("screenshot").to_pylist()
        pdfs = batch.column("pdf_data").to_pylist()
        js = batch.column("js_result").to_pylist()
        return pa.table({
            "url": batch.column("url").cast(pa.string()),
            "status": batch.column("status"),
            "hydrated": pa.array(
                ['id="__hydrated"' in h for h in htmls]),
            "html_sha": pa.array(
                [hashlib.sha256(h.encode()).hexdigest()[:16]
                 for h in htmls]),
            "n_js_results": pa.array(
                [len(json.loads(j)["results"]) if j else 0
                 for j in js], type=pa.int32()),
            "screenshot_bytes": pa.array(
                [len(s) if s is not None else 0 for s in shots],
                type=pa.int64()),
            "screenshot_crc": pa.array(
                [zlib.crc32(s) if s is not None else 0 for s in shots],
                type=pa.int64()),
            "pdf_bytes": pa.array(
                [len(p) if p is not None else 0 for p in pdfs],
                type=pa.int64()),
        })

    return rendered.map_batches(summarize, batch_format="pyarrow")
