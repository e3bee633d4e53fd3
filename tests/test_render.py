"""Browser-render stage contract (S7 interface): classify_wait_for law,
RenderResult/AsyncCrawlResponse field parity, FixtureRenderer determinism,
RenderStage schema, and the zero-engine-changes drop-in (a full crawl with
RenderStage as the fetcher)."""

import base64
import json

import pyarrow as pa
import ray.data as rd

from crawl4ai_ray.stages.render import (
    FixtureRenderer,
    RenderConfig,
    RenderResult,
    RenderStage,
    Renderer,
    classify_wait_for,
    crawl_rendered,
)


def test_classify_wait_for_law():
    # async_crawler_strategy.py:231-293 dispatch
    assert classify_wait_for(None) is None
    assert classify_wait_for("js: () => !!window.x") == \
        ("js", "() => !!window.x")
    assert classify_wait_for("css: #main") == ("css", "#main")
    assert classify_wait_for("() => document.ready") == \
        ("js", "() => document.ready")
    assert classify_wait_for("function f() {}") == ("js", "function f() {}")
    assert classify_wait_for("  #content  ") == ("auto-css", "#content")


def test_render_result_mirrors_async_crawl_response():
    # field-for-field parity with models.py:310-323 (minus the async-only
    # get_delayed_content hook)
    expected = {
        "html", "response_headers", "js_execution_result", "status_code",
        "screenshot", "pdf_data", "mhtml_data", "downloaded_files",
        "ssl_certificate", "redirected_url", "network_requests",
        "console_messages",
    }
    assert set(RenderResult.__dataclass_fields__) == expected


def test_renderer_requires_start():
    r = FixtureRenderer()
    try:
        r.render("http://h0000.test/", RenderConfig())
        raise AssertionError("render before start() must fail loudly")
    except RuntimeError:
        pass


def test_fixture_renderer_deterministic_and_lawful():
    cfg = RenderConfig(js_code=["a", "b"], wait_for="css:#__hydrated",
                       screenshot=True, pdf=True, capture_mhtml=True,
                       capture_console_messages=True,
                       capture_network_requests=True)
    r = FixtureRenderer({"n_hosts": 2})
    r.start()
    a = r.render("http://h0000.test/", cfg)
    b = r.render("http://h0000.test/", cfg)
    assert a == b  # pure function of (site, url, cfg)
    assert a.status_code == 200
    assert 'id="__hydrated"' in a.html
    # js execution result law: {"success": True, "results": [...]} with one
    # entry per script (async_crawler_strategy.py:1808)
    assert a.js_execution_result["success"] is True
    assert len(a.js_execution_result["results"]) == 2
    assert all(x["success"] for x in a.js_execution_result["results"])
    # screenshot is base64 of real PNG bytes
    png = base64.b64decode(a.screenshot)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert a.pdf_data.startswith(b"%PDF-")
    assert a.mhtml_data.startswith("MIME-Version: 1.0")
    assert a.console_messages and a.network_requests
    # 404s keep the contract (html + status, no success-only paths)
    e = r.render("http://h0000.test/nope", cfg)
    assert e.status_code == 404


def test_render_stage_schema_and_contract_columns():
    urls = ["http://h0000.test/", "http://h0000.test/cat0",
            "http://h0000.test/missing"]
    batch = pa.table({"url": pa.array(urls)})
    stage = RenderStage(
        renderer_kwargs={"site_cfg": {"n_hosts": 1}},
        render_cfg={"js_code": "document.title", "screenshot": True,
                    "pdf": True},
    )
    out = stage(batch)
    # engine fetch contract columns (drop-in for _parse_stage)
    assert out.schema.field("html").type == pa.large_string()
    assert out.schema.field("status").type == pa.int32()
    assert out.schema.field("success").type == pa.bool_()
    assert out.schema.field("fetch_ms").type == pa.float32()
    assert out.schema.field("from_cache").type == pa.bool_()
    # render extras
    assert out.schema.field("screenshot").type == pa.large_binary()
    assert out.schema.field("pdf_data").type == pa.large_binary()
    shots = out.column("screenshot").to_pylist()
    assert all(s[:8] == b"\x89PNG\r\n\x1a\n" for s in shots)
    js = json.loads(out.column("js_result").to_pylist()[0])
    assert js["success"] is True
    assert out.column("success").to_pylist() == [True, True, False]


class _ContractProbeRenderer(Renderer):
    """Minimal third-party renderer: proves the protocol surface is what
    a browser pool must implement (start/render/close only)."""

    def __init__(self):
        self.calls = 0

    def start(self):
        self.started = True

    def render(self, url, cfg):
        self.calls += 1
        return RenderResult(html=f"<html><body>{url}</body></html>",
                            status_code=200)

    def close(self):
        self.started = False


def test_third_party_renderer_plugs_in():
    stage = RenderStage(renderer_cls=_ContractProbeRenderer)
    out = stage(pa.table({"url": pa.array(["http://x.test/"])}))
    assert out.column("success").to_pylist() == [True]
    assert out.column("screenshot").to_pylist() == [None]


def test_crawl_engine_runs_on_render_stage(tmp_path):
    # zero-engine-changes drop-in: the full BFS crawl with RenderStage as
    # the fetch stage — parse/discovery/sink all run on rendered DOM.
    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(strategy="bfs", max_depth=2,
                      out_dir=str(tmp_path / "out"),
                      fetch_concurrency=2, check_robots=False)
    eng = CrawlEngine(
        cfg, fetcher_cls=RenderStage,
        fetcher_kwargs={
            "renderer_kwargs": {"site_cfg": {"n_hosts": 2}},
            "render_cfg": {"js_code": "document.title"},
        })
    res = eng.run(["http://h0000.test/", "http://h0001.test/"])
    assert res.pages_crawled > 0
    docs = rd.read_parquet(res.docs_dir).to_pandas()
    assert len(docs) > 0
    # hydration marker flowed through fetch → parse → sink markdown/html
    assert (docs["depth"] >= 0).all()


def test_crawl_rendered_query_deterministic():
    a = crawl_rendered(None).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    b = crawl_rendered(None).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert len(a) > 20
    assert a.equals(b)
    assert a["hydrated"].all()
    ok = a[a["status"] == 200]
    assert (ok["screenshot_bytes"] > 0).all()
    assert (ok["n_js_results"] == 2).all()


# ---------------------------------------------------------------------------
# round-5: real-browser adapter (PlaywrightRenderer) behind the contract
# ---------------------------------------------------------------------------

import pytest

from crawl4ai_ray.stages.render import (  # noqa: E402
    PLAYWRIGHT_AVAILABLE,
    PlaywrightRenderer,
    default_renderer_cls,
)

_needs_pw = pytest.mark.skipif(not PLAYWRIGHT_AVAILABLE,
                               reason="playwright not installed")


def test_default_renderer_selection_law():
    # model_loader activation pattern: real browser iff importable
    expected = PlaywrightRenderer if PLAYWRIGHT_AVAILABLE \
        else FixtureRenderer
    assert default_renderer_cls() is expected


def test_playwright_renderer_import_guard():
    if PLAYWRIGHT_AVAILABLE:
        pytest.skip("playwright installed — guard not reachable")
    with pytest.raises(ImportError):
        PlaywrightRenderer()


def test_playwright_renderer_satisfies_contract_statically():
    # the adapter must be a Renderer with the exact plug-point surface
    # the engine calls — verified without a browser
    assert issubclass(PlaywrightRenderer, Renderer)
    import inspect

    render_params = list(inspect.signature(
        PlaywrightRenderer.render).parameters)
    assert render_params == ["self", "url", "cfg"]
    for meth in ("start", "close", "kill_session"):
        assert callable(getattr(PlaywrightRenderer, meth))


def _contract_suite(renderer):
    """Behavioral contract both renderers must satisfy — runs against
    FixtureRenderer always and PlaywrightRenderer when installed."""
    renderer.start()
    try:
        cfg = RenderConfig(js_code=["1 + 1"],
                           wait_for="css:body",
                           screenshot=True,
                           capture_console_messages=True)
        res = renderer.render("http://h0000.test/", cfg)
        assert isinstance(res, RenderResult)
        assert res.html and isinstance(res.html, str)
        assert isinstance(res.status_code, int)
        assert res.js_execution_result["success"] is True
        assert len(res.js_execution_result["results"]) == 1
        if res.screenshot is not None:
            base64.b64decode(res.screenshot)   # valid base64
    finally:
        renderer.close()


def test_contract_fixture_renderer():
    _contract_suite(FixtureRenderer({"n_hosts": 1}))


@_needs_pw
def test_contract_playwright_renderer():
    # no synthetic-web DNS for a real browser: serve one page locally
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"<html><body><h1>pw</h1></body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    r = PlaywrightRenderer()
    r.start()
    try:
        cfg = RenderConfig(js_code=["1 + 1"], wait_for="css:h1",
                           screenshot=True,
                           capture_console_messages=True)
        res = r.render(f"http://127.0.0.1:{srv.server_address[1]}/", cfg)
        assert res.status_code == 200
        assert "pw" in res.html
        assert res.js_execution_result["results"][0] == 2
        assert base64.b64decode(res.screenshot)[:8] == \
            b"\x89PNG\r\n\x1a\n"
        # session reuse: a pinned page survives across render() calls
        cfg2 = RenderConfig(session_id="s1",
                            js_code=["window.__x = 41; 0"])
        r.render(f"http://127.0.0.1:{srv.server_address[1]}/", cfg2)
        cfg3 = RenderConfig(session_id="s1", js_only=True,
                            js_code=["window.__x + 1"])
        res3 = r.render(f"http://127.0.0.1:{srv.server_address[1]}/",
                        cfg3)
        assert res3.js_execution_result["results"][0] == 42
        r.kill_session("s1")
    finally:
        r.close()
        srv.shutdown()
