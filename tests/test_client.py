"""Engine HTTP client (client.py) against the serve.py facade —
reference docker_client.py law parity."""

import pytest

from crawl4ai_ray.client import (
    ConnectionError,
    EngineClient,
    RequestError,
)
from crawl4ai_ray.serve import EngineHTTPServer
from crawl4ai_ray.sources.synthetic_web import SiteConfig


@pytest.fixture(scope="module")
def server(ray_session):
    srv = EngineHTTPServer(site_cfg=SiteConfig(n_hosts=3).__dict__).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    with EngineClient(f"http://127.0.0.1:{server.port}",
                      verbose=False) as c:
        yield c


def test_health_schema_md_html(client):
    assert "max_depth" in client.get_schema()["CrawlConfig"]
    url = "http://h0000.test/cat0/sub0/p0.html"
    raw = client.md(url, f="raw")
    assert raw["markdown"]
    fit = client.md(url, f="fit")
    assert len(raw["markdown"]) >= len(fit["markdown"])
    h = client.html(url)
    assert h["success"] and "<html" in h["html"].lower()


def test_crawl_single_result_unwrap_law(client):
    # reference quirk (docker_client.py:139): one result is unwrapped
    one = client.crawl(["http://h0000.test/"],
                       {"max_depth": 0})
    # url is the CANONICAL form (trailing slash dropped by urlkit)
    assert isinstance(one, dict) and one["url"] == "http://h0000.test"
    many = client.crawl(["http://h0000.test/", "http://h0001.test/"],
                        {"max_depth": 0})
    assert isinstance(many, list) and len(many) == 2


def test_crawl_config_dump_contract(client):
    from crawl4ai_ray.pipelines.crawl import CrawlConfig

    # objects with the configkit dump() contract travel as params —
    # but server-rejected fields (out_dir) must not leak in
    cfg = CrawlConfig(max_depth=0, n_seen_shards=2, fetch_concurrency=2)
    d = cfg.dump()["params"]
    behavioural = {k: v for k, v in d.items()
                   if k in ("max_depth", "n_seen_shards",
                            "fetch_concurrency")}
    res = client.crawl(["http://h0000.test/"], behavioural)
    assert res["success"]


def test_error_taxonomy(client):
    # server-side validation error → RequestError with the detail
    with pytest.raises(RequestError) as ei:
        client.crawl(["http://h0000.test/"], {"out_dir": "/etc"})
    assert "not accepted over HTTP" in str(ei.value)
    # unreachable server → ConnectionError
    dead = EngineClient("http://127.0.0.1:1", verbose=False,
                        timeout=2.0)
    with pytest.raises(ConnectionError):
        dead.crawl(["http://x/"])


def test_config_dump_endpoint(client):
    d = client.config_dump("CrawlConfig(max_pages=3)")
    assert d["type"] == "CrawlConfig" and d["params"]["max_pages"] == 3


def test_authenticate_sets_bearer(client):
    client.authenticate("user@example.com")
    # server has /token → a real three-segment JWT is stored
    assert client._token and client._token.count(".") == 2
    # requests still succeed with the Authorization header attached
    assert client.get_schema()


# ---------------------------------------------------------------------------
# round-4: streaming + job surfaces
# ---------------------------------------------------------------------------


def test_client_crawl_stream(server):
    with EngineClient(base_url=f"http://127.0.0.1:{server.port}",
                      verbose=False, timeout=120) as c:
        pages = list(c.crawl_stream(["http://h0000.test/"],
                                    {"max_depth": 1}))
    assert len(pages) >= 1
    assert all("url" in p and "superstep" in p for p in pages)


def test_client_job_roundtrip(server):
    with EngineClient(base_url=f"http://127.0.0.1:{server.port}",
                      verbose=False, timeout=120) as c:
        tid = c.submit_crawl_job(["http://h0000.test/"], {"max_depth": 0})
        st = c.wait_for_job(tid)
    assert st["status"] == "completed"
    assert st["result"]["pages_crawled"] >= 1


def test_client_render_endpoints(server):
    import base64
    with EngineClient(base_url=f"http://127.0.0.1:{server.port}",
                      verbose=False, timeout=60) as c:
        shot = c.screenshot("http://h0000.test/")
        assert base64.b64decode(
            shot["screenshot"])[:8] == b"\x89PNG\r\n\x1a\n"
        pdf = c.pdf("http://h0000.test/")
        assert base64.b64decode(pdf["pdf"]).startswith(b"%PDF-")
        js = c.execute_js("http://h0000.test/", ["1 + 1"])
        assert js["js_execution_result"]["success"] is True


def test_client_authenticate_via_token_endpoint(server):
    with EngineClient(base_url=f"http://127.0.0.1:{server.port}",
                      verbose=False, timeout=30) as c:
        c.authenticate("user@example.com")
        assert c._token.count(".") == 2  # real JWT from /token
        # authenticated request round-trips
        assert c.md("http://h0000.test/", f="raw")["success"] is True


def test_authenticate_invalid_email_reraises(server):
    """ADVICE r4: a 400 from an implemented /token must re-raise, not
    store a bogus locally-derived bearer that 401s everything later."""
    with EngineClient(f"http://127.0.0.1:{server.port}",
                      verbose=False) as c:
        with pytest.raises(RequestError):
            c.authenticate("not-an-email")
        assert c._token is None


def test_crawl_stream_sends_bearer(server):
    """crawl_stream must attach the same Authorization header as
    every other endpoint once authenticated."""
    with EngineClient(f"http://127.0.0.1:{server.port}",
                      verbose=False) as c:
        c.authenticate("user@example.com")
        assert c._token and c._token.count(".") == 2
        pages = list(c.crawl_stream(["http://h0000.test/"],
                                    {"max_depth": 0}))
        assert pages and pages[0]["url"] == "http://h0000.test"
