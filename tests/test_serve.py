"""S11 serving layer: loopback HTTP facade over the engine — endpoint
parity with the reference Docker API's data-plane subset."""

import json
import urllib.request

import pytest

from crawl4ai_ray.serve import EngineHTTPServer, safe_config_dump
from crawl4ai_ray.sources.synthetic_web import SiteConfig


@pytest.fixture(scope="module")
def server(ray_session):
    srv = EngineHTTPServer(site_cfg=SiteConfig(n_hosts=3).__dict__).start()
    yield srv
    srv.stop()


def _get(srv, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(srv, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_schema(server):
    code, body = _get(server, "/health")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(server, "/schema")
    assert code == 200 and "max_depth" in body["CrawlConfig"]


def test_md_filters(server):
    url = "http://h0000.test/cat0/sub0/p0.html"
    code, raw = _post(server, "/md", {"url": url, "f": "raw"})
    assert code == 200 and raw["markdown"]
    code, fit = _post(server, "/md", {"url": url, "f": "fit"})
    assert code == 200
    code, bm = _post(server, "/md", {"url": url, "f": "bm25",
                                     "q": "product data"})
    assert code == 200
    assert len(raw["markdown"]) >= len(fit["markdown"])
    code, err = _post(server, "/md", {"url": "http://h0000.test/missing"})
    assert code == 422


def test_html_preprocess(server):
    code, body = _post(server, "/html",
                       {"url": "http://h0000.test/"})
    assert code == 200 and body["success"] and body["html"].startswith("<")


def test_crawl_endpoint(server):
    code, body = _post(server, "/crawl",
                       {"urls": ["http://h0000.test/"],
                        "crawler_config": {"max_depth": 1}})
    assert code == 200 and body["success"]
    assert body["pages_crawled"] > 0
    assert all({"url", "status", "success", "depth"} <= set(r)
               for r in body["results"])
    code, err = _post(server, "/crawl", {"urls": []})
    assert code == 422


def test_config_dump_law(server):
    code, body = _post(server, "/config/dump",
                       {"code": "CrawlConfig(max_depth=5, "
                                "politeness=True)"})
    # reference /config/dump returns obj.dump() — the {type, params}
    # serialization with defaults omitted (server.py:209)
    assert code == 200 and body["type"] == "CrawlConfig"
    assert body["params"]["max_depth"] == 5 and body["params"]["politeness"]
    # anything but a single literal-kwargs CrawlConfig call is rejected
    for bad in ("__import__('os')", "CrawlConfig(max_depth=open('/x'))",
                "CrawlConfig(1)", "CrawlConfig(**{'a': 1})", "2+2"):
        code, _ = _post(server, "/config/dump", {"code": bad})
        assert code == 422, bad


def test_safe_config_dump_direct():
    d = safe_config_dump("CrawlConfig(max_pages=7)")
    assert d["params"]["max_pages"] == 7
    with pytest.raises((ValueError, SyntaxError)):
        safe_config_dump("print('x')")


# ---------------------------------------------------------------------------
# round-4: /crawl/stream NDJSON + job queue (reference server.py:449-471,
# api.py:385-417,563-608, job.py)
# ---------------------------------------------------------------------------


def _post_stream_lines(srv, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        ctype = r.headers.get("Content-Type")
        xs = r.headers.get("X-Stream-Status")
        lines = [json.loads(ln) for ln in r.read().decode().splitlines()
                 if ln.strip()]
    return ctype, xs, lines


def test_crawl_stream_ndjson(server):
    ctype, xs, lines = _post_stream_lines(
        server, "/crawl/stream",
        {"urls": ["http://h0000.test/"],
         "crawler_config": {"max_depth": 1}})
    assert ctype == "application/x-ndjson"
    assert xs == "active"
    # completion marker law: last line is {"status": "completed"}
    assert lines[-1] == {"status": "completed"}
    pages = lines[:-1]
    assert len(pages) >= 1
    for p in pages:
        assert {"url", "status", "success", "depth", "superstep",
                "server_memory_mb"} <= set(p)
    # supersteps stream in order (BSP grain)
    steps = [p["superstep"] for p in pages]
    assert steps == sorted(steps)


def test_crawl_stream_validation_is_http_error(server):
    code, body = _post(server, "/crawl/stream", {"urls": []})
    assert code == 422


def test_crawl_job_lifecycle(server):
    import time as _t

    code, body = _post(server, "/crawl/job",
                       {"urls": ["http://h0001.test/"],
                        "crawler_config": {"max_depth": 1}})
    assert code == 200
    task_id = body["task_id"]
    assert task_id.startswith("crawl_")
    deadline = _t.time() + 120
    status = None
    while _t.time() < deadline:
        code, st = _get(server, f"/crawl/job/{task_id}")
        assert code == 200
        assert st["task_id"] == task_id
        assert st["url"] == json.dumps(["http://h0001.test/"])
        assert "_links" in st
        status = st["status"]
        if status in ("completed", "failed"):
            break
        _t.sleep(0.3)
    assert status == "completed"
    assert st["result"]["success"] is True
    assert st["result"]["pages_crawled"] >= 1


def test_crawl_job_unknown_404(server):
    code, body = _get(server, "/crawl/job/crawl_deadbeef")
    assert code == 404


def test_crawl_job_bad_request_422_at_enqueue(server):
    code, body = _post(server, "/crawl/job", {"urls": "nope"})
    assert code == 422


def test_crawl_job_ttl_cleanup(server):
    # terminal tasks past the TTL are deleted on read (utils.py:63-66)
    old_ttl = server.job_ttl_seconds
    server.job_ttl_seconds = 0.0
    try:
        code, body = _post(server, "/crawl/job",
                           {"urls": ["http://h0000.test/"],
                            "crawler_config": {"max_depth": 0}})
        task_id = body["task_id"]
        import time as _t
        deadline = _t.time() + 120
        while _t.time() < deadline:
            code, st = _get(server, f"/crawl/job/{task_id}")
            if code == 404 or st["status"] in ("completed", "failed"):
                break
            _t.sleep(0.3)
        # the terminal read deleted it; the next read must 404
        code, _ = _get(server, f"/crawl/job/{task_id}")
        assert code == 404
    finally:
        server.job_ttl_seconds = old_ttl


# ---------------------------------------------------------------------------
# round-4: /token auth + /llm QA (reference auth.py, server.py:216-221,
# 395-407, api.py:61-108)
# ---------------------------------------------------------------------------


def test_token_endpoint(server):
    code, body = _post(server, "/token", {"email": "a@example.com"})
    assert code == 200
    assert body["token_type"] == "bearer"
    assert body["access_token"].count(".") == 2
    code, body = _post(server, "/token", {"email": "not-an-email"})
    assert code == 400


def test_jwt_gate_quirk(ray_session):
    from crawl4ai_ray.functions.authkit import create_access_token
    from crawl4ai_ray.serve import EngineHTTPServer
    from crawl4ai_ray.sources.synthetic_web import SiteConfig

    srv = EngineHTTPServer(site_cfg=SiteConfig(n_hosts=1).__dict__,
                           jwt_enabled=True, secret_key="s3").start()
    try:
        url = "http://h0000.test/"
        # reference HTTPBearer(auto_error=False) quirk: MISSING header
        # passes; present-but-invalid 401s; valid passes
        code, _ = _post(srv, "/md", {"url": url, "f": "raw"})
        assert code == 200
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/md",
            data=json.dumps({"url": url, "f": "raw"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer bogus.token.sig"},
            method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("invalid token must 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        tok = create_access_token({"sub": "a@example.com"}, "s3")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/md",
            data=json.dumps({"url": url, "f": "raw"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {tok}"}, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        # expired token 401s (do_time_check law)
        old = create_access_token({"sub": "x@y.com"}, "s3",
                                  expires_minutes=-1)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/md",
            data=json.dumps({"url": url, "f": "raw"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {old}"}, method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expired token must 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
    finally:
        srv.stop()


def test_llm_qa_endpoint(server):
    import urllib.parse
    url = urllib.parse.quote("http://h0000.test/cat0/sub0/p0.html",
                             safe="")
    q = urllib.parse.quote("product data stream")
    code, body = _get(server, f"/llm/{url}?q={q}")
    assert code == 200
    assert isinstance(body["answer"], str) and body["answer"]
    code, body = _get(server, f"/llm/{url}")
    assert code == 400


# ---------------------------------------------------------------------------
# round-5 ADVICE hardening: strict JWT, AuthError totality, tempdir bounds
# ---------------------------------------------------------------------------


def test_jwt_required_strict_mode(ray_session):
    from crawl4ai_ray.functions.authkit import create_access_token
    from crawl4ai_ray.serve import EngineHTTPServer
    from crawl4ai_ray.sources.synthetic_web import SiteConfig

    srv = EngineHTTPServer(site_cfg=SiteConfig(n_hosts=1).__dict__,
                           jwt_required=True, secret_key="s3").start()
    try:
        url = "http://h0000.test/"
        # strict mode: MISSING header 401s (unlike the reference quirk)
        code, body = _post(srv, "/md", {"url": url, "f": "raw"})
        assert code == 401
        # non-Bearer scheme 401s too
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/md",
            data=json.dumps({"url": url, "f": "raw"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": "Basic dXNlcjpwdw=="},
            method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("non-Bearer must 401 in strict mode")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # a valid token still passes
        tok = create_access_token({"sub": "a@example.com"}, "s3")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/md",
            data=json.dumps({"url": url, "f": "raw"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {tok}"}, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        # /health stays open (liveness probes need no token)
        code, _ = _get(srv, "/health")
        assert code == 200
    finally:
        srv.stop()


def test_verify_token_hostile_inputs_are_autherror(ray_session):
    """AuthError totality: non-ASCII signature segments and signed
    tokens with a garbage exp claim must 401, not crash the handler."""
    import base64

    from crawl4ai_ray.functions.authkit import (AuthError,
                                                create_access_token,
                                                verify_token)

    for tok in ["a.b.ésig",                       # non-ASCII sig
                "abé.b.c",                        # non-ASCII header
                "a.b"]:                                # too few segments
        with pytest.raises(AuthError):
            verify_token(tok, "s3")
    # validly signed token with non-numeric exp → AuthError, not ValueError
    good = create_access_token({"sub": "x"}, "s3")
    h, b, _ = good.split(".")
    body = json.loads(base64.urlsafe_b64decode(b + "=" * (-len(b) % 4)))
    body["exp"] = "soon"
    b2 = base64.urlsafe_b64encode(
        json.dumps(body, separators=(",", ":"),
                   sort_keys=True).encode()).rstrip(b"=").decode()
    import hashlib
    import hmac as _hmac
    sig = base64.urlsafe_b64encode(_hmac.new(
        b"s3", f"{h}.{b2}".encode(),
        hashlib.sha256).digest()).rstrip(b"=").decode()
    with pytest.raises(AuthError):
        verify_token(f"{h}.{b2}.{sig}", "s3")


def test_server_tempdirs_bounded_and_cleaned(ray_session):
    import os

    from crawl4ai_ray.serve import EngineHTTPServer
    from crawl4ai_ray.sources.synthetic_web import SiteConfig

    srv = EngineHTTPServer(site_cfg=SiteConfig(n_hosts=1).__dict__).start()
    try:
        root = srv._tmp_root
        srv._keep_dirs = 2
        for _ in range(4):
            code, body = _post(srv, "/crawl",
                               {"urls": ["http://h0000.test/"],
                                "crawler_config": {"max_depth": 0}})
            assert code == 200 and body["success"]
        subdirs = [d for d in os.listdir(root) if d.startswith("req_")]
        assert len(subdirs) <= 2          # oldest pruned
        # /crawl/job enqueue validation allocates NO directory
        before = set(os.listdir(root))
        code, body = _post(srv, "/crawl/job",
                           {"urls": ["bad"] * 200})   # fails validation
        assert code == 422
        assert set(os.listdir(root)) == before
    finally:
        srv.stop()
    assert not os.path.exists(root)       # stop() removes the root
