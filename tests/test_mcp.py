"""MCP bridge: JSON-RPC 2.0 handler over the serve facade — tool list
parity with the reference's @mcp_tool surface, end-to-end tool calls over
POST /mcp, and the render-backed screenshot/pdf/execute_js endpoints."""

import base64
import json
import urllib.error
import urllib.request

import pytest

from crawl4ai_ray.mcp_bridge import MCPBridge
from crawl4ai_ray.serve import EngineHTTPServer
from crawl4ai_ray.sources.synthetic_web import SiteConfig


@pytest.fixture(scope="module")
def server(ray_session):
    srv = EngineHTTPServer(site_cfg=SiteConfig(n_hosts=2).__dict__).start()
    yield srv
    srv.stop()


def _rpc(srv, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/mcp",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_initialize_and_tool_list(server):
    code, resp = _rpc(server, {"jsonrpc": "2.0", "id": 1,
                               "method": "initialize", "params": {}})
    assert code == 200
    assert resp["result"]["serverInfo"]["name"] == "crawl4ai_ray-mcp"
    assert "tools" in resp["result"]["capabilities"]

    code, resp = _rpc(server, {"jsonrpc": "2.0", "id": 2,
                               "method": "tools/list"})
    names = {t["name"] for t in resp["result"]["tools"]}
    # the reference's @mcp_tool surface (deploy/docker/server.py)
    assert names == {"md", "html", "screenshot", "pdf", "execute_js",
                     "crawl", "ask"}
    for t in resp["result"]["tools"]:
        assert t["inputSchema"]["type"] == "object"


def test_tool_call_md_end_to_end(server):
    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 3, "method": "tools/call",
        "params": {"name": "md",
                   "arguments": {"url": "http://h0000.test/", "f": "raw"}},
    })
    assert code == 200
    assert resp["result"]["isError"] is False
    payload = json.loads(resp["result"]["content"][0]["text"])
    assert payload["success"] is True
    assert payload["markdown"]


def test_tool_call_screenshot_pdf_execute_js(server):
    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 4, "method": "tools/call",
        "params": {"name": "screenshot",
                   "arguments": {"url": "http://h0000.test/"}},
    })
    shot = json.loads(resp["result"]["content"][0]["text"])
    assert base64.b64decode(shot["screenshot"])[:8] == b"\x89PNG\r\n\x1a\n"

    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 5, "method": "tools/call",
        "params": {"name": "pdf",
                   "arguments": {"url": "http://h0000.test/"}},
    })
    pdf = json.loads(resp["result"]["content"][0]["text"])
    assert base64.b64decode(pdf["pdf"]).startswith(b"%PDF-")

    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 6, "method": "tools/call",
        "params": {"name": "execute_js",
                   "arguments": {"url": "http://h0000.test/",
                                 "scripts": ["document.title"]}},
    })
    js = json.loads(resp["result"]["content"][0]["text"])
    assert js["success"] is True
    assert js["js_execution_result"]["success"] is True
    assert len(js["js_execution_result"]["results"]) == 1


def test_tool_call_crawl_and_ask(server):
    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 7, "method": "tools/call",
        "params": {"name": "crawl",
                   "arguments": {"urls": ["http://h0001.test/"],
                                 "crawler_config": {"max_depth": 0}}},
    })
    out = json.loads(resp["result"]["content"][0]["text"])
    assert out["success"] is True and out["pages_crawled"] >= 1

    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 8, "method": "tools/call",
        "params": {"name": "ask", "arguments": {"query": "depth"}},
    })
    ctx = json.loads(resp["result"]["content"][0]["text"])
    assert "/mcp" in ctx["endpoints"]
    assert all("depth" in k for k in ctx["config_schema"]["CrawlConfig"])


def test_tool_error_is_result_not_protocol_error(server):
    # MCP law: a failing tool returns isError content, not a JSON-RPC error
    code, resp = _rpc(server, {
        "jsonrpc": "2.0", "id": 9, "method": "tools/call",
        "params": {"name": "md",
                   "arguments": {"url": "http://h0000.test/missing"}},
    })
    assert code == 200
    assert "error" not in resp
    assert resp["result"]["isError"] is True


def test_protocol_errors():
    bridge = MCPBridge(EngineHTTPServer(site_cfg=SiteConfig().__dict__))
    assert bridge.handle({"jsonrpc": "2.0", "id": 1,
                          "method": "nope"})["error"]["code"] == -32601
    assert bridge.handle({"id": 1})["error"]["code"] == -32600
    assert bridge.handle(
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": "ghost"}})["error"]["code"] == -32602
    # notifications get no response
    assert bridge.handle({"jsonrpc": "2.0",
                          "method": "notifications/initialized"}) is None
