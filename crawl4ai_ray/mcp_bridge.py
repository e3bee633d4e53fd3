"""MCP bridge (JSON-RPC 2.0) over the engine's serve facade.

The reference exposes its Docker API as MCP tools via
/root/reference/deploy/docker/mcp_bridge.py (attach_mcp collects every
@mcp_tool-decorated endpoint — server.py: md, html, screenshot, pdf,
execute_js, crawl, ask — and serves list_tools/call_tool over SSE/WS).
The MCP python SDK isn't in this container, so this is a dependency-free
JSON-RPC 2.0 handler implementing the tool surface of the protocol:

- ``initialize``            → protocol/server info + tools capability
- ``tools/list``            → the seven tool descriptors with JSON schemas
- ``tools/call``            → dispatch into the EngineHTTPServer endpoint
                              bodies; results wrapped as MCP text content,
                              failures as ``isError`` content (the MCP
                              tool-error law: tool failures are results,
                              not protocol errors)
- ``notifications/initialized`` → no response (JSON-RPC notification)
- unknown method            → -32601; malformed request → -32600

Transport-agnostic: ``MCPBridge.handle(dict) -> dict | None`` works over
any byte pipe; ``EngineHTTPServer`` mounts it at ``POST /mcp``.
"""

from __future__ import annotations

import json
from typing import Any

PROTOCOL_VERSION = "2024-11-05"


def _schema(props: dict, required: list[str]) -> dict:
    return {"type": "object", "properties": props, "required": required}


class MCPBridge:
    """JSON-RPC 2.0 MCP server over an EngineHTTPServer instance."""

    def __init__(self, server):
        self.server = server
        # tool name → (description, input schema, callable(args)->obj);
        # the same seven tools the reference decorates with @mcp_tool
        self.tools: dict[str, tuple[str, dict, Any]] = {
            "md": (
                "Fetch a URL and return its markdown "
                "(filter f = raw | fit | bm25, query q for bm25).",
                _schema({"url": {"type": "string"},
                         "f": {"type": "string"},
                         "q": {"type": "string"},
                         "c": {"type": "string"}}, ["url"]),
                lambda a: server.md(a),
            ),
            "html": (
                "Fetch a URL and return preprocessed HTML for schema "
                "extraction.",
                _schema({"url": {"type": "string"}}, ["url"]),
                lambda a: server.html(a),
            ),
            "screenshot": (
                "Capture a PNG screenshot of the URL (base64).",
                _schema({"url": {"type": "string"},
                         "screenshot_wait_for": {"type": "number"}},
                        ["url"]),
                lambda a: server.screenshot(a),
            ),
            "pdf": (
                "Generate a PDF snapshot of the URL (base64).",
                _schema({"url": {"type": "string"}}, ["url"]),
                lambda a: server.pdf(a),
            ),
            "execute_js": (
                "Execute a list of JavaScript snippets on the URL and "
                "return the crawl-result view.",
                _schema({"url": {"type": "string"},
                         "scripts": {"type": "array",
                                     "items": {"type": "string"}}},
                        ["url", "scripts"]),
                lambda a: server.execute_js(a),
            ),
            "crawl": (
                "Crawl a list of URLs and return per-page results.",
                _schema({"urls": {"type": "array",
                                  "items": {"type": "string"}},
                         "crawler_config": {"type": "object"}},
                        ["urls"]),
                lambda a: server.crawl(a),
            ),
            "ask": (
                "Return engine context (endpoints, config schema) for "
                "agentic callers.",
                _schema({"query": {"type": "string"}}, []),
                lambda a: self._ask(a),
            ),
        }

    def _ask(self, args: dict) -> dict:
        ctx = {
            "engine": "crawl4ai_ray",
            "endpoints": ["/health", "/schema", "/md", "/html", "/crawl",
                          "/crawl/stream", "/crawl/job", "/screenshot",
                          "/pdf", "/execute_js", "/config/dump", "/mcp"],
            "config_schema": self.server.schema(),
        }
        q = (args.get("query") or "").strip().lower()
        if q:
            # cheap relevance cut: keep config keys containing the query
            cfgs = ctx["config_schema"]["CrawlConfig"]
            hits = {k: v for k, v in cfgs.items() if q in k.lower()}
            if hits:
                ctx["config_schema"] = {"CrawlConfig": hits}
        return ctx

    # -- JSON-RPC plumbing ----------------------------------------------------

    def _result(self, rid, result) -> dict:
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def _error(self, rid, code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "id": rid,
                "error": {"code": code, "message": message}}

    def handle(self, req: dict) -> dict | None:
        """One JSON-RPC request → response dict (None for notifications)."""
        if not isinstance(req, dict) or req.get("jsonrpc") != "2.0" \
                or "method" not in req:
            return self._error(req.get("id") if isinstance(req, dict)
                               else None, -32600, "invalid request")
        method = req["method"]
        rid = req.get("id")
        params = req.get("params") or {}

        if method == "initialize":
            return self._result(rid, {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "crawl4ai_ray-mcp",
                               "version": "1.0"},
            })
        if method == "notifications/initialized":
            return None
        if method == "tools/list":
            return self._result(rid, {
                "tools": [
                    {"name": k, "description": d, "inputSchema": s}
                    for k, (d, s, _) in self.tools.items()
                ],
            })
        if method == "tools/call":
            name = params.get("name")
            args = params.get("arguments") or {}
            if name not in self.tools:
                return self._error(rid, -32602, f"unknown tool: {name}")
            _, _, fn = self.tools[name]
            try:
                out = fn(args)
                content = [{"type": "text",
                            "text": json.dumps(out, default=str)}]
                return self._result(rid, {"content": content,
                                          "isError": False})
            except Exception as exc:  # noqa: BLE001 — MCP law: tool
                # failures are isError results, not protocol errors
                return self._result(rid, {
                    "content": [{"type": "text", "text": str(exc)}],
                    "isError": True,
                })
        return self._error(rid, -32601, f"method not found: {method}")
