"""Engine HTTP client — behavioral port of the reference's Docker
client (``crawl4ai/docker_client.py:1-168``) against this repo's
``serve.py`` facade.

Laws kept from the reference client:

- error taxonomy: ``ConnectionError`` (transport/timeouts) vs
  ``RequestError`` (HTTP error status, detail extracted from a JSON
  body when present) under a common ``Crawl4aiClientError`` base;
- ``crawl`` checks ``/health`` first (``_check_server``), posts
  ``{"urls", "crawler_config"}`` (config via ``dump()``'s params or a
  plain dict), raises ``RequestError`` when ``success`` is false, and
  **unwraps a single result** (``results[0] if len(results)==1``) —
  the reference's convenience quirk;
- logging through the tag logger (``functions/logkit.py`` stands in
  for the reference's AsyncLogger): AUTH/READY/CRAWL/CLOSE tags,
  ``url_status``/``error_status`` formats;
- context-manager lifecycle.

Differences, stated: the transport is stdlib ``urllib`` and the API is
synchronous (the facade is a threaded stdlib server; httpx and an
asyncio loop would add nothing here). ``authenticate`` goes through
``POST /token`` when the server implements it and falls back to a
derived header only for servers without the auth layer.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any, Dict, List, Optional, Union

from .functions.logkit import AsyncLogger, LogLevel

__all__ = ["Crawl4aiClientError", "ConnectionError", "RequestError",
           "EngineClient"]


class Crawl4aiClientError(Exception):
    """Base exception for engine client errors."""


class ConnectionError(Crawl4aiClientError):  # noqa: A001 (reference name)
    """Raised when connection to the engine server fails."""


class RequestError(Crawl4aiClientError):
    """Raised when the server returns an error response."""


class EngineClient:
    """Client for the ``serve.py`` data-plane facade."""

    def __init__(self, base_url: str = "http://127.0.0.1:8000",
                 timeout: float = 30.0, verbose: bool = True,
                 log_file: Optional[str] = None):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.logger = AsyncLogger(log_file=log_file,
                                  log_level=LogLevel.DEBUG,
                                  verbose=verbose)
        self._token: Optional[str] = None

    # -- transport -----------------------------------------------------------

    def _request(self, method: str, endpoint: str,
                 payload: Optional[dict] = None) -> dict:
        url = self.base_url + endpoint
        data = json.dumps(payload).encode() if payload is not None \
            else None
        req = urllib.request.Request(
            url, data=data, method=method,
            headers={"Content-Type": "application/json",
                     **({"Authorization": f"Bearer {self._token}"}
                        if self._token else {})})
        try:
            with urllib.request.urlopen(req,
                                        timeout=self.timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            body = e.read().decode(errors="replace")
            try:
                detail = json.loads(body).get("error", body)
            except ValueError:
                detail = body
            raise RequestError(
                f"Server error {e.code}: {detail}") from None
        except urllib.error.URLError as e:
            raise ConnectionError(
                f"Failed to connect: {e.reason}") from None
        except TimeoutError as e:
            raise ConnectionError(f"Request timed out: {e}") from None

    def _check_server(self) -> None:
        try:
            self._request("GET", "/health")
            self.logger.success(f"Connected to {self.base_url}",
                                tag="READY")
        except Crawl4aiClientError as e:
            self.logger.error(f"Server unreachable: {e}", tag="ERROR")
            raise ConnectionError(f"Cannot connect to server: {e}") \
                from None

    # -- reference API surface -------------------------------------------

    def authenticate(self, email: str) -> None:
        """The reference's /token flow: POST the email, store the bearer
        token for subsequent requests. Falls back to a locally derived
        header ONLY against servers without the auth layer (404 or
        transport failure); a real 4xx from an implemented /token (e.g.
        400 invalid email) re-raises — storing a bogus bearer would 401
        every later request on a jwt-enabled server."""
        self.logger.info(f"Authenticating with email: {email}",
                         tag="AUTH")
        try:
            data = self._request("POST", "/token", {"email": email})
            self._token = data["access_token"]
        except RequestError as e:
            if "Server error 404" not in str(e):
                self.logger.error(f"Authentication failed: {e}",
                                  tag="AUTH")
                raise
            import hashlib

            self._token = hashlib.sha256(email.encode()).hexdigest()[:32]
        except ConnectionError:
            import hashlib

            self._token = hashlib.sha256(email.encode()).hexdigest()[:32]
        self.logger.success("Authentication successful", tag="AUTH")

    def crawl(self, urls: List[str],
              crawler_config: Optional[Union[dict, Any]] = None
              ) -> Union[dict, List[dict]]:
        """POST /crawl. Accepts a plain dict or any object with the
        configkit ``dump()`` contract (its params travel)."""
        self._check_server()
        cfg: Dict[str, Any] = {}
        if crawler_config is not None:
            if hasattr(crawler_config, "dump"):
                cfg = crawler_config.dump().get("params", {})
            else:
                cfg = dict(crawler_config)
        self.logger.info(f"Crawling {len(urls)} URLs", tag="CRAWL")
        data = self._request("POST", "/crawl",
                             {"urls": urls, "crawler_config": cfg})
        if not data.get("success", False):
            raise RequestError(
                f"Crawl failed: {data.get('error', 'Unknown error')}")
        results = data.get("results", [])
        for r in results:
            self.logger.url_status(r.get("url", "unknown"),
                                   bool(r.get("success")), 0.0)
        self.logger.success(
            f"Crawl completed with {len(results)} results", tag="CRAWL")
        # reference quirk: a single result is unwrapped
        return results[0] if len(results) == 1 else results

    def crawl_stream(self, urls: List[str],
                     crawler_config: Optional[dict] = None):
        """POST /crawl/stream — generator of per-page dicts as supersteps
        commit (NDJSON lines; the reference client's ``stream=True``
        surface). Terminates on the ``{"status": "completed"}`` marker;
        an ``{"error": ...}`` line raises RequestError."""
        self._check_server()
        payload = {"urls": urls, "crawler_config": crawler_config or {}}
        req = urllib.request.Request(
            self.base_url + "/crawl/stream",
            data=json.dumps(payload).encode(), method="POST",
            headers={"Content-Type": "application/json",
                     **({"Authorization": f"Bearer {self._token}"}
                        if self._token else {})})
        try:
            resp = urllib.request.urlopen(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            raise RequestError(
                f"Server error {e.code}: {e.read().decode(errors='replace')}"
            ) from None
        except urllib.error.URLError as e:
            raise ConnectionError(f"Failed to connect: {e.reason}") \
                from None
        with resp:
            for raw in resp:
                line = raw.decode("utf-8").strip()
                if not line:
                    continue
                obj = json.loads(line)
                if obj.get("status") == "completed":
                    self.logger.success("Stream completed", tag="CRAWL")
                    return
                if "error" in obj and "url" not in obj:
                    raise RequestError(f"Stream failed: {obj['error']}")
                yield obj

    def submit_crawl_job(self, urls: List[str],
                         crawler_config: Optional[dict] = None) -> str:
        """POST /crawl/job → task_id (fire-and-forget enqueue)."""
        data = self._request("POST", "/crawl/job", {
            "urls": urls, "crawler_config": crawler_config or {}})
        return data["task_id"]

    def get_job(self, task_id: str) -> dict:
        """GET /crawl/job/{task_id} — one status poll."""
        return self._request("GET", f"/crawl/job/{task_id}")

    def wait_for_job(self, task_id: str, poll_s: float = 0.3,
                     timeout: float = 120.0) -> dict:
        """Poll until the task is terminal; returns the final status
        response (``result`` on completed, raises on failed/timeout)."""
        import time as _time

        deadline = _time.time() + timeout
        while _time.time() < deadline:
            st = self.get_job(task_id)
            if st["status"] == "completed":
                return st
            if st["status"] == "failed":
                raise RequestError(f"Job failed: {st.get('error')}")
            _time.sleep(poll_s)
        raise ConnectionError(f"Job {task_id} timed out after {timeout}s")

    def screenshot(self, url: str) -> dict:
        return self._request("POST", "/screenshot", {"url": url})

    def pdf(self, url: str) -> dict:
        return self._request("POST", "/pdf", {"url": url})

    def execute_js(self, url: str, scripts: List[str]) -> dict:
        return self._request("POST", "/execute_js",
                             {"url": url, "scripts": scripts})

    def md(self, url: str, f: str = "raw",
           q: Optional[str] = None) -> dict:
        body = {"url": url, "f": f}
        if q is not None:
            body["q"] = q
        return self._request("POST", "/md", body)

    def html(self, url: str) -> dict:
        return self._request("POST", "/html", {"url": url})

    def get_schema(self) -> Dict[str, Any]:
        return self._request("GET", "/schema")

    def config_dump(self, code: str) -> dict:
        return self._request("POST", "/config/dump", {"code": code})

    def close(self) -> None:
        self.logger.info("Closing client", tag="CLOSE")

    def __enter__(self) -> "EngineClient":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        self.close()
