"""A5 LLM extraction plumbing: chunk-merge law, prompt selection,
response parsing (XML envelope / forced JSON / malformed fallback),
usage accounting, and the distributed stage. The client is the labeled
deterministic stub; the laws are the reference's."""

import json

import pytest

from crawl4ai_ray.functions.llm_extract import (
    CHUNK_TOKEN_THRESHOLD,
    FakeLLMClient,
    LLMExtractionStrategy,
    LLMResponse,
    TokenUsage,
    llm_extract_blocks,
    merge_chunks,
)


class TestMergeChunks:
    def test_budget_and_distribution(self):
        docs = ["a b c d", "e f g h", "i j"]
        out = merge_chunks(docs, target_size=4)
        assert out == ["a b c d", "e f g h", "i j"]
        one = merge_chunks(docs, target_size=100)
        assert one == ["a b c d e f g h i j"]

    def test_overlap_carry(self):
        out = merge_chunks(["a b c d e f g h"], target_size=4, overlap=2)
        # chunk 1 starts with the last 2 tokens of chunk 0
        assert out[1].split()[:2] == out[0].split()[-2:]

    def test_word_token_ratio_and_empty(self):
        # ratio scales the chunk-count pre-allocation (reference law: the
        # per-token fill still counts words) — 6 words at ratio 2.0 =
        # 12 tokens → 3 slots, words fill 2 of them
        out = merge_chunks(["a b c d e f"], target_size=4,
                           word_token_ratio=2.0)
        assert len(out) == 2
        assert out[0] == "a b c d"
        assert merge_chunks(["", "   "], target_size=4) == []


class _RecordingClient:
    def __init__(self, reply: str):
        self.reply = reply
        self.prompts: list[str] = []

    def complete(self, prompt: str) -> LLMResponse:
        self.prompts.append(prompt)
        return LLMResponse(self.reply,
                           TokenUsage(2, 3, 5))


def test_prompt_selection_laws():
    c = _RecordingClient('<blocks>[]</blocks>')
    LLMExtractionStrategy(client=c).run("u", ["text here"])
    assert "REQUEST" not in c.prompts[0]
    c2 = _RecordingClient('<blocks>[]</blocks>')
    LLMExtractionStrategy(client=c2, instruction="find prices") \
        .run("u", ["text here"])
    assert "find prices" in c2.prompts[0]
    c3 = _RecordingClient('<blocks>[]</blocks>')
    LLMExtractionStrategy(client=c3, schema={"t": "object"}) \
        .run("u", ["text here"])
    assert '"t": "object"' in c3.prompts[0]
    # schema overrides extraction_type
    s = LLMExtractionStrategy(schema={"x": 1}, extraction_type="block")
    assert s.extract_type == "schema"


def test_parse_xml_envelope_and_error_flag():
    c = _RecordingClient(
        '<blocks>[{"index": 0, "tags": ["x"], "content": "hello"}]'
        '</blocks>')
    out = LLMExtractionStrategy(client=c).run("u", ["text"])
    assert out == [{"index": 0, "tags": ["x"], "content": "hello",
                    "error": False}]


def test_parse_forced_json_unwrap():
    c = _RecordingClient('{"news": [{"index": 1, "content": "n"}]}')
    out = LLMExtractionStrategy(client=c, force_json_response=True) \
        .run("u", ["text"])
    assert out == [{"index": 1, "content": "n", "error": False}]
    c2 = _RecordingClient('{"article_id": "1234"}')
    out2 = LLMExtractionStrategy(client=c2, force_json_response=True) \
        .run("u", ["text"])
    assert out2 == [{"article_id": "1234", "error": False}]


def test_parse_malformed_fallback():
    # salvage what parses, keep the rest as an error block
    c = _RecordingClient('[{"index": 0, "content": "ok"}, {broken')
    out = LLMExtractionStrategy(client=c).run("u", ["text"])
    good = [b for b in out if not b.get("error")]
    assert good and good[0]["content"] == "ok"
    # nothing parses at all → single error block with the raw content
    c2 = _RecordingClient("utterly not json")
    out2 = LLMExtractionStrategy(client=c2).run("u", ["text"])
    assert out2 == [{"index": 0, "error": True, "tags": ["error"],
                     "content": "utterly not json"}]


def test_usage_accounting_and_chunk_fanout():
    c = _RecordingClient('<blocks>[]</blocks>')
    s = LLMExtractionStrategy(client=c, chunk_token_threshold=8,
                              overlap_rate=0.0, word_token_rate=1.0)
    s.run("u", ["w" + " w" * 30])          # 31 tokens → 4 chunks of 8
    assert len(c.prompts) == 4
    assert len(s.usages) == 4
    assert s.total_usage.total_tokens == 4 * 5


def test_fake_client_deterministic():
    c = FakeLLMClient()
    p = "HTML:\nFirst sentence. Second sentence!\nReturn"
    assert c.complete(p).content == c.complete(p).content
    blocks = json.loads(
        c.complete(p).content.removeprefix("<blocks>")
        .removesuffix("</blocks>"))
    assert [b["content"] for b in blocks] == ["First sentence.",
                                              "Second sentence!"]


def test_distributed_stage(ray_session):
    ds = llm_extract_blocks("/root/testdata/sf0.001")
    df = ds.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"doc_key", "block_index", "tags",
                               "content", "error"}
    assert not df["error"].any()
    df2 = llm_extract_blocks("/root/testdata/sf0.001").to_pandas()
    a = df.sort_values(["doc_key", "block_index", "content"]) \
        .reset_index(drop=True)
    b = df2.sort_values(["doc_key", "block_index", "content"]) \
        .reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# HttpLLMClient — the env-gated REAL completion client. Laws ported from
# the reference's perform_completion_with_backoff (utils.py:1741-1821):
# retry only on 429 with delays base*2^attempt, raise anything else
# immediately, OpenAI-compatible request/response shapes.
# ---------------------------------------------------------------------------

def _openai_body(content, p=7, c=11):
    return json.dumps({
        "choices": [{"message": {"role": "assistant", "content": content}}],
        "usage": {"prompt_tokens": p, "completion_tokens": c,
                  "total_tokens": p + c},
    }).encode()


class _ScriptedTransport:
    def __init__(self, script):
        self.script = list(script)   # [(status, bytes), ...]
        self.requests = []

    def __call__(self, url, headers, body):
        self.requests.append((url, dict(headers), json.loads(body)))
        return self.script.pop(0)


def _client(script, **kw):
    from crawl4ai_ray.functions.llm_extract import HttpLLMClient

    sleeps = []
    t = _ScriptedTransport(script)
    c = HttpLLMClient("http://llm.test/v1", api_key="sk-x",
                      transport=t, sleep=sleeps.append, **kw)
    return c, t, sleeps


def test_http_client_success_parses_openai_shape():
    c, t, sleeps = _client([(200, _openai_body("<blocks>[]</blocks>"))])
    r = c.complete("hi")
    assert r.content == "<blocks>[]</blocks>"
    assert (r.usage.prompt_tokens, r.usage.completion_tokens,
            r.usage.total_tokens) == (7, 11, 18)
    assert sleeps == []
    url, headers, body = t.requests[0]
    assert url == "http://llm.test/v1/chat/completions"
    assert headers["Authorization"] == "Bearer sk-x"
    assert body["messages"] == [{"role": "user", "content": "hi"}]
    assert body["temperature"] == 0.01           # utils.py:1776
    assert "response_format" not in body


def test_http_client_json_response_flag():
    c, t, _ = _client([(200, _openai_body("{}"))], json_response=True)
    c.complete("q")
    assert t.requests[0][2]["response_format"] == {"type": "json_object"}


def test_http_client_retries_429_with_exponential_delays():
    c, t, sleeps = _client([(429, b""), (429, b""),
                            (200, _openai_body("ok"))])
    assert c.complete("p").content == "ok"
    assert sleeps == [2.0, 4.0]                  # base_delay * 2**attempt
    assert len(t.requests) == 3


def test_http_client_rate_limit_exhaustion_is_one_error_block():
    from crawl4ai_ray.functions.llm_extract import (LLMExtractionStrategy,
                                                    LLMRateLimitError)

    c, _, sleeps = _client([(429, b"")] * 3)
    with pytest.raises(LLMRateLimitError):
        c.complete("p")
    assert sleeps == [2.0, 4.0]
    # end to end: the strategy turns exhaustion into the single
    # error-tagged block the reference's flow lands on
    c2, _, _ = _client([(429, b"")] * 3)
    blocks = LLMExtractionStrategy(client=c2).run("u", ["some text"])
    assert len(blocks) == 1 and blocks[0]["error"] is True
    assert blocks[0]["tags"] == ["error"]
    assert "Rate limit" in blocks[0]["content"]


def test_http_client_non_429_raises_immediately():
    c, t, sleeps = _client([(500, b"boom")])
    with pytest.raises(RuntimeError):
        c.complete("p")
    assert sleeps == [] and len(t.requests) == 1


def test_http_client_urllib_transport_against_local_server():
    import http.server
    import threading

    from crawl4ai_ray.functions.llm_extract import HttpLLMClient

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            assert body["messages"][0]["content"] == "live"
            out = _openai_body("live-answer")
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = HttpLLMClient(f"http://127.0.0.1:{srv.server_port}/v1")
        assert c.complete("live").content == "live-answer"
    finally:
        srv.shutdown()


def test_from_env_activation(monkeypatch):
    from crawl4ai_ray.functions.llm_extract import (FakeLLMClient,
                                                    HttpLLMClient,
                                                    default_llm_client)

    monkeypatch.delenv("LLM_API_BASE", raising=False)
    assert HttpLLMClient.from_env() is None
    assert isinstance(default_llm_client(), FakeLLMClient)
    monkeypatch.setenv("LLM_API_BASE", "http://llm.test/v1")
    monkeypatch.setenv("LLM_MODEL", "m-test")
    c = default_llm_client()
    assert isinstance(c, HttpLLMClient) and c.model == "m-test"
