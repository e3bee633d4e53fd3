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
