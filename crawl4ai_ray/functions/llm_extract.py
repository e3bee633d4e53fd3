"""LLM extraction (A5) — the reference's LLMExtractionStrategy data plane.

Re-expresses /root/reference/crawl4ai/extraction_strategy.py:479-802 with
the network-dependent completion call behind a pluggable client:

- ``merge_chunks``: the reference's token-budgeted section merging
  (utils.py:161-224) — documents tokenized by whitespace, token counts
  scaled by ``word_token_rate`` (1.3), distributed into
  ``ceil(total/target)`` pre-allocated chunks with ``overlap`` tokens
  carried between consecutive chunks;
- prompt assembly: block / block+instruction / schema / inferred-schema
  variants (the reference's PROMPT_EXTRACT_* selection law; the template
  text here is this engine's own — the law is which template + which
  variables, not the prose);
- response parsing: ``force_json_response`` JSON (single-key-list
  unwrap, dict→[dict]), else a ``<blocks>`` XML envelope, with the
  split-and-parse-JSON-objects fallback emitting an error block
  (``{"index": 0, "error": True, "tags": ["error"], ...}``);
- per-chunk parallelism: ThreadPoolExecutor(max_workers=4), results in
  completion order (the reference's as_completed loop — chunk order is
  NOT guaranteed, faithfully);
- TokenUsage accounting per request and accumulated.

This sandbox has no network/LLM, so the default client is
``FakeLLMClient`` — a CLEARLY-LABELED deterministic stub that answers
with a valid ``<blocks>`` response derived from the chunk text. The
plumbing (chunking, prompts, parsing, parallelism, usage, the actor-pool
stage) is the real contract; swap the client for a LiteLLM-style caller
in deployment.
"""

from __future__ import annotations

import json
import re
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

import pyarrow as pa

from .textutils import (escape_json_string, sanitize_input_encode,
                        split_and_parse_json_objects)

CHUNK_TOKEN_THRESHOLD = 1 << 11      # reference config.py:42
OVERLAP_RATE = 0.1                   # config.py:43
WORD_TOKEN_RATE = 1.3                # config.py:44


def merge_chunks(docs, target_size: int, overlap: int = 0,
                 word_token_ratio: float = 1.0) -> list[str]:
    """Token-budgeted section merge (reference utils.py:161-224)."""
    token_lists: list[list[str]] = []
    total = 0
    for doc in docs:
        tokens = (doc or "").split()
        count = int(len(tokens) * word_token_ratio)
        if count:
            token_lists.append(tokens)
            total += count
    if not total:
        return []
    num_chunks = max(1, (total + target_size - 1) // target_size)
    chunks: list[list[str]] = [[] for _ in range(num_chunks)]
    cur = 0
    cur_size = 0
    for tok in (t for toks in token_lists for t in toks):
        if cur_size >= target_size and cur < num_chunks - 1:
            if overlap > 0:
                carry = chunks[cur][-overlap:]
                cur += 1
                chunks[cur].extend(carry)
                cur_size = len(carry)
            else:
                cur += 1
                cur_size = 0
        chunks[cur].append(tok)
        cur_size += 1
    return [" ".join(c) for c in chunks if c]


# -- prompt templates (this engine's text; the reference's SELECTION law) ----

PROMPT_BLOCKS = (
    "Extract the meaningful content blocks from this page.\n"
    "URL: {URL}\nHTML:\n{HTML}\n"
    "Return a JSON list of blocks inside <blocks>...</blocks>."
)
PROMPT_BLOCKS_WITH_INSTRUCTION = (
    "Extract content blocks relevant to the request.\n"
    "REQUEST: {REQUEST}\nURL: {URL}\nHTML:\n{HTML}\n"
    "Return a JSON list of blocks inside <blocks>...</blocks>."
)
PROMPT_SCHEMA_WITH_INSTRUCTION = (
    "Extract objects matching the schema.\nSCHEMA:\n{SCHEMA}\n"
    "REQUEST: {REQUEST}\nURL: {URL}\nHTML:\n{HTML}\n"
    "Return a JSON list inside <blocks>...</blocks>."
)
PROMPT_INFERRED_SCHEMA = (
    "Infer a schema and extract objects for it.\nURL: {URL}\n"
    "HTML:\n{HTML}\nReturn a JSON list inside <blocks>...</blocks>."
)

_BLOCKS_RE = re.compile(r"<blocks>(.*?)</blocks>", re.S)


@dataclass
class TokenUsage:
    completion_tokens: int = 0
    prompt_tokens: int = 0
    total_tokens: int = 0


@dataclass
class LLMResponse:
    content: str
    usage: TokenUsage = field(default_factory=TokenUsage)


class FakeLLMClient:
    """DETERMINISTIC STUB — no model, no network (A5's environment gap,
    same policy as FakeCodec / HashedNgramEmbedder). Answers any
    extraction prompt with a valid ``<blocks>`` JSON list: one block per
    sentence-ish span of the embedded content, tagged by its most
    frequent long word. Token counts are word counts (so usage
    accounting is exercised end to end)."""

    def complete(self, prompt: str) -> LLMResponse:
        m = re.search(r"HTML:\n(.*?)\nReturn", prompt, re.S)
        content = m.group(1) if m else prompt
        spans = [s.strip() for s in re.split(r"(?<=[.!?])\s+", content)
                 if s.strip()]
        from collections import Counter

        blocks = []
        for i, span in enumerate(spans[:20]):
            words = [w.lower() for w in span.split() if len(w) > 4]
            if words:
                # deterministic across processes: count desc, word asc
                # (a bare max(set(...)) varies with per-process str hashing)
                tag = sorted(Counter(words).items(),
                             key=lambda kv: (-kv[1], kv[0]))[0][0]
            else:
                tag = "text"
            blocks.append({"index": i, "tags": [tag], "content": span})
        payload = "<blocks>" + json.dumps(blocks) + "</blocks>"
        n_in = len(prompt.split())
        n_out = len(payload.split())
        return LLMResponse(payload, TokenUsage(n_out, n_in, n_in + n_out))


class LLMRateLimitError(Exception):
    """HTTP 429 after the retry budget (reference utils.py:1802-1809:
    exhausted retries yield one error block for the chunk — here via the
    strategy's outer error-block catch)."""


class HttpLLMClient:
    """Env-gated REAL completion client — an OpenAI-compatible
    ``/chat/completions`` caller on stdlib urllib with the reference's
    retry law (utils.py:1741-1821, ``perform_completion_with_backoff``):

    - ``max_attempts=3``, exponential delays ``base_delay * 2**attempt``
      (2 s, 4 s) — retrying ONLY on HTTP 429 rate limits;
    - any other failure raises immediately (the reference re-raises
      non-RateLimit exceptions), which the strategy's outer catch turns
      into one ``{"error": True, "tags": ["error"]}`` block for the
      chunk — the same end state the reference reaches when its canned
      rate-limit list crashes the usage accessor;
    - ``temperature=0.01`` and ``response_format={"type":"json_object"}``
      when ``json_response`` (utils.py:1776-1778).

    Activation mirrors ``model_loader``'s HF adapter: build via
    ``HttpLLMClient.from_env()`` which returns a client iff
    ``LLM_API_BASE`` is set (``LLM_API_KEY`` / ``LLM_MODEL`` optional),
    else None so callers fall back to the deterministic fake. The
    ``transport`` hook injects a fake HTTP layer for the recorded-response
    law tests; the default transport is real urllib."""

    def __init__(self, base_url: str, *, model: str = "gpt-4o-mini",
                 api_key: str | None = None, temperature: float = 0.01,
                 json_response: bool = False, max_attempts: int = 3,
                 base_delay: float = 2.0, timeout: float = 60.0,
                 transport=None, sleep=None):
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.json_response = json_response
        self.max_attempts = max_attempts
        self.base_delay = base_delay
        self.timeout = timeout
        self._transport = transport or self._urllib_transport
        if sleep is None:
            import time

            sleep = time.sleep
        self._sleep = sleep

    @classmethod
    def from_env(cls, **kwargs):
        import os

        base = os.environ.get("LLM_API_BASE")
        if not base:
            return None
        return cls(base, model=os.environ.get("LLM_MODEL", "gpt-4o-mini"),
                   api_key=os.environ.get("LLM_API_KEY"), **kwargs)

    def _urllib_transport(self, url: str, headers: dict,
                          body: bytes) -> tuple[int, bytes]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers,
                                     method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    def complete(self, prompt: str) -> LLMResponse:
        body = {"model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": self.temperature}
        if self.json_response:
            body["response_format"] = {"type": "json_object"}
        payload = json.dumps(body).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        for attempt in range(self.max_attempts):
            status, raw = self._transport(self.url, headers, payload)
            if status == 429:
                if attempt < self.max_attempts - 1:
                    self._sleep(self.base_delay * (2 ** attempt))
                    continue
                raise LLMRateLimitError(
                    "Rate limit error. Please try again later.")
            if status != 200:
                raise RuntimeError(
                    f"LLM API error {status}: {raw[:200]!r}")
            data = json.loads(raw)
            usage = data.get("usage") or {}
            return LLMResponse(
                data["choices"][0]["message"]["content"],
                TokenUsage(int(usage.get("completion_tokens", 0)),
                           int(usage.get("prompt_tokens", 0)),
                           int(usage.get("total_tokens", 0))),
            )
        raise LLMRateLimitError(
            "Rate limit error. Please try again later.")


def default_llm_client():
    """The strategy's client resolution: real HTTP client iff
    ``LLM_API_BASE`` is set, else the labeled deterministic fake."""
    return HttpLLMClient.from_env() or FakeLLMClient()


class LLMExtractionStrategy:
    """See module docstring; mirrors the reference control flow."""

    def __init__(self, *, client=None, instruction: str | None = None,
                 schema: dict | None = None, extraction_type: str = "block",
                 chunk_token_threshold: int = CHUNK_TOKEN_THRESHOLD,
                 overlap_rate: float = OVERLAP_RATE,
                 word_token_rate: float = WORD_TOKEN_RATE,
                 apply_chunking: bool = True,
                 force_json_response: bool = False):
        self.client = client or default_llm_client()
        self.instruction = instruction
        self.schema = schema
        self.extract_type = "schema" if schema else extraction_type
        self.chunk_token_threshold = (chunk_token_threshold
                                      if apply_chunking else int(1e9))
        self.overlap_rate = overlap_rate
        self.word_token_rate = word_token_rate
        self.force_json_response = force_json_response
        self.usages: list[TokenUsage] = []
        self.total_usage = TokenUsage()

    # -- one chunk ----------------------------------------------------------

    def _prompt(self, url: str, html: str) -> str:
        variables = {"URL": url, "HTML": escape_json_string(html)}
        template = PROMPT_BLOCKS
        if self.instruction:
            variables["REQUEST"] = self.instruction
            template = PROMPT_BLOCKS_WITH_INSTRUCTION
        if self.extract_type == "schema" and self.schema:
            variables["SCHEMA"] = json.dumps(self.schema, indent=2)
            variables.setdefault("REQUEST", self.instruction or "")
            template = PROMPT_SCHEMA_WITH_INSTRUCTION
        if self.extract_type == "schema" and not self.schema:
            template = PROMPT_INFERRED_SCHEMA
        for k, v in variables.items():
            template = template.replace("{" + k + "}", v)
        return template

    def extract(self, url: str, ix: int, html: str) -> list[dict]:
        try:
            response = self.client.complete(self._prompt(url, html))
            self.usages.append(response.usage)
            self.total_usage.completion_tokens += \
                response.usage.completion_tokens
            self.total_usage.prompt_tokens += response.usage.prompt_tokens
            self.total_usage.total_tokens += response.usage.total_tokens
            content = response.content
            try:
                if self.force_json_response:
                    blocks = json.loads(content)
                    if isinstance(blocks, dict):
                        if (len(blocks) == 1
                                and isinstance(next(iter(blocks.values())),
                                               list)):
                            blocks = next(iter(blocks.values()))
                        else:
                            blocks = [blocks]
                else:
                    m = _BLOCKS_RE.search(content)
                    blocks = json.loads(m.group(1)) if m else \
                        json.loads(content)
                for block in blocks:
                    block["error"] = False
            except Exception:
                parsed, unparsed = split_and_parse_json_objects(content)
                blocks = parsed
                if not unparsed and not parsed and content.strip():
                    # the engine's splitter silently drops fragments the
                    # reference would surface; keep the error-block law
                    unparsed = [content]
                if unparsed:
                    blocks.append({"index": 0, "error": True,
                                   "tags": ["error"],
                                   "content": "\n".join(map(str, unparsed))})
            return blocks
        except Exception as e:                      # client failure
            return [{"index": ix, "error": True, "tags": ["error"],
                     "content": str(e)}]

    # -- sections -----------------------------------------------------------

    def run(self, url: str, sections: list[str]) -> list[dict]:
        merged = merge_chunks(
            sections, self.chunk_token_threshold,
            overlap=int(self.chunk_token_threshold * self.overlap_rate),
            word_token_ratio=self.word_token_rate,
        )
        out: list[dict] = []
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(self.extract, url, ix,
                            sanitize_input_encode(section))
                for ix, section in enumerate(merged)
            ]
            for fut in as_completed(futs):
                try:
                    out.extend(fut.result())
                except Exception as e:
                    out.append({"index": 0, "error": True,
                                "tags": ["error"], "content": str(e)})
        return out


class LLMExtractStage:
    """Actor-pool map_batches stage: (key, text) rows → one row per
    extracted block (client/strategy built once per actor). Output block
    lists are re-sorted by (index, content) per doc so the stage is
    deterministic despite the strategy's completion-order law."""

    def __init__(self, *, text_col: str = "text", key_col: str = "doc_id",
                 **strategy_kwargs):
        self.strategy = LLMExtractionStrategy(**strategy_kwargs)
        self.text_col = text_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, idxs, tags, contents, errors = [], [], [], [], []
        for key, text in zip(batch.column(self.key_col).to_pylist(),
                             batch.column(self.text_col).to_pylist()):
            blocks = self.strategy.run("", [text or ""])
            blocks.sort(key=lambda b: (int(b.get("index", 0)),
                                       str(b.get("content", ""))))
            for b in blocks:
                keys.append(key)
                idxs.append(int(b.get("index", 0)))
                tags.append(json.dumps(b.get("tags", [])))
                contents.append(str(b.get("content", "")))
                errors.append(bool(b.get("error", False)))
        return pa.table(
            {
                "doc_key": pa.array(keys),
                "block_index": pa.array(idxs, pa.int64()),
                "tags": pa.array(tags, pa.string()),
                "content": pa.array(contents, pa.string()),
                "error": pa.array(errors, pa.bool_()),
            }
        )


def llm_extract_blocks(sf_dir: str, *, instruction: str | None = None):
    """Pipeline entry: documents table → per-document LLM-extracted blocks
    (rows-only; the client is the labeled deterministic stub)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        LLMExtractStage,
        fn_constructor_kwargs={"instruction": instruction},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=2,
    )
