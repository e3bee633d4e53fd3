"""Pluggable tokenizers for token counting / sequence packing (A6-style
plug point — same activation pattern as ``model_loader.py``: labeled
deterministic stubs in this environment, a HuggingFace adapter that
activates iff ``transformers`` imports).

Real pre-training pipelines pack and budget by BPE tokens, not
whitespace words. The engine keeps the counting contract pluggable:

- ``WhitespaceTokenizer`` — the corpus convention everywhere else in
  the repo (``lower().split()``); counts match ``corpus._tokens``.
- ``BpeishTokenizer`` — a deterministic GPT-2-STYLE pre-tokenizer
  (contractions / letter runs / digit runs / punctuation runs, each
  optionally preceded by one space), restricted to an RE2-compatible
  subset (no lookahead) so the SAME pattern runs in DuckDB's
  ``regexp_extract_all`` — which is what makes ``doc_bpe_pack_sequences``
  SQL-oracle-checkable. This is a pre-tokenizer, not a trained merge
  table: counts approximate (upper-bound) a real BPE's token count.
- ``HFTokenizer`` — the real path: ``transformers.AutoTokenizer``
  with ``add_special_tokens=False``, loaded ONCE per process through
  the cache below (the model_loader load-once law). Skip-marked tests
  gate the adapter contract when the package exists.

``load_tokenizer(spec)`` is process-cached so actor-pool stages pay
tokenizer construction once per worker, never per batch.
"""

from __future__ import annotations

import re
from functools import lru_cache

# GPT-2-style pre-tokenization, RE2-compatible subset (Radford et al.
# 2019 released pattern minus the \s+(?!\S) tail and unicode classes —
# RE2 has no lookahead; input is lowercased so [a-z] covers letters)
BPEISH_PATTERN = r"'(?:ll|ve|re|[sdmt])| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


class WhitespaceTokenizer:
    """The repo-wide whitespace convention (corpus._tokens)."""

    name = "whitespace"

    def tokenize(self, text: str) -> list[str]:
        return (text or "").lower().split()

    def count(self, text: str) -> int:
        return len((text or "").lower().split())


class BpeishTokenizer:
    """Deterministic BPE-style pre-tokenizer (see module docstring)."""

    name = "bpeish"

    def __init__(self):
        self._rx = re.compile(BPEISH_PATTERN)

    def tokenize(self, text: str) -> list[str]:
        return self._rx.findall((text or "").lower())

    def count(self, text: str) -> int:
        return len(self._rx.findall((text or "").lower()))


class HFTokenizer:
    """transformers.AutoTokenizer adapter — activates iff the package
    imports. ``count`` is ``len(encode(text, add_special_tokens=False))``
    (the packing convention: specials are added per training sequence,
    not per document)."""

    def __init__(self, model_name: str):
        try:
            from transformers import AutoTokenizer
        except ImportError as e:  # pragma: no cover - sandbox gap
            raise ImportError(
                f"tokenizer spec {model_name!r} is not a builtin "
                "('whitespace' | 'bpeish') and the 'transformers' "
                "package is not installed") from e
        self.name = model_name
        self._tok = AutoTokenizer.from_pretrained(model_name)

    def tokenize(self, text: str) -> list[str]:
        return self._tok.tokenize(text or "")

    def count(self, text: str) -> int:
        return len(self._tok.encode(text or "",
                                    add_special_tokens=False))


@lru_cache(maxsize=8)
def load_tokenizer(spec: str = "whitespace"):
    """Process-cached tokenizer factory. ``spec`` is 'whitespace',
    'bpeish', or a HuggingFace model name (adapter path)."""
    if spec == "whitespace":
        return WhitespaceTokenizer()
    if spec == "bpeish":
        return BpeishTokenizer()
    return HFTokenizer(spec)
