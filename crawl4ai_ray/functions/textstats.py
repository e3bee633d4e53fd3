"""Text analysis kernels for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

These extend the reference's text utilities (stopword cleaning
/root/reference/crawl4ai/utils.py:2425-2652, content hashing utils.py:2701)
with the standard large-corpus curation measures. All are deterministic,
vectorized-per-batch (pandas string kernels / numpy), and designed to run
as ``map_batches(TextStats, batch_format="pyarrow")``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Small per-language stopword profiles (top function words). N-gram-free
# heuristic: language = argmax of stopword hit-rate; 'und' if no hits.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "as", "his", "on", "be", "at", "by", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "mit", "von", "auf", "für", "im", "dem", "sich", "des"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "du",
           "que", "qui", "dans", "pour", "pas", "sur", "avec", "au"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "del",
           "que", "en", "por", "para", "con", "no", "se", "su"},
}

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenize shape, simplified)
_BPE_RE = re.compile(r"[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]")
_PUNCT_RE = re.compile(r"[^\w\s]")


def whitespace_token_count(text: str) -> int:
    return len(text.split())


def bpe_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text))


def detect_language(text: str) -> str:
    words = text.lower().split()
    if not words:
        return "und"
    best, best_hits = "und", 0
    for lang, stops in _LANG_STOPWORDS.items():
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def quality_score(text: str) -> float:
    """Length / punctuation / stopword heuristic in [0, 1] (C4/Gopher-style
    rules collapsed into one score):
    - length component: saturating at 200 words
    - mean-word-length component: penalize <3 or >10
    - punctuation-ratio component: penalize >15% punctuation chars
    - stopword component: reward presence of any language's function words
    """
    words = text.split()
    n = len(words)
    if n == 0:
        return 0.0
    length_c = min(1.0, n / 200.0)
    mean_len = sum(len(w) for w in words) / n
    word_c = 1.0 if 3.0 <= mean_len <= 10.0 else 0.5
    punct = len(_PUNCT_RE.findall(text))
    punct_ratio = punct / max(1, len(text))
    punct_c = 1.0 if punct_ratio <= 0.15 else max(0.0, 1.0 - punct_ratio)
    lw = [w.lower() for w in words]
    stop_hits = sum(
        1 for w in lw if any(w in s for s in _LANG_STOPWORDS.values())
    )
    stop_c = min(1.0, 4.0 * stop_hits / n)
    return round(0.25 * (length_c + word_c + punct_c + stop_c), 6)


_FP_BASE = 1000003
_FP_MASK = (1 << 64) - 1


def fingerprint64(text: str) -> int:
    """Rolling polynomial hash over normalized words (order-sensitive
    document fingerprint; stable across runs)."""
    h = 1469598103934665603
    for w in text.lower().split():
        wh = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little"
        )
        h = ((h * _FP_BASE) ^ wh) & _FP_MASK
    return h


def md5_hex(text: str) -> str:
    """Content hash (reference generate_content_hash utils.py:2701 uses a
    hex digest of the content; md5 here so DuckDB's md5() oracle matches)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


class HashedNgramEmbedder:
    """Deterministic document embedder — the A6 model-stage STUB.

    Real deployments load a sentence-transformer once per actor in
    ``__init__`` (reference model_loader.py:1-296); this environment has no
    model weights, so the kernel is feature hashing: word+bigram tokens
    hashed into ``dim`` buckets with signed counts, L2-normalized. The
    actor-pool plumbing, batch shapes, and output layout
    (``embedding: list<float32>``) are the real contract; the output feeds
    pipelines.similarity unchanged.
    """

    def __init__(self, dim: int = 64, text_col: str = "text"):
        self.dim = dim
        self.text_col = text_col

    def _embed(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        words = text.lower().split()
        tokens = words + [" ".join(p) for p in zip(words, words[1:])]
        for t in tokens:
            h = int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            v[h % self.dim] += 1.0 if (h >> 63) else -1.0
        n = np.linalg.norm(v)
        return (v / n if n else v).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = [self._embed(t or "")
                for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(
            "embedding",
            pa.array([e.tolist() for e in embs],
                     type=pa.list_(pa.float32())),
        )


class TextStats:
    """map_batches stage: append n_words / n_tokens_bpe / lang_detected /
    quality / fingerprint / content_md5 to a text column."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_words = np.empty(n, dtype=np.int64)
        n_bpe = np.empty(n, dtype=np.int64)
        langs, quals, fps, md5s = [], np.empty(n), [], []
        for i, t in enumerate(texts):
            t = t or ""
            n_words[i] = whitespace_token_count(t)
            n_bpe[i] = bpe_token_count(t)
            langs.append(detect_language(t))
            quals[i] = quality_score(t)
            fps.append(fingerprint64(t))
            md5s.append(md5_hex(t))
        return (
            batch.append_column("n_words", pa.array(n_words))
            .append_column("n_tokens_bpe", pa.array(n_bpe))
            .append_column("lang_detected", pa.array(langs, type=pa.string()))
            .append_column("quality", pa.array(quals, type=pa.float64()))
            .append_column(
                "fingerprint", pa.array(np.array(fps, dtype=np.uint64))
            )
            .append_column("content_md5", pa.array(md5s, type=pa.string()))
        )
