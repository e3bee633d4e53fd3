"""Chunking strategies — pure string→list[str] functions for flat_map /
in-UDF use.

Behavior-parity with /root/reference/crawl4ai/chunking_strategy.py:
Identity (:28), Regex (:38-63), sentence (:65-91, regex-based here — nltk
is not in this environment; the reference's own commented-out regex
splitter is the model), FixedLengthWord (:147-173), SlidingWindow
(:175-213), OverlappingWindow (:215-256). TopicSegmentation (TextTiling)
requires nltk and is stubbed with a paragraph-boundary approximation.
"""

from __future__ import annotations

import re


class IdentityChunking:
    def chunk(self, text: str) -> list[str]:
        return [text]


class RegexChunking:
    def __init__(self, patterns=None):
        self.patterns = patterns if patterns is not None else [r"\n\n"]

    def chunk(self, text: str) -> list[str]:
        paragraphs = [text]
        for pattern in self.patterns:
            nxt = []
            for p in paragraphs:
                nxt.extend(re.split(pattern, p))
            paragraphs = nxt
        return paragraphs


class SentenceChunking:
    """Sentence splitter on end-punctuation + whitespace (the reference's
    regex fallback at chunking_strategy.py:79-83; nltk unavailable)."""

    # deliberately NOT the reference's commented-out fallback verbatim:
    # its (?<![A-Za-z]\.) lookbehind suppresses a split after ANY word
    # ending in a period (every normal sentence), which is why that regex
    # is commented out in the reference and nltk.sent_tokenize ships
    # instead (chunking_strategy.py:79-84; nltk unavailable here). This
    # keeps the two sane guards (mid-token dots, capitalized
    # abbreviations like "Dr.") and splits on end punctuation.
    _SENT_RE = re.compile(
        r"(?<!\w\.\w.)(?<![A-Z][a-z]\.)(?<=\.|\?|\!|\n)\s+"
    )

    def chunk(self, text: str) -> list[str]:
        sentences = self._SENT_RE.split(text)
        return [s.strip() for s in sentences if s.strip()]


class TopicSegmentationChunking:
    """STUB of TextTiling (reference chunking_strategy.py:93-145 uses
    nltk.TextTilingTokenizer, not available here). Deterministic
    approximation: paragraph blocks regrouped to ~target_words chunks.
    The Ray-side plumbing (flat_map signature) is real and tested."""

    def __init__(self, target_words: int = 120):
        self.target_words = target_words

    def chunk(self, text: str) -> list[str]:
        paras = [p for p in re.split(r"\n\n+", text) if p.strip()]
        chunks, cur, n = [], [], 0
        for p in paras:
            w = len(p.split())
            if n and n + w > self.target_words:
                chunks.append("\n\n".join(cur))
                cur, n = [], 0
            cur.append(p)
            n += w
        if cur:
            chunks.append("\n\n".join(cur))
        return chunks or ([text] if text else [])


class FixedLengthWordChunking:
    def __init__(self, chunk_size: int = 100):
        self.chunk_size = chunk_size

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        return [
            " ".join(words[i:i + self.chunk_size])
            for i in range(0, len(words), self.chunk_size)
        ]


class SlidingWindowChunking:
    def __init__(self, window_size: int = 100, step: int = 50):
        self.window_size = window_size
        self.step = step

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [text]
        chunks = []
        i = 0
        for i in range(0, len(words) - self.window_size + 1, self.step):
            chunks.append(" ".join(words[i:i + self.window_size]))
        if i + self.window_size < len(words):
            chunks.append(" ".join(words[-self.window_size:]))
        return chunks


class OverlappingWindowChunking:
    def __init__(self, window_size: int = 1000, overlap: int = 100):
        self.window_size = window_size
        self.overlap = overlap

    def chunk(self, text: str) -> list[str]:
        words = text.split()
        if len(words) <= self.window_size:
            return [text]
        chunks = []
        start = 0
        while start < len(words):
            end = start + self.window_size
            chunks.append(" ".join(words[start:end]))
            if end >= len(words):
                break
            start = end - self.overlap
        return chunks
