"""URL scorers — pure scoring functions, vectorizable inside map_batches.

Behavior-parity reimplementations of the reference deep-crawl scorers
(/root/reference/crawl4ai/deep_crawling/scorers.py): keyword relevance
(:160-188), path depth (:190-245), content type (:247-330), freshness
(:332-412), domain authority (:414-519), composite (:91-158). Each exposes
``score(url) -> float`` (weighted) and ``score_batch(urls) -> np.ndarray``.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

_SCORE_LOOKUP = [1.0, 0.5, 1.0 / 3.0, 0.25]
_FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]


class BaseScorer:
    def __init__(self, weight: float = 1.0):
        # reference stores weight as C float (scorers.py:67); mirror the
        # float32 rounding so composite sums match bit-for-bit
        self.weight = float(np.float32(weight))

    def _calculate(self, url: str) -> float:  # pragma: no cover - interface
        raise NotImplementedError

    def score(self, url: str) -> float:
        return self._calculate(url) * self.weight

    def score_batch(self, urls) -> np.ndarray:
        return np.fromiter((self.score(u) for u in urls), dtype=np.float64,
                           count=len(urls))

    def __call__(self, url: str) -> float:
        return self.score(url)


class KeywordRelevanceScorer(BaseScorer):
    """Fraction of keywords present as substrings of the URL."""

    def __init__(self, keywords, weight: float = 1.0,
                 case_sensitive: bool = False):
        super().__init__(weight)
        self.case_sensitive = case_sensitive
        self.keywords = [k if case_sensitive else k.lower() for k in keywords]

    def _calculate(self, url: str) -> float:
        if not self.case_sensitive:
            url = url.lower()
        matches = sum(1 for k in self.keywords if k in url)
        if not matches:
            return 0.0
        if matches == len(self.keywords):
            return 1.0
        return matches / len(self.keywords)


class PathDepthScorer(BaseScorer):
    """1/(1+|depth-optimal|) with the reference's lookup fast path."""

    def __init__(self, optimal_depth: int = 3, weight: float = 1.0):
        super().__init__(weight)
        self.optimal_depth = optimal_depth

    @staticmethod
    def _depth(url: str) -> int:
        pos = url.find("/", url.find("://") + 3)
        if pos == -1:
            return 0
        path = url[pos:]
        if not path or path == "/":
            return 0
        segs = [s for s in path.split("/") if s]
        return len(segs)

    def _calculate(self, url: str) -> float:
        distance = abs(self._depth(url) - self.optimal_depth)
        if distance < 4:
            return _SCORE_LOOKUP[distance]
        return 1.0 / (1.0 + distance)


class ContentTypeScorer(BaseScorer):
    """Extension→weight map (``{'.html$': 1.0}`` style keys) with regex
    fallback sorted by score desc."""

    def __init__(self, type_weights: dict, weight: float = 1.0):
        super().__init__(weight)
        self._exact: dict[str, float] = {}
        self._regex: list[tuple[re.Pattern, float]] = []
        for pattern, sc in type_weights.items():
            if pattern.startswith(".") and pattern.endswith("$"):
                self._exact[pattern[1:-1]] = sc
            else:
                self._regex.append((re.compile(pattern), sc))
        self._regex.sort(key=lambda x: -x[1])

    @staticmethod
    @lru_cache(maxsize=10_000)
    def _extension(url: str) -> str:
        pos = url.rfind(".")
        if pos == -1:
            return ""
        end = len(url)
        for i in range(pos + 1, len(url)):
            if url[i] in "?#;" or not url[i].isalnum():
                end = i
                break
        return url[pos + 1:end].lower()

    def _calculate(self, url: str) -> float:
        ext = self._extension(url)
        if ext:
            sc = self._exact.get(ext)
            if sc is not None:
                return sc
        for pattern, sc in self._regex:
            if pattern.search(url):
                return sc
        return 0.0


class FreshnessScorer(BaseScorer):
    """Extract the most recent 19xx/20xx year from the URL path; newer →
    higher; no year → 0.5."""

    _DATE_RE = re.compile(
        r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"
    )

    def __init__(self, weight: float = 1.0, current_year: int = 2024):
        super().__init__(weight)
        self.current_year = current_year

    def _extract_year(self, url: str):
        latest = None
        for m in self._DATE_RE.finditer(url):
            year = int(m.group(1))
            if year <= self.current_year and (latest is None or year > latest):
                latest = year
        return latest

    def _calculate(self, url: str) -> float:
        year = self._extract_year(url)
        if year is None:
            return 0.5
        diff = self.current_year - year
        if diff < len(_FRESHNESS_SCORES):
            return _FRESHNESS_SCORES[diff]
        return max(0.1, 1.0 - diff * 0.1)


class DomainAuthorityScorer(BaseScorer):
    """domain→authority map with default 0.5 for unknown domains."""

    def __init__(self, domain_weights: dict, default_weight: float = 0.5,
                 weight: float = 1.0):
        super().__init__(weight)
        self.domain_weights = {d.lower(): s for d, s in domain_weights.items()}
        self.default_weight = default_weight

    @staticmethod
    def _domain(url: str) -> str:
        start = url.find("://")
        start = 0 if start == -1 else start + 3
        end = len(url)
        for ch in "/?#":
            p = url.find(ch, start)
            if p != -1:
                end = min(end, p)
        domain = url[start:end]
        port = domain.rfind(":")
        if port != -1:
            domain = domain[:port]
        return domain.lower()

    def _calculate(self, url: str) -> float:
        return self.domain_weights.get(self._domain(url), self.default_weight)


class CompositeScorer(BaseScorer):
    """Weighted sum of scorers, optionally normalized by count."""

    def __init__(self, scorers, normalize: bool = True):
        super().__init__(1.0)
        self.scorers = list(scorers)
        self.normalize = normalize

    def _calculate(self, url: str) -> float:
        # the reference buffers each scorer's value in an array('f')
        # before summing — per-scorer float32 rounding is part of the
        # bit-for-bit contract (code-review r2)
        total = sum(float(np.float32(s.score(url))) for s in self.scorers)
        if self.normalize and self.scorers:
            return total / len(self.scorers)
        return total

    def score_batch(self, urls) -> np.ndarray:
        """Vectorized column arithmetic: one pass per scorer, summed
        (per-scorer float32 rounding as in the scalar path)."""
        if len(urls) == 0:
            return np.zeros(0)
        acc = np.zeros(len(urls))
        for s in self.scorers:
            acc += s.score_batch(urls).astype(np.float32).astype(np.float64)
        if self.normalize and self.scorers:
            acc /= len(self.scorers)
        return acc
