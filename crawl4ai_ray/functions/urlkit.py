"""URL kernel: canonicalization, host extraction, stable 64-bit hashing.

This module is the single source of truth for URL identity in the engine:
the seen-set, the cache anti-join, and frontier partitioning all key off
``canonicalize`` + ``hash64``. Semantics mirror the reference's
``normalize_url_for_deep_crawl`` (/root/reference/crawl4ai/utils.py:2228-2273)
and ``normalize_url`` (utils.py:2142-2225) — reimplemented from observed
behavior, byte-for-byte compatible on the covered cases (see
tests/test_urlkit.py table-driven cases).

All functions here are pure; batch wrappers return numpy arrays so they can
run inside ``map_batches`` without per-row Python dispatch overhead beyond
the unavoidable string work (urllib parsing is inherently per-string; an
``lru_cache`` mirrors the reference's caching at utils.py:2276).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from urllib.parse import (
    parse_qs,
    parse_qsl,
    quote,
    unquote,
    urlencode,
    urljoin,
    urlparse,
    urlunparse,
)

import numpy as np

# Tracking params stripped by the deep-crawl normalizer (reference
# utils.py:2249 — note this list is SMALLER than the generic one below).
_CRAWL_TRACKING = ("utm_source", "utm_medium", "utm_campaign", "ref", "fbclid")

# Generic normalizer's default tracking set (reference utils.py:2199-2202).
_FULL_TRACKING = frozenset(
    {
        "utm_source",
        "utm_medium",
        "utm_campaign",
        "utm_term",
        "utm_content",
        "gclid",
        "fbclid",
        "ref",
        "ref_src",
    }
)


@lru_cache(maxsize=100_000)
def canonicalize(href: str, base_url: str) -> str | None:
    """Canonical URL for frontier/seen-set identity.

    Mirrors reference ``normalize_url_for_deep_crawl``: urljoin, lowercase
    netloc, drop fragment, drop 5 tracking params (first-occurrence key
    order preserved, blank values dropped — parse_qs defaults), rstrip all
    trailing slashes from the path.
    """
    if not href:
        return None
    full_url = urljoin(base_url, href.strip())
    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()
    query = parsed.query
    if query:
        params = parse_qs(query)
        for p in _CRAWL_TRACKING:
            params.pop(p, None)
        query = urlencode(params, doseq=True) if params else ""
    return urlunparse(
        (parsed.scheme, netloc, parsed.path.rstrip("/"), parsed.params, query, "")
    )


def normalize_url(
    href: str,
    base_url: str,
    *,
    drop_query_tracking: bool = True,
    sort_query: bool = True,
    keep_fragment: bool = False,
    extra_drop_params=None,
) -> str | None:
    """Extended normalizer (reference ``normalize_url`` utils.py:2142-2225):
    percent-re-encode path, strip single trailing slash (except root),
    lowercase query keys, drop tracking params, sort query keys."""
    if not href:
        return None
    full_url = urljoin(base_url, href.strip())
    parsed = urlparse(full_url)
    netloc = parsed.netloc.lower()
    path = quote(unquote(parsed.path))
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    query = parsed.query
    if query:
        params = [(k.lower(), v) for k, v in parse_qsl(query, keep_blank_values=True)]
        if drop_query_tracking:
            drop = _FULL_TRACKING
            if extra_drop_params:
                drop = drop | {p.lower() for p in extra_drop_params}
            params = [(k, v) for k, v in params if k not in drop]
        if sort_query:
            params.sort(key=lambda kv: kv[0])
        query = urlencode(params, doseq=True) if params else ""
    fragment = parsed.fragment if keep_fragment else ""
    return urlunparse((parsed.scheme, netloc, path, parsed.params, query, fragment))


def is_valid_crawl_url(url: str) -> bool:
    """Reference ``can_process_url`` validity part (bfs_strategy.py:46-60):
    http/https scheme, non-empty netloc containing a dot."""
    try:
        parsed = urlparse(url)
    except Exception:
        return False
    return bool(
        parsed.scheme in ("http", "https") and parsed.netloc and "." in parsed.netloc
    )


@lru_cache(maxsize=50_000)
def host_of(url: str) -> str:
    try:
        return urlparse(url).netloc.lower()
    except Exception:
        return ""


_TWO_LEVEL_TLDS = frozenset(
    {"co", "com", "org", "net", "gov", "edu", "ac", "mil"}
)


@lru_cache(maxsize=50_000)
def base_domain(url: str) -> str:
    """Registrable domain with a co.uk-style heuristic (reference
    utils.py:2340-2388 behavior): last two labels, or last three when the
    second-to-last label is a common second-level TLD label."""
    netloc = host_of(url)
    if not netloc:
        return ""
    netloc = netloc.split(":")[0]
    parts = netloc.split(".")
    if len(parts) <= 2:
        return netloc
    if parts[-2] in _TWO_LEVEL_TLDS and len(parts) >= 3:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def is_external(url: str, base_url: str) -> bool:
    """External = different registrable domain (reference utils.py:2391-2423)."""
    return base_domain(url) != base_domain(base_url)


# ---------------------------------------------------------------------------
# Hashing — stable across processes/runs (blake2b truncated to 64 bits).
# ---------------------------------------------------------------------------


def hash64(s: str) -> int:
    """Stable uint64 hash of a string (partitioning + seen-set key)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def hash32(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest(), "little"
    )


# ---------------------------------------------------------------------------
# Batch (vectorized-shape) wrappers for map_batches UDFs.
# ---------------------------------------------------------------------------


def canonicalize_batch(hrefs, base_urls) -> list:
    """Canonicalize a batch; returns list[str|None] aligned with input."""
    return [canonicalize(h, b) for h, b in zip(hrefs, base_urls)]


def hash64_batch(urls) -> np.ndarray:
    out = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        out[i] = hash64(u)
    return out


def hash32_batch(urls) -> np.ndarray:
    out = np.empty(len(urls), dtype=np.uint32)
    for i, u in enumerate(urls):
        out[i] = hash32(u)
    return out


def host_batch(urls) -> list:
    return [host_of(u) for u in urls]


def valid_mask(urls) -> np.ndarray:
    return np.fromiter(
        (is_valid_crawl_url(u) for u in urls), dtype=bool, count=len(urls)
    )
