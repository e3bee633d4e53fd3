"""Single-process oracle crawler — golden outputs for pytest.

A tiny, sequential reimplementation of the reference's deep-crawl semantics,
used ONLY to produce golden fixtures the distributed engine is compared
against:

- BFS: level-synchronous expansion, per-result link discovery with
  visited-set probe on the canonical URL, validity + filter on the raw href,
  score threshold, per-page capacity truncation (sorted by score desc only
  when a scorer is present) — mirroring
  /root/reference/crawl4ai/deep_crawling/bfs_strategy.py:68-192 exactly,
  including its quirks: pages_crawled is incremented once per level before
  discovery, over-capacity links are still marked visited, and failed
  fetches produce results but no discovery.
- Best-first: min-heap on (score, depth, url), batch pop of 10 with
  visited.add at pop time (bff_strategy.py:129-213, BATCH_SIZE=10);
  within-batch result order is defined as batch (input) order — the
  structural guarantee level per SURVEY.md §7.5.

Link order within a page is the parse stage's link order (source order,
first-occurrence deduped) — shared with the engine by construction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .functions.urlkit import canonicalize, is_valid_crawl_url
from .sources.synthetic_web import SyntheticWeb
from .stages.parse import parse_html

BFF_BATCH_SIZE = 10


@dataclass
class OracleResult:
    # crawl order: one row per fetch attempt, in crawl order
    order: list = field(default_factory=list)   # dicts: url, depth, parent, seq, level, success
    seen: set = field(default_factory=set)      # final visited set (canonical urls)
    docs: dict = field(default_factory=dict)    # url -> parsed dict (spans/links/markdown)
    pages_crawled: int = 0


def _passes(url_raw: str, depth: int, filter_fn) -> bool:
    """can_process_url semantics (bfs_strategy.py:46-66)."""
    if not is_valid_crawl_url(url_raw):
        return False
    if depth != 0 and filter_fn is not None and not filter_fn(url_raw):
        return False
    return True


def oracle_bfs(
    site: SyntheticWeb,
    start_urls: list[str],
    *,
    max_depth: int = 2,
    max_pages: float = math.inf,
    include_external: bool = False,
    filter_fn=None,
    scorer_fn=None,
    score_threshold: float = -math.inf,
) -> OracleResult:
    """Reference BFS over the synthetic site. ``start_urls`` seeds level 0
    (the reference takes one start URL; multiple seeds = the engine's
    arun_many-style entry, processed in seed order at level 0)."""
    res = OracleResult()
    visited: set[str] = set()
    depths: dict[str, int] = {}
    current_level: list[tuple[str, str | None]] = []
    seq = 0
    for u in start_urls:
        cu = canonicalize(u, u)
        if cu not in visited:
            visited.add(cu)
            depths[cu] = 0
            current_level.append((cu, None))

    level_no = 0
    while current_level and res.pages_crawled < max_pages:
        next_level: list[tuple[str, str | None]] = []
        fetched = []
        for url, parent in current_level:
            page = site.page(url)
            success = page["status"] == 200
            fetched.append((url, parent, page, success))
        res.pages_crawled += sum(1 for f in fetched if f[3])

        for url, parent, page, success in fetched:
            depth = depths.get(url, 0)
            res.order.append(
                {"url": url, "depth": depth, "parent": parent or "",
                 "seq": seq, "level": level_no, "success": success,
                 "status": page["status"]}
            )
            seq += 1
            if not success:
                continue
            parsed = parse_html(page["html"], url)
            res.docs[url] = parsed
            # -- link_discovery (bfs_strategy.py:68-140) --
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            remaining = max_pages - res.pages_crawled
            if remaining <= 0:
                continue
            links = [l for l in parsed["links"] if l["internal"]]
            if include_external:
                links += [l for l in parsed["links"] if not l["internal"]]
            valid = []
            for link in links:
                raw = link["href"]
                cu = canonicalize(raw, url)
                if cu in visited:
                    continue
                if not _passes(raw, next_depth, filter_fn):
                    continue
                score = scorer_fn(cu) if scorer_fn else 0.0
                if score < score_threshold:
                    continue
                visited.add(cu)
                valid.append((cu, score))
            if len(valid) > remaining:
                if scorer_fn:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            for cu, score in valid:
                next_level.append((cu, url))
                depths[cu] = next_depth
        current_level = next_level
        level_no += 1

    res.seen = visited
    return res


def oracle_dfs(
    site: SyntheticWeb,
    start_urls: list[str],
    *,
    max_depth: int = 2,
    max_pages: float = math.inf,
    include_external: bool = False,
    filter_fn=None,
    scorer_fn=None,
    score_threshold: float = -math.inf,
) -> OracleResult:
    """LIFO depth-first traversal.

    NOTE: the reference's DFS (dfs_strategy.py:16-67) inherits BFS's
    link_discovery, which marks candidates visited at DISCOVERY time, while
    its pop loop skips visited URLs — as written it can never expand past
    the start URL. We implement the documented intent instead (the same
    stack semantics its docstring and stream mode describe): visited.add at
    pop, discovery validates/scores without marking, children pushed in
    reverse so the first-discovered link is crawled next.
    """
    res = OracleResult()
    visited: set[str] = set()
    stack: list[tuple[str, str, int]] = []
    for u in reversed(start_urls):
        cu = canonicalize(u, u)
        stack.append((cu, "", 0))
    seq = 0
    while stack and res.pages_crawled < max_pages:
        url, parent, depth = stack.pop()
        if url in visited or depth > max_depth:
            continue
        visited.add(url)
        page = site.page(url)
        success = page["status"] == 200
        res.order.append(
            {"url": url, "depth": depth, "parent": parent, "seq": seq,
             "level": -1, "success": success, "status": page["status"]}
        )
        seq += 1
        if not success:
            continue
        res.pages_crawled += 1
        parsed = parse_html(page["html"], url)
        res.docs[url] = parsed     # docs recorded for EVERY success (BFS law)
        if res.pages_crawled >= max_pages:
            break
        next_depth = depth + 1
        if next_depth > max_depth:
            continue
        links = [l for l in parsed["links"] if l["internal"]]
        if include_external:
            links += [l for l in parsed["links"] if not l["internal"]]
        valid = []
        for link in links:
            raw = link["href"]
            cu = canonicalize(raw, url)
            if cu in visited:
                continue
            if not _passes(raw, next_depth, filter_fn):
                continue
            score = scorer_fn(cu) if scorer_fn else 0.0
            if score < score_threshold:
                continue
            valid.append(cu)
        for cu in reversed(valid):
            stack.append((cu, url, next_depth))
    res.seen = visited
    return res


def oracle_best_first(
    site: SyntheticWeb,
    start_urls: list[str],
    *,
    max_depth: int = 2,
    max_pages: float = math.inf,
    include_external: bool = False,
    filter_fn=None,
    scorer_fn=None,
    batch_size: int = BFF_BATCH_SIZE,
) -> OracleResult:
    """Reference best-first (bff_strategy.py:129-213): heap of
    (score, depth, url, parent); lower score = higher priority."""
    import heapq

    res = OracleResult()
    visited: set[str] = set()
    depths: dict[str, int] = {}
    heap: list[tuple[float, int, str, str]] = []
    for u in start_urls:
        cu = canonicalize(u, u)
        depths[cu] = 0
        heapq.heappush(heap, (0.0, 0, cu, ""))
    seq = 0
    stop = False
    while heap and not stop and res.pages_crawled < max_pages:
        # reference quirk (bff_strategy.py:152-171): batch_size is computed
        # as min(BATCH_SIZE, remaining) but the pop loop iterates the full
        # BATCH_SIZE — a full batch is popped, marked visited and fetched
        # even when remaining < BATCH_SIZE; the yield loop then breaks at
        # the cap (counted, not reported). visited.add at POP time.
        batch = []
        for _ in range(batch_size):
            if not heap:
                break
            score, depth, url, parent = heapq.heappop(heap)
            if url in visited:
                continue
            visited.add(url)
            batch.append((score, depth, url, parent))
        if not batch:
            continue
        for score, depth, url, parent in batch:
            page = site.page(url)
            success = page["status"] == 200
            if success:
                res.pages_crawled += 1
                if res.pages_crawled >= max_pages:
                    # reference breaks BEFORE yielding: counted, not reported
                    stop = True
                    break
            res.order.append(
                {"url": url, "depth": depth, "parent": parent, "seq": seq,
                 "level": -1, "success": success, "status": page["status"],
                 "score": score}
            )
            seq += 1
            if not success:
                continue
            parsed = parse_html(page["html"], url)
            res.docs[url] = parsed
            # -- bff link_discovery (bff_strategy.py:77-126): no visited.add
            # here, no score threshold; scoring happens at push time --
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            remaining = max_pages - res.pages_crawled
            if remaining <= 0:
                continue
            links = [l for l in parsed["links"] if l["internal"]]
            if include_external:
                links += [l for l in parsed["links"] if not l["internal"]]
            valid = []
            for link in links:
                raw = link["href"]
                cu = canonicalize(raw, url)
                if cu in visited:
                    continue
                if not _passes(raw, next_depth, filter_fn):
                    continue
                valid.append(cu)
            if len(valid) > remaining:
                valid = valid[: int(remaining)]
            for cu in valid:
                depths[cu] = next_depth
                score2 = scorer_fn(cu) if scorer_fn else 0.0
                heapq.heappush(heap, (score2, next_depth, cu, url))
    res.seen = visited
    return res
