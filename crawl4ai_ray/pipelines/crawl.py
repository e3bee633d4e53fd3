"""The superstep crawl driver — BFS / best-first frontier loop on Ray Data.

Replaces the reference's in-process deep-crawl strategies
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:142-192,
bff_strategy.py:129-213) with a BSP-style loop of supersteps; each
superstep is a Ray Data pipeline:

    frontier (Arrow) → map_batches(Fetcher actor pool)
                     → map_batches(parse_html_batch)      [stateless tasks]
                     → write_parquet(documents/superstep=K)   [streaming]
    read_parquet(discovery columns only)                  [column-pruned]
                     → map_batches(candidate kernel: canonicalize /
                       validate / filter / score)          [distributed]
    compact candidate table → ordered dedup → sharded seen-set
    check_and_add → next frontier with deterministic seq.

The superstep loop is the BSP model (Valiant 1990) as used by Pregel
(Malewicz et al., SIGMOD 2010) for graph traversal; level-synchronous BFS
over the link graph is exactly a Pregel superstep per frontier wave.

Determinism / reference equality: candidate ordering is keyed by
(parent_seq, link_idx); level-local dedup keeps the minimum key, which is
exactly what the reference's sequential visited-probe produces; new ``seq``
values are ranks in that order. The final seen set and crawl order are
therefore independent of Ray's task scheduling.

Scale notes (explicitly designed for a 256-node / 10^10-URL frontier):
- Document payloads NEVER pass through the driver: fetch→parse→write is a
  streaming distributed pipeline, and discovery re-reads only the tiny
  (url, depth, seq, success, links) columns from the written parquet.
- The compact candidate/frontier rows (~100 B/row) are finalized
  driver-side here (ordered dedup + seq ranks). The production path for
  10^8-row levels is IMPLEMENTED in pipelines/discovery.py
  (range-partitioned sort + boundary-aware block dedup + distributed
  check_and_add + broadcast per-block seq offsets) and proven
  byte-equivalent to this driver algebra in
  tests/test_discovery_distributed.py; the driver version remains the
  default at sandbox scale where it is faster.
- Checkpoints are atomic per superstep (temp-dir + _COMMIT marker): next
  frontier, per-shard seen blobs (cuckoo + exact hashes), lineage row, and
  counters. Resume restores shard state and continues from the last
  committed superstep; document output dirs are superstep-keyed so reruns
  overwrite cleanly.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions import urlkit
from ..schemas import SPAN_STRUCT
from ..stages.fetch import SyntheticFetcher
from ..stages.parse import parse_html_batch
from ..state.seen import SeenSet

_ORDER_COLS = ["url", "depth", "parent", "seq", "success", "status",
               "fetch_ms", "parse_ms", "from_cache"]
_CAND_COLS = ["url", "url_hash", "host", "parent_seq", "link_idx",
              "source_depth", "passes", "score"]


def _table_to_struct(t: pa.Table) -> pa.StructArray:
    if t.num_rows == 0:
        return pa.array(
            [], type=pa.struct([pa.field(f.name, f.type) for f in t.schema])
        )
    return t.to_struct_array().combine_chunks()


def _sink_stage(batch: pa.Table, *, out_dir: str, max_depth: int,
                score_threshold: float, block_dedup: bool,
                cache_dir: str | None = None,
                drop_html: bool = False,
                cand_dir: str | None = None,
                order_dir: str | None = None,
                order_inline: bool = False,
                level_k: int = 0) -> pa.Table:
    """Task-side sink + combiner. Writes the full parsed batch as one
    parquet part (resumable superstep-partitioned output), then returns ONE
    row holding two nested lists: the compact order rows and the
    pre-reduced candidate rows.

    The candidate combiner applies the deterministic gates early — depth
    (source_depth+1 <= max_depth), validity/filter (``passes``), score
    threshold — and, for BFS, a block-local keep-min-(parent_seq,link_idx)
    dedup per canonical URL (min of block minima == global min, so this is
    an exact partial of the driver's level dedup). On the deepest BFS level
    this drops ~all candidates inside the tasks instead of shipping
    millions of rows to the driver. ``n_filtered`` preserves the lineage
    count. Best-first must NOT block-dedup (duplicate queue entries consume
    pop slots in the reference)."""
    import uuid

    import pyarrow.compute as pc

    if cache_dir and batch.num_rows and "html" in batch.column_names:
        from ..state.cache import CacheStore

        fresh = batch.filter(
            pc.and_(pc.invert(batch.column("from_cache")),
                    batch.column("success"))
        )
        CacheStore(cache_dir).append_batch(fresh)
    if drop_html and "html" in batch.column_names:
        batch = batch.drop_columns(["html"])
    if batch.num_rows:
        # the cand column is internal discovery state — documents on disk
        # carry spans/links/markdown, not the frontier plumbing.
        # Part names are DETERMINISTIC (first seq of the batch — unique
        # within a superstep since frontier blocks are disjoint seq
        # slices) and the write goes through an atomic rename: a Ray task
        # retry overwrites its own part instead of duplicating rows
        # (code-review r2).
        first_seq = batch.column("seq")[0].as_py()
        final = os.path.join(out_dir, f"part-{first_seq:012d}.parquet")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(batch.drop_columns(["cand"]), tmp)
        os.replace(tmp, final)
    order_struct = _table_to_struct(batch.select(_ORDER_COLS))

    cand_list = batch.column("cand").combine_chunks()
    parent_idx = pc.list_parent_indices(cand_list)
    flat = pc.list_flatten(cand_list)
    cand = pa.table(
        {
            "url": flat.field("url"),
            "url_hash": flat.field("url_hash"),
            "host": flat.field("host"),
            "parent_seq": pc.take(batch.column("seq"), parent_idx),
            "link_idx": flat.field("link_idx"),
            "source_depth": pc.take(batch.column("depth"), parent_idx),
            "passes": flat.field("passes"),
            "score": flat.field("score"),
        }
    )
    n0 = cand.num_rows
    cand = cand.filter(
        pc.less_equal(pc.add(cand.column("source_depth"), 1), max_depth)
    )
    n_depth_ok = cand.num_rows
    keep = cand.column("passes")
    if score_threshold != -math.inf:
        keep = pc.and_(keep,
                       pc.greater_equal(cand.column("score"),
                                        pa.scalar(score_threshold,
                                                  type=pa.float32())))
    cand = cand.filter(keep)
    n_filtered = n_depth_ok - cand.num_rows
    if block_dedup and cand.num_rows:
        import polars as pl

        cdf = pl.from_arrow(cand)
        cand = (
            cdf.sort(["parent_seq", "link_idx"], maintain_order=True)
            .unique(subset=["url"], keep="first", maintain_order=True)
            .to_arrow()
            .cast(cand.schema)
        )
    if cand_dir is not None:
        # frontier-table mode: candidate + order rows are written to
        # parquet TASK-SIDE (same deterministic part name + atomic-rename
        # law as the documents write) and only tiny counters return to the
        # driver — frontier data never transits driver heap.
        first_seq = batch.column("seq")[0].as_py() if batch.num_rows else 0
        if cand.num_rows:
            final = os.path.join(cand_dir,
                                 f"part-{first_seq:012d}.parquet")
            tmp = final + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(cand, tmp)
            os.replace(tmp, final)
        if order_dir is not None and batch.num_rows:
            order_tbl = batch.select(_ORDER_COLS).append_column(
                "level", pa.array([level_k] * batch.num_rows,
                                  type=pa.int64()))
            final = os.path.join(order_dir,
                                 f"part-{first_seq:012d}.parquet")
            tmp = final + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(order_tbl, tmp)
            os.replace(tmp, final)
        n_success = int(
            pc.sum(batch.column("success")).as_py() or 0
        ) if batch.num_rows else 0
        fetch_ms = float(
            pc.sum(batch.column("fetch_ms")).as_py() or 0.0
        ) if batch.num_rows else 0.0
        parse_ms = float(
            pc.sum(batch.column("parse_ms")).as_py() or 0.0
        ) if batch.num_rows else 0.0
        cols = {
            "n_rows": pa.array([batch.num_rows], type=pa.int64()),
            "n_success": pa.array([n_success], type=pa.int64()),
            "n_filtered": pa.array([n_filtered], type=pa.int64()),
            "fetch_ms_sum": pa.array([fetch_ms], type=pa.float64()),
            "parse_ms_sum": pa.array([parse_ms], type=pa.float64()),
        }
        if order_inline:
            # best-first table mode: the pop batch is bounded by
            # bff_batch_size, so its order rows return inline (the driver
            # needs them for the streaming max_pages cap law) while the
            # unbounded candidate rows stay task-side in cand_dir.
            order_struct = _table_to_struct(batch.select(_ORDER_COLS))
            cols["order"] = pa.ListArray.from_arrays(
                pa.array([0, len(order_struct)], type=pa.int32()),
                order_struct,
            )
        return pa.table(cols)

    cand_struct = _table_to_struct(cand)

    def wrap(values):
        return pa.ListArray.from_arrays(
            pa.array([0, len(values)], type=pa.int32()), values
        )

    return pa.table(
        {
            "order": wrap(order_struct),
            "cand": wrap(cand_struct),
            "n_filtered": pa.array([n_filtered], type=pa.int64()),
        }
    )


@dataclass
class CrawlConfig:
    strategy: str = "bfs"                 # 'bfs' | 'best_first'
    max_depth: int = 3
    max_pages: float = math.inf
    include_external: bool = False
    score_threshold: float = -math.inf    # BFS only (reference has none in bff)
    bff_batch_size: int = 10              # reference BATCH_SIZE (bff_strategy.py:19)
    n_seen_shards: int = 4
    seen_capacity_per_shard: int = 1 << 16
    fetch_concurrency: int = 4
    fetch_batch_size: int = 64
    parse_batch_size: int = 64
    keep_html: bool = False
    image_score_threshold: int = 3
    checkpoint_dir: str | None = None     # enables checkpoint/resume
    out_dir: str = "/tmp/crawl4ai_ray_out"
    simulate_latency: bool = False
    # politeness / robots (BSP token buckets — state.politeness). When on,
    # BFS level purity yields to per-host budgets: over-budget rows defer
    # to the next superstep with seq unchanged (ordering-stable deferral),
    # so frontier levels may mix depths — the same reordering the
    # reference's dispatcher rate-limiter causes.
    politeness: bool = False
    politeness_partitions: int = 2
    superstep_seconds: float = 4.0        # virtual seconds per superstep
    politeness_jitter: bool = False       # deterministic by default
    base_delay: tuple = (1.0, 3.0)
    check_robots: bool = True
    # fetch cache (S8 CacheMode semantics — state.cache): 'enabled' |
    # 'disabled' | 'read_only' | 'write_only' | 'bypass'
    cache_dir: str | None = None
    cache_mode: str = "bypass"
    # emit an additional ``markdown_compat`` document column rendered by
    # the html2text-fidelity converter (byte-compatible with the
    # reference's raw_markdown; ~doubles parse cost — off by default)
    compat_markdown: bool = False
    # distributed discovery (pipelines/discovery.py): levels with at least
    # this many filtered candidates run level-dedup + seen-check + seq
    # assignment as a Ray Data pipeline instead of driver polars (byte-
    # equivalent — tests/test_discovery_distributed.py). Only engaged when
    # max_pages is unlimited (capacity truncation is a driver-side law).
    # None disables; 0 forces it for every level. Default = measured
    # crossover: at ≤1M candidates/level the vectorized polars path wins
    # (2.5x bench site, 32 cpus: 98.5s driver vs 147s distributed — the
    # distributed path's two sorts + materializations per level only pay
    # off when a level cannot be driver-resident at all).
    distributed_discovery_min_candidates: int | None = 2_000_000
    # frontier-table mode (BFS only): the frontier lives as parquet
    # between supersteps; candidates and crawl-order rows are written
    # task-side, discovery runs fully distributed, and parents attach via
    # a seq-keyed Dataset.join — the driver holds ONLY per-superstep
    # counters. 'driver' (default) keeps the measured-faster small-scale
    # path; 'table' is the 10^8-row/level path (bench: BENCH_FRONTIER).
    frontier_mode: str = "driver"         # 'driver' | 'table' | 'auto'
    # 'auto' resolution threshold: expected crawl size (max_pages when
    # finite, else unbounded) at or above which 'auto' picks the
    # frontier-table path. Default = the measured crossover band: the
    # driver path won 2.3x at ~180k-page levels while table mode was the
    # fastest configuration at 433k-page levels (BASELINE.md r3); table
    # cost is per-LEVEL, so an unbounded crawl (the 100-TB shape) always
    # resolves to 'table' — a small crawl states its bound via max_pages.
    frontier_auto_min_pages: int = 1_000_000
    # M24 link preview (stages/linkpreview.py): when set (LinkPreviewConfig
    # kwargs dict), the parse stage computes per-link head_data +
    # total_score and candidate scores BECOME the preview totals — a
    # best-first crawl then pops by total_score. Head fetches reuse the
    # task-local site cache (synthetic fetcher) inside the parse tasks.
    link_preview: dict | None = None
    # frontier-table mode: read the order parquet back into res.order at
    # the end of the run (API parity with driver mode). Disable at corpus
    # scale and consume res.order_dir instead.
    collect_order: bool = True
    # best-first frontier-table mode: compact the pool (rewrite live rows,
    # clear tombstones) once dead keys exceed max(this floor, live rows).
    # Tombstones are O(pages popped), so the floor only matters for tiny
    # crawls; tests lower it to exercise compaction.
    pool_compact_min: int = 1024
    # config-by-URL selection (reference async_configs.py:1145-1146,
    # 1380-1412 + async_dispatcher.py:101-125): when a LIST of configs is
    # passed to an arun_many-style entry, the first whose matcher accepts
    # the URL wins. None matches everything.
    url_matcher: object = None            # str glob | callable | list
    match_mode: object = None             # configkit.MatchMode (OR default)

    # -- dump/load/clone contract (reference async_configs.py:1546-1668) --

    def dump(self) -> dict:
        from ..functions import configkit

        return configkit.dump_config(self)

    @staticmethod
    def load(data: dict) -> "CrawlConfig":
        from ..functions import configkit

        return configkit.load_config(CrawlConfig, data)

    def clone(self, **kwargs) -> "CrawlConfig":
        from ..functions import configkit

        return configkit.clone_config(self, **kwargs)

    def is_match(self, url: str) -> bool:
        from ..functions import configkit

        return configkit.is_match(
            url, self.url_matcher,
            self.match_mode or configkit.MatchMode.OR)


from ..functions.configkit import register_config as _register_config  # noqa: E402

_register_config(CrawlConfig)


@dataclass
class CrawlRunResult:
    pages_crawled: int = 0
    supersteps: int = 0
    seen_size: int = 0
    docs_dir: str = ""
    lineage: list = field(default_factory=list)
    urls_fetched: int = 0
    wall_sec: float = 0.0
    seen_hashes: np.ndarray | None = None   # sorted uint64 (oracle comparison)
    order_dir: str = ""                     # frontier-table mode: order parquet root
    # crawl order accumulates as segments — python dict lists for small
    # strategies (bff/dfs/politeness rows) and Arrow tables for BFS levels
    # (a 190k-row level stays columnar; ``order`` materializes lazily so
    # throughput paths that only read counters never pay the conversion)
    _order_segments: list = field(default_factory=list)
    _order_cache: list | None = None

    def add_order_rows(self, rows: list) -> None:
        if rows:
            self._order_segments.append(("rows", rows))
            self._order_cache = None

    def add_order_table(self, tbl, level: int) -> None:
        if tbl is not None and tbl.num_rows:
            self._order_segments.append(("table", tbl, level))
            self._order_cache = None

    @property
    def order(self) -> list:
        if self._order_cache is None:
            out: list = []
            for seg in self._order_segments:
                if seg[0] == "rows":
                    out.extend(seg[1])
                else:
                    _, tbl, level = seg
                    rows = tbl.to_pylist()
                    for r in rows:
                        r["level"] = level
                    out.extend(rows)
            self._order_cache = out
        return self._order_cache

    @order.setter
    def order(self, rows: list) -> None:
        self._order_segments = [("rows", list(rows))]
        self._order_cache = None


# ---------------------------------------------------------------------------
# Per-batch kernels (run distributed inside map_batches)
# ---------------------------------------------------------------------------


_CAND_STRUCT = pa.struct(
    [
        pa.field("url", pa.string()),       # canonical
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("link_idx", pa.int32()),
        pa.field("passes", pa.bool_()),
        pa.field("score", pa.float32()),
    ]
)


_CAND_MEMO: dict[str, tuple] = {}


def _cand_ident(raw: str, base: str) -> tuple:
    """(canon, url_hash, host, is_valid) for one candidate href.

    The parser emits absolute hrefs, whose identity is independent of the
    page — and nav links repeat on every page of a host, so this memo
    turns the per-link canonicalize/blake2b/host string work (the
    measured memory-bandwidth term of the parse stage at sustained
    32-way) into one dict hit per repeated link per worker. Relative
    hrefs (never produced by the parser, kept for direct callers) bypass
    the memo. Capped; user filter/scorer hooks stay outside."""
    absolute = raw.startswith(("http://", "https://"))
    if absolute:
        ent = _CAND_MEMO.get(raw)
        if ent is not None:
            return ent
    canon = urlkit.canonicalize(raw, base)
    ent = (
        canon,
        urlkit.hash64(canon) if canon is not None else 0,
        urlkit.host_of(canon) if canon is not None else "",
        urlkit.is_valid_crawl_url(raw),
    )
    if absolute and len(_CAND_MEMO) < 200_000:
        _CAND_MEMO[raw] = ent
    return ent


def _parse_stage(batch: pa.Table, *, image_score_threshold: int,
                 keep_html: bool, include_external: bool = False,
                 filter_fn=None, scorer_fn=None,
                 compat_markdown: bool = False,
                 link_preview_cfg: dict | None = None,
                 link_preview_site: dict | None = None) -> pa.Table:
    """Fetch output → parsed docs + per-page candidate list.

    Candidate extraction (canonicalize / validate / filter / score — the
    reference's link_discovery per-link work, bfs_strategy.py:100-121) is
    fused here so the discovery step needs ONE column-pruned read-back and
    zero extra distributed passes per superstep."""
    t0 = time.perf_counter()
    out = parse_html_batch(batch, image_score_threshold=image_score_threshold)
    if compat_markdown:
        # html2text-fidelity markdown column (byte-compatible with the
        # reference converter — functions/md_compat.py); the fast span
        # converter's ``markdown`` column stays for the engine's own laws
        from ..functions.md_compat import html_to_markdown_compat

        compat = [
            html_to_markdown_compat(h, u) if ok else ""
            for h, u, ok in zip(batch.column("html").to_pylist(),
                                batch.column("url").to_pylist(),
                                out.column("success").to_pylist())
        ]
        out = out.append_column("markdown_compat",
                                pa.array(compat, type=pa.large_string()))
    urls = out.column("url").to_pylist()
    succ = out.column("success").to_pylist()
    links_col = out.column("links").to_pylist()
    cand_col = []
    for url, ok, links in zip(urls, succ, links_col):
        cands = []
        if ok and links:
            ordered = [l for l in links if l["internal"]]
            if include_external:
                ordered += [l for l in links if not l["internal"]]
            totals = None
            if link_preview_cfg is not None:
                # M24: per-link head_data + total-score law
                # (stages/linkpreview.py) — candidate scores become the
                # preview total (intrinsic 70% / contextual 30%), so
                # best-first consumes total_score directly
                from ..stages.linkpreview import (
                    LinkPreviewConfig,
                    cached_head_stage,
                    preview_total_scores,
                )

                totals = preview_total_scores(
                    ordered, LinkPreviewConfig(**link_preview_cfg),
                    cached_head_stage(link_preview_site),
                    score_links=True,
                )
            for idx, link in enumerate(ordered):
                raw = link["href"]
                canon, uhash, host, ok_url = _cand_ident(raw, url)
                if canon is None:
                    continue
                if ok_url and filter_fn is not None and not filter_fn(raw):
                    ok_url = False
                if totals is not None:
                    score = totals.get(raw, 5.0)
                elif scorer_fn:
                    score = float(scorer_fn(canon))
                else:
                    score = 0.0
                cands.append(
                    {
                        "url": canon,
                        "url_hash": uhash,
                        "host": host,
                        "link_idx": idx,
                        "passes": ok_url,
                        "score": score,
                    }
                )
        cand_col.append(cands)
    out = out.append_column("cand", pa.array(cand_col,
                                             type=pa.list_(_CAND_STRUCT)))
    per_row = (time.perf_counter() - t0) * 1000.0 / max(1, out.num_rows)
    out = out.append_column(
        "parse_ms",
        pa.array(np.full(out.num_rows, per_row, dtype=np.float32),
                 type=pa.float32()),
    )
    if not keep_html:
        out = out.drop_columns(["html"])
    return out


def _cand_prep(batch: pa.Table) -> pa.Table:
    """Frontier-table mode: candidate parquet → discovery input schema
    (depth = source_depth + 1; sink already applied the depth/passes/score
    gates and the block dedup)."""
    import pyarrow.compute as pc

    return pa.table({
        "url": batch.column("url"),
        "url_hash": batch.column("url_hash"),
        "host": batch.column("host"),
        "depth": pc.add(batch.column("source_depth"),
                        pa.scalar(1, type=pa.int32())).cast(pa.int32()),
        "score": batch.column("score").cast(pa.float32()),
        "parent_seq": batch.column("parent_seq"),
        "link_idx": batch.column("link_idx"),
    })


def _prev_frontier_prep(batch: pa.Table) -> pa.Table:
    """Frontier-table mode: previous frontier (seq, url) → join side
    (parent_seq, parent) for the seq-keyed parent attach."""
    return pa.table({
        "parent_seq": batch.column("seq"),
        "parent": batch.column("url"),
    })


def _frontier_project(batch: pa.Table) -> pa.Table:
    """Frontier-table mode: join output → frontier parquet schema."""
    return pa.table({
        "url": batch.column("url"),
        "url_hash": batch.column("url_hash").cast(pa.uint64()),
        "host": batch.column("host"),
        "depth": batch.column("depth").cast(pa.int32()),
        "score": batch.column("score").cast(pa.float32()),
        "parent": batch.column("parent"),
        "seq": batch.column("seq").cast(pa.int64()),
    })


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


class CrawlEngine:
    def __init__(self, cfg: CrawlConfig, *, fetcher_cls=SyntheticFetcher,
                 fetcher_kwargs: dict | None = None, filter_fn=None,
                 scorer_fn=None, on_superstep=None):
        """``on_superstep(k, docs_dir, order_tbl)`` is the streaming hook:
        called after each superstep commits, with the superstep index, its
        documents directory, and the compact order table — the BSP-grain
        equivalent of the reference's ``stream=True`` async generator
        (async_webcrawler.py:750-761; within-superstep order is
        normalized by seq, SURVEY.md §2.9)."""
        self.cfg = cfg
        self.fetcher_cls = fetcher_cls
        self.fetcher_kwargs = dict(fetcher_kwargs or {})
        if fetcher_cls is SyntheticFetcher:
            self.fetcher_kwargs.setdefault("simulate_latency",
                                           cfg.simulate_latency)
        self.filter_fn = filter_fn
        self.scorer_fn = scorer_fn
        self.on_superstep = on_superstep

    # -- checkpoint helpers -------------------------------------------------

    def _ckpt_path(self, k: int) -> str:
        return os.path.join(self.cfg.checkpoint_dir, f"superstep={k:05d}")

    def _find_resume_point(self) -> int | None:
        d = self.cfg.checkpoint_dir
        if not d or not os.path.isdir(d):
            return None
        best = None
        for name in sorted(os.listdir(d)):
            if name.startswith("superstep=") and os.path.exists(
                os.path.join(d, name, "_COMMIT")
            ):
                best = int(name.split("=")[1])
        return best

    def _checkpoint(self, k: int, frontier: pa.Table, seen: SeenSet,
                    state: dict, lineage_rows: list) -> None:
        if not self.cfg.checkpoint_dir:
            return
        final = self._ckpt_path(k)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(frontier, os.path.join(tmp, "frontier.parquet"))
        blobs = seen.snapshot()
        seen_tbl = pa.table(
            {
                "shard": pa.array(range(len(blobs)), type=pa.int32()),
                "superstep": pa.array([k] * len(blobs), type=pa.int32()),
                "filter_blob": pa.array([b[0] for b in blobs],
                                        type=pa.large_binary()),
                "exact_hashes": pa.array([b[1] for b in blobs],
                                         type=pa.large_binary()),
            }
        )
        pq.write_table(seen_tbl, os.path.join(tmp, "seen.parquet"))
        if lineage_rows:
            pq.write_table(
                pa.Table.from_pylist(lineage_rows),
                os.path.join(tmp, "lineage.parquet"),
            )
        # order rows for THIS superstep only — per-superstep parquet, not a
        # cumulative blob (a cumulative state would grow O(n^2) over a run)
        step_order = state.pop("_step_order", None)
        if step_order:
            pq.write_table(
                pa.Table.from_pylist(step_order),
                os.path.join(tmp, "order.parquet"),
            )
        # best-first: politeness-deferred popped rows (already marked seen,
        # so they cannot be re-pooled — they must resume as deferred)
        deferred_tbl = state.pop("_deferred_tbl", None)
        if deferred_tbl is not None and deferred_tbl.num_rows:
            pq.write_table(deferred_tbl,
                           os.path.join(tmp, "deferred.parquet"))
        with open(os.path.join(tmp, "state.json"), "w") as f:
            json.dump(state, f)
        with open(os.path.join(tmp, "_COMMIT"), "w") as f:
            f.write("ok")
        os.rename(tmp, final)

    def _restore(self, k: int, seen: SeenSet):
        path = self._ckpt_path(k)
        frontier = pq.read_table(os.path.join(path, "frontier.parquet"))
        seen_tbl = pq.read_table(os.path.join(path, "seen.parquet"))
        blobs = list(
            zip(
                seen_tbl.column("filter_blob").to_pylist(),
                seen_tbl.column("exact_hashes").to_pylist(),
            )
        )
        seen.restore(blobs)
        with open(os.path.join(path, "state.json")) as f:
            state = json.load(f)
        dp = os.path.join(path, "deferred.parquet")
        if os.path.exists(dp):
            state["deferred_tbl"] = pq.read_table(dp)
        # rebuild crawl order from the per-superstep order parquets
        order: list[dict] = []
        for j in range(k + 1):
            p = os.path.join(self._ckpt_path(j), "order.parquet")
            if os.path.exists(p):
                order.extend(pq.read_table(p).to_pylist())
        state["order"] = order
        return frontier, state

    # -- shared superstep machinery -----------------------------------------

    def _setup_cache(self) -> None:
        """CacheMode read path: broadcast the store once per run."""
        from ..state.cache import CacheStore, should_read

        self._cache_ref = None
        cfg = self.cfg
        if cfg.cache_dir and should_read(cfg.cache_mode):
            store = CacheStore(cfg.cache_dir).load()
            if store:
                self._cache_ref = ray.put(store)

    def _fetch_parse_write(self, frontier, k: int,
                           docs_root: str, *,
                           cand_dir: str | None = None,
                           order_dir: str | None = None,
                           order_inline: bool = False,
                           n_frontier: int | None = None) -> str:
        """Distributed fetch→parse→write for one superstep; returns the
        superstep's documents dir. Payloads never touch the driver.

        ``frontier`` is a driver ``pa.Table`` (pre-sliced into
        ~fetch_batch_size blocks so the map operators get real
        parallelism — a single from_arrow block would serialize the whole
        level into one task) or an already-distributed Dataset
        (frontier-table mode; pass ``n_frontier`` for block sizing and
        ``cand_dir``/``order_dir`` so the sink writes frontier data
        task-side and returns only counters)."""
        cfg = self.cfg
        out_dir = os.path.join(docs_root, f"superstep={k:05d}")
        shutil.rmtree(out_dir, ignore_errors=True)
        n = n_frontier if n_frontier is not None else frontier.num_rows
        ncpu = int(ray.cluster_resources().get("CPU",
                                               cfg.fetch_concurrency))
        cap = 4 * max(ncpu, cfg.fetch_concurrency)
        want = (n + cfg.fetch_batch_size - 1) // cfg.fetch_batch_size
        # small levels still spread across every CPU (blocks of >=64 rows)
        # — ceil(n/batch_size) alone would run a 1000-row seed level in 2
        # tasks and serialize the whole superstep on a 32-CPU node
        floor_blocks = min(max(ncpu, cfg.fetch_concurrency),
                           (n + 63) // 64)
        n_blocks = max(1, min(max(want, floor_blocks), cap))
        if isinstance(frontier, rd.Dataset):
            ds = frontier
            n_slices = n_blocks
        else:
            per = (n + n_blocks - 1) // n_blocks
            slices = [frontier.slice(i * per, per) for i in range(n_blocks)
                      if i * per < n]
            n_slices = len(slices)
            ds = rd.from_arrow(slices)
        if self.fetcher_cls is SyntheticFetcher:
            # pure-function site → stateless tasks, no actor-pool spin-up
            from ..stages.fetch import make_task_fetcher

            ds = ds.map_batches(
                make_task_fetcher(
                    self.fetcher_kwargs.get("site_cfg") or {},
                    self.fetcher_kwargs.get("simulate_latency", False),
                    cache_ref=getattr(self, "_cache_ref", None),
                ),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            )
        else:
            fetch_conc = max(1, min(cfg.fetch_concurrency, n_slices))
            ds = ds.map_batches(
                self.fetcher_cls,
                fn_constructor_kwargs=self.fetcher_kwargs,
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=fetch_conc,
                num_cpus=1,
            )
        from ..state.cache import should_write as _cache_should_write

        cache_writing = bool(cfg.cache_dir) and _cache_should_write(
            cfg.cache_mode
        )
        ds = ds.map_batches(
            _parse_stage,
            fn_kwargs={
                "image_score_threshold": cfg.image_score_threshold,
                # keep html through to the sink when cache-writing; the
                # sink drops it from the documents output
                "keep_html": cfg.keep_html or cache_writing,
                "include_external": cfg.include_external,
                "filter_fn": self.filter_fn,
                "scorer_fn": self.scorer_fn,
                "compat_markdown": cfg.compat_markdown,
                "link_preview_cfg": cfg.link_preview,
                "link_preview_site":
                    self.fetcher_kwargs.get("site_cfg")
                    if cfg.link_preview is not None else None,
            },
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
        )
        # Task-side sink: each task writes its own parquet part and passes
        # only the compact discovery columns downstream — the whole
        # superstep is ONE pipeline execution, and document payloads never
        # reach the driver (write_parquet + re-read would cost a second
        # execution + a read per superstep).
        os.makedirs(out_dir, exist_ok=True)
        if cand_dir is not None:
            os.makedirs(cand_dir, exist_ok=True)
        if order_dir is not None:
            os.makedirs(order_dir, exist_ok=True)
        ds = ds.map_batches(
            _sink_stage,
            fn_kwargs={
                "out_dir": out_dir,
                "max_depth": cfg.max_depth,
                "score_threshold": (
                    cfg.score_threshold
                    if cfg.strategy in ("bfs", "dfs") else -math.inf
                ),
                "block_dedup": cfg.strategy == "bfs",
                "cache_dir": cfg.cache_dir if cache_writing else None,
                "drop_html": cache_writing and not cfg.keep_html,
                "cand_dir": cand_dir,
                "order_dir": order_dir,
                "order_inline": order_inline,
                "level_k": k,
            },
            batch_size=None,
            batch_format="pyarrow",
        )
        # single streaming execution (bare to_arrow_refs() would re-execute
        # the plan and duplicate the task-side parquet writes)
        compact = [
            b for b in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None)
            if b.num_rows
        ]
        return out_dir, compact

    @staticmethod
    def _flatten_wrapped(tables: list, col: str, cols: list[str]) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for t in tables:
            flat = pc.list_flatten(t.column(col).combine_chunks())
            if len(flat):
                parts.append(
                    pa.table({c: flat.field(c) for c in cols})
                )
        if not parts:
            return None
        return pa.concat_tables(parts).combine_chunks()

    def _read_superstep(self, compact: list):
        """Unpack the sink stage's wrapped (order, cand, n_filtered) rows.
        Candidates arrive pre-gated and (for BFS) block-deduped."""
        empty_cand = pa.table(
            {"url": pa.array([], pa.string()),
             "url_hash": pa.array([], pa.uint64()),
             "host": pa.array([], pa.string()),
             "parent_seq": pa.array([], pa.int64()),
             "link_idx": pa.array([], pa.int32()),
             "source_depth": pa.array([], pa.int32()),
             "passes": pa.array([], pa.bool_()),
             "score": pa.array([], pa.float32())}
        )
        if not compact:
            return None, empty_cand, 0
        order_tbl = self._flatten_wrapped(compact, "order", _ORDER_COLS)
        if order_tbl is not None:
            order_tbl = order_tbl.sort_by("seq")
        cand = self._flatten_wrapped(compact, "cand", _CAND_COLS)
        if cand is None:
            cand = empty_cand
        n_filtered = sum(
            int(v)
            for t in compact
            for v in t.column("n_filtered").to_pylist()
        )
        return order_tbl, cand, n_filtered

    @staticmethod
    def _order_rows_list(order_tbl, k: int) -> list[dict]:
        """Materialize an order table to python rows (small strategies)."""
        if order_tbl is None:
            return []
        rows = order_tbl.to_pylist()
        for r in rows:
            r["level"] = k
        return rows

    # -- public entry -------------------------------------------------------

    def _resolved_frontier_mode(self) -> str:
        """'auto' resolution (the same size-gate law as distributed
        discovery's 2M threshold and PageRank's 2M-edge crossover):
        expected crawl size = max_pages when finite, else unbounded.
        Below ``frontier_auto_min_pages`` the driver path is measured
        faster (its per-page cost beats table mode's fixed per-level
        cost); at or above it — including every unbounded crawl — the
        parquet frontier keeps levels off the driver. Byte-equal either
        way (tests/test_frontier_table.py)."""
        mode = self.cfg.frontier_mode
        if mode != "auto":
            return mode
        if self.cfg.politeness:
            # table mode does not compose with politeness; auto must not
            # resolve into the explicit-mode error path
            return "driver"
        expected = self.cfg.max_pages
        return "table" if expected >= self.cfg.frontier_auto_min_pages \
            else "driver"

    def run(self, seed_urls: list[str], *, resume: bool = False) -> CrawlRunResult:
        fmode = self._resolved_frontier_mode()
        if self.cfg.strategy == "bfs":
            if fmode == "table":
                return self._run_bfs_table(seed_urls, resume=resume)
            return self._run_bfs(seed_urls, resume=resume)
        if self.cfg.strategy == "best_first":
            if fmode == "table":
                return self._run_best_first_table(seed_urls, resume=resume)
            return self._run_best_first(seed_urls, resume=resume)
        if self.cfg.strategy == "dfs":
            return self._run_dfs(seed_urls)
        raise ValueError(f"unknown strategy {self.cfg.strategy}")

    # -- DFS ----------------------------------------------------------------

    def _run_dfs(self, seed_urls: list[str]) -> CrawlRunResult:
        """LIFO depth-first traversal (see oracle.oracle_dfs for the
        reference-divergence note — we implement the documented intent,
        visited-at-pop). DFS order is a serial constraint, so supersteps
        are single-URL; checkpointing is not wired for DFS yet (the stack
        is driver state — a frontier-table serialization would add it)."""
        cfg = self.cfg
        t_start = time.perf_counter()
        res = CrawlRunResult()
        docs_root = os.path.join(cfg.out_dir, "documents")
        os.makedirs(docs_root, exist_ok=True)
        self._setup_cache()
        seen = SeenSet(cfg.n_seen_shards, cfg.seen_capacity_per_shard)
        import polars as pl

        stack: list[tuple[str, str, int]] = []
        for u in reversed(seed_urls):
            cu = urlkit.canonicalize(u, u)
            if cu:
                stack.append((cu, "", 0))
        seq = 0
        k = 0
        pages_crawled = 0
        while stack and pages_crawled < cfg.max_pages:
            url, parent, depth = stack.pop()
            if depth > cfg.max_depth:
                continue
            dup = seen.check_and_add(
                np.array([urlkit.hash64(url)], dtype=np.uint64)
            )
            if dup[0]:
                continue
            frontier = pa.table(
                {
                    "url": pa.array([url], type=pa.string()),
                    "url_hash": pa.array([urlkit.hash64(url)],
                                         type=pa.uint64()),
                    "host": pa.array([urlkit.host_of(url)], type=pa.string()),
                    "depth": pa.array([depth], type=pa.int32()),
                    "score": pa.array([0.0], type=pa.float32()),
                    "parent": pa.array([parent], type=pa.string()),
                    "seq": pa.array([seq], type=pa.int64()),
                }
            )
            _, compact = self._fetch_parse_write(frontier, k, docs_root)
            order_tbl, cand, n_prefiltered = \
                self._read_superstep(compact)
            order_rows = self._order_rows_list(order_tbl, k)
            res.add_order_rows(order_rows)
            res.urls_fetched += len(order_rows)
            seq += 1
            k += 1
            success = order_rows and order_rows[0]["success"]
            if not success:
                continue
            pages_crawled += 1
            if pages_crawled >= cfg.max_pages:
                break
            next_depth = depth + 1
            if next_depth > cfg.max_depth or cand.num_rows == 0:
                continue
            cdf = pl.from_arrow(cand).filter(pl.col("passes"))
            if cfg.score_threshold != -math.inf:
                cdf = cdf.filter(pl.col("score") >= cfg.score_threshold)
            cdf = cdf.sort("link_idx", maintain_order=True)
            if cdf.height:
                vis = seen.contains(
                    cdf["url_hash"].to_numpy().astype(np.uint64)
                )
                urls_new = [
                    u for u, v in zip(cdf["url"].to_list(), vis) if not v
                ]
                for cu in reversed(urls_new):
                    stack.append((cu, url, next_depth))

        res.pages_crawled = pages_crawled
        res.supersteps = k
        res.seen_size = seen.size()
        res.seen_hashes = np.sort(
            np.concatenate(
                [np.frombuffer(eb, dtype=np.uint64)
                 for _, eb in seen.snapshot()]
                or [np.zeros(0, dtype=np.uint64)]
            )
        )
        res.docs_dir = docs_root
        res.wall_sec = time.perf_counter() - t_start
        seen.kill()
        return res

    # -- BFS ----------------------------------------------------------------

    def _seed_frontier(self, seed_urls: list[str], seen: SeenSet) -> pa.Table:
        canon, seen_local = [], set()
        for u in seed_urls:
            cu = urlkit.canonicalize(u, u)
            if cu and cu not in seen_local:
                seen_local.add(cu)
                canon.append(cu)
        hashes = urlkit.hash64_batch(canon)
        dup = seen.check_and_add(hashes)
        canon = [c for c, d in zip(canon, dup) if not d]
        hashes = hashes[~dup]
        n = len(canon)
        return pa.table(
            {
                "url": pa.array(canon, type=pa.string()),
                "url_hash": pa.array(hashes),
                "host": pa.array([urlkit.host_of(c) for c in canon],
                                 type=pa.string()),
                "depth": pa.array([0] * n, type=pa.int32()),
                "score": pa.array([0.0] * n, type=pa.float32()),
                "parent": pa.array([""] * n, type=pa.string()),
                "seq": pa.array(range(n), type=pa.int64()),
            }
        )

    def _run_bfs(self, seed_urls: list[str], *, resume: bool) -> CrawlRunResult:
        cfg = self.cfg
        t_start = time.perf_counter()
        res = CrawlRunResult()
        docs_root = os.path.join(cfg.out_dir, "documents")
        self._setup_cache()
        seen = SeenSet(cfg.n_seen_shards, cfg.seen_capacity_per_shard)
        pages_crawled = 0
        next_seq = 0
        k = 0
        frontier = None
        lineage_all: list = []

        saved_gate = None
        if resume:
            rk = self._find_resume_point()
            if rk is not None:
                frontier, state = self._restore(rk, seen)
                pages_crawled = state["pages_crawled"]
                next_seq = state["next_seq"]
                k = rk + 1
                res.order = state.get("order", [])
                res.urls_fetched = len(res.order)
                saved_gate = state.get("gate")
        if frontier is None:
            os.makedirs(docs_root, exist_ok=True)
            frontier = self._seed_frontier(seed_urls, seen)
            next_seq = frontier.num_rows

        gate = None
        if cfg.politeness:
            from ..state.politeness import PolitenessGate

            gate = PolitenessGate(
                cfg.politeness_partitions,
                base_delay=cfg.base_delay,
                superstep_seconds=cfg.superstep_seconds,
                jitter=cfg.politeness_jitter,
            )
            if saved_gate:
                gate.restore(saved_gate)

        while frontier.num_rows and pages_crawled < cfg.max_pages:
            deferred = frontier.slice(0, 0)
            blocked_rows: list[dict] = []
            n_blocked = 0
            if gate is not None:
                frontier, deferred, blocked_rows = self._politeness_split(
                    frontier, gate, k
                )
                n_blocked = len(blocked_rows)
                res.add_order_rows(blocked_rows)
                res.urls_fetched += n_blocked
                if frontier.num_rows == 0:
                    # everything deferred/blocked this round
                    frontier = deferred
                    k += 1
                    if n_blocked == 0 and deferred.num_rows == 0:
                        break
                    continue
            # skew observability: per-superstep hot-host histogram (top 5).
            # Fetch/parse blocks are seq-sliced so a hot host cannot skew
            # task runtimes; this histogram is the signal a cluster
            # deployment uses to salt politeness partitions.
            host_top = dict(
                sorted(
                    (
                        (r["host"], r["host_count"])
                        for r in frontier.select(["host"])
                        .group_by("host")
                        .aggregate([("host", "count")])
                        .rename_columns(["host", "host_count"])
                        .to_pylist()
                    ),
                    key=lambda kv: -kv[1],
                )[:5]
            )
            docs_dir, compact = self._fetch_parse_write(frontier, k,
                                                        docs_root)
            order_tbl, cand, n_prefiltered = self._read_superstep(compact)
            import pyarrow.compute as pc

            n_rows = order_tbl.num_rows if order_tbl is not None else 0
            if self.on_superstep is not None:
                self.on_superstep(k, docs_dir, order_tbl)
            res.add_order_table(order_tbl, k)
            res.urls_fetched += n_rows
            n_success = (
                int(pc.sum(order_tbl.column("success")).as_py() or 0)
                if n_rows else 0
            )
            pages_crawled += n_success
            if gate is not None and n_rows:
                by_host: dict[str, list[int]] = {}
                for u, st_ in zip(order_tbl.column("url").to_pylist(),
                                  order_tbl.column("status").to_pylist()):
                    by_host.setdefault(urlkit.host_of(u), []).append(int(st_))
                gate.report(by_host)
            frontier, n_new, lineage = self._next_frontier_bfs(
                cand, frontier, seen, pages_crawled, next_seq, k
            )
            if deferred.num_rows:
                frontier = pa.concat_tables(
                    [deferred, frontier]
                ).sort_by("seq")
            next_seq += n_new
            lineage[0]["frontier_in"] = n_rows
            lineage[0]["fetched"] = n_success
            lineage[0]["deferred"] = deferred.num_rows
            lineage[0]["skipped_filtered"] += n_blocked + n_prefiltered
            lineage[0]["host_top"] = json.dumps(host_top)
            if n_rows:
                lineage[0]["fetch_ms_sum"] = float(
                    pc.sum(order_tbl.column("fetch_ms")).as_py() or 0.0
                )
                lineage[0]["parse_ms_sum"] = float(
                    pc.sum(order_tbl.column("parse_ms")).as_py() or 0.0
                )
            lineage_all.extend(lineage)
            if cfg.checkpoint_dir:
                # checkpointing pays the row materialization; the hot
                # non-checkpointed path never does
                state = {
                    "pages_crawled": pages_crawled,
                    "next_seq": next_seq,
                    "strategy": "bfs",
                    "_step_order": blocked_rows
                    + self._order_rows_list(order_tbl, k),
                }
                if gate is not None:
                    # politeness/robots state is part of the checkpoint
                    # (token delays, fail counts, robots rules per host)
                    state["gate"] = gate.snapshot()
                self._checkpoint(k, frontier, seen, state, lineage)
            k += 1

        res.pages_crawled = pages_crawled
        res.supersteps = k
        res.seen_size = seen.size()
        res.seen_hashes = np.sort(
            np.concatenate(
                [np.frombuffer(eb, dtype=np.uint64)
                 for _, eb in seen.snapshot()]
                or [np.zeros(0, dtype=np.uint64)]
            )
        )
        res.docs_dir = docs_root
        res.lineage = lineage_all
        res.wall_sec = time.perf_counter() - t_start
        seen.kill()
        if gate is not None:
            gate.kill()
        return res

    # -- BFS, frontier-table mode -------------------------------------------

    @staticmethod
    def _frontier_dir(root: str, k: int) -> str:
        return os.path.join(root, f"superstep={k:05d}")

    def _checkpoint_table(self, k: int, seen: SeenSet, state: dict,
                          extra_tables: dict | None = None) -> None:
        """Frontier-table checkpoint: seen snapshot + counters only — the
        frontier/order/cand parquet for every superstep is already on disk
        under out_dir (written task-side), so the checkpoint never copies
        frontier data through the driver."""
        if not self.cfg.checkpoint_dir:
            return
        final = self._ckpt_path(k)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        blobs = seen.snapshot()
        seen_tbl = pa.table(
            {
                "shard": pa.array(range(len(blobs)), type=pa.int32()),
                "superstep": pa.array([k] * len(blobs), type=pa.int32()),
                "filter_blob": pa.array([b[0] for b in blobs],
                                        type=pa.large_binary()),
                "exact_hashes": pa.array([b[1] for b in blobs],
                                         type=pa.large_binary()),
            }
        )
        pq.write_table(seen_tbl, os.path.join(tmp, "seen.parquet"))
        for name, tbl in (extra_tables or {}).items():
            pq.write_table(tbl, os.path.join(tmp, f"{name}.parquet"))
        with open(os.path.join(tmp, "state.json"), "w") as f:
            json.dump(state, f)
        with open(os.path.join(tmp, "_COMMIT"), "w") as f:
            f.write("ok")
        os.rename(tmp, final)

    def _restore_table(self, k: int, seen: SeenSet) -> dict:
        path = self._ckpt_path(k)
        seen_tbl = pq.read_table(os.path.join(path, "seen.parquet"))
        seen.restore(list(zip(
            seen_tbl.column("filter_blob").to_pylist(),
            seen_tbl.column("exact_hashes").to_pylist(),
        )))
        with open(os.path.join(path, "state.json")) as f:
            return json.load(f)

    def _run_bfs_table(self, seed_urls: list[str], *,
                       resume: bool = False) -> CrawlRunResult:
        """BFS with the frontier held as parquet between supersteps — the
        driver-free data path (SURVEY §1.1's frontier-table design):

        - the sink writes candidates + order rows to parquet task-side and
          returns one counter row per block;
        - discovery reads the candidate parquet as a Dataset and runs the
          distributed dedup/seen/capacity/seq algebra
          (pipelines/discovery.py) end to end;
        - parent URLs attach via a seq-keyed Dataset.join against the
          previous frontier parquet (no driver parent dict);
        - the next frontier is written straight back to parquet.

        Driver state per superstep: counters + per-block metadata. Crawl
        output is byte-identical to driver mode
        (tests/test_frontier_table.py). The politeness gate is driver-mode
        only for now (its budget split is a driver law)."""
        from .dedup import _join_parts
        from .discovery import next_frontier_distributed

        cfg = self.cfg
        if cfg.politeness:
            raise ValueError(
                "frontier_mode='table' does not compose with politeness "
                "(use frontier_mode='driver')")
        t_start = time.perf_counter()
        res = CrawlRunResult()
        docs_root = os.path.join(cfg.out_dir, "documents")
        frontier_root = os.path.join(cfg.out_dir, "frontier")
        cand_root = os.path.join(cfg.out_dir, "cand")
        order_root = os.path.join(cfg.out_dir, "order")
        res.order_dir = order_root
        self._setup_cache()
        seen = SeenSet(cfg.n_seen_shards, cfg.seen_capacity_per_shard)
        pages_crawled, next_seq, k = 0, 0, 0
        n_frontier: int | None = None
        lineage_all: list = []

        if resume:
            rk = self._find_resume_point()
            if rk is not None:
                state = self._restore_table(rk, seen)
                pages_crawled = state["pages_crawled"]
                next_seq = state["next_seq"]
                n_frontier = state["n_frontier"]
                k = rk + 1
        if n_frontier is None:
            os.makedirs(docs_root, exist_ok=True)
            seed_tbl = self._seed_frontier(seed_urls, seen)
            next_seq = n_frontier = seed_tbl.num_rows
            fdir = self._frontier_dir(frontier_root, 0)
            shutil.rmtree(fdir, ignore_errors=True)
            os.makedirs(fdir, exist_ok=True)
            pq.write_table(seed_tbl,
                           os.path.join(fdir, "part-000000000000.parquet"))

        ncpu = int(ray.cluster_resources().get("CPU",
                                               cfg.fetch_concurrency))
        while n_frontier and pages_crawled < cfg.max_pages:
            fdir = self._frontier_dir(frontier_root, k)
            n_blocks = max(1, min(
                (n_frontier + cfg.fetch_batch_size - 1)
                // cfg.fetch_batch_size,
                4 * max(ncpu, cfg.fetch_concurrency)))
            fr_ds = rd.read_parquet(fdir, override_num_blocks=n_blocks)
            cand_dir = os.path.join(cand_root, f"superstep={k:05d}")
            order_dir = os.path.join(order_root, f"superstep={k:05d}")
            shutil.rmtree(cand_dir, ignore_errors=True)
            shutil.rmtree(order_dir, ignore_errors=True)
            docs_dir, stats = self._fetch_parse_write(
                fr_ds, k, docs_root, cand_dir=cand_dir,
                order_dir=order_dir, n_frontier=n_frontier)
            n_rows = sum(int(v) for t in stats
                         for v in t.column("n_rows").to_pylist())
            n_success = sum(int(v) for t in stats
                            for v in t.column("n_success").to_pylist())
            n_prefiltered = sum(int(v) for t in stats
                                for v in t.column("n_filtered").to_pylist())
            fetch_ms = sum(float(v) for t in stats
                           for v in t.column("fetch_ms_sum").to_pylist())
            parse_ms = sum(float(v) for t in stats
                           for v in t.column("parse_ms_sum").to_pylist())
            pages_crawled += n_success
            res.urls_fetched += n_rows
            if self.on_superstep is not None:
                # hook opt-in materializes THIS superstep's order table
                otbl = (pq.read_table(order_dir).sort_by("seq")
                        if os.path.isdir(order_dir)
                        and os.listdir(order_dir) else None)
                self.on_superstep(k, docs_dir, otbl)
            lineage = [{
                "superstep": k, "partition": 0, "frontier_in": n_rows,
                "fetched": n_success, "skipped_seen": 0,
                "skipped_filtered": n_prefiltered, "deferred": 0,
                "discovered": 0, "fetch_ms_sum": fetch_ms,
                "parse_ms_sum": parse_ms,
            }]
            remaining = cfg.max_pages - pages_crawled
            have_cands = os.path.isdir(cand_dir) and any(
                f.endswith(".parquet") for f in os.listdir(cand_dir))
            n_new = 0
            if remaining > 0 and have_cands:
                cand_ds = rd.read_parquet(
                    cand_dir,
                    columns=["url", "url_hash", "host", "source_depth",
                             "score", "parent_seq", "link_idx"],
                ).map_batches(_cand_prep, batch_format="pyarrow")
                assigned, dstats = next_frontier_distributed(
                    cand_ds, seen, next_seq, with_stats=True,
                    remaining=remaining,
                    use_score_order=self.scorer_fn is not None,
                    as_dataset=True,
                )
                lineage[0]["skipped_seen"] = dstats["skipped_seen"]
                n_new = dstats.get("n_new", 0)
                if n_new:
                    prev = rd.read_parquet(
                        fdir, columns=["seq", "url"]
                    ).map_batches(_prev_frontier_prep,
                                  batch_format="pyarrow")
                    joined = assigned.join(
                        prev, "inner",
                        num_partitions=_join_parts(assigned, prev),
                        on=("parent_seq",),
                    )
                    nfdir = self._frontier_dir(frontier_root, k + 1)
                    shutil.rmtree(nfdir, ignore_errors=True)
                    joined.map_batches(
                        _frontier_project, batch_format="pyarrow"
                    ).write_parquet(nfdir)
            lineage[0]["discovered"] = n_new
            lineage_all.extend(lineage)
            next_seq += n_new
            n_frontier = n_new
            if cfg.checkpoint_dir:
                self._checkpoint_table(k, seen, {
                    "pages_crawled": pages_crawled,
                    "next_seq": next_seq,
                    "n_frontier": n_frontier,
                    "strategy": "bfs",
                    "frontier_mode": "table",
                })
            k += 1

        res.pages_crawled = pages_crawled
        res.supersteps = k
        res.seen_size = seen.size()
        res.seen_hashes = np.sort(
            np.concatenate(
                [np.frombuffer(eb, dtype=np.uint64)
                 for _, eb in seen.snapshot()]
                or [np.zeros(0, dtype=np.uint64)]
            )
        )
        res.docs_dir = docs_root
        res.lineage = lineage_all
        if cfg.collect_order and os.path.isdir(order_root):
            parts = [
                pq.read_table(os.path.join(order_root, d, f))
                for d in sorted(os.listdir(order_root))
                for f in sorted(os.listdir(os.path.join(order_root, d)))
                if f.endswith(".parquet")
            ]
            if parts:
                res.add_order_rows(
                    pa.concat_tables(parts).sort_by("seq").to_pylist())
        res.wall_sec = time.perf_counter() - t_start
        seen.kill()
        return res

    def _politeness_split(self, frontier: pa.Table, gate, k: int):
        """Apply robots + per-host budgets to the superstep's frontier.

        Returns (admitted, deferred, blocked_order_rows): robots-disallowed
        rows become synthetic 403 results (reference async_webcrawler.py:
        318-331); rows of dead hosts (too many 429/503) become 429 failure
        rows; over-budget rows defer with seq unchanged."""
        from urllib.parse import urlparse

        import polars as pl

        cfg = self.cfg
        urls = frontier.column("url").to_pylist()
        hosts = frontier.column("host").to_pylist()
        blocked_rows: list[dict] = []

        keep = np.ones(len(urls), dtype=bool)
        if cfg.check_robots:
            missing = gate.hosts_missing_robots(hosts)
            if missing:
                fetcher = self._driver_fetcher()
                robots = {
                    h: fetcher.fetch_one(f"http://{h}/robots.txt")["html"]
                    for h in missing
                }
                gate.set_robots(robots)
            paths = [urlparse(u).path or "/" for u in urls]
            allowed = gate.robots_mask(hosts, paths)
            for i in np.nonzero(~allowed)[0]:
                blocked_rows.append(self._synthetic_row(frontier, int(i), k,
                                                        status=403))
            keep &= allowed
        dead = gate.dead_mask(hosts)
        if dead.any():
            for i in np.nonzero(dead & keep)[0]:
                blocked_rows.append(self._synthetic_row(frontier, int(i), k,
                                                        status=429))
            keep &= ~dead
        frontier = frontier.filter(pa.array(keep))
        if frontier.num_rows == 0:
            return frontier, frontier.slice(0, 0), blocked_rows

        # per-host budgets: admit the lowest-seq rows of each host
        df = pl.from_arrow(frontier).sort("seq", maintain_order=True)
        counts = df.group_by("host", maintain_order=True).len()
        admit_n = gate.admit(counts["host"].to_list(),
                             counts["len"].to_list())
        budget = dict(zip(counts["host"].to_list(), admit_n))
        df = df.with_columns(
            pl.int_range(pl.len()).over("host").alias("_rank")
        )
        admit_mask = pl.Series(
            [r < budget.get(h, 0)
             for h, r in zip(df["host"].to_list(), df["_rank"].to_list())]
        )
        admitted = df.filter(admit_mask).drop("_rank").to_arrow()
        deferred = df.filter(~admit_mask).drop("_rank").to_arrow()
        return (admitted.cast(frontier.schema),
                deferred.cast(frontier.schema), blocked_rows)

    def _politeness_split_pool(self, batch: pa.Table, gate, k: int):
        """Best-first variant of the politeness gate: operates on popped
        pool rows (ordered by pop priority, keyed by push_seq instead of
        seq). Blocked rows carry seq=-1 (they never receive a fetch seq)."""
        from urllib.parse import urlparse

        import polars as pl

        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        blocked_rows: list[dict] = []
        keep = np.ones(len(urls), dtype=bool)
        if self.cfg.check_robots:
            missing = gate.hosts_missing_robots(hosts)
            if missing:
                fetcher = self._driver_fetcher()
                gate.set_robots({
                    h: fetcher.fetch_one(f"http://{h}/robots.txt")["html"]
                    for h in missing
                })
            paths = [urlparse(u).path or "/" for u in urls]
            allowed = gate.robots_mask(hosts, paths)
            for i in np.nonzero(~allowed)[0]:
                blocked_rows.append({
                    "url": urls[int(i)],
                    "depth": batch.column("depth")[int(i)].as_py(),
                    "parent": batch.column("parent")[int(i)].as_py(),
                    "seq": -1, "success": False, "status": 403,
                    "fetch_ms": 0.0, "parse_ms": 0.0, "from_cache": False,
                    "level": k,
                })
            keep &= allowed
        dead = gate.dead_mask(hosts)
        for i in np.nonzero(dead & keep)[0]:
            blocked_rows.append({
                "url": urls[int(i)],
                "depth": batch.column("depth")[int(i)].as_py(),
                "parent": batch.column("parent")[int(i)].as_py(),
                "seq": -1, "success": False, "status": 429,
                "fetch_ms": 0.0, "parse_ms": 0.0, "from_cache": False,
                "level": k,
            })
        keep &= ~dead
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return batch, batch.slice(0, 0), blocked_rows
        df = pl.from_arrow(batch)
        counts = df.group_by("host", maintain_order=True).len()
        admit_n = gate.admit(counts["host"].to_list(),
                             counts["len"].to_list())
        budget = dict(zip(counts["host"].to_list(), admit_n))
        df = df.with_columns(
            pl.int_range(pl.len()).over("host").alias("_rank")
        )
        mask = pl.Series(
            [r < budget.get(h, 0)
             for h, r in zip(df["host"].to_list(), df["_rank"].to_list())]
        )
        return (df.filter(mask).drop("_rank").to_arrow(),
                df.filter(~mask).drop("_rank").to_arrow(), blocked_rows)

    def _synthetic_row(self, frontier: pa.Table, i: int, k: int,
                       status: int) -> dict:
        return {
            "url": frontier.column("url")[i].as_py(),
            "depth": frontier.column("depth")[i].as_py(),
            "parent": frontier.column("parent")[i].as_py(),
            "seq": frontier.column("seq")[i].as_py(),
            "success": False,
            "status": status,
            "fetch_ms": 0.0,
            "parse_ms": 0.0,
            "from_cache": False,
            "level": k,
        }

    def _driver_fetcher(self):
        f = getattr(self, "_drv_fetcher", None)
        if f is None:
            f = self.fetcher_cls(**self.fetcher_kwargs)
            self._drv_fetcher = f
        return f

    def _next_frontier_bfs(self, cand: pa.Table, cur_frontier: pa.Table,
                           seen: SeenSet, pages_crawled: int, next_seq: int,
                           k: int):
        """Reference link_discovery algebra (bfs_strategy.py:68-140) on the
        compact candidate table. Returns (next_frontier, n_new, lineage)."""
        cfg = self.cfg
        import polars as pl

        lineage = [{
            "superstep": k, "partition": 0, "frontier_in": 0, "fetched": 0,
            "skipped_seen": 0, "skipped_filtered": 0, "deferred": 0,
            "discovered": 0, "fetch_ms_sum": 0.0, "parse_ms_sum": 0.0,
        }]
        empty = cur_frontier.slice(0, 0)
        if cand.num_rows == 0:
            return empty, 0, lineage
        df = pl.from_arrow(cand)
        # depth gate: next_depth = source_depth+1 must be <= max_depth
        df = df.with_columns((pl.col("source_depth") + 1).alias("depth"))
        df = df.filter(pl.col("depth") <= cfg.max_depth)
        remaining = cfg.max_pages - pages_crawled
        if df.height == 0 or remaining <= 0:
            return empty, 0, lineage
        n0 = df.height
        df = df.filter(pl.col("passes"))
        df = df.filter(pl.col("score") >= cfg.score_threshold) \
            if cfg.score_threshold != -math.inf else df
        lineage[0]["skipped_filtered"] = n0 - df.height
        if df.height == 0:
            return empty, 0, lineage
        # large levels: run dedup + seen check + seq assignment distributed
        # (pipelines/discovery.py; byte-equivalent to the polars path
        # below, including per-parent capacity truncation under max_pages)
        thresh = cfg.distributed_discovery_min_candidates
        if thresh is not None and df.height >= thresh:
            return self._next_frontier_bfs_distributed(
                df, cur_frontier, seen, next_seq, lineage,
                remaining=remaining,
            )
        # ordered level-local dedup: min (parent_seq, link_idx) per canonical url
        df = df.sort(["parent_seq", "link_idx"], maintain_order=True).unique(
            subset=["url"], keep="first", maintain_order=True
        )
        # cross-level dedup: sharded seen-set (all passing candidates are
        # marked seen, including over-capacity ones — reference quirk)
        hashes = df["url_hash"].to_numpy().astype(np.uint64)
        dup = seen.check_and_add(hashes)
        lineage[0]["skipped_seen"] = int(dup.sum())
        df = df.filter(pl.Series(~dup))
        if df.height == 0:
            return empty, 0, lineage
        # per-page capacity truncation — ONLY over-capacity pages get
        # reordered (score desc, stable) and truncated; the reference sorts
        # inside the over-capacity branch only (bfs_strategy.py:124-131),
        # and the post-truncation order IS the next level's crawl order
        if remaining != math.inf:
            df = df.with_columns(pl.len().over("parent_seq").alias("_cnt"))
            if self.scorer_fn is not None:
                df = df.with_columns(
                    pl.when(pl.col("_cnt") > int(remaining))
                    .then(-pl.col("score"))
                    .otherwise(0.0)
                    .alias("_sk")
                ).sort(["parent_seq", "_sk", "link_idx"],
                       maintain_order=True).drop("_sk")
            df = df.with_columns(
                pl.int_range(pl.len()).over("parent_seq").alias("_rank")
            ).filter(pl.col("_rank") < int(remaining)).drop(["_rank", "_cnt"])
        n_new = df.height
        lineage[0]["discovered"] = n_new
        seqs = np.arange(next_seq, next_seq + n_new, dtype=np.int64)
        # parent url lookup from current frontier by parent_seq
        fseq = cur_frontier.column("seq").to_pylist()
        furl = cur_frontier.column("url").to_pylist()
        parent_of = dict(zip(fseq, furl))
        out = pa.table(
            {
                "url": df["url"].to_arrow(),
                "url_hash": pa.array(df["url_hash"].to_numpy().astype(np.uint64)),
                "host": df["host"].to_arrow(),
                "depth": pa.array(df["depth"].cast(pl.Int32).to_arrow(),
                                  type=pa.int32()),
                "score": pa.array(df["score"].cast(pl.Float32).to_arrow(),
                                  type=pa.float32()),
                "parent": pa.array(
                    [parent_of.get(s, "") for s in df["parent_seq"].to_list()],
                    type=pa.string(),
                ),
                "seq": pa.array(seqs),
            }
        )
        return out, n_new, lineage

    def _next_frontier_bfs_distributed(self, df, cur_frontier: pa.Table,
                                       seen: SeenSet, next_seq: int,
                                       lineage: list,
                                       remaining: float = math.inf):
        """Distributed tail of BFS discovery (pipelines/discovery.py):
        level-local ordered dedup, cross-level seen check, capacity
        truncation and deterministic seq assignment run as Ray Data ops;
        the driver only handles block metadata, the parent-url attach (the
        frontier table is driver-held in this mode — frontier_mode='table'
        removes even that) and lineage counters. ``df`` is the
        already-filtered polars candidate frame (depth/passes/score
        applied; ``depth`` column present)."""
        from .discovery import next_frontier_distributed

        import polars as pl

        cand2 = df.select(
            ["url", "url_hash", "host", "depth", "score", "parent_seq",
             "link_idx"]
        ).with_columns(
            pl.col("depth").cast(pl.Int32),
            pl.col("score").cast(pl.Float32),
        ).to_arrow()
        n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
        res, stats = next_frontier_distributed(
            cand2, seen, next_seq, n_blocks=n_blocks, with_stats=True,
            remaining=remaining,
            use_score_order=self.scorer_fn is not None,
        )
        n_new = res.num_rows
        lineage[0]["skipped_seen"] = stats["skipped_seen"]
        lineage[0]["discovered"] = n_new
        if n_new == 0:
            return cur_frontier.slice(0, 0), 0, lineage
        parent_of = dict(zip(cur_frontier.column("seq").to_pylist(),
                             cur_frontier.column("url").to_pylist()))
        out = pa.table(
            {
                "url": res.column("url"),
                "url_hash": res.column("url_hash"),
                "host": res.column("host"),
                "depth": res.column("depth").cast(pa.int32()),
                "score": res.column("score").cast(pa.float32()),
                "parent": pa.array(
                    [parent_of.get(s, "")
                     for s in res.column("parent_seq").to_pylist()],
                    type=pa.string(),
                ),
                "seq": res.column("seq"),
            }
        )
        return out, n_new, lineage

    # -- best-first ---------------------------------------------------------

    def _run_best_first(self, seed_urls: list[str], *, resume: bool) -> CrawlRunResult:
        """Priority frontier: persistent pool sorted by (score, depth, url),
        batch pop of ``bff_batch_size`` with seen-check at pop time
        (bff_strategy.py:129-213)."""
        cfg = self.cfg
        t_start = time.perf_counter()
        res = CrawlRunResult()
        docs_root = os.path.join(cfg.out_dir, "documents")
        self._setup_cache()
        seen = SeenSet(cfg.n_seen_shards, cfg.seen_capacity_per_shard)
        import polars as pl

        pages_crawled = 0
        seq = 0
        k = 0
        lineage_all: list = []
        pool = None  # polars DataFrame: url,url_hash,host,depth,score,parent,push_seq

        saved_gate = None
        saved_deferred = None
        if resume:
            rk = self._find_resume_point()
            if rk is not None:
                frontier_tbl, state = self._restore(rk, seen)
                pool = pl.from_arrow(frontier_tbl)
                pages_crawled = state["pages_crawled"]
                seq = state["next_seq"]
                k = rk + 1
                res.order = state.get("order", [])
                res.urls_fetched = len(res.order)
                saved_gate = state.get("gate")
                if "deferred_tbl" in state:
                    saved_deferred = pl.from_arrow(state["deferred_tbl"])
        if pool is None:
            os.makedirs(docs_root, exist_ok=True)
            canon = []
            for u in seed_urls:
                cu = urlkit.canonicalize(u, u)
                if cu:
                    canon.append(cu)
            pool = pl.DataFrame(
                {
                    "url": canon,
                    "url_hash": np.array(urlkit.hash64_batch(canon),
                                         dtype=np.uint64),
                    "host": [urlkit.host_of(c) for c in canon],
                    "depth": np.zeros(len(canon), dtype=np.int32),
                    "score": np.zeros(len(canon), dtype=np.float32),
                    "parent": [""] * len(canon),
                    "push_seq": np.arange(len(canon), dtype=np.int64),
                }
            )
        push_seq = int(pool["push_seq"].max()) + 1 if pool.height else 0

        gate = None
        if cfg.politeness:
            from ..state.politeness import PolitenessGate

            gate = PolitenessGate(
                cfg.politeness_partitions,
                base_delay=cfg.base_delay,
                superstep_seconds=cfg.superstep_seconds,
                jitter=cfg.politeness_jitter,
            )
            if saved_gate:
                gate.restore(saved_gate)
        # politeness-deferred popped rows (fetch first); restored from the
        # checkpoint because they were marked seen at pop time — re-pooling
        # them would make the pop-time seen-check silently drop them
        deferred_df = saved_deferred

        stop = False
        while (pool.height or (deferred_df is not None and deferred_df.height)) \
                and not stop and pages_crawled < cfg.max_pages:
            # reference quirk (bff_strategy.py:152-171): the pop loop always
            # consumes a full BATCH_SIZE even when remaining < BATCH_SIZE —
            # over-popped rows are marked visited and fetched; the result
            # loop below breaks at the cap (counted, not reported)
            n_pop = cfg.bff_batch_size
            # heap order = (score, depth, url); ties beyond that are
            # identical entries (same url) so any stable order works
            pool = pool.sort(["score", "depth", "url", "push_seq"])
            popped = pool.head(n_pop)
            pool = pool.slice(n_pop)
            # visited.add at pop time; duplicates inside popped batch or
            # already-seen rows are consumed without fetching
            first = popped.unique(subset=["url"], keep="first",
                                  maintain_order=True)
            dup = seen.check_and_add(
                first["url_hash"].to_numpy().astype(np.uint64)
            )
            batch_df = first.filter(pl.Series(~dup))
            # politeness-deferred rows from earlier rounds fetch first
            # (already visited, already popped — they just waited)
            if deferred_df is not None and deferred_df.height:
                batch_df = pl.concat([deferred_df, batch_df]) \
                    if batch_df.height else deferred_df
                deferred_df = None
            if gate is not None and batch_df.height:
                batch_tbl = batch_df.to_arrow()
                admitted_t, deferred_t, blocked_rows = \
                    self._politeness_split_pool(batch_tbl, gate, k)
                res.add_order_rows(blocked_rows)
                res.urls_fetched += len(blocked_rows)
                batch_df = pl.from_arrow(admitted_t)
                deferred_df = pl.from_arrow(deferred_t) \
                    if deferred_t.num_rows else None
            if batch_df.height == 0:
                k += 1
                continue
            frontier = pa.table(
                {
                    "url": batch_df["url"].to_arrow(),
                    "url_hash": pa.array(
                        batch_df["url_hash"].to_numpy().astype(np.uint64)
                    ),
                    "host": batch_df["host"].to_arrow(),
                    "depth": pa.array(batch_df["depth"].cast(pl.Int32).to_arrow(),
                                      type=pa.int32()),
                    "score": pa.array(batch_df["score"].cast(pl.Float32).to_arrow(),
                                      type=pa.float32()),
                    "parent": batch_df["parent"].to_arrow(),
                    "seq": pa.array(
                        np.arange(seq, seq + batch_df.height, dtype=np.int64)
                    ),
                }
            )
            docs_dir, compact = self._fetch_parse_write(frontier, k,
                                                        docs_root)
            order_tbl, cand, n_prefiltered = \
                self._read_superstep(compact)
            order_rows = self._order_rows_list(order_tbl, k)
            if self.on_superstep is not None:
                self.on_superstep(k, docs_dir, order_tbl)
            # reference counts successes as they stream and stops BEFORE
            # yielding the result that hits the cap
            kept_rows = []
            for r in order_rows:
                if r["success"]:
                    pages_crawled += 1
                    if pages_crawled >= cfg.max_pages:
                        stop = True
                        break
                r["level"] = k
                kept_rows.append(r)
            res.add_order_rows(kept_rows)
            res.urls_fetched += len(kept_rows)
            seq += len(order_rows)

            if not stop:
                if cand.num_rows:
                    cdf = pl.from_arrow(cand)
                    cdf = cdf.with_columns(
                        (pl.col("source_depth") + 1).alias("depth")
                    ).filter(
                        (pl.col("depth") <= cfg.max_depth) & pl.col("passes")
                    )
                    # drop candidates whose source result was cut by the cap
                    kept_seqs = set(r["seq"] for r in kept_rows if r["success"])
                    cdf = cdf.filter(
                        pl.col("parent_seq").is_in(list(kept_seqs))
                    )
                    if cdf.height:
                        # skip already-visited (contains, no add — bff marks
                        # visited only at pop)
                        vis = seen.contains(
                            cdf["url_hash"].to_numpy().astype(np.uint64)
                        )
                        cdf = cdf.filter(pl.Series(~vis))
                    if cfg.max_pages != math.inf and cdf.height:
                        # remaining capacity decreases per-result WITHIN the
                        # batch (reference streams results and recomputes
                        # remaining at each link_discovery call)
                        cum = 0
                        remaining_of = {}
                        for r in kept_rows:
                            if r["success"]:
                                cum += 1
                                remaining_of[r["seq"]] = int(
                                    cfg.max_pages - (pages_crawled
                                                     - sum(1 for x in kept_rows
                                                           if x["success"])
                                                     + cum)
                                )
                        rem_df = pl.DataFrame(
                            {"parent_seq": list(remaining_of.keys()),
                             "_rem": list(remaining_of.values())}
                        ).with_columns(pl.col("parent_seq").cast(pl.Int64))
                        cdf = cdf.sort(["parent_seq", "link_idx"],
                                       maintain_order=True)
                        cdf = cdf.join(rem_df, on="parent_seq", how="left")
                        cdf = cdf.with_columns(
                            pl.int_range(pl.len()).over("parent_seq")
                            .alias("_rank")
                        ).filter(
                            pl.col("_rank") < pl.col("_rem").fill_null(0)
                        ).drop(["_rank", "_rem"])
                    if cdf.height:
                        cdf = cdf.sort(["parent_seq", "link_idx"],
                                       maintain_order=True)
                        parent_of = dict(
                            zip(frontier.column("seq").to_pylist(),
                                frontier.column("url").to_pylist())
                        )
                        add = pl.DataFrame(
                            {
                                "url": cdf["url"].to_list(),
                                "url_hash": cdf["url_hash"].to_numpy()
                                .astype(np.uint64),
                                "host": cdf["host"].to_list(),
                                "depth": cdf["depth"].cast(pl.Int32)
                                .to_numpy().astype(np.int32),
                                "score": cdf["score"].cast(pl.Float32)
                                .to_numpy().astype(np.float32),
                                "parent": [
                                    parent_of.get(s, "")
                                    for s in cdf["parent_seq"].to_list()
                                ],
                                "push_seq": np.arange(
                                    push_seq, push_seq + cdf.height,
                                    dtype=np.int64,
                                ),
                            }
                        )
                        push_seq += cdf.height
                        pool = pl.concat([pool, add.select(pool.columns)]) \
                            if pool.height else add.select(
                                ["url", "url_hash", "host", "depth",
                                 "score", "parent", "push_seq"])

            if gate is not None and kept_rows:
                by_host: dict[str, list[int]] = {}
                for r in kept_rows:
                    by_host.setdefault(
                        urlkit.host_of(r["url"]), []
                    ).append(int(r["status"]))
                gate.report(by_host)
            lineage_all.append({
                "superstep": k, "partition": 0,
                "frontier_in": batch_df.height,
                "fetched": sum(1 for r in kept_rows if r["success"]),
                "skipped_seen": int(dup.sum()),
                "skipped_filtered": n_prefiltered, "deferred": 0,
                "discovered": 0,
                "fetch_ms_sum": float(sum(r.get("fetch_ms") or 0.0
                                          for r in kept_rows)),
                "parse_ms_sum": float(sum(r.get("parse_ms") or 0.0
                                          for r in kept_rows)),
            })
            if cfg.checkpoint_dir:
                # guard like the BFS path — the non-checkpointed hot loop
                # must not pay pool.to_arrow() per ~10-row superstep
                state = {"pages_crawled": pages_crawled, "next_seq": seq,
                         "strategy": "best_first",
                         "_step_order": kept_rows}
                if gate is not None:
                    state["gate"] = gate.snapshot()
                if deferred_df is not None and deferred_df.height:
                    state["_deferred_tbl"] = deferred_df.to_arrow()
                self._checkpoint(k, pool.to_arrow(), seen, state,
                                 lineage_all[-1:])
            k += 1

        res.pages_crawled = pages_crawled
        res.supersteps = k
        res.seen_size = seen.size()
        res.seen_hashes = np.sort(
            np.concatenate(
                [np.frombuffer(eb, dtype=np.uint64)
                 for _, eb in seen.snapshot()]
                or [np.zeros(0, dtype=np.uint64)]
            )
        )
        res.docs_dir = docs_root
        res.lineage = lineage_all
        res.wall_sec = time.perf_counter() - t_start
        seen.kill()
        if gate is not None:
            gate.kill()
        return res

    # -- best-first, frontier-table mode -------------------------------------

    @staticmethod
    def _replay_bff_order(order_root: str, up_to_k: int,
                          max_pages: float) -> tuple[list, int]:
        """Rebuild the kept order rows from the task-side order parquet by
        replaying the reference's streaming max_pages cap law (count
        successes as they stream, stop BEFORE yielding the cap-hitting
        row). Used on resume so the checkpoint stays counters-only."""
        kept: list = []
        pages = 0
        if not os.path.isdir(order_root):
            return kept, pages
        for d in sorted(os.listdir(order_root)):
            kk = int(d.split("=")[1])
            if kk > up_to_k:
                continue
            sdir = os.path.join(order_root, d)
            parts = [pq.read_table(os.path.join(sdir, f))
                     for f in sorted(os.listdir(sdir))
                     if f.endswith(".parquet")]
            if not parts:
                continue
            for r in pa.concat_tables(parts).sort_by("seq").to_pylist():
                if r["success"]:
                    pages += 1
                    if pages >= max_pages:
                        return kept, pages
                r["level"] = kk
                kept.append(r)
        return kept, pages

    @staticmethod
    def _pool_compact(gen_dir: str, new_gen_dir: str,
                      popped_keys: np.ndarray) -> None:
        """Rewrite the pool without tombstoned rows (distributed filter ->
        parquet; the driver never holds pool rows)."""
        dead_ref = ray.put(np.asarray(popped_keys, dtype=np.int64))

        def drop_dead(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            dead = ray.get(dead_ref)
            ps = batch.column("push_seq").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ps, dead)))

        shutil.rmtree(new_gen_dir, ignore_errors=True)
        rd.read_parquet(gen_dir, partitioning=None).map_batches(
            drop_dead, batch_format="pyarrow"
        ).write_parquet(new_gen_dir)
        # the OLD gen is deleted by the caller AFTER the checkpoint
        # commits — a crash between compact and checkpoint must leave the
        # generation the checkpoint points at intact

    def _run_best_first_table(self, seed_urls: list[str], *,
                              resume: bool = False) -> CrawlRunResult:
        """Best-first with the priority pool held as parquet fragments --
        the driver-free scale path for the bff strategy (complement of
        _run_bfs_table):

        - the pool is append-only parquet under out_dir/pool/gen=G; popped
          rows are "removed" via a driver tombstone set of push_seq keys
          (O(pages popped), NOT O(pool)), compacted away once dead keys
          outnumber live rows;
        - each pop is ONE distributed scan: per-block tombstone filter +
          local top-k, so the driver receives <= bff_batch_size rows per
          block, merged to the global pop batch (discovery.pool_pop_topk)
          -- the reference heap order (score, depth, url, push_seq),
          bff_strategy.py:129-152;
        - fetch/parse/sink write docs + candidates task-side; the order
          rows return INLINE (bounded by the pop batch) because the
          streaming max_pages cap law is driver state;
        - link discovery (kept-parent gate, read-only seen check,
          per-parent capacity rank, global push_seq assignment) runs
          distributed and appends survivors straight to a new pool
          fragment (discovery.bff_pool_append) -- candidate rows never
          transit driver heap;
        - checkpoints are counters + seen snapshot + the tombstone keys;
          resume replays the cap law from the on-disk order parquet.

        Byte-equal to the driver pool (tests/test_frontier_table.py). The
        politeness gate remains driver-mode only (its budget split is a
        driver law)."""
        from .discovery import bff_pool_append, pool_pop_topk

        cfg = self.cfg
        if cfg.politeness:
            raise ValueError(
                "frontier_mode='table' does not compose with politeness "
                "(use frontier_mode='driver')")
        import polars as pl

        t_start = time.perf_counter()
        res = CrawlRunResult()
        docs_root = os.path.join(cfg.out_dir, "documents")
        pool_root = os.path.join(cfg.out_dir, "pool")
        cand_root = os.path.join(cfg.out_dir, "cand")
        order_root = os.path.join(cfg.out_dir, "order")
        res.order_dir = order_root
        self._setup_cache()
        seen = SeenSet(cfg.n_seen_shards, cfg.seen_capacity_per_shard)

        pages_crawled, seq, k, push_seq, gen = 0, 0, 0, 0, 0
        pool_live: int | None = None
        popped_keys = np.zeros(0, dtype=np.int64)
        lineage_all: list = []

        if resume:
            rk = self._find_resume_point()
            if rk is not None:
                state = self._restore_table(rk, seen)
                pages_crawled = state["pages_crawled"]
                seq = state["next_seq"]
                push_seq = state["push_seq"]
                pool_live = state["pool_live"]
                gen = state.get("pool_gen", 0)
                ppath = os.path.join(self._ckpt_path(rk), "popped.parquet")
                if os.path.exists(ppath):
                    popped_keys = pq.read_table(ppath).column(
                        "push_seq").to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                kept, _replay_pages = self._replay_bff_order(
                    order_root, rk, cfg.max_pages)
                res.order = kept
                res.urls_fetched = len(kept)
                k = rk + 1
                # Resume is crash-consistent from the LATEST committed
                # checkpoint: an old pool generation is deleted only
                # after the checkpoint that supersedes it commits, so the
                # latest checkpoint's gen dir always survives a crash.
                # Rewinding further (hand-deleting newer checkpoints)
                # can cross a compaction that already GC'd this gen:
                if not os.path.isdir(
                        os.path.join(pool_root, f"gen={gen:05d}")):
                    raise RuntimeError(
                        f"pool generation gen={gen:05d} referenced by "
                        f"checkpoint superstep={rk} no longer exists — "
                        "best-first table resume is only supported from "
                        "the latest committed checkpoint (compaction "
                        "GC'd older generations)")
                # drop pool state the checkpoint doesn't cover: stale
                # generations (crashed mid-compaction) and fragments
                # appended by supersteps after rk (crashed mid-append) —
                # the replayed supersteps re-create them byte-identically
                if os.path.isdir(pool_root):
                    for d in os.listdir(pool_root):
                        if d != f"gen={gen:05d}":
                            shutil.rmtree(os.path.join(pool_root, d),
                                          ignore_errors=True)
                cur_gen = os.path.join(pool_root, f"gen={gen:05d}")
                if os.path.isdir(cur_gen):
                    for d in os.listdir(cur_gen):
                        if (d.startswith("step=")
                                and int(d.split("=")[1]) > rk):
                            shutil.rmtree(os.path.join(cur_gen, d),
                                          ignore_errors=True)
        if pool_live is None:
            os.makedirs(docs_root, exist_ok=True)
            # reference seed law: canonicalize, NO dedup (duplicate queue
            # entries consume pop slots; seen marks at pop time)
            canon = [c for c in
                     (urlkit.canonicalize(u, u) for u in seed_urls) if c]
            seed_tbl = pa.table({
                "url": pa.array(canon, type=pa.string()),
                "url_hash": pa.array(
                    np.array(urlkit.hash64_batch(canon), dtype=np.uint64)),
                "host": pa.array([urlkit.host_of(c) for c in canon],
                                 type=pa.string()),
                "depth": pa.array(np.zeros(len(canon), dtype=np.int32)),
                "score": pa.array(np.zeros(len(canon), dtype=np.float32)),
                "parent": pa.array([""] * len(canon), type=pa.string()),
                "push_seq": pa.array(
                    np.arange(len(canon), dtype=np.int64)),
            })
            push_seq = pool_live = len(canon)
            sdir = os.path.join(pool_root, f"gen={gen:05d}", "seed")
            shutil.rmtree(sdir, ignore_errors=True)
            os.makedirs(sdir, exist_ok=True)
            pq.write_table(seed_tbl,
                           os.path.join(sdir, "part-000000000000.parquet"))

        stop = False
        while pool_live and not stop and pages_crawled < cfg.max_pages:
            gen_dir = os.path.join(pool_root, f"gen={gen:05d}")
            # reference quirk (bff_strategy.py:152-171): always pop a full
            # BATCH_SIZE; over-popped rows are marked visited and fetched
            # partitioning=None: the gen=/step= path components are pool
            # bookkeeping, not hive partition columns
            popped = pool_pop_topk(
                rd.read_parquet(gen_dir, partitioning=None),
                popped_keys, cfg.bff_batch_size)
            if popped is None or popped.num_rows == 0:
                break
            popped_keys = np.concatenate([
                popped_keys,
                popped.column("push_seq").to_numpy(zero_copy_only=False)
                .astype(np.int64)])
            pool_live -= popped.num_rows
            first = pl.from_arrow(popped).unique(
                subset=["url"], keep="first", maintain_order=True)
            dup = seen.check_and_add(
                first["url_hash"].to_numpy().astype(np.uint64))
            batch_df = first.filter(pl.Series(~dup))
            if batch_df.height == 0:
                k += 1
                continue
            frontier = pa.table({
                "url": batch_df["url"].to_arrow(),
                "url_hash": pa.array(
                    batch_df["url_hash"].to_numpy().astype(np.uint64)),
                "host": batch_df["host"].to_arrow(),
                "depth": pa.array(
                    batch_df["depth"].cast(pl.Int32).to_arrow(),
                    type=pa.int32()),
                "score": pa.array(
                    batch_df["score"].cast(pl.Float32).to_arrow(),
                    type=pa.float32()),
                "parent": batch_df["parent"].to_arrow(),
                "seq": pa.array(
                    np.arange(seq, seq + batch_df.height, dtype=np.int64)),
            })
            cand_dir = os.path.join(cand_root, f"superstep={k:05d}")
            order_dir = os.path.join(order_root, f"superstep={k:05d}")
            shutil.rmtree(cand_dir, ignore_errors=True)
            shutil.rmtree(order_dir, ignore_errors=True)
            docs_dir, compact = self._fetch_parse_write(
                frontier, k, docs_root, cand_dir=cand_dir,
                order_dir=order_dir, order_inline=True)
            order_tbl = self._flatten_wrapped(compact, "order", _ORDER_COLS)
            if order_tbl is not None:
                order_tbl = order_tbl.sort_by("seq")
            order_rows = self._order_rows_list(order_tbl, k)
            n_prefiltered = sum(
                int(v) for t in compact
                for v in t.column("n_filtered").to_pylist())
            if self.on_superstep is not None:
                self.on_superstep(k, docs_dir, order_tbl)
            # streaming cap law: stop BEFORE yielding the cap-hitting row
            kept_rows = []
            for r in order_rows:
                if r["success"]:
                    pages_crawled += 1
                    if pages_crawled >= cfg.max_pages:
                        stop = True
                        break
                r["level"] = k
                kept_rows.append(r)
            res.add_order_rows(kept_rows)
            res.urls_fetched += len(kept_rows)
            seq += len(order_rows)

            n_new = 0
            have_cands = os.path.isdir(cand_dir) and any(
                f.endswith(".parquet") for f in os.listdir(cand_dir))
            kept_seqs = [r["seq"] for r in kept_rows if r["success"]]
            if not stop and have_cands and kept_seqs:
                rem_of = None
                if cfg.max_pages != math.inf:
                    # remaining capacity decreases per-result WITHIN the
                    # batch (reference recomputes remaining per
                    # link_discovery call as results stream)
                    n_succ = len(kept_seqs)
                    cum = 0
                    rem_of = {}
                    for r in kept_rows:
                        if r["success"]:
                            cum += 1
                            rem_of[r["seq"]] = int(
                                cfg.max_pages
                                - (pages_crawled - n_succ + cum))
                parent_of = dict(zip(
                    frontier.column("seq").to_pylist(),
                    frontier.column("url").to_pylist()))
                cand_ds = rd.read_parquet(
                    cand_dir,
                    columns=["url", "url_hash", "host", "source_depth",
                             "score", "parent_seq", "link_idx"])
                frag_dir = os.path.join(gen_dir, f"step={k:05d}")
                shutil.rmtree(frag_dir, ignore_errors=True)
                n_new = bff_pool_append(
                    cand_ds, seen, push_seq, kept_seqs, rem_of,
                    parent_of, frag_dir)
                push_seq += n_new
                pool_live += n_new
            lineage_all.append({
                "superstep": k, "partition": 0,
                "frontier_in": batch_df.height,
                "fetched": sum(1 for r in kept_rows if r["success"]),
                "skipped_seen": int(dup.sum()),
                "skipped_filtered": n_prefiltered, "deferred": 0,
                "discovered": n_new,
                "fetch_ms_sum": float(sum(r.get("fetch_ms") or 0.0
                                          for r in kept_rows)),
                "parse_ms_sum": float(sum(r.get("parse_ms") or 0.0
                                          for r in kept_rows)),
            })
            old_gen_dir = None
            if (len(popped_keys) > max(cfg.pool_compact_min, pool_live)
                    and pool_live):
                new_gen = os.path.join(pool_root, f"gen={gen + 1:05d}")
                self._pool_compact(gen_dir, new_gen, popped_keys)
                popped_keys = np.zeros(0, dtype=np.int64)
                gen += 1
                old_gen_dir = gen_dir
            if cfg.checkpoint_dir:
                self._checkpoint_table(k, seen, {
                    "pages_crawled": pages_crawled,
                    "next_seq": seq,
                    "push_seq": push_seq,
                    "pool_live": pool_live,
                    "pool_gen": gen,
                    "strategy": "best_first",
                    "frontier_mode": "table",
                }, extra_tables={"popped": pa.table({
                    "push_seq": pa.array(popped_keys, type=pa.int64())})})
            if old_gen_dir is not None:
                shutil.rmtree(old_gen_dir, ignore_errors=True)
            k += 1

        res.pages_crawled = pages_crawled
        res.supersteps = k
        res.seen_size = seen.size()
        res.seen_hashes = np.sort(
            np.concatenate(
                [np.frombuffer(eb, dtype=np.uint64)
                 for _, eb in seen.snapshot()]
                or [np.zeros(0, dtype=np.uint64)]
            )
        )
        res.docs_dir = docs_root
        res.lineage = lineage_all
        res.wall_sec = time.perf_counter() - t_start
        seen.kill()
        return res


def crawl_url_patterns(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web and profile the URL
    shapes per host — (host, path-segment count) → URL count + max
    crawl depth, the frontier-hygiene audit (a runaway calendar or
    faceted-navigation trap shows up as ever-deeper segment counts
    long before it fills the frontier). Self-dump SQL-gated when
    ``dump`` is set: the dump carries only (url, host, depth) rows and
    DuckDB re-derives the segment counts from the raw URLs with its
    own string machinery.

    Scale shape: a stateless pruned-column ``map_batches`` over the
    crawl's documents parquet (url/host/depth only) + one bounded
    groupby — host × segment-count cells."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_urlpat_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    docs = rd.read_parquet(res.docs_dir,
                           columns=["url", "host", "depth"])
    if dump is not None:
        import ray

        want = pa.schema([("url", pa.string()), ("host", pa.string()),
                          ("depth", pa.int64())])
        parts = []
        for r in docs.to_arrow_refs():
            t = ray.get(r)
            if t.num_rows:
                parts.append(
                    t.select(["url", "host", "depth"]).cast(want))
        dump(pa.concat_tables(parts))

    def seg(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        segs = []
        for u in urls:
            rest = u.split("://", 1)[-1]
            path = rest.split("/", 1)[1] if "/" in rest else ""
            segs.append(len([p for p in path.split("/") if p]))
        return pa.table({
            "host": batch.column("host").cast(pa.string()),
            "n_segments": pa.array(segs, pa.int64()),
            "depth": batch.column("depth").cast(pa.int64()),
        })

    return docs.map_batches(seg, batch_format="pyarrow",
                            batch_size=65536) \
        .groupby(["host", "n_segments"]) \
        .aggregate(Count(alias_name="n_urls"),
                   Max("depth", alias_name="max_depth"))


def crawl_host_gini(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web and measure the Gini
    concentration of pages across hosts — the frontier-skew headline
    (Gini → 1 = one host dominates the crawl, the politeness
    scheduler's worst case). One summary row. Self-dump SQL-gated
    when ``dump`` is set: the dump is the per-host page-count table
    and DuckDB recomputes the exact sorted-formula Gini
    G = (2·Σᵢ i·xᵢ)/(n·Σxᵢ) − (n+1)/n over counts sorted ascending
    (ties broken by host for a deterministic permutation — G is
    tie-order-invariant, the tiebreak just pins both engines to the
    same sum order)."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_hgini_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    counts = rd.read_parquet(res.docs_dir, columns=["host"]) \
        .groupby("host").aggregate(Count(alias_name="n_pages")) \
        .to_pandas().sort_values(["n_pages", "host"]) \
        .reset_index(drop=True)
    if dump is not None:
        dump(pa.table({
            "host": pa.array(counts["host"], pa.string()),
            "n_pages": pa.array(counts["n_pages"].to_numpy("int64"),
                                pa.int64())}))
    x = counts["n_pages"].to_numpy(np.float64)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.float64)
    gini = float(2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n)
    return pa.table({
        "n_hosts": pa.array([n], pa.int64()),
        "n_pages": pa.array([int(x.sum())], pa.int64()),
        "gini": pa.array([round(gini, 6)], pa.float64()),
    })
