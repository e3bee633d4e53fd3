"""Distributed discovery == driver discovery, on identical candidates.

Proves the scale path (pipelines/discovery.py) produces byte-identical
frontiers to the driver-side algebra, including cross-block duplicate
runs and already-seen URLs."""

import math

import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_ray.functions.urlkit import hash64
from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.pipelines.discovery import next_frontier_distributed
from crawl4ai_ray.state.seen import SeenSet


def _make_candidates(n_pages=40, links_per_page=12, dup_every=3,
                     seed_seen=5):
    """Candidate table with heavy cross-page duplicates (every dup_every-th
    link points at a shared URL) — exercises run-spanning dedup."""
    rows = {k: [] for k in ["url", "url_hash", "host", "parent_seq",
                            "link_idx", "source_depth", "passes", "score"]}
    for p in range(n_pages):
        for i in range(links_per_page):
            if i % dup_every == 0:
                url = f"http://h0.test/shared/{i}"
            else:
                url = f"http://h0.test/p{p}/l{i}"
            rows["url"].append(url)
            rows["url_hash"].append(hash64(url))
            rows["host"].append("h0.test")
            rows["parent_seq"].append(p)
            rows["link_idx"].append(i)
            rows["source_depth"].append(1)
            rows["passes"].append(True)
            rows["score"].append(0.0)
    tbl = pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "url_hash": pa.array(np.array(rows["url_hash"],
                                          dtype=np.uint64)),
            "host": pa.array(rows["host"], pa.string()),
            "parent_seq": pa.array(rows["parent_seq"], pa.int64()),
            "link_idx": pa.array(rows["link_idx"], pa.int32()),
            "source_depth": pa.array(rows["source_depth"], pa.int32()),
            "passes": pa.array(rows["passes"], pa.bool_()),
            "score": pa.array(rows["score"], pa.float32()),
        }
    )
    # some URLs already in the seen set
    pre_seen = np.array(
        [hash64(f"http://h0.test/p0/l{i}") for i in range(1, seed_seen + 1)
         if i % dup_every != 0],
        dtype=np.uint64,
    )
    return tbl, pre_seen


def test_distributed_matches_driver(ray_session):
    cand, pre_seen = _make_candidates()

    # driver path
    seen_a = SeenSet(3, 1 << 12)
    seen_a.add(pre_seen)
    eng = CrawlEngine(CrawlConfig(strategy="bfs", max_depth=3))
    cur_frontier = pa.table(
        {
            "url": pa.array([f"http://h0.test/page{p}" for p in range(40)]),
            "url_hash": pa.array(np.arange(40, dtype=np.uint64)),
            "host": pa.array(["h0.test"] * 40),
            "depth": pa.array([1] * 40, pa.int32()),
            "score": pa.array([0.0] * 40, pa.float32()),
            "parent": pa.array([""] * 40),
            "seq": pa.array(range(40), pa.int64()),
        }
    )
    want_tbl, n_new, _ = eng._next_frontier_bfs(
        cand, cur_frontier, seen_a, pages_crawled=0, next_seq=1000, k=0
    )
    want = list(zip(want_tbl.column("url").to_pylist(),
                    want_tbl.column("seq").to_pylist()))

    # distributed path (fresh seen with identical preload)
    seen_b = SeenSet(3, 1 << 12)
    seen_b.add(pre_seen)
    got_tbl = next_frontier_distributed(cand, seen_b, next_seq=1000,
                                        n_blocks=7)
    got = list(zip(got_tbl.column("url").to_pylist(),
                   got_tbl.column("seq").to_pylist()))

    assert got == want
    assert len(got) == n_new
    # both seen sets ended identical
    assert np.array_equal(
        np.sort(np.concatenate([np.frombuffer(e, dtype=np.uint64)
                                for _, e in seen_a.snapshot()])),
        np.sort(np.concatenate([np.frombuffer(e, dtype=np.uint64)
                                for _, e in seen_b.snapshot()])),
    )
    seen_a.kill()
    seen_b.kill()


def test_engine_distributed_discovery_end_to_end(ray_session, tmp_path):
    """Forcing the distributed discovery path (threshold 0) must reproduce
    the driver-path crawl byte for byte: order, seq, seen set."""
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)

    def run(thresh, sub):
        cfg = CrawlConfig(strategy="bfs", max_depth=3,
                          out_dir=str(tmp_path / sub), n_seen_shards=2,
                          fetch_concurrency=2,
                          distributed_discovery_min_candidates=thresh)
        eng = CrawlEngine(cfg,
                          fetcher_kwargs={"site_cfg": site_cfg.__dict__})
        return eng.run(site.seed_urls())

    drv = run(None, "drv")
    dist = run(0, "dist")
    key = lambda rows: [(r["url"], r["seq"], r["level"], r["status"])
                        for r in rows]
    assert key(dist.order) == key(drv.order)
    assert np.array_equal(dist.seen_hashes, drv.seen_hashes)
    assert [l["skipped_seen"] for l in dist.lineage] == \
        [l["skipped_seen"] for l in drv.lineage]
    assert [l["discovered"] for l in dist.lineage] == \
        [l["discovered"] for l in drv.lineage]


def test_distributed_empty_and_all_seen(ray_session):
    cand, _ = _make_candidates(n_pages=2, links_per_page=4)
    seen = SeenSet(2, 1 << 10)
    # pre-seed EVERYTHING
    seen.add(cand.column("url_hash").to_numpy(zero_copy_only=False)
             .astype(np.uint64))
    out = next_frontier_distributed(cand, seen, next_seq=0, n_blocks=3)
    assert out.num_rows == 0
    empty = next_frontier_distributed(cand.slice(0, 0), seen, next_seq=0)
    assert empty.num_rows == 0
    seen.kill()


def test_engine_distributed_discovery_with_politeness(ray_session,
                                                      tmp_path):
    """Distributed discovery composes with the politeness gate: forced
    threshold vs driver path must agree on fetched set and seen set even
    when deferral mixes depths across supersteps."""
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=3)
    site = SyntheticWeb(site_cfg)

    def run(thresh, sub):
        cfg = CrawlConfig(strategy="bfs", max_depth=3, politeness=True,
                          politeness_partitions=2,
                          out_dir=str(tmp_path / sub), n_seen_shards=2,
                          fetch_concurrency=2,
                          distributed_discovery_min_candidates=thresh)
        eng = CrawlEngine(cfg,
                          fetcher_kwargs={"site_cfg": site_cfg.__dict__})
        return eng.run(site.seed_urls())

    drv = run(None, "drv")
    dist = run(0, "dist")
    key = lambda rows: sorted((r["url"], r["status"]) for r in rows)
    assert key(dist.order) == key(drv.order)
    assert np.array_equal(dist.seen_hashes, drv.seen_hashes)


def test_run_starting_at_block_boundary_keeps_first(ray_session):
    """Code-review r2 regression: when a duplicate run occupies entire
    blocks from position 0, the value-keyed drop set used to delete the
    run's global FIRST occurrence too. One unique URL duplicated across
    every block must survive exactly once."""
    n = 30
    url = "http://h0.test/only"
    cand = pa.table(
        {
            "url": pa.array([url] * n, pa.string()),
            "url_hash": pa.array(np.full(n, hash64(url), dtype=np.uint64)),
            "host": pa.array(["h0.test"] * n, pa.string()),
            "parent_seq": pa.array(list(range(n)), pa.int64()),
            "link_idx": pa.array([0] * n, pa.int32()),
            "source_depth": pa.array([1] * n, pa.int32()),
            "passes": pa.array([True] * n, pa.bool_()),
            "score": pa.array([0.0] * n, pa.float32()),
        }
    )
    seen = SeenSet(2, 1 << 10)
    out = next_frontier_distributed(cand, seen, next_seq=5, n_blocks=5)
    assert out.column("url").to_pylist() == [url]
    assert out.column("seq").to_pylist() == [5]
    # and it is now marked seen
    assert seen.contains(np.array([hash64(url)], dtype=np.uint64)).all()
    seen.kill()


def test_engine_distributed_discovery_with_max_pages(ray_session, tmp_path):
    """The distributed path now engages under max_pages: per-parent
    capacity truncation (score order for over-capacity parents) must
    reproduce the driver path exactly — order, seqs, seen set."""
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)

    def scorer(url: str) -> float:
        return float(len(url) % 7)

    def run(thresh, sub, max_pages, use_scorer):
        cfg = CrawlConfig(strategy="bfs", max_depth=3,
                          out_dir=str(tmp_path / sub), n_seen_shards=2,
                          fetch_concurrency=2, max_pages=max_pages,
                          distributed_discovery_min_candidates=thresh)
        eng = CrawlEngine(cfg,
                          fetcher_kwargs={"site_cfg": site_cfg.__dict__},
                          scorer_fn=scorer if use_scorer else None)
        return eng.run(site.seed_urls())

    for max_pages, use_scorer, tag in [(9, False, "a"), (9, True, "b"),
                                       (25, True, "c")]:
        drv = run(None, f"drv{tag}", max_pages, use_scorer)
        dist = run(0, f"dist{tag}", max_pages, use_scorer)
        key = lambda rows: [(r["url"], r["seq"], r["level"], r["status"])
                            for r in rows]
        assert key(dist.order) == key(drv.order), (max_pages, use_scorer)
        assert np.array_equal(dist.seen_hashes, drv.seen_hashes)
        assert [l["skipped_seen"] for l in dist.lineage] == \
            [l["skipped_seen"] for l in drv.lineage]
        assert [l["discovered"] for l in dist.lineage] == \
            [l["discovered"] for l in drv.lineage]
