"""Engine-vs-oracle crawl equality — the BASELINE correctness gate.

The single-process oracle (crawl4ai_ray.oracle) reimplements the reference's
BFS / best-first semantics; the distributed engine must reproduce its crawl
ordering, final URL-seen set, and per-document span sequences exactly.
"""

import math
import shutil

import numpy as np
import pytest

from crawl4ai_ray.functions.urlkit import hash64
from crawl4ai_ray.oracle import oracle_best_first, oracle_bfs
from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb


SITE_CFG = SiteConfig(n_hosts=4)
SITE = SyntheticWeb(SITE_CFG)


def _order_key(rows):
    return [(r["url"], int(r["depth"]), r["parent"], int(r["seq"]),
             bool(r["success"]), int(r["status"])) for r in rows]


def _run_engine(tmp_path, **cfg_kw):
    cfg = CrawlConfig(
        out_dir=str(tmp_path / "out"),
        n_seen_shards=2,
        fetch_concurrency=2,
        **cfg_kw,
    )
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    return eng.run(SITE.seed_urls()[:2])


@pytest.mark.parametrize("max_depth", [1, 2, 3])
def test_bfs_matches_oracle(ray_session, tmp_path, max_depth):
    golden = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=max_depth)
    res = _run_engine(tmp_path, strategy="bfs", max_depth=max_depth)
    assert _order_key(res.order) == _order_key(golden.order)
    assert res.pages_crawled == golden.pages_crawled
    # final URL-seen set equality via hashes
    want = np.sort(np.array([hash64(u) for u in golden.seen],
                            dtype=np.uint64))
    assert np.array_equal(res.seen_hashes, want)


def test_bfs_max_pages(ray_session, tmp_path):
    golden = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=3, max_pages=9)
    res = _run_engine(tmp_path, strategy="bfs", max_depth=3, max_pages=9)
    assert _order_key(res.order) == _order_key(golden.order)
    assert res.pages_crawled == golden.pages_crawled
    want = np.sort(np.array([hash64(u) for u in golden.seen],
                            dtype=np.uint64))
    assert np.array_equal(res.seen_hashes, want)


def test_bfs_with_filter_and_scorer(ray_session, tmp_path):
    flt = lambda u: "cat1" not in u
    scorer = lambda u: -float(len(u))  # prefer short urls; negative scores
    golden = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=3,
                        filter_fn=flt, scorer_fn=scorer, max_pages=12)
    cfg = CrawlConfig(strategy="bfs", max_depth=3, max_pages=12,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                      filter_fn=flt, scorer_fn=scorer)
    res = eng.run(SITE.seed_urls()[:2])
    assert _order_key(res.order) == _order_key(golden.order)
    want = np.sort(np.array([hash64(u) for u in golden.seen],
                            dtype=np.uint64))
    assert np.array_equal(res.seen_hashes, want)


def test_bfs_include_external_matches_oracle(ray_session, tmp_path):
    """Cross-host expansion: external links (different registrable domain)
    enter the frontier after internal ones, in reference order."""
    # cross-host links live on product pages (depth 3) → external hosts
    # enter the crawl at depth 4
    golden = oracle_bfs(SITE, SITE.seed_urls()[:1], max_depth=4,
                        include_external=True)
    cfg = CrawlConfig(strategy="bfs", max_depth=4, include_external=True,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    res = eng.run(SITE.seed_urls()[:1])
    assert _order_key(res.order) == _order_key(golden.order)
    hosts = {r["url"].split("/")[2] for r in res.order}
    assert len(hosts) > 1, "external links crossed hosts"
    want = np.sort(np.array([hash64(u) for u in golden.seen],
                            dtype=np.uint64))
    assert np.array_equal(res.seen_hashes, want)


def test_best_first_matches_oracle(ray_session, tmp_path):
    scorer = lambda u: float(u.count("/"))  # shallow-first
    golden = oracle_best_first(SITE, SITE.seed_urls()[:2], max_depth=3,
                               scorer_fn=scorer)
    cfg = CrawlConfig(strategy="best_first", max_depth=3,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                      scorer_fn=scorer)
    res = eng.run(SITE.seed_urls()[:2])
    assert _order_key(res.order) == _order_key(golden.order)
    want = np.sort(np.array([hash64(u) for u in golden.seen],
                            dtype=np.uint64))
    assert np.array_equal(res.seen_hashes, want)


def test_best_first_max_pages(ray_session, tmp_path):
    golden = oracle_best_first(SITE, SITE.seed_urls()[:2], max_depth=3,
                               max_pages=13)
    cfg = CrawlConfig(strategy="best_first", max_depth=3, max_pages=13,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    res = eng.run(SITE.seed_urls()[:2])
    assert _order_key(res.order) == _order_key(golden.order)
    assert res.pages_crawled == golden.pages_crawled


def test_span_sequence_equality(ray_session, tmp_path):
    """Per-row span-sequence invariant (kind, text, media_ref, order) of
    every emitted document vs the oracle's parse of the same page."""
    import ray.data as rd

    golden = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=2)
    res = _run_engine(tmp_path, strategy="bfs", max_depth=2)
    docs = rd.read_parquet(res.docs_dir,
                           columns=["url", "success", "spans"]).to_pandas()
    assert len(docs) == len(golden.order)
    checked = 0
    for _, row in docs.iterrows():
        if not row["success"]:
            continue
        want = golden.docs[row["url"]]["spans"]
        got = [dict(s) for s in row["spans"]]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want
        ], f"span mismatch for {row['url']}"
        checked += 1
    assert checked == golden.pages_crawled


def test_best_first_resume_identical(ray_session, tmp_path):
    ck = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "o1")
    scorer = lambda u: float(u.count("/"))
    cfg = CrawlConfig(strategy="best_first", max_depth=3, checkpoint_dir=ck,
                      out_dir=out1, n_seen_shards=2, fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                      scorer_fn=scorer)
    full = eng.run(SITE.seed_urls()[:2])

    import os

    kept = 2
    for name in sorted(os.listdir(ck)):
        if name.startswith("superstep=") and int(name.split("=")[1]) > kept:
            shutil.rmtree(os.path.join(ck, name))
    eng2 = CrawlEngine(CrawlConfig(strategy="best_first", max_depth=3,
                                   checkpoint_dir=ck, out_dir=out1,
                                   n_seen_shards=2, fetch_concurrency=2),
                       fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                       scorer_fn=scorer)
    resumed = eng2.run(SITE.seed_urls()[:2], resume=True)
    assert _order_key(resumed.order) == _order_key(full.order)
    assert np.array_equal(resumed.seen_hashes, full.seen_hashes)


def test_bfs_resume_identical(ray_session, tmp_path):
    """Kill-and-resume reproduces identical final state (checkpoint gate)."""
    ck = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "o1")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, checkpoint_dir=ck,
                      out_dir=out1, n_seen_shards=2, fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    full = eng.run(SITE.seed_urls()[:2])

    # simulate a crash after superstep 1: drop later checkpoints, resume
    import os

    for name in sorted(os.listdir(ck)):
        if name.startswith("superstep=") and int(name.split("=")[1]) > 1:
            shutil.rmtree(os.path.join(ck, name))
    cfg2 = CrawlConfig(strategy="bfs", max_depth=3, checkpoint_dir=ck,
                       out_dir=out1, n_seen_shards=2, fetch_concurrency=2)
    eng2 = CrawlEngine(cfg2, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    resumed = eng2.run(SITE.seed_urls()[:2], resume=True)
    assert _order_key(resumed.order) == _order_key(full.order)
    assert np.array_equal(resumed.seen_hashes, full.seen_hashes)
    assert resumed.pages_crawled == full.pages_crawled
