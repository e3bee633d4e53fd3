"""Frontier-table mode (frontier_mode='table') == driver mode, byte for
byte: crawl order, seqs, seen set, lineage counters — with the frontier
living as parquet between supersteps, candidates/order written task-side,
discovery fully distributed, and parents attached via a seq-keyed join."""

import os

import numpy as np
import pytest

from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

SITE_CFG = SiteConfig(n_hosts=4)
SITE = SyntheticWeb(SITE_CFG)


def _run(mode, out_dir, *, scorer=None, **kw):
    cfg = CrawlConfig(strategy="bfs", max_depth=3, out_dir=str(out_dir),
                      n_seen_shards=2, fetch_concurrency=2,
                      frontier_mode=mode, **kw)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                      scorer_fn=scorer)
    return eng.run(SITE.seed_urls())


def _key(rows):
    return [(r["url"], r["seq"], r["level"], r["status"]) for r in rows]


def _assert_equal(a, b):
    assert _key(a.order) == _key(b.order)
    assert np.array_equal(a.seen_hashes, b.seen_hashes)
    assert a.pages_crawled == b.pages_crawled
    assert [l["skipped_seen"] for l in a.lineage] == \
        [l["skipped_seen"] for l in b.lineage]
    assert [l["discovered"] for l in a.lineage] == \
        [l["discovered"] for l in b.lineage]


def test_table_mode_matches_driver(ray_session, tmp_path):
    drv = _run("driver", tmp_path / "drv")
    tab = _run("table", tmp_path / "tab")
    assert len(tab.order) > 0
    _assert_equal(tab, drv)
    # frontier/cand/order parquet exist per superstep
    for sub in ("frontier", "cand", "order"):
        assert os.path.isdir(tmp_path / "tab" / sub)
    assert tab.order_dir.endswith("order")


def test_table_mode_max_pages_and_scorer(ray_session, tmp_path):
    def scorer(url):
        return float(len(url) % 7)

    for mp, sc, tag in [(9, None, "a"), (9, scorer, "b"), (25, scorer, "c")]:
        drv = _run("driver", tmp_path / f"drv{tag}", max_pages=mp,
                   scorer=sc)
        tab = _run("table", tmp_path / f"tab{tag}", max_pages=mp,
                   scorer=sc)
        _assert_equal(tab, drv)


def test_table_mode_docs_match(ray_session, tmp_path):
    import ray.data as rd

    drv = _run("driver", tmp_path / "drv")
    tab = _run("table", tmp_path / "tab")
    d1 = rd.read_parquet(drv.docs_dir).to_pandas().sort_values("seq")
    d2 = rd.read_parquet(tab.docs_dir).to_pandas().sort_values("seq")
    assert list(d1["url"]) == list(d2["url"])
    assert list(d1["depth"]) == list(d2["depth"])


def test_table_mode_collect_order_off(ray_session, tmp_path):
    tab = _run("table", tmp_path / "tab", collect_order=False)
    assert tab.order == []           # not materialized on the driver
    assert tab.urls_fetched > 0
    import pyarrow.parquet as pq

    parts = [
        pq.read_table(os.path.join(tab.order_dir, d, f))
        for d in sorted(os.listdir(tab.order_dir))
        for f in sorted(os.listdir(os.path.join(tab.order_dir, d)))
    ]
    assert sum(p.num_rows for p in parts) == tab.urls_fetched


def test_table_mode_politeness_raises(ray_session, tmp_path):
    with pytest.raises(ValueError, match="politeness"):
        _run("table", tmp_path / "x", politeness=True)


def test_table_mode_checkpoint_resume(ray_session, tmp_path):
    import shutil

    full = _run("table", tmp_path / "full",
                checkpoint_dir=str(tmp_path / "full_ckpt"))
    # fresh run with checkpoints, then truncate to superstep 1 and resume
    _run("table", tmp_path / "part",
         checkpoint_dir=str(tmp_path / "part_ckpt"))
    for name in sorted(os.listdir(tmp_path / "part_ckpt")):
        if name.startswith("superstep=") and int(name.split("=")[1]) > 1:
            shutil.rmtree(tmp_path / "part_ckpt" / name)
    cfg = CrawlConfig(strategy="bfs", max_depth=3,
                      out_dir=str(tmp_path / "part"), n_seen_shards=2,
                      fetch_concurrency=2, frontier_mode="table",
                      checkpoint_dir=str(tmp_path / "part_ckpt"))
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    resumed = eng.run(SITE.seed_urls(), resume=True)
    assert _key(resumed.order) == _key(full.order)
    assert np.array_equal(resumed.seen_hashes, full.seen_hashes)


# -- best-first (priority pool as parquet fragments + tombstones) ------------


def _run_bff(mode, out_dir, *, resume=False, seeds=None, **kw):
    cfg = CrawlConfig(strategy="best_first", max_depth=3,
                      out_dir=str(out_dir), n_seen_shards=2,
                      fetch_concurrency=2, frontier_mode=mode, **kw)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                      scorer_fn=lambda url: float(len(url) % 7))
    return eng.run(seeds or SITE.seed_urls(), resume=resume)


def _assert_bff_equal(a, b):
    # driver mode reports lineage 'discovered' as 0 (reference parity);
    # table mode reports the appended count — compare the rest
    assert _key(a.order) == _key(b.order)
    assert np.array_equal(a.seen_hashes, b.seen_hashes)
    assert a.pages_crawled == b.pages_crawled
    assert [l["skipped_seen"] for l in a.lineage] == \
        [l["skipped_seen"] for l in b.lineage]


def test_bff_table_matches_driver(ray_session, tmp_path):
    drv = _run_bff("driver", tmp_path / "drv")
    tab = _run_bff("table", tmp_path / "tab")
    assert len(tab.order) > 0
    _assert_bff_equal(tab, drv)
    assert os.path.isdir(tmp_path / "tab" / "pool")


def test_bff_table_max_pages_cap_law(ray_session, tmp_path):
    for mp, tag in [(9, "a"), (25, "b")]:
        drv = _run_bff("driver", tmp_path / f"drv{tag}", max_pages=mp)
        tab = _run_bff("table", tmp_path / f"tab{tag}", max_pages=mp)
        _assert_bff_equal(tab, drv)


def test_bff_table_compaction(ray_session, tmp_path):
    drv = _run_bff("driver", tmp_path / "drv")
    tab = _run_bff("table", tmp_path / "tab", pool_compact_min=4)
    _assert_bff_equal(tab, drv)
    gens = sorted(os.listdir(tmp_path / "tab" / "pool"))
    assert gens and gens[-1] != "gen=00000"    # compaction actually ran


def test_bff_table_docs_match(ray_session, tmp_path):
    import ray.data as rd

    drv = _run_bff("driver", tmp_path / "drv", max_pages=25)
    tab = _run_bff("table", tmp_path / "tab", max_pages=25)
    d1 = rd.read_parquet(drv.docs_dir).to_pandas().sort_values("seq")
    d2 = rd.read_parquet(tab.docs_dir).to_pandas().sort_values("seq")
    assert list(d1["url"]) == list(d2["url"])
    assert list(d1["depth"]) == list(d2["depth"])


def test_bff_table_crash_resume(ray_session, tmp_path):
    """Kill the run right after a distributed pool append (fragment on
    disk, checkpoint not yet committed) — resume from the LATEST committed
    checkpoint must replay to the exact full-run output, compaction on."""
    from crawl4ai_ray.pipelines import discovery

    kw = dict(max_pages=40, pool_compact_min=4)
    full = _run_bff("table", tmp_path / "full", **kw,
                    checkpoint_dir=str(tmp_path / "full_ckpt"))
    orig = discovery.bff_pool_append
    calls = {"n": 0}

    def crashing(*a, **kwargs):
        n = orig(*a, **kwargs)
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated crash after pool append")
        return n

    discovery.bff_pool_append = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            _run_bff("table", tmp_path / "part", **kw,
                     checkpoint_dir=str(tmp_path / "part_ckpt"))
    finally:
        discovery.bff_pool_append = orig
    resumed = _run_bff("table", tmp_path / "part", **kw, resume=True,
                       checkpoint_dir=str(tmp_path / "part_ckpt"))
    assert _key(resumed.order) == _key(full.order)
    assert np.array_equal(resumed.seen_hashes, full.seen_hashes)
    assert resumed.pages_crawled == full.pages_crawled


def test_bff_table_rewind_past_compaction_raises(ray_session, tmp_path):
    """Hand-rewinding checkpoints across a compaction (GC'd generation)
    must fail loudly, not resume wrong."""
    import shutil

    _run_bff("table", tmp_path / "x", max_pages=40, pool_compact_min=4,
             checkpoint_dir=str(tmp_path / "ckpt"))
    names = sorted(n for n in os.listdir(tmp_path / "ckpt")
                   if n.startswith("superstep="))
    assert len(names) > 3
    for name in names[2:]:
        shutil.rmtree(tmp_path / "ckpt" / name)
    with pytest.raises(RuntimeError, match="latest committed checkpoint"):
        _run_bff("table", tmp_path / "x", max_pages=40, pool_compact_min=4,
                 resume=True, checkpoint_dir=str(tmp_path / "ckpt"))


def test_bff_table_politeness_raises(ray_session, tmp_path):
    with pytest.raises(ValueError, match="politeness"):
        _run_bff("table", tmp_path / "x", politeness=True)


# ---------------------------------------------------------------------------
# round-4: frontier_mode='auto' — the size-gated switch resolves by
# expected crawl size and is byte-equal on BOTH sides of the boundary
# ---------------------------------------------------------------------------


def test_auto_mode_switch_boundary_byte_equal(ray_session, tmp_path):
    drv = _run("driver", tmp_path / "d")
    # just below the gate: auto resolves to driver
    lo = _run("auto", tmp_path / "lo", max_pages=200,
              frontier_auto_min_pages=201)
    # at/above the gate: auto resolves to table
    hi = _run("auto", tmp_path / "hi", max_pages=200,
              frontier_auto_min_pages=200)
    ref = _run("driver", tmp_path / "dmp", max_pages=200)
    _assert_equal(lo, ref)
    _assert_equal(hi, ref)
    # the hi run actually took the table path (parquet frontier on disk)
    assert os.path.isdir(tmp_path / "hi" / "frontier")
    assert not os.path.isdir(tmp_path / "lo" / "frontier")


def test_auto_mode_unbounded_resolves_table(ray_session, tmp_path):
    # unbounded crawls (the 100-TB shape) must not hold levels on the
    # driver: auto with max_pages=inf picks the parquet frontier
    res = _run("auto", tmp_path / "unb")
    assert os.path.isdir(tmp_path / "unb" / "frontier")
    drv = _run("driver", tmp_path / "unbd")
    _assert_equal(res, drv)


def test_auto_mode_politeness_resolves_driver(ray_session, tmp_path):
    # auto must not resolve into table mode's politeness error path
    res = _run("auto", tmp_path / "pol", politeness=True,
               check_robots=False)
    assert res.pages_crawled > 0
    assert not os.path.isdir(tmp_path / "pol" / "frontier")
