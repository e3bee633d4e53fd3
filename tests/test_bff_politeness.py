"""Best-first + politeness: budgets, robots 403s, completeness."""

from collections import Counter

from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

SITE_CFG = SiteConfig(n_hosts=5)   # host 0 disallows /cat0/sub1
SITE = SyntheticWeb(SITE_CFG)


def test_best_first_politeness(ray_session, tmp_path):
    cfg = CrawlConfig(strategy="best_first", max_depth=3,
                      out_dir=str(tmp_path / "o"), n_seen_shards=2,
                      fetch_concurrency=2, politeness=True,
                      politeness_partitions=2, superstep_seconds=3.0)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    polite = eng.run(SITE.seed_urls())

    plain = CrawlEngine(
        CrawlConfig(strategy="best_first", max_depth=3,
                    out_dir=str(tmp_path / "p"), n_seen_shards=2,
                    fetch_concurrency=2),
        fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
    ).run(SITE.seed_urls())

    # robots: host0 /cat0/sub1 blocked, subtree never fetched
    blocked = [r for r in polite.order if r["status"] == 403]
    assert blocked and all(
        r["url"].startswith("http://h0000.test/cat0/sub1") for r in blocked
    )
    fetched = {r["url"] for r in polite.order if r["success"]}
    assert not any(u.startswith("http://h0000.test/cat0/sub1/")
                   for u in fetched)

    # per-host budget: ≤3 successful fetches per host per superstep
    per = Counter()
    for r in polite.order:
        if r["success"]:
            per[(r["level"], r["url"].split("/")[2])] += 1
    assert max(per.values()) <= 3

    # completeness vs plain run minus the blocked subtree
    plain_urls = {r["url"] for r in plain.order if r["success"]}
    expected = {u for u in plain_urls
                if not u.startswith("http://h0000.test/cat0/sub1")}
    assert fetched == expected


def test_bff_resume_restores_deferred_and_gate(ray_session, tmp_path):
    """ADVICE r1: best-first checkpoints must persist politeness-deferred
    rows (marked seen at pop time — re-pooling would drop them) and gate
    state. Kill-and-resume must fetch the same URL set as the unbroken
    run."""
    import os
    import shutil as sh

    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=3)
    site = SyntheticWeb(site_cfg)

    def cfg(out):
        return CrawlConfig(strategy="best_first", max_depth=3,
                           politeness=True, politeness_partitions=2,
                           checkpoint_dir=str(tmp_path / "ck"),
                           out_dir=str(tmp_path / out), n_seen_shards=2,
                           fetch_concurrency=2, bff_batch_size=20)

    eng = CrawlEngine(cfg("a"), fetcher_kwargs={"site_cfg":
                                                site_cfg.__dict__})
    full = eng.run(site.seed_urls())
    assert any(l["frontier_in"] for l in full.lineage)

    ck = str(tmp_path / "ck")
    kept = [n for n in sorted(os.listdir(ck)) if n.startswith("superstep=")]
    assert len(kept) >= 3
    for name in kept:
        if int(name.split("=")[1]) > 1:
            sh.rmtree(os.path.join(ck, name))
    eng2 = CrawlEngine(cfg("b"), fetcher_kwargs={"site_cfg":
                                                 site_cfg.__dict__})
    resumed = eng2.run(site.seed_urls(), resume=True)
    full_fetched = sorted(r["url"] for r in full.order if r["success"])
    res_fetched = sorted(r["url"] for r in resumed.order if r["success"])
    assert res_fetched == full_fetched
    import numpy as np

    assert np.array_equal(resumed.seen_hashes, full.seen_hashes)
