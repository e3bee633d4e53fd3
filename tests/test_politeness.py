"""Politeness / robots scheduler tests: per-host budgets, ordering-stable
deferral, robots 403 semantics, backoff on 429/503, eventual completeness."""

import numpy as np
import pytest

from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb
from crawl4ai_ray.state.politeness import parse_robots, robots_allows


def test_parse_robots():
    txt = "User-agent: *\nDisallow: /cat0/sub1\nDisallow: /private\n"
    rules = parse_robots(txt)
    assert rules == ["/cat0/sub1", "/private"]
    assert not robots_allows(rules, "/cat0/sub1")
    assert not robots_allows(rules, "/cat0/sub1/p0.html")
    assert robots_allows(rules, "/cat0/sub0")
    assert robots_allows(parse_robots("User-agent: *\nDisallow:\n"), "/x")


SITE_CFG = SiteConfig(n_hosts=5)   # host 0 disallows /cat0/sub1 (mod 5)
SITE = SyntheticWeb(SITE_CFG)


def _run(tmp_path, *, politeness, **kw):
    cfg = CrawlConfig(
        strategy="bfs", max_depth=3, out_dir=str(tmp_path / "out"),
        n_seen_shards=2, fetch_concurrency=2, politeness=politeness,
        politeness_partitions=2, superstep_seconds=4.0, **kw,
    )
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    return eng.run(SITE.seed_urls())


def test_politeness_budget_and_completeness(ray_session, tmp_path):
    polite = _run(tmp_path, politeness=True)
    plain = _run(tmp_path / "plain", politeness=False)

    # (1) robots: host0's /cat0/sub1 subtree blocked with 403, no discovery
    blocked = [r for r in polite.order if r["status"] == 403]
    assert blocked, "expected robots-blocked rows"
    assert all(r["url"].startswith("http://h0000.test/cat0/sub1")
               for r in blocked)
    fetched_urls = {r["url"] for r in polite.order if r["success"]}
    # products under the blocked sub are never discovered
    assert not any(u.startswith("http://h0000.test/cat0/sub1/")
                   for u in fetched_urls)

    # (2) budget: with delay=base_lo=1.0s and 4.0s supersteps, at most 4
    # successful fetches per host per superstep
    from collections import Counter

    per = Counter()
    for r in polite.order:
        if r["success"]:
            host = r["url"].split("/")[2]
            per[(r["level"], host)] += 1
    assert max(per.values()) <= 4

    # (3) completeness: polite crawl reaches every page the plain crawl
    # reached except the robots-blocked subtree of host0
    plain_urls = {r["url"] for r in plain.order if r["success"]}
    expected = {
        u for u in plain_urls
        if not (u.startswith("http://h0000.test/cat0/sub1"))
    }
    assert fetched_urls == expected

    # (4) ordering-stable deferral: seq values are unique and every
    # deferred row retained its seq (order sorted by (level, seq) is
    # globally seq-sorted within a host)
    seqs = [r["seq"] for r in polite.order]
    assert len(seqs) == len(set(seqs))

    # (5) lineage exposes deferral counts
    assert any(l["deferred"] > 0 for l in polite.lineage)


def test_politeness_resume_restores_gate_state(ray_session, tmp_path):
    """Kill-and-resume with politeness on: final fetched set identical and
    robots/delay state survives the checkpoint (no duplicate fetches)."""
    import os
    import shutil as sh

    ck = str(tmp_path / "ck")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, politeness=True,
                      politeness_partitions=2, checkpoint_dir=ck,
                      out_dir=str(tmp_path / "o"), n_seen_shards=2,
                      fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    full = eng.run(SITE.seed_urls())

    for name in sorted(os.listdir(ck)):
        if name.startswith("superstep=") and int(name.split("=")[1]) > 2:
            sh.rmtree(os.path.join(ck, name))
    eng2 = CrawlEngine(CrawlConfig(strategy="bfs", max_depth=3,
                                   politeness=True, politeness_partitions=2,
                                   checkpoint_dir=ck,
                                   out_dir=str(tmp_path / "o"),
                                   n_seen_shards=2, fetch_concurrency=2),
                       fetcher_kwargs={"site_cfg": SITE_CFG.__dict__})
    resumed = eng2.run(SITE.seed_urls(), resume=True)
    full_fetched = sorted(r["url"] for r in full.order if r["success"])
    res_fetched = sorted(r["url"] for r in resumed.order if r["success"])
    assert res_fetched == full_fetched
    import numpy as np

    assert np.array_equal(resumed.seen_hashes, full.seen_hashes)


def test_politeness_backoff_on_503(ray_session, tmp_path):
    # larger site → some product pages are deterministic 503s; the run must
    # finish and record them as failures without killing their hosts' other
    # pages (unless > max_retries consecutive fails)
    site_cfg = SiteConfig(n_hosts=6, base_products=8, hot_hosts=3)
    site = SyntheticWeb(site_cfg)
    cfg = CrawlConfig(strategy="bfs", max_depth=3,
                      out_dir=str(tmp_path / "out"), n_seen_shards=2,
                      fetch_concurrency=2, politeness=True,
                      politeness_partitions=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__})
    res = eng.run(site.seed_urls())
    statuses = {r["status"] for r in res.order}
    assert 503 in statuses or 404 in statuses
    assert res.pages_crawled > 0
    assert res.supersteps >= 4  # deferral stretched the crawl
