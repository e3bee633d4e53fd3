"""Streaming hook: on_superstep fires per superstep with readable docs."""

import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

SITE_CFG = SiteConfig(n_hosts=3)
SITE = SyntheticWeb(SITE_CFG)


def test_on_superstep_hook(ray_session, tmp_path):
    events = []

    def hook(k, docs_dir, order_tbl):
        # docs for this superstep are already committed and readable
        import glob
        import os

        parts = glob.glob(os.path.join(docs_dir, "*.parquet"))
        n = sum(pq.read_metadata(p).num_rows for p in parts)
        events.append((k, n, order_tbl.num_rows if order_tbl is not None
                       else 0))

    cfg = CrawlConfig(strategy="bfs", max_depth=2,
                      out_dir=str(tmp_path / "o"), n_seen_shards=2,
                      fetch_concurrency=2)
    eng = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": SITE_CFG.__dict__},
                      on_superstep=hook)
    res = eng.run(SITE.seed_urls())
    assert len(events) == res.supersteps
    assert [e[0] for e in events] == list(range(res.supersteps))
    # per-superstep doc counts equal order counts, summing to total
    assert all(n == o for _, n, o in events)
    assert sum(n for _, n, _ in events) == res.urls_fetched
    # docs parquet no longer carries internal plumbing columns
    import glob
    import os

    part = glob.glob(os.path.join(res.docs_dir, "superstep=00000",
                                  "*.parquet"))[0]
    cols = set(pq.read_schema(part).names)
    assert "cand" not in cols
    assert {"url", "spans", "links", "markdown"} <= cols
