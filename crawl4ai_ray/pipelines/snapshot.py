"""Crawl snapshot diff — re-crawl change detection.

The monitoring question every crawl operator asks between runs: which
pages appeared, disappeared, or changed?  ``crawl_snapshot_diff``
crawls the synthetic site twice under two deterministic configs (the
second adds a category and drops a product per subcategory, so all
four classes occur), fingerprints each page's markdown with md5, and
classifies every URL as ``added`` / ``removed`` / ``changed`` /
``same`` via one FULL OUTER join on url.

Reference surface: cbwinslow/crawl4ai's CacheMode + content hashing
enable single-page change checks (async_database stores the page by
url); this operator is the corpus-level diff those primitives imply,
expressed as a Dataset join.

Scale shape: each side reduces to (url, md5) inside ``map_batches``
(markdown never crosses the exchange — 16-byte digests do); the diff
is one url-keyed full_outer join; the per-side fingerprint tables are
dumped for the SQL oracle, which re-derives the classification
independently (self-dump hard gate, the graph-query convention).
"""

from __future__ import annotations

import hashlib
import tempfile

import pyarrow as pa
import ray.data as rd


def _fingerprints(docs_dir: str):
    ds = rd.read_parquet(docs_dir, columns=["url", "markdown"])

    def fp(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        mds = batch.column("markdown").to_pylist()
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "md5": pa.array(
                [hashlib.md5((m or "").encode()).hexdigest()
                 for m in mds], pa.string()),
        })

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=4096)


def _crawl_once(site_cfg, tag: str):
    from ..sources.synthetic_web import SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix=f"c4r_snap_{tag}_")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg,
                      fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    return res.docs_dir


def crawl_snapshot_diff(sf_dir: str, *, dump=None):
    """(url, change) for every URL in either snapshot, ordered by url.
    ``dump`` receives the two fingerprint tables (side, url, md5) so
    the oracle recomputes the FULL OUTER classification from scratch."""
    from ..sources.synthetic_web import SiteConfig

    cfg_a = SiteConfig(n_hosts=4)
    cfg_b = SiteConfig(n_hosts=4, base_cats=4, base_products=4)
    a = _fingerprints(_crawl_once(cfg_a, "a"))
    b = _fingerprints(_crawl_once(cfg_b, "b"))

    if dump is not None:
        import ray as _ray

        a_tbl = pa.concat_tables(
            [_ray.get(r) for r in a.to_arrow_refs()])
        b_tbl = pa.concat_tables(
            [_ray.get(r) for r in b.to_arrow_refs()])
        side = (["a"] * len(a_tbl)) + (["b"] * len(b_tbl))
        both = pa.concat_tables([a_tbl, b_tbl])
        dump(both.append_column("side", pa.array(side, pa.string())))
        a, b = rd.from_arrow(a_tbl), rd.from_arrow(b_tbl)

    from .dedup import _join_parts

    j = a.join(b, "full_outer", num_partitions=_join_parts(a, b),
               on=("url",), left_suffix="_a", right_suffix="_b")

    def classify(batch: pa.Table) -> pa.Table:
        import numpy as np

        ma = batch.column("md5_a").to_pylist()
        mb = batch.column("md5_b").to_pylist()
        out = np.where(
            [x is None for x in ma], "added",
            np.where([x is None for x in mb], "removed",
                     np.where([x != y for x, y in zip(ma, mb)],
                              "changed", "same")))
        return pa.table({
            "url": batch.column("url"),
            "change": pa.array(out.tolist(), pa.string()),
        })

    return j.map_batches(classify, batch_format="pyarrow").sort("url")


def crawl_recrawl_schedule(sf_dir: str, *, dump=None):
    """Recrawl scheduling from change history (Cho & Garcia-Molina,
    TOIT 2003): crawl the synthetic site under THREE deterministic
    configs (three "visits"), fingerprint every page, and estimate
    each URL's Poisson change rate with the bias-corrected estimator
    λ̂ = −ln((n − X + 0.5)/(n + 0.5)) over its n consecutive-visit
    observations with X observed changes — the statistic a frequency-
    aware scheduler orders its frontier by (pages changing every
    visit get λ̂ ≈ ln(2n+1); never-changing pages get λ̂ ≈ ln(1+1/n)
    ≈ small). Pages must appear in BOTH visits of a pair to be an
    observation; URLs seen in only one snapshot emit n = 0 and
    priority −1 (new/ephemeral — schedule by discovery policy, not
    change rate).

    Scale shape: each visit reduces to (url, md5) digests inside
    map_batches (markdown never crosses the exchange); the history
    assembles with ONE groupby(url).map_groups over ≤3-row groups.
    The SQL oracle recomputes every pair comparison and the λ̂ law
    from the dumped (side, url, md5) table independently."""
    import math

    import numpy as np

    from ..sources.synthetic_web import SiteConfig

    cfgs = [SiteConfig(n_hosts=4),
            SiteConfig(n_hosts=4, base_cats=4, base_products=4),
            SiteConfig(n_hosts=4, base_cats=4, base_products=3)]
    sides = []
    for i, cfg in enumerate(cfgs):
        fp = _fingerprints(_crawl_once(cfg, f"v{i}"))
        sides.append(fp.map_batches(
            lambda t, i=i: t.append_column(
                "side", pa.array(np.full(t.num_rows, i,
                                         dtype=np.int64))),
            batch_format="pyarrow"))
    hist = sides[0].union(*sides[1:]).materialize()

    if dump is not None:
        import ray as _ray

        dump(pa.concat_tables(
            [_ray.get(r) for r in hist.to_arrow_refs()]))

    def score(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group.column("side").to_pylist(),
                          group.column("md5").to_pylist()))
        by_side = dict(rows)
        n = x = 0
        for a, b in ((0, 1), (1, 2)):
            if a in by_side and b in by_side:
                n += 1
                if by_side[a] != by_side[b]:
                    x += 1
        if n == 0:
            lam, pri = 0.0, -1.0
        else:
            lam = -math.log((n - x + 0.5) / (n + 0.5))
            pri = lam
        return pa.table({
            "url": pa.array([group.column("url")[0].as_py()],
                            pa.string()),
            "n_visits": pa.array([group.num_rows], pa.int64()),
            "n_obs": pa.array([n], pa.int64()),
            "n_changes": pa.array([x], pa.int64()),
            # + 0.0 collapses IEEE −0.0 (−ln(1) on never-changed
            # pages) to +0.0 — byte-stable for the driver value hash
            "change_rate": pa.array([round(lam, 6) + 0.0],
                                    pa.float64()),
            "priority": pa.array([round(pri, 6) + 0.0],
                                 pa.float64())})

    return hist.groupby("url").map_groups(
        score, batch_format="pyarrow").sort("url")


def crawl_sitemap_coverage(sf_dir: str, *, dump=None):
    """Sitemap-vs-crawl coverage audit: the operational question after
    any seeded crawl — which sitemap-advertised URLs did the crawler
    actually reach, and what did it discover that the sitemaps never
    listed? Per host: n_sitemap, n_crawled, n_both, sitemap-only,
    crawl-only, and coverage = both / sitemap.

    Scale shape: the sitemap side streams through the SitemapSeeder
    actor pool; the crawl side reduces to canonical URLs inside
    map_batches; each side local-dedups, ONE url-keyed full_outer
    join classifies, and the per-host aggregate is a bounded groupby.
    The SQL oracle recomputes the classification AND the aggregate
    from the dumped (side, url) rows."""
    import numpy as np

    from ..sources.seeder import SitemapSeeder, _dedupe_urls
    from ..sources.synthetic_web import SiteConfig

    site_cfg = SiteConfig(n_hosts=4)
    seeds = rd.from_items([{"domain": site_cfg.host(k)}
                           for k in range(site_cfg.n_hosts)])
    sm = _dedupe_urls(seeds.map_batches(
        SitemapSeeder,
        fn_constructor_kwargs={"site_cfg": site_cfg.__dict__,
                               "pattern": "*"},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).materialize())

    docs_dir = _crawl_once(site_cfg, "cov")
    crawled = rd.read_parquet(docs_dir, columns=["url"])

    def sm_side(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        return pa.table({"url": pa.array(sorted(set(urls)),
                                         pa.string()),
                         "in_sm": pa.array(
                             np.ones(len(set(urls)), np.int64))})

    def cr_side(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        return pa.table({"url": pa.array(sorted(set(urls)),
                                         pa.string()),
                         "in_cr": pa.array(
                             np.ones(len(set(urls)), np.int64))})

    a = sm.map_batches(sm_side, batch_format="pyarrow").materialize()
    b = crawled.map_batches(cr_side,
                            batch_format="pyarrow").materialize()

    if dump is not None:
        from .graph import ray_get_tables

        at = pa.concat_tables(ray_get_tables(a))
        bt = pa.concat_tables(ray_get_tables(b))
        dump(pa.table({
            "side": pa.array(["s"] * at.num_rows
                             + ["c"] * bt.num_rows, pa.string()),
            "url": pa.concat_arrays(
                [at.column("url").combine_chunks().cast(pa.string()),
                 bt.column("url").combine_chunks().cast(pa.string())]),
        }))

    from .dedup import _join_parts

    j = a.join(b, "full_outer", num_partitions=_join_parts(a, b),
               on=("url",))

    def per_host(batch: pa.Table) -> pa.Table:
        import pandas as pd

        urls = batch.column("url").to_pylist()
        host = [u.split("/", 3)[2] if "://" in u else "" for u in urls]
        in_s = np.array([v is not None for v in
                         batch.column("in_sm").to_pylist()])
        in_c = np.array([v is not None for v in
                         batch.column("in_cr").to_pylist()])
        df = pd.DataFrame({
            "host": host,
            "n_sitemap": in_s.astype(np.int64),
            "n_crawled": in_c.astype(np.int64),
            "n_both": (in_s & in_c).astype(np.int64),
            "n_sitemap_only": (in_s & ~in_c).astype(np.int64),
            "n_crawl_only": (~in_s & in_c).astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("host", as_index=False).sum(),
            preserve_index=False)

    from ray.data.aggregate import Sum

    g = j.map_batches(per_host, batch_format="pyarrow") \
        .groupby("host") \
        .aggregate(Sum("n_sitemap", alias_name="n_sitemap"),
                   Sum("n_crawled", alias_name="n_crawled"),
                   Sum("n_both", alias_name="n_both"),
                   Sum("n_sitemap_only", alias_name="n_sitemap_only"),
                   Sum("n_crawl_only", alias_name="n_crawl_only"))

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_sitemap").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nb = t.column("n_both").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cov = np.where(ns > 0, nb / np.maximum(ns, 1.0), -1.0)
        return t.append_column(
            "coverage", pa.array(np.round(cov, 6), pa.float64()))

    return g.map_batches(finish, batch_format="pyarrow").sort("host")
