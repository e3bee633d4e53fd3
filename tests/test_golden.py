"""Frozen golden fixtures — drift guard.

The engine-vs-oracle tests prove the two implementations agree, but a
symmetric semantic change (e.g. an accidental canonicalization tweak
applied to both) would pass them silently. These parquet snapshots of the
oracle's output on the canonical fixture site (SiteConfig(n_hosts=4),
2 seeds, depth 3) pin the absolute behavior. If a change here is
INTENTIONAL (e.g. a deliberate markdown-format change), regenerate the
fixtures with the script in this file's docstring and say so in the
commit:

    python - <<'EOF'
    ... (see git log for the generation snippet in tests/golden/) ...
    EOF
"""

import pyarrow.parquet as pq

from crawl4ai_ray.oracle import oracle_bfs
from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

SITE = SyntheticWeb(SiteConfig(n_hosts=4))
GOLD = "/root/repo/tests/golden"


def test_oracle_matches_frozen_order():
    res = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=3)
    want = pq.read_table(f"{GOLD}/bfs_order.parquet").to_pylist()
    got = res.order
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_oracle_matches_frozen_seen():
    res = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=3)
    want = pq.read_table(f"{GOLD}/bfs_seen.parquet").column("url").to_pylist()
    assert sorted(res.seen) == want


def test_oracle_matches_frozen_spans():
    res = oracle_bfs(SITE, SITE.seed_urls()[:2], max_depth=3)
    want = pq.read_table(f"{GOLD}/bfs_spans.parquet").to_pylist()
    got = []
    for url, doc in sorted(res.docs.items()):
        for s in doc["spans"]:
            got.append({"url": url, **s})
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)
