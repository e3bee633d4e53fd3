"""Distributed PageRank vs driver power iteration (pipelines/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_ray.pipelines.graph import (
    crawl_pagerank,
    edges_from_docs,
    pagerank,
    pagerank_numpy,
)


def _run(edges, nodes, form="distributed", **kw):
    # default form="distributed" so the Pregel path stays oracle-gated
    # even though auto picks the driver path at toy sizes
    e = pa.table({"src": pa.array([s for s, _ in edges], pa.string()),
                  "dst": pa.array([d for _, d in edges], pa.string())})
    n = pa.table({"node": pa.array(nodes, pa.string())})
    df = pagerank(e, n, form=form, **kw).to_pandas()
    return dict(zip(df["node"], df["rank"]))


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_numpy_oracle():
    # a small graph with a dangling node (d), a hub (a), and a cycle
    nodes = list("abcde")
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("e", "a"), ("e", "d"), ("c", "d")]
    got = _run(edges, nodes)
    want = pagerank_numpy(edges, nodes)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_multi_edge_multiplicity():
    nodes = ["a", "b", "c"]
    single = _run([("a", "b"), ("a", "c")], nodes)
    double = _run([("a", "b"), ("a", "b"), ("a", "c")], nodes)
    assert double["b"] > single["b"]
    want = pagerank_numpy([("a", "b"), ("a", "b"), ("a", "c")], nodes)
    for k in want:
        assert abs(double[k] - want[k]) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_all_dangling_uniform():
    # no edges: every node dangles; uniform stationary distribution
    got = _run([], ["a", "b", "c"])
    assert all(abs(v - 1 / 3) < 1e-12 for v in got.values())


@pytest.mark.usefixtures("ray_session")
def test_pagerank_driver_form_equals_distributed():
    nodes = list("abcdefgh")
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("e", "a"), ("e", "d"), ("c", "d"), ("f", "g"),
             ("g", "f"), ("h", "a"), ("a", "h")]
    dist = _run(edges, nodes, form="distributed")
    drv = _run(edges, nodes, form="driver")
    auto = _run(edges, nodes, form="auto")   # picks driver at this size
    for k in dist:
        assert abs(dist[k] - drv[k]) < 1e-12, k
        assert abs(auto[k] - drv[k]) < 1e-15, k


@pytest.mark.usefixtures("ray_session")
def test_crawl_pagerank_query():
    df = crawl_pagerank("unused").to_pandas()
    assert len(df) > 20
    assert abs(df["rank"].sum() - 1.0) < 1e-4      # rounded to 8 dp
    # sorted by (-rank, node)
    assert list(df["rank"]) == sorted(df["rank"], reverse=True)
    # oracle: rebuild the same edges driver-side and power-iterate
    import tempfile

    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    cfg = CrawlConfig(strategy="bfs", max_depth=2,
                      out_dir=tempfile.mkdtemp(prefix="c4r_prq_"),
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges_ds, nodes_ds = edges_from_docs(res.docs_dir)
    epd = edges_ds.to_pandas()
    npd = nodes_ds.to_pandas()
    want = pagerank_numpy(list(zip(epd["src"], epd["dst"])),
                          list(npd["node"]))
    got = dict(zip(df["node"], df["rank"]))
    assert set(got) == set(want)
    err = max(abs(got[k] - want[k]) for k in want)
    assert err < 1e-6
