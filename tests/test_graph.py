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


@pytest.mark.usefixtures("ray_session")
def test_hits_matches_oracle_both_forms():
    from crawl4ai_ray.pipelines.graph import hits, hits_numpy

    nodes = list("abcdef")
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("e", "a"), ("e", "d"), ("c", "d"), ("a", "b")]
    e = pa.table({"src": pa.array([s for s, _ in edges], pa.string()),
                  "dst": pa.array([d for _, d in edges], pa.string())})
    n = pa.table({"node": pa.array(nodes, pa.string())})
    want_h, want_a = hits_numpy(edges, nodes)
    df = hits(e, n, form="driver").to_pandas().set_index("node")
    for k in nodes:
        assert abs(df.loc[k, "hub"] - want_h[k]) < 1e-9, ("driver", k)
        assert abs(df.loc[k, "authority"] - want_a[k]) < 1e-9, \
            ("driver", k)
    # distributed form: identical per-iteration semantics, checked at a
    # small fixed iteration count (each distributed iteration costs ~6
    # Ray rounds; convergence-length runs are the driver form's job)
    want_h6, want_a6 = hits_numpy(edges, nodes, max_iters=6)
    df = hits(e, n, form="distributed", max_iters=6).to_pandas() \
        .set_index("node")
    for k in nodes:
        assert abs(df.loc[k, "hub"] - want_h6[k]) < 1e-9, ("dist", k)
        assert abs(df.loc[k, "authority"] - want_a6[k]) < 1e-9, \
            ("dist", k)
    # hub mass concentrates on the multi-out-edge pages
    assert want_h["a"] == max(want_h.values())


@pytest.mark.usefixtures("ray_session")
def test_crawl_hits_query():
    from crawl4ai_ray.pipelines.graph import crawl_hits

    df = crawl_hits("unused").to_pandas()
    assert len(df) > 20
    # L2-normalized vectors (rounded to 8 dp)
    assert abs((df["hub"] ** 2).sum() - 1.0) < 1e-4
    assert abs((df["authority"] ** 2).sum() - 1.0) < 1e-4
    assert list(df["authority"]) == sorted(df["authority"], reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_matches_bruteforce():
    """Degree-ordered wedge join == trace(A^3)/6 on random graphs,
    including multi-edges, self-loops and both edge directions."""
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import triangle_count

    rng = np.random.default_rng(7)
    n = 40
    for trial in range(3):
        m = int(rng.integers(30, 200))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        names = np.array([f"n{i:03d}" for i in range(n)])
        edges = rd.from_arrow(pa.table({
            "src": pa.array(names[src]), "dst": pa.array(names[dst])}))
        got = triangle_count(edges).to_pandas()

        A = np.zeros((n, n), dtype=np.int64)
        keep = src != dst
        A[src[keep], dst[keep]] = 1
        A = ((A + A.T) > 0).astype(np.int64)
        want = int(np.trace(A @ A @ A) // 6)
        assert int(got["n_triangles"][0]) == want, (trial, m)
        assert int(got["n_edges"][0]) == int(A.sum() // 2)


@pytest.mark.usefixtures("ray_session")
def test_connected_components_matches_union_find():
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import connected_components

    rng = np.random.default_rng(11)
    n = 30
    names = [f"n{i:03d}" for i in range(n)]
    for trial in range(3):
        m = int(rng.integers(5, 40))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        edges = rd.from_arrow(pa.table({
            "src": pa.array([names[i] for i in src]),
            "dst": pa.array([names[i] for i in dst])}))
        nodes = rd.from_arrow(pa.table({"node": pa.array(names)}))
        # pin the Pregel loop — the auto gate would route this toy
        # graph to the union-find form and test it against itself
        got = connected_components(edges, nodes,
                                   form="distributed").to_pandas() \
            .set_index("node")["component"].to_dict()
        got_drv = connected_components(edges, nodes,
                                       form="driver").to_pandas() \
            .set_index("node")["component"].to_dict()
        assert got_drv == got

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(src, dst):
            parent[find(a)] = find(b)
        comp = {}
        for i in range(n):
            comp.setdefault(find(i), []).append(i)
        want = {}
        for members in comp.values():
            rep = names[min(members)]
            for i in members:
                want[names[i]] = rep
        assert got == want, trial


@pytest.mark.usefixtures("ray_session")
def test_hop_distance_matches_numpy_bfs():
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import hop_distance

    rng = np.random.default_rng(23)
    n = 25
    names = [f"n{i:03d}" for i in range(n)]
    for trial in range(3):
        m = int(rng.integers(10, 60))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        n_seeds = int(rng.integers(1, 4))
        seed_idx = rng.choice(n, n_seeds, replace=False)
        edges = rd.from_arrow(pa.table({
            "src": pa.array([names[i] for i in src]),
            "dst": pa.array([names[i] for i in dst])}))
        nodes = rd.from_arrow(pa.table({"node": pa.array(names)}))
        seeds = [names[i] for i in seed_idx]

        # reference: plain BFS on the driver
        adj = {i: set() for i in range(n)}
        for a, b in zip(src, dst):
            adj[a].add(b)
        want = {nm: -1 for nm in names}
        frontier, d = set(seed_idx.tolist()), 0
        for i in frontier:
            want[names[i]] = 0
        while frontier:
            d += 1
            nxt = {v for u in frontier for v in adj[u]
                   if want[names[v]] == -1}
            for v in nxt:
                want[names[v]] = d
            frontier = nxt

        # pin BOTH forms — auto routes toy graphs to the driver path
        for form in ("distributed", "driver"):
            got = hop_distance(edges, nodes, seeds, form=form) \
                .to_pandas().set_index("node")["hops"].to_dict()
            assert got == want, (trial, form)


@pytest.mark.usefixtures("ray_session")
def test_crawl_hop_distance_equals_crawl_depth():
    """BFS with a first-discovery seen-set assigns depth = min-hop, so
    the graph primitive must re-derive the crawler's own layering for
    every fetched page."""
    import tempfile

    import ray.data as rd

    from crawl4ai_ray.functions import urlkit
    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawl4ai_ray.pipelines.graph import edges_from_docs, hop_distance
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site_cfg = SiteConfig(n_hosts=3)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_hoplaw_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={
        "site_cfg": site_cfg.__dict__}).run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    seeds = [urlkit.canonicalize(u, u) or u for u in site.seed_urls()]
    hops = hop_distance(edges, nodes, seeds).to_pandas() \
        .set_index("node")["hops"].to_dict()
    docs = rd.read_parquet(res.docs_dir, columns=["url", "depth"]) \
        .to_pandas()
    assert len(docs) == len(hops)
    for url, depth in zip(docs["url"], docs["depth"]):
        assert hops[url] == depth, url


def _coreness_reference(n, pairs):
    """Independent naive peeling: repeatedly remove all nodes with
    degree < k, for k = 1, 2, ...; coreness = last k at which the node
    survived."""
    adj = {i: set() for i in range(n)}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core = {i: 0 for i in range(n)}
    alive = set(range(n))
    k = 1
    while alive:
        while True:
            drop = {v for v in alive if len(adj[v] & alive) < k}
            if not drop:
                break
            alive -= drop
        for v in alive:
            core[v] = k
        k += 1
    return core


@pytest.mark.usefixtures("ray_session")
def test_coreness_matches_naive_peeling():
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import coreness

    rng = np.random.default_rng(31)
    n = 24
    names = [f"n{i:03d}" for i in range(n)]
    for trial in range(3):
        m = int(rng.integers(15, 80))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        edges = rd.from_arrow(pa.table({
            "src": pa.array([names[i] for i in src]),
            "dst": pa.array([names[i] for i in dst])}))
        nodes = rd.from_arrow(pa.table({"node": pa.array(names)}))
        want = {names[i]: c
                for i, c in _coreness_reference(
                    n, zip(src.tolist(), dst.tolist())).items()}
        for form in ("distributed", "driver"):
            got = coreness(edges, nodes, form=form).to_pandas() \
                .set_index("node")["coreness"].to_dict()
            assert got == want, (trial, form)


@pytest.mark.usefixtures("ray_session")
def test_weighted_sssp_matches_dijkstra():
    import heapq

    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import (_edge_weights_md5,
                                              weighted_sssp)

    rng = np.random.default_rng(47)
    n = 25
    names = [f"n{i:03d}" for i in range(n)]
    for trial in range(3):
        m = int(rng.integers(15, 70))
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        n_seeds = int(rng.integers(1, 4))
        seed_idx = rng.choice(n, n_seeds, replace=False)
        edges = rd.from_arrow(pa.table({
            "src": pa.array([names[i] for i in src]),
            "dst": pa.array([names[i] for i in dst])}))
        nodes = rd.from_arrow(pa.table({"node": pa.array(names)}))
        seeds = [names[i] for i in seed_idx]

        # reference: driver Dijkstra with the same md5 weight law
        w = _edge_weights_md5([names[i] for i in src],
                              [names[i] for i in dst])
        adj = {i: [] for i in range(n)}
        for a, b, ww in zip(src, dst, w):
            adj[a].append((b, int(ww)))
        INF = float("inf")
        dist = {i: INF for i in range(n)}
        pq = []
        for i in seed_idx:
            dist[int(i)] = 0
            heapq.heappush(pq, (0, int(i)))
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[u]:
                continue
            for v, ww in adj[u]:
                if d + ww < dist[v]:
                    dist[v] = d + ww
                    heapq.heappush(pq, (dist[v], v))
        want = {names[i]: (-1 if dist[i] == INF else int(dist[i]))
                for i in range(n)}

        got = weighted_sssp(edges, nodes, seeds) \
            .to_pandas().set_index("node")["cost"].to_dict()
        assert got == want, trial


@pytest.mark.usefixtures("ray_session")
def test_weighted_sssp_reachability_matches_hops():
    """cost == -1 exactly where hop_distance == -1, and cost >= hops
    everywhere reachable (weights are >= 1)."""
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import hop_distance, weighted_sssp

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "a", "x"],
        "dst": ["b", "c", "d", "d", "y"]}))
    nodes = rd.from_arrow(pa.table(
        {"node": ["a", "b", "c", "d", "x", "y", "z"]}))
    hops = hop_distance(edges, nodes, ["a"], form="distributed") \
        .to_pandas().set_index("node")["hops"]
    cost = weighted_sssp(edges, nodes, ["a"]) \
        .to_pandas().set_index("node")["cost"]
    for node in hops.index:
        if hops[node] == -1:
            assert cost[node] == -1, node
        else:
            assert cost[node] >= hops[node], node


@pytest.mark.usefixtures("ray_session")
def test_betweenness_matches_brandes_oracle():
    """Multi-pivot BSP Brandes == textbook driver Brandes from the
    SAME md5-lowest pivot set, on a crafted graph with branching
    shortest paths (sigma > 1) plus the crawl graph itself."""
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import (
        betweenness, betweenness_numpy, select_pivots_md5)

    # diamond + tail: two equal-length paths a->b->d / a->c->d then
    # d->e, plus a disconnected island x->y
    edges = rd.from_arrow(pa.table({
        "src": ["a", "a", "b", "c", "d", "x"],
        "dst": ["b", "c", "d", "d", "e", "y"]}))
    names = ["a", "b", "c", "d", "e", "x", "y"]
    nodes = rd.from_arrow(pa.table({"node": names}))
    pivots = select_pivots_md5(nodes.materialize(), 4)
    got = betweenness(edges, nodes, pivots) \
        .to_pandas().set_index("node")["btw"].to_dict()
    want = betweenness_numpy(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
         ("d", "e"), ("x", "y")], names, pivots)
    for v in names:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])


@pytest.mark.usefixtures("ray_session")
def test_crawl_betweenness_query():
    """Query entry runs end-to-end and matches the driver Brandes
    replay over the same crawl's edges and pivots."""
    import tempfile

    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawl4ai_ray.pipelines.graph import (
        betweenness_numpy, crawl_betweenness, edges_from_docs,
        select_pivots_md5)
    from crawl4ai_ray.sources.synthetic_web import (
        SiteConfig, SyntheticWeb)

    got_t = crawl_betweenness("/root/testdata/sf0.001").to_pandas()
    got = dict(zip(got_t["node"], got_t["btw"]))

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out = tempfile.mkdtemp(prefix="c4r_btw_oracle_")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, out_dir=out,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={
        "site_cfg": site_cfg.__dict__}).run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    edges = edges.materialize()
    nodes = nodes.materialize()
    ep = edges.to_pandas().drop_duplicates()
    all_nodes = nodes.to_pandas()["node"].tolist()
    pivots = select_pivots_md5(nodes, 8)
    want = betweenness_numpy(
        list(zip(ep["src"], ep["dst"])), all_nodes, pivots)
    assert len(got) == len(all_nodes)
    for v in all_nodes:
        assert abs(got[v] - want[v]) < 1e-6, v
    assert sum(1 for v in got.values() if v > 0) >= 5


@pytest.mark.usefixtures("ray_session")
def test_personalized_pagerank_matches_power_iteration():
    """Distributed PPR == dense numpy power iteration with the same
    teleport/dangling law, on a graph with a dangling node and a
    component unreachable from the seeds (must rank ~0)."""
    import ray.data as rd

    from crawl4ai_ray.pipelines.graph import (
        personalized_pagerank, personalized_pagerank_numpy)

    edge_list = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"),
                 ("x", "y")]
    names = ["a", "b", "c", "d", "x", "y"]
    edges = rd.from_arrow(pa.table({
        "src": [s for s, _ in edge_list],
        "dst": [d for _, d in edge_list]}))
    nodes = rd.from_arrow(pa.table({"node": names}))
    want = personalized_pagerank_numpy(edge_list, names, ["a"])
    for form in ("driver", "distributed"):
        got = personalized_pagerank(edges, nodes, ["a"], form=form) \
            .to_pandas().set_index("node")["rank"].to_dict()
        assert abs(sum(got.values()) - 1.0) < 1e-6, form
        for v in names:
            assert abs(got[v] - want[v]) < 1e-7, (form, v)
    # pages unreachable from the seed carry no PPR mass; d dangles
    # and its mass returns to the seed rather than vanishing
    assert got["x"] < 1e-9 and got["y"] < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_crawl_pagerank_personalized_query():
    from crawl4ai_ray.pipelines.graph import crawl_pagerank_personalized

    t = crawl_pagerank_personalized("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(t) > 0
    assert abs(t["rank"].sum() - 1.0) < 1e-5
    assert (t["rank"] >= 0).all()
    # ranks sorted desc by construction
    assert (np.diff(t["rank"].to_numpy()) <= 1e-12).all()
