"""Link-graph analytics: distributed PageRank over crawl edges.

The reference scores URL authority with a keyword heuristic
(deep_crawling/scorers.py — M22 ``AuthorityScorer``); a corpus-scale
crawler wants the real thing: PageRank over the crawled link graph
(Page et al., 1999; the Pregel BSP formulation of Malewicz et al.,
SIGMOD 2010 — the same machinery as ``dedup.propagate_min_labels``).

Distributed shape (nothing driver-resident but scalar counters):

- edge weights ``1/outdeg(src)`` are attached ONCE up front (one
  groupby + one join), so each iteration ships only (dst, w·rank);
- one iteration = hash-join ranks into edges on ``src`` → per-batch
  combine → ``groupby(dst).sum`` → left-outer join back onto the node
  table (nodes without in-links keep the teleport base). Dangling-node
  mass (pages with no out-links) is one scalar aggregate per round,
  redistributed uniformly — the standard PageRank completion;
- convergence = L1 delta < tol, else ``max_iters`` bound. Each round
  is two shuffles of (node, float) rows — the operator's inherent
  exchange; block-count-sized join partitioning via ``_join_parts``.

Float sums commute only approximately: ranks are deterministic to
~1e-12 regardless of block order, and the query rounds to 8 decimals
so emitted tables are stable. The pytest oracle
(tests/test_graph.py) checks against a driver numpy power iteration
at 1e-9 and pins the top ranks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .dedup import _join_parts

__all__ = ["pagerank", "crawl_pagerank", "pagerank_numpy",
           "hits", "crawl_hits", "hits_numpy"]


def _cast_str(*cols):
    """map_batches fn casting named columns to plain string — join keys
    must agree in type across sides (docs parquet carries large_string
    urls; Ray's hash groupby emits string keys). Blocks are bounded far
    below the 2 GB string-offset limit, so plain string is safe
    per-block at any corpus scale."""
    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, t.column(c).cast(pa.string()))
        return t
    return fn


def _pr_parts(n_rows: int, *dss) -> int:
    """Join partition count; collapses to 1 when the smaller side is
    tiny. Ray 2.49's hash join builds each partition with a schema-less
    zero-column table when NO row of one side hashes into it, and the
    arrow join then fails with ``No match ... FieldRef`` — with few
    distinct keys (toy graphs) an all-empty partition is likely, so
    small inputs take the single-aggregator path. At corpus scale the
    key space saturates every partition and ``_join_parts`` applies."""
    if n_rows < 32768:
        return 1
    return _join_parts(*dss)


# Below this many edges the driver power iteration wins: each Ray
# round costs ~2 s of scheduling/shuffle setup regardless of size (the
# same measured crossover as pipelines/discovery.py's driver/distributed
# gate — small inputs lose to fixed per-round costs).
PAGERANK_DRIVER_MAX_EDGES = 2_000_000


def pagerank(edges_ds, nodes_ds, *, damping: float = 0.85,
             max_iters: int = 50, tol: float = 1e-8, form: str = "auto"):
    """PageRank over (src, dst) edges and a (node,) universe.

    Returns a Dataset (node, rank) with ranks summing to 1. Multi-edges
    count with multiplicity (a page linking twice votes twice — matches
    the adjacency-matrix formulation over raw link lists).

    ``form``: "distributed" = Pregel-style Dataset iteration (the
    corpus-scale path), "driver" = vectorized numpy power iteration
    after collecting the edge list (exact same update law; wins under
    ~2M edges where per-round Ray overhead dominates), "auto" picks by
    edge count. Both forms are oracle-equal (tests/test_graph.py)."""
    from ray.data.aggregate import Sum

    if isinstance(edges_ds, pa.Table):
        edges_ds = rd.from_arrow(edges_ds)
    if isinstance(nodes_ds, pa.Table):
        nodes_ds = rd.from_arrow(nodes_ds)
    edges_ds = edges_ds.map_batches(_cast_str("src", "dst"),
                                    batch_format="pyarrow")

    nodes = (nodes_ds.select_columns(["node"])
             .map_batches(_cast_str("node"), batch_format="pyarrow")
             .materialize())
    n_nodes = nodes.count()

    if form == "auto":
        n_e = edges_ds.count()
        form = ("driver" if n_e < PAGERANK_DRIVER_MAX_EDGES
                else "distributed")
    if form == "driver":
        return _pagerank_driver(edges_ds, nodes, n_nodes,
                                damping=damping, max_iters=max_iters,
                                tol=tol)
    if n_nodes == 0:
        return nodes.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    n_edges = edges_ds.count()
    if n_edges == 0:
        # every node dangles: closed form — the uniform distribution
        return nodes.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "rank": pa.array(
                                    np.full(t.num_rows, 1.0 / n_nodes))}),
            batch_format="pyarrow")

    # out-degree → per-edge weight, attached once
    edges_one = edges_ds.map_batches(
        lambda t: t.append_column("one",
                                  pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
    outdeg = (edges_one.groupby("src")
              .aggregate(Sum("one", alias_name="outdeg"))
              .select_columns(["src", "outdeg"]).materialize())

    n_join = _pr_parts(n_edges, edges_ds, outdeg)
    edges_w = (
        edges_ds.join(outdeg, "inner", n_join, on=("src",))
        .map_batches(
            lambda t: pa.table({
                "src": t.column("src"),
                "dst": t.column("dst"),
                "w": pa.array(1.0 / t.column("outdeg").to_numpy()
                              .astype(np.float64)),
            }),
            batch_format="pyarrow")
        .materialize()
    )

    # node table carries a static dangling flag (outdeg == 0)
    ranks = (
        nodes.join(outdeg.rename_columns({"src": "node"}), "left_outer",
                   _pr_parts(min(n_nodes, n_edges), nodes, outdeg),
                   on=("node",))
        .map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
                "dangling": pa.array(
                    [v is None for v in t.column("outdeg").to_pylist()]),
            }),
            batch_format="pyarrow")
        .materialize()
    )

    base = (1.0 - damping) / n_nodes

    for _ in range(max_iters):
        dangling_mass = ranks.map_batches(
            lambda t: pa.table({"dm": pa.array([
                float(np.sum(t.column("rank").to_numpy()
                             [t.column("dangling").to_numpy(
                                 zero_copy_only=False)]))])}),
            batch_format="pyarrow",
        ).sum("dm") or 0.0

        n = _pr_parts(min(n_edges, n_nodes), edges_w, ranks)
        contrib = (
            edges_w.join(
                ranks.select_columns(["node", "rank"])
                .rename_columns({"node": "src"}),
                "inner", n, on=("src",))
            .map_batches(
                lambda t: pa.table({
                    "dst": t.column("dst"),
                    "c": pa.array(t.column("w").to_numpy()
                                  * t.column("rank").to_numpy()),
                }),
                batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="in_sum"))
            .rename_columns({"dst": "node"})
            .select_columns(["node", "in_sum"])
        )

        extra = damping * dangling_mass / n_nodes

        def step(t: pa.Table) -> pa.Table:
            old = t.column("rank").to_numpy()
            in_sum = np.array(
                [v if v is not None else 0.0
                 for v in t.column("in_sum").to_pylist()], np.float64)
            new = base + damping * in_sum + extra
            return pa.table({
                "node": t.column("node"),
                "rank": pa.array(new),
                "dangling": t.column("dangling"),
                "delta": pa.array(np.abs(new - old)),
            })

        stepped = (
            ranks.join(contrib, "left_outer", n, on=("node",))
            .map_batches(step, batch_format="pyarrow")
            .materialize()
        )
        l1 = stepped.sum("delta") or 0.0
        ranks = stepped.select_columns(["node", "rank", "dangling"]) \
            .materialize()
        if l1 < tol:
            break

    return ranks.select_columns(["node", "rank"])


def _pagerank_driver(edges_ds, nodes, n_nodes, *, damping, max_iters,
                     tol):
    """Small-graph fast path: same update law, vectorized on the
    driver. One streaming pass collects (src, dst) integer codes; each
    iteration is two bincounts — no per-round Ray scheduling."""
    node_list = [r["node"] for r in nodes.iter_rows()]
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))
    idx = {u: i for i, u in enumerate(node_list)}
    srcs, dsts = [], []
    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        srcs.append(np.array(
            [idx[s] for s in b.column("src").to_pylist()], np.int64))
        dsts.append(np.array(
            [idx[d] for d in b.column("dst").to_pylist()], np.int64))
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    out = np.bincount(src, minlength=n_nodes).astype(np.float64)
    dangling = out == 0
    w = np.zeros(len(src))
    if len(src):
        w = 1.0 / out[src]
    rank = np.full(n_nodes, 1.0 / n_nodes)
    base = (1.0 - damping) / n_nodes
    for _ in range(max_iters):
        contrib = np.bincount(dst, weights=w * rank[src],
                              minlength=n_nodes)
        dm = rank[dangling].sum()
        new = base + damping * (contrib + dm / n_nodes)
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < tol:
            break
    return rd.from_arrow(pa.table({
        "node": pa.array(node_list, pa.string()),
        "rank": pa.array(rank)}))


def pagerank_numpy(edges: list[tuple[str, str]], nodes: list[str],
                   *, damping: float = 0.85, max_iters: int = 50,
                   tol: float = 1e-8) -> dict[str, float]:
    """Driver power iteration — the test oracle (same semantics:
    multi-edge multiplicity, uniform dangling redistribution)."""
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(max_iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += rank[idx[s]] / out[idx[s]]
        dm = rank[out == 0].sum()
        new = base + damping * (contrib + dm / n)
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return {u: float(rank[i]) for u, i in idx.items()}


def edges_from_docs(docs_dir: str):
    """(url, links) docs parquet → (src, dst) edge Dataset + (node,)
    universe (crawled pages only; links leaving the crawl set are
    dropped by the later inner join on dst ∈ nodes... kept simple:
    universe = crawled urls, edges filtered to it)."""
    docs = rd.read_parquet(docs_dir, columns=["url", "links"])

    def explode(t: pa.Table) -> pa.Table:
        from ..functions import urlkit

        srcs, dsts = [], []
        for url, links in zip(t.column("url").to_pylist(),
                              t.column("links").to_pylist()):
            for ln in links or []:
                # links is list<struct{href, text, title, internal}>
                href = ln["href"] if isinstance(ln, dict) else ln
                # the crawl canonicalizes before fetching, so node urls
                # are canonical; raw hrefs (tracking params, fragments)
                # must canonicalize the same way or the dst∈nodes
                # semi-join below silently drops real edges
                canon = urlkit.canonicalize(href, url)
                if canon is None:
                    continue
                srcs.append(url)
                dsts.append(canon)
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    edges = docs.map_batches(explode, batch_format="pyarrow")
    nodes = docs.map_batches(
        lambda t: pa.table(
            {"node": t.column("url").cast(pa.string())}),
        batch_format="pyarrow")
    # restrict edges to the crawled universe (semi-join on dst)
    edges = edges.materialize()
    n = _pr_parts(edges.count(), edges, nodes)
    edges_in = (edges.join(nodes.rename_columns({"node": "dst"}),
                           "inner", n, on=("dst",))
                .select_columns(["src", "dst"]))
    return edges_in, nodes


def crawl_pagerank(sf_dir: str, *, damping: float = 0.85,
                   form: str = "auto"):
    """Query entry: BFS-crawl the deterministic synthetic web, then
    PageRank its link graph. Returns (node, rank, in_rank_top) rounded
    to 8 decimals, sorted by (-rank, node) — stable across block
    orders. Rows-only; the numerical oracle is tests/test_graph.py."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_pagerank_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())

    ranks = pagerank(*edges_from_docs(res.docs_dir), damping=damping,
                     form=form)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "rank": pa.array(np.round(t.column("rank").to_numpy(), 8)),
        })

    return (ranks.map_batches(finish, batch_format="pyarrow")
            .sort(["rank", "node"], descending=[True, False]))


def hits(edges_ds, nodes_ds, *, max_iters: int = 50, tol: float = 1e-8,
         form: str = "auto"):
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over (src, dst)
    edges — the second classic link-analysis scorer next to PageRank
    (the reference's M22 authority scorer is a static domain dict; this
    computes authority from the actual crawl graph).

    Update law: a = A^T h then L2-normalize; h = A a then L2-normalize;
    converge on L1 delta of both vectors. Multi-edges count with
    multiplicity. Returns (node, hub, authority).

    Forms mirror ``pagerank``: "driver" collects integer-coded edges
    and runs two bincounts per iteration (wins under
    PAGERANK_DRIVER_MAX_EDGES); "distributed" runs each half-step as
    one hash join (scores into edges on the source side of the
    half-step) + one groupby-sum — the operator's inherent exchange,
    nothing driver-resident. Both oracle-equal (tests/test_graph.py).
    """
    from ray.data.aggregate import Sum

    if isinstance(edges_ds, pa.Table):
        edges_ds = rd.from_arrow(edges_ds)
    if isinstance(nodes_ds, pa.Table):
        nodes_ds = rd.from_arrow(nodes_ds)
    edges_ds = edges_ds.map_batches(_cast_str("src", "dst"),
                                    batch_format="pyarrow")
    nodes = (nodes_ds.select_columns(["node"])
             .map_batches(_cast_str("node"), batch_format="pyarrow")
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64())}))
    n_edges = edges_ds.count()
    if form == "auto":
        form = ("driver" if n_edges < PAGERANK_DRIVER_MAX_EDGES
                else "distributed")

    if form == "driver":
        node_list = [r["node"] for r in nodes.iter_rows()]
        idx = {u: i for i, u in enumerate(node_list)}
        srcs, dsts = [], []
        for b in edges_ds.iter_batches(batch_format="pyarrow"):
            srcs.append(np.array(
                [idx[s] for s in b.column("src").to_pylist()], np.int64))
            dsts.append(np.array(
                [idx[d] for d in b.column("dst").to_pylist()], np.int64))
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        h = np.full(n_nodes, 1.0 / np.sqrt(n_nodes))
        a = np.full(n_nodes, 1.0 / np.sqrt(n_nodes))
        for _ in range(max_iters):
            a_new = np.bincount(dst, weights=h[src], minlength=n_nodes)
            na = np.linalg.norm(a_new)
            a_new = a_new / na if na > 0 else a_new
            h_new = np.bincount(src, weights=a_new[dst],
                                minlength=n_nodes)
            nh = np.linalg.norm(h_new)
            h_new = h_new / nh if nh > 0 else h_new
            delta = np.abs(a_new - a).sum() + np.abs(h_new - h).sum()
            a, h = a_new, h_new
            if delta < tol:
                break
        return rd.from_arrow(pa.table({
            "node": pa.array(node_list, pa.string()),
            "hub": pa.array(h), "authority": pa.array(a)}))

    # distributed: scores live as a (node, hub, authority) Dataset;
    # each half-step is join + groupby-sum; norms are scalar aggregates
    edges_w = edges_ds.materialize()
    scores = nodes.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "hub": pa.array(np.full(t.num_rows,
                                    1.0 / np.sqrt(n_nodes))),
            "authority": pa.array(np.full(t.num_rows,
                                          1.0 / np.sqrt(n_nodes))),
        }), batch_format="pyarrow").materialize()

    def _half(scores_ds, key_from, key_to, col):
        """sum scores[col] of key_from-side endpoints onto key_to."""
        n = _pr_parts(min(n_edges, n_nodes), edges_w, scores_ds)
        return (
            edges_w.join(
                scores_ds.select_columns(["node", col])
                .rename_columns({"node": key_from}),
                "inner", n, on=(key_from,))
            .map_batches(
                lambda t: pa.table({
                    "node": t.column(key_to),
                    "s": t.column(col),
                }), batch_format="pyarrow")
            .groupby("node").aggregate(Sum("s", alias_name="s"))
        )

    def _apply(scores_ds, sums_ds, col, norm):
        n = _pr_parts(min(n_edges, n_nodes), scores_ds, sums_ds)
        other = "authority" if col == "hub" else "hub"

        def upd(t: pa.Table) -> pa.Table:
            s = np.array([v if v is not None else 0.0
                          for v in t.column("s").to_pylist()], np.float64)
            old = t.column(col).to_numpy()
            new = s / norm if norm > 0 else s
            return pa.table({
                "node": t.column("node"),
                col: pa.array(new),
                other: t.column(other),
                "delta": pa.array(np.abs(new - old)),
            })

        return (scores_ds.join(sums_ds, "left_outer", n, on=("node",))
                .map_batches(upd, batch_format="pyarrow").materialize())

    for _ in range(max_iters):
        # authority half-step: sum hub over in-edges
        a_sums = _half(scores, "src", "dst", "hub").materialize()
        na = float(np.sqrt(a_sums.map_batches(
            lambda t: pa.table({"q": pa.array(
                [float(np.sum(np.square(t.column("s").to_numpy())))])}),
            batch_format="pyarrow").sum("q") or 0.0))
        stepped = _apply(scores, a_sums, "authority", na)
        d1 = stepped.sum("delta") or 0.0
        scores = stepped.select_columns(
            ["node", "hub", "authority"]).materialize()
        # hub half-step: sum NEW authority over out-edges
        h_sums = _half(scores, "dst", "src", "authority").materialize()
        nh = float(np.sqrt(h_sums.map_batches(
            lambda t: pa.table({"q": pa.array(
                [float(np.sum(np.square(t.column("s").to_numpy())))])}),
            batch_format="pyarrow").sum("q") or 0.0))
        stepped = _apply(scores, h_sums, "hub", nh)
        d2 = stepped.sum("delta") or 0.0
        scores = stepped.select_columns(
            ["node", "hub", "authority"]).materialize()
        if d1 + d2 < tol:
            break
    return scores


def crawl_hits(sf_dir: str, *, form: str = "auto"):
    """Query entry: HITS over the same crawled link graph as
    crawl_pagerank. Rows rounded to 8 dp, sorted by (-authority,
    node)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_hits_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    scores = hits(*edges_from_docs(res.docs_dir), form=form)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "hub": pa.array(np.round(t.column("hub").to_numpy(), 8)),
            "authority": pa.array(
                np.round(t.column("authority").to_numpy(), 8)),
        })

    return (scores.map_batches(finish, batch_format="pyarrow")
            .sort(["authority", "node"], descending=[True, False]))


def hits_numpy(edges: list[tuple[str, str]], nodes: list[str],
               *, max_iters: int = 50, tol: float = 1e-8):
    """Per-edge-loop HITS oracle (same update/normalization laws,
    deliberately unvectorized for test independence)."""
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}, {}
    import math

    h = [1.0 / math.sqrt(n)] * n
    a = [1.0 / math.sqrt(n)] * n
    for _ in range(max_iters):
        a_new = [0.0] * n
        for s_, d_ in edges:
            a_new[idx[d_]] += h[idx[s_]]
        na = math.sqrt(sum(x * x for x in a_new))
        if na > 0:
            a_new = [x / na for x in a_new]
        h_new = [0.0] * n
        for s_, d_ in edges:
            h_new[idx[s_]] += a_new[idx[d_]]
        nh = math.sqrt(sum(x * x for x in h_new))
        if nh > 0:
            h_new = [x / nh for x in h_new]
        delta = sum(abs(x - y) for x, y in zip(a_new, a)) + \
            sum(abs(x - y) for x, y in zip(h_new, h))
        a, h = a_new, h_new
        if delta < tol:
            break
    return ({u: h[i] for u, i in idx.items()},
            {u: a[i] for u, i in idx.items()})


def triangle_count(edges_ds, *, dump=None):
    """Distributed triangle counting over a directed (src, dst) edge
    Dataset, treated as an undirected simple graph — the third classic
    link-graph analytic next to PageRank/HITS (local clustering, spam-
    farm detection).

    Shape (Suri & Vassilvitskii, WWW 2011 MapReduce triangle counting):
    (1) undirect + dedupe edges with one groupby; (2) per-node degrees
    from an endpoint explode + groupby; (3) orient every edge from its
    lower (degree, url) endpoint — a hub's out-degree collapses to its
    few higher-degree neighbors, bounding per-group wedge emission by
    the O(m^1.5) total of the degree-ordered algorithm; (4) wedge pairs
    per tail via bounded map_groups, lex-normalized; (5) one hash join
    against the lex edge table closes the wedges. Each triangle is
    counted exactly once (at its unique (degree, url)-minimal vertex).

    ``dump`` (self-dump oracle hook) receives the oriented and lex edge
    tables tagged by a ``kind`` column so SQL can re-run wedge+closure
    independently. Returns a one-row (n_nodes, n_edges, n_triangles)."""
    from ray.data.aggregate import Count, Sum

    def undirect(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pylist(), dtype=object)
        d = np.asarray(t.column("dst").to_pylist(), dtype=object)
        keep = s != d                     # self-loops close no triangle
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        return pa.table({"lo": pa.array(lo.tolist(), pa.string()),
                         "hi": pa.array(hi.tolist(), pa.string())})

    el = (edges_ds.map_batches(undirect, batch_format="pyarrow")
          .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
          .select_columns(["lo", "hi"])).materialize()
    n_edges = el.count()
    if n_edges == 0:
        if dump is not None:
            dump(pa.table({"kind": pa.array([], pa.string()),
                           "u": pa.array([], pa.string()),
                           "v": pa.array([], pa.string())}))
        return pa.table({"n_nodes": pa.array([0], pa.int64()),
                         "n_edges": pa.array([0], pa.int64()),
                         "n_triangles": pa.array([0], pa.int64())})

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("lo").combine_chunks().cast(pa.string()),
             t.column("hi").combine_chunks().cast(pa.string())])})

    deg = (el.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))) \
        .materialize()
    n_nodes = deg.count()

    n = _pr_parts(n_edges, el, deg)
    j = el.join(deg.rename_columns({"node": "lo", "deg": "deg_lo"}),
                "inner", n, on=("lo",))
    j = j.join(deg.rename_columns({"node": "hi", "deg": "deg_hi"}),
               "inner", n, on=("hi",))

    def orient(t: pa.Table) -> pa.Table:
        lo = np.asarray(t.column("lo").to_pylist(), dtype=object)
        hi = np.asarray(t.column("hi").to_pylist(), dtype=object)
        dl = t.column("deg_lo").to_numpy(zero_copy_only=False)
        dh = t.column("deg_hi").to_numpy(zero_copy_only=False)
        # lo is already the lex-lower url, so (deg, url) order reduces
        # to: lo leads unless its degree is strictly larger
        lo_first = dl <= dh
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        return pa.table({"u": pa.array(u.tolist(), pa.string()),
                         "v": pa.array(v.tolist(), pa.string())})

    ed = j.map_batches(orient, batch_format="pyarrow").materialize()
    if dump is not None:
        edt = pa.concat_tables(ray_get_tables(ed))
        elt = pa.concat_tables(ray_get_tables(el))
        dump(pa.concat_tables([
            edt.append_column("kind",
                              pa.array(["ed"] * edt.num_rows)),
            elt.rename_columns(["u", "v"]).append_column(
                "kind", pa.array(["el"] * elt.num_rows)),
        ]))

    def wedges(g: pa.Table) -> pa.Table:
        vs = np.sort(np.asarray(g.column("v").to_pylist(), dtype=object))
        k = len(vs)
        if k < 2:
            return pa.table({"lo": pa.array([], pa.string()),
                             "hi": pa.array([], pa.string())})
        ia, ib = np.triu_indices(k, k=1)
        return pa.table({"lo": pa.array(vs[ia].tolist(), pa.string()),
                         "hi": pa.array(vs[ib].tolist(), pa.string())})

    w = ed.groupby("u").map_groups(wedges, batch_format="pyarrow")
    closed = w.join(el, "inner", n, on=("lo", "hi"))
    n_tri = closed.count()
    return pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
    })


def ray_get_tables(ds) -> list:
    """Materialized Dataset -> list of non-empty Arrow tables (small
    results only: the dump tables are edge lists of the toy crawl
    graph). Empty blocks are dropped — Ray emits them as zero-COLUMN
    tables whose schema breaks concat_tables."""
    import ray

    ts = [ray.get(r) for r in ds.to_arrow_refs()]
    return [t for t in ts if t.num_rows > 0] or ts[:1]


def crawl_triangles(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web, count triangles in its
    undirected link graph. Self-dump SQL-gated when ``dump`` is set
    (the oriented + lex edge tables; DuckDB re-runs wedge generation
    and closure independently)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_tri_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return triangle_count(edges, dump=dump)


def clustering_coefficient(edges_ds, *, dump=None):
    """Per-node local clustering coefficient over a directed (src, dst)
    edge Dataset treated as an undirected simple graph — c(v) =
    2·tri(v) / (deg(v)·(deg(v)−1)), the Watts–Strogatz local measure
    (spam-farm / community-density signal next to PageRank and k-core).

    Shape: the same degree-oriented wedge machinery as
    ``triangle_count`` (Suri & Vassilvitskii, WWW 2011 — per-group
    wedge emission bounded by the O(m^1.5) total), except each closed
    wedge keeps its center so the triangle credits ALL THREE corners:
    explode every closed (u, lo, hi) row to three (node) rows, one
    groupby counts per-node triangles, and one left-outer join attaches
    them to the degree table (nodes on no triangle keep 0). Every step
    is a bounded map_batches / map_groups / groupby / join — nothing
    driver-resident.

    ``dump`` receives ONLY the lex undirected edge table (u < v), from
    which the SQL oracle recomputes degrees, triangles (triple
    self-join over ordered triples a<b<c) and the coefficient fully
    independently. Returns (node, degree, n_triangles, clustering)."""
    from ray.data.aggregate import Count

    def undirect(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pylist(), dtype=object)
        d = np.asarray(t.column("dst").to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        return pa.table({"lo": pa.array(lo.tolist(), pa.string()),
                         "hi": pa.array(hi.tolist(), pa.string())})

    el = (edges_ds.map_batches(undirect, batch_format="pyarrow")
          .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
          .select_columns(["lo", "hi"])).materialize()
    n_edges = el.count()
    if n_edges == 0:
        if dump is not None:
            dump(pa.table({"u": pa.array([], pa.string()),
                           "v": pa.array([], pa.string())}))
        return pa.table({"node": pa.array([], pa.string()),
                         "degree": pa.array([], pa.int64()),
                         "n_triangles": pa.array([], pa.int64()),
                         "clustering": pa.array([], pa.float64())})
    if dump is not None:
        dump(pa.concat_tables(ray_get_tables(el))
             .rename_columns(["u", "v"]))

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("lo").combine_chunks().cast(pa.string()),
             t.column("hi").combine_chunks().cast(pa.string())])})

    deg = (el.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="degree"))) \
        .materialize()

    n = _pr_parts(n_edges, el, deg)
    j = el.join(deg.rename_columns({"node": "lo", "degree": "deg_lo"}),
                "inner", n, on=("lo",))
    j = j.join(deg.rename_columns({"node": "hi", "degree": "deg_hi"}),
               "inner", n, on=("hi",))

    def orient(t: pa.Table) -> pa.Table:
        lo = np.asarray(t.column("lo").to_pylist(), dtype=object)
        hi = np.asarray(t.column("hi").to_pylist(), dtype=object)
        dl = t.column("deg_lo").to_numpy(zero_copy_only=False)
        dh = t.column("deg_hi").to_numpy(zero_copy_only=False)
        lo_first = dl <= dh
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        return pa.table({"u": pa.array(u.tolist(), pa.string()),
                         "v": pa.array(v.tolist(), pa.string())})

    ed = j.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pa.Table) -> pa.Table:
        # keep the wedge center u: a closed wedge credits u, lo AND hi
        u = g.column("u")[0].as_py()
        vs = np.sort(np.asarray(g.column("v").to_pylist(), dtype=object))
        k = len(vs)
        if k < 2:
            return pa.table({"ctr": pa.array([], pa.string()),
                             "lo": pa.array([], pa.string()),
                             "hi": pa.array([], pa.string())})
        ia, ib = np.triu_indices(k, k=1)
        return pa.table({"ctr": pa.array([u] * len(ia), pa.string()),
                         "lo": pa.array(vs[ia].tolist(), pa.string()),
                         "hi": pa.array(vs[ib].tolist(), pa.string())})

    w = ed.groupby("u").map_groups(wedges, batch_format="pyarrow")
    closed = w.join(el, "inner", n, on=("lo", "hi"))

    def corners(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column(c).combine_chunks().cast(pa.string())
             for c in ("ctr", "lo", "hi")])})

    tri = (closed.map_batches(corners, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="n_triangles")))

    out = deg.join(tri, "left_outer", n, on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tr = t.column("n_triangles").to_numpy(zero_copy_only=False)
        tr = np.where(np.isnan(tr.astype(np.float64)), 0,
                      np.nan_to_num(tr.astype(np.float64))).astype(
                          np.int64)
        denom = d.astype(np.float64) * (d - 1).astype(np.float64)
        c = np.where(d >= 2, 2.0 * tr / np.where(denom == 0, 1.0, denom),
                     0.0)
        return pa.table({
            "node": t.column("node").cast(pa.string()),
            "degree": pa.array(d, pa.int64()),
            "n_triangles": pa.array(tr, pa.int64()),
            "clustering": pa.array(np.round(c, 6), pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def crawl_clustering(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web, emit every node's
    local clustering coefficient. Self-dump SQL-gated when ``dump`` is
    set (lex edge table only; DuckDB recomputes degree, triangle and
    coefficient from scratch)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_clus_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return clustering_coefficient(edges, dump=dump)


def connected_components(edges_ds, nodes_ds, *, max_iters: int = 64,
                         dump=None, form: str = "auto",
                         driver_max_edges: int =
                         PAGERANK_DRIVER_MAX_EDGES):
    """Weakly connected components over a (src, dst) edge Dataset —
    min-label propagation (the hash-to-min scheme of Rastogi et al.,
    ICDE 2013, the same loop dedup.propagate_min_labels runs on doc
    ids, here string-keyed for URL graphs): every node starts labeled
    with itself; each round one hash join ships labels onto edge
    sources, one groupby(dst).min folds neighbor labels, one left-outer
    join applies them. Converges in O(component diameter) rounds; every
    round is pure Ray Data shuffle, nothing driver-resident.

    ``dump`` receives the undirected edge list + node universe so the
    SQL oracle can recompute the SAME labels independently via a
    recursive-CTE reachability closure (component = min reachable
    node). Returns (node, component)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def both_dirs(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().cast(pa.string())
        d = batch.column("dst").combine_chunks().cast(pa.string())
        return pa.table({"src": pa.concat_arrays([s, d]),
                         "dst": pa.concat_arrays([d, s])})

    edges = edges_ds.map_batches(both_dirs,
                                 batch_format="pyarrow").materialize()
    labels = nodes_ds.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.string()),
                            "label": t.column("node").cast(pa.string())}),
        batch_format="pyarrow").materialize()

    if dump is not None:
        et = pa.concat_tables(ray_get_tables(edges))
        nt = pa.concat_tables(ray_get_tables(labels))
        dump(pa.concat_tables([
            pa.table({"kind": pa.array(["e"] * et.num_rows),
                      "a": et.column("src"), "b": et.column("dst")}),
            pa.table({"kind": pa.array(["n"] * nt.num_rows),
                      "a": nt.column("node"), "b": nt.column("node")}),
        ]))

    n_edges = edges.count()
    if n_edges == 0:
        return labels.rename_columns({"label": "component"})
    if form == "auto":
        form = ("driver" if n_edges <= driver_max_edges
                else "distributed")
    if form == "driver":
        # the PageRank crossover gate: below ~2M edges the per-round
        # join/groupby fixed costs dominate. Edge list is gated-tiny;
        # only the edge-node component map broadcasts — the node
        # universe stays distributed and relabels by sorted probe.
        # np.unique sorts, so min INDEX == lexicographically min node,
        # matching the loop's pc.min_element_wise on ASCII URLs.
        import ray

        from .dedup import connected_components as _uf

        epd = edges.to_pandas()
        su, inv = np.unique(
            np.concatenate([epd["src"].to_numpy(),
                            epd["dst"].to_numpy()]).astype(object),
            return_inverse=True)
        half = len(epd)
        comp = _uf(zip(inv[:half], inv[half:]), range(len(su)))
        lab = np.array([str(su[comp[i]]) for i in range(len(su))],
                       dtype=object)
        ref = ray.put((np.array([str(x) for x in su], object), lab))

        def relabel(batch: pa.Table, ref=ref) -> pa.Table:
            keys, lab = ray.get(ref)
            node = np.asarray(batch.column("node").to_pylist(),
                              dtype=object)
            idx = np.clip(np.searchsorted(keys, node), 0,
                          len(keys) - 1)
            hit = keys[idx] == node
            out = np.where(hit, lab[idx], node)
            return pa.table({
                "node": batch.column("node"),
                "component": pa.array([str(x) for x in out],
                                      pa.string()),
            })

        return labels.map_batches(relabel, batch_format="pyarrow")

    def update(batch: pa.Table) -> pa.Table:
        lab = batch.column("label")
        nb = pc.coalesce(batch.column("min_nb"), lab)
        new = pc.min_element_wise(lab, nb)
        return pa.table({
            "node": batch.column("node"),
            "label": new,
            "changed": pc.cast(pc.less(new, lab), pa.int64()),
        })

    for _ in range(max_iters):
        # _pr_parts collapses tiny graphs to one join partition (Ray
        # 2.49 all-empty-partition acero failure, see _pr_parts doc)
        n = _pr_parts(n_edges, edges, labels)
        cand = (
            edges.join(labels.rename_columns({"node": "src"}),
                       "inner", n, on=("src",))
            .groupby("dst")
            .aggregate(Min("label", alias_name="min_nb"))
            .rename_columns({"dst": "node"})
            .select_columns(["node", "min_nb"])
        )
        stepped = labels.join(cand, "left_outer", n, on=("node",)) \
            .map_batches(update, batch_format="pyarrow").materialize()
        n_changed = stepped.sum("changed") or 0
        labels = stepped.select_columns(["node", "label"]).materialize()
        if n_changed == 0:
            return labels.rename_columns({"label": "component"})
    raise RuntimeError(
        f"min-label propagation did not converge within {max_iters} "
        "rounds — component diameter exceeds the bound; raise max_iters")


def crawl_components(sf_dir: str, *, dump=None):
    """Query entry: weakly connected components of the crawl link
    graph. Self-dump SQL-gated: the oracle recomputes every label with
    a recursive reachability closure over the dumped edges."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_cc_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    return connected_components(edges, nodes, dump=dump)


_HOP_INF = np.int64(1 << 62)     # "unreached" sentinel inside the loop


def hop_distance(edges_ds, nodes_ds, seeds, *, max_iters: int = 32,
                 dump=None, form: str = "auto",
                 driver_max_edges: int = PAGERANK_DRIVER_MAX_EDGES):
    """Multi-source BFS hop distance over a DIRECTED (src, dst) edge
    Dataset — unit-weight Bellman-Ford on the connected_components
    propagation skeleton, with the classic BFS frontier optimization:
    only nodes whose distance CHANGED last round join onto the edge
    list, so each round's exchange is O(frontier), not O(nodes).
    Every round is one hash join (frontier→edges by src), one
    groupby(dst).min fold, one left-outer apply; converges in
    O(eccentricity) rounds. Returns (node, hops:int64) for the full
    node universe, hops = -1 where unreachable from any seed.

    ``dump`` receives edges/nodes/seeds so the SQL oracle can
    recompute every distance independently via a recursive-CTE
    shortest-reach closure (min d per node over all (node, d) reach
    pairs). ``form='driver'`` is the gated tiny-graph path — a CSR
    BFS on the driver with the result broadcast once via ``ray.put``
    and applied by sorted probe (the PageRank crossover gate: below
    ~2M edges per-round shuffle fixed costs dominate)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min

    seeds = sorted({str(s) for s in seeds})
    edges = edges_ds.map_batches(
        _cast_str("src", "dst"), batch_format="pyarrow").materialize()
    nodes = nodes_ds.map_batches(
        _cast_str("node"), batch_format="pyarrow").materialize()

    if dump is not None:
        et = pa.concat_tables(ray_get_tables(edges))
        nt = pa.concat_tables(ray_get_tables(nodes))
        dump(pa.concat_tables([
            pa.table({"kind": pa.array(["e"] * et.num_rows),
                      "a": et.column("src"), "b": et.column("dst")}),
            pa.table({"kind": pa.array(["n"] * nt.num_rows),
                      "a": nt.column("node"), "b": nt.column("node")}),
            pa.table({"kind": pa.array(["s"] * len(seeds)),
                      "a": pa.array(seeds, pa.string()),
                      "b": pa.array(seeds, pa.string())}),
        ]))

    n_edges = edges.count()
    if form == "auto":
        form = ("driver" if n_edges <= driver_max_edges
                else "distributed")

    if form == "driver":
        epd = edges.to_pandas()
        su, inv = np.unique(
            np.concatenate([epd["src"].to_numpy(),
                            epd["dst"].to_numpy(),
                            np.array(seeds, object)]).astype(object),
            return_inverse=True)
        half = len(epd)
        src_i, dst_i = inv[:half], inv[half:2 * half]
        # CSR adjacency + layered frontier sweep
        order = np.argsort(src_i, kind="stable")
        s_sorted, d_sorted = src_i[order], dst_i[order]
        starts = np.searchsorted(s_sorted, np.arange(len(su) + 1))
        dist = np.full(len(su), -1, np.int64)
        frontier = np.unique(inv[2 * half:])
        dist[frontier] = 0
        d = 0
        while len(frontier):
            d += 1
            nxt = np.concatenate([
                d_sorted[starts[u]:starts[u + 1]] for u in frontier
            ]) if len(frontier) else np.zeros(0, np.int64)
            nxt = np.unique(nxt)
            nxt = nxt[dist[nxt] == -1]
            dist[nxt] = d
            frontier = nxt
        ref = ray.put((np.array([str(x) for x in su], object), dist))

        def probe(batch: pa.Table, ref=ref) -> pa.Table:
            keys, dist = ray.get(ref)
            node = np.asarray(batch.column("node").to_pylist(),
                              dtype=object)
            idx = np.clip(np.searchsorted(keys, node), 0, len(keys) - 1)
            hit = keys[idx] == node
            out = np.where(hit, dist[idx], np.int64(-1))
            return pa.table({"node": batch.column("node"),
                             "hops": pa.array(out.astype(np.int64))})

        return nodes.map_batches(probe, batch_format="pyarrow")

    seed_set = set(seeds)

    def init(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_pylist()
        d = np.array([0 if u in seed_set else _HOP_INF for u in node],
                     np.int64)
        return pa.table({"node": batch.column("node"),
                         "dist": pa.array(d),
                         "changed": pa.array(
                             (d == 0).astype(np.int64))})

    labels = nodes.map_batches(init, batch_format="pyarrow") \
        .materialize()

    def apply_min(batch: pa.Table) -> pa.Table:
        old = batch.column("dist")
        cand = pc.coalesce(batch.column("cand"),
                           pa.scalar(int(_HOP_INF), pa.int64()))
        new = pc.min_element_wise(old, cand)
        return pa.table({
            "node": batch.column("node"),
            "dist": new,
            "changed": pc.cast(pc.less(new, old), pa.int64()),
        })

    for _ in range(max_iters):
        frontier = labels.map_batches(
            lambda t: t.filter(pc.equal(t.column("changed"), 1))
                       .select(["node", "dist"]),
            batch_format="pyarrow")
        n = _pr_parts(n_edges, edges, labels)
        cand = (
            edges.join(frontier.rename_columns({"node": "src"}),
                       "inner", n, on=("src",))
            .map_batches(lambda t: pa.table({
                "node": t.column("dst"),
                "cand": pc.add(t.column("dist"),
                               pa.scalar(1, pa.int64()))}),
                batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("cand", alias_name="cand"))
        ).materialize()
        # a frontier of pure sink nodes emits ZERO candidates; the
        # empty (schema-less) right side would trip the Ray 2.49
        # acero FieldRef join failure — and means convergence anyway
        if cand.count() == 0:
            break
        stepped = labels.select_columns(["node", "dist"]) \
            .join(cand, "left_outer", n, on=("node",)) \
            .map_batches(apply_min, batch_format="pyarrow").materialize()
        n_changed = stepped.sum("changed") or 0
        labels = stepped
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"hop_distance did not converge within {max_iters} rounds "
            "— graph eccentricity exceeds the bound; raise max_iters")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "hops": pa.array(np.where(d >= _HOP_INF, np.int64(-1),
                                      d).astype(np.int64)),
        })

    return labels.map_batches(finish, batch_format="pyarrow")


def crawl_hop_distance(sf_dir: str, *, dump=None):
    """Query entry: min-hop BFS distance from the seed set over the
    crawl link graph. Self-dump SQL-gated: the oracle recomputes every
    distance with a recursive shortest-reach closure over the dumped
    edges + seeds. Law (pytest): hops == the crawler's recorded depth
    for every fetched page — BFS with a first-discovery seen-set
    assigns depth = min-hop, so the graph primitive independently
    re-derives the crawl's own layering."""
    import tempfile

    from ..functions import urlkit
    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_hop_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    seeds = [urlkit.canonicalize(u, u) or u for u in site.seed_urls()]
    return hop_distance(edges, nodes, seeds, dump=dump)


def _edge_weights_md5(src, dst) -> np.ndarray:
    """Deterministic integer edge weight in 1..9: the md5-hex law
    (first 8 hex chars of md5('src>dst') → int, % 9, + 1) — the same
    convention the sampling operators use, so an SQL oracle recomputes
    every weight independently."""
    import hashlib

    return np.array(
        [1 + int(hashlib.md5(f"{a}>{b}".encode()).hexdigest()[:8],
                 16) % 9
         for a, b in zip(src, dst)], np.int64)


def weighted_sssp(edges_ds, nodes_ds, seeds, *, max_iters: int = 64,
                  dump=None):
    """Single/multi-source WEIGHTED shortest paths over a directed
    (src, dst) edge Dataset — distributed Bellman-Ford with the
    changed-frontier optimization (only nodes whose cost improved last
    round join onto the edge list), the weighted twin of
    ``hop_distance``. Edge weights are the deterministic md5 law of
    ``_edge_weights_md5`` (1..9), attached ONCE up front so each round
    ships only (dst, cost) candidates. Every round = one hash join,
    one groupby(dst).min, one left-outer apply; converges when no
    cost improves (≤ longest shortest path in EDGES rounds — the
    Bellman-Ford bound — guarded by ``max_iters``).

    ``dump`` receives edges/nodes/seeds (same layout as hop_distance);
    the SQL oracle recomputes the WEIGHTS THEMSELVES plus every
    distance via a cost-bounded recursive closure. Returns
    (node, cost:int64), cost = -1 where unreachable."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min

    seeds = sorted({str(s) for s in seeds})
    edges = edges_ds.map_batches(
        _cast_str("src", "dst"), batch_format="pyarrow")

    def attach_w(t: pa.Table) -> pa.Table:
        w = _edge_weights_md5(t.column("src").to_pylist(),
                              t.column("dst").to_pylist())
        return t.append_column("w", pa.array(w, pa.int64()))

    edges = edges.map_batches(attach_w, batch_format="pyarrow") \
        .materialize()
    nodes = nodes_ds.map_batches(
        _cast_str("node"), batch_format="pyarrow").materialize()

    if dump is not None:
        et = pa.concat_tables(ray_get_tables(
            edges.select_columns(["src", "dst"])))
        nt = pa.concat_tables(ray_get_tables(nodes))
        dump(pa.concat_tables([
            pa.table({"kind": pa.array(["e"] * et.num_rows),
                      "a": et.column("src"), "b": et.column("dst")}),
            pa.table({"kind": pa.array(["n"] * nt.num_rows),
                      "a": nt.column("node"), "b": nt.column("node")}),
            pa.table({"kind": pa.array(["s"] * len(seeds)),
                      "a": pa.array(seeds, pa.string()),
                      "b": pa.array(seeds, pa.string())}),
        ]))

    n_edges = edges.count()
    seed_set = set(seeds)

    def init(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_pylist()
        d = np.array([0 if u in seed_set else _HOP_INF for u in node],
                     np.int64)
        return pa.table({"node": batch.column("node"),
                         "dist": pa.array(d),
                         "changed": pa.array(
                             (d == 0).astype(np.int64))})

    labels = nodes.map_batches(init, batch_format="pyarrow") \
        .materialize()

    def apply_min(batch: pa.Table) -> pa.Table:
        old = batch.column("dist")
        cand = pc.coalesce(batch.column("cand"),
                           pa.scalar(int(_HOP_INF), pa.int64()))
        new = pc.min_element_wise(old, cand)
        return pa.table({
            "node": batch.column("node"),
            "dist": new,
            "changed": pc.cast(pc.less(new, old), pa.int64()),
        })

    for _ in range(max_iters):
        frontier = labels.map_batches(
            lambda t: t.filter(pc.equal(t.column("changed"), 1))
                       .select(["node", "dist"]),
            batch_format="pyarrow")
        n = _pr_parts(n_edges, edges, labels)
        cand = (
            edges.join(frontier.rename_columns({"node": "src"}),
                       "inner", n, on=("src",))
            .map_batches(lambda t: pa.table({
                "node": t.column("dst"),
                "cand": pc.add(t.column("dist"), t.column("w"))}),
                batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("cand", alias_name="cand"))
        ).materialize()
        if cand.count() == 0:
            break
        stepped = labels.select_columns(["node", "dist"]) \
            .join(cand, "left_outer", n, on=("node",)) \
            .map_batches(apply_min, batch_format="pyarrow") \
            .materialize()
        n_changed = stepped.sum("changed") or 0
        labels = stepped
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"weighted_sssp did not converge within {max_iters} "
            "rounds; raise max_iters")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "cost": pa.array(np.where(d >= _HOP_INF, np.int64(-1),
                                      d).astype(np.int64)),
        })

    return labels.map_batches(finish, batch_format="pyarrow")


def crawl_weighted_sssp(sf_dir: str, *, dump=None):
    """Query entry: weighted shortest-path cost from the seed set over
    the crawl link graph with md5-law edge weights. Self-dump
    SQL-gated: the oracle recomputes weights AND distances via a
    cost-bounded recursive closure over the dumped edges + seeds.
    Law (pytest): matches driver Dijkstra exactly; -1 exactly where
    hop_distance is -1 (same reachability)."""
    import tempfile

    from ..functions import urlkit
    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_sssp_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    seeds = [urlkit.canonicalize(u, u) or u for u in site.seed_urls()]
    return weighted_sssp(edges, nodes, seeds, dump=dump)


def random_walks(edges_ds, nodes_ds, *, steps: int = 4, dump=None):
    """Deterministic random-walk sampling over a directed (src, dst)
    edge Dataset — the DeepWalk/node2vec corpus-generation primitive
    (Perozzi et al., KDD 2014), made replayable: one walker starts at
    every node and at step t moves to the out-neighbor ranked
    md5('walker:t') % outdeg among its current node's distinct
    out-neighbors in dst order (the repo's md5-hex law). Dead-end
    walks stop. Returns the full trajectory table
    (walker, step, node), step 0 = the start.

    Scale shape: neighbor ranks and out-degrees are attached ONCE
    (one groupby + one map_groups over per-src bounded groups); each
    step is one hash join onto degrees (compute the rank, a per-row
    md5 over the walker id — the hash IS the operator's randomness),
    one composite-key hash join onto the ranked edge table, and the
    trajectory accumulates as a lazy union of per-step Datasets. No
    driver state beyond the loop counter.

    ``dump`` receives edges + nodes; the SQL oracle replays EVERY
    walk independently via a recursive CTE computing the same md5
    ranks over the same dst-ordered neighbor numbering."""
    import hashlib

    import ray.data  # noqa: F401  (Dataset.union)
    from ray.data.aggregate import Count

    edges = edges_ds.map_batches(
        _cast_str("src", "dst"), batch_format="pyarrow")
    el = edges.groupby(["src", "dst"]) \
        .aggregate(Count(alias_name="_m")) \
        .select_columns(["src", "dst"]).materialize()
    nodes = nodes_ds.map_batches(
        _cast_str("node"), batch_format="pyarrow").materialize()

    if dump is not None:
        et = pa.concat_tables(ray_get_tables(el))
        nt = pa.concat_tables(ray_get_tables(nodes))
        dump(pa.concat_tables([
            pa.table({"kind": pa.array(["e"] * et.num_rows),
                      "a": et.column("src"), "b": et.column("dst")}),
            pa.table({"kind": pa.array(["n"] * nt.num_rows),
                      "a": nt.column("node"), "b": nt.column("node")}),
        ]))

    deg = el.groupby("src").aggregate(Count(alias_name="outdeg")) \
        .materialize()

    def rank_group(g: pa.Table) -> pa.Table:
        ds_ = sorted(g.column("dst").to_pylist())
        return pa.table({
            "src": pa.array([g.column("src")[0].as_py()] * len(ds_),
                            pa.string()),
            "rank": pa.array(np.arange(len(ds_)), pa.int64()),
            "dst": pa.array(ds_, pa.string()),
        })

    ranked = el.groupby("src").map_groups(
        rank_group, batch_format="pyarrow").materialize()

    state = nodes.map_batches(
        lambda t: pa.table({"walker": t.column("node"),
                            "node": t.column("node")}),
        batch_format="pyarrow").materialize()
    trail = [state.map_batches(
        lambda t: pa.table({"walker": t.column("walker"),
                            "step": pa.array(
                                np.zeros(t.num_rows, np.int64)),
                            "node": t.column("node")}),
        batch_format="pyarrow")]

    n_edges = el.count()
    for t_step in range(1, steps + 1):
        n = _pr_parts(n_edges, el, state)
        with_deg = state.join(
            deg.rename_columns({"src": "node"}), "inner", n,
            on=("node",))

        def pick(batch: pa.Table, t_step=t_step) -> pa.Table:
            walkers = batch.column("walker").to_pylist()
            d = batch.column("outdeg") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            r = np.array(
                [int(hashlib.md5(f"{w}:{t_step}".encode())
                     .hexdigest()[:8], 16) for w in walkers],
                np.uint64).astype(np.int64) % d
            return pa.table({
                "walker": batch.column("walker"),
                "node": batch.column("node"),
                "rank": pa.array(r, pa.int64()),
            })

        moved = with_deg.map_batches(pick, batch_format="pyarrow") \
            .join(ranked.rename_columns({"src": "node"}), "inner", n,
                  on=("node", "rank")) \
            .map_batches(lambda t: pa.table({
                "walker": t.column("walker"),
                "node": t.column("dst")}), batch_format="pyarrow") \
            .materialize()
        if moved.count() == 0:
            break
        state = moved
        trail.append(state.map_batches(
            lambda t, s=t_step: pa.table({
                "walker": t.column("walker"),
                "step": pa.array(np.full(t.num_rows, s, np.int64)),
                "node": t.column("node")}),
            batch_format="pyarrow"))

    out = trail[0]
    for part in trail[1:]:
        out = out.union(part)
    return out


def crawl_random_walks(sf_dir: str, *, dump=None):
    """Query entry: 4-step deterministic random walks from every node
    of the crawl link graph. Self-dump SQL-gated: the oracle replays
    every walk via a recursive CTE with the same md5 rank law over
    the dumped distinct edges."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_walk_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    return random_walks(edges, nodes, dump=dump)


def coreness(edges_ds, nodes_ds, *, max_iters: int = 256,
             form: str = "auto",
             driver_max_edges: int = PAGERANK_DRIVER_MAX_EDGES):
    """k-core decomposition — per-node CORENESS (the largest k such
    that the node survives in the k-core) over the undirected simple
    graph. Distributed algorithm: the H-index fixpoint of Lü et al.
    (Nature Communications 2016) — init c(v) = degree(v), iterate
    c(v) ← min(c(v), H({c(u) : u ~ v})) where H is the Hirsch index
    of the neighbor values; the fixpoint is exactly the coreness, and
    every round is pure Ray Data exchange:

    one hash join ships c onto edge sources, one sort by
    (node, c DESC) — then H per node is a vectorized prefix-count
    over sorted runs (c_i ≥ i+1), with the repo's interior/boundary
    run split: a run wholly inside a block finishes in-task; the ≤2
    boundary runs per block ship their values to the driver (bounded
    by 2 × blocks × max-degree-of-a-boundary-node) and merge there —
    no per-key map_groups, no driver-resident graph.

    ``form='driver'`` is the gated tiny-graph path: exact bucket
    peeling (Batagelj-Zaversnik) on CSR arrays, broadcast once. The
    two forms are byte-equality gated in tests/test_graph.py.
    Returns (node, coreness:int64); isolated nodes get 0."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    def undirect(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().cast(pa.string())
        d = batch.column("dst").combine_chunks().cast(pa.string())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.table({"lo": lo, "hi": hi})

    # dedupe parallel edges (simple graph), then emit both directions
    simple = edges_ds.map_batches(undirect, batch_format="pyarrow") \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_n"))
    edges = simple.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column("lo").combine_chunks(),
                t.column("hi").combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column("hi").combine_chunks(),
                t.column("lo").combine_chunks()]),
        }), batch_format="pyarrow").materialize()
    nodes = nodes_ds.map_batches(_cast_str("node"),
                                 batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if form == "auto":
        form = ("driver" if n_edges <= driver_max_edges
                else "distributed")

    if form == "driver":
        epd = edges.to_pandas()      # both directions already
        su, inv = np.unique(
            np.concatenate([epd["src"].to_numpy(),
                            epd["dst"].to_numpy()]).astype(object),
            return_inverse=True)
        half = len(epd)
        src_i, dst_i = inv[:half], inv[half:]
        n = len(su)
        order = np.argsort(src_i, kind="stable")
        s_sorted, d_sorted = src_i[order], dst_i[order]
        starts = np.searchsorted(s_sorted, np.arange(n + 1))
        deg = (starts[1:] - starts[:-1]).astype(np.int64)
        # Batagelj-Zaversnik bucket peeling
        core = deg.copy()
        verts = np.argsort(deg, kind="stable")
        pos = np.empty(n, np.int64)
        pos[verts] = np.arange(n)
        md = int(deg.max()) if n else 0
        bin_start = np.zeros(md + 2, np.int64)
        np.add.at(bin_start, deg + 1, 1)
        bin_start = np.cumsum(bin_start)
        cur = core.copy()
        for i in range(n):
            v = verts[i]
            for u in d_sorted[starts[v]:starts[v + 1]]:
                if cur[u] > cur[v]:
                    du, pu = cur[u], pos[u]
                    pw = bin_start[du]
                    w = verts[pw]
                    if u != w:
                        verts[pu], verts[pw] = w, u
                        pos[u], pos[w] = pw, pu
                    bin_start[du] += 1
                    cur[u] -= 1
        ref = ray.put((np.array([str(x) for x in su], object), cur))

        def probe(batch: pa.Table, ref=ref) -> pa.Table:
            keys, core = ray.get(ref)
            node = np.asarray(batch.column("node").to_pylist(),
                              dtype=object)
            idx = np.clip(np.searchsorted(keys, node), 0, len(keys) - 1)
            hit = (keys[idx] == node) if len(keys) else \
                np.zeros(len(node), bool)
            out = np.where(hit, core[idx] if len(keys) else 0, 0)
            return pa.table({
                "node": batch.column("node"),
                "coreness": pa.array(out.astype(np.int64))})

        return nodes.map_batches(probe, batch_format="pyarrow")

    # --- distributed H-index fixpoint ---
    deg = edges.groupby("src").aggregate(Count(alias_name="c")) \
        .rename_columns({"src": "node"})
    n = _pr_parts(n_edges, edges, nodes)
    labels = nodes.join(deg, "left_outer", n, on=("node",)) \
        .map_batches(lambda t: pa.table({
            "node": t.column("node"),
            "c": pc.coalesce(t.column("c").cast(pa.int64()),
                             pa.scalar(0, pa.int64()))}),
            batch_format="pyarrow").materialize()

    def _run_h(nd: np.ndarray, cv: np.ndarray):
        """H per contiguous (node)-run of a (node, c DESC)-sorted
        slice: count of positions with c_i >= i+1 (prefix property
        under the DESC sort). Returns (run_starts, H_sums)."""
        starts = np.flatnonzero(
            np.concatenate(([True], nd[1:] != nd[:-1])))
        run_id = np.cumsum(np.concatenate(
            ([0], (nd[1:] != nd[:-1]).astype(np.int64))))
        pos = np.arange(len(nd)) - starts[run_id]
        ok = (cv >= pos + 1).astype(np.int64)
        return starts, np.add.reduceat(ok, starts)

    _H_EMPTY = pa.table({"node": pa.array([], pa.string()),
                         "h": pa.array([], pa.int64())})
    _B_EMPTY = pa.table({"node": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})

    def interior_h(batch: pa.Table) -> pa.Table:
        nd = np.asarray(batch.column("node").to_pylist(), dtype=object)
        if len(nd) == 0:
            return _H_EMPTY
        cv = batch.column("c").to_numpy(zero_copy_only=False)
        starts, sums = _run_h(nd, cv)
        interior = (nd[starts] != nd[0]) & (nd[starts] != nd[-1])
        return pa.table({
            "node": pa.array(nd[starts][interior], pa.string()),
            "h": pa.array(sums[interior].astype(np.int64))})

    def boundary_rows(batch: pa.Table) -> pa.Table:
        nd = np.asarray(batch.column("node").to_pylist(), dtype=object)
        if len(nd) == 0:
            return _B_EMPTY
        cv = batch.column("c").to_numpy(zero_copy_only=False)
        bmask = (nd == nd[0]) | (nd == nd[-1])
        return pa.table({
            "node": pa.array(nd[bmask], pa.string()),
            "c": pa.array(cv[bmask].astype(np.int64))})

    def step(t: pa.Table) -> pa.Table:
        new = pc.min_element_wise(
            t.column("c"), pc.coalesce(t.column("h"), t.column("c")))
        return pa.table({
            "node": t.column("node"),
            "c": new,
            "changed": pc.cast(pc.less(new, t.column("c")), pa.int64()),
        })

    for _ in range(max_iters):
        n = _pr_parts(n_edges, edges, labels)
        nb = edges.join(labels.rename_columns({"node": "src"}),
                        "inner", n, on=("src",)) \
            .select_columns(["dst", "c"]) \
            .rename_columns({"dst": "node"}) \
            .sort(["node", "c"], descending=[False, True]) \
            .materialize()          # the round's one exchange
        h_ds = nb.map_batches(interior_h, batch_format="pyarrow",
                              batch_size=None)
        # first/last run of every block completes on the driver —
        # ≤ 2 runs × blocks, each bounded by its node's degree
        bnd = nb.map_batches(boundary_rows, batch_format="pyarrow",
                             batch_size=None).to_pandas()
        if len(bnd):
            bnd = bnd.sort_values(["node", "c"],
                                  ascending=[True, False])
            ndb = bnd["node"].to_numpy(object)
            starts, sums = _run_h(ndb, bnd["c"].to_numpy(np.int64))
            h_ds = h_ds.union(rd.from_arrow(pa.table({
                "node": pa.array(ndb[starts], pa.string()),
                "h": pa.array(sums.astype(np.int64))})))
        h_ds = h_ds.materialize()
        if h_ds.count() == 0:       # no neighbor rows at all: fixpoint
            break
        stepped = labels.join(h_ds, "left_outer", n, on=("node",)) \
            .map_batches(step, batch_format="pyarrow").materialize()
        n_changed = stepped.sum("changed") or 0
        labels = stepped.select_columns(["node", "c"]).materialize()
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"coreness H-iteration did not converge in {max_iters} "
            "rounds; raise max_iters")

    return labels.rename_columns({"c": "coreness"})


def crawl_kcore(sf_dir: str):
    """Query entry: coreness of every page in the crawl link graph
    (undirected). Pytest-gated: distributed H-index fixpoint ==
    driver bucket peeling on random graphs + on this crawl graph
    (tests/test_graph.py)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_core_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    return coreness(edges, nodes)


def host_graph(edges_ds, *, dump=None):
    """Collapse the page-level (src, dst) link graph to weighted
    HOST-level edges: (src_host, dst_host, n_links, n_src_pages) —
    the domain-graph view crawl schedulers partition by (the engine's
    own frontier is host-hash partitioned, so this is the operator
    that audits that key's skew).

    Scale shape: host extraction is a vectorized split inside
    map_batches; the first groupby key is (src_host, dst_host, src) —
    same cardinality class as the edge list — and the second groupby
    folds to the host-pair space, which is bounded by hosts². No
    driver-side pass at any size. ``dump`` receives the raw page
    edges so the SQL oracle re-derives both aggregates with its own
    SPLIT_PART host extraction."""
    from ray.data.aggregate import Count, Sum

    edges = edges_ds.map_batches(
        _cast_str("src", "dst"), batch_format="pyarrow").materialize()
    if dump is not None:
        et = pa.concat_tables(ray_get_tables(edges))
        dump(pa.table({"src": et.column("src"),
                       "dst": et.column("dst")}))

    def hosts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def host_of(col):
            # scheme://HOST/... — element 2 of the '/'-split, exactly
            # what the oracle's SPLIT_PART(url, '/', 3) extracts
            return pc.list_element(
                pc.split_pattern(col, "/"), 2)

        # per-batch pre-aggregation: count page-edges per
        # (src_host, dst_host, src) so the shuffle ships partials
        t = pa.table({
            "src_host": host_of(batch.column("src")),
            "dst_host": host_of(batch.column("dst")),
            "src": batch.column("src"),
        })
        return pa.TableGroupBy(
            t, ["src_host", "dst_host", "src"]).aggregate(
            [([], "count_all")]).rename_columns(
            ["src_host", "dst_host", "src", "_n"])

    per_page = edges.map_batches(hosts, batch_format="pyarrow") \
        .groupby(["src_host", "dst_host", "src"]) \
        .aggregate(Sum("_n", alias_name="_n"))
    return per_page.groupby(["src_host", "dst_host"]).aggregate(
        Sum("_n", alias_name="n_links"),
        Count(alias_name="n_src_pages"),
    )


def crawl_host_graph(sf_dir: str, *, dump=None):
    """Query entry: weighted host-level link graph of the crawl.
    Self-dump SQL-gated: the oracle re-extracts hosts and re-counts
    links + distinct source pages from the dumped page edges."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_hg_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return host_graph(edges, dump=dump)


def degree_assortativity(edges_ds, *, dump=None):
    """Degree assortativity coefficient (Newman 2002) of the undirected
    simple graph — Pearson correlation of endpoint degrees over every
    edge counted in both directions. Rides the same one-groupby degree
    pass as triangle_count plus two joins to attach endpoint degrees;
    the correlation itself is a scalar moment reduction (no driver
    rows beyond the partials). ``dump`` receives the per-edge
    (deg_a, deg_b) pairs so SQL recomputes the coefficient with its own
    corr() — value-for-value."""
    from ray.data.aggregate import Count, Sum

    def undirect(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pylist(), dtype=object)
        d = np.asarray(t.column("dst").to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        return pa.table({"lo": pa.array(lo.tolist(), pa.string()),
                         "hi": pa.array(hi.tolist(), pa.string())})

    el = (edges_ds.map_batches(undirect, batch_format="pyarrow")
          .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
          .select_columns(["lo", "hi"])).materialize()
    n_edges = el.count()
    empty = pa.table({"n_edges": pa.array([0], pa.int64()),
                      "assortativity": pa.array([float("nan")])})
    if n_edges == 0:
        if dump is not None:
            dump(pa.table({"deg_a": pa.array([], pa.int64()),
                           "deg_b": pa.array([], pa.int64())}))
        return empty

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("lo").combine_chunks().cast(pa.string()),
             t.column("hi").combine_chunks().cast(pa.string())])})

    deg = (el.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))) \
        .materialize()
    n = _pr_parts(n_edges, el, deg)
    j = el.join(deg.rename_columns({"node": "lo", "deg": "deg_lo"}),
                "inner", n, on=("lo",))
    j = j.join(deg.rename_columns({"node": "hi", "deg": "deg_hi"}),
               "inner", n, on=("hi",)).materialize()

    if dump is not None:
        t = pa.concat_tables(ray_get_tables(j))
        dl = t.column("deg_lo").to_numpy(zero_copy_only=False)
        dh = t.column("deg_hi").to_numpy(zero_copy_only=False)
        dump(pa.table({
            "deg_a": pa.array(np.concatenate([dl, dh]).astype(np.int64)),
            "deg_b": pa.array(np.concatenate([dh, dl]).astype(np.int64)),
        }))

    def part(batch: pa.Table) -> pa.Table:
        dl = batch.column("deg_lo").to_numpy(
            zero_copy_only=False).astype(np.float64)
        dh = batch.column("deg_hi").to_numpy(
            zero_copy_only=False).astype(np.float64)
        # both directions: x = lo..hi and hi..lo concatenated
        x = np.concatenate([dl, dh])
        y = np.concatenate([dh, dl])
        return pa.table({
            "_n": pa.array([len(x)], pa.int64()),
            "_sx": pa.array([x.sum()]),
            "_sxx": pa.array([(x * x).sum()]),
            "_sxy": pa.array([(x * y).sum()]),
        })

    mom = j.map_batches(part, batch_format="pyarrow") \
        .to_pandas().sum()
    nn = float(mom["_n"])
    cov = mom["_sxy"] - mom["_sx"] ** 2 / nn
    var = mom["_sxx"] - mom["_sx"] ** 2 / nn
    r = float(cov / var) if var > 0 else float("nan")
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "assortativity": pa.array([np.floor(r * 1e6 + 0.5) / 1e6]),
    })


def crawl_assortativity(sf_dir: str, *, dump=None):
    """Query entry: degree assortativity of the crawl link graph.
    Self-dump SQL-gated (corr over the dumped degree pairs)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_assort_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return degree_assortativity(edges, dump=dump)


def edge_reciprocity(edges_ds, *, dump=None):
    """Directed-edge reciprocity of a (src, dst) edge Dataset — the
    share of directed edges (u, v), u != v, whose reverse (v, u) is
    also present (Newman-style link reciprocity; for a crawl graph it
    separates mutually-linking site clusters from one-way citation
    structure).

    Distributed shape: ONE keyed exchange. Each edge is oriented onto
    its unordered pair key (lo, hi) with a direction bit, and
    ``groupby(lo, hi).aggregate(Max(fwd), Max(bwd))`` folds duplicates
    and both directions in the same pass — Max is idempotent, so
    repeated links (multiple anchors on one page) collapse without a
    separate DISTINCT stage. A per-batch combiner then reduces the
    pair table to two scalars: n_edges = sum(fwd + bwd) distinct
    directed edges, n_reciprocated = 2 * |pairs with both bits|. At
    corpus scale the pair table is the only shuffle and everything
    after it is a two-int partial per block.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    def orient(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().cast(pa.string())
        d = batch.column("dst").combine_chunks().cast(pa.string())
        keep = pc.invert(pc.equal(s, d))          # drop self-loops
        s, d = s.filter(keep), d.filter(keep)
        is_fwd = pc.less(s, d)                    # src is the lex-lo end
        one = pa.scalar(1, pa.int64())
        fwd = pc.cast(is_fwd, pa.int64())
        return pa.table({
            "lo": pc.if_else(is_fwd, s, d),
            "hi": pc.if_else(is_fwd, d, s),
            "fwd": fwd,
            "bwd": pc.subtract(one, fwd),
        })

    ed = edges_ds.map_batches(orient, batch_format="pyarrow")

    if dump is not None:
        ed = ed.materialize()
        t = pa.concat_tables(ray_get_tables(ed))
        # reconstruct the directed (src, dst) list for the SQL oracle
        # (it re-derives DISTINCT edges and the reverse-join itself)
        is_f = pc.cast(t.column("fwd"), pa.bool_())
        dump(pa.table({
            "src": pc.if_else(is_f, t.column("lo"), t.column("hi")),
            "dst": pc.if_else(is_f, t.column("hi"), t.column("lo")),
        }))

    pairs = ed.groupby(["lo", "hi"]).aggregate(
        Max("fwd", alias_name="fwd"), Max("bwd", alias_name="bwd"))

    def part(batch: pa.Table) -> pa.Table:
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        b = batch.column("bwd").to_numpy(zero_copy_only=False)
        return pa.table({
            "_nd": pa.array([int((f + b).sum())], pa.int64()),
            "_nr": pa.array([2 * int(((f == 1) & (b == 1)).sum())],
                            pa.int64()),
        })

    mom = pairs.map_batches(part, batch_format="pyarrow").to_pandas().sum()
    n_dir, n_rec = int(mom["_nd"]), int(mom["_nr"])
    rec = (np.floor(1e6 * n_rec / n_dir + 0.5) / 1e6) if n_dir else 0.0
    return pa.table({
        "n_edges": pa.array([n_dir], pa.int64()),
        "n_reciprocated": pa.array([n_rec], pa.int64()),
        "reciprocity": pa.array([float(rec)], pa.float64()),
    })


def crawl_reciprocity(sf_dir: str, *, dump=None):
    """Query entry: link reciprocity of the crawl graph. Self-dump
    SQL-gated: the oracle re-derives DISTINCT directed edges from the
    dump and left-joins the reversed list independently."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_recip_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return edge_reciprocity(edges, dump=dump)


def adamic_adar_topk(edges_ds, *, k: int = 20, dump=None,
                     max_wedges_per_node: int = 2_000_000):
    """Adamic–Adar link prediction over a directed (src, dst) edge
    Dataset treated as an undirected simple graph — score(u, w) =
    Σ_{v ∈ N(u)∩N(w)} 1/ln(deg(v)), the classic common-neighbor
    predictor (Adamic & Adar, 2003; the "which links are missing"
    counterpart of the existing triangle/clustering analytics — a
    crawler uses it to prioritize probable-but-unseen links). Emits
    the top-k NON-adjacent pairs by score with a deterministic
    (rounded-score desc, lex) tie-break.

    Shape: degrees via endpoint explode + groupby; wedges per CENTER
    via map_groups over the both-direction adjacency (every neighbor
    pair of v inherits weight 1/ln(deg(v)) — well-defined because a
    wedge center has deg ≥ 2), one groupby sums pair scores, and the
    lex edge table anti-joins out existing edges (left-outer + null
    filter, the customers_without_orders pattern). Wedge emission is
    the operator's inherent Σ deg² cost (Suri & Vassilvitskii's bound
    does not apply — AA needs every wedge, not one per triangle);
    ``max_wedges_per_node`` fails loud on hub groups instead of
    silently emitting quadratic rows, the grouped_median convention.
    Scores are ROUNDED to 6dp before ranking so the top-k cut agrees
    with the oracle under float-sum reordering.

    ``dump`` receives the lex undirected edge table (u < v) from which
    SQL recomputes degree, wedges, scores and the anti-join fully
    independently."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def undirect(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pylist(), dtype=object)
        d = np.asarray(t.column("dst").to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        return pa.table({"lo": pa.array(lo.tolist(), pa.string()),
                         "hi": pa.array(hi.tolist(), pa.string())})

    el = (edges_ds.map_batches(undirect, batch_format="pyarrow")
          .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
          .select_columns(["lo", "hi"])).materialize()
    n_edges = el.count()
    empty = pa.table({"u": pa.array([], pa.string()),
                      "v": pa.array([], pa.string()),
                      "common_neighbors": pa.array([], pa.int64()),
                      "aa_score": pa.array([], pa.float64())})
    if n_edges == 0:
        if dump is not None:
            dump(pa.table({"u": pa.array([], pa.string()),
                           "v": pa.array([], pa.string())}))
        return empty
    if dump is not None:
        dump(pa.concat_tables(ray_get_tables(el))
             .rename_columns(["u", "v"]))

    def both_dirs(t: pa.Table) -> pa.Table:
        lo = t.column("lo").combine_chunks().cast(pa.string())
        hi = t.column("hi").combine_chunks().cast(pa.string())
        return pa.table({"ctr": pa.concat_arrays([lo, hi]),
                         "nbr": pa.concat_arrays([hi, lo])})

    adj = el.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()
    deg = adj.groupby("ctr").aggregate(Count(alias_name="deg")) \
        .materialize()

    n = _pr_parts(n_edges, adj, deg)
    j = adj.join(deg, "inner", n, on=("ctr",))

    def wedges(g: pa.Table) -> pa.Table:
        vs = np.sort(np.asarray(g.column("nbr").to_pylist(),
                                dtype=object))
        m = len(vs)
        if m < 2:
            return pa.table({"lo": pa.array([], pa.string()),
                             "hi": pa.array([], pa.string()),
                             "w": pa.array([], pa.float64())})
        n_pairs = m * (m - 1) // 2
        if n_pairs > max_wedges_per_node:
            raise ValueError(
                f"adamic_adar_topk: center {g.column('ctr')[0]} emits "
                f"{n_pairs} wedges > max_wedges_per_node="
                f"{max_wedges_per_node}; salt or cap hub adjacency")
        w = 1.0 / np.log(float(g.column("deg")[0].as_py()))
        ia, ib = np.triu_indices(m, k=1)
        return pa.table({
            "lo": pa.array(vs[ia].tolist(), pa.string()),
            "hi": pa.array(vs[ib].tolist(), pa.string()),
            "w": pa.array(np.full(len(ia), w), pa.float64())})

    scores = j.groupby("ctr").map_groups(wedges, batch_format="pyarrow") \
        .groupby(["lo", "hi"]) \
        .aggregate(Sum("w", alias_name="_s"),
                   Count(alias_name="common_neighbors"))

    mark = el.map_batches(
        lambda t: t.append_column(
            "_adj", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow")
    cand = scores.join(mark, "left_outer", n, on=("lo", "hi"))

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.is_null(t.column("_adj"))
        t = t.filter(keep)
        return pa.table({
            "u": t.column("lo").cast(pa.string()),
            "v": t.column("hi").cast(pa.string()),
            "common_neighbors": t.column("common_neighbors")
            .cast(pa.int64()),
            "aa_score": pc.round(t.column("_s"), 6),
        })

    out = cand.map_batches(finish, batch_format="pyarrow") \
        .sort(["aa_score", "u", "v"],
              descending=[True, False, False]).limit(k)
    return out


def crawl_adamic_adar(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web, rank the top-20
    missing links by Adamic–Adar score. Self-dump SQL-gated when
    ``dump`` is set (lex edge table only; DuckDB recomputes degrees,
    wedge scores and the anti-join from scratch)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_aa_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return adamic_adar_topk(edges, dump=dump)


def rich_club(edges_ds, *, dump=None):
    """Rich-club coefficient curve over the undirected crawl graph —
    φ(k) = 2·E_{>k} / (N_{>k}(N_{>k}−1)) for each degree threshold k:
    do the hubs preferentially link to each other (φ → 1) or only to
    the periphery (Colizza et al., 2006)? One row per threshold k
    with a non-empty >k node set of ≥2 nodes.

    Shape: degrees via endpoint explode + groupby; each edge carries
    min(deg(u), deg(v)) — an edge survives threshold k iff that min
    exceeds k — so ONE pass over the edge table yields the
    edges-per-threshold histogram (cumulated from the top), and the
    node side is the degree histogram's suffix. Driver algebra runs
    on the DEGREE-bounded threshold table, never on edges.

    ``dump`` receives the lex edge table; SQL recomputes degrees and
    the curve from scratch."""
    from ray.data.aggregate import Count

    def undirect(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pylist(), dtype=object)
        d = np.asarray(t.column("dst").to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        return pa.table({"lo": pa.array(lo.tolist(), pa.string()),
                         "hi": pa.array(hi.tolist(), pa.string())})

    el = (edges_ds.map_batches(undirect, batch_format="pyarrow")
          .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
          .select_columns(["lo", "hi"])).materialize()
    n_edges = el.count()
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "n_nodes": pa.array([], pa.int64()),
                      "n_edges": pa.array([], pa.int64()),
                      "phi": pa.array([], pa.float64())})
    if n_edges == 0:
        if dump is not None:
            dump(pa.table({"u": pa.array([], pa.string()),
                           "v": pa.array([], pa.string())}))
        return empty
    if dump is not None:
        dump(pa.concat_tables(ray_get_tables(el))
             .rename_columns(["u", "v"]))

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("lo").combine_chunks().cast(pa.string()),
             t.column("hi").combine_chunks().cast(pa.string())])})

    deg = (el.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))) \
        .materialize()

    n = _pr_parts(n_edges, el, deg)
    j = el.join(deg.rename_columns({"node": "lo", "deg": "dl"}),
                "inner", n, on=("lo",))
    j = j.join(deg.rename_columns({"node": "hi", "deg": "dh"}),
               "inner", n, on=("hi",))

    def edge_min(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False)
        dh = t.column("dh").to_numpy(zero_copy_only=False)
        return pa.table({"md": pa.array(np.minimum(dl, dh),
                                        pa.int64())})

    ehist = j.map_batches(edge_min, batch_format="pyarrow") \
        .groupby("md").aggregate(Count(alias_name="ne")) \
        .to_pandas()
    dhist = deg.groupby("deg").aggregate(Count(alias_name="nn")) \
        .to_pandas()
    md = ehist["md"].to_numpy(np.int64)
    ne = ehist["ne"].to_numpy(np.int64)
    dv = dhist["deg"].to_numpy(np.int64)
    nn = dhist["nn"].to_numpy(np.int64)
    max_k = int(dv.max())
    rows = []
    for k in range(0, max_k):
        nk = int(nn[dv > k].sum())
        if nk < 2:
            break
        ek = int(ne[md > k].sum())
        phi = 2.0 * ek / (nk * (nk - 1.0))
        rows.append((k, nk, ek, round(phi, 6)))
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "n_nodes": pa.array([r[1] for r in rows], pa.int64()),
        "n_edges": pa.array([r[2] for r in rows], pa.int64()),
        "phi": pa.array([r[3] for r in rows], pa.float64()),
    })


def crawl_rich_club(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web, emit the rich-club
    coefficient curve. Self-dump SQL-gated when ``dump`` is set."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_rc_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return rich_club(edges, dump=dump)


def degree_powerlaw(edges_ds, *, dump=None, d_min: int = 2):
    """Discrete power-law MLE over the undirected degree distribution
    — α̂ = 1 + n / Σ ln(d / (d_min − ½)) over degrees ≥ ``d_min``
    (Clauset, Shalizi & Newman 2009 eq. 3.7), the scale-free-ness
    summary of the crawl graph. One summary row (n tail nodes, d_min,
    alpha).

    Shape: degrees via endpoint explode + groupby; the MLE reduces
    over the DEGREE HISTOGRAM (Σ c_d · ln(...)), never per node.
    ``dump`` receives the lex edge table; SQL recomputes everything."""
    from ray.data.aggregate import Count

    def undirect(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src").to_pylist(), dtype=object)
        d = np.asarray(t.column("dst").to_pylist(), dtype=object)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.where(s < d, s, d)
        hi = np.where(s < d, d, s)
        return pa.table({"lo": pa.array(lo.tolist(), pa.string()),
                         "hi": pa.array(hi.tolist(), pa.string())})

    el = (edges_ds.map_batches(undirect, batch_format="pyarrow")
          .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
          .select_columns(["lo", "hi"])).materialize()
    if dump is not None:
        dump(pa.concat_tables(ray_get_tables(el))
             .rename_columns(["u", "v"]))

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("lo").combine_chunks().cast(pa.string()),
             t.column("hi").combine_chunks().cast(pa.string())])})

    dhist = (el.map_batches(endpoints, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="deg"))) \
        .groupby("deg").aggregate(Count(alias_name="c")).to_pandas()
    dv = dhist["deg"].to_numpy(np.float64)
    c = dhist["c"].to_numpy(np.float64)
    tail = dv >= d_min
    n = float(c[tail].sum())
    s = float((c[tail] * np.log(dv[tail] / (d_min - 0.5))).sum())
    alpha = 1.0 + n / s
    return pa.table({
        "d_min": pa.array([d_min], pa.int64()),
        "n_tail": pa.array([int(n)], pa.int64()),
        "alpha": pa.array([round(alpha, 6)], pa.float64()),
    })


def crawl_degree_powerlaw(sf_dir: str, *, dump=None):
    """Query entry: BFS-crawl the synthetic web, fit the degree
    power law. Self-dump SQL-gated when ``dump`` is set."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_pl_")
    cfg = CrawlConfig(strategy="bfs", max_depth=2, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, _nodes = edges_from_docs(res.docs_dir)
    return degree_powerlaw(edges, dump=dump)


def select_pivots_md5(nodes_ds, k: int) -> list:
    """Deterministic pivot sample for approximate betweenness: the k
    nodes with the LOWEST md5 hex of their url — the repo's standard
    hash-sampling law, so any re-run (and the pytest oracle) derives
    the identical pivot set. Scale shape: per-block local top-k
    combiner, driver sees blocks×k candidate rows."""
    import hashlib

    def local_k(t: pa.Table) -> pa.Table:
        urls = t.column("node").to_pylist()
        hs = sorted((hashlib.md5(u.encode()).hexdigest(), u)
                    for u in urls)[:k]
        return pa.table({
            "h": pa.array([h for h, _ in hs], pa.string()),
            "node": pa.array([u for _, u in hs], pa.string())})

    cand = nodes_ds.map_batches(local_k,
                                batch_format="pyarrow").to_pandas()
    return cand.sort_values("h")["node"].head(k).tolist()


def betweenness(edges_ds, nodes_ds, pivots, *, max_iters: int = 64):
    """Approximate betweenness centrality: exact Brandes dependency
    accumulation (Brandes, J. Math. Sociol. 2001) restricted to a
    pivot source set (the Bader/Riondato-style sampling estimator) —
    the restriction IS the contract, so the result is deterministic
    and the pytest oracle replays the identical pivot set exactly.

    Distributed shape — all |pivots| BFS trees advance in the SAME
    level-synchronous BSP rounds, state keyed (pivot, node):

    - forward round L: frontier (dist == L) joins edges on src,
      ``groupby(pivot, dst).sum(sigma)`` accumulates shortest-path
      counts; anti-join vs settled state admits level-L+1 rows.
    - backward round L (descending): level-L nodes emit
      (1 + delta)/sigma along reversed edges,
      ``groupby(pivot, src).sum`` collects, and level-L−1 rows fold
      delta += sigma × Σratio — the Brandes recurrence as one hash
      join + one groupby per level, nothing driver-resident.

    Sigma counts are integer-exact in float64; delta is float (sum
    order varies ~1e-12), so the query rounds and the oracle compares
    at 1e-9. Returns (node, btw) — Brandes delta summed over pivots,
    endpoints excluded; unreached or pivot-only nodes score 0."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    edges = edges_ds.map_batches(
        _cast_str("src", "dst"), batch_format="pyarrow") \
        .groupby(["src", "dst"]).count() \
        .select_columns(["src", "dst"]).materialize()   # simple graph
    nodes = nodes_ds.map_batches(
        _cast_str("node"), batch_format="pyarrow").materialize()
    pivots = sorted({str(p) for p in pivots})

    state = rd.from_arrow(pa.table({
        "p": pa.array(pivots, pa.string()),
        "node": pa.array(pivots, pa.string()),
        "dist": pa.array([0] * len(pivots), pa.int64()),
        "sigma": pa.array([1.0] * len(pivots), pa.float64()),
    })).materialize()
    n_edges = edges.count()

    def _at_level(t: pa.Table, lvl: int) -> pa.Table:
        return t.filter(pc.equal(t.column("dist"),
                                 pa.scalar(lvl, pa.int64())))

    max_level = 0
    for lvl in range(max_iters):
        frontier = state.map_batches(
            lambda t, lvl=lvl: (lambda f: pa.table({
                "p": f.column("p"), "src": f.column("node"),
                "fsig": f.column("sigma")}))(_at_level(t, lvl)),
            batch_format="pyarrow")
        if frontier.count() == 0:
            break
        n = _pr_parts(n_edges, edges, state)
        cand = (edges.join(frontier, "inner", n, on=("src",))
                .groupby(["p", "dst"])
                .aggregate(_Sum("fsig", alias_name="add_sig"))
                .rename_columns({"dst": "node"})).materialize()
        if cand.count() == 0:
            break       # frontier has no out-edges anywhere
        # admit only (p, node) cells not yet settled
        seen = state.map_batches(lambda t: pa.table({
            "p": t.column("p"), "node": t.column("node"),
            "_seen": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow")
        def admit(t: pa.Table, lvl=lvl) -> pa.Table:
            t = t.filter(pc.is_null(t.column("_seen")))
            return pa.table({
                "p": t.column("p"), "node": t.column("node"),
                "dist": pa.array(np.full(t.num_rows, lvl + 1,
                                         np.int64)),
                "sigma": t.column("add_sig")})

        fresh = (cand.join(seen, "left_outer",
                           _pr_parts(n_edges, cand, seen),
                           on=("p", "node"))
                 .map_batches(admit,
                              batch_format="pyarrow")).materialize()
        if fresh.count() == 0:
            break
        max_level = lvl + 1
        state = state.union(fresh).materialize()
    else:
        raise RuntimeError(
            f"betweenness forward BFS exceeded {max_iters} levels")

    # backward Brandes sweep; delta starts 0 everywhere
    state = state.map_batches(
        lambda t: t.append_column(
            "delta", pa.array(np.zeros(t.num_rows, np.float64))),
        batch_format="pyarrow").materialize()
    for lvl in range(max_level, 0, -1):
        wtab = state.map_batches(
            lambda t, lvl=lvl: (lambda f: pa.table({
                "p": f.column("p"), "dst": f.column("node"),
                "ratio": pc.divide(
                    pc.add(f.column("delta"), pa.scalar(1.0)),
                    f.column("sigma"))}))(_at_level(t, lvl)),
            batch_format="pyarrow")
        contrib = (edges.join(wtab, "inner",
                              _pr_parts(n_edges, edges, state),
                              on=("dst",))
                   .groupby(["p", "src"])
                   .aggregate(_Sum("ratio", alias_name="sr"))
                   .rename_columns({"src": "node"}))

        def fold(t: pa.Table, lvl=lvl) -> pa.Table:
            sr = pc.coalesce(t.column("sr"),
                             pa.scalar(0.0, pa.float64()))
            at_prev = pc.equal(t.column("dist"),
                               pa.scalar(lvl - 1, pa.int64()))
            add = pc.if_else(at_prev,
                             pc.multiply(t.column("sigma"), sr),
                             pa.scalar(0.0, pa.float64()))
            return pa.table({
                "p": t.column("p"), "node": t.column("node"),
                "dist": t.column("dist"), "sigma": t.column("sigma"),
                "delta": pc.add(t.column("delta"), add)})

        state = (state.join(contrib, "left_outer",
                            _pr_parts(n_edges, state, contrib),
                            on=("p", "node"))
                 .map_batches(fold, batch_format="pyarrow")) \
            .materialize()

    scores = (state.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(
            t.column("node"), t.column("p")))),
        batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Sum("delta", alias_name="btw")))
    # nodes never reached from any pivot score 0
    n = _pr_parts(n_edges, nodes, scores)
    return (nodes.join(scores, "left_outer", n, on=("node",))
            .map_batches(lambda t: pa.table({
                "node": t.column("node"),
                "btw": pc.round(pc.coalesce(
                    t.column("btw"), pa.scalar(0.0, pa.float64())),
                    ndigits=6)}), batch_format="pyarrow"))


def betweenness_numpy(edges: list, nodes: list, pivots: list) -> dict:
    """Driver oracle: textbook Brandes from the given pivot set over a
    (src, dst) edge list (duplicates collapse — same simple-graph law
    as the distributed form). Returns {node: btw}."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    btw = {v: 0.0 for v in nodes}
    for s in pivots:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        preds = defaultdict(list)
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                btw[w] += delta[w]
    return btw


def crawl_betweenness(sf_dir: str, *, n_pivots: int = 8):
    """Query entry: approximate betweenness centrality of the crawled
    link graph from the md5-lowest pivot set — which pages sit on the
    most shortest paths (the "bridge" ranking PageRank misses).
    Rows-only for the driver; the numerical oracle replays the exact
    pivot-restricted Brandes driver-side (tests/test_graph.py)."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_btw_")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    edges = edges.materialize()
    nodes = nodes.materialize()
    pivots = select_pivots_md5(nodes, n_pivots)
    return betweenness(edges, nodes, pivots) \
        .sort(["btw", "node"], descending=[True, False])


def multi_pivot_hops(edges_ds, nodes_ds, pivots, *,
                     max_iters: int = 64):
    """Per-(pivot, node) BFS hop distances from every pivot at once —
    the shared forward phase of the pivot-sampled centralities
    (betweenness above, harmonic below): all |pivots| BFS trees
    advance in the same level-synchronous BSP rounds; each round is
    one hash join (frontier × edges on src), one
    ``groupby(pivot, dst)`` dedup and one anti-join vs settled cells.
    Returns a Dataset (p, node, dist) of REACHED cells only."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count

    edges = edges_ds.map_batches(
        _cast_str("src", "dst"), batch_format="pyarrow") \
        .groupby(["src", "dst"]).count() \
        .select_columns(["src", "dst"]).materialize()
    pivots = sorted({str(p) for p in pivots})
    state = rd.from_arrow(pa.table({
        "p": pa.array(pivots, pa.string()),
        "node": pa.array(pivots, pa.string()),
        "dist": pa.array([0] * len(pivots), pa.int64()),
    })).materialize()
    n_edges = edges.count()

    def _at_level(t: pa.Table, lvl: int) -> pa.Table:
        return t.filter(pc.equal(t.column("dist"),
                                 pa.scalar(lvl, pa.int64())))

    for lvl in range(max_iters):
        frontier = state.map_batches(
            lambda t, lvl=lvl: (lambda f: pa.table({
                "p": f.column("p"),
                "src": f.column("node")}))(_at_level(t, lvl)),
            batch_format="pyarrow")
        if frontier.count() == 0:
            break
        n = _pr_parts(n_edges, edges, state)
        cand = (edges.join(frontier, "inner", n, on=("src",))
                .groupby(["p", "dst"])
                .aggregate(_Count(alias_name="_c"))
                .rename_columns({"dst": "node"})).materialize()
        if cand.count() == 0:
            break
        seen = state.map_batches(lambda t: pa.table({
            "p": t.column("p"), "node": t.column("node"),
            "_seen": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow")

        def admit(t: pa.Table, lvl=lvl) -> pa.Table:
            t = t.filter(pc.is_null(t.column("_seen")))
            return pa.table({
                "p": t.column("p"), "node": t.column("node"),
                "dist": pa.array(np.full(t.num_rows, lvl + 1,
                                         np.int64))})

        fresh = (cand.join(seen, "left_outer",
                           _pr_parts(n_edges, cand, seen),
                           on=("p", "node"))
                 .map_batches(admit,
                              batch_format="pyarrow")).materialize()
        if fresh.count() == 0:
            break
        state = state.union(fresh).materialize()
    else:
        raise RuntimeError(
            f"multi_pivot_hops exceeded {max_iters} levels")
    return state


def harmonic_centrality(edges_ds, nodes_ds, pivots, *, dump=None):
    """Pivot-sampled harmonic centrality (Boldi & Vigna 2014 framing):
    H(v) = Σ_{p ∈ pivots, p ≠ v, d(p,v) < ∞} 1/d(p,v) over directed
    BFS distances FROM the pivots — the centrality that handles
    disconnected graphs where closeness breaks. Exact on the pivot
    restriction, so fully SQL-oracle-able: ``dump`` receives
    edges/nodes/pivots and the oracle replays every distance with a
    (pivot, node)-keyed recursive closure, then the same 1/d
    aggregation. Also emits n_reached / min_hop / max_hop per node.

    Scale shape: ``multi_pivot_hops`` BSP forward phase + ONE
    groupby(node) aggregation; nothing driver-resident."""
    import pyarrow.compute as pc
    from ray.data.aggregate import (Count as _Count, Max as _Max,
                                    Min as _Min, Sum as _Sum)

    nodes = nodes_ds.map_batches(
        _cast_str("node"), batch_format="pyarrow").materialize()
    pivots = sorted({str(p) for p in pivots})
    if dump is not None:
        et = pa.concat_tables(ray_get_tables(
            edges_ds.map_batches(_cast_str("src", "dst"),
                                 batch_format="pyarrow")))
        nt = pa.concat_tables(ray_get_tables(nodes))
        dump(pa.concat_tables([
            pa.table({"kind": pa.array(["e"] * et.num_rows),
                      "a": et.column("src"), "b": et.column("dst")}),
            pa.table({"kind": pa.array(["n"] * nt.num_rows),
                      "a": nt.column("node"), "b": nt.column("node")}),
            pa.table({"kind": pa.array(["s"] * len(pivots)),
                      "a": pa.array(pivots, pa.string()),
                      "b": pa.array(pivots, pa.string())}),
        ]))

    hops = multi_pivot_hops(edges_ds, nodes, pivots)

    def inv(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("p"),
                                        t.column("node"))))
        d = t.column("dist").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "node": t.column("node"),
            "inv_d": pa.array(1.0 / d),
            "dist": t.column("dist")})

    agg = (hops.map_batches(inv, batch_format="pyarrow")
           .groupby("node")
           .aggregate(_Sum("inv_d", alias_name="h"),
                      _Count(alias_name="nr"),
                      _Min("dist", alias_name="mn"),
                      _Max("dist", alias_name="mx"))).materialize()
    n = _pr_parts(agg.count(), nodes, agg)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "harmonic": pc.round(pc.coalesce(
                t.column("h"), pa.scalar(0.0, pa.float64())),
                ndigits=6),
            "n_reached": pc.coalesce(t.column("nr"),
                                     pa.scalar(0, pa.int64())),
            "min_hop": pc.coalesce(t.column("mn"),
                                   pa.scalar(-1, pa.int64())),
            "max_hop": pc.coalesce(t.column("mx"),
                                   pa.scalar(-1, pa.int64()))})

    return nodes.join(agg, "left_outer", n, on=("node",)) \
        .map_batches(finish, batch_format="pyarrow")


def crawl_harmonic_centrality(sf_dir: str, *, n_pivots: int = 8,
                              dump=None):
    """Query entry: pivot-sampled harmonic centrality of the crawled
    link graph (md5-lowest pivot law). SQL-gated via the dumped
    edges/pivots — the oracle recursively replays every pivot
    distance and re-aggregates Σ1/d independently."""
    import tempfile

    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_harm_")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    edges = edges.materialize()
    nodes = nodes.materialize()
    pivots = select_pivots_md5(nodes, n_pivots)
    return harmonic_centrality(edges, nodes, pivots, dump=dump) \
        .sort(["harmonic", "node"], descending=[True, False])


def personalized_pagerank(edges_ds, nodes_ds, seeds, *,
                          damping: float = 0.85, max_iters: int = 50,
                          tol: float = 1e-8, form: str = "auto"):
    """Personalized PageRank (the original Page et al. 1999 teleport
    generalization; Haveliwala, WWW 2002): random walks restart at the
    SEED SET instead of uniformly, ranking pages by relevance TO the
    seeds — the principled version of the reference's BFF keyword
    relevance scorer over an actual link graph. Teleport vector
    e(v) = 1/|seeds| on seeds, 0 elsewhere; dangling mass also returns
    to the seeds (the standard PPR completion, keeping Σrank = 1).

    Distributed shape mirrors ``pagerank``'s Pregel form: weights
    1/outdeg attached once; one hash join + one groupby(dst).sum +
    one left-outer apply per iteration; dangling mass is one scalar
    aggregate. Multi-edges vote with multiplicity (same law).
    Converges on L1 delta < tol. Rows-only for the driver; the pytest
    oracle is a numpy power iteration with the identical law
    (tests/test_graph.py)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if isinstance(edges_ds, pa.Table):
        edges_ds = rd.from_arrow(edges_ds)
    if isinstance(nodes_ds, pa.Table):
        nodes_ds = rd.from_arrow(nodes_ds)
    edges_ds = edges_ds.map_batches(_cast_str("src", "dst"),
                                    batch_format="pyarrow")
    nodes = (nodes_ds.select_columns(["node"])
             .map_batches(_cast_str("node"), batch_format="pyarrow")
             .materialize())
    seeds = sorted({str(s) for s in seeds})
    seed_set = set(seeds)
    n_seeds = len(seeds)
    n_nodes = nodes.count()
    n_edges = edges_ds.count()
    if form == "auto":
        form = ("driver" if n_edges < PAGERANK_DRIVER_MAX_EDGES
                else "distributed")
    if form == "driver":
        # same measured crossover as pagerank: under ~2M edges the
        # per-round Ray overhead dominates — run the identical law as
        # driver bincounts (the pytest gate pins both forms equal)
        node_list = [r["node"] for r in nodes.iter_rows()]
        idx = {u: i for i, u in enumerate(node_list)}
        srcs, dsts = [], []
        for b in edges_ds.iter_batches(batch_format="pyarrow"):
            srcs.append(np.array(
                [idx[x] for x in b.column("src").to_pylist()],
                np.int64))
            dsts.append(np.array(
                [idx[x] for x in b.column("dst").to_pylist()],
                np.int64))
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        out = np.bincount(src, minlength=n_nodes).astype(np.float64)
        dangling = out == 0
        w = 1.0 / out[src] if len(src) else np.zeros(0)
        e = np.zeros(n_nodes)
        for u in seeds:
            e[idx[u]] = 1.0 / n_seeds
        rank = e.copy()
        for _ in range(max_iters):
            contrib = np.bincount(dst, weights=w * rank[src],
                                  minlength=n_nodes)
            dm = rank[dangling].sum()
            new_r = (1.0 - damping) * e + damping * (contrib + dm * e)
            delta = np.abs(new_r - rank).sum()
            rank = new_r
            if delta < tol:
                break
        return rd.from_arrow(pa.table({
            "node": pa.array(node_list, pa.string()),
            "rank": pa.array(rank)}))

    edges_one = edges_ds.map_batches(
        lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
    outdeg = (edges_one.groupby("src")
              .aggregate(Sum("one", alias_name="outdeg"))
              .select_columns(["src", "outdeg"]).materialize())
    n_join = _pr_parts(n_edges, edges_ds, outdeg)
    edges_w = (
        edges_ds.join(outdeg, "inner", n_join, on=("src",))
        .map_batches(lambda t: pa.table({
            "src": t.column("src"), "dst": t.column("dst"),
            "w": pa.array(1.0 / t.column("outdeg").to_numpy()
                          .astype(np.float64))}),
            batch_format="pyarrow").materialize())

    def init(t: pa.Table) -> pa.Table:
        node = t.column("node").to_pylist()
        e = np.array([1.0 / n_seeds if u in seed_set else 0.0
                      for u in node])
        return pa.table({
            "node": t.column("node"),
            "rank": pa.array(e),          # start at the teleport dist
            "e": pa.array(e),
            "dangling": pa.array(
                [v is None for v in t.column("outdeg").to_pylist()])})

    ranks = (nodes.join(outdeg.rename_columns({"src": "node"}),
                        "left_outer",
                        _pr_parts(min(n_nodes, max(n_edges, 1)),
                                  nodes, outdeg),
                        on=("node",))
             .map_batches(init, batch_format="pyarrow").materialize())

    for _ in range(max_iters):
        dm = ranks.map_batches(
            lambda t: pa.table({"dm": pa.array([
                float(np.sum(t.column("rank").to_numpy()
                             [t.column("dangling").to_numpy(
                                 zero_copy_only=False)]))])}),
            batch_format="pyarrow").sum("dm") or 0.0

        n = _pr_parts(min(max(n_edges, 1), n_nodes), edges_w, ranks)
        contrib = (edges_w.join(
            ranks.select_columns(["node", "rank"])
            .rename_columns({"node": "src"}), "inner", n, on=("src",))
            .map_batches(lambda t: pa.table({
                "node": t.column("dst"),
                "c": pc.multiply(t.column("w"), t.column("rank"))}),
                batch_format="pyarrow")
            .groupby("node").aggregate(Sum("c", alias_name="c"))
        ).materialize()

        def apply_rank(t: pa.Table, dm=dm) -> pa.Table:
            c = pc.coalesce(t.column("c"),
                            pa.scalar(0.0, pa.float64())) \
                .to_numpy(zero_copy_only=False)
            e = t.column("e").to_numpy(zero_copy_only=False)
            new = (1.0 - damping) * e + damping * (c + dm * e)
            old = t.column("rank").to_numpy(zero_copy_only=False)
            return pa.table({
                "node": t.column("node"), "rank": pa.array(new),
                "e": t.column("e"), "dangling": t.column("dangling"),
                "delta": pa.array(np.abs(new - old))})

        stepped = (ranks.select_columns(["node", "rank", "e",
                                         "dangling"])
                   .join(contrib, "left_outer",
                         _pr_parts(min(max(n_edges, 1), n_nodes),
                                   ranks, contrib),
                         on=("node",))
                   .map_batches(apply_rank, batch_format="pyarrow")
                   .materialize())
        l1 = stepped.sum("delta") or 0.0
        ranks = stepped.drop_columns(["delta"]).materialize()
        if l1 < tol:
            break
    return ranks.select_columns(["node", "rank"])


def personalized_pagerank_numpy(edges: list, nodes: list, seeds: list,
                                *, damping: float = 0.85,
                                max_iters: int = 50,
                                tol: float = 1e-8) -> dict:
    """Driver oracle: the identical PPR law as a dense power
    iteration (multi-edge multiplicity, dangling mass to seeds)."""
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    e = np.zeros(n)
    for s in seeds:
        e[idx[s]] = 1.0 / len(seeds)
    r = e.copy()
    for _ in range(max_iters):
        c = np.zeros(n)
        for s, d in edges:
            c[idx[d]] += r[idx[s]] / outdeg[idx[s]]
        dm = float(r[outdeg == 0].sum())
        new = (1.0 - damping) * e + damping * (c + dm * e)
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in nodes}


def crawl_pagerank_personalized(sf_dir: str, *, n_seeds: int = 4):
    """Query entry: PPR of the crawl graph personalized to the crawl's
    ORIGINAL seed pages — "how relevant is each discovered page to
    where the crawl started", the seeded-relevance ranking. Rows-only;
    numpy power-iteration oracle in tests/test_graph.py."""
    import tempfile

    from ..functions import urlkit
    from ..sources.synthetic_web import SiteConfig, SyntheticWeb
    from .crawl import CrawlConfig, CrawlEngine

    site_cfg = SiteConfig(n_hosts=4)
    site = SyntheticWeb(site_cfg)
    out_dir = tempfile.mkdtemp(prefix="c4r_ppr_")
    cfg = CrawlConfig(strategy="bfs", max_depth=3, out_dir=out_dir,
                      n_seen_shards=2, fetch_concurrency=2)
    res = CrawlEngine(cfg, fetcher_kwargs={"site_cfg": site_cfg.__dict__}) \
        .run(site.seed_urls())
    edges, nodes = edges_from_docs(res.docs_dir)
    seeds = [urlkit.canonicalize(u, u) or u
             for u in site.seed_urls()][:n_seeds]

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "rank": pa.array(np.round(
                t.column("rank").to_numpy(zero_copy_only=False), 8))})

    return (personalized_pagerank(edges.materialize(),
                                  nodes.materialize(), seeds)
            .map_batches(finish, batch_format="pyarrow")
            .sort(["rank", "node"], descending=[True, False]))
