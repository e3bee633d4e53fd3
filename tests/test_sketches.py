"""Distinct-count (exact + HLL) and distributed k-means operators.

Gates:
- exact distinct per type == DuckDB COUNT(DISTINCT) on the same parquet;
- HLL estimate within the standard-error bound of the exact count, and
  the register table is merge-stable (splitting the input and merging
  partials gives the identical estimate — the mergeability law);
- k-means: deterministic across runs, inertia non-increasing over
  iterations, every point labeled, distances consistent with centroids.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from crawl4ai_ray.pipelines import sketches

SF = "/root/testdata/sf0.001"


def _exact_distinct_duckdb(sf_dir):
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type ORDER BY event_type
            """
        ).fetch_arrow_table()
    finally:
        con.close()


def test_distinct_users_by_type_matches_duckdb():
    got = (
        sketches.distinct_users_by_type(SF)
        .sort("event_type")
        .to_pandas()
        .reset_index(drop=True)
    )
    want = _exact_distinct_duckdb(SF).to_pandas()
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n_users"]) == list(want["n_users"])


def test_hll_within_error_bound():
    con = duckdb.connect()
    try:
        exact = con.execute(
            f"SELECT count(DISTINCT user_id) FROM "
            f"read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
    finally:
        con.close()
    p = 14
    tbl = sketches.distinct_users_hll(SF, p=p)
    est = tbl.column("n_users_approx")[0].as_py()
    assert tbl.column("precision_p")[0].as_py() == p
    # standard error 1.04/sqrt(m); allow 3 sigma
    rel_err = abs(est - exact) / exact
    assert rel_err < 3 * 1.04 / np.sqrt(1 << p), (est, exact)


def test_hll_registers_merge_stable():
    """Splitting the input into halves and merging register partials by
    max must equal the single-pass registers — the HLL mergeability law
    that makes the sketch safe for re-aggregation across shards."""
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    full_ds, m = sketches.hll_partial_registers(ds, "user_id", p=12)
    full = {r["reg"]: r["rho"] for r in full_ds.take_all()}

    tbl = pa.concat_tables(
        ds.iter_batches(batch_size=10**9, batch_format="pyarrow")
    )
    half = len(tbl) // 2
    merged = {}
    for part in (tbl.slice(0, half), tbl.slice(half)):
        part_ds, _ = sketches.hll_partial_registers(
            rd.from_arrow(part), "user_id", p=12)
        for r in part_ds.take_all():
            merged[r["reg"]] = max(merged.get(r["reg"], 0), r["rho"])
    assert merged == full
    assert sketches.hll_estimate(merged, m) == sketches.hll_estimate(
        full, m)


@pytest.fixture(scope="module")
def kmeans_result():
    cent, n_iters, inertia = sketches.kmeans_fit(SF, k=6, max_iters=15)
    return cent, n_iters, inertia


def test_kmeans_deterministic(kmeans_result):
    cent, n_iters, inertia = kmeans_result
    cent2, n_iters2, inertia2 = sketches.kmeans_fit(SF, k=6, max_iters=15)
    assert n_iters == n_iters2
    assert inertia == pytest.approx(inertia2, rel=0, abs=0)
    np.testing.assert_array_equal(cent, cent2)


def test_kmeans_inertia_non_increasing():
    seen = []
    for iters in (1, 2, 4, 8):
        _, _, inertia = sketches.kmeans_fit(SF, k=6, max_iters=iters)
        seen.append(inertia)
    assert all(b <= a + 1e-9 for a, b in zip(seen, seen[1:])), seen


def test_kmeans_assignments_cover_and_match_centroids(kmeans_result):
    cent, _, _ = kmeans_result
    df = sketches.kmeans_assignments(SF, k=6, max_iters=15).to_pandas()
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    assert len(df) == emb.num_rows
    assert sorted(df["vec_id"]) == sorted(
        emb.column("vec_id").to_pylist())
    assert df["cluster"].between(0, 5).all()
    # spot-check: reported dist equals the true distance to the reported
    # centroid, and no other centroid is closer
    x = np.array(
        emb.column("embedding").to_pylist(), dtype=np.float64)
    by_id = {int(v): i for i, v in enumerate(
        emb.column("vec_id").to_pylist())}
    rows = df.sample(n=50, random_state=7)
    for _, r in rows.iterrows():
        xi = x[by_id[int(r["vec_id"])]]
        dists = np.linalg.norm(cent - xi[None, :], axis=1)
        assert r["dist"] == pytest.approx(
            round(float(dists[int(r["cluster"])]), 5), abs=1e-5)
        assert dists[int(r["cluster"])] <= dists.min() + 1e-9


def test_tdigest_rank_error_and_counts():
    import duckdb

    from crawl4ai_ray.pipelines.sketches import events_value_tdigest

    td = events_value_tdigest(SF).to_pandas().set_index("event_type")
    con = duckdb.connect()
    try:
        ev = con.execute(
            f"SELECT event_type, value FROM "
            f"read_parquet('{SF}/events.parquet')").df()
    finally:
        con.close()
    for et, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        assert td.loc[et, "n"] == len(g)          # weights are exact
        for q in (0.5, 0.9, 0.99):
            est = td.loc[et, f"p{int(q * 100)}"]
            rank = np.searchsorted(v, est) / len(v)
            # t-digest rank-error law: ~1/delta at the median, tighter
            # at the tails; 0.01 is a conservative gate for delta=200
            assert abs(rank - q) < 0.01, (et, q, est, rank)


def test_tdigest_merge_is_order_insensitive():
    from crawl4ai_ray.pipelines.sketches import (
        tdigest_compress,
        tdigest_quantile,
    )

    rng = np.random.default_rng(7)
    v = rng.gamma(2.0, 50.0, size=20000)
    # digest of the whole vs merge of 8 chunk digests (any order)
    m0, w0 = tdigest_compress(v, np.ones(len(v)), delta=200)
    parts = [tdigest_compress(c, np.ones(len(c)), delta=200)
             for c in np.array_split(v, 8)]
    for order in (parts, parts[::-1]):
        ms = np.concatenate([p[0] for p in order])
        ws = np.concatenate([p[1] for p in order])
        m1, w1 = tdigest_compress(ms, ws, delta=200)
        assert w1.sum() == len(v)
        exact = np.sort(v)
        for q in (0.1, 0.5, 0.9, 0.99):
            est = tdigest_quantile(m1, w1, q)
            rank = np.searchsorted(exact, est) / len(v)
            assert abs(rank - q) < 0.015, (q, est, rank)
            # merged estimate tracks the single-pass digest too
            assert abs(tdigest_quantile(m0, w0, q) - est) \
                <= 0.05 * max(1.0, abs(est))


def test_bloom_no_false_negatives_and_fp_bound():
    from crawl4ai_ray.pipelines.sketches import (
        bloom_build,
        bloom_params,
        bloom_probe_mask,
        _read,
    )

    cust = _read(SF, "customer", ["c_custkey"]).materialize()
    n = cust.count()
    bits_b, m, k = bloom_build(cust, "c_custkey", n, fp_rate=0.01)
    bits = np.frombuffer(bits_b, dtype=np.uint8)
    keys = np.array(
        [r["c_custkey"] for r in cust.iter_rows()], np.int64)
    # bloom guarantee: every inserted key probes positive
    assert bloom_probe_mask(keys, bits, m, k).all()
    # false-positive rate on definitely-absent keys stays near target
    absent = np.arange(10_000_000, 10_050_000, dtype=np.int64)
    fp = bloom_probe_mask(absent, bits, m, k).mean()
    assert fp < 0.03, fp
    # sizing law sanity
    m2, k2 = bloom_params(1000, 0.01)
    assert m2 >= 9500 and 6 <= k2 <= 8


def test_bloom_semijoin_prunes_and_matches_exact():
    import duckdb

    from crawl4ai_ray.pipelines.sketches import orders_bloom_semijoin

    got = orders_bloom_semijoin(SF).to_pandas() \
        .sort_values(["o_orderkey"]).reset_index(drop=True)
    con = duckdb.connect()
    try:
        want = con.execute(f"""
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
            FROM read_parquet('{SF}/orders.parquet') o
            JOIN read_parquet('{SF}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            ORDER BY o.o_orderkey
        """).df()
    finally:
        con.close()
    assert len(got) == len(want)
    assert (got["o_orderkey"].to_numpy()
            == want["o_orderkey"].to_numpy()).all()
    # the bloom prune must actually drop most non-matching rows:
    # BUILDING is ~23% of customers, so survivors ≪ all orders
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    assert len(got) < 0.5 * n_orders


def test_misra_gries_summary_and_merge_laws():
    from crawl4ai_ray.pipelines.sketches import mg_merge, mg_summarize

    stream = (["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 5
              + [f"x{i}" for i in range(40)])
    s = mg_summarize(stream, capacity=8)
    n = len(stream)
    import collections

    true = collections.Counter(stream)
    assert len(s) <= 8
    for t, c in s.items():
        assert c <= true[t]                      # never over-estimates
        assert true[t] - c <= n // (8 + 1) + 1   # MG error bound
    # merge law: summaries of two halves ≈ summary of the whole
    h1 = mg_summarize(stream[: n // 2], 8)
    h2 = mg_summarize(stream[n // 2:], 8)
    m = mg_merge([h1, h2], 8)
    assert len(m) <= 8
    for t, c in m.items():
        assert c <= true[t]
        assert true[t] - c <= 2 * (n // 9 + 1)
    assert max(m, key=lambda t: (m[t], t)) == "a"


def test_corpus_top_terms_mg_contains_true_heavy_hitters():
    import duckdb

    from crawl4ai_ray.pipelines.sketches import corpus_top_terms_mg

    df = corpus_top_terms_mg(SF, k=50, capacity=4096).to_pandas()
    con = duckdb.connect()
    try:
        exact = con.execute(rf"""
            SELECT term, count(*) AS n FROM (
                SELECT unnest(string_split_regex(trim(lower(text)),
                                                 '\s+')) AS term
                FROM read_parquet('{SF}/documents.parquet')
            ) WHERE term <> ''
            GROUP BY term ORDER BY n DESC, term
        """).df()
        n_tokens = int(exact["n"].sum())
    finally:
        con.close()
    # the sf0.001 vocabulary (~31 terms) is below k: the sketch holds
    # every term and the top-k is just all of them
    assert len(df) == min(50, len(exact))
    bound = n_tokens // 4097 + 1
    est = dict(zip(df["term"], df["est_count"]))
    true = dict(zip(exact["term"], exact["n"]))
    # every estimate under-counts by at most the bound
    for t, c in est.items():
        assert c <= true[t]
        assert true[t] - c <= bound, (t, true[t], c)
    # every true top-k term whose margin over the (k+1)-th exceeds the
    # bound must be present in the sketch's top-k
    kk = min(50, len(exact) - 1)
    kth = int(exact["n"].iloc[kk]) if kk < len(exact) else 0
    for t, n in zip(exact["term"].head(kk), exact["n"].head(kk)):
        if n - kth > bound:
            assert t in est, t


@pytest.mark.usefixtures("ray_session")
def test_embedding_pca_laws():
    """PCA gate: scores match centered-data x numpy-eigh projection;
    components orthonormal; per-PC score variance equals the
    eigenvalue; reconstruction error decreases with k."""
    import numpy as np
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.sketches import embedding_pca

    SF = "/root/testdata/sf0.001"
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)

    got = embedding_pca(SF, k=8).to_pandas()
    assert len(got) == len(ids) * 8

    mu = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    comps = v[:, order]
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(8)])
    comps = comps * flip[None, :]
    want = (x - mu) @ comps

    piv = got.pivot(index="vec_id", columns="pc", values="score") \
        .loc[ids].to_numpy()
    assert np.abs(piv - np.round(want, 6)).max() < 2e-6

    # variance of scores per PC == eigenvalue (population variance)
    ev = np.sort(w)[::-1][:8]
    assert np.allclose(piv.var(axis=0), ev, rtol=1e-3)
    # orthonormal loadings
    assert np.allclose(comps.T @ comps, np.eye(8), atol=1e-10)


def test_count_min_laws():
    """CMS laws: (1) estimate >= truth for EVERY key; (2) estimate <=
    truth + eps*N with eps = e/width (the Cormode-Muthukrishnan bound
    holds in expectation per row; min over depth rows makes violations
    on this fixed dataset vanishingly unlikely — checked exactly);
    (3) the grid is blocking-insensitive: rebuilding from differently
    sliced blocks yields the identical grid (mergeable state)."""
    import math

    import ray.data as rd

    width, depth = 32, 4
    vals = [i % 17 for i in range(400)] + [3] * 100 + [99] * 7
    t = pa.table({"k": pa.array(vals, pa.int64())})
    ds1 = rd.from_arrow([t.slice(i * 39, 39) for i in range(13)])
    ds2 = rd.from_arrow([t.slice(0, 250), t.slice(250)])

    g1 = {(int(r["row"]), int(r["cell"])): int(r["n"])
          for r in sketches.count_min_partials(
              ds1, "k", width, depth).take_all()}
    g2 = {(int(r["row"]), int(r["cell"])): int(r["n"])
          for r in sketches.count_min_partials(
              ds2, "k", width, depth).take_all()}
    assert g1 == g2

    import collections
    truth = collections.Counter(vals)
    keys = sorted(truth)
    ests = sketches.cms_estimate(g1, keys, width, depth)
    n_total = len(vals)
    eps = math.e / width
    for k, est in zip(keys, ests):
        assert est >= truth[k], k
        assert est <= truth[k] + eps * n_total, k
    # every row's counters sum to the total stream length
    for r in range(depth):
        assert sum(v for (rr, _), v in g1.items() if rr == r) == n_total


# ---------------------------------------------------------------- logreg

def _numpy_logreg(sf_dir, lr=0.5, iters=12, l2=1e-3):
    """Single-process reference GD with the identical feature build,
    init, learning rate and regularization."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "value", "ts"])
    v = t.column("value").to_numpy()
    ts = t.column("ts").to_numpy().astype("datetime64[us]")
    h = ((ts.astype("datetime64[h]").astype(np.int64)) % 24) \
        .astype(np.float64)
    mu = v.mean()
    sd = np.sqrt((v * v).mean() - mu * mu)
    x = np.column_stack([np.ones(len(v)), (v - mu) / sd, h / 23.0])
    y = (t.column("event_type").to_pylist() == np.array("purchase")) \
        .astype(np.float64)
    w = np.zeros(3)
    losses = []
    for _ in range(iters):
        z = x @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = x.T @ (p - y)
        reg = l2 * np.concatenate(([0.0], w[1:]))
        w = w - lr * (g / len(y) + reg)
        losses.append(float((np.logaddexp(0.0, z) - y * z).mean()))
    return w, losses


def test_logreg_deterministic_and_matches_numpy():
    w1, mu1, sd1, losses1 = sketches.logreg_fit(SF, iters=12)
    w2, mu2, sd2, losses2 = sketches.logreg_fit(SF, iters=12)
    assert np.array_equal(w1, w2) and mu1 == mu2 and sd1 == sd2
    assert losses1 == losses2

    wref, lref = _numpy_logreg(SF, iters=12)
    assert np.allclose(w1, wref, atol=1e-6), (w1, wref)
    assert np.allclose(losses1, lref, atol=1e-6)


def test_logreg_loss_monotone_and_query_surface():
    w, _, _, losses = sketches.logreg_fit(SF, iters=12)
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), \
        losses
    out = sketches.events_purchase_lr(SF, iters=12).to_pandas()
    assert list(out["feature"]) == ["intercept", "value_z",
                                    "hour_frac"]
    assert np.allclose(out["coef"].to_numpy(),
                       np.round(w, 6))
    assert 0.0 <= out["train_accuracy"].iloc[0] <= 1.0
    assert out["train_log_loss"].iloc[0] > 0.0


@pytest.mark.usefixtures("ray_session")
def test_gmm_em_laws_and_replay():
    """EM loglik is non-decreasing (the EM guarantee); the distributed
    fit matches a driver numpy replay with the same deterministic init
    (rtol 1e-8 — float sum order is the only difference); MAP
    assignments agree exactly."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.01"
    w, mu, vr, lls = sketches.gmm_fit(sf, max_iters=12)
    assert all(b >= a - 1e-9 * abs(a) for a, b in zip(lls, lls[1:]))
    tb = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    vecs = np.array(tb.column("embedding").to_pylist(), np.float64)
    w2, mu2, vr2, lls2 = sketches.gmm_fit_numpy(vecs, max_iters=12)
    assert np.allclose(lls, lls2, rtol=1e-8)
    assert np.allclose(w, w2, atol=1e-9)
    assert np.allclose(mu, mu2, atol=1e-7)

    out = sketches.gmm_assignments(sf, max_iters=12).to_pandas()
    assert len(out) == len(vecs)
    k = len(w2)
    lp = np.empty((len(vecs), k))
    for j in range(k):
        z = (vecs - mu2[j]) ** 2 / vr2[j]
        lp[:, j] = (np.log(w2[j])
                    - 0.5 * (np.log(2 * np.pi * vr2[j]).sum()
                             + z.sum(axis=1)))
    assert (out.sort_values("vec_id")["comp"].to_numpy()
            == lp.argmax(axis=1)).all()
    assert ((out["resp"] >= 0) & (out["resp"] <= 1)).all()


@pytest.mark.usefixtures("ray_session")
def test_isotonic_calibration_laws():
    """PAV output is non-decreasing, preserves the weighted mean,
    every pooled block's value is the weighted mean of its members,
    and the distributed pipeline matches a DuckDB-histogram + driver
    PAV replay exactly."""
    sf = "/root/testdata/sf0.01"
    out = sketches.events_isotonic_calibration(sf).to_pandas() \
        .sort_values("bin_lo").reset_index(drop=True)
    iso = out["rate_iso"].to_numpy()
    n = out["n_events"].to_numpy(np.float64)
    raw = out["n_purchases"].to_numpy(np.float64) / n
    assert (np.diff(iso) >= -1e-12).all()
    assert abs((iso * n).sum() - (raw * n).sum()) < 1e-6 * n.sum()

    con = duckdb.connect()
    hist = con.execute(f"""
        SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
               sum(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS y,
               count(*) AS n
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    want = sketches.pav_isotonic(
        hist["y"].to_numpy(np.float64) / hist["n"].to_numpy(np.float64),
        hist["n"].to_numpy(np.float64))
    assert np.allclose(iso, np.round(want, 6), atol=1e-9)
    # block-pooling law: equal consecutive iso values average to the
    # same pooled mean as their raw members
    blocks = np.flatnonzero(np.diff(iso) > 1e-12)
    starts = np.concatenate(([0], blocks + 1))
    ends = np.concatenate((blocks + 1, [len(iso)]))
    for a, b in zip(starts, ends):
        pooled = (raw[a:b] * n[a:b]).sum() / n[a:b].sum()
        assert abs(pooled - iso[a:b].mean()) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_ridge_normal_equations_replay():
    """Distributed two-pass ridge == an independent DuckDB-load +
    numpy normal-equations replay; SSE from sufficient statistics
    equals the direct residual norm; λ=0 reduces to OLS."""
    sf = "/root/testdata/sf0.01"
    w, mu, sd, mse, r2 = sketches.ridge_fit(sf, lam=1.0)

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT value, extract(hour FROM ts) AS h,
               CASE WHEN event_type = 'purchase'
                    THEN 1.0 ELSE 0.0 END AS y
        FROM read_parquet('{sf}/events.parquet')""").df()
    v = df["value"].to_numpy(np.float64)
    mu2 = v.mean()
    sd2 = v.std()
    x = np.column_stack([np.ones(len(v)), (v - mu2) / sd2,
                         df["h"].to_numpy(np.float64) / 23.0])
    y = df["y"].to_numpy(np.float64)
    pen = np.eye(3)
    pen[0, 0] = 0.0
    w2 = np.linalg.solve(x.T @ x + pen, x.T @ y)
    assert np.allclose(w, w2, atol=1e-8), (w, w2)
    assert abs(mu - mu2) < 1e-9 and abs(sd - sd2) < 1e-9
    # SSE identity
    sse_direct = float(((y - x @ w2) ** 2).sum())
    assert abs(mse * len(y) - sse_direct) < 1e-6 * max(sse_direct, 1)
    assert 0.0 <= r2 <= 1.0 or r2 < 0.05    # near-random labels
    # lambda=0 == OLS
    w0, *_ = sketches.ridge_fit(sf, lam=0.0)
    wols = np.linalg.solve(x.T @ x, x.T @ y)
    assert np.allclose(w0, wols, atol=1e-8)

    out = sketches.events_purchase_ridge(sf).to_pandas()
    assert list(out["feature"]) == ["intercept", "value_z",
                                    "hour_frac"]
    assert np.allclose(out["coef"].to_numpy(), np.round(w, 8))


@pytest.mark.usefixtures("ray_session")
def test_conformal_interval_coverage_and_replay():
    """Split-conformal q̂ equals an independent DuckDB-load + numpy
    replay (same md5 fold law, same ridge, same order statistic), and
    the held-out coverage realizes the ≥ 1−α distribution-free
    guarantee within binomial noise."""
    import hashlib
    import math

    sf = "/root/testdata/sf0.01"
    out = sketches.conformal_interval(sf, alpha=0.1).to_pandas()
    row = out.iloc[0]

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT event_id, value,
               extract(hour FROM ts) AS h,
               isodow(ts) - 1 AS d   -- pyarrow day_of_week: Mon=0
        FROM read_parquet('{sf}/events.parquet')""").df()
    folds = np.array([
        int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % 5
        for i in df["event_id"]])
    x = np.column_stack([np.ones(len(df)),
                         df["h"].to_numpy(np.float64) / 23.0,
                         df["d"].to_numpy(np.float64) / 6.0])
    y = df["value"].to_numpy(np.float64)
    tr = folds <= 2
    pen = np.eye(3)
    pen[0, 0] = 0.0
    w = np.linalg.solve(x[tr].T @ x[tr] + pen, x[tr].T @ y[tr])
    res_cal = np.sort(np.abs(y[folds == 3] - x[folds == 3] @ w))
    k = math.ceil((len(res_cal) + 1) * 0.9)
    qhat = res_cal[k - 1]
    assert row["n_train"] == int(tr.sum())
    assert row["n_cal"] == len(res_cal)
    assert abs(row["q_hat"] - round(qhat, 4)) < 1e-9
    res_test = np.abs(y[folds == 4] - x[folds == 4] @ w)
    cov = (res_test <= qhat).mean()
    assert abs(row["coverage"] - round(cov, 4)) < 1e-9
    # the distribution-free guarantee, with 3-sigma binomial slack
    n_test = int(row["n_test"])
    slack = 3 * np.sqrt(0.1 * 0.9 / n_test)
    assert row["coverage"] >= 0.9 - slack, (row["coverage"], slack)
