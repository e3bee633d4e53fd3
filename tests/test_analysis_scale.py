"""Scale-path variants of the relational pipelines: the bucketed big-big
as-of join, the hash anti-join fallback, and the distributed
histogram-selection median — each checked for exact equality against the
small-scale form (or numpy ground truth) on the sf0.001 tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_ray.pipelines import analysis

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_asof_bucketed_equals_broadcast():
    a = _norm(analysis.events_asof_orders(SF, form="broadcast").to_pandas())
    b = _norm(analysis.events_asof_orders(SF, form="bucketed",
                                          n_buckets=7).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_asof_auto_picks_bucketed_when_orders_big():
    # broadcast_limit=0 forces every orders table over the limit
    b = _norm(analysis.events_asof_orders(SF, form="auto",
                                          broadcast_limit=0).to_pandas())
    a = _norm(analysis.events_asof_orders(SF, form="broadcast").to_pandas())
    assert a.equals(b)


def test_customers_without_orders_join_fallback():
    small = _norm(analysis.customers_without_orders(SF).to_pandas())
    big = _norm(analysis.customers_without_orders(
        SF, broadcast_limit=0).to_pandas())
    assert len(small) > 0
    assert small.equals(big)


def test_grouped_median_matches_numpy():
    ds = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    got = analysis.grouped_median_distributed(
        ds, "o_orderpriority", "o_totalprice").to_pandas() \
        .set_index("o_orderpriority")
    df = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    for k, g in df.groupby("o_orderpriority"):
        assert got.loc[k, "median"] == pytest.approx(
            float(np.median(g["o_totalprice"])), abs=0.0), k
        assert int(got.loc[k, "n"]) == len(g)


def test_grouped_median_forced_iterations():
    # tiny bins + collect cap force the iterative narrowing loop to run
    ds = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    got = analysis.grouped_median_distributed(
        ds, "o_orderpriority", "o_totalprice", bins=4,
        collect_cap=64).to_pandas().set_index("o_orderpriority")
    df = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    for k, g in df.groupby("o_orderpriority"):
        assert got.loc[k, "median"] == pytest.approx(
            float(np.median(g["o_totalprice"])), abs=0.0), k


def test_grouped_median_degenerate_constant_key():
    # a key whose values are all identical collapses the window to a point
    t = pa.table({
        "k": ["a"] * 101 + ["b"] * 50,
        "v": [7.0] * 101 + [float(i) for i in range(50)],
    })
    ds = rd.from_arrow([t.slice(i * 20, 20) for i in range(8)])
    got = analysis.grouped_median_distributed(
        ds, "k", "v", bins=4, collect_cap=8).to_pandas().set_index("k")
    assert got.loc["a", "median"] == 7.0
    assert got.loc["b", "median"] == pytest.approx(24.5)


def test_grouped_median_even_and_odd_counts():
    t = pa.table({
        "k": ["e"] * 4 + ["o"] * 5,
        "v": [1.0, 2.0, 3.0, 10.0, 5.0, 1.0, 9.0, 3.0, 7.0],
    })
    ds = rd.from_arrow([t.slice(0, 5), t.slice(5)])
    got = analysis.grouped_median_distributed(
        ds, "k", "v").to_pandas().set_index("k")
    assert got.loc["e", "median"] == 2.5   # (2+3)/2
    assert got.loc["o", "median"] == 5.0


def test_grouped_quantile_matches_numpy_linear():
    """q != 0.5: quantile_cont semantics == numpy 'linear' interpolation,
    including under forced iterative narrowing."""
    ds = rd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    df = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])
    for q in (0.05, 0.25, 0.9, 0.95):
        got = analysis.grouped_median_distributed(
            ds, "o_orderpriority", "o_totalprice", q=q,
            bins=16, collect_cap=128).to_pandas() \
            .set_index("o_orderpriority")
        for k, g in df.groupby("o_orderpriority"):
            want = float(np.quantile(g["o_totalprice"], q,
                                     method="linear"))
            assert got.loc[k, "median"] == pytest.approx(
                want, rel=1e-12), (k, q)


def test_grouped_quantile_extremes_are_min_max():
    t = pa.table({
        "k": ["a"] * 9,
        "v": [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0],
    })
    ds = rd.from_arrow([t.slice(0, 5), t.slice(5)])
    lo = analysis.grouped_median_distributed(ds, "k", "v", q=0.0)
    hi = analysis.grouped_median_distributed(ds, "k", "v", q=1.0)
    assert lo.column("median")[0].as_py() == 1.0
    assert hi.column("median")[0].as_py() == 9.0


def test_orders_repeat_window_join_laws():
    import duckdb

    from crawl4ai_ray.pipelines.analysis import orders_repeat_window_join

    df = orders_repeat_window_join(SF, days=30).to_pandas()
    # strict window law: 1 <= gap <= 30, never self-paired
    assert df["gap_days"].between(1, 30).all()
    assert (df["first_orderkey"] != df["next_orderkey"]).all()
    # exact pair-set equality vs a driver pandas oracle
    con = duckdb.connect()
    try:
        od = con.execute(
            f"SELECT o_custkey, o_orderkey, o_orderdate FROM "
            f"read_parquet('{SF}/orders.parquet')").df()
    finally:
        con.close()
    want = set()
    for ck, g in od.groupby("o_custkey"):
        g = g.sort_values("o_orderdate")
        d = g["o_orderdate"].to_numpy(dtype="datetime64[D]")
        k = g["o_orderkey"].to_numpy()
        for i in range(len(d)):
            for j in range(len(d)):
                gap = int((d[j] - d[i]).astype(int))
                if 1 <= gap <= 30:
                    want.add((int(ck), int(k[i]), int(k[j]), gap))
    got = set(zip(df["o_custkey"], df["first_orderkey"],
                  df["next_orderkey"], df["gap_days"]))
    assert got == want


# ---------------------------------------------------------------------------
# round-4: gated dimension broadcasts — forced native-join fallbacks must be
# byte-equal to the broadcast form (VERDICT r3 #1), and the median guard
# fails loud on high-cardinality keys (VERDICT r3 #7).
# ---------------------------------------------------------------------------


def test_revenue_by_nation_year_join_fallback():
    a = _norm(analysis.revenue_by_nation_year(SF).to_pandas())
    b = _norm(analysis.revenue_by_nation_year(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_revenue_rollup_join_fallback():
    a = _norm(analysis.revenue_rollup(SF).to_pandas())
    b = _norm(analysis.revenue_rollup(SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q3_semijoin_fallback():
    a = _norm(analysis.q3_shipping_priority(SF).to_pandas())
    b = _norm(analysis.q3_shipping_priority(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q5_join_fallback():
    a = _norm(analysis.q5_local_supplier_volume(SF).to_pandas())
    b = _norm(analysis.q5_local_supplier_volume(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_grouped_median_max_keys_guard():
    t = pa.table({"k": [str(i) for i in range(64)],
                  "v": [float(i) for i in range(64)]})
    ds = rd.from_arrow([t.slice(i * 16, 16) for i in range(4)])
    with pytest.raises(ValueError, match="max_keys"):
        analysis.grouped_median_distributed(ds, "k", "v", max_keys=10)


def test_revenue_by_part_type_join_fallback():
    a = _norm(analysis.revenue_by_part_type(SF).to_pandas())
    b = _norm(analysis.revenue_by_part_type(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q14_join_fallback():
    a = analysis.q14_promo_revenue(SF).to_pandas()
    b = analysis.q14_promo_revenue(SF, broadcast_limit=0).to_pandas()
    assert len(a) == 1
    assert a.equals(b)


def test_q19_join_fallback():
    a = analysis.q19_brand_bands_revenue(SF).to_pandas()
    b = analysis.q19_brand_bands_revenue(
        SF, broadcast_limit=0).to_pandas()
    assert len(a) == 1 and int(a["n_lines"][0]) > 0
    assert a.equals(b)


def test_q7_join_fallback():
    a = _norm(analysis.q7_nation_volume(SF).to_pandas())
    b = _norm(analysis.q7_nation_volume(SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q17_join_fallback():
    a = analysis.q17_small_quantity_revenue(SF).to_pandas()
    b = analysis.q17_small_quantity_revenue(
        SF, broadcast_limit=0).to_pandas()
    assert len(a) == 1 and float(a["avg_yearly"][0]) > 0
    assert a.equals(b)


def test_q8_join_fallback():
    a = analysis.q8_market_share(SF).to_pandas()
    b = analysis.q8_market_share(SF, broadcast_limit=0).to_pandas()
    assert len(a) > 0
    assert a.equals(b)


def test_q9_join_fallback():
    a = _norm(analysis.q9_product_profit(SF).to_pandas())
    b = _norm(analysis.q9_product_profit(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


# ---------------------------------------------------------------------------
# round-5 session 3: the last five TPC-H shapes — forced native-join
# fallbacks byte-equal to the broadcast forms.
# ---------------------------------------------------------------------------


def test_q2_join_fallback():
    a = _norm(analysis.q2_min_cost_supplier(SF).to_pandas())
    b = _norm(analysis.q2_min_cost_supplier(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q11_join_fallback():
    a = _norm(analysis.q11_important_parts(SF).to_pandas())
    b = _norm(analysis.q11_important_parts(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q16_join_fallback():
    a = _norm(analysis.q16_supplier_part_variety(SF).to_pandas())
    b = _norm(analysis.q16_supplier_part_variety(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_q20_join_fallback():
    a = _norm(analysis.q20_promotable_suppliers(SF).to_pandas())
    b = _norm(analysis.q20_promotable_suppliers(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_revenue_share_join_fallback():
    a = _norm(analysis.revenue_share_in_region(SF).to_pandas())
    b = _norm(analysis.revenue_share_in_region(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_referential_integrity_audit_planted_orphans(ray_session,
                                                     tmp_path):
    """Planted orphans are counted exactly, and the forced left_anti
    fallback (broadcast_limit=0) is byte-equal to the broadcast form."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.analysis import referential_integrity_audit

    sf = str(tmp_path)
    # copy the sf0.001 tables, then orphan three orders customers and
    # two event users
    import shutil

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    f"{sf}/{t}.parquet")
    orders = pq.read_table(f"{sf}/orders.parquet")
    ck = orders.column("o_custkey").to_numpy(zero_copy_only=False).copy()
    ck[:3] = [999_991, 999_992, 999_993]
    orders = orders.set_column(
        orders.column_names.index("o_custkey"), "o_custkey",
        pa.array(ck))
    pq.write_table(orders, f"{sf}/orders.parquet")
    events = pq.read_table(f"{sf}/events.parquet")
    uid = events.column("user_id").to_numpy(zero_copy_only=False).copy()
    uid[:5] = [888_888] * 5          # five rows, ONE distinct orphan key
    events = events.set_column(
        events.column_names.index("user_id"), "user_id", pa.array(uid))
    pq.write_table(events, f"{sf}/events.parquet")

    got = referential_integrity_audit(sf).to_pandas().set_index("fk")
    assert got.loc["orders.o_custkey->customer.c_custkey",
                   "n_orphans"] == 3
    assert got.loc["events.user_id->customer.c_custkey",
                   "n_orphans"] == 1
    assert got.loc["lineitem.l_orderkey->orders.o_orderkey",
                   "n_orphans"] == 0

    anti = referential_integrity_audit(
        sf, broadcast_limit=0).to_pandas().set_index("fk")
    assert (anti["n_orphans"] == got["n_orphans"]).all()
    assert (anti["n_child_keys"] == got["n_child_keys"]).all()


def test_windowed_funnel_vs_bruteforce(ray_session):
    """The per-user greedy-from-each-start walk equals the brute-force
    exists-a-chain check on every user at sf0.001."""
    import itertools

    import numpy as np
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.analysis import events_funnel_windowed

    SF = "/root/testdata/sf0.001"
    stages = ("signup", "click", "purchase")
    w = np.timedelta64(24 * 3600, "s")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()

    def brute_depth(g):
        per = [np.sort(g.loc[g["event_type"] == s, "ts"].to_numpy())
               for s in stages]
        best = 0
        for t1 in per[0]:
            # chain exists to depth k iff nested strictly-increasing
            # picks exist ending <= t1 + w; brute force over products of
            # candidate picks is exponential, so check depth greedily
            # per start but ALSO cross-check depth 3 by full triple scan
            best = max(best, 1)
        for t1 in per[0]:
            for t2 in per[1]:
                if t2 > t1 and t2 <= t1 + w:
                    best = max(best, 2)
                    for t3 in per[2]:
                        if t3 > t2 and t3 <= t1 + w:
                            best = max(best, 3)
                            break
        return best

    want = {k: 0 for k in (1, 2, 3)}
    for _, g in ev.groupby("user_id"):
        d = brute_depth(g)
        for k in range(1, d + 1):
            want[k] += 1

    got = events_funnel_windowed(SF).to_pandas().set_index("stage")
    for k in (1, 2, 3):
        assert int(got.loc[k, "n_users"]) == want[k]


def test_attribution_last_touch_law(ray_session):
    """Per-conversion credit equals a per-user pandas replay; totals
    conserve (sum of credits == purchases with a preceding touch)."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.analysis import (
        events_attribution_last_touch)

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    want: dict = {}
    n_credited = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        last = None
        for et in g["event_type"]:
            if et == "purchase":
                if last is not None:
                    want[last] = want.get(last, 0) + 1
                    n_credited += 1
            else:
                last = et
    got = events_attribution_last_touch(SF).to_pandas()
    assert dict(zip(got["attributed"], got["n_conversions"])) == want
    assert int(got["n_conversions"].sum()) == n_credited


def test_customer_rfm_laws(ray_session):
    """NTILE bucket sizes differ by at most one per metric; every
    ordering customer appears exactly once; monetary matches a direct
    per-customer recompute."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.analysis import customer_rfm

    SF = "/root/testdata/sf0.001"
    got = customer_rfm(SF).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_totalprice"]).to_pandas()
    want_m = orders.groupby("o_custkey")["o_totalprice"].sum().round(2)
    assert len(got) == orders["o_custkey"].nunique()
    assert not got["c_custkey"].duplicated().any()
    merged = got.set_index("c_custkey")["monetary"]
    assert (merged - want_m).abs().max() < 1e-6
    for col in ["r_q", "f_q", "m_q"]:
        sizes = got[col].value_counts()
        assert set(sizes.index) <= {1, 2, 3, 4}
        assert sizes.max() - sizes.min() <= 1


def test_cohort_ltv_laws(ray_session):
    """cum_revenue is the running sum of revenue within each cohort and
    is monotone non-decreasing; totals conserve against a direct
    recompute of in-window purchase value."""
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.analysis import cohort_ltv

    SF = "/root/testdata/sf0.001"
    got = cohort_ltv(SF).to_pandas()
    for _, g in got.groupby("cohort_day"):
        g = g.sort_values("day_offset")
        assert (g["cum_revenue"].diff().dropna() >= -1e-9).all()
        assert abs(g["cum_revenue"].iloc[-1]
                   - round(g["revenue"].sum(), 4)) < 1e-3
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    d0 = ev.groupby("user_id")["ts"].min().dt.normalize()
    ev = ev.merge(d0.rename("d0"), on="user_id")
    buys = ev[(ev["event_type"] == "purchase")
              & ((ev["ts"].dt.normalize() - ev["d0"]).dt.days <= 14)]
    assert abs(got["revenue"].sum() - buys["value"].sum()) < 1e-4


def test_segment_priority_chisq_join_fallback():
    # broadcast_limit=0 forces the native Dataset.join path; the cell
    # table, expected counts, and contributions must be byte-equal
    small = _norm(analysis.segment_priority_chisq(SF).to_pandas())
    big = _norm(analysis.segment_priority_chisq(
        SF, broadcast_limit=0).to_pandas())
    assert len(small) > 0
    assert small.equals(big)


def test_association_rules_tiny_block_seams():
    """Force ~8KB blocks through every sort so interior/boundary run
    splitting is exercised hard, then check exact equality against a
    brute-force pandas rule miner."""
    from collections import Counter

    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    try:
        got = analysis.part_association_rules(SF).to_pandas() \
            .sort_values(["antecedent", "consequent"]) \
            .reset_index(drop=True)
    finally:
        ctx.target_max_block_size = old

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]) \
        .drop_duplicates()
    no = li["l_orderkey"].nunique()
    cnt = li.groupby("l_partkey").size()
    pairs = Counter()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] += 1
    rows = [(a2, c2, n, n / no, n / cnt[a2], n / cnt[a2] * no / cnt[c2])
            for (a, b), n in pairs.items() if n >= 2
            for a2, c2 in ((a, b), (b, a))]
    bf = pd.DataFrame(rows, columns=["antecedent", "consequent", "n_pair",
                                     "support", "confidence", "lift"]) \
        .sort_values(["antecedent", "consequent"]).reset_index(drop=True)
    assert len(got) == len(bf) > 0
    pd.testing.assert_frame_equal(got, bf, check_dtype=False,
                                  check_exact=False, atol=1e-12)


def test_late_arrivals_tiny_block_seams():
    """Force ~8KB blocks through the arrival sort so the exclusive
    per-block base watermarks are exercised across many seams, then
    check exact equality against a single-process numpy recompute."""
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    try:
        got = analysis.events_late_arrivals(SF).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
    finally:
        ctx.target_max_block_size = old

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "ts"])
    arr = (ev["event_id"].to_numpy(np.int64) * np.int64(2654435761)) \
        % np.int64(4294967296)
    order = np.lexsort((ev["event_id"].to_numpy(np.int64), arr))
    ts = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)[order]
    et = ev["event_type"].to_numpy(object)[order]
    wm = np.concatenate(([np.iinfo(np.int64).min],
                         np.maximum.accumulate(ts[:-1])))
    late = ts < wm - np.int64(3_600_000_000)
    late[0] = False
    bf = pd.DataFrame({"event_type": et, "late": late}) \
        .groupby("event_type", as_index=False) \
        .agg(n_events=("late", "size"), n_late=("late", "sum")) \
        .sort_values("event_type").reset_index(drop=True)
    assert got["n_events"].tolist() == bf["n_events"].tolist()
    assert got["n_late"].tolist() == bf["n_late"].tolist()
    assert got["n_late"].sum() > 0          # the gate is non-trivial


def test_nearest_order_bucketed_equals_broadcast():
    a = _norm(analysis.events_nearest_order(
        SF, form="broadcast").to_pandas())
    b = _norm(analysis.events_nearest_order(
        SF, form="bucketed", n_buckets=7).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_nearest_order_prefers_earlier_on_tie():
    # event day exactly between two orders (diff 2 both ways) must pick
    # the EARLIER date; one-sided users fall back to the only direction
    import ray

    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            np.array(["1995-01-01", "1995-01-05", "1995-02-10",
                      "1995-03-01"], "datetime64[us]")),
    })
    events = pa.table({
        "event_id": pa.array([10, 20, 30], pa.int64()),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(np.array(
            ["1995-01-03T12:00:00", "1995-02-01T00:00:00",
             "1995-03-09T23:00:00"], "datetime64[us]")),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq
    d = tempfile.mkdtemp(prefix="c4r_near_")
    pq.write_table(orders, os.path.join(d, "orders.parquet"))
    pq.write_table(events, os.path.join(d, "events.parquet"))
    got = analysis.events_nearest_order(d).to_pandas() \
        .set_index("event_id")
    assert got.loc[10, "nearest_order_date"] == "1995-01-01"  # tie->earlier
    assert int(got.loc[10, "day_diff"]) == 2
    assert got.loc[20, "nearest_order_date"] == "1995-02-10"  # forward only
    assert int(got.loc[20, "day_diff"]) == 9
    assert got.loc[30, "nearest_order_date"] == "1995-03-01"  # backward
    assert int(got.loc[30, "day_diff"]) == 8


def _wmedian_numpy(df, key, val, wt):
    """Lower weighted median ground truth: smallest v with
    2*cumweight(<=v) >= total weight."""
    out = {}
    for k, g in df.groupby(key):
        g = g.sort_values(val)
        cw = g[wt].cumsum().to_numpy()
        W = float(g[wt].sum())
        idx = int(np.searchsorted(2.0 * cw, W, side="left"))
        out[k] = float(g[val].to_numpy()[idx])
    return out


def test_weighted_median_matches_numpy():
    ds = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    got = analysis.grouped_weighted_median_distributed(
        ds, "l_returnflag", "l_extendedprice", "l_quantity") \
        .to_pandas().set_index("l_returnflag")
    df = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    want = _wmedian_numpy(df, "l_returnflag", "l_extendedprice",
                          "l_quantity")
    for k, v in want.items():
        assert got.loc[k, "wmedian"] == v, k
        assert int(got.loc[k, "total_weight"]) == \
            int(df[df["l_returnflag"] == k]["l_quantity"].sum())


def test_weighted_median_forced_iterations():
    # tiny bins + collect cap force the weighted narrowing loop
    ds = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    got = analysis.grouped_weighted_median_distributed(
        ds, "l_returnflag", "l_extendedprice", "l_quantity",
        bins=4, collect_cap=64).to_pandas().set_index("l_returnflag")
    df = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    want = _wmedian_numpy(df, "l_returnflag", "l_extendedprice",
                          "l_quantity")
    for k, v in want.items():
        assert got.loc[k, "wmedian"] == v, k


def test_weighted_median_duplicate_heavy_and_constant():
    # one key all-constant (window collapses to a point), one key where
    # a single duplicated value carries most of the weight
    t = pa.table({
        "k": ["a"] * 60 + ["b"] * 40,
        "v": [5.0] * 60 + [1.0, 2.0] * 15 + [9.0] * 10,
        "w": [1.0] * 60 + [1.0] * 30 + [10.0] * 10,
    })
    ds = rd.from_arrow([t.slice(i * 10, 10) for i in range(10)])
    got = analysis.grouped_weighted_median_distributed(
        ds, "k", "v", "w", bins=4, collect_cap=8) \
        .to_pandas().set_index("k")
    assert got.loc["a", "wmedian"] == 5.0
    df = t.to_pandas().rename(columns={"k": "k", "v": "v", "w": "w"})
    want = _wmedian_numpy(df, "k", "v", "w")
    assert got.loc["b", "wmedian"] == want["b"]


def test_weighted_median_rejects_fractional_weights():
    t = pa.table({"k": ["a", "a"], "v": [1.0, 2.0], "w": [0.5, 1.0]})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="integral"):
        analysis.grouped_weighted_median_distributed(ds, "k", "v", "w")


def test_mannwhitney_matches_bruteforce_pairs():
    """U == Σ over (a, b) pairs of 1[a>b] + 0.5·1[a==b] — brute-force
    pairwise on sf0.001 (the histogram-prefix-scan distributed form
    must reproduce the O(n²) definition exactly)."""
    from crawl4ai_ray.pipelines.analysis import events_value_mannwhitney

    t = events_value_mannwhitney(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    a = df[df.event_type == "purchase"]["value"].to_numpy()
    b = df[df.event_type == "error"]["value"].to_numpy()
    u = float((a[:, None] > b[None, :]).sum()
              + 0.5 * (a[:, None] == b[None, :]).sum())
    assert t["u_stat"][0] == u
    assert int(t["n_a"][0]) == len(a) and int(t["n_b"][0]) == len(b)


def test_ks_matches_bruteforce_ecdf():
    """D == max over distinct values of |ECDF_a - ECDF_b| — brute-force
    searchsorted ECDFs on sf0.001."""
    from crawl4ai_ray.pipelines.analysis import events_value_ks

    t = events_value_ks(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    a = np.sort(df[df.event_type == "purchase"]["value"].to_numpy())
    b = np.sort(df[df.event_type == "error"]["value"].to_numpy())
    vals = np.unique(np.concatenate([a, b]))
    gap = np.abs(np.searchsorted(a, vals, side="right") / len(a)
                 - np.searchsorted(b, vals, side="right") / len(b))
    assert t["d_stat"][0] == round(float(gap.max()), 6)
    # the reported witness value attains the max gap
    i = np.searchsorted(vals, t["at_value"][0])
    assert round(float(gap[i]), 6) == t["d_stat"][0]


def test_price_volume_decomp_join_fallback():
    a = _norm(analysis.revenue_price_volume_decomp(SF).to_pandas())
    b = _norm(analysis.revenue_price_volume_decomp(
        SF, broadcast_limit=0).to_pandas())
    assert len(a) > 0
    assert a.equals(b)


def test_markov_absorption_identity_and_replay(ray_session):
    """t = 1 + Q·t holds at 1e-9, and the transition counts match an
    independent DuckDB window-lead replay."""
    import duckdb
    import numpy as np

    from crawl4ai_ray.pipelines.analysis import (
        events_markov_absorption)

    sf = "/root/testdata/sf0.01"
    out = events_markov_absorption(sf).to_pandas() \
        .set_index("from_type")

    con = duckdb.connect()
    cnt = con.execute(f"""
        WITH s AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM read_parquet('{sf}/events.parquet')
        )
        SELECT event_type AS f, nxt AS t, count(*) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2""").df()
    types = sorted(set(cnt["f"]) | set(cnt["t"]))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    m = np.zeros((k, k))
    for _, r in cnt.iterrows():
        m[idx[r["f"]], idx[r["t"]]] = r["n"]
    p = m / m.sum(axis=1, keepdims=True)
    a = idx["purchase"]
    tr = [i for i in range(k) if i != a]
    q = p[np.ix_(tr, tr)]
    t_vec = np.linalg.solve(np.eye(len(tr)) - q, np.ones(len(tr)))
    got = out["expected_steps"].to_numpy()
    want = np.array([t_vec[j] for j, i in enumerate(tr)])
    order = [types[i] for i in tr]
    assert list(out.index) == order
    assert np.allclose(got, np.round(want, 6), atol=1e-6)
    # the defining identity
    assert np.allclose(t_vec, 1.0 + q @ t_vec, atol=1e-9)
    assert (got > 1.0).all()     # at least one step to absorb
