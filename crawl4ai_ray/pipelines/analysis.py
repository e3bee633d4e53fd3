"""Text-analysis and relational pipelines over the driver testdata tables.

Every function takes ``sf_dir`` and returns a Dataset / Arrow table whose
column names match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql``.
Floats that depend on summation order are rounded before comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.chunking import FixedLengthWordChunking
from ..functions.regex_extract import RegexExtractor
from ..functions.textstats import TextStats


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# Default driver/broadcast row cap shared by every dimension-lookup gate
# in this module: a side at or below this count is ray.put once and
# probed in-task; above it the pipeline switches to a native
# ``Dataset.join`` so the driver never materializes an SF-scaled table.
BROADCAST_LIMIT = 2_000_000


def _sorted_probe_arrays(keys, vals):
    """Sort a (key, value) dimension lookup into parallel numpy arrays
    for vectorized ``np.searchsorted`` probing — the broadcast-side
    shape: ship ONCE with ``ray.put``, probe whole columns per batch.
    Replaces per-row ``dict.get`` loops (10-50x slower) in the
    broadcast-probe UDFs."""
    keys = np.asarray(keys, dtype=np.int64)
    vals = np.asarray(vals)
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def _round2_snap(vals) -> np.ndarray:
    """2-dp round for SMALL final tables (<= a few thousand rows):
    format round-trip so any two sums that agree to 2 dp become
    bitwise-identical doubles regardless of summation order — makes the
    broadcast and join forms of the gated pipelines byte-equal
    (``pc.round`` keeps ulp noise from its scaled arithmetic)."""
    return np.array([float(f"{float(v):.2f}") for v in vals], np.float64)


def _round2_duck(vals: np.ndarray) -> np.ndarray:
    """DuckDB ROUND(x, 2): half AWAY FROM ZERO on the double (std::round
    of x*100), unlike banker's rounding — the r3 quirk note. Needed when
    the quantity routinely lands on .xx5 midpoints (averages of
    2-decimal values); sum-shaped queries use ``_round2_snap``."""
    v = np.asarray(vals, dtype=np.float64)
    return np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) / 100.0


def _probe_sorted(skeys, svals, query, default):
    """Vectorized lookup of ``query`` keys in the sorted key array:
    matched value where present, ``default`` where absent.
    O(|query| log |skeys|) with zero per-row Python."""
    query = np.asarray(query, dtype=np.int64)
    if len(skeys) == 0:
        return np.full(len(query), default,
                       dtype=svals.dtype if len(svals) else np.int64)
    pos = np.searchsorted(skeys, query)
    pos = np.minimum(pos, len(skeys) - 1)
    hit = skeys[pos] == query
    return np.where(hit, svals[pos], default)


# ---------------------------------------------------------------------------
# documents: token stats / quality / language / fingerprints / chunking
# ---------------------------------------------------------------------------


def doc_token_stats(sf_dir: str):
    """Per-language token statistics. SQL-checkable: whitespace token count
    equals array_length(string_split_regex(trim(text), '\\s+'))."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_words = np.array([len((t or "").split()) for t in texts],
                           dtype=np.int64)
        n_chars = np.array([len(t or "") for t in texts], dtype=np.int64)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_words": pa.array(n_words),
                "n_chars": pa.array(n_chars),
            }
        )

    out = ds.map_batches(stage, batch_format="pyarrow", batch_size=8192)
    return out.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_words", alias_name="sum_words"),
        Sum("n_chars", alias_name="sum_chars"),
        Max("n_words", alias_name="max_words"),
        Min("n_words", alias_name="min_words"),
    )


def doc_quality(sf_dir: str):
    """Full text-stats table (quality, langid, fingerprints). Deterministic
    but not SQL-expressible → rows-only driver check; exactness asserted in
    pytest against scalar kernels."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = ds.map_batches(TextStats, batch_format="pyarrow", batch_size=4096,
                         concurrency=2)
    return out.select_columns(
        ["doc_id", "lang", "n_words", "n_tokens_bpe", "lang_detected",
         "quality", "fingerprint", "content_md5"]
    )


def doc_chunk_counts(sf_dir: str, chunk_size: int = 50):
    """Chunk every document (fixed-length word chunker) and count chunks.
    SQL oracle: ceil(n_words / chunk_size) with n_words from regex split."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunker = FixedLengthWordChunking(chunk_size)

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = np.array(
            [len(chunker.chunk(t or "")) for t in texts], dtype=np.int64
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_chunks": pa.array(counts)}
        )

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=8192)


def doc_chunks_exploded(sf_dir: str, chunk_size: int = 50):
    """Explode documents into chunk rows (doc_id, chunk_idx, chunk_words)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunker = FixedLengthWordChunking(chunk_size)

    def stage(batch: pa.Table) -> pa.Table:
        ids, idxs, words = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for i, ch in enumerate(chunker.chunk(text or "")):
                ids.append(did)
                idxs.append(i)
                words.append(len(ch.split()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "chunk_idx": pa.array(idxs, type=pa.int32()),
                "chunk_words": pa.array(words, type=pa.int64()),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=8192)


def event_numbers(sf_dir: str):
    """Regex entity extraction over events.props (digit runs) — the M25
    operator on a real column. SQL oracle uses regexp_extract_all.

    Per-event match counts are row-local, so this is a single vectorized
    map_batches (pyarrow count_substring_regex) with ZERO shuffle — the
    explode-then-groupby form it replaces (VERDICT r1 item 4) moved one
    row per match through a global groupby for a count that never needed
    cross-row state. RegexExtractor remains the operator for extractions
    that DO need the match rows (values/spans)."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def stage(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch.column("props"),
                                     pattern=r"[0-9]+"),
            pa.int64(),
        )
        t = pa.table({"event_id": batch.column("event_id"),
                      "n_matches": n})
        return t.filter(pc.greater(t.column("n_matches"), 0))

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=8192)


def doc_embeddings(sf_dir: str):
    """Embed every document with the hashed-ngram model stub (actor pool:
    model 'loaded' once per actor). Output (doc_id, embedding) feeds the
    similarity pipelines."""
    from ..functions.textstats import HashedNgramEmbedder

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(HashedNgramEmbedder, batch_format="pyarrow",
                         batch_size=4096, concurrency=2)
    return out.select_columns(["doc_id", "embedding"])


def bm25_rank(sf_dir: str, query: str = "window batch stream", k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """BM25 document ranking over the documents table — the two-pass
    partial+final aggregation pattern (SURVEY §2.5, reference seeder BM25
    async_url_seeder.py:645-677):

    pass 1 (distributed): per-batch partial document-frequency counts for
    the query terms + (doc count, length sum) → tiny groupby/sum.
    pass 2 (distributed): broadcast the global stats, score every doc
    vectorized, emit per-batch local top-k → small global sort.
    """
    import math

    import ray

    # dedupe query terms: a repeated term must not double its df (idf
    # corruption) nor add its score contribution twice (code-review r2)
    terms = list(dict.fromkeys(t for t in query.lower().split() if t))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        import collections

        df_counts = collections.Counter()
        n_docs = 0
        len_sum = 0
        for text in batch.column("text").to_pylist():
            words = set((text or "").lower().split())
            n_docs += 1
            len_sum += len((text or "").split())
            for t in terms:
                if t in words:
                    df_counts[t] += 1
        return pa.table(
            {
                "term": pa.array(list(terms), type=pa.string()),
                "df": pa.array([df_counts[t] for t in terms],
                               type=pa.int64()),
                "n_docs": pa.array([n_docs] * len(terms), type=pa.int64()),
                "len_sum": pa.array([len_sum] * len(terms), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Sum

    stats = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"),
                   Sum("n_docs", alias_name="n_docs_dup"),
                   Sum("len_sum", alias_name="len_sum_dup"))
        .to_pandas()
    )
    # n_docs/len_sum were replicated per term row; any row carries the total
    n_total = int(stats["n_docs_dup"].iloc[0]) if len(stats) else 0
    len_total = int(stats["len_sum_dup"].iloc[0]) if len(stats) else 0
    avgdl = (len_total / n_total) if n_total else 1.0
    idf = {
        r.term: math.log(1 + (n_total - r.df + 0.5) / (r.df + 0.5))
        for r in stats.itertuples()
    }
    ref = ray.put((idf, avgdl))

    def score(batch: pa.Table, ref=ref) -> pa.Table:
        import collections

        import ray as _ray

        idf_map, avg = _ray.get(ref)
        ids = batch.column("doc_id").to_pylist()
        out_scores = np.empty(len(ids))
        for i, text in enumerate(batch.column("text").to_pylist()):
            words = (text or "").lower().split()
            tf = collections.Counter(words)
            dl = len(words)
            s = 0.0
            for t in terms:
                f = tf.get(t, 0)
                if f:
                    s += idf_map.get(t, 0.0) * (f * (k1 + 1)) / (
                        f + k1 * (1 - b + b * dl / avg)
                    )
            out_scores[i] = s
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "bm25": pa.array(np.round(out_scores, 6),
                                 type=pa.float64()),
            }
        )
        # local top-k combiner — select on the GLOBAL ordering (rounded
        # score desc, doc_id asc) so rows tying at the k boundary cannot
        # be kept/dropped batch-dependently (code-review r2)
        if tbl.num_rows > k:
            r = np.round(out_scores, 6)
            order = np.lexsort((np.asarray(ids, dtype=np.int64), -r))[:k]
            tbl = tbl.take(pa.array(np.sort(order)))
        return tbl

    return (
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
        .sort(["bm25", "doc_id"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# relational demos (groupby / join / sort / window-ish) over TPC-H-ish tables
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary over lineitem (groupby-aggregate
    with per-batch pre-aggregation via Arrow kernels)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(batch.column("l_shipdate"),
                             pa.scalar(pd.Timestamp("1998-09-02")))
        t = batch.filter(mask)
        disc_price = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "l_quantity": t.column("l_quantity"),
                "l_extendedprice": t.column("l_extendedprice"),
                "disc_price": disc_price,
            }
        )

    out = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    agg = out.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Count(alias_name="count_order"),
    )

    def final_round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pc.round(batch.column("sum_qty"), 2),
                "sum_base_price": pc.round(batch.column("sum_base_price"), 2),
                "sum_disc_price": pc.round(batch.column("sum_disc_price"), 2),
                "count_order": batch.column("count_order"),
            }
        )

    return agg.map_batches(final_round, batch_format="pyarrow")


def top_customer_revenue(sf_dir: str, k: int = 20):
    """Revenue per customer, top-k — per-batch combiner →
    groupby(custkey).sum → top-k sort → dimension attach.

    Scale shape: the aggregate/shuffle carries only the int key (no
    name strings), and the customer NAME attaches AFTER top-k via a
    k-row hash join against the customer Dataset — the SF-scaled
    customer table is never driver-resident (the q10 pattern; this
    closed the last ungated customer broadcast in the module)."""
    from .dedup import _join_parts

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        # combiner: pre-aggregate per custkey inside the batch before the
        # global shuffle (one partial row per key per batch)
        part = (
            pa.table(
                {
                    "c_custkey": batch.column("o_custkey"),
                    "o_totalprice": batch.column("o_totalprice"),
                }
            )
            .group_by("c_custkey")
            .aggregate([("o_totalprice", "sum"), ("o_totalprice", "count")])
        )
        return pa.table(
            {
                "c_custkey": part.column("c_custkey"),
                "_rev": part.column("o_totalprice_sum"),
                "_cnt": part.column("o_totalprice_count"),
            }
        )

    out = orders.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    # one group per customer (SF-scaled cardinality): reduce via the
    # sort + per-block run-length machinery instead of Ray's Aggregate
    # (per-group finisher overhead at 30k+ groups — this was the
    # headline bench's flattest query until r5)
    from ..functions.sortagg import sorted_keyed_sum

    agg = sorted_keyed_sum(out, "c_custkey", ["_rev", "_cnt"]) \
        .rename_columns({"_rev": "revenue", "_cnt": "n_orders"})

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("revenue"),
            "revenue",
            pc.round(batch.column("revenue"), 2),
        )

    topk = agg.map_batches(rnd, batch_format="pyarrow") \
        .sort(["revenue", "c_custkey"], descending=[True, False]).limit(k)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = topk.join(cust, join_type="inner", on=("c_custkey",),
                       num_partitions=_join_parts(topk, cust))

    def order_cols(batch: pa.Table) -> pa.Table:
        return batch.select(["c_custkey", "c_name", "revenue", "n_orders"])

    return joined.map_batches(order_cols, batch_format="pyarrow") \
        .sort(["revenue", "c_custkey"], descending=[True, False])


def events_daily(sf_dir: str):
    """Tumbling daily window per event_type (streaming-shaped aggregate:
    groupby(type, day) with per-batch partials)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": day,
                "value": batch.column("value"),
            }
        )

    out = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    agg = out.groupby(["event_type", "day"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"),
            "sum_value",
            pc.round(batch.column("sum_value"), 4),
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


def events_asof_orders(sf_dir: str, form: str = "auto",
                       broadcast_limit: int = 2_000_000,
                       n_buckets: int = 64):
    """As-of join — for each event, the user's most recent order at or
    before the event time. Ray Data has no asof-join primitive; two forms:

    - broadcast (small orders side): orders per key sorted into a numpy
      searchsorted index, shipped once with ray.put — no shuffle of the
      big events side;
    - bucketed big-big (scale path): BOTH sides hash-bucketed on the key,
      tagged and unioned, then one ``groupby(bucket).map_groups`` runs
      ``pd.merge_asof(by=user_id)`` per bucket. Per-task memory is
      (events+orders)/n_buckets — neither side is ever whole in one
      place. Byte-equal to the broadcast form
      (tests/test_analysis_scale.py).

    ``form``: 'auto' picks by orders row count vs ``broadcast_limit``;
    'broadcast' / 'bucketed' force a path. Output keeps the matched
    o_orderdate (unambiguous under same-date ties, unlike the order key).
    """
    import ray

    orders_ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    events_ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    if form == "auto":
        form = "broadcast" if orders_ds.count() <= broadcast_limit \
            else "bucketed"

    if form == "broadcast":
        # Composite-key index: orders sorted by (custkey, order day) and
        # folded into custkey*2^20 + day — order dates are midnight, so
        # "date <= ts" is exactly "day(date) <= floor-day(ts)". One global
        # searchsorted then answers every event in the batch with zero
        # per-row Python (days < 2^20 through year ~4840; custkey < 2^43).
        orders = orders_ds.to_pandas()
        ck = orders["o_custkey"].to_numpy(np.int64)
        od = orders["o_orderdate"].to_numpy(dtype="datetime64[us]") \
            .astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((od, ck))
        ck, od = ck[order], od[order]
        comp = ck * np.int64(1 << 20) + od
        ref = ray.put((comp, ck, od))

        def asof(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            comp, ck, od = _ray.get(ref)
            uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tday = batch.column("ts").to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype("datetime64[D]") \
                .astype(np.int64)
            q = uid * np.int64(1 << 20) + tday
            pos = np.searchsorted(comp, q, side="right") - 1
            posc = np.maximum(pos, 0)
            valid = (pos >= 0) & (ck[posc] == uid)
            dstr = np.datetime_as_string(
                od[posc].astype("datetime64[D]"), unit="D").astype(object)
            dstr[~valid] = None
            return pa.table(
                {
                    "event_id": batch.column("event_id"),
                    "user_id": batch.column("user_id"),
                    "asof_order_date": pa.array(dstr, type=pa.string()),
                }
            )

        return events_ds.map_batches(asof, batch_format="pyarrow",
                                     batch_size=65536)

    # bucketed big-big: unify schemas (side 0=event, 1=order), bucket on a
    # splitmix-style key hash, co-group with ONE shuffle, merge_asof per
    # bucket. Key hashing (not raw key % P) spreads sequential custkeys.
    def _bucket(keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "_bucket": pa.array(_bucket(uid)),
            "_side": pa.array(np.zeros(len(uid), dtype=np.int8)),
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "_t": batch.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]"),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "_bucket": pa.array(_bucket(ck)),
            "_side": pa.array(np.ones(len(ck), dtype=np.int8)),
            "event_id": pa.array(np.zeros(len(ck), dtype=np.int64)),
            "user_id": pa.array(ck),
            "_t": batch.column("o_orderdate")
                .to_numpy(zero_copy_only=False).astype("datetime64[us]"),
        })

    tagged = events_ds.map_batches(tag_events, batch_format="pyarrow",
                                   batch_size=65536) \
        .union(orders_ds.map_batches(tag_orders, batch_format="pyarrow",
                                     batch_size=65536))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["_side"] == 0].sort_values("_t", kind="mergesort")
        od = g[g["_side"] == 1][["user_id", "_t"]] \
            .sort_values("_t", kind="mergesort") \
            .rename(columns={"_t": "_ot"})
        if len(ev) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "asof_order_date":
                                     pd.Series([], dtype="object")})
        m = pd.merge_asof(ev, od, left_on="_t", right_on="_ot",
                          by="user_id", direction="backward")
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "asof_order_date":
                m["_ot"].dt.strftime("%Y-%m-%d").astype("object")
                .where(m["_ot"].notna(), None),
        })

    return tagged.groupby("_bucket").map_groups(merge,
                                                batch_format="pandas")


def _nearest_probe(comp, ck, od, uid, tday):
    """Shared nearest-in-time kernel over a (custkey*2^20 + day)-sorted
    composite index: backward candidate = as-of (<= day), forward
    candidate = first order strictly after; nearest by |day diff| with
    ties to the EARLIER (backward) date. Returns (valid, date, diff)."""
    if len(comp) == 0:
        z = np.zeros(len(uid), np.int64)
        return np.zeros(len(uid), bool), z, z
    q = uid * np.int64(1 << 20) + tday
    pr = np.searchsorted(comp, q, side="right")
    pb = pr - 1
    pbc = np.maximum(pb, 0)
    vb = (pb >= 0) & (ck[pbc] == uid)
    db = tday - od[pbc]
    pfc = np.minimum(pr, len(comp) - 1)
    vf = (pr < len(comp)) & (ck[pfc] == uid)
    dfw = od[pfc] - tday
    take_f = vf & (~vb | (dfw < db))
    best_od = np.where(take_f, od[pfc], od[pbc])
    best_d = np.where(take_f, dfw, db)
    return vb | vf, best_od, best_d


def events_nearest_order(sf_dir: str, form: str = "auto",
                         broadcast_limit: int = 2_000_000,
                         n_buckets: int = 64):
    """Nearest-neighbor TEMPORAL join — for each event, the same
    user's order closest in time in EITHER direction (|order day −
    event day| minimized, ties to the earlier order date). The
    remaining temporal-join shape next to the backward as-of
    (``events_asof_orders``) and the strictly-after forward pairing
    (``events_error_to_purchase``); events whose user has no orders
    drop out (inner-join semantics, matching the oracle).

    Same two forms and the same gate as events_asof_orders, both
    riding ``_nearest_probe``'s composite searchsorted (backward +
    forward candidate, vectorized choose): broadcast ships the sorted
    order index once via ``ray.put``; the bucketed big-big path
    hash-buckets BOTH sides, one groupby co-group, and runs the same
    kernel per bucket — per-task memory is (events+orders)/n_buckets."""
    import ray

    orders_ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    events_ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    if form == "auto":
        form = "broadcast" if orders_ds.count() <= broadcast_limit \
            else "bucketed"

    def _emit(batch_ids, batch_uids, valid, best_od, best_d):
        dstr = np.datetime_as_string(
            best_od.astype("datetime64[D]"), unit="D").astype(object)
        return pa.table({
            "event_id": pa.array(batch_ids[valid]),
            "user_id": pa.array(batch_uids[valid]),
            "nearest_order_date": pa.array(dstr[valid], pa.string()),
            "day_diff": pa.array(best_d[valid].astype(np.int64)),
        })

    if form == "broadcast":
        orders = orders_ds.to_pandas()
        ck = orders["o_custkey"].to_numpy(np.int64)
        od = orders["o_orderdate"].to_numpy(dtype="datetime64[us]") \
            .astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((od, ck))
        ck, od = ck[order], od[order]
        comp = ck * np.int64(1 << 20) + od
        ref = ray.put((comp, ck, od))

        def nearest(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            comp, ck, od = _ray.get(ref)
            uid = batch.column("user_id") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            tday = batch.column("ts").to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype("datetime64[D]") \
                .astype(np.int64)
            valid, best_od, best_d = _nearest_probe(comp, ck, od,
                                                    uid, tday)
            return _emit(
                batch.column("event_id")
                .to_numpy(zero_copy_only=False).astype(np.int64),
                uid, valid, best_od, best_d)

        return events_ds.map_batches(nearest, batch_format="pyarrow",
                                     batch_size=65536)

    def _bucket(keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "_bucket": pa.array(_bucket(uid)),
            "_side": pa.array(np.zeros(len(uid), dtype=np.int8)),
            "event_id": batch.column("event_id"),
            "user_id": pa.array(uid),
            "_day": pa.array(
                batch.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype("datetime64[D]")
                .astype(np.int64)),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "_bucket": pa.array(_bucket(ck)),
            "_side": pa.array(np.ones(len(ck), dtype=np.int8)),
            "event_id": pa.array(np.zeros(len(ck), dtype=np.int64)),
            "user_id": pa.array(ck),
            "_day": pa.array(
                batch.column("o_orderdate")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype("datetime64[D]")
                .astype(np.int64)),
        })

    tagged = events_ds.map_batches(tag_events, batch_format="pyarrow",
                                   batch_size=65536) \
        .union(orders_ds.map_batches(tag_orders, batch_format="pyarrow",
                                     batch_size=65536))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["_side"] == 0]
        odf = g[g["_side"] == 1]
        ck = odf["user_id"].to_numpy(np.int64)
        od = odf["_day"].to_numpy(np.int64)
        order = np.lexsort((od, ck))
        ck, od = ck[order], od[order]
        comp = ck * np.int64(1 << 20) + od
        uid = ev["user_id"].to_numpy(np.int64)
        tday = ev["_day"].to_numpy(np.int64)
        valid, best_od, best_d = _nearest_probe(comp, ck, od, uid, tday)
        return _emit(ev["event_id"].to_numpy(np.int64), uid,
                     valid, best_od, best_d).to_pandas()

    return tagged.groupby("_bucket").map_groups(merge,
                                                batch_format="pandas")


def events_value_bands(sf_dir: str, band_width: float = 25.0,
                       n_bands: int = 20):
    """Range (interval) join — events joined to value bands
    [lo, hi) by a non-equi condition. Broadcast-interval form: band edges
    ship once, each batch bucketizes with one vectorized searchsorted
    (the big-big interval-join form sorts both sides and merges per
    partition). Values beyond the last band fall into an overflow band."""
    import ray

    edges = np.array([i * band_width for i in range(n_bands + 1)])
    ref = ray.put(edges)
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def bucket(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray

        e = _ray.get(ref)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        band = np.searchsorted(e, v, side="right").astype(np.int64) - 1
        # negatives fall outside every oracle band (value >= lo with
        # lo=0 for band 0) — drop them instead of clipping into band 0
        keep = v >= 0
        v, band = v[keep], band[keep]
        band = np.clip(band, 0, n_bands)  # overflow band = n_bands
        return pa.table({"band_id": pa.array(band)})

    agg = ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536) \
        .groupby("band_id").aggregate(Count(alias_name="n_events"))
    return agg


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization — the stream-shaped operator: events partitioned by
    user, sorted by ts within the group, sessions split at >gap_minutes
    silences (ray_guide 'streaming-shaped workloads' pattern:
    groupby(key).map_groups over the sorted group). Output: one row per
    user with session count and max session length."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_sess = (g["ts"].diff() > gap).cumsum()
        sizes = new_sess.value_counts()
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(new_sess.nunique())],
                "max_session_events": [int(sizes.max())],
                "n_events": [len(g)],
            }
        )

    return ds.groupby("user_id").map_groups(sessionize,
                                            batch_format="pandas")


def part_type_counts(sf_dir: str):
    """distinct/groupby demo over part."""
    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])
    agg = ds.groupby("p_type").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("avg_price"),
            "avg_price",
            pc.round(batch.column("avg_price"), 4),
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


def nation_region_join(sf_dir: str):
    """Two-table join via broadcast (region is tiny)."""
    import ray

    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    ref = ray.put(_sorted_probe_arrays(region["r_regionkey"].to_numpy(),
                                       region["r_name"].to_numpy()))
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])

    def join(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray

        skeys, svals = _ray.get(ref)
        names = _probe_sorted(skeys, svals,
                              batch.column("n_regionkey").to_numpy(), "")
        return pa.table(
            {
                "n_nationkey": batch.column("n_nationkey"),
                "n_name": batch.column("n_name"),
                "r_name": pa.array(names, type=pa.string()),
            }
        )

    return nation.map_batches(join, batch_format="pyarrow")


def supplier_balance_by_nation(sf_dir: str):
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    agg = ds.groupby("s_nationkey").aggregate(
        Count(alias_name="n_suppliers"),
        Sum("s_acctbal", alias_name="sum_acctbal"),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_acctbal"),
            "sum_acctbal",
            pc.round(batch.column("sum_acctbal"), 2),
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


def revenue_by_part_type(sf_dir: str, form: str = "auto",
                         broadcast_limit: int = BROADCAST_LIMIT):
    """lineitem⋈part + groupby(p_type) — second join shape over the
    biggest fact table.

    Part is a DIMENSION table (sf x 200k rows), so the lookup is GATED:
    at or below ``broadcast_limit`` the partkey→type-code mapping ships
    once as sorted searchsorted arrays (the type VOCABULARY is a bounded
    ~150 strings and rides in closures — only int codes broadcast);
    above it lineitem joins part natively. Both forms pre-aggregate per
    (batch, type) — the combiner — so the final groupby shuffle carries
    at most n_types rows per batch instead of the whole lineitem."""
    import ray

    from .dedup import _join_parts

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    if form == "auto":
        form = "broadcast" if part_ds.count() <= broadcast_limit \
            else "join"
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def _partial(types, rev: np.ndarray) -> pa.Table:
        df = pd.DataFrame({"p_type": types, "_rev": rev})
        g = df.groupby("p_type", as_index=False) \
            .agg(_rev=("_rev", "sum"), _n=("_rev", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    if form == "broadcast":
        part = part_ds.to_pandas()
        codes, vocab = pd.factorize(part["p_type"])
        vocab = np.asarray(vocab, dtype=object)
        ref = ray.put(_sorted_probe_arrays(
            part["p_partkey"].to_numpy(np.int64),
            codes.astype(np.int32)))

        def join(batch: pa.Table, ref=ref, vocab=vocab) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            keys = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            code = _probe_sorted(sk, sv, keys, -1)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            types = np.where(code >= 0,
                             vocab[np.maximum(code, 0)], "")
            return _partial(types, ep * (1.0 - dc))

        partials = li.map_batches(join, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        joined = li.join(part_ds, join_type="inner", on=("l_partkey",),
                         right_on=("p_partkey",),
                         num_partitions=_join_parts(li, part_ds))

        def jpartial(batch: pa.Table) -> pa.Table:
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            return _partial(batch.column("p_type").to_pandas(),
                            ep * (1.0 - dc))

        partials = joined.map_batches(jpartial, batch_format="pyarrow",
                                      batch_size=65536)

    agg = partials.groupby("p_type").aggregate(
        Sum("_rev", alias_name="revenue"),
        Sum("_n", alias_name="n_items"),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("revenue"), "revenue",
            pa.array(_round2_snap(
                batch.column("revenue").to_numpy(zero_copy_only=False))),
        )

    return agg.map_batches(rnd, batch_format="pyarrow")


def orders_priority_counts(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return ds.groupby(["o_orderpriority", "o_orderstatus"]).aggregate(
        Count(alias_name="n_orders")
    )


def events_type_span(sf_dir: str):
    """min/max event time per type (timestamps normalized to strings for
    engine/oracle comparison)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        # Arrow's %S includes fractional seconds — slice to 19 chars to
        # match DuckDB's strftime
        s = pc.strftime(batch.column("ts"), format="%Y-%m-%d %H:%M:%S")
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "ts_s": pc.utf8_slice_codeunits(s, 0, 19),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow", batch_size=65536) \
        .groupby("event_type").aggregate(
            Min("ts_s", alias_name="first_ts"),
            Max("ts_s", alias_name="last_ts"),
            Count(alias_name="n_events"),
        )


def big_spenders_union(sf_dir: str):
    """Union of two filtered order subsets + distinct — set-op demo."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority"])
    hi = ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"),
                                      pa.scalar(400000.0))),
        batch_format="pyarrow",
    )
    urgent = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t.column("o_orderpriority"),
                             pa.scalar("1-URGENT")),
                    pc.greater(t.column("o_totalprice"),
                               pa.scalar(300000.0)))
        ),
        batch_format="pyarrow",
    )
    both = hi.union(urgent).select_columns(["o_orderkey", "o_totalprice"])
    # distinct via keyed max-fold (sort + run-length; one group per
    # surviving order makes Ray's Aggregate the wrong tool)
    from ..functions.sortagg import sorted_keyed_sum

    return sorted_keyed_sum(both, "o_orderkey", ["o_totalprice"],
                            how="max")


def orders_filter_sort(sf_dir: str, k: int = 50):
    """filter + projection + sort + limit demo."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderstatus"])
    filt = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"),
                                    pa.scalar("O"))),
        batch_format="pyarrow",
    )
    return filt.select_columns(["o_orderkey", "o_totalprice"]) \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
        .limit(k)


# ---------------------------------------------------------------------------
# r2 additions: window / anti-join / median / two-key rollup shapes
# ---------------------------------------------------------------------------


def customer_running_revenue(sf_dir: str, max_custkey: int = 200):
    """Per-customer running order total over time — the windowed-aggregate
    shape (SUM() OVER (PARTITION BY ... ORDER BY ...)). groupby(custkey)
    .map_groups with an in-group sort + cumsum; per-customer groups are
    bounded, so no group outgrows a task. Restricted to custkey <=
    max_custkey to keep the compare table small (the shape is identical
    at any cut)."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    ds = ds.filter(expr=f"o_custkey <= {int(max_custkey)}")

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        g["running_total"] = g["o_totalprice"].cumsum().round(2)
        return g[["o_custkey", "o_orderkey", "o_orderdate",
                  "running_total"]]

    return ds.groupby("o_custkey").map_groups(running,
                                              batch_format="pandas")


def customers_without_orders(sf_dir: str, since: str = "2001-01-01",
                             broadcast_limit: int = 2_000_000):
    """Anti-join: customers with no order since ``since``. Two forms,
    auto-switched on the distinct-key cardinality:

    - broadcast (default at TPC-H shapes): the matching side is reduced to
      a DISTINCT int64 key set per batch, distinct-merged with a groupby
      (distributed), and — when small — collected + broadcast into a
      vectorized np.isin filter over customers; no shuffle of either side.
    - hash anti-join (scale-safe fallback): when the distinct key set
      exceeds ``broadcast_limit`` rows it would be O(keys) per worker to
      broadcast, so both sides shuffle through Ray Data's native
      ``left_anti`` hash join instead.
    """
    import ray

    cutoff = np.datetime64(since)

    def recent_keys(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy()
        keep = d >= cutoff
        return pa.table(
            {"o_custkey": pa.array(
                np.unique(batch.column("o_custkey").to_numpy()[keep]))}
        )

    # distributed distinct: per-batch unique combiner, then a groupby on
    # the (already compacted) key column — the collected result is at most
    # one row per distinct key.
    from ..functions.sortagg import sorted_distinct_keys

    keys_ds = sorted_distinct_keys(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(recent_keys, batch_format="pyarrow"),
        "o_custkey").materialize()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    if keys_ds.count() > broadcast_limit:
        from .dedup import _join_parts

        return cust.join(
            keys_ds, join_type="left_anti",
            num_partitions=_join_parts(cust, keys_ds),
            on=("c_custkey",), right_on=("o_custkey",),
        )

    key_arr = np.sort(np.asarray(
        [r["o_custkey"] for r in keys_ds.take_all()], dtype=np.int64))
    ref = ray.put(key_arr)

    def anti(batch: pa.Table, ref=ref) -> pa.Table:
        have = ray.get(ref)
        ck = batch.column("c_custkey").to_numpy()
        mask = ~np.isin(ck, have)
        return batch.filter(pa.array(mask))

    return cust.map_batches(anti, batch_format="pyarrow")


def grouped_median_distributed(ds, key_col: str, val_col: str,
                               bins: int = 4096,
                               collect_cap: int = 262_144,
                               q: float = 0.5,
                               max_keys: int = 10_000) -> pa.Table:
    """Exact per-group quantile (default: median) without ever holding a
    group in one task.

    ``q`` selects the continuous quantile with DuckDB ``quantile_cont``
    semantics: position p = (n-1)*q, result = v[floor(p)] interpolated
    toward v[ceil(p)] by frac(p). q=0.5 reproduces the original median
    law (mean of the two middle values) bit-for-bit.

    A holistic aggregate over LOW-cardinality keys is the worst case for
    ``groupby(key).map_groups``: 5 distinct keys means each "group" is
    ~n/5 of the table in a single task. This is the distributed
    selection-by-histogram form instead:

    1. one aggregate pass → per-key (count, min, max) — driver holds one
       row per key (the helper's only assumption: distinct-key count is
       driver-resident; for HIGH-cardinality keys plain map_groups is
       already safe and preferable);
    2. iterate: a map_batches histogram pass buckets each key's values
       inside its current [lo, hi] window into ``bins`` bins (per-batch
       partials, merged by a tiny groupby — n_keys×bins rows); the driver
       locates the bins containing the two median ranks and narrows the
       window, accumulating the count below it. Candidates shrink ~bins×
       per pass (10^12 rows → ≤3 passes at 4096 bins);
    3. when total in-window candidates ≤ ``collect_cap``, a final filter
       pass collects them and the driver takes the exact order statistics
       (mean of the two middle values — np.median / DuckDB ``median()``
       semantics).

    Returns a driver-resident Arrow table (n_keys rows):
    (key_col, median, n).
    """
    import ray

    stats = {
        r[key_col]: r
        for r in ds.groupby(key_col).aggregate(
            Count(alias_name="_n"),
            Min(val_col, alias_name="_lo"),
            Max(val_col, alias_name="_hi"),
        ).take_all()
    }
    # Fail loud on misuse: the selection state is one window per
    # distinct key ON THE DRIVER, and every histogram pass compares the
    # whole key column against each key (O(n_keys x rows)). Built and
    # documented for LOW-cardinality keys; at high cardinality it would
    # melt quietly — plain groupby(key).map_groups is already safe
    # there and is the right operator.
    if len(stats) > max_keys:
        raise ValueError(
            f"grouped_median_distributed: {len(stats)} distinct keys "
            f"exceeds max_keys={max_keys}. This operator holds one "
            "selection window per key on the driver and scans "
            "O(n_keys) per batch; for high-cardinality keys use "
            "groupby(key).map_groups with a per-group quantile instead."
        )
    # per-key selection state: window [lo, hi] (inclusive), candidate
    # upper bound, and the two 0-indexed median ranks r1 <= r2. The
    # below-window count is NOT accumulated across passes — every
    # histogram pass recounts v < lo fresh over the whole column, so
    # float drift at bin edges can never corrupt the rank arithmetic.
    import math as _math

    state = {}
    for k, r in stats.items():
        n = int(r["_n"])
        p = (n - 1) * q
        state[k] = {
            "lo": float(r["_lo"]), "hi": float(r["_hi"]),
            "r1": int(_math.floor(p)), "r2": int(_math.ceil(p)),
            "frac": p - _math.floor(p), "cand": n,
        }

    def _hist_pass(windows):
        """One full-scan pass → per key: (count of v < lo, bin counts
        inside [lo, hi]). Per-batch partials merged by a tiny groupby
        (n_keys × (bins+1) rows reach the driver)."""
        ref = ray.put(windows)

        def hist(batch: pa.Table, ref=ref, bins=bins,
                 key_col=key_col, val_col=val_col) -> pa.Table:
            import ray as _ray

            win = _ray.get(ref)
            # vectorized over the whole batch: map keys to window indices
            # once (pd.Series.map, C loop), then one flat bincount over
            # group*bins — O(rows + G*bins), no per-key column scans
            keys_list = list(win)
            kidx = {k: i for i, k in enumerate(keys_list)}
            los = np.array([win[k][0] for k in keys_list], np.float64)
            his = np.array([win[k][1] for k in keys_list], np.float64)
            g = pd.Series(batch.column(key_col).to_pandas()) \
                .map(kidx).to_numpy(np.float64)
            present = ~np.isnan(g)
            gi = g[present].astype(np.int64)
            vals = batch.column(val_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)[present]
            lo_r, hi_r = los[gi], his[gi]
            G = len(keys_list)
            out_k, out_b, out_c = [], [], []
            below = np.bincount(gi[vals < lo_r], minlength=G)
            for gidx in np.nonzero(below)[0]:
                out_k.append(keys_list[gidx])
                out_b.append(-1)  # bin -1 = below-window count
                out_c.append(int(below[gidx]))
            inw = (vals >= lo_r) & (vals <= hi_r)
            if inw.any():
                gi_in, v_in = gi[inw], vals[inw]
                width = (his - los) / bins
                w_r = width[gi_in]
                safe = np.where(w_r > 0, w_r, 1.0)
                idx = np.where(
                    w_r > 0,
                    np.clip(((v_in - los[gi_in]) / safe).astype(np.int64),
                            0, bins - 1),
                    0)
                bc = np.bincount(gi_in * bins + idx, minlength=G * bins)
                nz = np.nonzero(bc)[0]
                out_k.extend(keys_list[int(f)] for f in nz // bins)
                out_b.extend((nz % bins).tolist())
                out_c.extend(bc[nz].tolist())
            return pa.table({
                "_k": pa.array(out_k),
                "_bin": pa.array(out_b, type=pa.int64()),
                "_cnt": pa.array(out_c, type=pa.int64()),
            })

        parts = ds.map_batches(hist, batch_format="pyarrow",
                               batch_size=65536) \
            .groupby(["_k", "_bin"]).aggregate(Sum("_cnt", alias_name="_c")) \
            .take_all()
        by_key: dict = {}
        for row in parts:
            by_key.setdefault(row["_k"], {})[int(row["_bin"])] = int(row["_c"])
        return by_key

    it = 0
    while sum(s["cand"] for s in state.values()
              if s["lo"] < s["hi"]) > collect_cap and it < 48:
        it += 1
        act = {k: s for k, s in state.items() if s["lo"] < s["hi"]}
        by_key = _hist_pass({k: (s["lo"], s["hi"]) for k, s in act.items()})

        progressed = False
        for k, s in act.items():
            counts = by_key.get(k, {})
            below = counts.pop(-1, 0)
            lo, hi = s["lo"], s["hi"]
            width = (hi - lo) / bins
            order = sorted(counts)
            t1, t2 = s["r1"] - below, s["r2"] - below
            cum, b_lo, b_hi = 0, None, None
            for b in order:
                c = counts[b]
                if b_lo is None and cum <= t1 < cum + c:
                    b_lo = b
                if cum <= t2 < cum + c:
                    b_hi = b
                cum += c
            if b_lo is None or b_hi is None:
                continue  # defensive: leave window as-is, collect later
            new_lo = lo + b_lo * width
            new_hi = hi if b_hi == bins - 1 else lo + (b_hi + 1) * width
            in_window = sum(counts[b] for b in order if b_lo <= b <= b_hi)
            if (new_lo, new_hi) != (lo, hi):
                progressed = True
            s["lo"], s["hi"], s["cand"] = new_lo, new_hi, in_window
        if not progressed:
            break  # duplicate-heavy window stopped splitting; collect as-is

    # keys whose window collapsed to a point need no collection: every
    # remaining candidate equals lo, so the median IS lo
    solved = {k: s["lo"] for k, s in state.items() if s["lo"] == s["hi"]}

    # final pass: per key, fresh below-count + collect in-window candidates
    # (bounded by collect_cap, modulo degenerate duplicate-heavy windows)
    windows = {k: (s["lo"], s["hi"]) for k, s in state.items()
               if k not in solved}
    ref = ray.put(windows)

    def in_window(batch: pa.Table, ref=ref, key_col=key_col,
                  val_col=val_col) -> pa.Table:
        import ray as _ray

        win = _ray.get(ref)
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        karr = np.asarray(keys, dtype=object)
        mask = np.zeros(len(vals), dtype=bool)
        below_k, below_c = [], []
        for k, (lo, hi) in win.items():
            km = karr == k
            mask |= km & (vals >= lo) & (vals <= hi)
            nb = int(np.count_nonzero(km & (vals < lo)))
            if nb:
                below_k.append(k)
                below_c.append(nb)
        t = pa.table({
            key_col: pa.array(karr[mask].tolist() + below_k),
            val_col: pa.array(np.concatenate(
                [vals[mask], np.full(len(below_k), np.nan)])),
            "_below": pa.array([0] * int(mask.sum()) + below_c,
                               type=pa.int64()),
        })
        return t

    cand: dict = {k: [] for k in windows}
    below_tot: dict = {k: 0 for k in windows}
    if windows:
        for row in ds.map_batches(in_window, batch_format="pyarrow",
                                  batch_size=65536).iter_rows():
            if row["_below"]:
                below_tot[row[key_col]] += row["_below"]
            else:
                cand[row[key_col]].append(row[val_col])

    out_k, out_m, out_n = [], [], []
    for k in sorted(state):
        if k in solved:
            med = solved[k]
        else:
            s = state[k]
            v = np.sort(np.asarray(cand[k], dtype=np.float64))
            i1, i2 = s["r1"] - below_tot[k], s["r2"] - below_tot[k]
            if s["frac"] == 0.5:
                # median fast path: keep the original (a+b)/2 law
                # bit-for-bit (a + 0.5*(b-a) can differ in the last ulp)
                med = (float(v[i1]) + float(v[i2])) / 2.0
            else:
                med = float(v[i1]) + s["frac"] * (float(v[i2])
                                                  - float(v[i1]))
        out_k.append(k)
        out_m.append(med)
        out_n.append(int(stats[k]["_n"]))
    return pa.table({key_col: pa.array(out_k),
                     "median": pa.array(out_m, type=pa.float64()),
                     "n": pa.array(out_n, type=pa.int64())})


def order_value_median_by_priority(sf_dir: str):
    """Exact per-group median — a holistic aggregate Ray Data's built-ins
    don't cover, over a LOW-cardinality key (~5 priorities), so the naive
    groupby.map_groups would put ~n/5 of the table in one task. Uses the
    distributed two-pass histogram selection instead
    (grouped_median_distributed): no task ever holds more than
    collect_cap candidate rows."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    t = grouped_median_distributed(ds, "o_orderpriority", "o_totalprice")
    return pa.table({
        "o_orderpriority": t.column("o_orderpriority"),
        # DuckDB ROUND on DOUBLE is half-away-from-zero; Arrow's default
        # half_to_even diverges on exact .xx5 midpoints (observed on a
        # real two-middle-value average)
        "median_price": pc.round(t.column("median"), 2,
                                 round_mode="half_towards_infinity"),
        "n_orders": t.column("n"),
    })


def order_value_mad_by_priority(sf_dir: str):
    """Median absolute deviation (MAD) per group — the robust-dispersion
    holistic aggregate: MAD = median(|x - median(x)|). Two passes of the
    distributed histogram-selection machinery: pass 1 takes the 5-row
    per-priority medians, which broadcast via ``ray.put`` into a fully
    vectorized |x - med| map (np.unique factorize + array index — no
    per-row probe), pass 2 selects the median of the deviations. No task
    ever holds a group. DuckDB-oracle-gated (same two-pass SQL)."""
    import ray

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    med = grouped_median_distributed(ds, "o_orderpriority", "o_totalprice")
    med_map = {k: float(v) for k, v in
               zip(med.column("o_orderpriority").to_pylist(),
                   med.column("median").to_pylist())}
    med_ref = ray.put(med_map)

    def adev(batch: pa.Table) -> pa.Table:
        mm = ray.get(med_ref)
        pr = np.asarray(batch.column("o_orderpriority").to_pylist(),
                        dtype=object)
        uniq, inv = np.unique(pr, return_inverse=True)
        meds = np.array([mm[u] for u in uniq])[inv]
        x = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "_adev": pa.array(np.abs(x - meds)),
        })

    dev = ds.map_batches(adev, batch_format="pyarrow", batch_size=32768)
    t = grouped_median_distributed(dev, "o_orderpriority", "_adev")
    return pa.table({
        "o_orderpriority": t.column("o_orderpriority"),
        "mad_price": pc.round(t.column("median"), 2,
                              round_mode="half_towards_infinity"),
        "n_orders": t.column("n"),
    })


def pdf_pages(sf_dir: str):
    """PDF document source (reference processors/pdf/processor.py as a
    Ray pipeline): documents.text → deterministic fixture PDFs
    (sources/pdf_fixture.doc_text_to_pdf — no PDF libs exist in this
    environment, so inputs are generated, not read) → actor-pool
    PdfProcessStage → one row per extracted page with text/markdown/image
    /link stats. The render stage stands in for a binary-column parquet
    read; the processing stage is the real operator."""
    from ..sources.pdf_fixture import doc_text_to_pdf
    from ..stages.pdf import PdfProcessStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "pdf": pa.array([doc_text_to_pdf(int(i), t or "")
                             for i, t in zip(ids, texts)],
                            type=pa.large_binary()),
        })

    # autoscaling actor pool (min 1): a fixed pool sized at the CPU count
    # would starve the upstream read/render tasks on small clusters
    pages = ds.map_batches(render, batch_format="pyarrow",
                           batch_size=64) \
        .map_batches(PdfProcessStage, batch_format="pyarrow",
                     batch_size=32, concurrency=(1, 4))

    def summarize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "page_number": batch.column("page_number"),
            "n_pages": batch.column("n_pages"),
            "n_chars": pc.utf8_length(batch.column("raw_text"))
                .cast(pa.int64()),
            "n_images": batch.column("n_images"),
            "n_links": pc.list_value_length(batch.column("links"))
                .cast(pa.int32()),
            "title": batch.column("title"),
        })

    return pages.map_batches(summarize, batch_format="pyarrow")


def _nation_year_leaf(sf_dir: str, form: str = "auto",
                      broadcast_limit: int = BROADCAST_LIMIT):
    """Shared leaf of revenue_by_nation_year / revenue_rollup: the
    aggregated (n_name, order_year, _rev, _n) Dataset, sums unrounded.

    Customer is a DIMENSION table that scales linearly with SF, so the
    lookup is GATED (VERDICT r3 #1): at or below ``broadcast_limit``
    rows it ships once as sorted searchsorted arrays (vectorized probe,
    no per-row dicts); above it the pipeline switches to a native
    ``Dataset.join`` on custkey — the driver never materializes the
    table. Nation is constant 25 rows and rides in closures. Both forms
    pre-aggregate per batch (combiner) so the two-key groupby shuffle
    carries (nationkey, year) partials only; byte-equal
    (tests/test_analysis_scale.py)."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    names = {int(k): str(v) for k, v in
             zip(nation["n_nationkey"], nation["n_name"])}
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    if form == "auto":
        form = "broadcast" if cust_ds.count() <= broadcast_limit \
            else "join"
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

    def _partial(ck: np.ndarray, nk: np.ndarray, batch: pa.Table) \
            -> pa.Table:
        yr = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        tp = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"_nk": nk, "order_year": yr, "_tp": tp})
        g = df.groupby(["_nk", "order_year"], as_index=False) \
            .agg(_rev=("_tp", "sum"), _n=("_tp", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    if form == "broadcast":
        cust = cust_ds.to_pandas()
        ref = ray.put(_sorted_probe_arrays(
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64)))

        def partial(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            nk = _probe_sorted(sk, sv, ck, -1)
            return _partial(ck, nk, batch)

        partials = orders.map_batches(partial, batch_format="pyarrow",
                                      batch_size=16384)
    else:
        joined = orders.join(
            cust_ds, join_type="inner", on=("o_custkey",),
            right_on=("c_custkey",),
            num_partitions=_join_ray_parts(orders, cust_ds))

        def jpartial(batch: pa.Table) -> pa.Table:
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            nk = batch.column("c_nationkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _partial(ck, nk, batch)

        partials = joined.map_batches(jpartial, batch_format="pyarrow",
                                      batch_size=16384)

    agg = partials.groupby(["_nk", "order_year"]).aggregate(
        Sum("_rev", alias_name="_rev"),
        Sum("_n", alias_name="_n"),
    )

    def name_keys(batch: pa.Table, names=names) -> pa.Table:
        # tiny: at most nations x years rows reach this stage
        nk = batch.column("_nk").to_pylist()
        return pa.table({
            "n_name": pa.array([names[int(k)] for k in nk], pa.string()),
            "order_year": batch.column("order_year"),
            "_rev": batch.column("_rev"),
            "_n": batch.column("_n"),
        })

    return agg.map_batches(name_keys, batch_format="pyarrow")


def revenue_by_nation_year(sf_dir: str, form: str = "auto",
                           broadcast_limit: int = BROADCAST_LIMIT):
    """Two-key rollup: order revenue by (nation, order year). Dimension
    lookup gated broadcast-or-join — see ``_nation_year_leaf``."""
    leaf = _nation_year_leaf(sf_dir, form=form,
                             broadcast_limit=broadcast_limit)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch.column("n_name"),
            "order_year": batch.column("order_year"),
            "revenue": pa.array(_round2_snap(
                batch.column("_rev").to_numpy(zero_copy_only=False))),
            "n_orders": batch.column("_n"),
        })

    return leaf.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# round-3 additions: group-wise top-k, deterministic sampling, full-outer
# join, distributed quantile, hopping-window aggregate, vocabulary
# ---------------------------------------------------------------------------


def top_orders_per_customer(sf_dir: str, k: int = 3):
    """Top-k orders per customer by value — the group-wise top-k operator.

    Scale shape: a per-batch combiner first prunes every batch to its own
    top-k per customer (top-k of a union is the top-k of per-part top-ks),
    so the groupby shuffle carries at most k rows per (batch, customer)
    instead of the whole orders table; the final per-group selection then
    ranks at most k*n_blocks rows per customer."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_totalprice"])

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("o_custkey").head(k),
                                    preserve_index=False)

    # the final selection is ONE global sort + a vectorized per-run
    # position filter (rank = offset within the customer's run), not a
    # per-customer map_groups — 30k Python group calls cost 11 s at
    # sf0.1 where the sorted scan costs under 2 s. Runs complete
    # inside a block rank locally; each block's first/last customer
    # (the only ones that can span blocks) is completed on the driver
    # (≤ 2 x blocks customers x k pruned rows) and unioned back.
    s = (ds.map_batches(local_prune, batch_format="pyarrow",
                        batch_size=65536)
         .sort(["o_custkey", "o_totalprice", "o_orderkey"],
               descending=[False, True, False]))

    def topk_runs(batch: pa.Table) -> pa.Table:
        c = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        n = len(c)
        if n == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64()),
                             "rnk": pa.array([], pa.int64()),
                             "_bnd": pa.array([], pa.bool_())})
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        inv = np.searchsorted(starts, np.arange(n), side="right") - 1
        pos = np.arange(n) - starts[inv]
        bnd_row = (c == c[0]) | (c == c[-1])
        keep = bnd_row | (pos < k)
        t = batch.filter(pa.array(keep))
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "o_totalprice": t.column("o_totalprice"),
            "rnk": pa.array((pos[keep] + 1).astype(np.int64)),
            "_bnd": pa.array(bnd_row[keep]),
        })

    parts = s.map_batches(topk_runs, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior = parts.filter(expr="_bnd == False") \
        .select_columns(["o_custkey", "o_orderkey", "o_totalprice",
                         "rnk"])
    bpd = parts.filter(expr="_bnd == True").to_pandas() \
        .drop(columns=["rnk", "_bnd"])
    if len(bpd) == 0:
        return interior
    bpd = bpd.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
    bpd = bpd.groupby("o_custkey").head(k).reset_index(drop=True)
    bpd["rnk"] = bpd.groupby("o_custkey").cumcount().to_numpy() + 1
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(bpd, preserve_index=False)))


def doc_hash_sample(sf_dir: str, pct: int = 20):
    """Deterministic hash-Bernoulli document sample — the reproducible
    corpus-subsetting operator (training-data pipelines sample by content
    hash so every run and every engine picks the SAME subset; no RNG
    state, no seed coordination across workers).

    A doc is kept iff the first 8 hex chars of md5(str(doc_id)) fall in
    the lowest ``pct`` % of the hash space, compared lexicographically —
    identical in python and SQL (DuckDB md5()) with no integer parsing."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    # lexicographic cutoff: first pct% of the uniform 32-bit hex space
    cut = format(int((1 << 32) * pct / 100), "08x")

    def sample(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_pylist()
        h8 = [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in ids]
        mask = pa.array([h < cut for h in h8])
        t = batch.append_column("h8", pa.array(h8, type=pa.string()))
        return t.filter(mask)

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=8192)


def orders_year_matrix(sf_dir: str, y_a: int = 1996, y_b: int = 1997):
    """Per-customer order counts for two years, FULL OUTER joined — the
    two-sided outer-join operator (Dataset.join full_outer, hash-
    partitioned; neither side is broadcast)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def year_counts(y: int, out_name: str):
        def prep(batch: pa.Table, y=y) -> pa.Table:
            yr = pc.year(batch.column("o_orderdate"))
            return batch.filter(pc.equal(yr, pa.scalar(y)))

        from ..functions.sortagg import sorted_keyed_count

        return sorted_keyed_count(
            orders.map_batches(prep, batch_format="pyarrow",
                               batch_size=65536),
            "o_custkey", out=out_name)

    a = year_counts(y_a, "n_a")
    b = year_counts(y_b, "n_b").map_batches(
        lambda t: t.rename_columns(["ck_b", "n_b"]),
        batch_format="pyarrow")
    joined = a.join(b, join_type="full_outer", num_partitions=8,
                    on=("o_custkey",), right_on=("ck_b",))

    def fin(batch: pa.Table) -> pa.Table:
        # Ray's full_outer join already coalesces the (on, right_on) key
        # pair into the left key column; only the counts keep nulls
        zero = pa.scalar(0, type=pa.int64())
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "n_a": pc.coalesce(batch.column("n_a"), zero),
            "n_b": pc.coalesce(batch.column("n_b"), zero),
        })

    return joined.map_batches(fin, batch_format="pyarrow")


def order_value_p95_by_priority(sf_dir: str):
    """Exact per-group p95 — the same distributed histogram-selection
    machinery as the median (grouped_median_distributed, q=0.95), so a
    holistic aggregate over a low-cardinality key never puts a whole
    group in one task. Oracle: DuckDB quantile_cont(.., 0.95)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    t = grouped_median_distributed(ds, "o_orderpriority", "o_totalprice",
                                   q=0.95)
    return pa.table({
        "o_orderpriority": t.column("o_orderpriority"),
        "p95_price": pc.round(t.column("median"), 2,
                              round_mode="half_towards_infinity"),
        "n_orders": t.column("n"),
    })


def events_hopping_window(sf_dir: str, window_days: int = 7):
    """Hopping-window aggregate over the events stream: for every
    (event_type, 7-day window hopping by 1 day) → count + sum(value).
    The streaming-window operator expressed Ray-Data-first: each event is
    exploded to the ``window_days`` windows containing it (vectorized
    datetime64 arithmetic), then a plain groupby-aggregate; no ordered
    scan, no per-key state actor, arbitrarily parallel."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").to_numpy().astype("datetime64[D]")
        n = len(days)
        et = np.asarray(batch.column("event_type").to_pylist(),
                        dtype=object)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        offs = np.arange(window_days, dtype="timedelta64[D]")
        # event at day d belongs to windows starting at d-6 .. d
        starts = np.repeat(days, window_days) - np.tile(offs, n)
        return pa.table({
            "event_type": pa.array(np.repeat(et, window_days)),
            "window_start": pa.array(
                np.datetime_as_string(starts, unit="D")),
            "n_events": pa.array(np.ones(n * window_days,
                                         dtype=np.int64)),
            "value": pa.array(np.repeat(val, window_days)),
        })

    agg = (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=32768)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("value", alias_name="sum_value"))
    )

    def fin(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("sum_value"), "sum_value",
            pc.round(batch.column("sum_value"), 4),
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def events_sliding_distinct_users(sf_dir: str, window_days: int = 7):
    """Sliding-window COUNT(DISTINCT) — distinct users per (7-day
    window hopping by 1 day).  The windowed-distinct operator no
    window-function engine gives you cheaply, expressed Ray-Data-first:
    a per-batch (day, user) dedup bounds the explosion, each surviving
    pair is exploded to the ``window_days`` windows containing it, and
    distinctness resolves in ONE (window, user) groupby followed by a
    per-window count — no ordered scan, no per-key state, shuffle
    volume ≤ window_days × distinct (day, user) pairs."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def explode(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").to_numpy().astype(
            "datetime64[D]").astype(np.int32)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"d": days, "u": uid}).drop_duplicates()
        d = df["d"].to_numpy()
        u = df["u"].to_numpy()
        offs = np.arange(window_days, dtype=np.int32)
        starts = np.repeat(d, window_days) - np.tile(offs, len(d))
        uids = np.repeat(u, window_days)
        # pack (window, user) into one uint64 key: the distinctness
        # groupby on ~pairs-many groups is Ray-Aggregate-pathological;
        # the packed sorted distinct is the sortagg shape
        return pa.table({"k": pa.array(
            (starts.astype(np.uint64) << np.uint64(32))
            | uids.astype(np.uint64), pa.uint64())})

    from .dedup import _sorted_distinct_u64

    uniq = _sorted_distinct_u64(
        ds.map_batches(explode, batch_format="pyarrow",
                       batch_size=65536), "k")

    def wpartial(batch: pa.Table) -> pa.Table:
        kk = batch.column("k").to_numpy(zero_copy_only=False)
        ws = (kk >> np.uint64(32)).astype(np.int32)
        vals, counts = np.unique(ws, return_counts=True)
        return pa.table({"wstart": pa.array(vals, pa.int32()),
                         "_n": pa.array(counts.astype(np.int64))})

    # window count is bounded by the date span — a tiny groupby
    per_window = uniq.map_batches(wpartial, batch_format="pyarrow") \
        .groupby("wstart").aggregate(Sum("_n", alias_name="n_users"))

    def fin(batch: pa.Table) -> pa.Table:
        ws = batch.column("wstart").to_numpy().astype("datetime64[D]")
        return pa.table({
            "window_start": pa.array(np.datetime_as_string(ws, unit="D")),
            "n_users": batch.column("n_users"),
        })

    return per_window.map_batches(fin, batch_format="pyarrow")


def corpus_top_terms(sf_dir: str, k: int = 50):
    """Top-k corpus vocabulary by total term occurrences — per-batch
    Counter partials (each batch ships at most its distinct-term rows,
    not its token stream) → groupby(term).sum → tiny global sort."""
    ds = _read(sf_dir, "documents", ["text"])

    def partials(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for text in batch.column("text").to_pylist():
            c.update((text or "").lower().split())
        return pa.table({
            "term": pa.array(list(c.keys()), type=pa.string()),
            "n": pa.array(list(c.values()), type=pa.int64()),
        })

    return (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
    )


def lineitem_spearman(sf_dir: str):
    """Spearman rank correlation between l_quantity and
    l_extendedprice — Pearson over MIDRANKS (exact tie handling), the
    nonparametric twin of ``lineitem_corr_by_flag``. One summary row.

    Scale shape: each column's midranks come from its per-distinct-
    value histogram (sorted_keyed_sum) + ONE exclusive prefix scan
    (midrank(v) = below(v) + (n_v + 1)/2 — the Mann-Whitney pattern);
    ranks attach back to rows by two value-keyed hash joins, and the
    correlation reduces through the standard moment combiner. No task
    ever ranks the table."""
    import ray

    from ..functions.sortagg import sorted_keyed_sum

    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def rank_table(col: str) -> "rd.Dataset":
        def prep(batch: pa.Table) -> pa.Table:
            return pa.table({
                "v": batch.column(col).cast(pa.float64()),
                "c": pa.array(np.ones(batch.num_rows, np.int64)),
            })

        g = sorted_keyed_sum(
            li.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536), "v", ["c"]) \
            .sort("v").materialize()

        def bp(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"bid": pa.array([], pa.float64()),
                                 "tc": pa.array([], pa.int64())})
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return pa.table({
                "bid": pa.array([float(v.min())], pa.float64()),
                "tc": pa.array(
                    [int(batch.column("c").to_numpy().sum())],
                    pa.int64()),
            })

        blocks = sorted(
            (r["bid"], r["tc"])
            for r in g.map_batches(bp, batch_format="pyarrow",
                                   batch_size=None).iter_rows())
        bases = {}
        run = 0
        for bid, tc in blocks:
            bases[bid] = run
            run += tc
        bref = ray.put(bases)

        def midrank(batch: pa.Table, bref=bref) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"v": pa.array([], pa.float64()),
                                 "mr": pa.array([], pa.float64())})
            bases = ray.get(bref)
            df = batch.to_pandas().sort_values("v")
            c = df["c"].to_numpy(np.float64)
            below = bases[float(df["v"].iloc[0])] \
                + np.cumsum(c) - c
            return pa.table({
                "v": pa.array(df["v"].to_numpy(np.float64)),
                "mr": pa.array(below + (c + 1) / 2.0, pa.float64()),
            })

        return g.map_batches(midrank, batch_format="pyarrow",
                             batch_size=None).materialize()

    rx = rank_table("l_quantity").rename_columns(
        {"v": "l_quantity", "mr": "rx"})
    ry = rank_table("l_extendedprice").rename_columns(
        {"v": "l_extendedprice", "mr": "ry"})

    def to_f64(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_quantity": batch.column("l_quantity")
            .cast(pa.float64()),
            "l_extendedprice": batch.column("l_extendedprice")
            .cast(pa.float64()),
        })

    rows = li.map_batches(to_f64, batch_format="pyarrow")
    n_parts = _join_ray_parts(rows, rx)
    j = rows.join(rx, "inner", n_parts, on=("l_quantity",)) \
        .join(ry, "inner", n_parts, on=("l_extendedprice",))

    def mom(batch: pa.Table) -> pa.Table:
        x = batch.column("rx").to_numpy(zero_copy_only=False)
        y = batch.column("ry").to_numpy(zero_copy_only=False)
        return pa.table({
            "_n": pa.array([batch.num_rows], pa.int64()),
            "_sx": pa.array([float(x.sum())]),
            "_sy": pa.array([float(y.sum())]),
            "_sxx": pa.array([float((x * x).sum())]),
            "_syy": pa.array([float((y * y).sum())]),
            "_sxy": pa.array([float((x * y).sum())]),
        })

    m = j.map_batches(mom, batch_format="pyarrow",
                      batch_size=65536)
    n = float(m.sum("_n"))
    sx, sy = m.sum("_sx"), m.sum("_sy")
    sxx, syy, sxy = m.sum("_sxx"), m.sum("_syy"), m.sum("_sxy")
    rho = (sxy - sx * sy / n) / np.sqrt(
        (sxx - sx * sx / n) * (syy - sy * sy / n))
    return pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "spearman_rho": pa.array([round(float(rho), 6)],
                                 pa.float64()),
    })


def events_value_psi(sf_dir: str):
    """Population Stability Index between the first and second half of
    the event stream (split at the midpoint calendar day) — the
    ML-ops drift metric: decile edges fitted on the REFERENCE half,
    both halves binned by them, PSI contribution
    (p−q)·ln(p/q) per bin. Ten rows.

    Scale shape: the split day is one (min, max) aggregate; the nine
    decile edges come from the distributed histogram-selection
    quantile (grouped_median_distributed, q = 0.1…0.9 — no task ever
    holds the half); binning is a stateless searchsorted map with the
    edges broadcast once, reduced by a ≤10-cell combiner. The strict
    v > edge convention matches the SQL count(*) WHERE value > edge
    exactly."""
    import ray

    ds = _read(sf_dir, "events", ["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({
            "day": pa.array(day),
            "value": batch.column("value").cast(pa.float64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow",
                        batch_size=65536).materialize()
    lo = dv.min("day")
    hi = dv.max("day")
    split = (int(lo) + int(hi)) // 2

    def half(keep_ref: bool):
        def f(batch: pa.Table, keep_ref=keep_ref) -> pa.Table:
            d = batch.column("day").to_numpy(zero_copy_only=False)
            m = d <= split if keep_ref else d > split
            return pa.table({"k": pa.array(["x"] * int(m.sum()),
                                           pa.string()),
                             "value": batch.column("value")
                             .filter(pa.array(m))})
        return dv.map_batches(f, batch_format="pyarrow",
                              batch_size=65536)

    ref = half(True).materialize()
    cur = half(False).materialize()
    edges = np.array(sorted(
        float(grouped_median_distributed(ref, "k", "value", q=q)
              .column("median")[0].as_py())
        for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)))
    eref = ray.put(edges)

    def binned(which):
        def f(batch: pa.Table) -> pa.Table:
            import ray as _ray

            e = _ray.get(eref)
            v = batch.column("value").to_numpy(zero_copy_only=False)
            b = np.searchsorted(e, v, side="left")  # == #edges < v
            bc = np.bincount(b, minlength=10)
            return pa.table({"bin": pa.array(np.arange(10), pa.int64()),
                             "n": pa.array(bc.astype(np.int64))})
        return which.map_batches(f, batch_format="pyarrow",
                                 batch_size=65536) \
            .groupby("bin").aggregate(Sum("n", alias_name="n")) \
            .to_pandas().set_index("bin")["n"]

    nr = binned(ref).reindex(range(10), fill_value=0) \
        .to_numpy(np.int64)
    nc = binned(cur).reindex(range(10), fill_value=0) \
        .to_numpy(np.int64)
    tr, tc = float(nr.sum()), float(nc.sum())
    psi = np.full(10, np.nan)
    ok = (nr > 0) & (nc > 0)
    p = nr[ok] / tr
    q = nc[ok] / tc
    psi[ok] = (p - q) * np.log(p / q)
    return pa.table({
        "bin": pa.array(np.arange(10), pa.int64()),
        "n_ref": pa.array(nr),
        "n_cur": pa.array(nc),
        "psi_part": pa.array(
            [None if np.isnan(x) else round(float(x), 6)
             for x in psi], pa.float64()),
    })


def corpus_zipf_slope(sf_dir: str, k: int = 100):
    """Zipf-law fit of the corpus term distribution — OLS slope of
    ln(frequency) on ln(rank) over the top-``k`` terms (natural text
    runs near −1; synthetic or templated corpora flatten), the
    corpus-health fingerprint next to TF-IDF and the vocab build. One
    summary row.

    Scale shape: term counts are the corpus_top_terms reduction
    (Counter partials → groupby sum), the top-k selection is a
    distributed sort + limit, and the log-log regression runs on the
    bounded k-row table with the standard moment formula — the same
    doubles DuckDB's regr_slope reduces to."""
    top = corpus_top_terms(sf_dir, k=k).to_pandas()
    n = top["n"].to_numpy(np.float64)
    rank = np.arange(1, len(n) + 1, dtype=np.float64)
    x = np.log(rank)
    y = np.log(n)
    m = len(x)
    sx, sy = x.sum(), y.sum()
    sxy = (x * y).sum()
    sxx = (x * x).sum()
    slope = (sxy - sx * sy / m) / (sxx - sx * sx / m)
    intercept = sy / m - slope * sx / m
    return pa.table({
        "n_terms": pa.array([m], pa.int64()),
        "zipf_slope": pa.array([round(float(slope), 6)], pa.float64()),
        "zipf_intercept": pa.array([round(float(intercept), 4)],
                                   pa.float64()),
    })


# ---------------------------------------------------------------------------
# round-3 additions (session 5): lag/lead gaps, rollup subtotals,
# above-group-average filter
# ---------------------------------------------------------------------------


def events_lag_gap(sf_dir: str):
    """Per-user gap (seconds) since the previous event — the LAG() window
    shape. groupby(user_id).map_groups with an in-group sort + diff;
    per-user groups are bounded by per-user event counts, so no task
    outgrows its heap at corpus scale. First event per user gets -1.0
    (COALESCE'd identically in the SQL oracle so the hash compares)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "gap_s": gap.fillna(-1.0).astype("float64"),
        })

    return ds.groupby("user_id").map_groups(gaps, batch_format="pandas")


def revenue_rollup(sf_dir: str, form: str = "auto",
                   broadcast_limit: int = BROADCAST_LIMIT):
    """ROLLUP(nation, year): leaf revenue per (nation, year) PLUS per-nation
    subtotals PLUS the grand total, sentinel 'ALL' marking rolled-up keys.

    Scale shape: the only big-data pass is the shared leaf aggregation
    (``_nation_year_leaf`` — gated broadcast-or-join dimension lookup +
    combiner + two-key groupby); the subtotal levels re-aggregate the
    LEAF table (nations x years rows — hundreds), so rollup costs one
    extra tiny pandas pass, not a second scan. Sums stay unrounded until
    the final union so subtotal = sum of leaves bit-for-bit like the
    SQL."""
    # leaf is nations x years — tiny; derive the two rolled-up levels
    # driver-side (the SQL's ROLLUP does exactly this re-aggregation)
    df = _nation_year_leaf(sf_dir, form=form,
                           broadcast_limit=broadcast_limit).to_pandas() \
        .rename(columns={"n_name": "nation"})
    df["order_year"] = df["order_year"].astype("int64").astype(str)
    df = df[["nation", "order_year", "_rev", "_n"]]
    by_nation = df.groupby("nation", as_index=False) \
        .agg(_rev=("_rev", "sum"), _n=("_n", "sum"))
    by_nation["order_year"] = "ALL"
    total = pd.DataFrame({
        "nation": ["ALL"], "order_year": ["ALL"],
        "_rev": [df["_rev"].sum()], "_n": [df["_n"].sum()],
    })
    out = pd.concat([df, by_nation[df.columns], total[df.columns]],
                    ignore_index=True)
    out["revenue"] = _round2_snap(out["_rev"].to_numpy())
    out["n_orders"] = out["_n"].astype("int64")
    return pa.Table.from_pandas(
        out[["nation", "order_year", "revenue", "n_orders"]],
        preserve_index=False)


def parts_above_type_avg(sf_dir: str):
    """Parts priced above their p_type group average — the correlated-
    subquery / above-group-average shape. The group-average table is
    p_type-cardinality rows (single digits), so it is aggregated
    distributed, collected, and broadcast into a vectorized per-batch
    filter — no second scan, no shuffle of part."""
    import ray

    ds = _read(sf_dir, "part", ["p_partkey", "p_type", "p_retailprice"])
    avg = ds.groupby("p_type").aggregate(
        Mean("p_retailprice", alias_name="avg_price"))
    lut = {r["p_type"]: r["avg_price"] for r in avg.take_all()}
    ref = ray.put(lut)

    def above(batch: pa.Table, ref=ref) -> pa.Table:
        lookup = ray.get(ref)
        thr = pd.Series(batch.column("p_type").to_pandas()) \
            .map(lookup).to_numpy(np.float64)
        price = batch.column("p_retailprice").to_numpy(zero_copy_only=False)
        keep = price > thr
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "type_avg",
            pa.array(np.round(thr[keep], 4), type=pa.float64()))

    return ds.map_batches(above, batch_format="pyarrow", batch_size=16384)


def doc_repetition_stats(sf_dir: str):
    """Per-document repetition signals — the Gopher/C4-style quality
    rules (Rae et al. 2021 'duplicate n-gram fraction'): duplicate-word
    fraction, most-frequent-word fraction, most-frequent-bigram fraction.
    Pure per-document map (one Counter pass per doc inside map_batches —
    inherently per-string work, no shuffle, scales linearly)."""
    import collections

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {"doc_id": [], "n_words": [], "n_distinct": [],
               "dup_frac": [], "top_word_frac": [], "top_bigram_frac": []}
        for i, text in zip(ids, batch.column("text").to_pylist()):
            w = (text or "").split()
            n = len(w)
            wc = collections.Counter(w)
            bg = collections.Counter(zip(w, w[1:]))
            out["doc_id"].append(i)
            out["n_words"].append(n)
            out["n_distinct"].append(len(wc))
            out["dup_frac"].append(
                round(1.0 - len(wc) / n, 6) if n else 0.0)
            out["top_word_frac"].append(
                round(max(wc.values()) / n, 6) if n else 0.0)
            out["top_bigram_frac"].append(
                round(max(bg.values()) / (n - 1), 6) if n >= 2 else 0.0)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "n_words": pa.array(out["n_words"], type=pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], type=pa.int64()),
            "dup_frac": pa.array(out["dup_frac"], type=pa.float64()),
            "top_word_frac": pa.array(out["top_word_frac"],
                                      type=pa.float64()),
            "top_bigram_frac": pa.array(out["top_bigram_frac"],
                                        type=pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=4096)


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-01-01", k: int = 10,
                         form: str = "auto",
                         broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q3 shape — the big-big hash join: lineitem revenue joined to
    orders on orderkey via Ray Data's native hash join.

    Scale decomposition:
    - customer filtered to the segment and reduced to a custkey set —
      GATED on ``broadcast_limit``: small → ``ray.put`` sorted-array
      semi-filter inside the orders map (no shuffle); SF-scaled →
      native ``left_semi`` ``Dataset.join`` (customer is fact/10 in
      TPC-H — at 100 TB the key set is billions of rows and must not
      visit the driver);
    - lineitem (biggest table) is filtered at the batch, pre-aggregated
      per batch (combiner), then groupby(l_orderkey).sum — the first
      shuffle carries (orderkey, partial_rev) only;
    - the aggregated lineitem side joins filtered orders with
      ``Dataset.join`` — the second shuffle; both sides are
      orderkey-partitioned compact tables, the canonical big-big case
      where neither side may broadcast;
    - top-k: local sort only after the join (k rows to the driver).
    """
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ckeys = cust.filter(expr=f"c_mktsegment == '{segment}'") \
        .select_columns(["c_custkey"])
    if form == "auto":
        form = "broadcast" if ckeys.count() <= broadcast_limit \
            else "semijoin"

    cut = np.datetime64(cutoff)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])

    if form == "broadcast":
        keys = ckeys.to_pandas()["c_custkey"].to_numpy()
        kref = ray.put(np.sort(keys))

        def ofilt(batch: pa.Table, kref=kref) -> pa.Table:
            ks = ray.get(kref)
            dates = batch.column("o_orderdate") \
                .to_numpy(zero_copy_only=False)
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            keep = (dates < cut) & np.isin(ck, ks)
            t = batch.filter(pa.array(keep))
            return t.select(["o_orderkey", "o_orderdate",
                             "o_orderpriority"])

        ofiltered = orders.map_batches(ofilt, batch_format="pyarrow",
                                       batch_size=16384)
    else:
        # scale path: date-prune map-side, then a native left_semi hash
        # join against the segment key set — both sides stream.
        def datefilt(batch: pa.Table) -> pa.Table:
            dates = batch.column("o_orderdate") \
                .to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(dates < cut))

        ofiltered = orders.map_batches(
            datefilt, batch_format="pyarrow", batch_size=16384,
        ).join(
            ckeys, join_type="left_semi", on=("o_custkey",),
            right_on=("c_custkey",),
            num_partitions=_join_ray_parts(orders, ckeys),
        ).select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def lpartial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = ship > cut
        t = batch.filter(pa.array(keep))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"l_orderkey": ok, "_rev": ep * (1.0 - dc)})
        g = df.groupby("l_orderkey", as_index=False)["_rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.sortagg import sorted_keyed_sum

    rev = sorted_keyed_sum(
        li.map_batches(lpartial, batch_format="pyarrow",
                       batch_size=32768),
        "l_orderkey", ["_rev"])

    joined = rev.join(ofiltered, join_type="inner",
                      num_partitions=_join_ray_parts(rev, ofiltered),
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "revenue": pc.round(batch.column("_rev"), 2),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderpriority": batch.column("o_orderpriority"),
        })

    return (
        joined.map_batches(fin, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def _join_ray_parts(*dss) -> int:
    """Hash-join partition count: ~blocks of the larger side, capped at
    session CPUs (same law as dedup._join_parts — tiny inputs get 2
    aggregator actors, corpus-scale inputs get the CPU cap)."""
    import ray

    blocks = 2
    for d in dss:
        try:
            blocks = max(blocks, d.num_blocks())
        except Exception:
            pass
    try:
        cap = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cap = 8
    return max(2, min(cap, blocks))


def orders_repeat_window_join(sf_dir: str, days: int = 30,
                              n_buckets: int = 64):
    """Keyed RANGE join (non-equi interval join) — every same-customer
    order pair ``(first, nxt)`` where the next order lands strictly
    inside ``(first_date, first_date + days]``: the classic
    repeat-purchase-within-N-days analysis, and the 1:N interval
    sibling of ``events_asof_orders`` (which keeps only one match).

    Scale shape: hash-bucket the single input on the customer key (the
    same splitmix law as the as-of join's bucketed form) and emit each
    bucket's pairs inside ``groupby(bucket).map_groups`` — per-user
    orders are sorted once, then each row finds its window slice with
    two vectorized ``searchsorted`` probes. Per-task memory is
    orders/n_buckets; the output fan-out is the join's inherent cost.
    Same-date pairs are excluded (strict lower bound), so the output is
    orientation-unique without tie-break hazards. Integer day gaps —
    DuckDB-oracle-gated with no float hazards.
    """
    orders_ds = _read(sf_dir, "orders",
                      ["o_orderkey", "o_custkey", "o_orderdate"])

    def _bucket(keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "_bucket": pa.array(_bucket(ck)),
            "o_custkey": pa.array(ck),
            "o_orderkey": batch.column("o_orderkey"),
            "_t": batch.column("o_orderdate")
                .to_numpy(zero_copy_only=False).astype("datetime64[us]"),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized pass over the whole bucket (no per-customer
        # Python loop): pack (custkey, day) into a single monotonic
        # composite, sort once, and window-probe the composite — a
        # probe can never cross customers because window_days < 2^32
        empty = pd.DataFrame({
            "o_custkey": pd.Series([], dtype="int64"),
            "first_orderkey": pd.Series([], dtype="int64"),
            "next_orderkey": pd.Series([], dtype="int64"),
            "gap_days": pd.Series([], dtype="int64"),
        })
        if len(g) == 0:
            return empty
        ck = g["o_custkey"].to_numpy(np.int64)
        day = (g["_t"].to_numpy(dtype="datetime64[us]")
               .astype("datetime64[D]").astype(np.int64))
        keys = g["o_orderkey"].to_numpy(np.int64)
        order = np.lexsort((keys, day, ck))
        ck, day, keys = ck[order], day[order], keys[order]
        comp = (ck << np.int64(32)) | day
        lo = np.searchsorted(comp, comp, side="right")
        hi = np.searchsorted(comp, comp + days, side="right")
        cnt = hi - lo
        if not cnt.any():
            return empty
        firsts = np.repeat(np.arange(len(comp)), cnt)
        offsets = np.arange(int(cnt.sum())) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        nxts = np.repeat(lo, cnt) + offsets
        return pd.DataFrame({
            "o_custkey": ck[firsts],
            "first_orderkey": keys[firsts],
            "next_orderkey": keys[nxts],
            "gap_days": (day[nxts] - day[firsts]).astype(np.int64),
        })

    return (orders_ds.map_batches(tag, batch_format="pyarrow",
                                  batch_size=65536)
            .groupby("_bucket")
            .map_groups(pairs, batch_format="pandas"))


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                             year: int = 1996, form: str = "auto",
                             broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q5 shape — the six-table join: revenue of lineitems whose
    customer and supplier sit in the same nation of one region, for one
    order year.

    Scale decomposition (the canonical dimension/fact split):
    - region→nation (tiny, constant 25/5 rows) resolved on the driver;
    - customer and supplier are DIMENSION tables (fact/10 in TPC-H):
      GATED on ``broadcast_limit`` (combined row count). Small →
      custkey→nationkey / suppkey→nationkey ship once as sorted
      searchsorted arrays (``ray.put``), probed vectorized per batch;
      SF-scaled → native ``Dataset.join`` on each key so the driver
      never materializes either table. Both forms byte-equal
      (tests/test_analysis_scale.py);
    - orders filters map-side (year; plus customer-in-region semi-join
      via the broadcast arrays in the small form), emitting compact
      (o_orderkey, cust_nat);
    - lineitem ⋈ filtered-orders on orderkey is the big-big exchange —
      Ray's native hash join, both sides compact key+payload tables;
    - the same-nation predicate (c_nationkey == s_nationkey — Q5's
      defining constraint) applies per joined batch; per-batch partial
      sums (combiner) make the final groupby(nation) shuffle
      k-row-sized.
    DuckDB-oracle-gated (`q5_local_supplier_volume`).
    """
    import ray

    from .dedup import _join_parts

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    region_nats = nat[nat["n_regionkey"] == rkey]
    nat_names = dict(zip(region_nats["n_nationkey"],
                         region_nats["n_name"]))
    nat_arr = np.array(sorted(int(k) for k in nat_names), np.int64)

    def cfilt(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.filter(pa.array(np.isin(nk, nat_arr)))

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(cfilt, batch_format="pyarrow", batch_size=65536)
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if form == "auto":
        form = "broadcast" \
            if cust_ds.count() + supp_ds.count() <= broadcast_limit \
            else "join"

    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    if form == "broadcast":
        cust = cust_ds.to_pandas()
        supp = supp_ds.to_pandas()
        cref = ray.put(_sorted_probe_arrays(
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64)))
        sref = ray.put(_sorted_probe_arrays(
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64)))

        def ofilt(batch: pa.Table, cref=cref) -> pa.Table:
            sk, sv = ray.get(cref)
            dates = batch.column("o_orderdate") \
                .to_numpy(zero_copy_only=False)
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cnat = _probe_sorted(sk, sv, ck, -1)
            keep = (dates >= lo) & (dates < hi) & (cnat >= 0)
            return pa.table({
                "l_orderkey": batch.column("o_orderkey").filter(
                    pa.array(keep)),
                "cust_nat": pa.array(cnat[keep]),
            })

        ofiltered = orders.map_batches(ofilt, batch_format="pyarrow",
                                       batch_size=16384)
    else:
        def datefilt(batch: pa.Table) -> pa.Table:
            dates = batch.column("o_orderdate") \
                .to_numpy(zero_copy_only=False)
            t = batch.filter(pa.array((dates >= lo) & (dates < hi)))
            return t.select(["o_orderkey", "o_custkey"])

        ojoin = orders.map_batches(
            datefilt, batch_format="pyarrow", batch_size=16384,
        ).join(cust_ds, join_type="inner", on=("o_custkey",),
               right_on=("c_custkey",),
               num_partitions=_join_parts(orders, cust_ds))

        def oemit(batch: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": batch.column("o_orderkey"),
                "cust_nat": batch.column("c_nationkey").cast(pa.int64()),
            })

        ofiltered = ojoin.map_batches(oemit, batch_format="pyarrow")

    joined = li.join(ofiltered, join_type="inner", on=("l_orderkey",),
                     num_partitions=_join_parts(li, ofiltered))

    def _nation_partial(cnat: np.ndarray, snat: np.ndarray,
                        batch: pa.Table) -> pa.Table:
        keep = snat == cnat
        ep = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[keep]
        dc = batch.column("l_discount").to_numpy(
            zero_copy_only=False)[keep]
        df = pd.DataFrame({"nat": cnat[keep], "_rev": ep * (1.0 - dc)})
        g = df.groupby("nat", as_index=False)["_rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    if form == "broadcast":
        def partial(batch: pa.Table, sref=sref) -> pa.Table:
            sk, sv = ray.get(sref)
            suk = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            snat = _probe_sorted(sk, sv, suk, -2)
            cnat = batch.column("cust_nat") \
                .to_numpy(zero_copy_only=False)
            return _nation_partial(cnat, snat, batch)

        agg_in = joined.map_batches(partial, batch_format="pyarrow",
                                    batch_size=16384)
    else:
        sjoined = joined.join(supp_ds, join_type="inner",
                              on=("l_suppkey",), right_on=("s_suppkey",),
                              num_partitions=_join_parts(joined, supp_ds))

        def jpartial(batch: pa.Table) -> pa.Table:
            snat = batch.column("s_nationkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cnat = batch.column("cust_nat") \
                .to_numpy(zero_copy_only=False)
            return _nation_partial(cnat, snat, batch)

        agg_in = sjoined.map_batches(jpartial, batch_format="pyarrow",
                                     batch_size=16384)

    agg = agg_in.groupby("nat").aggregate(Sum("_rev",
                                              alias_name="revenue"))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": pa.array([nat_names[int(k)] for k in
                                batch.column("nat").to_pylist()],
                               pa.string()),
            "revenue": pa.array(_round2_snap(
                batch.column("revenue").to_numpy(zero_copy_only=False))),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def q10_returned_items(sf_dir: str, date_from: str = "1996-01-01",
                       months: int = 3, k: int = 20):
    """TPC-H Q10 shape — returned-item revenue per customer: lineitem
    (returnflag 'R') ⋈ date-windowed orders, grouped by customer,
    customer/nation names attached, top-k by revenue.

    Scale decomposition:
    - lineitem filters map-side to 'R' rows and pre-aggregates revenue
      per (batch, orderkey) — the combiner — so the join input carries
      compact (orderkey, partial_rev) rows, NO global lineitem groupby;
    - orders filters to the date window map-side, emitting
      (o_orderkey, o_custkey);
    - one big-big hash join on orderkey (partial_rev rows match their
      order row; revenue re-sums in the customer groupby, so joining
      partials instead of totals saves a whole shuffle);
    - groupby(custkey).sum with per-batch combiner;
    - top-k sorts the aggregated (custkey, revenue) table and takes k
      rows to the driver;
    - dimension attach happens AFTER top-k: the k-row side joins
      customer via a native hash join (never a driver broadcast of the
      SF-scaled customer table — no gate needed because the probe side
      is k rows by construction); nation (constant 25 rows) rides in
      the closure.
    DuckDB-oracle-gated (`q10_returned_items`).
    """
    from .dedup import _join_parts

    lo = np.datetime64(date_from)
    hi = (np.datetime64(date_from, "M") + months).astype("datetime64[D]")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(batch: pa.Table) -> pa.Table:
        dates = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((dates >= lo) & (dates < hi)))
        return pa.table({"l_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey")})

    ofiltered = orders.map_batches(ofilt, batch_format="pyarrow",
                                   batch_size=16384)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def lpartial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("l_returnflag"), "R")
        t = batch.filter(keep)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"l_orderkey": ok, "_rev": ep * (1.0 - dc)})
        g = df.groupby("l_orderkey", as_index=False)["_rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = li.map_batches(lpartial, batch_format="pyarrow",
                         batch_size=32768)
    joined = rev.join(ofiltered, join_type="inner", on=("l_orderkey",),
                      num_partitions=_join_parts(rev, ofiltered))

    def cpartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "_rev": batch.column("_rev").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("c_custkey", as_index=False)["_rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.sortagg import sorted_keyed_sum

    agg = sorted_keyed_sum(
        joined.map_batches(cpartial, batch_format="pyarrow",
                           batch_size=32768),
        "c_custkey", ["_rev"])

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "revenue": pa.array(_round2_snap(
                batch.column("_rev").to_numpy(zero_copy_only=False))),
        })

    topk = (agg.map_batches(rnd, batch_format="pyarrow")
            .sort(["revenue", "c_custkey"], descending=[True, False])
            .limit(k))

    # dimension attach on the k-row side: hash join against customer
    # (streams; the k rows broadcast inside the join), nation in-closure
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    names = {int(a): str(b) for a, b in
             zip(nation["n_nationkey"], nation["n_name"])}
    out = topk.join(cust, join_type="inner", on=("c_custkey",),
                    num_partitions=_join_parts(topk, cust))

    def fin(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_pylist()   # k rows
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "c_name": batch.column("c_name"),
            "n_name": pa.array([names[int(x)] for x in nk], pa.string()),
            "revenue": batch.column("revenue"),
        })

    return out.map_batches(fin, batch_format="pyarrow") \
        .sort(["revenue", "c_custkey"], descending=[True, False])


def events_user_moving_avg(sf_dir: str, window: int = 3):
    """Windowed moving average — AVG(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW): the
    frame-based window-function shape (LAG/LEAD cousins already covered
    by events_lag_gap).

    Scale shape: one groupby(user_id).map_groups — per-user event counts
    are bounded (the sessionization assumption this table already relies
    on), each group sorts once and computes the frame sum vectorized
    (oldest-first shifted adds, matching the oracle's in-frame summation
    order). DuckDB-oracle-gated."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def mavg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy(np.float64)
        p1 = np.concatenate(([0.0], v[:-1]))
        p2 = np.concatenate(([0.0, 0.0], v[:-2]))
        s = p2 + p1 + v                       # oldest-first, like the SQL
        n = np.minimum(np.arange(len(v)) + 1, window).astype(np.float64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "mavg": _round2_duck(s / n),
        })

    return ds.groupby("user_id").map_groups(mavg, batch_format="pandas")


def events_range_window(sf_dir: str, days: int = 7):
    """RANGE-frame window — SUM(value) / COUNT(*) OVER (PARTITION BY
    user_id ORDER BY ts RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND
    CURRENT ROW): the value-based frame shape (events_user_moving_avg
    covers ROWS frames). The frame is defined on the ORDER key's VALUE,
    so peers (equal ts) all share one frame — computed with two
    searchsorted passes over the sorted group, no per-row loop.

    Scale shape: one bounded groupby(user_id).map_groups like every
    window query here; prefix sums + vectorized frame bounds. DuckDB-
    oracle-gated (sums of 2-dp values round exactly at 2 dp)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    span_ns = np.int64(days) * 86_400_000_000_000

    def frame(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g["ts"].to_numpy("datetime64[ns]").astype(np.int64)
        v = g["value"].to_numpy(np.float64)
        lo = np.searchsorted(t, t - span_ns, side="left")
        hi = np.searchsorted(t, t, side="right")
        prefix = np.concatenate(([0.0], np.cumsum(v)))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "rcnt": (hi - lo).astype(np.int64),
            "rsum": _round2_duck(prefix[hi] - prefix[lo]),
        })

    return ds.groupby("user_id").map_groups(frame, batch_format="pandas")


def events_first_last(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over the full partition — per user
    ordered by (ts, event_id) with an UNBOUNDED PRECEDING..UNBOUNDED
    FOLLOWING frame (the default-frame LAST_VALUE trap is sidestepped by
    pinning the frame explicitly in both engines). ``drift`` = value -
    first_value, the session-drift shape.

    Same bounded-group map_groups scale shape as events_lag_gap."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def fl(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "first_val": np.full(len(v), v[0]),
            "last_val": np.full(len(v), v[-1]),
            "drift": _round2_duck(v - v[0]),
        })

    return ds.groupby("user_id").map_groups(fl, batch_format="pandas")


def events_rolling_minmax(sf_dir: str, window: int = 4):
    """Rolling MIN / MAX — MIN(value)/MAX(value) OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW): the order-statistic frame shape (moving_avg covers the
    additive frame; min/max need a window kernel, not a prefix sum).

    Scale shape: the same bounded groupby(user_id).map_groups as every
    window query here; the frame extrema come from ONE vectorized
    sliding_window_view reduction over the padded value array (no
    per-row loop, no O(n·w) Python). DuckDB-oracle-gated."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    w = int(window)

    def mm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy(np.float64)
        sw = np.lib.stride_tricks.sliding_window_view
        lo = sw(np.concatenate((np.full(w - 1, np.inf), v)), w).min(axis=1)
        hi = sw(np.concatenate((np.full(w - 1, -np.inf), v)), w).max(axis=1)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "rmin": lo,
            "rmax": hi,
        })

    return ds.groupby("user_id").map_groups(mm, batch_format="pandas")


def _pnum_prepare(ds, sort_cols: list, descending: list,
                  part_col: str, unique_col: str):
    """Distributed partitioned-ROW_NUMBER machinery (shared by
    orders_row_number and corpus.shuffle_shards): one global sort, then
    pass 1 reduces each BLOCK to per-partition row counts (blocks keyed
    by their first row's unique column, ordered by their first row's
    sort tuple), and the driver cumsums per-partition block bases.
    Returns (sorted materialized Dataset, bases {first_unique: {part:
    base}}, totals {part: n}). ``descending=True`` is supported for
    NUMERIC sort columns only (driver ordering negates them).
    ``part_col`` must be ``sort_cols[0]``."""
    assert part_col == sort_cols[0]
    sorted_ds = ds.sort(sort_cols, descending=descending).materialize()

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "firsts": pa.array([], pa.string()),
                             "pr": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        import json as _json

        pr = batch.column(part_col).to_pylist()
        vals, counts = np.unique(np.asarray(pr, dtype=object),
                                 return_counts=True)
        firsts = _json.dumps([batch.column(c)[0].as_py()
                              for c in sort_cols])
        k = int(batch.column(unique_col)[0].as_py())
        m = len(vals)
        return pa.table({
            "first_key": pa.array([k] * m, pa.int64()),
            "firsts": pa.array([firsts] * m, pa.string()),
            "pr": pa.array([str(v) for v in vals], pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        })

    import json as _json

    parts = list(sorted_ds.map_batches(block_partial,
                                       batch_format="pyarrow",
                                       batch_size=None).iter_rows())

    def _order_key(firsts_json: str):
        vals = _json.loads(firsts_json)
        return tuple(-v if d else v
                     for v, d in zip(vals, descending))

    block_order = sorted(
        {(_order_key(r["firsts"]), r["first_key"]): r["first_key"]
         for r in parts}.items())
    by_block: dict[int, dict] = {}
    for r in parts:
        by_block.setdefault(int(r["first_key"]), {})[r["pr"]] = int(r["n"])
    bases: dict[int, dict] = {}
    running: dict[str, int] = {}
    for _, fk in block_order:
        bases[fk] = dict(running)
        for p, n in by_block[fk].items():
            running[p] = running.get(p, 0) + n
    return sorted_ds, bases, dict(running)


def _pnum_rn(batch: pa.Table, part_col: str, unique_col: str,
             bases: dict) -> tuple[np.ndarray, np.ndarray]:
    """Pass-2 kernel: exact 1-based global row numbers for one sorted
    block + the block's partition labels (object array). Partitions are
    contiguous runs inside a sorted block, so each run start looks up its
    block base once and positions within the run are an arange."""
    base = bases[int(batch.column(unique_col)[0].as_py())]
    pr = np.asarray([str(v) for v in batch.column(part_col).to_pylist()],
                    dtype=object)
    change = np.flatnonzero(np.concatenate(([True], pr[1:] != pr[:-1])))
    run_id = np.cumsum(np.concatenate(
        ([0], (pr[1:] != pr[:-1]).astype(np.int64))))
    idx_in_run = np.arange(len(pr)) - change[run_id]
    run_base = np.array([base.get(pr[i], 0) for i in change], np.int64)
    return run_base[run_id] + idx_in_run + 1, pr


def orders_row_number(sf_dir: str, ntiles: int = 4):
    """Distributed ROW_NUMBER + NTILE over partitions — the exact
    numbering window shape, WITHOUT single-task partitions (a 5-value
    partition key is the map_groups worst case: each "group" would be
    n/5 of the table in one task).

    Scale shape (sort + block-offset prefix scan, the pack_sequences
    pattern — machinery in ``_pnum_prepare``/``_pnum_rn``): one global
    sort by (partition, value DESC, key) — the operator's inherent
    exchange — then two passes assign exact global row numbers with one
    tiny partial row per (block, partition) on the driver. NTILE uses
    the law: the first n%k tiles carry floor(n/k)+1 rows. Integer-exact,
    no second shuffle; DuckDB-oracle-gated (`orders_row_number`)."""
    import ray

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    sorted_ds, bases, totals = _pnum_prepare(
        ds, ["o_orderpriority", "o_totalprice", "o_orderkey"],
        [False, True, False], "o_orderpriority", "o_orderkey")
    bref = ray.put((bases, totals))

    def assign(batch: pa.Table, bref=bref, k=ntiles) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_orderpriority": pa.array([], pa.string()),
                             "rn": pa.array([], pa.int64()),
                             "tile": pa.array([], pa.int64())})
        bases, totals = _ray.get(bref)
        rn, pr = _pnum_rn(batch, "o_orderpriority", "o_orderkey", bases)
        n_part = np.array([totals[p] for p in pr], np.int64)
        size_small = n_part // k
        n_big = n_part % k
        big_span = n_big * (size_small + 1)
        in_big = rn <= big_span
        tile = np.where(
            in_big,
            (rn - 1) // np.maximum(size_small + 1, 1) + 1,
            n_big + (rn - 1 - big_span) // np.maximum(size_small, 1) + 1,
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "rn": pa.array(rn),
            "tile": pa.array(tile),
        })

    return sorted_ds.map_batches(assign, batch_format="pyarrow",
                                 batch_size=None)


# ---------------------------------------------------------------------------
# r5: remaining classic relational shapes (TPC-H Q4/Q6/Q14/Q18/Q19 adapted
# to this schema — no l_commitdate/l_shipmode/p_container columns exist, so
# the predicates use the available columns; every oracle is exact DuckDB)
# ---------------------------------------------------------------------------


def q6_forecast_revenue(sf_dir: str, date_from: str = "1996-01-01",
                        date_to: str = "1997-01-01",
                        disc_lo: float = 0.04, disc_hi: float = 0.06,
                        max_qty: float = 24.0):
    """TPC-H Q6 shape — pure scan→filter→global-sum, the cheapest wide
    query there is: per-batch vectorized predicate + ONE partial row per
    batch, so the "shuffle" is blocks×1 rows into a single Sum."""
    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])
    lo, hi = np.datetime64(date_from), np.datetime64(date_to)

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        keep = ((ship >= lo) & (ship < hi) & (dc >= disc_lo)
                & (dc <= disc_hi) & (qty < max_qty))
        return pa.table({"_rev": pa.array(
            [float((ep[keep] * dc[keep]).sum())], pa.float64())})

    total = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536) \
        .aggregate(Sum("_rev", alias_name="revenue"))
    return pa.table({"revenue": pa.array(
        _round2_snap([total["revenue"] or 0.0]), pa.float64())})


def q4_order_priority(sf_dir: str, date_from: str = "1996-01-01",
                      date_to: str = "1996-07-01", late_days: int = 90):
    """TPC-H Q4 shape (adapted: the reference schema has no
    l_commitdate/l_receiptdate, so "late" = shipped more than
    ``late_days`` after the order date): orders in a window having at
    least one late line, counted per priority.

    Scale shape: the correlated EXISTS(l_shipdate > o_orderdate + N) is
    rewritten as max(l_shipdate) > o_orderdate + N, so the semi-join
    becomes a combiner-fed groupby-max over lineitem (one partial row
    per key per batch) followed by an orderkey-partitioned hash join
    against the date-pruned orders — both sides stream, nothing
    broadcasts (orders is fact-scaled)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def lpartial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view("int64")
        df = pd.DataFrame({"l_orderkey": ok, "_maxship": ship})
        g = df.groupby("l_orderkey", as_index=False)["_maxship"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.sortagg import sorted_keyed_sum

    maxship = sorted_keyed_sum(
        li.map_batches(lpartial, batch_format="pyarrow",
                       batch_size=65536),
        "l_orderkey", ["_maxship"], how="max")

    lo, hi = np.datetime64(date_from), np.datetime64(date_to)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def ofilt(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((d >= lo) & (d < hi)))

    owin = orders.map_batches(ofilt, batch_format="pyarrow",
                              batch_size=65536)
    joined = owin.join(maxship, join_type="inner", on=("o_orderkey",),
                       right_on=("l_orderkey",),
                       num_partitions=_join_ray_parts(owin, maxship))
    late_us = np.timedelta64(late_days, "D").astype("timedelta64[us]") \
        .astype(np.int64)

    def late(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "_n": pa.array([], pa.int64())})
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view("int64")
        m = batch.column("_maxship").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(m > d + late_us))
        # combiner: ≤5 priority rows per batch into the final groupby
        df = pd.DataFrame(
            {"o_orderpriority": t.column("o_orderpriority").to_pandas()})
        g = df.groupby("o_orderpriority", as_index=False).size() \
            .rename(columns={"size": "_n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return joined.map_batches(late, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("o_orderpriority") \
        .aggregate(Sum("_n", alias_name="order_count")) \
        .sort("o_orderpriority")


def q14_promo_revenue(sf_dir: str, promo_type: str = "PROMO",
                      date_from: str = "1996-03-01",
                      date_to: str = "1996-04-01", form: str = "auto",
                      broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q14 shape — promo revenue share for one month: a CASE
    aggregation over lineitem⋈part reduced to a single ratio row.

    Part is a dimension table, so the lookup is GATED on
    ``broadcast_limit``: small → a partkey→is-promo int8 flag ships once
    as sorted searchsorted arrays; SF-scaled → native Dataset.join. Both
    forms emit ONE (promo, total) partial row per batch."""
    import ray

    from .dedup import _join_parts

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    if form == "auto":
        form = "broadcast" if part_ds.count() <= broadcast_limit \
            else "join"
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"])
    lo, hi = np.datetime64(date_from), np.datetime64(date_to)

    def _partial(is_promo: np.ndarray, rev: np.ndarray) -> pa.Table:
        return pa.table({
            "_promo": pa.array([float(rev[is_promo].sum())], pa.float64()),
            "_total": pa.array([float(rev.sum())], pa.float64()),
        })

    if form == "broadcast":
        part = part_ds.to_pandas()
        ref = ray.put(_sorted_probe_arrays(
            part["p_partkey"].to_numpy(np.int64),
            (part["p_type"] == promo_type).to_numpy().astype(np.int8)))

        def probe(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            ship = batch.column("l_shipdate") \
                .to_numpy(zero_copy_only=False)
            t = batch.filter(pa.array((ship >= lo) & (ship < hi)))
            ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            dc = t.column("l_discount").to_numpy(zero_copy_only=False)
            keys = t.column("l_partkey").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            flag = _probe_sorted(sk, sv, keys, 0).astype(bool)
            return _partial(flag, ep * (1.0 - dc))

        partials = li.map_batches(probe, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        def datefilt(batch: pa.Table) -> pa.Table:
            ship = batch.column("l_shipdate") \
                .to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((ship >= lo) & (ship < hi)))

        joined = li.map_batches(datefilt, batch_format="pyarrow",
                                batch_size=65536) \
            .join(part_ds, join_type="inner", on=("l_partkey",),
                  right_on=("p_partkey",),
                  num_partitions=_join_parts(li, part_ds))

        def jpartial(batch: pa.Table) -> pa.Table:
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            flag = pc.equal(batch.column("p_type"),
                            pa.scalar(promo_type)) \
                .to_numpy(zero_copy_only=False).astype(bool)
            return _partial(flag, ep * (1.0 - dc))

        partials = joined.map_batches(jpartial, batch_format="pyarrow",
                                      batch_size=65536)

    tot = partials.aggregate(Sum("_promo", alias_name="promo"),
                             Sum("_total", alias_name="total"))
    total = tot["total"] or 0.0
    share = 100.0 * (tot["promo"] or 0.0) / total if total else 0.0
    # DuckDB ROUND(x, 4): half away from zero (the _round2_duck law at
    # 4 dp — ratios can land on midpoints)
    share = float(np.copysign(np.floor(abs(share) * 1e4 + 0.5),
                              share) / 1e4)
    return pa.table({"promo_share": pa.array([share], pa.float64())})


def q18_large_volume_customers(sf_dir: str, min_qty: float = 200.0,
                               k: int = 100):
    """TPC-H Q18 shape — large-volume orders: groupby-HAVING over the
    fact table, joined back to orders + customer, top-k by price.

    Scale shape: lineitem quantity sums go through the per-batch
    combiner → groupby(orderkey) → map-side HAVING filter (the groupby
    output is already compact); the surviving keys hash-join orders
    (big-big, orderkey-partitioned); the customer NAME attaches AFTER
    top-k via a k-row join (the q10/top_customer_revenue pattern)."""
    from .dedup import _join_parts

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def lpartial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"l_orderkey": ok, "_qty": qty})
        g = df.groupby("l_orderkey", as_index=False)["_qty"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.sortagg import sorted_keyed_sum

    sums = sorted_keyed_sum(
        li.map_batches(lpartial, batch_format="pyarrow",
                       batch_size=65536),
        "l_orderkey", ["_qty"]).rename_columns({"_qty": "sum_qty"})
    big = sums.filter(expr=f"sum_qty > {min_qty}")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])
    joined = orders.join(big, join_type="inner", on=("o_orderkey",),
                         right_on=("l_orderkey",),
                         num_partitions=_join_ray_parts(orders, big))
    topk = joined.sort(["o_totalprice", "o_orderkey"],
                       descending=[True, False]).limit(k)

    def rekey(batch: pa.Table) -> pa.Table:
        # align the join key name with the k-row customer join
        return batch.select(["o_custkey", "o_orderkey", "o_orderdate",
                             "o_totalprice", "sum_qty"]) \
            .rename_columns(["c_custkey", "o_orderkey", "o_orderdate",
                             "o_totalprice", "sum_qty"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    named = topk.map_batches(rekey, batch_format="pyarrow") \
        .join(cust, join_type="inner", on=("c_custkey",),
              num_partitions=_join_parts(topk, cust))

    def order_cols(batch: pa.Table) -> pa.Table:
        return batch.select(["c_name", "c_custkey", "o_orderkey",
                             "o_orderdate", "o_totalprice", "sum_qty"])

    return named.map_batches(order_cols, batch_format="pyarrow") \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])


def q19_brand_bands_revenue(sf_dir: str, form: str = "auto",
                            broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q19 shape (adapted: no p_container/l_shipmode columns) —
    revenue under a DISJUNCTION of brand × size × quantity bands, the
    multi-predicate join-filter every relational engine special-cases.

    Part is gated on ``broadcast_limit``: small → one packed int16 per
    partkey (band-code × 1024 + p_size) ships as sorted searchsorted
    arrays; SF-scaled → native Dataset.join with the same vectorized
    predicate on the joined columns. One partial row per batch."""
    import ray

    from .dedup import _join_parts

    # (brand, max_size, qty_lo, qty_hi); size is BETWEEN 1 AND max_size
    bands = [("Brand#12", 15, 1.0, 20.0),
             ("Brand#23", 25, 10.0, 30.0),
             ("Brand#3", 35, 20.0, 40.0)]
    max_size = np.array([b[1] for b in bands], np.int64)
    qty_lo = np.array([b[2] for b in bands], np.float64)
    qty_hi = np.array([b[3] for b in bands], np.float64)

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    if form == "auto":
        form = "broadcast" if part_ds.count() <= broadcast_limit \
            else "join"
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    def _keep(code: np.ndarray, size: np.ndarray,
              qty: np.ndarray) -> np.ndarray:
        hit = code >= 0
        c = np.maximum(code, 0)
        return (hit & (size >= 1) & (size <= max_size[c])
                & (qty >= qty_lo[c]) & (qty <= qty_hi[c]))

    def _partial(keep: np.ndarray, ep: np.ndarray,
                 dc: np.ndarray) -> pa.Table:
        rev = float((ep[keep] * (1.0 - dc[keep])).sum())
        return pa.table({
            "_rev": pa.array([rev], pa.float64()),
            "_n": pa.array([int(keep.sum())], pa.int64()),
        })

    if form == "broadcast":
        part = part_ds.to_pandas()
        brand_code = np.full(len(part), -1, np.int64)
        for i, (brand, *_rest) in enumerate(bands):
            brand_code[part["p_brand"].to_numpy() == brand] = i
        packed = np.where(
            brand_code >= 0,
            brand_code * 1024 + part["p_size"].to_numpy(np.int64), -1)
        ref = ray.put(_sorted_probe_arrays(
            part["p_partkey"].to_numpy(np.int64), packed))

        def probe(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            keys = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            packed = _probe_sorted(sk, sv, keys, -1)
            code = np.where(packed >= 0, packed // 1024, -1)
            size = np.where(packed >= 0, packed % 1024, 0)
            qty = batch.column("l_quantity") \
                .to_numpy(zero_copy_only=False)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            return _partial(_keep(code, size, qty), ep, dc)

        partials = li.map_batches(probe, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        joined = li.join(part_ds, join_type="inner", on=("l_partkey",),
                         right_on=("p_partkey",),
                         num_partitions=_join_parts(li, part_ds))
        brand_names = np.array([b[0] for b in bands], dtype=object)

        def jpartial(batch: pa.Table) -> pa.Table:
            brands = batch.column("p_brand").to_pandas().to_numpy()
            code = np.full(len(brands), -1, np.int64)
            for i, name in enumerate(brand_names):
                code[brands == name] = i
            size = batch.column("p_size").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            qty = batch.column("l_quantity") \
                .to_numpy(zero_copy_only=False)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            return _partial(_keep(code, size, qty), ep, dc)

        partials = joined.map_batches(jpartial, batch_format="pyarrow",
                                      batch_size=65536)

    tot = partials.aggregate(Sum("_rev", alias_name="revenue"),
                             Sum("_n", alias_name="n_lines"))
    return pa.table({
        "revenue": pa.array(_round2_snap([tot["revenue"] or 0.0]),
                            pa.float64()),
        "n_lines": pa.array([int(tot["n_lines"] or 0)], pa.int64()),
    })


def lineitem_rank_stats(sf_dir: str, max_domain: int = 100_000):
    """RANK / DENSE_RANK / PERCENT_RANK per l_returnflag ordered by
    l_quantity DESC — the remaining ranking-window shapes.

    Scale shape (histogram-rank, the grouped_median pattern): for a
    tie-heavy BOUNDED value domain the (partition, value) histogram IS
    the entire window state, so there is no global sort at all — a
    combiner-fed groupby builds the histogram, the driver turns its
    ≤``max_domain`` rows into rank maps (guarded loud, like
    grouped_median's max_keys), the maps broadcast via ``ray.put`` once,
    and a stateless map assigns per-row values with one searchsorted
    probe. PERCENT_RANK is (rank-1)/(n_part-1) on exact ints — the same
    two ints DuckDB divides, so the doubles are bit-identical with no
    rounding step."""
    import ray

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag",
                "l_quantity"])

    def hist(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "f": batch.column("l_returnflag").to_pandas(),
            "q": batch.column("l_quantity")
                 .to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["f", "q"], as_index=False).size() \
            .rename(columns={"size": "_n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cdf = li.map_batches(hist, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby(["f", "q"]).aggregate(Sum("_n", alias_name="_n")) \
        .to_pandas()
    if len(cdf) > max_domain:
        raise ValueError(
            f"lineitem_rank_stats: (partition, value) domain "
            f"{len(cdf)} exceeds max_domain={max_domain} — the "
            f"histogram-rank form needs a bounded value domain; use the "
            f"sort + prefix-scan form (orders_row_number) instead")

    vocab = sorted(cdf["f"].unique().tolist())
    keys, rnk_v, drnk_v, prnk_v = [], [], [], []
    for code, flag in enumerate(vocab):
        part = cdf[cdf["f"] == flag].sort_values("q", ascending=False)
        cnts = part["_n"].to_numpy(np.int64)
        n_part = int(cnts.sum())
        # rank of each distinct value = 1 + rows strictly above it
        above = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        rnk = above + 1
        drnk = np.arange(1, len(cnts) + 1, dtype=np.int64)
        den = max(n_part - 1, 1)
        prnk = (rnk - 1).astype(np.float64) / float(den)
        qint = part["q"].to_numpy(np.float64).astype(np.int64)
        keys.append(code * (1 << 20) + qint)
        rnk_v.append(rnk)
        drnk_v.append(drnk)
        prnk_v.append(prnk)
    skeys = np.concatenate(keys)
    order = np.argsort(skeys)
    ref = ray.put((skeys[order],
                   np.concatenate(rnk_v)[order],
                   np.concatenate(drnk_v)[order],
                   np.concatenate(prnk_v)[order]))
    vocab_arr = np.array(vocab, dtype=object)

    def assign(batch: pa.Table, ref=ref, vocab=vocab_arr) -> pa.Table:
        import ray as _ray

        sk, rnk, drnk, prnk = _ray.get(ref)
        flags = batch.column("l_returnflag").to_pandas().to_numpy()
        code = np.zeros(len(flags), np.int64)
        for i, name in enumerate(vocab):
            code[flags == name] = i
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        key = code * (1 << 20) + qty.astype(np.int64)
        idx = np.searchsorted(sk, key)  # every key exists by construction
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_linenumber": batch.column("l_linenumber"),
            "l_returnflag": batch.column("l_returnflag"),
            "l_quantity": batch.column("l_quantity"),
            "rnk": pa.array(rnk[idx]),
            "drnk": pa.array(drnk[idx]),
            "prnk": pa.array(prnk[idx]),
        })

    return li.map_batches(assign, batch_format="pyarrow",
                          batch_size=65536)


def revenue_cube(sf_dir: str, form: str = "auto",
                 broadcast_limit: int = BROADCAST_LIMIT):
    """CUBE(nation, year): the ROLLUP levels (``revenue_rollup``) PLUS
    per-year subtotals — all four grouping sets from ONE leaf pass.

    Scale shape identical to revenue_rollup: the only big-data pass is
    the shared gated leaf aggregation; all three subtotal levels
    re-aggregate the nations×years leaf rows driver-side, exactly like
    SQL's CUBE re-aggregation. Sums stay unrounded until the final
    union so every subtotal equals the sum of its leaves bit-for-bit."""
    df = _nation_year_leaf(sf_dir, form=form,
                           broadcast_limit=broadcast_limit).to_pandas() \
        .rename(columns={"n_name": "nation"})
    df["order_year"] = df["order_year"].astype("int64").astype(str)
    df = df[["nation", "order_year", "_rev", "_n"]]
    by_nation = df.groupby("nation", as_index=False) \
        .agg(_rev=("_rev", "sum"), _n=("_n", "sum"))
    by_nation["order_year"] = "ALL"
    by_year = df.groupby("order_year", as_index=False) \
        .agg(_rev=("_rev", "sum"), _n=("_n", "sum"))
    by_year["nation"] = "ALL"
    total = pd.DataFrame({
        "nation": ["ALL"], "order_year": ["ALL"],
        "_rev": [df["_rev"].sum()], "_n": [df["_n"].sum()],
    })
    out = pd.concat([df, by_nation[df.columns], by_year[df.columns],
                     total[df.columns]], ignore_index=True)
    out["revenue"] = _round2_snap(out["_rev"].to_numpy())
    out["n_orders"] = out["_n"].astype("int64")
    return pa.Table.from_pandas(
        out[["nation", "order_year", "revenue", "n_orders"]],
        preserve_index=False)


def q7_nation_volume(sf_dir: str, nation_a: str = "NATION_18",
                     nation_b: str = "NATION_19",
                     date_from: str = "1995-01-01",
                     date_to: str = "1997-01-01", form: str = "auto",
                     broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q7 shape — volume shipped between two nations (both
    directions), grouped by (supp_nation, cust_nation, ship year).

    Scale decomposition (the q5 split, different predicate): nation is
    resolved to two int keys on the driver (constant 25 rows); customer
    and supplier are PRE-FILTERED to those two nations map-side and
    then GATED on ``broadcast_limit`` — small → custkey/suppkey →
    nationkey sorted searchsorted arrays ship once; SF-scaled → native
    ``Dataset.join`` on each key. lineitem ⋈ filtered-orders on
    orderkey is the one big-big exchange; the cross-nation predicate
    (supp_nat != cust_nat after both sides are in {a, b}) applies per
    joined batch, and a per-batch combiner keyed by (supp, cust, year)
    leaves ≤ 2×years rows per batch for the final groupby."""
    import ray

    from .dedup import _join_parts

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    keys = {}
    for name in (nation_a, nation_b):
        hit = nat.loc[nat["n_name"] == name, "n_nationkey"]
        if hit.empty:
            raise ValueError(f"q7_nation_volume: unknown nation {name!r}")
        keys[name] = int(hit.iloc[0])
    names = {v: k for k, v in keys.items()}
    pair = np.array(sorted(names), np.int64)

    def _natfilt(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            nk = batch.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return batch.filter(pa.array(np.isin(nk, pair)))
        return fn

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(_natfilt("c_nationkey"), batch_format="pyarrow",
                     batch_size=65536)
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(_natfilt("s_nationkey"), batch_format="pyarrow",
                     batch_size=65536)
    if form == "auto":
        form = "broadcast" \
            if cust_ds.count() + supp_ds.count() <= broadcast_limit \
            else "join"

    lo, hi = np.datetime64(date_from), np.datetime64(date_to)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def _li_emit(batch: pa.Table, snat: np.ndarray) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (ship >= lo) & (ship < hi) & (snat >= 0)
        ep = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)[keep]
        dc = batch.column("l_discount") \
            .to_numpy(zero_copy_only=False)[keep]
        yr = ship[keep].astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").filter(
                pa.array(keep)),
            "supp_nat": pa.array(snat[keep]),
            "l_year": pa.array(yr),
            "_vol": pa.array(ep * (1.0 - dc)),
        })

    if form == "broadcast":
        cust = cust_ds.to_pandas()
        supp = supp_ds.to_pandas()
        cref = ray.put(_sorted_probe_arrays(
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64)))
        sref = ray.put(_sorted_probe_arrays(
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64)))

        def oemit(batch: pa.Table, cref=cref) -> pa.Table:
            sk, sv = ray.get(cref)
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cnat = _probe_sorted(sk, sv, ck, -1)
            keep = cnat >= 0
            return pa.table({
                "l_orderkey": batch.column("o_orderkey").filter(
                    pa.array(keep)),
                "cust_nat": pa.array(cnat[keep]),
            })

        ofiltered = orders.map_batches(oemit, batch_format="pyarrow",
                                       batch_size=65536)

        def lemit(batch: pa.Table, sref=sref) -> pa.Table:
            sk, sv = ray.get(sref)
            suk = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _li_emit(batch, _probe_sorted(sk, sv, suk, -1))

        lfiltered = li.map_batches(lemit, batch_format="pyarrow",
                                   batch_size=65536)
    else:
        ojoin = orders.join(cust_ds, join_type="inner",
                            on=("o_custkey",), right_on=("c_custkey",),
                            num_partitions=_join_parts(orders, cust_ds))

        def oemit2(batch: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": batch.column("o_orderkey"),
                "cust_nat": batch.column("c_nationkey").cast(pa.int64()),
            })

        ofiltered = ojoin.map_batches(oemit2, batch_format="pyarrow")
        ljoin = li.join(supp_ds, join_type="inner", on=("l_suppkey",),
                        right_on=("s_suppkey",),
                        num_partitions=_join_parts(li, supp_ds))

        def lemit2(batch: pa.Table) -> pa.Table:
            snat = batch.column("s_nationkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _li_emit(batch, snat)

        lfiltered = ljoin.map_batches(lemit2, batch_format="pyarrow",
                                      batch_size=65536)

    joined = lfiltered.join(
        ofiltered, join_type="inner", on=("l_orderkey",),
        num_partitions=_join_parts(lfiltered, ofiltered))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"supp_nat": pa.array([], pa.int64()),
                             "cust_nat": pa.array([], pa.int64()),
                             "l_year": pa.array([], pa.int64()),
                             "_vol": pa.array([], pa.float64())})
        snat = batch.column("supp_nat").to_numpy(zero_copy_only=False)
        cnat = batch.column("cust_nat").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(snat != cnat))
        df = pd.DataFrame({
            "supp_nat": t.column("supp_nat")
                .to_numpy(zero_copy_only=False),
            "cust_nat": t.column("cust_nat")
                .to_numpy(zero_copy_only=False),
            "l_year": t.column("l_year").to_numpy(zero_copy_only=False),
            "_vol": t.column("_vol").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["supp_nat", "cust_nat", "l_year"],
                       as_index=False)["_vol"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby(["supp_nat", "cust_nat", "l_year"]) \
        .aggregate(Sum("_vol", alias_name="_vol")).to_pandas()
    out["supp_nation"] = out["supp_nat"].map(names)
    out["cust_nation"] = out["cust_nat"].map(names)
    out["revenue"] = _round2_snap(out["_vol"].to_numpy())
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"])
    return pa.Table.from_pandas(
        out[["supp_nation", "cust_nation", "l_year", "revenue"]],
        preserve_index=False)


def q13_customer_distribution(sf_dir: str,
                              exclude_priority: str = "1-URGENT"):
    """TPC-H Q13 shape (adapted: the schema has no o_comment, so the
    NOT LIKE comment filter becomes an order-priority exclusion) —
    distribution of customers by order count, INCLUDING the
    zero-order customers the left join exists for.

    Scale shape: per-custkey counts go combiner → groupby(custkey) →
    customer LEFT OUTER join counts (big-big, custkey-partitioned;
    nulls are the zero-order customers); the c_count histogram is a
    per-batch combiner (≤ distinct-count rows per batch) into a tiny
    final groupby."""
    from .dedup import _join_parts

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def opartial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(pc.equal(
            batch.column("o_orderpriority"),
            pa.scalar(exclude_priority))))
        df = pd.DataFrame({
            "o_custkey": t.column("o_custkey")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby("o_custkey", as_index=False).size() \
            .rename(columns={"size": "_n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.sortagg import sorted_keyed_sum

    counts = sorted_keyed_sum(
        orders.map_batches(opartial, batch_format="pyarrow",
                           batch_size=65536),
        "o_custkey", ["_n"])

    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = cust.join(counts, join_type="left_outer",
                       on=("c_custkey",), right_on=("o_custkey",),
                       num_partitions=_join_parts(cust, counts))

    def hpartial(batch: pa.Table) -> pa.Table:
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        n = np.nan_to_num(n.astype(np.float64), nan=0.0) \
            .astype(np.int64)
        df = pd.DataFrame({"c_count": n})
        g = df.groupby("c_count", as_index=False).size() \
            .rename(columns={"size": "_d"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return joined.map_batches(hpartial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("c_count").aggregate(Sum("_d", alias_name="custdist")) \
        .sort(["custdist", "c_count"], descending=[True, True])


def q15_top_supplier(sf_dir: str, date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01"):
    """TPC-H Q15 shape — the supplier(s) with maximum revenue over one
    quarter, ties preserved (the view + scalar-subquery-max pattern).

    Scale shape: per-supplier revenue is a combiner-fed
    groupby(suppkey) (dimension-sized output, SF×10k rows); the max is
    ONE ``aggregate(Max)`` over that compact table; the equality filter
    keeps the ≤ handful of winners and the supplier NAME attaches via a
    k-row join — lineitem itself is scanned exactly once."""
    from .dedup import _join_parts

    lo, hi = np.datetime64(date_from), np.datetime64(date_to)
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def lpartial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((ship >= lo) & (ship < hi)))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_suppkey": t.column("l_suppkey")
                .to_numpy(zero_copy_only=False),
            "_rev": ep * (1.0 - dc)})
        g = df.groupby("l_suppkey", as_index=False)["_rev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = li.map_batches(lpartial, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("l_suppkey") \
        .aggregate(Sum("_rev", alias_name="total_revenue"))
    mx = rev.aggregate(Max("total_revenue", alias_name="mx"))["mx"]
    top = rev.filter(expr=f"total_revenue >= {float(mx)!r}")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    # ONE join partition: the winner set is a handful of rows by
    # construction, and Ray 2.49's hash-shuffle join crashes when a
    # partition receives no left shards at all (empty ArrowBlockBuilder
    # -> schema-less table -> acero "no match for FieldRef"), which a
    # tiny multi-block left with empty blocks reliably triggers.
    named = top.join(supp, join_type="inner", on=("l_suppkey",),
                     right_on=("s_suppkey",),
                     num_partitions=1).to_pandas()
    named["s_suppkey"] = named["l_suppkey"]
    named["total_revenue"] = _round2_snap(
        named["total_revenue"].to_numpy())
    named = named.sort_values("s_suppkey")
    return pa.Table.from_pandas(
        named[["s_suppkey", "s_name", "total_revenue"]],
        preserve_index=False)


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#1",
                               max_size: int = 20, frac: float = 0.5,
                               years: float = 7.0, form: str = "auto",
                               broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q17 shape (adapted: no p_container, so the part slice is
    brand + size band; the classic 0.2 factor is 0.5 here so the toy
    SF keeps rows) — revenue lost to small-quantity orders: lineitems
    below ``frac``×(per-part average quantity), annualized.

    Scale shape: the part slice (brand+size) is ~1/25 of part and
    GATED on ``broadcast_limit`` — small → eligible partkeys ship once
    and prune lineitem map-side; SF-scaled → an inner join against the
    sliced part table does the semi-join. The per-part avg is a
    combiner-fed groupby over the PRUNED lineitem (sum+count partials),
    and the correlated threshold comes back as a second gated lookup —
    broadcast probe when small, partkey-partitioned join otherwise.
    One (sum) partial row per batch ends the pipeline."""
    import ray

    from .dedup import _join_parts

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def pslice(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch.column("p_brand"),
                                pa.scalar(brand)),
                       pc.less_equal(batch.column("p_size"),
                                     pa.scalar(max_size)))
        return batch.filter(keep).select(["p_partkey"])

    eligible = part_ds.map_batches(pslice, batch_format="pyarrow",
                                   batch_size=65536)
    if form == "auto":
        form = "broadcast" if eligible.count() <= broadcast_limit \
            else "join"

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    if form == "broadcast":
        keys = np.sort(eligible.to_pandas()["p_partkey"]
                       .to_numpy(np.int64))
        kref = ray.put(keys)

        def prune(batch: pa.Table, kref=kref) -> pa.Table:
            ks = ray.get(kref)
            pk = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(ks, pk)
            idx[idx >= len(ks)] = 0
            keep = len(ks) > 0 and ks[idx] == pk
            if isinstance(keep, bool):  # empty eligible set
                keep = np.zeros(len(pk), bool)
            return batch.filter(pa.array(keep))

        pruned = li.map_batches(prune, batch_format="pyarrow",
                                batch_size=65536)
    else:
        pruned = li.join(eligible, join_type="inner",
                         on=("l_partkey",), right_on=("p_partkey",),
                         num_partitions=_join_parts(li, eligible)) \
            .select_columns(["l_partkey", "l_quantity",
                             "l_extendedprice"])

    def apartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": batch.column("l_partkey")
                .to_numpy(zero_copy_only=False),
            "_s": batch.column("l_quantity")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby("l_partkey", as_index=False) \
            .agg(_s=("_s", "sum"), _c=("_s", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = pruned.map_batches(apartial, batch_format="pyarrow",
                               batch_size=65536) \
        .groupby("l_partkey").aggregate(Sum("_s", alias_name="_s"),
                                        Sum("_c", alias_name="_c"))

    def spartial(qty: np.ndarray, ep: np.ndarray,
                 thresh: np.ndarray) -> pa.Table:
        keep = qty < thresh
        return pa.table({"_rev": pa.array(
            [float(ep[keep].sum())], pa.float64())})

    if form == "broadcast":
        st = stats.to_pandas()
        tref = ray.put(_sorted_probe_arrays(
            st["l_partkey"].to_numpy(np.int64),
            frac * st["_s"].to_numpy(np.float64)
            / st["_c"].to_numpy(np.float64)))

        def probe(batch: pa.Table, tref=tref) -> pa.Table:
            sk, sv = ray.get(tref)
            pk = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            thresh = _probe_sorted(sk, sv, pk, -1.0)
            qty = batch.column("l_quantity") \
                .to_numpy(zero_copy_only=False)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            return spartial(qty, ep, thresh)

        partials = pruned.map_batches(probe, batch_format="pyarrow",
                                      batch_size=65536)
    else:
        back = pruned.join(stats, join_type="inner",
                           on=("l_partkey",),
                           num_partitions=_join_parts(pruned, stats))

        def jpartial(batch: pa.Table) -> pa.Table:
            s = batch.column("_s").to_numpy(zero_copy_only=False)
            c = batch.column("_c").to_numpy(zero_copy_only=False)
            qty = batch.column("l_quantity") \
                .to_numpy(zero_copy_only=False)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            return spartial(qty, ep, frac * s / c)

        partials = back.map_batches(jpartial, batch_format="pyarrow",
                                    batch_size=65536)

    tot = partials.aggregate(Sum("_rev", alias_name="rev"))["rev"] or 0.0
    return pa.table({"avg_yearly": pa.array(
        _round2_snap([tot / years]), pa.float64())})


def q8_market_share(sf_dir: str, supp_nation: str = "NATION_3",
                    region: str = "ASIA", part_type: str = "PROMO",
                    date_from: str = "1995-01-01",
                    date_to: str = "1997-01-01", form: str = "auto",
                    broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q8 shape (adapted: p_type IS the part slice — the schema
    has no p_mfgr) — one nation's market share of a part type sold to
    one region's customers, per order year.

    Scale decomposition: region→nations on the driver (constant rows);
    part-slice keys, custkey→in-region and suppkey→is-target-nation are
    all dimension lookups GATED together on ``broadcast_limit`` (small
    → sorted searchsorted arrays shipped once; SF-scaled → native
    joins). lineitem ⋈ date-filtered orders on orderkey is the one
    big-big exchange; per-batch partials emit ≤years rows of
    (o_year, target_vol, total_vol), so the share division runs on a
    years-sized table."""
    import ray

    from .dedup import _join_parts

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0]
    region_keys = np.sort(nat.loc[nat["n_regionkey"] == rkey,
                                  "n_nationkey"].to_numpy(np.int64))
    target = nat.loc[nat["n_name"] == supp_nation, "n_nationkey"]
    if target.empty:
        raise ValueError(f"q8: unknown nation {supp_nation!r}")
    target_key = int(target.iloc[0])

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def pslice(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("p_type"),
                                     pa.scalar(part_type))) \
            .select(["p_partkey"])

    eligible = part_ds.map_batches(pslice, batch_format="pyarrow",
                                   batch_size=65536)

    def cfilt(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.filter(pa.array(np.isin(nk, region_keys))) \
            .select(["c_custkey"])

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(cfilt, batch_format="pyarrow", batch_size=65536)
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if form == "auto":
        small = (eligible.count() + cust_ds.count()
                 + supp_ds.count()) <= broadcast_limit
        form = "broadcast" if small else "join"

    lo, hi = np.datetime64(date_from), np.datetime64(date_to)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])

    def _li_rows(batch: pa.Table, in_slice: np.ndarray,
                 snat: np.ndarray) -> pa.Table:
        keep = in_slice & (snat >= 0)
        ep = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)[keep]
        dc = batch.column("l_discount") \
            .to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").filter(
                pa.array(keep)),
            "_target": pa.array(snat[keep] == target_key),
            "_vol": pa.array(ep * (1.0 - dc)),
        })

    if form == "broadcast":
        ekeys = np.sort(eligible.to_pandas()["p_partkey"]
                        .to_numpy(np.int64))
        eref = ray.put(ekeys)
        cust = cust_ds.to_pandas()
        ckeys = np.sort(cust["c_custkey"].to_numpy(np.int64))
        cref = ray.put(ckeys)
        supp = supp_ds.to_pandas()
        sref = ray.put(_sorted_probe_arrays(
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64)))

        def _member(sorted_keys: np.ndarray,
                    keys: np.ndarray) -> np.ndarray:
            if not len(sorted_keys):
                return np.zeros(len(keys), bool)
            idx = np.searchsorted(sorted_keys, keys)
            idx[idx >= len(sorted_keys)] = 0
            return sorted_keys[idx] == keys

        def oemit(batch: pa.Table, cref=cref) -> pa.Table:
            cs = ray.get(cref)
            d = batch.column("o_orderdate") \
                .to_numpy(zero_copy_only=False)
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            keep = (d >= lo) & (d < hi) & _member(cs, ck)
            yr = d[keep].astype("datetime64[Y]").astype(np.int64) + 1970
            return pa.table({
                "l_orderkey": batch.column("o_orderkey").filter(
                    pa.array(keep)),
                "o_year": pa.array(yr),
            })

        ofiltered = orders.map_batches(oemit, batch_format="pyarrow",
                                       batch_size=65536)

        def lemit(batch: pa.Table, eref=eref, sref=sref) -> pa.Table:
            es = ray.get(eref)
            sk, sv = ray.get(sref)
            pk = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            suk = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _li_rows(batch, _member(es, pk),
                            _probe_sorted(sk, sv, suk, -1))

        lfiltered = li.map_batches(lemit, batch_format="pyarrow",
                                   batch_size=65536)
    else:
        def datefilt(batch: pa.Table) -> pa.Table:
            d = batch.column("o_orderdate") \
                .to_numpy(zero_copy_only=False)
            t = batch.filter(pa.array((d >= lo) & (d < hi)))
            yr = t.column("o_orderdate") \
                .to_numpy(zero_copy_only=False) \
                .astype("datetime64[Y]").astype(np.int64) + 1970
            return pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_year": pa.array(yr),
            })

        ojoin = orders.map_batches(datefilt, batch_format="pyarrow",
                                   batch_size=65536) \
            .join(cust_ds, join_type="left_semi", on=("o_custkey",),
                  right_on=("c_custkey",),
                  num_partitions=_join_parts(orders, cust_ds))

        def oemit2(batch: pa.Table) -> pa.Table:
            return batch.select(["o_orderkey", "o_year"]) \
                .rename_columns(["l_orderkey", "o_year"])

        ofiltered = ojoin.map_batches(oemit2, batch_format="pyarrow")
        lj = li.join(eligible, join_type="left_semi",
                     on=("l_partkey",), right_on=("p_partkey",),
                     num_partitions=_join_parts(li, eligible)) \
            .join(supp_ds, join_type="inner", on=("l_suppkey",),
                  right_on=("s_suppkey",),
                  num_partitions=_join_parts(li, supp_ds))

        def lemit2(batch: pa.Table) -> pa.Table:
            snat = batch.column("s_nationkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _li_rows(batch, np.ones(len(snat), bool), snat)

        lfiltered = lj.map_batches(lemit2, batch_format="pyarrow",
                                   batch_size=65536)

    joined = lfiltered.join(
        ofiltered, join_type="inner", on=("l_orderkey",),
        num_partitions=_join_parts(lfiltered, ofiltered))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "_t": pa.array([], pa.float64()),
                             "_v": pa.array([], pa.float64())})
        df = pd.DataFrame({
            "o_year": batch.column("o_year")
                .to_numpy(zero_copy_only=False),
            "_t": np.where(
                batch.column("_target").to_numpy(zero_copy_only=False),
                batch.column("_vol").to_numpy(zero_copy_only=False),
                0.0),
            "_v": batch.column("_vol").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("o_year", as_index=False).agg(
            _t=("_t", "sum"), _v=("_v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby("o_year").aggregate(Sum("_t", alias_name="_t"),
                                     Sum("_v", alias_name="_v")) \
        .to_pandas().sort_values("o_year")
    share = out["_t"].to_numpy() / out["_v"].to_numpy()
    # DuckDB ROUND(x, 4) is half away from zero
    share = np.copysign(np.floor(np.abs(share) * 1e4 + 0.5), share) / 1e4
    return pa.table({
        "o_year": pa.array(out["o_year"].to_numpy(np.int64)),
        "mkt_share": pa.array(share, pa.float64()),
    })


def q9_product_profit(sf_dir: str, name_like: str = "red",
                      cost_rate: float = 0.06, form: str = "auto",
                      broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q9 shape (adapted: no partsupp, so supply cost is proxied
    as ``cost_rate`` × p_retailprice) — profit per supplier nation per
    order year over parts whose name matches a substring.

    Scale shape: the part slice carries (partkey → retailprice) and the
    supplier lookup (suppkey → nationkey); both GATED on
    ``broadcast_limit`` with native-join fallbacks. lineitem emits
    (orderkey, nation, amount) compactly, joins the orders year table
    on orderkey (big-big), and (nation, year) partials reduce the final
    groupby to nations×years rows. Names attach driver-side (constant
    25 rows)."""
    import ray

    from .dedup import _join_parts

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    part_ds = _read(sf_dir, "part",
                    ["p_partkey", "p_name", "p_retailprice"])

    def pslice(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column("p_name"), name_like)
        return batch.filter(keep).select(["p_partkey", "p_retailprice"])

    sliced = part_ds.map_batches(pslice, batch_format="pyarrow",
                                 batch_size=65536)
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if form == "auto":
        form = "broadcast" \
            if sliced.count() + supp_ds.count() <= broadcast_limit \
            else "join"

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def _amount(batch: pa.Table, keep: np.ndarray, price: np.ndarray,
                snat: np.ndarray) -> pa.Table:
        ep = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)[keep]
        dc = batch.column("l_discount") \
            .to_numpy(zero_copy_only=False)[keep]
        qty = batch.column("l_quantity") \
            .to_numpy(zero_copy_only=False)[keep]
        amt = ep * (1.0 - dc) - price[keep] * cost_rate * qty
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").filter(
                pa.array(keep)),
            "nat": pa.array(snat[keep]),
            "_amt": pa.array(amt),
        })

    if form == "broadcast":
        sl = sliced.to_pandas()
        pref = ray.put(_sorted_probe_arrays(
            sl["p_partkey"].to_numpy(np.int64),
            sl["p_retailprice"].to_numpy(np.float64)))
        supp = supp_ds.to_pandas()
        sref = ray.put(_sorted_probe_arrays(
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64)))

        def lemit(batch: pa.Table, pref=pref, sref=sref) -> pa.Table:
            pk_s, pv = ray.get(pref)
            sk, sv = ray.get(sref)
            pk = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            suk = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            price = _probe_sorted(pk_s, pv, pk, np.nan)
            snat = _probe_sorted(sk, sv, suk, -1)
            keep = ~np.isnan(price) & (snat >= 0)
            return _amount(batch, keep, price, snat)

        lrows = li.map_batches(lemit, batch_format="pyarrow",
                               batch_size=65536)
    else:
        lj = li.join(sliced, join_type="inner", on=("l_partkey",),
                     right_on=("p_partkey",),
                     num_partitions=_join_parts(li, sliced)) \
            .join(supp_ds, join_type="inner", on=("l_suppkey",),
                  right_on=("s_suppkey",),
                  num_partitions=_join_parts(li, supp_ds))

        def lemit2(batch: pa.Table) -> pa.Table:
            price = batch.column("p_retailprice") \
                .to_numpy(zero_copy_only=False)
            snat = batch.column("s_nationkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _amount(batch, np.ones(len(snat), bool), price, snat)

        lrows = lj.map_batches(lemit2, batch_format="pyarrow",
                               batch_size=65536)

    def oemit(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        yr = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"l_orderkey": batch.column("o_orderkey"),
                         "o_year": pa.array(yr)})

    years = orders.map_batches(oemit, batch_format="pyarrow",
                               batch_size=65536)
    joined = lrows.join(years, join_type="inner", on=("l_orderkey",),
                        num_partitions=_join_parts(lrows, years))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"nat": pa.array([], pa.int64()),
                             "o_year": pa.array([], pa.int64()),
                             "_amt": pa.array([], pa.float64())})
        df = pd.DataFrame({
            "nat": batch.column("nat").to_numpy(zero_copy_only=False),
            "o_year": batch.column("o_year")
                .to_numpy(zero_copy_only=False),
            "_amt": batch.column("_amt").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["nat", "o_year"], as_index=False)["_amt"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby(["nat", "o_year"]) \
        .aggregate(Sum("_amt", alias_name="_amt")).to_pandas()
    out["nation"] = out["nat"].map(names)
    out["sum_profit"] = _round2_snap(out["_amt"].to_numpy())
    out = out.sort_values(["nation", "o_year"])
    out["o_year"] = out["o_year"].astype("int64")
    return pa.Table.from_pandas(
        out[["nation", "o_year", "sum_profit"]], preserve_index=False)


def q12_late_lines_by_flag(sf_dir: str, flags=("A", "R"),
                           late_days: int = 60, year: int = 1996):
    """TPC-H Q12 shape (adapted: no l_shipmode/receiptdate — the class
    column is l_returnflag and "late" = shipped ≥ ``late_days`` after
    the order date) — per class, how many late lines belong to
    high-priority orders vs the rest.

    Scale shape: lineitem pre-filters map-side (flag + ship-year) and
    emits compact (orderkey, flag, shipdate-int); the one exchange is
    the orderkey hash join against orders; per-batch partials emit ≤2
    rows of (flag, high, low) counts."""
    from .dedup import _join_parts

    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")
    flag_arr = np.array(list(flags), dtype=object)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"])

    def lfilt(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        fl = batch.column("l_returnflag").to_pandas().to_numpy()
        keep = (ship >= lo) & (ship < hi) & np.isin(fl, flag_arr)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").filter(
                pa.array(keep)),
            "l_returnflag": batch.column("l_returnflag").filter(
                pa.array(keep)),
            "_ship": pa.array(ship[keep].astype("datetime64[us]")
                              .view("int64")),
        })

    lrows = li.map_batches(lfilt, batch_format="pyarrow",
                           batch_size=65536)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = lrows.join(orders, join_type="inner", on=("l_orderkey",),
                        right_on=("o_orderkey",),
                        num_partitions=_join_parts(lrows, orders))
    late_us = np.timedelta64(late_days, "D").astype("timedelta64[us]") \
        .astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "_hi": pa.array([], pa.int64()),
                "_lo": pa.array([], pa.int64())})
        od = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view("int64")
        ship = batch.column("_ship").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ship >= od + late_us))
        pr = t.column("o_orderpriority").to_pandas().to_numpy()
        high = np.isin(pr, np.array(["1-URGENT", "2-HIGH"],
                                    dtype=object))
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pandas(),
            "_hi": high.astype(np.int64),
            "_lo": (~high).astype(np.int64)})
        g = df.groupby("l_returnflag", as_index=False).agg(
            _hi=("_hi", "sum"), _lo=("_lo", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return joined.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("l_returnflag") \
        .aggregate(Sum("_hi", alias_name="high_line_count"),
                   Sum("_lo", alias_name="low_line_count")) \
        .sort("l_returnflag")


def q22_inactive_rich_customers(sf_dir: str,
                                cutoff: str = "1999-01-01"):
    """TPC-H Q22 shape (adapted: no c_phone, so the grouping key is the
    customer's nation, and "no orders" — empty at every test SF —
    becomes "no orders since ``cutoff``") — count and total balance of
    above-average-balance customers with no recent orders, per nation.

    Scale shape: the global positive-balance average is ONE
    combiner-fed aggregate (a scalar); recent order custkeys reduce
    through a combiner groupby; the anti-join is Ray's native
    ``left_anti`` on custkey (big-big, hash-partitioned); nation names
    attach driver-side to the ≤25-row result."""
    from .dedup import _join_parts

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def bpartial(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        pos = bal[bal > 0.0]
        return pa.table({"_s": pa.array([float(pos.sum())]),
                         "_c": pa.array([int(len(pos))])})

    tot = cust.map_batches(bpartial, batch_format="pyarrow",
                           batch_size=65536) \
        .aggregate(Sum("_s", alias_name="s"), Sum("_c", alias_name="c"))
    avg_bal = (tot["s"] or 0.0) / max(tot["c"] or 0, 1)

    cutoff_np = np.datetime64(cutoff)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def rpartial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(d >= cutoff_np))
        df = pd.DataFrame({"o_custkey": t.column("o_custkey")
                           .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    from ..functions.sortagg import sorted_keyed_count

    recent = sorted_keyed_count(
        orders.map_batches(rpartial, batch_format="pyarrow",
                           batch_size=65536), "o_custkey")

    rich = cust.filter(expr=f"c_acctbal > {float(avg_bal)!r}")
    inactive = rich.join(recent, join_type="left_anti",
                         on=("c_custkey",), right_on=("o_custkey",),
                         num_partitions=_join_parts(rich, recent))

    def npartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "nat": batch.column("c_nationkey")
                .to_numpy(zero_copy_only=False).astype(np.int64),
            "_b": batch.column("c_acctbal")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby("nat", as_index=False).agg(
            _n=("_b", "size"), _b=("_b", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = inactive.map_batches(npartial, batch_format="pyarrow",
                               batch_size=65536) \
        .groupby("nat").aggregate(Sum("_n", alias_name="numcust"),
                                  Sum("_b", alias_name="_b")) \
        .to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    out["n_name"] = out["nat"].map(names)
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = _round2_snap(out["_b"].to_numpy())
    out = out.sort_values("n_name")
    return pa.Table.from_pandas(
        out[["n_name", "numcust", "totacctbal"]], preserve_index=False)


def _in_sorted(skeys: np.ndarray, query) -> np.ndarray:
    """Vectorized membership of ``query`` keys in the sorted int64 key
    array — the broadcast semi-join probe (ship the sorted keys once
    with ``ray.put``, test whole columns per batch). All-False on an
    empty key set."""
    query = np.asarray(query, dtype=np.int64)
    if len(skeys) == 0:
        return np.zeros(len(query), bool)
    pos = np.searchsorted(skeys, query)
    pos = np.minimum(pos, len(skeys) - 1)
    return skeys[pos] == query


def _region_nationkeys(sf_dir: str, region: str) -> np.ndarray:
    """Sorted nationkeys of ``region``. nation/region are fixed 25/5-row
    dimensions at EVERY scale factor, so the driver-side read is
    scale-safe by construction (not a gated broadcast)."""
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rks = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    return np.sort(nat.loc[nat["n_regionkey"].isin(rks),
                           "n_nationkey"].to_numpy(np.int64))


def _nation_name_probe(sf_dir: str):
    """(sorted nationkeys, aligned name object array) for vectorized
    ``_probe_sorted`` name attachment — 25 rows, safe in a closure."""
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    return _sorted_probe_arrays(nat["n_nationkey"].to_numpy(np.int64),
                                nat["n_name"].to_numpy(object))


def q2_min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                         part_type: str = "STANDARD", max_size: int = 25,
                         topn: int = 100, form: str = "auto",
                         broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q2 shape (adapted: no partsupp table — the supply cost of
    a (part, supplier) pair is min(l_extendedprice / l_quantity) over
    their lineitems, and the part slice is type + size band) — for each
    part in the slice, the region supplier(s) offering the minimum
    cost, richest suppliers first, ties preserved.

    Scale shape: nation/region are fixed-size dims (driver);
    supplier-in-region and the part slice are GATED together on
    ``broadcast_limit`` (small → sorted-key ``ray.put`` probes prune
    lineitem map-side; SF-scaled → two native joins). The
    (part, supplier) min reduces through per-batch pandas-min partials
    into ONE two-key groupby; the correlated per-part min is a second
    combiner-fed groupby over that compact cost table, matched back by
    a partkey join (argmin-with-ties — the scalar-subquery pattern).
    Names attach to the ≤slice-sized winner table; sort + limit end
    the pipeline. supplycost uses ``_round2_duck`` because the min of
    a single division is bitwise-identical in both engines and exact
    binary midpoints (ep/8 etc.) are live."""
    import ray

    from .dedup import _join_parts

    nkeys = _region_nationkeys(sf_dir, region)
    nk_sorted, nname = _nation_name_probe(sf_dir)
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])

    def sfilt(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nationkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(np.isin(nk, nkeys)))
        names = _probe_sorted(
            nk_sorted, nname,
            t.column("s_nationkey").to_numpy(zero_copy_only=False)
            .astype(np.int64), "")
        return t.append_column("n_name", pa.array(names, pa.string())) \
            .drop_columns(["s_nationkey"])

    supp_r = supp.map_batches(sfilt, batch_format="pyarrow",
                              batch_size=65536)

    part_ds = _read(sf_dir, "part",
                    ["p_partkey", "p_name", "p_type", "p_size"])

    def pslice(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(batch.column("p_type"), pa.scalar(part_type)),
            pc.less_equal(batch.column("p_size"), pa.scalar(max_size)))
        return batch.filter(keep).select(["p_partkey", "p_name"])

    eligible = part_ds.map_batches(pslice, batch_format="pyarrow",
                                   batch_size=65536)

    if form == "auto":
        form = ("broadcast"
                if supp_r.count() + eligible.count() <= broadcast_limit
                else "join")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_quantity"])

    if form == "broadcast":
        sk = np.sort(supp_r.to_pandas()["s_suppkey"].to_numpy(np.int64))
        pk = np.sort(eligible.to_pandas()["p_partkey"]
                     .to_numpy(np.int64))
        ref = ray.put((sk, pk))

        def prune(batch: pa.Table, ref=ref) -> pa.Table:
            sk, pk = ray.get(ref)
            ls = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            lp = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(
                _in_sorted(sk, ls) & _in_sorted(pk, lp)))

        pruned = li.map_batches(prune, batch_format="pyarrow",
                                batch_size=65536)
    else:
        skeys = supp_r.select_columns(["s_suppkey"])
        pruned = li.join(skeys, join_type="inner", on=("l_suppkey",),
                         right_on=("s_suppkey",),
                         num_partitions=_join_parts(li, skeys))
        pkeys = eligible.select_columns(["p_partkey"])
        pruned = pruned.join(pkeys, join_type="inner",
                             on=("l_partkey",), right_on=("p_partkey",),
                             num_partitions=_join_parts(pruned, pkeys)) \
            .select_columns(["l_partkey", "l_suppkey",
                             "l_extendedprice", "l_quantity"])

    def cpartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": batch.column("l_partkey")
                .to_numpy(zero_copy_only=False),
            "l_suppkey": batch.column("l_suppkey")
                .to_numpy(zero_copy_only=False),
            "_u": batch.column("l_extendedprice")
                .to_numpy(zero_copy_only=False)
            / batch.column("l_quantity")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby(["l_partkey", "l_suppkey"],
                       as_index=False)["_u"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    cost = pruned.map_batches(cpartial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby(["l_partkey", "l_suppkey"]) \
        .aggregate(Min("_u", alias_name="supplycost"))

    minc = cost.groupby("l_partkey") \
        .aggregate(Min("supplycost", alias_name="_minc"))

    matched = cost.join(minc, join_type="inner", on=("l_partkey",),
                        num_partitions=_join_parts(cost, minc))

    def wfilt(batch: pa.Table) -> pa.Table:
        sc = batch.column("supplycost") \
            .to_numpy(zero_copy_only=False)
        mn = batch.column("_minc").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(sc == mn)) \
            .drop_columns(["_minc"])

    winners = matched.map_batches(wfilt, batch_format="pyarrow",
                                  batch_size=65536)

    named = winners.join(eligible, join_type="inner",
                         on=("l_partkey",), right_on=("p_partkey",),
                         num_partitions=_join_parts(winners, eligible))
    named = named.join(supp_r, join_type="inner", on=("l_suppkey",),
                       right_on=("s_suppkey",),
                       num_partitions=_join_parts(named, supp_r))

    out = named.sort(["s_acctbal", "n_name", "s_name", "l_partkey"],
                     descending=[True, False, False, False]) \
        .limit(topn).to_pandas()
    out["p_partkey"] = out["l_partkey"]
    out["supplycost"] = _round2_duck(out["supplycost"].to_numpy())
    return pa.Table.from_pandas(
        out[["s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
             "supplycost"]], preserve_index=False)


def q11_important_parts(sf_dir: str, region: str = "ASIA",
                        avg_mult: float = 1.5, form: str = "auto",
                        broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q11 shape (adapted: no partsupp — a part's "value" held by
    ``region``'s suppliers is its discounted lineitem revenue, and the
    fixed TPC-H fraction becomes ``avg_mult``× the per-part average so
    the threshold is scale-free) — parts whose value concentration is
    well above average, the grouped-sum + global-scalar-subquery shape.

    Scale shape: supplier-in-region is GATED on ``broadcast_limit``
    (sorted-key probe vs native join); per-part value reduces through
    per-batch sum partials into one groupby; the global mean is ONE
    ``aggregate(Mean)`` over that part-dimension-sized table (a
    scalar to the driver, never the table); the HAVING filter and
    2-dp rounding are a final map_batches."""
    import ray

    from .dedup import _join_parts

    nkeys = _region_nationkeys(sf_dir, region)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def sfilt(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nationkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(nk, nkeys))) \
            .select(["s_suppkey"])

    supp_r = supp.map_batches(sfilt, batch_format="pyarrow",
                              batch_size=65536)
    if form == "auto":
        form = ("broadcast" if supp_r.count() <= broadcast_limit
                else "join")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    if form == "broadcast":
        sk = np.sort(supp_r.to_pandas()["s_suppkey"].to_numpy(np.int64))
        ref = ray.put(sk)

        def prune(batch: pa.Table, ref=ref) -> pa.Table:
            sk = ray.get(ref)
            ls = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(_in_sorted(sk, ls)))

        pruned = li.map_batches(prune, batch_format="pyarrow",
                                batch_size=65536)
    else:
        pruned = li.join(supp_r, join_type="inner", on=("l_suppkey",),
                         right_on=("s_suppkey",),
                         num_partitions=_join_parts(li, supp_r))

    def vpartial(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_partkey": batch.column("l_partkey")
                .to_numpy(zero_copy_only=False),
            "_v": ep * (1.0 - dc)})
        g = df.groupby("l_partkey", as_index=False)["_v"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..functions.sortagg import sorted_keyed_sum

    value = sorted_keyed_sum(
        pruned.map_batches(vpartial, batch_format="pyarrow",
                           batch_size=65536),
        "l_partkey", ["_v"]).rename_columns({"_v": "val"}) \
        .materialize()          # Mean + the HAVING filter both read it
    thresh = avg_mult * float(
        value.aggregate(Mean("val", alias_name="m"))["m"] or 0.0)

    def tfilt(batch: pa.Table) -> pa.Table:
        v = batch.column("val").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(v > thresh))
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "value": pa.array(_round2_snap(
                t.column("val").to_numpy(zero_copy_only=False)))})

    return value.map_batches(tfilt, batch_format="pyarrow",
                             batch_size=65536) \
        .sort(["value", "l_partkey"], descending=[True, False])


def q16_supplier_part_variety(sf_dir: str,
                              exclude_brand: str = "Brand#1",
                              exclude_type: str = "PROMO",
                              sizes=(1, 5, 10, 15, 20, 25, 30, 35),
                              form: str = "auto",
                              broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q16 shape (adapted: the part↔supplier relationship comes
    from lineitem instead of partsupp, and "customer complaints"
    becomes a negative account balance) — how many distinct suppliers
    can supply parts of each (brand, type, size), excluding flagged
    suppliers; the count-distinct-over-joined-dimensions shape.

    Scale shape: the part slice and the flagged-supplier set are GATED
    together on ``broadcast_limit`` (sorted-key probes prune lineitem
    map-side; SF-scaled → an inner semi-join plus a native
    ``left_anti``). Distinctness reduces in three combiner steps, each
    fed by per-batch ``drop_duplicates`` partials: (part, supplier)
    pairs, then (brand, type, size, supplier) quads after the
    dimension join, then the final per-group supplier count — no step
    ever sees more than the deduped key space."""
    import ray

    from .dedup import _join_parts

    part_ds = _read(sf_dir, "part",
                    ["p_partkey", "p_brand", "p_type", "p_size"])
    size_arr = np.array(sizes, np.int64)

    def pslice(batch: pa.Table) -> pa.Table:
        sz = batch.column("p_size") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        brand = batch.column("p_brand").to_pandas().to_numpy()
        ptype = batch.column("p_type").to_pandas().to_numpy()
        keep = (np.isin(sz, size_arr) & (brand != exclude_brand)
                & (ptype != exclude_type))
        return batch.filter(pa.array(keep))

    eligible = part_ds.map_batches(pslice, batch_format="pyarrow",
                                   batch_size=65536)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])

    def badf(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("s_acctbal"),
                                    pa.scalar(0.0))) \
            .select(["s_suppkey"])

    bad = supp.map_batches(badf, batch_format="pyarrow",
                           batch_size=65536)

    n_bad = bad.count()
    if form == "auto":
        form = ("broadcast"
                if eligible.count() + n_bad <= broadcast_limit
                else "join")

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def _dedup_pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": batch.column("l_partkey")
                .to_numpy(zero_copy_only=False),
            "l_suppkey": batch.column("l_suppkey")
                .to_numpy(zero_copy_only=False)}).drop_duplicates()
        df["_one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    if form == "broadcast":
        pk = np.sort(eligible.to_pandas()["p_partkey"]
                     .to_numpy(np.int64))
        bk = (np.sort(bad.to_pandas()["s_suppkey"].to_numpy(np.int64))
              if n_bad else np.empty(0, np.int64))  # empty ds drops schema
        ref = ray.put((pk, bk))

        def prune(batch: pa.Table, ref=ref) -> pa.Table:
            pk, bk = ray.get(ref)
            lp = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            ls = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _dedup_pairs(batch.filter(pa.array(
                _in_sorted(pk, lp) & ~_in_sorted(bk, ls))))

        pair_src = li.map_batches(prune, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        keyed = li.join(eligible.select_columns(["p_partkey"]),
                        join_type="inner", on=("l_partkey",),
                        right_on=("p_partkey",),
                        num_partitions=_join_parts(li, eligible))
        if n_bad > 0:  # all-empty join side breaks Ray's hash join
            keyed = keyed.join(
                bad, join_type="left_anti", on=("l_suppkey",),
                right_on=("s_suppkey",),
                num_partitions=_join_parts(keyed, bad))
        pair_src = keyed.map_batches(_dedup_pairs,
                                     batch_format="pyarrow",
                                     batch_size=65536)

    # the (brand, type, size) vocabulary is FIXED (catalog attribute
    # domains), not SF-scaled, so the dim table is always tiny:
    # per-batch dedup partials over eligible reduce to it exactly,
    # and it broadcasts as a dense dim_id mapping. The former
    # string-keyed quad groupby cost 19.7 s for 66k groups at sf0.1
    # (Ray's per-group finisher is brutal on string keys); packing
    # (dim_id << 32 | suppkey) and running the sort + run-length
    # distinct brings the whole tail under 2 s.
    from .dedup import _sorted_distinct_u64

    attrs = pair_src.join(eligible, join_type="inner",
                          on=("l_partkey",), right_on=("p_partkey",),
                          num_partitions=_join_parts(pair_src,
                                                     eligible))

    dcols = ["p_brand", "p_type", "p_size"]
    vocab = (eligible.map_batches(
        lambda b: pa.Table.from_pandas(
            b.select(dcols).to_pandas().drop_duplicates(),
            preserve_index=False),
        batch_format="pyarrow", batch_size=65536)
        .to_pandas().drop_duplicates()
        .sort_values(dcols).reset_index(drop=True))
    vocab["_dim"] = np.arange(len(vocab), dtype=np.int64)
    vref = ray.put(vocab)

    def to_dim(batch: pa.Table, vref=vref) -> pa.Table:
        v = ray.get(vref)
        df = batch.select(dcols + ["l_suppkey"]).to_pandas() \
            .drop_duplicates()
        m = df.merge(v, on=dcols, how="left")
        dim = m["_dim"].to_numpy().astype(np.uint64)
        sk = m["l_suppkey"].to_numpy().astype(np.uint64)
        return pa.table({"k": pa.array((dim << np.uint64(32)) | sk,
                                       pa.uint64())})

    quads = _sorted_distinct_u64(
        attrs.map_batches(to_dim, batch_format="pyarrow",
                          batch_size=65536), "k")

    def dim_partial(batch: pa.Table) -> pa.Table:
        kk = batch.column("k").to_numpy(zero_copy_only=False)
        dim = (kk >> np.uint64(32)).astype(np.int64)
        cnt = np.bincount(dim, minlength=len(vocab)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"_dim": pa.array(nz, pa.int64()),
                         "_n": pa.array(cnt[nz], pa.int64())})

    cdf = quads.map_batches(dim_partial, batch_format="pyarrow",
                            batch_size=None).to_pandas() \
        .groupby("_dim", as_index=False)["_n"].sum()   # ≤ vocab rows
    out = vocab.merge(cdf, on="_dim", how="inner") \
        .rename(columns={"_n": "supplier_cnt"}) \
        .sort_values(["supplier_cnt"] + dcols,
                     ascending=[False, True, True, True])
    return pa.Table.from_pandas(
        out[dcols + ["supplier_cnt"]], preserve_index=False)


def q20_promotable_suppliers(sf_dir: str, name_prefix: str = "red",
                             year: int = 1996, frac: float = 0.15,
                             form: str = "auto",
                             broadcast_limit: int = BROADCAST_LIMIT):
    """TPC-H Q20 shape (adapted: no partsupp availqty — a supplier is
    "promotable" when its ``year`` shipped quantity of the
    ``name_prefix`` parts exceeds ``frac`` of its all-time shipped
    quantity of them, i.e. the activity concentrates in the target
    year) — the nested semi-join chain (supplier IN … part IN …
    HAVING over grouped sums).

    Scale shape: the part slice is GATED on ``broadcast_limit``
    (sorted-key probe vs native join) and prunes lineitem map-side;
    per-supplier (year, total) quantity sums reduce through per-batch
    conditional partials into ONE groupby (supplier-dimension-sized);
    the HAVING filter is exact float arithmetic (integer-valued
    quantities). Names attach via a dimension join + the fixed-size
    nation probe; quantities are never re-scanned."""
    import ray

    from .dedup import _join_parts

    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def pslice(batch: pa.Table) -> pa.Table:
        keep = pc.starts_with(batch.column("p_name"),
                              pattern=name_prefix)
        return batch.filter(keep).select(["p_partkey"])

    eligible = part_ds.map_batches(pslice, batch_format="pyarrow",
                                   batch_size=65536)
    if form == "auto":
        form = ("broadcast" if eligible.count() <= broadcast_limit
                else "join")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    if form == "broadcast":
        pk = np.sort(eligible.to_pandas()["p_partkey"]
                     .to_numpy(np.int64))
        ref = ray.put(pk)

        def prune(batch: pa.Table, ref=ref) -> pa.Table:
            pk = ray.get(ref)
            lp = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(_in_sorted(pk, lp)))

        pruned = li.map_batches(prune, batch_format="pyarrow",
                                batch_size=65536)
    else:
        pruned = li.join(eligible, join_type="inner",
                         on=("l_partkey",), right_on=("p_partkey",),
                         num_partitions=_join_parts(li, eligible))

    def spartial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        iny = ((ship >= lo) & (ship < hi)).astype(np.float64)
        df = pd.DataFrame({
            "l_suppkey": batch.column("l_suppkey")
                .to_numpy(zero_copy_only=False),
            "_y": qty * iny, "_t": qty})
        g = df.groupby("l_suppkey", as_index=False).agg(
            _y=("_y", "sum"), _t=("_t", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = pruned.map_batches(spartial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("l_suppkey") \
        .aggregate(Sum("_y", alias_name="_y"),
                   Sum("_t", alias_name="_t"))

    def hfilt(batch: pa.Table) -> pa.Table:
        y = batch.column("_y").to_numpy(zero_copy_only=False)
        t = batch.column("_t").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(y > frac * t)) \
            .select(["l_suppkey"])

    winners = sums.map_batches(hfilt, batch_format="pyarrow",
                               batch_size=65536)

    nk_sorted, nname = _nation_name_probe(sf_dir)
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey"])
    named = winners.join(supp, join_type="inner", on=("l_suppkey",),
                         right_on=("s_suppkey",),
                         num_partitions=_join_parts(winners, supp))

    def attach(batch: pa.Table) -> pa.Table:
        names = _probe_sorted(
            nk_sorted, nname,
            batch.column("s_nationkey").to_numpy(zero_copy_only=False)
            .astype(np.int64), "")
        return pa.table({
            "s_name": batch.column("s_name"),
            "n_name": pa.array(names, pa.string())})

    return named.map_batches(attach, batch_format="pyarrow",
                             batch_size=65536).sort("s_name")


def q21_waiting_suppliers(sf_dir: str, late_days: int = 90,
                          topn: int = 100):
    """TPC-H Q21 shape (adapted: no receipt/commit dates — a line is
    "late" when it ships ≥ ``late_days`` after the order date) — for
    finished multi-supplier orders where EXACTLY ONE supplier shipped
    late, count each such supplier's late lines; the
    EXISTS + NOT-EXISTS correlated double-anti-join shape.

    Scale shape: orders filters to status F map-side and ONE orderkey
    hash join attaches the order date to lineitem; per-(order,
    supplier) late-line counts reduce through per-batch partials into
    a two-key groupby; per-order supplier/late-supplier tallies are a
    second combiner-fed groupby over those pairs (≤7 rows per order);
    the EXISTS/NOT-EXISTS pair becomes a filter on that compact table
    plus one orderkey semi-join back to the late pairs — no correlated
    rescan of lineitem. Name attach + sort + limit end it."""
    from .dedup import _join_parts

    late_us = np.timedelta64(late_days, "D") \
        .astype("timedelta64[us]").astype(np.int64)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"])

    def ofilt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("o_orderstatus"),
                                     pa.scalar("F"))) \
            .select(["o_orderkey", "o_orderdate"])

    ord_f = orders.map_batches(ofilt, batch_format="pyarrow",
                               batch_size=65536)
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = li.join(ord_f, join_type="inner", on=("l_orderkey",),
                     right_on=("o_orderkey",),
                     num_partitions=_join_parts(li, ord_f))

    def ppartial(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view("int64")
        ship = batch.column("l_shipdate") \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view("int64")
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey")
                .to_numpy(zero_copy_only=False),
            "l_suppkey": batch.column("l_suppkey")
                .to_numpy(zero_copy_only=False),
            "_late": (ship >= od + late_us).astype(np.int64)})
        g = df.groupby(["l_orderkey", "l_suppkey"],
                       as_index=False)["_late"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    # ~one (order, supplier) group per lineitem row makes Ray's
    # sort-based Aggregate pathological here (per-group Python
    # finisher); pack the two uint32-range keys and reduce with the
    # sort + per-block run-length machinery instead
    from ..functions.sortagg import sorted_keyed_sum

    def pack_os(batch: pa.Table) -> pa.Table:
        o = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        assert len(o) == 0 or int(o.max()) < (1 << 32)
        return pa.table({
            "k": pa.array((o.astype(np.uint64) << np.uint64(32))
                          | sk.astype(np.uint64), pa.uint64()),
            "_late": batch.column("_late"),
        })

    def unpack_os(batch: pa.Table) -> pa.Table:
        kk = batch.column("k").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return pa.table({
            "l_orderkey": pa.array((kk >> np.uint64(32))
                                   .astype(np.int64)),
            "l_suppkey": pa.array((kk & np.uint64(0xFFFFFFFF))
                                  .astype(np.int64)),
            "plate": batch.column("_late").cast(pa.int64()),
        })

    pairs = sorted_keyed_sum(
        joined.map_batches(ppartial, batch_format="pyarrow",
                           batch_size=65536)
        .map_batches(pack_os, batch_format="pyarrow"),
        "k", ["_late"], key_type=pa.uint64(),
    ).map_batches(unpack_os, batch_format="pyarrow").materialize()

    def opartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey")
                .to_numpy(zero_copy_only=False),
            "_ns": np.int64(1),
            "_nl": (batch.column("plate")
                    .to_numpy(zero_copy_only=False) > 0)
            .astype(np.int64)})
        g = df.groupby("l_orderkey", as_index=False).agg(
            _ns=("_ns", "sum"), _nl=("_nl", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    # one group per finished order — same high-cardinality shape
    per_order = sorted_keyed_sum(
        pairs.map_batches(opartial, batch_format="pyarrow",
                          batch_size=65536),
        "l_orderkey", ["_ns", "_nl"])

    def qfilt(batch: pa.Table) -> pa.Table:
        ns = batch.column("_ns").to_numpy(zero_copy_only=False)
        nl = batch.column("_nl").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((ns >= 2) & (nl == 1))) \
            .select(["l_orderkey"])

    qual = per_order.map_batches(qfilt, batch_format="pyarrow",
                                 batch_size=65536)

    def lpairs(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("plate"),
                                       pa.scalar(0)))

    waits = pairs.map_batches(lpairs, batch_format="pyarrow",
                              batch_size=65536) \
        .join(qual, join_type="inner", on=("l_orderkey",),
              num_partitions=_join_parts(pairs, qual))

    def wpartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_suppkey": batch.column("l_suppkey")
                .to_numpy(zero_copy_only=False),
            "_w": batch.column("plate")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby("l_suppkey", as_index=False)["_w"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    numwait = waits.map_batches(wpartial, batch_format="pyarrow",
                                batch_size=65536) \
        .groupby("l_suppkey").aggregate(Sum("_w", alias_name="numwait"))

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = numwait.join(supp, join_type="inner", on=("l_suppkey",),
                         right_on=("s_suppkey",),
                         num_partitions=_join_parts(numwait, supp))
    out = named.sort(["numwait", "s_name"],
                     descending=[True, False]).limit(topn).to_pandas()
    out["numwait"] = out["numwait"].astype("int64")
    return pa.Table.from_pandas(out[["s_name", "numwait"]],
                                preserve_index=False)


def events_cum_distinct_users(sf_dir: str):
    """Cumulative COUNT(DISTINCT user) per event_type by day — the
    growth-curve window every analytics pipeline wants, which naive
    engines compute by re-scanning the prefix per day. Distributed via
    the first-occurrence identity: the cumulative distinct count at
    day d equals the number of users whose FIRST event of that type is
    ≤ d — so the whole window collapses to a (type, user) min-day
    groupby plus a running sum over the tiny (type, day) axis.

    Scale shape: per-batch pandas partials reduce the min-day groupby
    exchange to distinct (type, user) per block; new-user counts and
    the day axis both ride the SAME downstream groupby by emitting
    day-axis rows with newu=0 (a union instead of a join); the final
    cumulative sum ranks inside ``groupby(event_type).map_groups``
    where a group is bounded by the number of days per type, never by
    event volume. Day strings (%Y-%m-%d) order lexicographically =
    chronologically, so string min IS the first day."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id"])

    def first_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "user_id": batch.column("user_id")
                .to_numpy(zero_copy_only=False),
            "day": pc.strftime(batch.column("ts"),
                               format="%Y-%m-%d").to_pandas()})
        g = df.groupby(["event_type", "user_id"],
                       as_index=False)["day"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    firstday = ds.map_batches(first_partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby(["event_type", "user_id"]) \
        .aggregate(Min("day", alias_name="day"))

    def newu_partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["event_type", "day"]).to_pandas()
        df["newu"] = np.int64(1)
        g = df.groupby(["event_type", "day"], as_index=False)["newu"] \
            .sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    newu = firstday.map_batches(newu_partial, batch_format="pyarrow",
                                batch_size=65536)

    def days_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "day": pc.strftime(batch.column("ts"),
                               format="%Y-%m-%d").to_pandas()}) \
            .drop_duplicates()
        df["newu"] = np.int64(0)  # day-axis rows carry no new users
        return pa.Table.from_pandas(df, preserve_index=False)

    days = ds.map_batches(days_partial, batch_format="pyarrow",
                          batch_size=65536)

    per_day = days.union(newu) \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("newu", alias_name="newu"))

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day").reset_index(drop=True)
        g["cum_users"] = g["newu"].cumsum().astype(np.int64)
        return g[["event_type", "day", "cum_users"]]

    return per_day.groupby("event_type") \
        .map_groups(cum, batch_format="pandas") \
        .sort(["event_type", "day"])


def _distinct_users_of_type(sf_dir: str, etype: str,
                            min_value: float | None = None):
    """Distinct user_ids with at least one ``etype`` event (optionally
    with value > min_value) — per-batch drop_duplicates partials into
    one groupby, the exchange bounded by distinct users per block."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch.column("user_id")
                .to_numpy(zero_copy_only=False),
            "event_type": batch.column("event_type").to_pandas(),
            "value": batch.column("value")
                .to_numpy(zero_copy_only=False)})
        keep = df["event_type"] == etype
        if min_value is not None:
            keep &= df["value"] > min_value
        df = df[keep][["user_id"]].drop_duplicates()
        df["_one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(part, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("user_id").aggregate(Max("_one", alias_name="_one")) \
        .select_columns(["user_id"])


def users_purchase_and_error(sf_dir: str, min_error_value: float = 180.0):
    """INTERSECT shape: users who both purchased and hit a high-value
    error — two distinct-key reductions and ONE inner join on the
    compact user sets (never the raw event stream)."""
    from .dedup import _join_parts

    a = _distinct_users_of_type(sf_dir, "purchase")
    b = _distinct_users_of_type(sf_dir, "error", min_error_value)
    return a.join(b, join_type="inner", on=("user_id",),
                  num_partitions=_join_parts(a, b)).sort("user_id")


def users_purchase_except_error(sf_dir: str,
                                min_error_value: float = 180.0):
    """EXCEPT shape: purchasers who never hit a high-value error —
    the same compact sets through a native ``left_anti`` join."""
    from .dedup import _join_parts

    a = _distinct_users_of_type(sf_dir, "purchase")
    b = _distinct_users_of_type(sf_dir, "error", min_error_value)
    return a.join(b, join_type="left_anti", on=("user_id",),
                  num_partitions=_join_parts(a, b)).sort("user_id")


def orders_matrix_unpivot(sf_dir: str, y_a: int = 1996,
                          y_b: int = 1997):
    """UNPIVOT shape: melt the per-customer two-year count matrix back
    to long form (o_custkey, year, n) — the wide→long transform is a
    stateless per-batch explode (each row becomes ≤2 rows; zero-count
    cells drop, matching SQL UNPIVOT's NULL-removal semantics), so the
    whole melt adds NO exchange beyond the matrix's own joins."""
    wide = orders_year_matrix(sf_dir, y_a, y_b)

    def melt(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
        ka, kb = na > 0, nb > 0
        return pa.table({
            "o_custkey": pa.array(
                np.concatenate([ck[ka], ck[kb]]).astype(np.int64)),
            "year": pa.array(np.concatenate([
                np.full(ka.sum(), y_a), np.full(kb.sum(), y_b),
            ]).astype(np.int64)),
            "n": pa.array(np.concatenate([na[ka], nb[kb]])
                          .astype(np.int64)),
        })

    return wide.map_batches(melt, batch_format="pyarrow",
                            batch_size=None).sort(["o_custkey", "year"])


def revenue_share_in_region(sf_dir: str, form: str = "auto",
                            broadcast_limit: int = BROADCAST_LIMIT):
    """RATIO_TO_REPORT window shape: each nation's share of its
    region's lineitem revenue. Revenue reduces through nation-keyed
    combiner partials (supplier→nation attaches via the GATED
    sorted-key probe, native join above ``broadcast_limit``); the
    region totals are a 5-row second groupby on the driver along with
    the fixed-size nation/region dims — no second window scan. Share
    rounds to 6dp (ratio of two sums — irrational in practice;
    validated at sf0.001/0.01); fallback byte-equality in
    test_analysis_scale.py."""
    from .dedup import _join_parts

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if form == "auto":
        form = ("broadcast" if supp_ds.count() <= broadcast_limit
                else "join")

    def _rev(batch: pa.Table) -> np.ndarray:
        return (batch.column("l_extendedprice")
                .to_numpy(zero_copy_only=False)
                * (1.0 - batch.column("l_discount")
                   .to_numpy(zero_copy_only=False)))

    if form == "broadcast":
        supp = supp_ds.to_pandas()
        sk, snk = _sorted_probe_arrays(
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64))

        def part(batch: pa.Table) -> pa.Table:
            ls = batch.column("l_suppkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            df = pd.DataFrame({
                "n_nationkey": _probe_sorted(sk, snk, ls, -1),
                "rev": _rev(batch)})
            g = df.groupby("n_nationkey", as_index=False)["rev"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        keyed = li.map_batches(part, batch_format="pyarrow",
                               batch_size=65536)
    else:
        joined = li.join(supp_ds, join_type="inner",
                         on=("l_suppkey",), right_on=("s_suppkey",),
                         num_partitions=_join_parts(li, supp_ds))

        def part_j(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "n_nationkey": batch.column("s_nationkey")
                    .to_numpy(zero_copy_only=False).astype(np.int64),
                "rev": _rev(batch)})
            g = df.groupby("n_nationkey", as_index=False)["rev"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        keyed = joined.map_batches(part_j, batch_format="pyarrow",
                                   batch_size=65536)

    by_nation = keyed.groupby("n_nationkey") \
        .aggregate(Sum("rev", alias_name="rev")).to_pandas()

    # fixed-size dims finish driver-side (25 nations / 5 regions at
    # EVERY scale factor — not a gated broadcast)
    out = by_nation.merge(nat, on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey")
    tot = out.groupby("r_name")["rev"].transform("sum")
    out["share"] = np.floor(out["rev"] / tot * 1e6 + 0.5) / 1e6
    out["revenue"] = _round2_snap(out["rev"].to_numpy())
    out = out.sort_values(["r_name", "n_name"])
    return pa.Table.from_pandas(
        out[["r_name", "n_name", "revenue", "share"]],
        preserve_index=False)


def lineitem_corr_by_flag(sf_dir: str):
    """CORR aggregate shape: Pearson correlation of quantity vs
    discounted price per returnflag — the classic parallelizable-
    moments reduction: each batch emits (n, Σx, Σy, Σxy, Σx², Σy²)
    per flag, one tiny groupby merges them, and the driver-side finish
    is pure algebra on ≤3 rows. Corr rounds to 6dp (a ratio of large
    sums — summation-order ulps vanish at 6dp; validated at
    sf0.001/0.01)."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice",
                "l_discount"])

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        y = (batch.column("l_extendedprice")
             .to_numpy(zero_copy_only=False)
             * (1.0 - batch.column("l_discount")
                .to_numpy(zero_copy_only=False)))
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sy": y,
            "_sxy": x * y, "_sxx": x * x, "_syy": y * y})
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = li.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("l_returnflag") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sy", alias_name="sy"),
                   Sum("_sxy", alias_name="sxy"),
                   Sum("_sxx", alias_name="sxx"),
                   Sum("_syy", alias_name="syy")).to_pandas()

    n = mom["n"].to_numpy(np.float64)
    cov = mom["sxy"] - mom["sx"] * mom["sy"] / n
    vx = mom["sxx"] - mom["sx"] ** 2 / n
    vy = mom["syy"] - mom["sy"] ** 2 / n
    corr = (cov / np.sqrt(vx * vy)).to_numpy()
    out = pd.DataFrame({
        "l_returnflag": mom["l_returnflag"],
        "n": mom["n"].astype(np.int64),
        "corr_qty_rev": np.floor(corr * 1e6 + 0.5) / 1e6,
    }).sort_values("l_returnflag")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_mode_value_by_type(sf_dir: str):
    """MODE aggregate shape with a DETERMINISTIC tie rule (smallest
    value among the max-count ones — SQL's bare mode() is
    tie-arbitrary, so both engines spell the rule out): per-batch
    (type, value) count partials → one groupby merge → per-type argmax
    inside a bounded ``map_groups`` (group = the type's distinct
    values)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "value": np.floor(batch.column("value")
                              .to_numpy(zero_copy_only=False))
            .astype(np.int64)})
        df["_c"] = np.int64(1)
        g = df.groupby(["event_type", "value"], as_index=False)["_c"] \
            .sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ev.map_batches(part, batch_format="pyarrow",
                            batch_size=65536) \
        .groupby(["event_type", "value"]) \
        .aggregate(Sum("_c", alias_name="c"))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "value"], ascending=[False, True])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "mode_value": [np.int64(g["value"].iloc[0])],
            "mode_count": [np.int64(g["c"].iloc[0])]})

    return counts.groupby("event_type") \
        .map_groups(argmax, batch_format="pandas").sort("event_type")


def events_user_ewma(sf_dir: str, lam: float = 0.9):
    """EWMA window shape — the recursive per-key scan
    (y_i = λ·y_{i-1} + (1-λ)·x_i, y_0 = x_0) that has no closed
    windowed-SQL form without numerically explosive pow tricks: the
    per-user series is a bounded ``map_groups`` (group = one user's
    events, ordered by ts then event_id), the classic
    sessionize-and-scan pattern. Golden-gated (recursion order makes
    float recomputation engine-specific; values round to 6dp)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        x = g["value"].to_numpy(np.float64)
        y = np.empty_like(x)
        acc = x[0]
        for i, v in enumerate(x):  # bounded: one user's events
            acc = v if i == 0 else lam * acc + (1.0 - lam) * v
            y[i] = acc
        g["ewma"] = np.floor(np.abs(y) * 1e6 + 0.5) \
            * np.sign(y) / 1e6
        return g[["event_id", "user_id", "ewma"]]

    return ev.groupby("user_id") \
        .map_groups(scan, batch_format="pandas") \
        .sort("event_id")


def events_resample_hourly(sf_dir: str):
    """Gap-filled hourly resample — the time-series densification
    shape (missing (type, hour) cells become explicit zero rows so
    downstream window math sees a regular grid). Aggregation reduces
    through per-batch (type, hour) partials into one groupby; the
    dense axis is types × hours — bounded by the TIMELINE, not event
    volume (720 h/month × |types|), so the reindex finishes driver-
    side on the already-aggregated table. sum_value rounds to 4dp
    (the events_daily convention)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "hour": pc.strftime(batch.column("ts"),
                                format="%Y-%m-%d %H:00").to_pandas(),
            "n": np.int64(1),
            "sum_value": batch.column("value")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_value", alias_name="sum_value")) \
        .to_pandas()

    hours = pd.date_range(agg["hour"].min(), agg["hour"].max(),
                          freq="h").strftime("%Y-%m-%d %H:00")
    types = np.sort(agg["event_type"].unique())
    axis = pd.MultiIndex.from_product(
        [types, hours], names=["event_type", "hour"])
    dense = agg.set_index(["event_type", "hour"]) \
        .reindex(axis).reset_index()
    dense["n"] = dense["n"].fillna(0).astype(np.int64)
    dense["sum_value"] = np.round(
        dense["sum_value"].fillna(0.0).to_numpy(np.float64), 4)
    dense = dense.sort_values(["event_type", "hour"])
    return pa.Table.from_pandas(dense, preserve_index=False)


def events_weekly_retention(sf_dir: str, anchor: str = "2024-01-01"):
    """Cohort retention — the product-analytics triangle: users
    cohorted by their FIRST active week, counted in every later week
    they return. Weeks are integer indices from ``anchor``
    (days-since-anchor // 7) so both engines share exact integer
    arithmetic instead of engine-specific week-start conventions.

    Scale shape: the cohort map is a (user → min week) groupby fed by
    per-batch partials; activity is per-batch-deduped (user, week)
    rows into the same kind of groupby; ONE user-keyed hash join
    attaches cohorts to activity; the final (cohort, week) count is a
    triangle bounded by weeks², never by event volume."""
    from .dedup import _join_parts

    a0 = np.datetime64(anchor, "D")
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def weeks(batch: pa.Table) -> pd.DataFrame:
        day = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        return pd.DataFrame({
            "user_id": batch.column("user_id")
                .to_numpy(zero_copy_only=False),
            "week": ((day - a0).astype(np.int64) // 7)})

    def cohort_part(batch: pa.Table) -> pa.Table:
        g = weeks(batch).groupby("user_id", as_index=False)["week"] \
            .min().rename(columns={"week": "cohort_week"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cohorts = ds.map_batches(cohort_part, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby("user_id") \
        .aggregate(Min("cohort_week", alias_name="cohort_week"))

    def act_part(batch: pa.Table) -> pa.Table:
        g = weeks(batch).drop_duplicates()
        g["_one"] = np.int64(1)
        return pa.Table.from_pandas(g, preserve_index=False)

    activity = ds.map_batches(act_part, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby(["user_id", "week"]) \
        .aggregate(Max("_one", alias_name="_one")) \
        .select_columns(["user_id", "week"])

    joined = activity.join(cohorts, join_type="inner",
                           on=("user_id",),
                           num_partitions=_join_parts(activity,
                                                      cohorts))

    def tri_part(batch: pa.Table) -> pa.Table:
        df = batch.select(["cohort_week", "week"]).to_pandas()
        df["n_users"] = np.int64(1)
        g = df.groupby(["cohort_week", "week"],
                       as_index=False)["n_users"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return joined.map_batches(tri_part, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby(["cohort_week", "week"]) \
        .aggregate(Sum("n_users", alias_name="n_users")) \
        .sort(["cohort_week", "week"])


def events_funnel(sf_dir: str,
                  stages=("signup", "click", "purchase")):
    """Strict-sequence funnel — how many users reach each stage IN
    ORDER (the first qualifying event of stage k must come strictly
    after the stage-k-1 event that qualified): the subsequence-walk
    semantics real funnels use, not independent min-timestamps.

    Scale shape: the walk is per-user and each user's event list is
    bounded, so it runs inside ``groupby(user).map_groups`` (sort by
    ts, single pass); stage counts reduce through per-batch partials
    into a len(stages)-row groupby. Counts are cumulative (reached AT
    LEAST stage k)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        depth = 0
        for et in g["event_type"]:
            if depth < len(stages) and et == stages[depth]:
                depth += 1
        return pd.DataFrame({"depth": [np.int64(depth)]})

    depths = ds.groupby("user_id") \
        .map_groups(walk, batch_format="pandas")

    def cum_part(batch: pa.Table) -> pa.Table:
        d = batch.column("depth").to_numpy(zero_copy_only=False)
        ns = [np.int64((d >= k).sum()) for k in range(1,
                                                      len(stages) + 1)]
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1,
                                        dtype=np.int64)),
            "name": pa.array(list(stages), pa.string()),
            "n_users": pa.array(ns),
        })

    return depths.map_batches(cum_part, batch_format="pyarrow",
                              batch_size=None) \
        .groupby(["stage", "name"]) \
        .aggregate(Sum("n_users", alias_name="n_users")) \
        .sort("stage")


def events_type_transitions(sf_dir: str):
    """Markov transition matrix over per-user event sequences — the
    behavioral-model shape (what follows what): transition counts and
    row-normalized probabilities for consecutive event-type pairs in
    each user's ts-ordered stream.

    Scale shape: consecutive pairs are a per-user property, so the
    pair emission is a bounded ``groupby(user).map_groups`` (sort one
    user's events, zip with its shift); counts reduce through that
    stage's own partials into ONE (from, to) groupby, |types|²-sized;
    row normalization happens on the tiny matrix. p rounds to 6dp
    (ratio of counts; irrational in practice)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type",
                                  "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": [], "to_type": [],
                                 "c": []})
        df = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
        df["c"] = np.int64(1)
        return df.groupby(["from_type", "to_type"],
                          as_index=False)["c"].sum()

    counts = ds.groupby("user_id") \
        .map_groups(pairs, batch_format="pandas") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("c", alias_name="n")).to_pandas()

    tot = counts.groupby("from_type")["n"].transform("sum") \
        .to_numpy(np.float64)
    counts["n"] = counts["n"].astype(np.int64)
    counts["p"] = np.floor(counts["n"].to_numpy(np.float64)
                           / tot * 1e6 + 0.5) / 1e6
    counts = counts.sort_values(["from_type", "to_type"])
    return pa.Table.from_pandas(counts, preserve_index=False)


def _skyline_2d(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean survivor mask of the 2-D Pareto front (minimize price,
    maximize size): p dominates q iff price ≤ AND size ≥ with at least
    one strict. Sort-based O(n log n): at each distinct price, only the
    group-max size can survive (a same-price larger size strictly
    dominates), and it survives iff it strictly beats the best size
    among strictly-cheaper points; exact (price, size) duplicates are
    mutually non-dominating and all survive."""
    order = np.lexsort((-size, price))
    p_s, s_s = price[order], size[order]
    # group-max size per distinct price (groups are contiguous; the
    # first row of each group carries the max thanks to -size sort key)
    new_grp = np.ones(len(p_s), dtype=bool)
    new_grp[1:] = p_s[1:] != p_s[:-1]
    gmax = np.maximum.accumulate(np.where(new_grp, s_s, -np.inf))
    # best size among STRICTLY cheaper points = running max of previous
    # groups' maxes
    grp_id = np.cumsum(new_grp) - 1
    grp_max = s_s[new_grp]          # max size of each group, in order
    prev_best = np.full(len(grp_max), -np.inf)
    if len(grp_max) > 1:
        prev_best[1:] = np.maximum.accumulate(grp_max)[:-1]
    keep_sorted = (s_s == gmax) & (s_s > prev_best[grp_id])
    keep = np.zeros(len(price), dtype=bool)
    keep[order] = keep_sorted
    return keep


def part_skyline(sf_dir: str, collect_cap: int = 1_000_000):
    """2-D skyline of the part table — the Pareto-optimal set on
    (minimize p_retailprice, maximize p_size), the classic
    multi-criteria shortlist operator (Börzsönyi et al., ICDE 2001).

    Scale shape (local-prune-then-merge): a point dominated inside any
    block is dominated globally, so a per-batch vectorized skyline is a
    sound combiner — each block's survivors (the only rows that cross
    the wire) are merged and the same kernel runs once more on the
    union. The union is the data's Pareto-front envelope, typically
    tiny; guarded loud by ``collect_cap`` for adversarial anti-
    correlated data where the front IS the table."""
    ds = _read(sf_dir, "part",
               ["p_partkey", "p_retailprice", "p_size"])

    def local(batch: pa.Table) -> pa.Table:
        price = batch.column("p_retailprice") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        size = batch.column("p_size") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(_skyline_2d(price, size)))

    cand = ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)
    n_cand = cand.count()
    if n_cand > collect_cap:
        raise ValueError(
            f"part_skyline: {n_cand} local-skyline survivors exceed "
            f"collect_cap={collect_cap} — the Pareto front itself is "
            "driver-sized by assumption; partition the value space "
            "for anti-correlated data")
    import ray

    blocks = [ray.get(r) for r in cand.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows > 0] or blocks[:1]
    t = pa.concat_tables(blocks)
    price = t.column("p_retailprice").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    size = t.column("p_size").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    final = t.filter(pa.array(_skyline_2d(price, size)))
    idx = np.lexsort((final.column("p_partkey").to_numpy(
        zero_copy_only=False),
        final.column("p_retailprice").to_numpy(zero_copy_only=False)))
    final = final.take(pa.array(idx, pa.int64()))
    return pa.table({
        "p_partkey": final.column("p_partkey").cast(pa.int64()),
        "p_retailprice": final.column("p_retailprice")
        .cast(pa.float64()),
        "p_size": final.column("p_size").cast(pa.int64()),
    })


def grouped_weighted_median_distributed(ds, key_col: str, val_col: str,
                                        weight_col: str,
                                        bins: int = 4096,
                                        collect_cap: int = 262_144,
                                        max_keys: int = 10_000
                                        ) -> pa.Table:
    """Exact per-group WEIGHTED (lower) median — smallest v such that
    the cumulative weight of values ≤ v reaches half the group's total
    weight (2·cum ≥ W in exact integer space) — without ever holding a
    group in one task. The weighted twin of
    ``grouped_median_distributed``: same selection-by-histogram loop,
    with per-bin WEIGHT sums locating the crossing bin and per-bin ROW
    counts driving the ≤``collect_cap`` collection trigger.

    Weights must be integral (the caller's contract; quantities,
    counts, byte sizes): partial sums then stay exact in float64 up to
    2^53 total weight (~9·10^15 — beyond a 100 TB table of unit-ish
    weights), so the 2·cum ≥ W comparison can never drift across
    engines. Below-window weight is recounted fresh every pass, the
    grouped_median convention that keeps bin-edge float noise out of
    the rank arithmetic. Returns (key_col, wmedian, total_weight)."""
    import math as _math

    import ray

    stats = {
        r[key_col]: r
        for r in ds.groupby(key_col).aggregate(
            Count(alias_name="_n"),
            Sum(weight_col, alias_name="_w"),
            Min(val_col, alias_name="_lo"),
            Max(val_col, alias_name="_hi"),
        ).take_all()
    }
    if len(stats) > max_keys:
        raise ValueError(
            f"grouped_weighted_median_distributed: {len(stats)} keys "
            f"exceeds max_keys={max_keys}; use groupby.map_groups at "
            "high key cardinality instead")
    state = {}
    for k, r in stats.items():
        w = float(r["_w"])
        if not _math.isclose(w, round(w), abs_tol=1e-9):
            raise ValueError(
                "grouped_weighted_median_distributed: weights must be "
                f"integral, got group total {w!r}")
        state[k] = {"lo": float(r["_lo"]), "hi": float(r["_hi"]),
                    "W": float(round(w)), "cand": int(r["_n"])}

    def _hist_pass(windows):
        """One full scan → per key: below-window weight (bin −1) and
        per-bin (weight, rows) inside [lo, hi]; per-batch partials
        merged by a tiny groupby (n_keys × (bins+1) rows)."""
        ref = ray.put(windows)

        def hist(batch: pa.Table, ref=ref, bins=bins, key_col=key_col,
                 val_col=val_col, weight_col=weight_col) -> pa.Table:
            import ray as _ray

            win = _ray.get(ref)
            keys_list = list(win)
            kidx = {k: i for i, k in enumerate(keys_list)}
            los = np.array([win[k][0] for k in keys_list], np.float64)
            his = np.array([win[k][1] for k in keys_list], np.float64)
            g = pd.Series(batch.column(key_col).to_pandas()) \
                .map(kidx).to_numpy(np.float64)
            present = ~np.isnan(g)
            gi = g[present].astype(np.int64)
            vals = batch.column(val_col) \
                .to_numpy(zero_copy_only=False) \
                .astype(np.float64)[present]
            wts = batch.column(weight_col) \
                .to_numpy(zero_copy_only=False) \
                .astype(np.float64)[present]
            lo_r, hi_r = los[gi], his[gi]
            G = len(keys_list)
            out_k, out_b, out_w, out_c = [], [], [], []
            bmask = vals < lo_r
            below = np.bincount(gi[bmask], weights=wts[bmask],
                                minlength=G)
            for gidx in np.nonzero(below)[0]:
                out_k.append(keys_list[gidx])
                out_b.append(-1)
                out_w.append(float(below[gidx]))
                out_c.append(0)
            inw = (vals >= lo_r) & (vals <= hi_r)
            if inw.any():
                gi_in, v_in = gi[inw], vals[inw]
                w_in = wts[inw]
                width = (his - los) / bins
                w_r = width[gi_in]
                safe = np.where(w_r > 0, w_r, 1.0)
                idx = np.where(
                    w_r > 0,
                    np.clip(((v_in - los[gi_in]) / safe)
                            .astype(np.int64), 0, bins - 1),
                    0)
                flat = gi_in * bins + idx
                bw = np.bincount(flat, weights=w_in,
                                 minlength=G * bins)
                bc = np.bincount(flat, minlength=G * bins)
                nz = np.nonzero(bc)[0]
                out_k.extend(keys_list[int(f)] for f in nz // bins)
                out_b.extend((nz % bins).tolist())
                out_w.extend(bw[nz].tolist())
                out_c.extend(bc[nz].tolist())
            return pa.table({
                "_k": pa.array(out_k),
                "_bin": pa.array(out_b, type=pa.int64()),
                "_w": pa.array(out_w, type=pa.float64()),
                "_cnt": pa.array(out_c, type=pa.int64()),
            })

        parts = ds.map_batches(hist, batch_format="pyarrow",
                               batch_size=65536) \
            .groupby(["_k", "_bin"]) \
            .aggregate(Sum("_w", alias_name="_sw"),
                       Sum("_cnt", alias_name="_sc")) \
            .take_all()
        by_key: dict = {}
        for row in parts:
            by_key.setdefault(row["_k"], {})[int(row["_bin"])] = \
                (float(row["_sw"]), int(row["_sc"]))
        return by_key

    it = 0
    while sum(s["cand"] for s in state.values()
              if s["lo"] < s["hi"]) > collect_cap and it < 48:
        it += 1
        act = {k: s for k, s in state.items() if s["lo"] < s["hi"]}
        by_key = _hist_pass(
            {k: (s["lo"], s["hi"]) for k, s in act.items()})
        progressed = False
        for k, s in act.items():
            counts = by_key.get(k, {})
            below_w = counts.pop(-1, (0.0, 0))[0]
            lo, hi = s["lo"], s["hi"]
            width = (hi - lo) / bins
            cum, b_hit = below_w, None
            for b in sorted(counts):
                bw, _bc = counts[b]
                if 2.0 * (cum + bw) >= s["W"]:
                    b_hit = b
                    break
                cum += bw
            if b_hit is None:
                continue  # defensive: collect as-is later
            new_lo = lo + b_hit * width
            new_hi = hi if b_hit == bins - 1 \
                else lo + (b_hit + 1) * width
            if (new_lo, new_hi) != (lo, hi):
                progressed = True
            s["lo"], s["hi"] = new_lo, new_hi
            s["cand"] = counts[b_hit][1]
        if not progressed:
            break

    solved = {k: s["lo"] for k, s in state.items() if s["lo"] == s["hi"]}
    windows = {k: (s["lo"], s["hi"]) for k, s in state.items()
               if k not in solved}
    results = dict(solved)
    if windows:
        ref = ray.put(windows)

        def in_window(batch: pa.Table, ref=ref, key_col=key_col,
                      val_col=val_col,
                      weight_col=weight_col) -> pa.Table:
            import ray as _ray

            win = _ray.get(ref)
            karr = np.asarray(batch.column(key_col).to_pylist(),
                              dtype=object)
            vals = batch.column(val_col) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            wts = batch.column(weight_col) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            mask = np.zeros(len(vals), dtype=bool)
            below_k, below_w = [], []
            for k, (lo, hi) in win.items():
                km = karr == k
                mask |= km & (vals >= lo) & (vals <= hi)
                bw = float(wts[km & (vals < lo)].sum())
                if bw:
                    below_k.append(k)
                    below_w.append(bw)
            t = pa.table({
                "_k": pa.array(karr[mask].tolist()),
                "_v": pa.array(vals[mask], pa.float64()),
                "_w": pa.array(wts[mask], pa.float64()),
            })
            if below_k:
                t = pa.concat_tables([t, pa.table({
                    "_k": pa.array(below_k),
                    "_v": pa.array([np.nan] * len(below_k),
                                   pa.float64()),
                    "_w": pa.array(below_w, pa.float64()),
                })])
            return t

        rows = ds.map_batches(in_window, batch_format="pyarrow",
                              batch_size=65536).take_all()
        cand: dict = {}
        below: dict = {}
        for r in rows:
            if r["_v"] != r["_v"]:  # NaN marker = below-window weight
                below[r["_k"]] = below.get(r["_k"], 0.0) + r["_w"]
            else:
                cand.setdefault(r["_k"], []).append((r["_v"], r["_w"]))
        for k in windows:
            pairs = sorted(cand.get(k, []))
            cum = below.get(k, 0.0)
            W = state[k]["W"]
            ans = windows[k][0]
            for v, w in pairs:
                cum += w
                if 2.0 * cum >= W:
                    ans = v
                    break
            results[k] = ans

    keys = sorted(results)
    return pa.table({
        key_col: pa.array(keys),
        "wmedian": pa.array([results[k] for k in keys], pa.float64()),
        "total_weight": pa.array([int(state[k]["W"]) for k in keys],
                                 pa.int64()),
    })


def lineitem_weighted_median(sf_dir: str):
    """Quantity-weighted median extended price per return flag — the
    weighted-percentile shape (every unit of quantity votes for its
    line's price; the crossing price is where half the shipped units
    sit below). Exact, via the distributed weighted histogram
    selection — no task ever holds a flag's rows."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    t = grouped_weighted_median_distributed(
        ds, "l_returnflag", "l_extendedprice", "l_quantity")
    return pa.table({
        "l_returnflag": t.column("l_returnflag"),
        "wmedian_price": pc.round(t.column("wmedian"), 2,
                                  round_mode="half_towards_infinity"),
        "total_qty": t.column("total_weight"),
    })


def lineitem_var_by_flag(sf_dir: str):
    """VAR_SAMP / STDDEV_SAMP aggregate shape — the same
    parallelizable-moments reduction as ``lineitem_corr_by_flag``
    ((n, Σx, Σx²) partials per flag, one tiny groupby, algebra on the
    driver); 6dp rounding on ratios of large sums."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sxx": x * x})
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = li.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("l_returnflag") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sxx", alias_name="sxx")).to_pandas()

    n = mom["n"].to_numpy(np.float64)
    var = (mom["sxx"] - mom["sx"] ** 2 / n) / (n - 1)

    def _r6(v):
        return np.floor(np.asarray(v, np.float64) * 1e6 + 0.5) / 1e6

    out = pd.DataFrame({
        "l_returnflag": mom["l_returnflag"],
        "n": mom["n"].astype(np.int64),
        "avg_qty": _r6(mom["sx"] / n),
        "var_qty": _r6(var),
        "stddev_qty": _r6(np.sqrt(var)),
    }).sort_values("l_returnflag")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_value_ttest(sf_dir: str, type_a: str = "purchase",
                       type_b: str = "error"):
    """Welch's two-sample t-test between two event types' value
    distributions — the continuous-outcome significance audit next to
    the categorical ``segment_priority_chisq``: t = (m_a − m_b) /
    sqrt(v_a/n_a + v_b/n_b) with the Welch–Satterthwaite df. One
    summary row.

    Scale shape: the parallelizable-moments reduction ((n, Σx, Σx²)
    partials per type through a per-batch combiner, one two-row
    groupby), algebra on the driver — event volume never crosses the
    wire. Same var_samp formula and 6dp ratio rounding as
    ``lineitem_var_by_flag``."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.is_in(batch.column("event_type"),
                     value_set=pa.array([type_a, type_b])))
        x = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sxx": x * x})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = ev.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sxx", alias_name="sxx")) \
        .to_pandas().set_index("event_type")

    def stats(t):
        n = float(mom.loc[t, "n"])
        m = mom.loc[t, "sx"] / n
        v = (mom.loc[t, "sxx"] - mom.loc[t, "sx"] ** 2 / n) / (n - 1)
        return n, m, v

    na, ma, va = stats(type_a)
    nb, mb, vb = stats(type_b)
    se2 = va / na + vb / nb
    t_stat = (ma - mb) / np.sqrt(se2)
    df_w = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                       + (vb / nb) ** 2 / (nb - 1))
    return pa.table({
        "n_a": pa.array([int(na)], pa.int64()),
        "n_b": pa.array([int(nb)], pa.int64()),
        "mean_diff": pa.array([round(float(ma - mb), 6)], pa.float64()),
        "t_stat": pa.array([round(float(t_stat), 6)], pa.float64()),
        "df_welch": pa.array([round(float(df_w), 6)], pa.float64()),
    })


def events_value_mannwhitney(sf_dir: str, type_a: str = "purchase",
                             type_b: str = "error"):
    """Mann–Whitney U (Wilcoxon rank-sum) between two event types'
    value distributions — the NONPARAMETRIC twin of
    ``events_value_ttest``: U_a = Σ over pairs 1[x_a > x_b] +
    ½·1[x_a = x_b], with the normal approximation z-score under the
    exact tie correction. One summary row.

    Scale shape: U is computed from the per-distinct-value group
    histogram, never from ranks of individual rows — (value, n_a, n_b)
    via ``sorted_keyed_sum`` (the high-cardinality sort + run-length
    reduction), then ONE distributed exclusive prefix scan of n_b over
    value order (the pack_sequences two-pass block-offset pattern)
    turns each value's pair contribution n_a·(cumB(<v) + ½·n_b(v))
    into a per-block local sum. Totals and the tie term Σ(t³−t) are
    plain Dataset sums. All counts are integers (exact in float64);
    U is exact to the half."""
    import ray

    from ..functions.sortagg import sorted_keyed_sum

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        m = pc.is_in(et, value_set=pa.array([type_a, type_b]))
        batch = batch.filter(m)
        et = batch.column("event_type").to_pylist()
        return pa.table({
            "value": batch.column("value").cast(pa.float64()),
            "a": pa.array([1 if t == type_a else 0 for t in et],
                          pa.int64()),
            "b": pa.array([1 if t == type_b else 0 for t in et],
                          pa.int64()),
        })

    g = sorted_keyed_sum(ev.map_batches(prep, batch_format="pyarrow",
                                        batch_size=65536),
                         "value", ["a", "b"])
    g2 = g.sort("value").materialize()

    na_tot = int(g2.sum("a") or 0)
    nb_tot = int(g2.sum("b") or 0)
    n_tot = na_tot + nb_tot

    def tie_term(batch: pa.Table) -> pa.Table:
        t = (batch.column("a").to_numpy(zero_copy_only=False)
             + batch.column("b").to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pa.table({"_t3": pa.array([float((t ** 3 - t).sum())])})

    ties = float(g2.map_batches(tie_term, batch_format="pyarrow",
                                batch_size=None).sum("_t3") or 0.0)

    # pass 1: per-block (min value, Σ n_b) partials -> driver cumsum.
    # g2 rows are unique per value, so block-min keys are distinct.
    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bid": pa.array([], pa.float64()),
                             "tb": pa.array([], pa.int64())})
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "bid": pa.array([float(v.min())], pa.float64()),
            "tb": pa.array([int(batch.column("b").to_numpy().sum())],
                           pa.int64()),
        })

    blocks = sorted(
        (r["bid"], r["tb"])
        for r in g2.map_batches(block_partial, batch_format="pyarrow",
                                batch_size=None).iter_rows())
    bases = {}
    run = 0
    for bid, tb in blocks:
        bases[bid] = run
        run += tb
    bref = ray.put(bases)

    def contrib(batch: pa.Table, bref=bref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"_u": pa.array([], pa.float64())})
        bases = ray.get(bref)
        df = batch.to_pandas().sort_values("value")
        base = bases[float(df["value"].iloc[0])]
        nb = df["b"].to_numpy(np.float64)
        na = df["a"].to_numpy(np.float64)
        cumb = base + np.cumsum(nb) - nb
        return pa.table({"_u": pa.array(
            [float((na * (cumb + 0.5 * nb)).sum())])})

    u_a = float(g2.map_batches(contrib, batch_format="pyarrow",
                               batch_size=None).sum("_u") or 0.0)
    mu = na_tot * nb_tot / 2.0
    sigma = np.sqrt(na_tot * nb_tot / 12.0
                    * ((n_tot + 1) - ties / (n_tot * (n_tot - 1.0))))
    return pa.table({
        "n_a": pa.array([na_tot], pa.int64()),
        "n_b": pa.array([nb_tot], pa.int64()),
        "u_stat": pa.array([round(u_a, 6)], pa.float64()),
        "z_score": pa.array([round(float((u_a - mu) / sigma), 6)],
                            pa.float64()),
    })


def events_value_ks(sf_dir: str, type_a: str = "purchase",
                    type_b: str = "error"):
    """Two-sample Kolmogorov–Smirnov statistic between two event
    types' value distributions — D = max over values of
    |ECDF_a(v) − ECDF_b(v)| — the distribution-shift audit that
    completes the test family (chi-square, Welch t, Mann–Whitney).
    One summary row (n_a, n_b, d_stat, at the arg-max value).

    Scale shape: identical skeleton to ``events_value_mannwhitney`` —
    per-distinct-value (n_a, n_b) via sorted_keyed_sum, TWO exclusive
    prefix-scan bases (one per group) shipped as one tiny row per
    block, then each block computes its local max of the inclusive
    ECDF gap; the global max and its lowest witnessing value reduce
    over blocks. Counts are integers, the gap is one division each —
    round(6) exact enough for the hash gate."""
    import ray

    from ..functions.sortagg import sorted_keyed_sum

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("event_type"),
                     value_set=pa.array([type_a, type_b]))
        batch = batch.filter(m)
        et = batch.column("event_type").to_pylist()
        return pa.table({
            "value": batch.column("value").cast(pa.float64()),
            "a": pa.array([1 if t == type_a else 0 for t in et],
                          pa.int64()),
            "b": pa.array([1 if t == type_b else 0 for t in et],
                          pa.int64()),
        })

    g2 = sorted_keyed_sum(
        ev.map_batches(prep, batch_format="pyarrow",
                       batch_size=65536),
        "value", ["a", "b"]).sort("value").materialize()

    na_tot = int(g2.sum("a") or 0)
    nb_tot = int(g2.sum("b") or 0)

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bid": pa.array([], pa.float64()),
                             "ta": pa.array([], pa.int64()),
                             "tb": pa.array([], pa.int64())})
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "bid": pa.array([float(v.min())], pa.float64()),
            "ta": pa.array([int(batch.column("a").to_numpy().sum())],
                           pa.int64()),
            "tb": pa.array([int(batch.column("b").to_numpy().sum())],
                           pa.int64()),
        })

    blocks = sorted(
        (r["bid"], r["ta"], r["tb"])
        for r in g2.map_batches(block_partial, batch_format="pyarrow",
                                batch_size=None).iter_rows())
    bases = {}
    ra = rb = 0
    for bid, ta, tb in blocks:
        bases[bid] = (ra, rb)
        ra += ta
        rb += tb
    bref = ray.put(bases)

    def local_max(batch: pa.Table, bref=bref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"d": pa.array([], pa.float64()),
                             "at_value": pa.array([], pa.float64())})
        bases = ray.get(bref)
        df = batch.to_pandas().sort_values("value")
        base_a, base_b = bases[float(df["value"].iloc[0])]
        ca = base_a + np.cumsum(df["a"].to_numpy(np.float64))
        cb = base_b + np.cumsum(df["b"].to_numpy(np.float64))
        gap = np.abs(ca / na_tot - cb / nb_tot)
        i = int(np.argmax(gap))    # first (lowest-value) max in block
        return pa.table({
            "d": pa.array([float(gap[i])], pa.float64()),
            "at_value": pa.array([float(df["value"].iloc[i])],
                                 pa.float64()),
        })

    rows = g2.map_batches(local_max, batch_format="pyarrow",
                          batch_size=None).take_all()
    best = max(rows, key=lambda r: (r["d"], -r["at_value"]))
    return pa.table({
        "n_a": pa.array([na_tot], pa.int64()),
        "n_b": pa.array([nb_tot], pa.int64()),
        "d_stat": pa.array([round(float(best["d"]), 6)], pa.float64()),
        "at_value": pa.array([float(best["at_value"])], pa.float64()),
    })


def orders_fanout_audit(sf_dir: str):
    """Join-key fanout / skew audit of orders.o_custkey — the
    shuffle-safety check a 100 TB engine runs before keying an
    exchange on a column: per-key multiplicities, their exact p50/p99
    (smallest c with #keys(count ≤ c) ≥ ⌈q·n_keys⌉), the max, and the
    max/mean skew factor. One summary row.

    Scale shape: groupby(key).count is the operator's inherent
    exchange; the COUNT-OF-COUNTS histogram (one more tiny groupby —
    ≤ max-multiplicity rows) is the entire quantile state, so the
    driver never sees a key. Integer-exact selection, one rounded
    ratio."""
    import math

    from ray.data.aggregate import Count as _Count

    ds = _read(sf_dir, "orders", ["o_custkey"])
    counts = ds.groupby("o_custkey").aggregate(
        _Count(alias_name="n"))
    hist = counts.groupby("n").aggregate(
        _Count(alias_name="k")).to_pandas().sort_values("n")
    ns = hist["n"].to_numpy(np.int64)
    ks = hist["k"].to_numpy(np.int64)
    n_keys = int(ks.sum())
    n_rows = int((ns * ks).sum())
    max_n = int(ns.max())
    ck = np.cumsum(ks)

    def q_at(q: float) -> int:
        need = math.ceil(q * n_keys)
        return int(ns[int(np.searchsorted(ck, need))])

    skew = max_n / (n_rows / n_keys)
    return pa.table({
        "n_keys": pa.array([n_keys], pa.int64()),
        "n_rows": pa.array([n_rows], pa.int64()),
        "max_fanout": pa.array([max_n], pa.int64()),
        "p50_fanout": pa.array([q_at(0.5)], pa.int64()),
        "p99_fanout": pa.array([q_at(0.99)], pa.int64()),
        "skew_factor": pa.array([round(float(skew), 6)], pa.float64()),
    })


def orders_benford_audit(sf_dir: str):
    """Benford first-significant-digit audit of o_totalprice — the
    fraud/synthetic-data fingerprint: observed digit shares vs the
    Benford expectation log10(1 + 1/d), with each digit's chi-square
    contribution. Nine rows.

    Scale shape: digit = ⌊x / 10^⌊log10 x⌋⌋ is a stateless vectorized
    map; a per-batch 9-cell combiner reduces every block, one tiny
    groupby merges. The same float ops the oracle SQL spells out, so
    digits agree exactly and the shares round-stable at 6dp."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("o_totalprice") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[x > 0]
        d = np.floor(x / np.power(10.0, np.floor(np.log10(x)))) \
            .astype(np.int64)
        bc = np.bincount(d, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(bc.astype(np.int64)),
        })

    agg = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("digit").aggregate(Sum("n", alias_name="n")) \
        .to_pandas().sort_values("digit")
    n = agg["n"].to_numpy(np.float64)
    total = n.sum()
    digits = agg["digit"].to_numpy(np.int64)
    expected = np.log10(1.0 + 1.0 / digits)
    share = n / total
    chi = (n - total * expected) ** 2 / (total * expected)
    return pa.table({
        "digit": pa.array(digits),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "share": pa.array(np.round(share, 6), pa.float64()),
        "benford": pa.array(np.round(expected, 6), pa.float64()),
        "chi2_part": pa.array(np.round(chi, 6), pa.float64()),
    })


def events_daily_theilsen(sf_dir: str):
    """Theil–Sen robust slope of the daily revenue series — the
    median of all pairwise slopes (y_j − y_i)/(d_j − d_i), the
    outlier-immune trend estimator next to the OLS
    ``events_value_trend``. One summary row (n_days, slope,
    intercept = median(y − slope·d)).

    Scale shape: the heavy reduction is the daily aggregate (per-batch
    combiner + one tiny groupby — the events_daily shape); the
    pairwise-slope finisher runs on the BOUNDED daily series
    driver-side (n_days² pairs; n_days is a calendar, not a data,
    dimension — the events_daily_anomaly convention)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day")
    d = daily["day"].to_numpy(np.float64)
    y = daily["rev"].to_numpy(np.float64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = (y[j] - y[i]) / (d[j] - d[i])
    slope = float(np.median(slopes))
    intercept = float(np.median(y - slope * d))
    return pa.table({
        "n_days": pa.array([len(d)], pa.int64()),
        "slope": pa.array([round(slope, 6)], pa.float64()),
        "intercept": pa.array([round(intercept, 4)], pa.float64()),
    })


def events_daily_cusum(sf_dir: str):
    """One-sided CUSUM change-point statistics over the daily revenue
    series — S⁺_t = max(0, S⁺_{t−1} + (x_t − μ)) and the mirrored
    S⁻_t, the drift-detection recursion a monitoring pipeline runs on
    its own aggregates (Page 1954). Per-day rows
    (day, revenue, cusum_pos, cusum_neg).

    Scale shape: the daily aggregate is the distributed reduction
    (events_daily combiner shape); the CUSUM recursion is inherently
    sequential and runs on the BOUNDED daily series driver-side (a
    calendar dimension — the events_daily_anomaly convention). μ is
    the series mean, so both engines derive every input identically."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    y = daily["rev"].to_numpy(np.float64)
    mu = y.sum() / len(y)
    pos = np.zeros(len(y))
    neg = np.zeros(len(y))
    sp = sn = 0.0
    for idx, x in enumerate(y):
        sp = max(0.0, sp + (x - mu))
        sn = max(0.0, sn + (mu - x))
        pos[idx] = sp
        neg[idx] = sn
    return pa.table({
        "day": pa.array(daily["day"].to_numpy(np.int64)),
        "revenue": pa.array(np.round(y, 4), pa.float64()),
        "cusum_pos": pa.array(np.round(pos, 4), pa.float64()),
        "cusum_neg": pa.array(np.round(neg, 4), pa.float64()),
    })


def orderkey_join_size_estimate(sf_dir: str):
    """Exact join-cardinality audit for orders ⋈ lineitem on orderkey
    — |A ⋈ B| = Σ_k c_A(k)·c_B(k), the number a planner must know
    before keying a 100 TB exchange (here exact, because the count
    tables ARE the sufficient statistic). One summary row with both
    sides' key counts, the overlap, and the joined row count.

    Scale shape: one groupby-count per side (each side's inherent
    reduction), an inner join of the two COUNT tables (key-sized, not
    row-sized), and a Σ c_a·c_b map-sum. The full join never runs."""
    from ray.data.aggregate import Count as _Count

    o = _read(sf_dir, "orders", ["o_orderkey"]) \
        .groupby("o_orderkey").aggregate(_Count(alias_name="ca")) \
        .materialize()
    li = _read(sf_dir, "lineitem", ["l_orderkey"]) \
        .groupby("l_orderkey").aggregate(_Count(alias_name="cb")) \
        .materialize()
    n_a = o.count()
    n_b = li.count()
    j = o.join(li.rename_columns({"l_orderkey": "o_orderkey"}),
               "inner", _join_ray_parts(o, li),
               on=("o_orderkey",))

    def prod(batch: pa.Table) -> pa.Table:
        p = batch.column("ca").to_numpy(zero_copy_only=False) \
            .astype(np.int64) \
            * batch.column("cb").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"rows": pa.array([int(p.sum())], pa.int64()),
                         "keys": pa.array([batch.num_rows],
                                          pa.int64())})

    pr = j.map_batches(prod, batch_format="pyarrow",
                       batch_size=None).materialize()
    join_rows = int(pr.sum("rows") or 0)
    n_common = int(pr.sum("keys") or 0)
    return pa.table({
        "n_keys_orders": pa.array([n_a], pa.int64()),
        "n_keys_lineitem": pa.array([n_b], pa.int64()),
        "n_common_keys": pa.array([n_common], pa.int64()),
        "join_rows": pa.array([join_rows], pa.int64()),
    })


def events_neyman_allocation(sf_dir: str, budget: int = 1000):
    """Neyman optimal stratified-sampling allocation over event types —
    n_h = budget · N_h·σ_h / Σ N_i·σ_i, the sampling-design step before
    a stratified draw (the repo's doc_stratified_sample executes such a
    design). One row per stratum with N_h, σ_h, the real-valued
    allocation and its largest-remainder integer rounding (which sums
    exactly to the budget).

    Scale shape: the ubiquitous (n, Σx, Σx²) moment combiner + one tiny
    groupby; the allocation algebra runs on the bounded stratum table.
    σ is population (VAR_POP) — the design-theory convention."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sxx": x * x})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = ev.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sxx", alias_name="sxx")) \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    n = mom["n"].to_numpy(np.float64)
    sigma = np.sqrt(mom["sxx"].to_numpy(np.float64) / n
                    - (mom["sx"].to_numpy(np.float64) / n) ** 2)
    w = n * sigma
    alloc = budget * w / w.sum()
    # largest-remainder rounding: floor, then +1 to the largest
    # fractional parts (ties to the earlier stratum in type order)
    base = np.floor(alloc).astype(np.int64)
    short = budget - int(base.sum())
    order = np.argsort(-(alloc - base), kind="stable")
    base[order[:short]] += 1
    return pa.table({
        "event_type": pa.array(mom["event_type"].tolist(),
                               pa.string()),
        "n_rows": pa.array(mom["n"].to_numpy(np.int64)),
        "sigma": pa.array(np.round(sigma, 6), pa.float64()),
        "alloc_real": pa.array(np.round(alloc, 6), pa.float64()),
        "alloc_n": pa.array(base, pa.int64()),
    })


def lineitem_skew_by_flag(sf_dir: str):
    """SKEWNESS / KURTOSIS aggregate shape — raw power-sum partials
    (n, Σx, Σx², Σx³, Σx⁴) per flag per block, one tiny groupby, then
    DuckDB's bias-corrected formulas on the driver (adjusted
    Fisher-Pearson skew ``g1·sqrt(n(n-1))/(n-2)``; sample excess
    kurtosis ``(n-1)·((n+1)·m4/m2² − 3(n-1))/((n-2)(n-3))``).
    Shuffle volume is 5 doubles per flag per block regardless of n."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        x2 = x * x
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sxx": x2,
            "_sx3": x2 * x, "_sx4": x2 * x2})
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = li.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("l_returnflag") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sxx", alias_name="sxx"),
                   Sum("_sx3", alias_name="sx3"),
                   Sum("_sx4", alias_name="sx4")).to_pandas()

    n = mom["n"].to_numpy(np.float64)
    sx = mom["sx"].to_numpy(np.float64)
    sxx = mom["sxx"].to_numpy(np.float64)
    sx3 = mom["sx3"].to_numpy(np.float64)
    sx4 = mom["sx4"].to_numpy(np.float64)
    m2 = (sxx - sx * sx / n) / n
    m3 = (sx3 - 3.0 * sxx * sx / n + 2.0 * sx ** 3 / (n * n)) / n
    m4 = (sx4 - 4.0 * sx3 * sx / n + 6.0 * sxx * sx * sx / (n * n)
          - 3.0 * sx ** 4 / n ** 3) / n
    skew = m3 / m2 ** 1.5 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
    kurt = ((n - 1.0) * ((n + 1.0) * m4 / (m2 * m2) - 3.0 * (n - 1.0))
            / ((n - 2.0) * (n - 3.0)))

    def _r6(v):
        return np.floor(np.asarray(v, np.float64) * 1e6 + 0.5) / 1e6

    out = pd.DataFrame({
        "l_returnflag": mom["l_returnflag"],
        "n": mom["n"].astype(np.int64),
        "skew_qty": _r6(skew),
        "kurt_qty": _r6(kurt),
    }).sort_values("l_returnflag")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_value_trend(sf_dir: str):
    """Grouped linear-regression aggregate (REGR_SLOPE/REGR_INTERCEPT
    shape): per event_type, OLS of value against time-in-days. Same
    parallelizable-moments reduction as lineitem_corr_by_flag: each
    batch emits (n, Σx, Σy, Σxy, Σx²) per type, one tiny groupby
    merges, the finish is algebra on ≤5 rows. Slope rounds to 6dp,
    intercept to 4dp (intercept amplifies slope ulps by x̄ ≈ 2·10⁴
    days; validated vs DuckDB at sf0.001/0.01)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        x = (t.astype("datetime64[us]").astype(np.int64) / 1e6) / 86400.0
        y = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sy": y,
            "_sxy": x * y, "_sxx": x * x})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = ev.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sy", alias_name="sy"),
                   Sum("_sxy", alias_name="sxy"),
                   Sum("_sxx", alias_name="sxx")).to_pandas()

    n = mom["n"].to_numpy(np.float64)
    slope = ((mom["sxy"] - mom["sx"] * mom["sy"] / n)
             / (mom["sxx"] - mom["sx"] ** 2 / n)).to_numpy()
    intercept = (mom["sy"].to_numpy() - slope * mom["sx"].to_numpy()) / n
    out = pd.DataFrame({
        "event_type": mom["event_type"],
        "n": mom["n"].astype(np.int64),
        "slope": np.floor(slope * 1e6 + 0.5) / 1e6,
        "intercept": np.floor(intercept * 1e4 + 0.5) / 1e4,
    }).sort_values("event_type")
    return pa.Table.from_pandas(out, preserve_index=False)


def user_event_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution — the
    information-theoretic grouped aggregate (user behavioral diversity;
    same shape as a class-balance audit on a labeled corpus). Count
    partials → one (user, type) groupby → bounded map_groups finish
    (group = one user's ≤|type| count rows)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(
                zero_copy_only=False),
            "event_type": batch.column("event_type").to_pandas()})
        df["_c"] = np.int64(1)
        g = df.groupby(["user_id", "event_type"], as_index=False)["_c"] \
            .sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ev.map_batches(part, batch_format="pyarrow",
                            batch_size=65536) \
        .groupby(["user_id", "event_type"]) \
        .aggregate(Sum("_c", alias_name="c"))

    def ent(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.float64)
        p = c / c.sum()
        h = float(-(p * np.log2(p)).sum())
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_events": [np.int64(c.sum())],
            "n_types": [np.int64(len(c))],
            "entropy": [np.floor(h * 1e6 + 0.5) / 1e6]})

    return counts.groupby("user_id").map_groups(ent,
                                                batch_format="pandas")


def doc_train_split(sf_dir: str):
    """Deterministic train/valid/test split assignment (80/10/10 by
    content-independent doc_id hash) — the reproducible-split operator
    every training pipeline needs: same doc always lands in the same
    split, independent of partitioning or row order. Stateless
    map_batches; the md5-prefix fraction is the repo's established
    hash-sampling convention (doc_hash_sample)."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    t_train = 3435973837          # ceil(0.8 * 2^32)
    t_valid = 3865470567          # ceil(0.9 * 2^32)

    def split(batch: pa.Table) -> pa.Table:
        vs = np.array([
            int(_hl.md5(str(d).encode()).hexdigest()[:8], 16)
            for d in batch.column("doc_id").to_pylist()
        ], dtype=np.int64)
        lab = np.where(vs < t_train, "train",
                       np.where(vs < t_valid, "valid", "test"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "split": pa.array(lab.tolist(), pa.string()),
        })

    return ds.map_batches(split, batch_format="pyarrow",
                          batch_size=8192)


def events_winsorized_stats(sf_dir: str):
    """Winsorized (clipped) grouped mean — the outlier-robust cleaning
    aggregate: per event_type, p05/p95 via the distributed histogram-
    selection quantile (no group ever sits in one task), values clipped
    to [p05, p95] with the 5-row bounds broadcast, then a plain
    sum/count mean. Two selection passes + one aggregate; DuckDB
    quantile_cont semantics throughout."""
    import ray

    ds = _read(sf_dir, "events", ["event_type", "value"])
    lo_t = grouped_median_distributed(ds, "event_type", "value", q=0.05)
    hi_t = grouped_median_distributed(ds, "event_type", "value", q=0.95)
    lo = {k: float(v) for k, v in
          zip(lo_t.column("event_type").to_pylist(),
              lo_t.column("median").to_pylist())}
    hi = {k: float(v) for k, v in
          zip(hi_t.column("event_type").to_pylist(),
              hi_t.column("median").to_pylist())}
    ref = ray.put((lo, hi))

    def clip(batch: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(ref)
        et = np.asarray(batch.column("event_type").to_pylist(),
                        dtype=object)
        uniq, inv = np.unique(et, return_inverse=True)
        lo_v = np.array([lo_m[u] for u in uniq])[inv]
        hi_v = np.array([hi_m[u] for u in uniq])[inv]
        x = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "_w": pa.array(np.minimum(np.maximum(x, lo_v), hi_v)),
            "_one": pa.array(np.ones(len(x), np.int64)),
        })

    agg = ds.map_batches(clip, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_w", alias_name="wsum"),
                   Sum("_one", alias_name="n")).to_pandas()

    p05 = np.array([lo[k] for k in agg["event_type"]])
    p95 = np.array([hi[k] for k in agg["event_type"]])
    wmean = agg["wsum"].to_numpy() / agg["n"].to_numpy(np.float64)
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "p05": np.floor(p05 * 1e6 + 0.5) / 1e6,
        "p95": np.floor(p95 * 1e6 + 0.5) / 1e6,
        "wmean": np.floor(wmean * 1e6 + 0.5) / 1e6,
    }).sort_values("event_type")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_props_json_stats(sf_dir: str):
    """Semi-structured (JSON) column extraction + aggregate — the
    json_extract shape every event pipeline hits: parse events.props,
    pull $.k, aggregate count/avg/min/max per event_type. The parse is
    a stateless map_batches over the string column (the JSON decode is
    the operator; the aggregate rides the usual combiner partials)."""
    import json

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def part(batch: pa.Table) -> pa.Table:
        ks = np.array([json.loads(s)["k"] if s else -1
                       for s in batch.column("props").to_pylist()],
                      dtype=np.float64)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "_n": np.int64(1), "_s": ks, "_lo": ks, "_hi": ks})
        g = df.groupby("event_type", as_index=False) \
            .agg({"_n": "sum", "_s": "sum", "_lo": "min", "_hi": "max"})
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = ev.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_s", alias_name="s"),
                   Min("_lo", alias_name="k_min"),
                   Max("_hi", alias_name="k_max")).to_pandas()

    out = pd.DataFrame({
        "event_type": mom["event_type"],
        "n": mom["n"].astype(np.int64),
        "k_avg": np.floor(
            (mom["s"] / mom["n"]).to_numpy() * 1e6 + 0.5) / 1e6,
        "k_min": mom["k_min"].astype(np.int64),
        "k_max": mom["k_max"].astype(np.int64),
    }).sort_values("event_type")
    return pa.Table.from_pandas(out, preserve_index=False)


def nation_top_customer_names(sf_dir: str, k: int = 3):
    """Ordered LISTAGG / STRING_AGG per group with a deterministic
    order — per nation, the top-k customers by (acctbal desc, custkey)
    concatenated as one string. Top-k per group rides a bounded
    map_groups over per-batch-pruned candidates (each batch keeps at
    most k rows per nation before the shuffle, so the group stage sees
    ≤ k·blocks rows per nation, never the full table)."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["c_acctbal", "c_custkey"],
                            ascending=[False, True])
        return pa.Table.from_pandas(df.groupby("c_nationkey").head(k),
                                    preserve_index=False)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "c_nationkey": [np.int64(g["c_nationkey"].iloc[0])],
            "top_names": [",".join(g["c_name"])],
            "top_balance": [np.float64(g["c_acctbal"].iloc[0])]})

    return (cust.map_batches(prune, batch_format="pyarrow",
                             batch_size=32768)
            .groupby("c_nationkey")
            .map_groups(agg, batch_format="pandas"))


def events_time_weighted_avg(sf_dir: str):
    """Time-weighted average over irregular timestamps — the temporal
    aggregate gauges/sensors need (each value weighted by how long it
    held, i.e. until the user's next event; the last event carries no
    interval). Same bounded groupby(user_id).map_groups shape as every
    per-user window here; one sort + one diff per group, fully
    vectorized. DuckDB-oracle-gated (lead(ts) recomputes the holds)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64) / 1e6
        v = g["value"].to_numpy(np.float64)
        if len(v) < 2:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "twa": pd.Series([], dtype=np.float64)})
        dt = np.diff(t)
        val = float((v[:-1] * dt).sum() / dt.sum())
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "twa": [np.floor(val * 1e6 + 0.5) / 1e6]})

    return ds.groupby("user_id").map_groups(twa, batch_format="pandas")


def embedding_zscore(sf_dir: str):
    """Per-dimension z-score normalization of the embedding matrix —
    the feature-scaling pass a training pipeline runs before clustering
    or PCA. Pass 1: one (d)-row moment reduction (Σx, Σx², n per dim —
    each block emits d rows, the groupby folds blocks); pass 2: the
    (d)-row mean/std table broadcasts via ``ray.put`` into a stateless
    vectorized map. Long-form output (vec_id, dim, z) so the SQL oracle
    (unnest + AVG/STDDEV_POP window) compares value-for-value."""
    import ray

    from ..pipelines.sketches import _stack_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def part(batch: pa.Table) -> pa.Table:
        x = _stack_embeddings(batch)
        d = x.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "_n": pa.array(np.full(d, len(x), dtype=np.int64)),
            "_s": pa.array(x.sum(axis=0)),
            "_ss": pa.array((x * x).sum(axis=0)),
        })

    mom = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=4096) \
        .groupby("dim") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_s", alias_name="s"),
                   Sum("_ss", alias_name="ss")).to_pandas() \
        .sort_values("dim")
    n = mom["n"].to_numpy(np.float64)
    mean = mom["s"].to_numpy() / n
    var = mom["ss"].to_numpy() / n - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    ref = ray.put((mean, std))

    def norm(batch: pa.Table) -> pa.Table:
        mu, sd = ray.get(ref)
        x = _stack_embeddings(batch)
        z = (x - mu[None, :]) / sd[None, :]
        d = x.shape[1]
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(ids))),
            "z": pa.array(np.floor(z.ravel() * 1e6 + 0.5) / 1e6),
        })

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=4096)


_PAIR_EMPTY = pa.table({"p_lo": pa.array([], pa.int64()),
                        "p_hi": pa.array([], pa.int64())})


def _triu_pairs_by_order(o: np.ndarray, p: np.ndarray,
                         st: np.ndarray, en: np.ndarray) -> pa.Table:
    """Vectorized unordered-pair fan-out for runs [st, en) of a
    (sorted, deduped) (order, part) array: for each distinct run
    length m (≤ the lineitems-per-order bound, so ≤ a handful of
    loop iterations), gather all runs of that length into an (R, m)
    matrix and emit its upper-triangle columns in bulk — no
    per-order Python call."""
    lens = en - st
    lo_parts, hi_parts = [], []
    for m in np.unique(lens):
        if m < 2:
            continue
        rs = st[lens == m]
        mat = p[rs[:, None] + np.arange(m)[None, :]]   # (R, m) sorted rows
        iu, ju = np.triu_indices(int(m), k=1)
        lo_parts.append(mat[:, iu].ravel())
        hi_parts.append(mat[:, ju].ravel())
    if not lo_parts:
        return _PAIR_EMPTY
    return pa.table({
        "p_lo": pa.array(np.concatenate(lo_parts).astype(np.int64)),
        "p_hi": pa.array(np.concatenate(hi_parts).astype(np.int64)),
    })


def _dedup_sorted_pairs(batch: pa.Table):
    """(order, part) arrays of a sorted block with exact duplicates
    dropped (duplicates are adjacent after the sort)."""
    o = batch.column("l_orderkey").to_numpy(
        zero_copy_only=False).astype(np.uint64)
    p = batch.column("l_partkey").to_numpy(
        zero_copy_only=False).astype(np.uint64)
    k = (o << np.uint64(32)) | p
    keep = np.concatenate(([True], k[1:] != k[:-1])) if len(k) else \
        np.zeros(0, bool)
    return o[keep], p[keep]


def part_copurchase_pairs(sf_dir: str, top_n: int = 20):
    """Co-occurrence mining (market-basket pair support): the ``top_n``
    part pairs most often bought in the same order.

    Distributed shape — two SORTS, zero many-group aggregates (Ray's
    sort-based Aggregate pays per-group Python overhead, measured
    150 s for the 1.2M singleton pair groups this query produces at
    sf0.1; range sort of the same rows is 0.3 s):

    1. Sort lineitem by (order, part); each block dedups adjacent
       duplicates and emits the triu pair fan-out for its INTERIOR
       orders vectorized (runs grouped by length — ≤7 lineitems per
       order bounds both the fan-out and the loop). The ≤2 possibly
       block-spanning boundary orders per block are re-read in a
       second cheap pass over the materialized sort, completed on the
       driver (≤2×blocks tiny rows), and unioned back into the pair
       stream — every order's pairs are emitted exactly once.
    2. Pack pairs into one uint64 key (part keys < 2^32 — asserted),
       sort by it, and run-length count per block: complete interior
       runs keep only the block-local top-k (a key's whole run lives
       in one block, so losing locally to k bigger counts excludes it
       globally), first/last runs of each block are emitted as
       boundary partials and sum-merged on the driver. Driver sees
       ≤ blocks×(top_n+2) rows; final ordering matches the oracle
       (support desc, p_lo, p_hi).
    """
    import ray.data as _rd

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    s = li.sort(["l_orderkey", "l_partkey"]).materialize()

    def interior_pairs(batch: pa.Table) -> pa.Table:
        o, p = _dedup_sorted_pairs(batch)
        if len(o) == 0:
            return _PAIR_EMPTY
        starts = np.flatnonzero(np.concatenate(([True], o[1:] != o[:-1])))
        ends = np.concatenate((starts[1:], [len(o)]))
        mask = (o[starts] != o[0]) & (o[starts] != o[-1])
        return _triu_pairs_by_order(o, p, starts[mask], ends[mask])

    def boundary_rows(batch: pa.Table) -> pa.Table:
        o, p = _dedup_sorted_pairs(batch)
        m = (o == o[0]) | (o == o[-1]) if len(o) else \
            np.zeros(0, bool)
        return pa.table({"o": pa.array(o[m].astype(np.int64)),
                         "p": pa.array(p[m].astype(np.int64))})

    pairs = s.map_batches(interior_pairs, batch_format="pyarrow",
                          batch_size=None)
    bdf = (s.map_batches(boundary_rows, batch_format="pyarrow",
                         batch_size=None)
           .to_pandas().drop_duplicates())        # ≤ 2 orders × blocks
    bo = np.sort((bdf["o"].to_numpy().astype(np.uint64) << np.uint64(32))
                 | bdf["p"].to_numpy().astype(np.uint64))
    ob, pb = bo >> np.uint64(32), bo & np.uint64(0xFFFFFFFF)
    bst = np.flatnonzero(np.concatenate(([True], ob[1:] != ob[:-1]))) \
        if len(ob) else np.zeros(0, np.int64)
    ben = np.concatenate((bst[1:], [len(ob)])) if len(ob) else bst
    bpairs = _triu_pairs_by_order(ob, pb, bst, ben)
    if bpairs.num_rows:
        pairs = pairs.union(_rd.from_arrow(bpairs))

    def pack(batch: pa.Table) -> pa.Table:
        lo = batch.column("p_lo").to_numpy(zero_copy_only=False)
        hi = batch.column("p_hi").to_numpy(zero_copy_only=False)
        assert len(lo) == 0 or int(hi.max()) < (1 << 32)
        return pa.table({"k": pa.array(
            (lo.astype(np.uint64) << np.uint64(32))
            | hi.astype(np.uint64), pa.uint64())})

    ks = pairs.map_batches(pack, batch_format="pyarrow").sort("k")

    def count_runs(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"k": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64()),
                             "bnd": pa.array([], pa.bool_())})
        vals, counts = np.unique(k, return_counts=True)   # sorted by k
        interior = np.ones(len(vals), bool)
        interior[0] = interior[-1] = False                # may span blocks
        iv, ic = vals[interior], counts[interior]
        top = np.lexsort((iv, -ic))[:top_n]               # n desc, k asc
        return pa.table({
            "k": pa.array(np.concatenate((iv[top], vals[~interior]))),
            "n": pa.array(np.concatenate((ic[top], counts[~interior]))
                          .astype(np.int64)),
            "bnd": pa.array([False] * len(top)
                            + [True] * int((~interior).sum())),
        })

    cand = ks.map_batches(count_runs, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    merged = (cand.groupby("k", as_index=False)["n"].sum()
              if len(cand) else cand)                # boundary sum-merge
    k = merged["k"].to_numpy().astype(np.uint64)
    n = merged["n"].to_numpy().astype(np.int64)
    lo = (k >> np.uint64(32)).astype(np.int64)
    hi = (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
    order = np.lexsort((hi, lo, -n))[:top_n]
    return pa.table({"p_lo": pa.array(lo[order]),
                     "p_hi": pa.array(hi[order]),
                     "n_orders": pa.array(n[order])})


def user_day_streaks(sf_dir: str):
    """Gaps-and-islands: per user, the number of distinct active days
    and the longest run of CONSECUTIVE active days (the retention-
    streak shape; SQL expresses it with the day - row_number() island
    trick, which has no direct Ray Data operator).

    Distributed shape: project (user_id, day), then ONE
    groupby(user_id).map_groups — groups are bounded (a user's
    distinct days), and the per-group body is numpy-vectorized
    (unique → diff → cumsum island ids → bincount run lengths), so
    the only exchange is the user-keyed shuffle of two small columns.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "day": batch.column("ts").cast(pa.timestamp("us")).cast(
                pa.date32()),
        })

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["day"].to_numpy().astype("datetime64[D]"))
        if len(d) > 1:
            brk = np.diff(d).astype("timedelta64[D]").astype(np.int64) != 1
            runs = np.bincount(np.concatenate(([0], np.cumsum(brk))))
            longest = int(runs.max())
        else:
            longest = len(d)
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_active_days": [len(d)],
            "longest_streak": [longest],
        })

    return (ds.map_batches(to_day, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(streaks, batch_format="pandas"))


def events_value_histogram(sf_dir: str, n_buckets: int = 20):
    """Equal-width histogram of event values — the two-phase
    global-stat shape: pass 1 reduces to two scalars (min/max, a
    per-block combiner aggregate), which are broadcast into pass 2's
    bucket-assignment map_batches; the only exchange after that is a
    groupby over ≤``n_buckets`` keys.

    Bucket arithmetic is ``floor((v - mn) * n / (mx - mn))`` clipped
    to ``n - 1``, evaluated in float64 in exactly the SQL oracle's
    operation order so boundary values land identically.
    """
    ds = _read(sf_dir, "events", ["value"])
    mm = ds.aggregate(Min("value"), Max("value"))
    mn, mx = float(mm["min(value)"]), float(mm["max(value)"])
    width_inv_num = float(n_buckets)   # bucket = (v-mn)*n/(mx-mn)
    span = mx - mn

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        b = np.floor((v - mn) * width_inv_num / span)
        b = np.minimum(b, n_buckets - 1).astype(np.int64)
        return pa.table({"bucket": pa.array(b, pa.int64())})

    agg = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("bucket").aggregate(Count(alias_name="n_events")))

    def bounds(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        w = span / n_buckets
        return pa.table({
            "bucket": batch.column("bucket"),
            "lo": pa.array(np.round(mn + b * w, 6), pa.float64()),
            "hi": pa.array(np.round(mn + (b + 1) * w, 6), pa.float64()),
            "n_events": batch.column("n_events"),
        })

    return (agg.map_batches(bounds, batch_format="pyarrow")
            .sort("bucket"))


def events_outliers_by_type(sf_dir: str, z: float = 2.5):
    """Grouped z-score outlier detection — the aggregate→broadcast→
    filter-back shape: pass 1 reduces to per-type mean/std via moment
    partials (sum, sum-of-squares, count — a tiny groupby), the
    handful of per-type thresholds is broadcast with ``ray.put``, and
    pass 2 filters the fact table vectorized against the sorted-array
    probe (no per-row dict lookups, no fact-side shuffle).

    Output: per type, total events and how many sit beyond ``z``
    sample standard deviations from that type's mean.
    """
    import ray

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        keys, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv).astype(np.float64)
        s = np.bincount(inv, weights=v)
        s2 = np.bincount(inv, weights=v * v)
        return pa.table({"event_type": pa.array(keys),
                         "_n": pa.array(n), "_s": pa.array(s),
                         "_s2": pa.array(s2)})

    stats = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("_n", alias_name="n"),
                        Sum("_s", alias_name="s"),
                        Sum("_s2", alias_name="s2"))
             .to_pandas())                       # one row per event type
    n = stats["n"].to_numpy()
    mean = stats["s"].to_numpy() / n
    # sample variance from moments, guarded against fp negatives
    var = np.maximum((stats["s2"].to_numpy() - n * mean * mean)
                     / np.maximum(n - 1, 1.0), 0.0)
    order = np.argsort(stats["event_type"].to_numpy())
    ref = ray.put((stats["event_type"].to_numpy()[order],
                   mean[order], np.sqrt(var)[order]))

    def flag(batch: pa.Table, ref=ref, z=z) -> pa.Table:
        import ray as _ray

        keys, mu, sd = _ray.get(ref)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, et)
        dev = np.abs(v - mu[idx])
        out = dev > z * sd[idx]
        return pa.table({
            "event_type": batch.column("event_type"),
            "_one": pa.array(np.ones(len(et), np.int64)),
            "_out": pa.array(out.astype(np.int64)),
        })

    agg = (ds.map_batches(flag, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("_one", alias_name="n_events"),
                      Sum("_out", alias_name="n_outliers")))
    return agg.sort("event_type")


def order_gini_by_priority(sf_dir: str):
    """Grouped Gini concentration index over order values — the
    rank-statistic shape that CANNOT fall back to per-group map_groups
    (5 priority values would put n/5 of the table in one task).

    Scale shape: the `_pnum_prepare`/`_pnum_rn` distributed
    ROW_NUMBER machinery (one global sort by (priority, value, key) —
    the operator's inherent exchange — plus one tiny per-(block,
    partition) count row to the driver), then Gini per group from the
    rank identity G = (2*Σ(rank·v) − (n+1)·Σv) / (n·Σv), reduced via
    three per-block partial sums and a 5-row groupby. Ties are safe:
    equal values permuted among adjacent ranks leave Σ(rank·v)
    unchanged, so the arbitrary tiebreak never shows in the result.
    """
    import ray

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    sorted_ds, bases, totals = _pnum_prepare(
        ds, ["o_orderpriority", "o_totalprice", "o_orderkey"],
        [False, False, False], "o_orderpriority", "o_orderkey")
    bref = ray.put(bases)

    def partials(batch: pa.Table, bref=bref) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "_rv": pa.array([], pa.float64()),
                             "_v": pa.array([], pa.float64()),
                             "_n": pa.array([], pa.int64())})
        rn, pr = _pnum_rn(batch, "o_orderpriority", "o_orderkey",
                          _ray.get(bref))
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        keys, inv = np.unique(np.asarray(pr, dtype=object),
                              return_inverse=True)
        return pa.table({
            "o_orderpriority": pa.array([str(k) for k in keys]),
            "_rv": pa.array(np.bincount(inv, weights=rn * v)),
            "_v": pa.array(np.bincount(inv, weights=v)),
            "_n": pa.array(np.bincount(inv).astype(np.int64)),
        })

    agg = (sorted_ds.map_batches(partials, batch_format="pyarrow",
                                 batch_size=None)
           .groupby("o_orderpriority")
           .aggregate(Sum("_rv", alias_name="rv"),
                      Sum("_v", alias_name="sv"),
                      Sum("_n", alias_name="n_orders")))

    def finish(batch: pa.Table) -> pa.Table:
        rv = batch.column("rv").to_numpy(zero_copy_only=False)
        sv = batch.column("sv").to_numpy(zero_copy_only=False)
        n = batch.column("n_orders").to_numpy(zero_copy_only=False)
        gini = (2.0 * rv - (n + 1.0) * sv) / (n * sv)
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "n_orders": batch.column("n_orders"),
            "gini": pa.array(np.round(gini, 6), pa.float64()),
        })

    return (agg.map_batches(finish, batch_format="pyarrow")
            .sort("o_orderpriority"))


def event_type_user_jaccard(sf_dir: str):
    """Category set-overlap: Jaccard similarity between the distinct-
    USER sets of every event-type pair (audience overlap — which
    behaviors share users).

    Scale shape: dedupe to (user, type) with one groupby, fan out
    within-user type pairs in a user-keyed map_groups whose group size
    is bounded by the type-vocabulary (≤ tens), count pair support
    with a pair groupby, and broadcast the tiny per-type distinct-user
    totals as sorted probe arrays into the vectorized Jaccard
    finisher. The user-keyed shuffle of two small columns is the only
    data-sized exchange; nothing is ever all-pairs over users.
    """
    import ray

    ut = (_read(sf_dir, "events", ["user_id", "event_type"])
          .groupby(["user_id", "event_type"])
          .aggregate(Count(alias_name="_c"))
          .select_columns(["user_id", "event_type"])
          .materialize())          # pair fan-out + totals both read it

    totals = ut.groupby("event_type").aggregate(
        Count(alias_name="n")).to_pandas()
    order = np.argsort(totals["event_type"].to_numpy())
    tref = ray.put((totals["event_type"].to_numpy()[order],
                    totals["n"].to_numpy()[order].astype(np.float64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["event_type"].unique())
        if len(ts) < 2:
            return pd.DataFrame({"t_lo": pd.Series([], dtype=object),
                                 "t_hi": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(ts), k=1)
        return pd.DataFrame({"t_lo": ts[i], "t_hi": ts[j]})

    agg = (ut.groupby("user_id").map_groups(pairs, batch_format="pandas")
           .groupby(["t_lo", "t_hi"])
           .aggregate(Count(alias_name="n_both")))

    def finish(batch: pa.Table, tref=tref) -> pa.Table:
        import ray as _ray

        keys, n = _ray.get(tref)
        lo = batch.column("t_lo").to_numpy(zero_copy_only=False)
        hi = batch.column("t_hi").to_numpy(zero_copy_only=False)
        both = batch.column("n_both").to_numpy(
            zero_copy_only=False).astype(np.float64)
        na = n[np.searchsorted(keys, lo)]
        nb = n[np.searchsorted(keys, hi)]
        jac = both / (na + nb - both)
        return pa.table({
            "t_lo": batch.column("t_lo"),
            "t_hi": batch.column("t_hi"),
            "n_both": batch.column("n_both"),
            "jaccard": pa.array(np.round(jac, 6), pa.float64()),
        })

    return (agg.map_batches(finish, batch_format="pyarrow")
            .sort(["t_lo", "t_hi"]))



def referential_integrity_audit(sf_dir: str,
                                broadcast_limit: int = 2_000_000):
    """Data-quality audit — exact orphan counts across the schema's FK
    graph (the expectations check a pipeline runs before training-data
    joins): one row per FK edge with the distinct child-key count and
    how many of those keys have no parent.

    Scale shape per edge: both sides reduce to DISTINCT int64 keys with
    the per-batch-unique + sorted-runs combiner (sorted_distinct_keys —
    exchange is one row per distinct key, not per row); the probe is a
    broadcast np.isin when the parent key set is small (count-gated)
    and Ray Data's native ``left_anti`` hash join beyond
    ``broadcast_limit``. The driver folds one scalar pair per edge.
    """
    import ray

    from ..functions.sortagg import sorted_distinct_keys

    edges = [
        ("orders.o_custkey->customer.c_custkey",
         ("orders", "o_custkey"), ("customer", "c_custkey")),
        ("lineitem.l_orderkey->orders.o_orderkey",
         ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
        ("lineitem.l_partkey->part.p_partkey",
         ("lineitem", "l_partkey"), ("part", "p_partkey")),
        ("lineitem.l_suppkey->supplier.s_suppkey",
         ("lineitem", "l_suppkey"), ("supplier", "s_suppkey")),
        ("customer.c_nationkey->nation.n_nationkey",
         ("customer", "c_nationkey"), ("nation", "n_nationkey")),
        ("events.user_id->customer.c_custkey",
         ("events", "user_id"), ("customer", "c_custkey")),
    ]

    names, n_keys, n_orph = [], [], []
    for fk, (ctab, ccol), (ptab, pcol) in edges:
        child = sorted_distinct_keys(
            _read(sf_dir, ctab, [ccol]), ccol).materialize()
        parent = sorted_distinct_keys(
            _read(sf_dir, ptab, [pcol]), pcol).materialize()
        nc = child.count()
        if parent.count() <= broadcast_limit:
            pk = np.sort(np.concatenate([
                b.column(pcol).to_numpy(zero_copy_only=False)
                for b in ray.get(parent.to_arrow_refs())] or
                [np.array([], dtype=np.int64)]))
            pref = ray.put(pk)

            def count_missing(batch: pa.Table, pref=pref, col=ccol):
                keys = batch.column(col).to_numpy(zero_copy_only=False)
                miss = ~np.isin(keys, ray.get(pref))
                return pa.table({"n": pa.array(
                    [int(miss.sum())], pa.int64())})

            parts = child.map_batches(
                count_missing, batch_format="pyarrow").take_all()
            orphans = int(sum(r["n"] for r in parts))
        else:
            from .dedup import _join_parts

            orphans = child.join(
                parent, join_type="left_anti",
                num_partitions=_join_parts(child, parent),
                on=(ccol,), right_on=(pcol,),
            ).count()
        names.append(fk)
        n_keys.append(nc)
        n_orph.append(orphans)

    return pa.table({
        "fk": pa.array(names, pa.string()),
        "n_child_keys": pa.array(n_keys, pa.int64()),
        "n_orphans": pa.array(n_orph, pa.int64()),
    })


def events_funnel_windowed(sf_dir: str,
                           stages=("signup", "click", "purchase"),
                           window_hours: int = 24):
    """Time-windowed funnel (ClickHouse ``windowFunnel`` semantics): a
    user reaches stage k iff SOME strictly-increasing chain of the
    first k stage events completes within ``window_hours`` of the
    chain's OWN first event. Differs from ``events_funnel`` (greedy
    unbounded walk): here every stage-1 event opens a candidate window
    and the earliest-next-match chain from each start is optimal (it
    maximizes the remaining slack), so the per-user scan is exact.

    Scale shape: per-user vectorized searchsorted over the user's
    per-stage timestamp arrays inside ``groupby(user).map_groups`` —
    O(starts x stages x log n) per user, no cross-user state; stage
    counts reduce through per-batch partials into a len(stages)-row
    groupby, the events_funnel tail."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])
    w = np.timedelta64(window_hours * 3600, "s")

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.argsort(ts, kind="stable")
        ts, et = ts[order], et[order]
        per_stage = [ts[et == s] for s in stages]
        starts = per_stage[0]
        if len(starts) == 0:
            return pd.DataFrame({"depth": [np.int64(0)]})
        depth = 1
        cur = starts                     # chain heads, one per start
        deadline = starts + w
        for nxt in per_stage[1:]:
            if len(nxt) == 0:
                break
            idx = np.searchsorted(nxt, cur, side="right")
            ok = idx < len(nxt)
            cur = np.where(ok, nxt[np.minimum(idx, len(nxt) - 1)],
                           np.datetime64("2262-01-01"))
            alive = ok & (cur <= deadline)
            if not alive.any():
                break
            depth += 1
            cur, deadline = cur[alive], deadline[alive]
        return pd.DataFrame({"depth": [np.int64(depth)]})

    depths = ds.groupby("user_id").map_groups(walk,
                                              batch_format="pandas")

    def cum_part(batch: pa.Table) -> pa.Table:
        d = batch.column("depth").to_numpy(zero_copy_only=False)
        ns = [np.int64((d >= k).sum()) for k in range(1,
                                                      len(stages) + 1)]
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1,
                                        dtype=np.int64)),
            "name": pa.array(list(stages), pa.string()),
            "n_users": pa.array(ns),
        })

    return depths.map_batches(cum_part, batch_format="pyarrow",
                              batch_size=None) \
        .groupby(["stage", "name"]) \
        .aggregate(Sum("n_users", alias_name="n_users")) \
        .sort("stage")


def events_attribution_last_touch(sf_dir: str,
                                  conversion: str = "purchase"):
    """Last-touch attribution — every conversion event is credited to
    the user's most recent PRECEDING non-conversion event type (the
    marketing-attribution shape; first/last-touch are the standard
    heuristic models). Output: (attributed, n_conversions), conversions
    with no preceding touch excluded — matching the SQL
    ``last_value(... IGNORE NULLS) ... ROWS ... 1 PRECEDING`` form.

    Scale shape: attribution is a per-user ordered property —
    ``groupby(user).map_groups`` sorts one user's stream by
    (ts, event_id) and resolves each conversion's last preceding touch
    with one np.maximum.accumulate index scan (no Python loop); the
    tail is a |types|-sized groupby count."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type",
                                  "event_id"])

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        is_touch = et != conversion
        # index of the most recent touch at-or-before each position
        idx = np.where(is_touch, np.arange(len(et)), -1)
        last_touch = np.maximum.accumulate(idx)
        conv = et == conversion
        att_idx = last_touch[conv]
        keep = att_idx >= 0
        return pd.DataFrame({"attributed": et[att_idx[keep]]})

    return (ds.groupby("user_id")
            .map_groups(attribute, batch_format="pandas")
            .groupby("attributed")
            .aggregate(Count(alias_name="n_conversions"))
            .sort("attributed"))


def events_time_to_convert(sf_dir: str, start: str = "signup",
                           end: str = "purchase"):
    """Conversion latency — per user, hours from the earliest ``start``
    event to the first ``end`` event strictly after it (the
    time-to-convert distribution's raw table; converted users only).

    Scale shape: one ``groupby(user).map_groups`` emitting at most one
    row per user (two vectorized min/searchsorted probes inside the
    group); no second pass, no join."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "hours_to_convert": pd.Series([],
                                                        dtype="float64")})

    def latency(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        st = ts[et == start]
        if len(st) == 0:
            return empty
        t1 = st.min()
        en = ts[(et == end) & (ts > t1)]
        if len(en) == 0:
            return empty
        hours = float((en.min() - t1) / np.timedelta64(1, "h"))
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "hours_to_convert": [round(hours, 6)],
        })

    return (ds.groupby("user_id")
            .map_groups(latency, batch_format="pandas")
            .sort("user_id"))


def customer_rfm(sf_dir: str, k: int = 4):
    """RFM segmentation — per ordering customer: recency (days from
    their last order to the corpus max order date), frequency (order
    count), monetary (total spend), each scored into k quartile buckets
    by exact NTILE ordered (metric ASC, custkey ASC). The classic
    customer-value segmentation.

    Scale shape: the per-customer reduction is two sorted-runs passes
    (sum/count and max-day — the sortagg shape, no per-group Python)
    joined customer-keyed; each quartile score is one global sort +
    the block-offset exact-NTILE scan shared with orders_row_number
    (one tiny partial per block to the driver). Three sorts total —
    NTILE's inherent exchange."""
    import ray

    from ..functions.sortagg import sorted_keyed_sum
    from .dedup import _join_parts

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        days = (batch.column("o_orderdate").to_numpy()
                .astype("datetime64[D]").astype(np.int64))
        return pa.table({
            "c_custkey": batch.column("o_custkey"),
            "day": pa.array(days),
            "price": batch.column("o_totalprice"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    base = orders.map_batches(prep, batch_format="pyarrow",
                              batch_size=65536).materialize()
    sums = sorted_keyed_sum(base, "c_custkey", ["price", "one"])
    last = sorted_keyed_sum(base, "c_custkey", ["day"], how="max")
    gmax = int(base.max("day"))
    joined = sums.join(last, "inner", _join_parts(sums, last),
                       on=("c_custkey",))

    def metrics(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "recency_days": pa.array(
                gmax - batch.column("day").to_numpy(
                    zero_copy_only=False).astype(np.int64)),
            "frequency": batch.column("one"),
            "monetary": pa.array(np.round(
                batch.column("price").to_numpy(zero_copy_only=False),
                2), pa.float64()),
        })

    m = joined.map_batches(metrics, batch_format="pyarrow")

    def add_const(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_p", pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    m = m.map_batches(add_const, batch_format="pyarrow")

    def ntile_pass(ds, metric: str, out: str):
        sorted_ds, bases, totals = _pnum_prepare(
            ds, ["_p", metric, "c_custkey"], [False, False, False],
            "_p", "c_custkey")
        bref = ray.put((bases, totals))

        def assign(batch: pa.Table, bref=bref) -> pa.Table:
            import ray as _ray

            if batch.num_rows == 0:
                return batch.append_column(out, pa.array([], pa.int64()))
            bases, totals = _ray.get(bref)
            rn, pr = _pnum_rn(batch, "_p", "c_custkey", bases)
            n = np.array([totals[p] for p in pr], np.int64)
            size_small = n // k
            n_big = n % k
            big_span = n_big * (size_small + 1)
            in_big = rn <= big_span
            tile = np.where(
                in_big,
                (rn - 1) // np.maximum(size_small + 1, 1) + 1,
                n_big + (rn - 1 - big_span)
                // np.maximum(size_small, 1) + 1,
            ).astype(np.int64)
            return batch.append_column(out, pa.array(tile))

        return sorted_ds.map_batches(assign, batch_format="pyarrow")

    m = ntile_pass(m, "recency_days", "r_q")
    m = ntile_pass(m, "frequency", "f_q")
    m = ntile_pass(m, "monetary", "m_q")
    return m.drop_columns(["_p"]).sort("c_custkey")


def cohort_ltv(sf_dir: str, max_offset: int = 14):
    """Cohort lifetime-value curve — users grouped by first-activity
    day (the cohort); for each day offset 0..max_offset, the CUMULATIVE
    purchase revenue the cohort has generated by that day (the
    LTV-by-cohort curve next to the retention triangle).

    Scale shape: one ``groupby(user).map_groups`` emits each user's
    per-offset purchase revenue (at most max_offset+1 rows per user),
    a bounded (cohort, offset) groupby sums them, and the cumulative
    sum runs inside one ``map_groups`` per cohort (max_offset+1 rows
    per group). No join back to events."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type",
                                  "value"])

    empty = pd.DataFrame({
        "cohort_day": pd.Series([], dtype="str"),
        "day_offset": pd.Series([], dtype="int64"),
        "revenue": pd.Series([], dtype="float64")})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        d0 = ts.min().astype("datetime64[D]")
        buy = g["event_type"].to_numpy() == "purchase"
        if not buy.any():
            return empty
        days = ts[buy].astype("datetime64[D]")
        off = (days - d0).astype(np.int64)
        keep = off <= max_offset
        if not keep.any():
            return empty
        val = g["value"].to_numpy()[buy][keep]
        offs, inv = np.unique(off[keep], return_inverse=True)
        rev = np.zeros(len(offs))
        np.add.at(rev, inv, val)
        return pd.DataFrame({
            "cohort_day": np.datetime_as_string(
                np.full(len(offs), d0, dtype="datetime64[D]")),
            "day_offset": offs,
            "revenue": rev,
        })

    agg = (ds.groupby("user_id")
           .map_groups(per_user, batch_format="pandas")
           .groupby(["cohort_day", "day_offset"])
           .aggregate(Sum("revenue", alias_name="revenue")))

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day_offset")
        g["cum_revenue"] = np.round(g["revenue"].cumsum(), 4)
        g["revenue"] = np.round(g["revenue"], 4)
        return g

    return (agg.groupby("cohort_day")
            .map_groups(cumsum, batch_format="pandas")
            .sort(["cohort_day", "day_offset"]))


def daily_activity_full_outer(sf_dir: str):
    """Order-count vs event-count per day, FULL OUTER joined — days
    present on either side appear, the missing side filled with 0.
    Completes the join-type surface next to the inner/broadcast/anti
    shapes (native ``Dataset.join(join_type="full_outer")``).

    Scale shape: both sides pre-aggregate to one row per day BEFORE
    the join (the combiner-first rule), so the exchange carries
    day-cardinality rows, not the raw tables."""
    orders = _read(sf_dir, "orders", ["o_orderdate"])
    events = _read(sf_dir, "events", ["ts"])

    def day_of(col, out):
        def f(batch: pa.Table) -> pa.Table:
            d = batch.column(col).to_numpy(zero_copy_only=False) \
                .astype("datetime64[D]")
            vals, counts = np.unique(d, return_counts=True)
            return pa.table({
                "day": pa.array(np.datetime_as_string(vals)),
                out: pa.array(counts.astype(np.int64)),
            })
        return f

    o = (orders.map_batches(day_of("o_orderdate", "n_orders"),
                            batch_format="pyarrow", batch_size=65536)
         .groupby("day").aggregate(Sum("n_orders",
                                       alias_name="n_orders")))
    e = (events.map_batches(day_of("ts", "n_events"),
                            batch_format="pyarrow", batch_size=65536)
         .groupby("day").aggregate(Sum("n_events",
                                       alias_name="n_events")))
    from .dedup import _join_parts

    j = o.join(e, "full_outer", num_partitions=_join_parts(o, e),
               on=("day",))

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch.column("day"),
            "n_orders": pc.fill_null(batch.column("n_orders"), 0),
            "n_events": pc.fill_null(batch.column("n_events"), 0),
        })

    return j.map_batches(fill, batch_format="pyarrow").sort("day")


def order_trimmed_mean_by_priority(sf_dir: str, trim: float = 0.1):
    """10%-trimmed mean of o_totalprice per priority — the robust-mean
    companion to the exact median/p95 queries: drop the lowest and
    highest floor(trim*n) rows of each group (deterministic
    (value, key) ordering) and average the rest.

    Scale shape: exact global per-group ranks via the shared
    ``_pnum_prepare``/``_pnum_rn`` block-offset machinery (one sort,
    one tiny partial per (block, partition) to the driver — no
    single-task groups), then a vectorized rank-band filter and a
    5-row groupby mean."""
    import ray

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    sorted_ds, bases, totals = _pnum_prepare(
        ds, ["o_orderpriority", "o_totalprice", "o_orderkey"],
        [False, False, False], "o_orderpriority", "o_orderkey")
    bref = ray.put((bases, totals))

    def band(batch: pa.Table, bref=bref, trim=trim) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0:
            return pa.table({
                "o_orderpriority": pa.array([], pa.string()),
                "o_totalprice": pa.array([], pa.float64()),
            })
        bases, totals = _ray.get(bref)
        rn, pr = _pnum_rn(batch, "o_orderpriority", "o_orderkey", bases)
        n_part = np.array([totals[p] for p in pr], np.int64)
        cut = (n_part * trim).astype(np.int64)   # floor(trim*n)
        keep = (rn > cut) & (rn <= n_part - cut)
        return pa.table({
            "o_orderpriority": pa.array(pr[keep].tolist(), pa.string()),
            "o_totalprice": batch.column("o_totalprice").filter(
                pa.array(keep)),
        })

    kept = sorted_ds.map_batches(band, batch_format="pyarrow",
                                 batch_size=None)
    agg = kept.groupby("o_orderpriority").aggregate(
        Mean("o_totalprice", alias_name="trimmed_mean"))

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "trimmed_mean": pa.array(
                np.round(batch.column("trimmed_mean").to_numpy(
                    zero_copy_only=False), 4), pa.float64()),
        })

    return agg.map_batches(rnd, batch_format="pyarrow") \
        .sort("o_orderpriority")


def events_daily_ivm(sf_dir: str, split_id: int = 5000):
    """Incremental view maintenance of the daily-activity aggregate:
    the (event_type, day) view is built from the historical slice
    (event_id < split), then the incoming slice is aggregated ALONE
    and merged in by summation — the view is never recomputed from the
    full table.  Correctness rides on the combiner laws (count and sum
    are associative); the DuckDB oracle IS the full recompute, so the
    gate proves base+delta == full.

    Scale shape: the delta pass touches only incoming rows; the merge
    exchange carries view-cardinality rows from each side (days x
    types), not raw events.  This is the maintenance loop a 100 TB
    corpus runs nightly: O(delta) work per refresh.
    """
    def slice_agg(expr: str):
        ds = _read(sf_dir, "events",
                   ["event_id", "ts", "event_type", "value"]) \
            .filter(expr=expr)

        def partial(batch: pa.Table) -> pa.Table:
            d = batch.column("ts").to_numpy(zero_copy_only=False) \
                .astype("datetime64[D]")
            days = np.datetime_as_string(d)
            et = np.asarray(batch.column("event_type").to_pylist(),
                            dtype=object)
            val = batch.column("value").to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"event_type": et, "day": days,
                               "v": val})
            g = df.groupby(["event_type", "day"], as_index=False) \
                .agg(n_events=("v", "size"), sum_value=("v", "sum"))
            g["n_events"] = g["n_events"].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        return ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)

    base = slice_agg(f"event_id < {split_id}")
    delta = slice_agg(f"event_id >= {split_id}")
    merged = (base.union(delta)
              .groupby(["event_type", "day"])
              .aggregate(Sum("n_events", alias_name="n_events"),
                         Sum("sum_value", alias_name="sum_value")))

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": batch.column("day"),
            "n_events": batch.column("n_events"),
            "sum_value": pa.array(
                np.round(batch.column("sum_value").to_numpy(
                    zero_copy_only=False), 4), pa.float64()),
        })

    return merged.map_batches(rnd, batch_format="pyarrow") \
        .sort(["event_type", "day"])


# ---------------------------------------------------------------------------
# r5 session-7 batch: rule mining, revenue concentration, YoY growth on an
# aggregate, purchase-cadence stats, seasonality profile — each a distinct
# distributed shape with an exact DuckDB oracle
# ---------------------------------------------------------------------------


def part_association_rules(sf_dir: str, min_pair: int = 2):
    """Market-basket association rules (support / confidence / lift) —
    the rule-mining layer above ``part_copurchase_pairs``' pair counts.

    Distributed shape: the same ONE (order, part) sort powers all three
    reductions. Pair counts reuse the interior-run counting (a COMPLETE
    run's count is final, so ``min_pair`` prunes in-task; boundary runs
    ship as partials, sum-merge on the driver, then threshold). Basket
    counts per part come from |parts|-bounded per-block partials over
    INTERIOR orders plus the ≤2×blocks boundary orders completed
    driver-side (the exact split ``part_copurchase_pairs`` uses), and
    the distinct-order total rides the same partials as a sentinel row.
    Rules assemble driver-side on the thresholded pair table —
    ``min_pair`` is the knob that bounds that table at corpus scale.
    support/confidence/lift are float64 divisions of exact ints, in the
    SAME association order the oracle SQL spells out, so the doubles
    are bit-identical.

    Reference has no miner; this is the engine-side op its
    link-recommendation analyses reach for downstream."""
    import ray.data as _rd

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    s = li.sort(["l_orderkey", "l_partkey"]).materialize()

    def interior_pairs(batch: pa.Table) -> pa.Table:
        o, p = _dedup_sorted_pairs(batch)
        if len(o) == 0:
            return _PAIR_EMPTY
        starts = np.flatnonzero(np.concatenate(([True], o[1:] != o[:-1])))
        ends = np.concatenate((starts[1:], [len(o)]))
        mask = (o[starts] != o[0]) & (o[starts] != o[-1])
        return _triu_pairs_by_order(o, p, starts[mask], ends[mask])

    def boundary_rows(batch: pa.Table) -> pa.Table:
        o, p = _dedup_sorted_pairs(batch)
        m = (o == o[0]) | (o == o[-1]) if len(o) else np.zeros(0, bool)
        return pa.table({"o": pa.array(o[m].astype(np.int64)),
                         "p": pa.array(p[m].astype(np.int64))})

    def interior_item_partial(batch: pa.Table) -> pa.Table:
        o, p = _dedup_sorted_pairs(batch)
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(o) == 0:
            return empty
        inner = (o != o[0]) & (o != o[-1])
        starts = np.flatnonzero(np.concatenate(([True], o[1:] != o[:-1])))
        n_inner_orders = int(((o[starts] != o[0])
                              & (o[starts] != o[-1])).sum())
        vals, counts = np.unique(p[inner], return_counts=True)
        # sentinel part=-1 carries the block's interior-order count
        return pa.table({
            "part": pa.array(np.concatenate(
                (vals.astype(np.int64), [-1]))),
            "n": pa.array(np.concatenate(
                (counts, [n_inner_orders])).astype(np.int64)),
        })

    pairs = s.map_batches(interior_pairs, batch_format="pyarrow",
                          batch_size=None)
    bdf = (s.map_batches(boundary_rows, batch_format="pyarrow",
                         batch_size=None)
           .to_pandas().drop_duplicates())          # ≤ 2 orders × blocks
    bo = np.sort((bdf["o"].to_numpy().astype(np.uint64) << np.uint64(32))
                 | bdf["p"].to_numpy().astype(np.uint64))
    ob, pb = bo >> np.uint64(32), bo & np.uint64(0xFFFFFFFF)
    bst = np.flatnonzero(np.concatenate(([True], ob[1:] != ob[:-1]))) \
        if len(ob) else np.zeros(0, np.int64)
    ben = np.concatenate((bst[1:], [len(ob)])) if len(ob) else bst
    bpairs = _triu_pairs_by_order(ob, pb, bst, ben)
    if bpairs.num_rows:
        pairs = pairs.union(_rd.from_arrow(bpairs))

    def pack(batch: pa.Table) -> pa.Table:
        lo = batch.column("p_lo").to_numpy(zero_copy_only=False)
        hi = batch.column("p_hi").to_numpy(zero_copy_only=False)
        assert len(lo) == 0 or int(hi.max()) < (1 << 32)
        return pa.table({"k": pa.array(
            (lo.astype(np.uint64) << np.uint64(32))
            | hi.astype(np.uint64), pa.uint64())})

    ks = pairs.map_batches(pack, batch_format="pyarrow").sort("k")

    def count_runs(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"k": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        vals, counts = np.unique(k, return_counts=True)   # sorted by k
        interior = np.ones(len(vals), bool)
        interior[0] = interior[-1] = False                # may span blocks
        keep = (~interior) | (counts >= min_pair)
        return pa.table({"k": pa.array(vals[keep]),
                         "n": pa.array(counts[keep].astype(np.int64))})

    cand = ks.map_batches(count_runs, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    merged = (cand.groupby("k", as_index=False)["n"].sum()
              if len(cand) else cand)
    merged = merged[merged["n"] >= min_pair]

    item = s.map_batches(interior_item_partial, batch_format="pyarrow",
                         batch_size=None) \
        .groupby("part").aggregate(Sum("n", alias_name="n")).to_pandas()
    n_orders = int(item.loc[item["part"] == -1, "n"].sum()) \
        + int(bdf["o"].nunique())
    icounts = item[item["part"] != -1].rename(columns={"part": "p"})
    bcounts = bdf.groupby("p", as_index=False).agg(n=("o", "size"))
    counts = pd.concat([icounts[["p", "n"]], bcounts]) \
        .groupby("p", as_index=False)["n"].sum().sort_values("p")
    ckeys = counts["p"].to_numpy(np.int64)
    cvals = counts["n"].to_numpy(np.float64)

    k = merged["k"].to_numpy().astype(np.uint64)
    npair = merged["n"].to_numpy().astype(np.int64)
    lo = (k >> np.uint64(32)).astype(np.int64)
    hi = (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
    ant = np.concatenate((lo, hi))
    con = np.concatenate((hi, lo))
    np2 = np.concatenate((npair, npair)).astype(np.float64)
    n_ant = cvals[np.searchsorted(ckeys, ant)]
    n_con = cvals[np.searchsorted(ckeys, con)]
    no = float(n_orders)
    support = np2 / no
    confidence = np2 / n_ant
    lift = np2 / n_ant * no / n_con        # the oracle's exact op order
    order = np.lexsort((con, ant))
    return pa.table({
        "antecedent": pa.array(ant[order]),
        "consequent": pa.array(con[order]),
        "n_pair": pa.array(np2[order].astype(np.int64)),
        "support": pa.array(support[order], pa.float64()),
        "confidence": pa.array(confidence[order], pa.float64()),
        "lift": pa.array(lift[order], pa.float64()),
    })


def customer_pareto_deciles(sf_dir: str, k: int = 10):
    """Revenue-concentration (Pareto / 80-20) profile: customers ranked
    by lifetime revenue, split into ``k`` equal-rank deciles, each
    reporting customer count, revenue, and share of total.

    Scale shape: per-customer revenue is a combiner-fed groupby; the
    global rank is the sort + block-offset prefix scan
    (``_pnum_prepare`` with a constant partition) so no task sees more
    than a block; the decile rollup is a k-group aggregate and the
    k-row share division is driver-side. Customers rank by their
    2dp-ROUNDED revenue (tie-broken by custkey) so both engines order
    the exact same doubles; decile = ((rank-1)*k)//n + 1 — the explicit
    integer formula, NOT SQL NTILE (whose remainder distribution
    differs)."""
    import ray

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey").to_pandas(),
            "revenue": batch.column("o_totalprice").to_pandas()})
        g = df.groupby("o_custkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = ds.map_batches(part, batch_format="pyarrow", batch_size=65536) \
        .groupby("o_custkey") \
        .aggregate(Sum("revenue", alias_name="revenue"))

    def snap(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "revenue": pa.array(_round2_duck(
                batch.column("revenue").to_numpy(zero_copy_only=False))),
            "_p": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    revp = rev.map_batches(snap, batch_format="pyarrow")
    sorted_ds, bases, totals = _pnum_prepare(
        revp, ["_p", "revenue", "o_custkey"], [False, True, False],
        "_p", "o_custkey")
    n = int(totals.get("0", 0))
    bref = ray.put(bases)

    def assign(batch: pa.Table, bref=bref, n=n, k=k) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0 or n == 0:
            return pa.table({
                "decile": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64())})
        rn, _ = _pnum_rn(batch, "_p", "o_custkey", _ray.get(bref))
        dec = ((rn - 1) * k) // n + 1
        df = pd.DataFrame({
            "decile": dec.astype(np.int64),
            "revenue": batch.column("revenue")
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("decile", as_index=False).agg(
            n_customers=("revenue", "size"), revenue=("revenue", "sum"))
        g["n_customers"] = g["n_customers"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    dec = sorted_ds.map_batches(assign, batch_format="pyarrow",
                                batch_size=None) \
        .groupby("decile") \
        .aggregate(Sum("n_customers", alias_name="n_customers"),
                   Sum("revenue", alias_name="revenue")) \
        .to_pandas().sort_values("decile")
    total = float(dec["revenue"].sum())
    revs = dec["revenue"].to_numpy(np.float64)
    return pa.table({
        "decile": pa.array(dec["decile"].to_numpy(np.int64)),
        "n_customers": pa.array(dec["n_customers"].to_numpy(np.int64)),
        "revenue": pa.array(_round2_snap(revs)),
        "revenue_share": pa.array(np.round(revs / total, 6),
                                  pa.float64()),
    })


def nation_revenue_yoy(sf_dir: str):
    """Year-over-year revenue growth per nation — LAG over an AGGREGATE
    (the growth-dashboard shape). The heavy work is the
    ``revenue_by_nation_year`` rollup (combiner-fed, broadcast-gated
    dimensions); the lag then runs on the bounded |nations|×|years|
    result driver-side. ``yoy_pct`` divides the 2dp-rounded revenues
    BOTH engines emit, so the quotient is bit-identical; rounding is
    half-away-from-zero to match DuckDB ROUND."""
    df = revenue_by_nation_year(sf_dir).to_pandas()
    df = df.sort_values(["n_name", "order_year"]).reset_index(drop=True)
    prev = df.groupby("n_name")["revenue"].shift(1)
    yoy = (df["revenue"].to_numpy(np.float64) - prev.to_numpy(np.float64)) \
        / prev.to_numpy(np.float64) * 100.0
    yoy4 = np.copysign(np.floor(np.abs(yoy) * 1e4 + 0.5), yoy) / 1e4
    return pa.table({
        "n_name": pa.array(df["n_name"].astype(str)),
        "order_year": pa.array(df["order_year"].to_numpy(np.int64)),
        "revenue": pa.array(df["revenue"].to_numpy(np.float64)),
        "yoy_pct": pa.array(yoy4, pa.float64(),
                            from_pandas=True),   # NaN (first year) → null
    })


def customer_order_interarrival(sf_dir: str):
    """Per-customer order inter-arrival stats (count, mean gap, max gap
    in days) — the purchase-cadence shape behind churn features.

    Scale shape: project (custkey, day); ONE custkey groupby whose
    groups are bounded by a customer's order count and whose body is
    numpy sort→diff (the ``user_day_streaks`` pattern); the only
    exchange is the custkey shuffle of two narrow columns. Tie dates
    give 0-day gaps in both engines (the diff multiset of a sorted
    multiset is tie-order invariant), and mean = int sum / int count is
    one exact float64 division."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def to_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "day": batch.column("o_orderdate").cast(pa.date32()),
        })

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["day"].to_numpy().astype("datetime64[D]"))
        if len(d) < 2:
            return pd.DataFrame({
                "o_custkey": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
                "avg_gap_days": pd.Series([], dtype=np.float64),
                "max_gap_days": pd.Series([], dtype=np.int64)})
        dd = np.diff(d).astype("timedelta64[D]").astype(np.int64)
        return pd.DataFrame({
            "o_custkey": [int(g["o_custkey"].iloc[0])],
            "n_orders": [len(d)],
            "avg_gap_days": [round(float(dd.sum()) / len(dd), 6)],
            "max_gap_days": [int(dd.max())],
        })

    return (ds.map_batches(to_day, batch_format="pyarrow")
            .groupby("o_custkey")
            .map_groups(gaps, batch_format="pandas"))


def events_seasonality(sf_dir: str):
    """Day-of-week × hour-of-day activity profile (the seasonality
    heat-map): event count and mean value per (dow, hour) cell. dow is
    days-since-epoch mod 7 (0 = Thursday) — exact integer arithmetic
    both engines share instead of engine-specific week-start
    conventions (the ``events_weekly_retention`` trick).

    Scale shape: a per-batch combiner reduces every batch to ≤168
    cells, the groupby exchanges blocks×168 partial rows, and the mean
    is one division per cell at the end — event volume never crosses
    the wire."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        days = ts.cast(pa.date32()).to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "dow": days % 7,
            "hour": pc.hour(ts).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": batch.column("value").to_numpy(zero_copy_only=False)})
        g = df.groupby(["dow", "hour"], as_index=False).agg(
            n_events=("v", "size"), sum_value=("v", "sum"))
        g["n_events"] = g["n_events"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby(["dow", "hour"]) \
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value")) \
        .to_pandas().sort_values(["dow", "hour"])
    avg = agg["sum_value"].to_numpy(np.float64) \
        / agg["n_events"].to_numpy(np.float64)
    return pa.table({
        "dow": pa.array(agg["dow"].to_numpy(np.int64)),
        "hour": pa.array(agg["hour"].to_numpy(np.int64)),
        "n_events": pa.array(agg["n_events"].to_numpy(np.int64)),
        "avg_value": pa.array(np.round(avg, 4), pa.float64()),
    })


def event_type_hour_mi(sf_dir: str, max_cells: int = 100_000):
    """Mutual information between event_type and hour-of-day, in bits
    — the categorical-dependence measure (MI = Σ p(t,h)·log2(p(t,h) /
    (p(t)·p(h)))) next to the chi-square test, plus both marginal
    entropies (the feature-redundancy audit: NMI = MI/min(H) follows
    directly). One summary row.

    Scale shape (the bounded-domain histogram pattern of
    ``segment_priority_chisq``): every batch reduces to ≤ n_types×24
    joint cells through a per-batch combiner, one groupby sums the
    partials, and the entropy algebra runs driver-side on the bounded
    cell table (guarded loud by ``max_cells``, the grouped_median
    convention). Event volume never crosses the wire; the divisions
    and log2 calls are the same float64 ops the oracle SQL spells
    out, so round(6) is far inside the agreement margin."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "hour": pc.hour(batch.column("ts"))
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["event_type", "hour"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"event_type_hour_mi: {len(cells)} joint cells exceed "
            f"max_cells={max_cells}; the domain is not bounded enough "
            "for the histogram pattern")
    n = cells["n"].to_numpy(np.float64)
    total = n.sum()
    p = n / total
    pt = cells.groupby("event_type")["n"].transform("sum") \
        .to_numpy(np.float64) / total
    ph = cells.groupby("hour")["n"].transform("sum") \
        .to_numpy(np.float64) / total
    mi = float(np.sum(p * np.log2(p / (pt * ph))))
    tmarg = cells.groupby("event_type")["n"].sum() \
        .to_numpy(np.float64) / total
    hmarg = cells.groupby("hour")["n"].sum() \
        .to_numpy(np.float64) / total
    h_type = float(-np.sum(tmarg * np.log2(tmarg)))
    h_hour = float(-np.sum(hmarg * np.log2(hmarg)))
    return pa.table({
        "n_events": pa.array([int(total)], pa.int64()),
        "n_types": pa.array([len(tmarg)], pa.int64()),
        "n_hours": pa.array([len(hmarg)], pa.int64()),
        "h_type": pa.array([round(h_type, 6)], pa.float64()),
        "h_hour": pa.array([round(h_hour, 6)], pa.float64()),
        "mi_bits": pa.array([round(mi, 6)], pa.float64()),
    })


def events_daily_anomaly(sf_dir: str, window: int = 7):
    """Trailing z-score anomaly detection on the daily activity series
    — the aggregate-then-window monitoring shape: per (event_type,
    day), z = (today − mean(prev ≤window days)) / std(prev days), the
    frame EXCLUDING the current row (SQL ROWS BETWEEN window PRECEDING
    AND 1 PRECEDING). First day per type has an empty frame (z null);
    a single-row frame has no sample std (z null) — both engines agree
    because pandas shift+rolling(min_periods) reproduces the frame law
    exactly.

    Scale shape: the event volume reduces through the events_daily
    combiner; the window then runs per-type over a table bounded by
    the TIMELINE (days × types), via map_groups whose group count is
    |types|."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "day": np.datetime_as_string(d),
            "v": batch.column("value").to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "day"], as_index=False) \
            .agg(sum_value=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("sum_value", alias_name="sum_value"))

    def zscore(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day").reset_index(drop=True)
        s = g["sum_value"]
        prev = s.shift(1)
        mean = prev.rolling(window, min_periods=1).mean()
        std = prev.rolling(window, min_periods=2).std(ddof=1)
        z = (s - mean) / std.where(std != 0.0)
        z4 = np.copysign(np.floor(np.abs(z.to_numpy(np.float64))
                                  * 1e4 + 0.5), z.to_numpy(np.float64)) \
            / 1e4
        return pd.DataFrame({
            "event_type": g["event_type"],
            "day": g["day"],
            "sum_value": np.round(s.to_numpy(np.float64), 4),
            "z": z4,
        })

    return daily.groupby("event_type") \
        .map_groups(zscore, batch_format="pandas")


def segment_priority_chisq(sf_dir: str, form: str = "auto",
                           broadcast_limit: int = BROADCAST_LIMIT):
    """Chi-square association between customer market segment and
    order priority — the categorical-dependence audit (is the 5×5
    contingency table consistent with independence?). Emits one row
    per cell: observed, expected = row_total×col_total/n, and the
    cell's (obs−exp)²/exp contribution; the statistic is their sum.

    Scale shape: customer is the gated dimension (≤``broadcast_limit``
    rows → ray.put'd sorted probe arrays with segments factorized to
    int codes; above → native Dataset.join), orders reduce through a
    ≤25-cell per-batch combiner, and the expected/contribution algebra
    runs on the bounded cell table driver-side. Divisions are the same
    float64 ops the oracle SQL spells out, so doubles are
    bit-identical."""
    import ray

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    if form == "auto":
        form = "broadcast" if cust_ds.count() <= broadcast_limit \
            else "join"
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def _partial(codes: np.ndarray, prio: pd.Series) -> pa.Table:
        df = pd.DataFrame({"_seg": codes, "o_orderpriority": prio})
        g = df.groupby(["_seg", "o_orderpriority"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    if form == "broadcast":
        cust = cust_ds.to_pandas()
        codes, labels = pd.factorize(cust["c_mktsegment"], sort=True)
        ref = ray.put(_sorted_probe_arrays(
            cust["c_custkey"].to_numpy(np.int64),
            codes.astype(np.int64)))

        def probe(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            ck = batch.column("o_custkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            return _partial(_probe_sorted(sk, sv, ck, -1),
                            batch.column("o_orderpriority").to_pandas())

        cells = orders.map_batches(probe, batch_format="pyarrow",
                                   batch_size=16384)
        seg_of = {i: str(s) for i, s in enumerate(labels)}
    else:
        joined = orders.join(
            cust_ds, join_type="inner", on=("o_custkey",),
            right_on=("c_custkey",),
            num_partitions=_join_ray_parts(orders, cust_ds))

        def jpart(batch: pa.Table) -> pa.Table:
            segs, labels = pd.factorize(
                batch.column("c_mktsegment").to_pandas(), sort=True)
            df = pd.DataFrame({
                "_segname": np.asarray(labels, object)[segs],
                "o_orderpriority": batch.column("o_orderpriority")
                .to_pandas()})
            g = df.groupby(["_segname", "o_orderpriority"],
                           as_index=False) \
                .size().rename(columns={"size": "n"})
            g["n"] = g["n"].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        cells = joined.map_batches(jpart, batch_format="pyarrow",
                                   batch_size=16384)
        seg_of = None

    key = "_seg" if seg_of is not None else "_segname"
    agg = cells.groupby([key, "o_orderpriority"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if seg_of is not None:
        agg["c_mktsegment"] = agg[key].map(seg_of)
    else:
        agg["c_mktsegment"] = agg[key].astype(str)
    agg = agg.drop(columns=[key])

    n = float(agg["n"].sum())
    row = agg.groupby("c_mktsegment")["n"].transform("sum") \
        .to_numpy(np.float64)
    col = agg.groupby("o_orderpriority")["n"].transform("sum") \
        .to_numpy(np.float64)
    obs = agg["n"].to_numpy(np.float64)
    exp = row * col / n                       # the oracle's op order
    contrib = (obs - exp) * (obs - exp) / exp
    out = pd.DataFrame({
        "c_mktsegment": agg["c_mktsegment"].astype(str),
        "o_orderpriority": agg["o_orderpriority"].astype(str),
        "observed": obs.astype(np.int64),
        "expected": np.round(exp, 4),
        "chisq_contrib": np.round(contrib, 6),
    }).sort_values(["c_mktsegment", "o_orderpriority"])
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_open_backlog(sf_dir: str, hold_days: int = 30):
    """Interval-concurrency (backlog) curve: each order is open for
    ``hold_days`` from its order date; emit, for every day on which
    the open-set changes, the number of simultaneously open orders
    AFTER that day's openings and closings — the classic +1/−1 event
    sweep (concurrent-sessions shape).

    Scale shape: each batch reduces to (day, net-delta) partials (two
    counts per distinct day — +1 at the start day, −1 at the end day),
    the groupby exchanges timeline-bounded rows, and the running sum
    happens on the day-cardinality table driver-side. Order volume
    never crosses the wire."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        sv, sc = np.unique(d, return_counts=True)
        ev, ec = np.unique(d + np.timedelta64(hold_days, "D"),
                           return_counts=True)
        return pa.table({
            "day": pa.array(np.concatenate(
                (np.datetime_as_string(sv), np.datetime_as_string(ev)))),
            "net": pa.array(np.concatenate(
                (sc, -ec)).astype(np.int64)),
        })

    agg = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("day").aggregate(Sum("net", alias_name="net")) \
        .to_pandas().sort_values("day")
    return pa.table({
        "day": pa.array(agg["day"].astype(str)),
        "backlog": pa.array(np.cumsum(
            agg["net"].to_numpy(np.int64))),
    })


def suppliers_all_brands(sf_dir: str):
    """Relational division: suppliers whose shipped lineitems cover
    EVERY part brand in the catalog (the \"for all\" join shape SQL
    writes as HAVING count(DISTINCT …) = total).

    Scale shape: part is the broadcast dimension (partkey → dense
    brand code, factorized driver-side — the brand domain is bounded);
    lineitem batches probe it and emit per-batch DISTINCT packed
    (suppkey << 8 | code) keys; the high-cardinality distinct and the
    per-supplier count both run through the sortagg run-length
    machinery (``sorted_keyed_count``), so no per-group Python finisher
    and nothing key-sized on the driver."""
    import ray

    from ..functions.sortagg import sorted_keyed_count

    part_dim = _read(sf_dir, "part", ["p_partkey", "p_brand"]) \
        .to_pandas().sort_values("p_partkey")
    codes, labels = pd.factorize(part_dim["p_brand"], sort=True)
    n_brands = int(len(labels))
    assert n_brands < 256, "packed key reserves 8 bits for the brand"
    ref = ray.put(_sorted_probe_arrays(
        part_dim["p_partkey"].to_numpy(np.int64),
        codes.astype(np.int64)))

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def packed(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray

        sk, sv = _ray.get(ref)
        pk = batch.column("l_partkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sp = batch.column("l_suppkey") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        code = _probe_sorted(sk, sv, pk, -1)
        key = np.unique((sp << 8) | code)          # batch-local distinct
        return pa.table({"k": pa.array(key, pa.int64())})

    pairs = li.map_batches(packed, batch_format="pyarrow",
                           batch_size=65536)
    distinct = sorted_keyed_count(pairs, "k")      # globally distinct k

    def to_supp(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        return pa.table({"s_suppkey": pa.array(k >> 8, pa.int64())})

    per_supp = sorted_keyed_count(
        distinct.map_batches(to_supp, batch_format="pyarrow"),
        "s_suppkey", out="n_brands")
    out = per_supp.filter(expr=f"n_brands == {n_brands}") \
        .to_pandas().sort_values("s_suppkey")
    return pa.table({
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
        "n_brands": pa.array(out["n_brands"].to_numpy(np.int64)),
    })


def events_value_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the daily value series per event type
    — the time-series memory diagnostic. The event volume reduces
    through the events_daily combiner; the (x_t, x_{t−1}) pairing and
    Pearson correlation run per type over the timeline-bounded daily
    table (map_groups, |types| groups). Pairs with no predecessor drop
    out in both engines (SQL corr ignores NULL pairs)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "day": np.datetime_as_string(d),
            "v": batch.column("value").to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "day"], as_index=False) \
            .agg(sv=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("sv", alias_name="sv"))

    def ac(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        x = g["sv"].to_numpy(np.float64)
        if len(x) < 3:           # <2 pairs: sample corr undefined
            r = np.nan
        else:
            a, b = x[1:], x[:-1]
            am, bm = a - a.mean(), b - b.mean()
            den = float(np.sqrt((am * am).sum() * (bm * bm).sum()))
            r = float((am * bm).sum()) / den if den else np.nan
        return pd.DataFrame({
            "event_type": [str(g["event_type"].iloc[0])],
            "lag1_autocorr": [np.round(r, 6)],
            "n_pairs": [max(len(x) - 1, 0)],
        })

    out = daily.groupby("event_type") \
        .map_groups(ac, batch_format="pandas").to_pandas() \
        .sort_values("event_type")
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def revenue_grouping_sets(sf_dir: str, form: str = "auto",
                          broadcast_limit: int = BROADCAST_LIMIT):
    """GROUP BY GROUPING SETS ((nation), (year)) with the standard
    GROUPING() bitmask id — the remaining multi-level aggregation
    surface next to ROLLUP/CUBE (which this repo derives from the same
    leaf). grouping_id = 1 marks the per-nation set (year rolled), 2
    the per-year set (nation rolled) — GROUPING(nation, year) order.

    Scale shape identical to revenue_rollup: ONE gated leaf pass
    (``_nation_year_leaf``); both requested sets re-aggregate the
    nations×years leaf driver-side, sums unrounded until the final
    table so every set equals the sum of its leaves bit-for-bit."""
    df = _nation_year_leaf(sf_dir, form=form,
                           broadcast_limit=broadcast_limit).to_pandas() \
        .rename(columns={"n_name": "nation"})
    df["order_year"] = df["order_year"].astype("int64").astype(str)
    by_nation = df.groupby("nation", as_index=False) \
        .agg(_rev=("_rev", "sum"), _n=("_n", "sum"))
    by_nation["order_year"] = "ALL"
    by_nation["grouping_id"] = np.int64(1)
    by_year = df.groupby("order_year", as_index=False) \
        .agg(_rev=("_rev", "sum"), _n=("_n", "sum"))
    by_year["nation"] = "ALL"
    by_year["grouping_id"] = np.int64(2)
    cols = ["nation", "order_year", "grouping_id", "_rev", "_n"]
    out = pd.concat([by_nation[cols], by_year[cols]], ignore_index=True)
    out["revenue"] = _round2_snap(out["_rev"].to_numpy())
    out["n_orders"] = out["_n"].astype("int64")
    return pa.Table.from_pandas(
        out[["nation", "order_year", "grouping_id", "revenue",
             "n_orders"]], preserve_index=False)


def lineitem_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over the four lineitem
    numerics — the multi-column moment-sketch shape: each batch
    reduces to ONE row of sufficient statistics (n, per-column sums,
    and the upper triangle of XᵀX via one matmul), a single Sum
    aggregate folds blocks, and the 6-pair correlation algebra runs on
    that one row driver-side. One scan, no shuffle wider than
    blocks×15 doubles."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols)
    pairs = [(i, j) for i in range(4) for j in range(i, 4)]

    def part(batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in cols]).astype(np.float64)
        s = X.sum(axis=0)
        xtx = X.T @ X
        out = {"n": pa.array([float(len(X))], pa.float64())}
        for i in range(4):
            out[f"s{i}"] = pa.array([s[i]], pa.float64())
        for i, j in pairs:
            out[f"p{i}{j}"] = pa.array([xtx[i, j]], pa.float64())
        return pa.table(out)

    names = ["n"] + [f"s{i}" for i in range(4)] \
        + [f"p{i}{j}" for i, j in pairs]
    agg = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .aggregate(*[Sum(c, alias_name=c) for c in names])
    n = agg["n"]
    rows = []
    for i, j in pairs:
        if i == j:
            continue
        sx, sy = agg[f"s{i}"], agg[f"s{j}"]
        cxy = agg[f"p{i}{j}"] - sx * sy / n
        vx = agg[f"p{i}{i}"] - sx * sx / n
        vy = agg[f"p{j}{j}"] - sy * sy / n
        den = float(np.sqrt(vx * vy))
        na, nb = sorted((cols[i], cols[j]))   # corr is symmetric
        rows.append((na, nb, round(cxy / den, 6) if den else np.nan))
    rows.sort()
    return pa.table({
        "col_a": pa.array([r[0] for r in rows]),
        "col_b": pa.array([r[1] for r in rows]),
        "corr": pa.array([r[2] for r in rows], pa.float64()),
    })


def events_late_arrivals(sf_dir: str, lateness_sec: int = 3600):
    """Watermark / late-event accounting — the streaming-semantics
    audit: treating ``event_id`` as ARRIVAL order, an event is late
    when its event time sits more than ``lateness_sec`` behind the
    watermark (the running max event time over all strictly earlier
    arrivals). Emits per-type totals and late counts.

    The synthetic feed is time-ordered by event_id, so arrival order
    is a deterministic Knuth-multiplicative scramble of event_id
    ((id·2654435761) mod 2³², tie-broken by id) — the SAME integer
    arithmetic the oracle SQL computes — giving a genuinely
    out-of-order stream whose late counts are non-trivial.

    Scale shape: distributed PREFIX-MAX. One sort by arrival key (the
    operator's inherent exchange); pass 1 reduces each block to
    (first_key, block_max); the driver prefix-maxes the per-block rows
    into an EXCLUSIVE base watermark per block (blocks-sized, tiny)
    and broadcasts it; pass 2 seeds each block with its base and runs
    a vectorized shifted cumulative max, reducing to per-type (n,
    n_late) partials. No task sees more than its block; the driver
    sees blocks×1 rows."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def arrival(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        arr = (eid * np.int64(2654435761)) % np.int64(4294967296)
        return batch.append_column("arr", pa.array(arr, pa.int64()))

    s = ds.map_batches(arrival, batch_format="pyarrow",
                       batch_size=65536) \
        .sort(["arr", "event_id"]).materialize()
    late_us = np.int64(lateness_sec) * np.int64(1_000_000)

    def block_max(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_arr": pa.array([], pa.int64()),
                             "first_id": pa.array([], pa.int64()),
                             "max_ts": pa.array([], pa.int64())})
        ts = batch.column("ts").cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "first_arr": pa.array(
                [int(batch.column("arr")[0].as_py())], pa.int64()),
            "first_id": pa.array(
                [int(batch.column("event_id")[0].as_py())], pa.int64()),
            "max_ts": pa.array([int(ts.max())], pa.int64()),
        })

    blocks = s.map_batches(block_max, batch_format="pyarrow",
                           batch_size=None).to_pandas() \
        .sort_values(["first_arr", "first_id"])
    maxes = blocks["max_ts"].to_numpy(np.int64)
    # exclusive prefix max: base watermark entering each block
    bases = np.concatenate((
        [np.iinfo(np.int64).min],
        np.maximum.accumulate(maxes)[:-1])) if len(maxes) else maxes
    base_of = dict(zip(blocks["first_id"].to_numpy(np.int64),
                       bases))
    bref = ray.put(base_of)

    def late_partial(batch: pa.Table, bref=bref) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64())})
        base = _ray.get(bref)[
            int(batch.column("event_id")[0].as_py())]
        ts = batch.column("ts").cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # watermark of row i = max(base, ts[0..i-1]) — shifted cummax
        run = np.maximum.accumulate(
            np.concatenate(([base], ts[:-1])))
        late = ts < run - late_us
        # the true first arrival has no watermark (NULL in the oracle)
        if base == np.iinfo(np.int64).min:
            late[0] = False
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "late": late})
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"))
        g["n_events"] = g["n_events"].astype(np.int64)
        g["n_late"] = g["n_late"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return s.map_batches(late_partial, batch_format="pyarrow",
                         batch_size=None) \
        .groupby("event_type") \
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("n_late", alias_name="n_late")) \
        .sort("event_type")


def events_error_to_purchase(sf_dir: str):
    """Event-pairing (time-to-recovery shape): for every 'error'
    event, the same user's NEXT 'purchase' event strictly after it —
    the FORWARD as-of complement of events_asof_orders' backward
    lookup. Ordering and tie-breaks ride ONE packed int64
    (epoch-ms·2²² | event_id — range-asserted), so "next" is exact and
    deterministic in both engines.

    Scale shape: one projection, ONE user-keyed groupby with groups
    bounded by a user's event count; the per-group body is a reversed
    ``np.minimum.accumulate`` over the packed column with an int64
    sentinel for non-purchase rows, shifted one position for the
    strictly-after frame (SQL ROWS 1 FOLLOWING..UNBOUNDED)."""
    SHIFT = np.int64(4_194_304)          # 2^22
    SENT = np.iinfo(np.int64).max
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def pack(batch: pa.Table) -> pa.Table:
        ms = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[ms]").astype(np.int64)
        eid = batch.column("event_id") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        assert len(eid) == 0 or int(eid.max()) < (1 << 22)
        et = batch.column("event_type").to_pandas().to_numpy(object)
        pkd = ms * SHIFT + eid
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": pa.array(eid),
            "is_err": pa.array(et == "error"),
            "pkd": pa.array(pkd),
            "pp": pa.array(np.where(et == "purchase", pkd, SENT)),
        })

    def nxt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("pkd")
        pp = g["pp"].to_numpy(np.int64)
        # min over strictly-later rows: reversed cummin shifted by one
        suf = np.minimum.accumulate(pp[::-1])[::-1]
        excl = np.concatenate((suf[1:], [SENT]))
        keep = g["is_err"].to_numpy(bool) & (excl != SENT)
        nv = excl[keep]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[keep],
            "user_id": g["user_id"].to_numpy(np.int64)[keep],
            "next_purchase_id": nv % SHIFT,
            "next_purchase_ms": nv // SHIFT,
        })

    return ds.map_batches(pack, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("user_id").map_groups(nxt, batch_format="pandas")


def events_value_anova(sf_dir: str):
    """One-way ANOVA F-test of event value across ALL event types —
    the k-group generalization of the two-sample ``events_value_ttest``
    (reference surface: the dispatcher's per-strategy timing comparison
    is a two-group eyeball; this is the principled k-group test). One
    summary row: F = (SSB/(k−1)) / (SSW/(N−k)), plus eta² = SSB/SST
    (the effect size). Only scale-free ratios are emitted — raw sums
    of squares at 1e9 magnitude would sit outside float64's 6dp
    agreement margin, the ratios are far inside it.

    Scale shape: the parallelizable-moments reduction of
    ``events_value_ttest`` widened to every group — (n, Σx, Σx²)
    partials per type through a per-batch combiner, one k-row groupby,
    algebra on the driver. Event volume never crosses the wire."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "_n": np.int64(1), "_sx": x, "_sxx": x * x})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = ev.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_sx", alias_name="sx"),
                   Sum("_sxx", alias_name="sxx")).to_pandas()

    n = mom["n"].to_numpy(np.float64)
    sx = mom["sx"].to_numpy(np.float64)
    sxx = mom["sxx"].to_numpy(np.float64)
    k = len(mom)
    nn = n.sum()
    grand = sx.sum()
    ssb = float((sx * sx / n).sum() - grand * grand / nn)
    sst = float(sxx.sum() - grand * grand / nn)
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    return pa.table({
        "k_groups": pa.array([int(k)], pa.int64()),
        "n": pa.array([int(nn)], pa.int64()),
        "f_stat": pa.array([round(float(f), 6)], pa.float64()),
        "eta_sq": pa.array([round(ssb / sst, 6)], pa.float64()),
    })


def event_type_hour_cramersv(sf_dir: str, max_cells: int = 100_000):
    """Cramér's V between event_type and hour-of-day — the NORMALIZED
    strength-of-association twin of ``event_type_hour_mi`` (V =
    sqrt(χ² / (N·(min(r,c)−1))), bounded [0,1] regardless of table
    shape, so it is comparable across feature pairs the way raw χ²
    is not). One summary row: N, table shape, χ², V.

    Scale shape: identical to the MI op — every batch reduces to
    ≤ n_types×24 joint cells via a per-batch combiner, one groupby
    sums the partials (``max_cells`` loud-guard), χ² algebra on the
    bounded cell table driver-side. χ² sums (observed−expected)²/
    expected over ≤120 moderate-magnitude cells, far inside the 6dp
    agreement margin."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "hour": pc.hour(batch.column("ts"))
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["event_type", "hour"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"event_type_hour_cramersv: {len(cells)} joint cells "
            f"exceed max_cells={max_cells}")
    n = cells["n"].to_numpy(np.float64)
    total = n.sum()
    rt = cells.groupby("event_type")["n"].transform("sum") \
        .to_numpy(np.float64)
    ct = cells.groupby("hour")["n"].transform("sum") \
        .to_numpy(np.float64)
    # chi2 over OBSERVED cells plus the zero-observed remainder:
    # Σ_cells (o−e)²/e over all r×c cells = Σ o²/e − N (algebraic
    # identity; zero-observed cells contribute e = Σe − N-covered,
    # handled exactly by the identity, no dense grid needed)
    chi2 = float((n * n * total / (rt * ct)).sum() - total)
    r = cells["event_type"].nunique()
    c = cells["hour"].nunique()
    v = float(np.sqrt(chi2 / (total * (min(r, c) - 1))))
    return pa.table({
        "n": pa.array([int(total)], pa.int64()),
        "n_types": pa.array([int(r)], pa.int64()),
        "n_hours": pa.array([int(c)], pa.int64()),
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
        "cramers_v": pa.array([round(v, 6)], pa.float64()),
    })


def lineitem_kendall(sf_dir: str, max_cells: int = 1_000_000):
    """Kendall's τ-b between l_quantity and l_discount — the
    concordance-based rank correlation next to ``lineitem_spearman``,
    exact under heavy ties: τ-b = (C − D) / sqrt((n₀−n₁)(n₀−n₂)) with
    C/D the concordant/discordant pair counts and n₁/n₂ the x/y tie
    terms. One summary row.

    Scale shape: both columns have BOUNDED discrete domains (quantity
    1–50, discount in cent steps), so the pair counting runs on the
    joint histogram, never on row pairs — each batch reduces to its
    (x, y, n) cells, one groupby sums them into a ≤ |X|·|Y| grid
    (``max_cells`` loud-guard), and the driver counts concordances on
    the grid with a vectorized suffix-sum double scan: O(|X|·|Y|)
    instead of O(N²). All counts are integers — exact in float64 well
    past this scale; only τ itself is rounded."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "x": batch.column("l_quantity")
            .to_numpy(zero_copy_only=False).astype(np.float64),
            "y": batch.column("l_discount")
            .to_numpy(zero_copy_only=False).astype(np.float64)})
        g = df.groupby(["x", "y"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = li.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["x", "y"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"lineitem_kendall: {len(cells)} joint cells exceed "
            f"max_cells={max_cells}")

    xs = np.sort(cells["x"].unique())
    ys = np.sort(cells["y"].unique())
    grid = np.zeros((len(xs), len(ys)), np.int64)
    xi = np.searchsorted(xs, cells["x"].to_numpy(np.float64))
    yi = np.searchsorted(ys, cells["y"].to_numpy(np.float64))
    grid[xi, yi] = cells["n"].to_numpy(np.int64)

    # gt[i,j] = Σ grid[i'>i, j'>j]; lt-in-y twin for discordant
    suf = np.cumsum(np.cumsum(grid[::-1, ::-1], 0), 1)[::-1, ::-1]
    gt_both = np.zeros_like(grid)
    gt_both[:-1, :-1] = suf[1:, 1:]
    pre_y = np.cumsum(np.cumsum(grid[::-1, :], 0), 1)[::-1, :]
    gt_x_lt_y = np.zeros_like(grid)
    gt_x_lt_y[:-1, 1:] = pre_y[1:, :-1]
    conc = int((grid * gt_both).sum())
    disc = int((grid * gt_x_lt_y).sum())

    ntot = int(grid.sum())
    n0 = ntot * (ntot - 1) // 2
    tx = grid.sum(1)
    ty = grid.sum(0)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    tau = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    return pa.table({
        "n": pa.array([ntot], pa.int64()),
        "concordant": pa.array([conc], pa.int64()),
        "discordant": pa.array([disc], pa.int64()),
        "tau_b": pa.array([round(float(tau), 6)], pa.float64()),
    })


def orders_key_candidates(sf_dir: str):
    """Column-level uniqueness/key-candidate profile of the orders
    table — the discovery side of data profiling (Metanome-style
    unique-column detection) next to the value-level
    ``orders_column_profile``: per column, exact distinct count, null
    count, uniqueness ratio and the is-key verdict (distinct = rows
    AND no nulls). One row per column.

    Scale shape: each column profiles INDEPENDENTLY on a pruned
    single-column read — per-batch run-length partials (value → 1)
    through ``sorted_keyed_sum`` (the high-cardinality distinct
    reduction that never ships raw rows twice), distinct = row count
    of the reduced table, nulls from a per-batch counter. No
    all-columns melt, no driver materialization; per-column cost is
    one narrow shuffle of the reduced value table."""
    import pyarrow.parquet as pq

    from ..functions.sortagg import sorted_keyed_sum

    path = f"{sf_dir}/orders.parquet"
    cols = [f.name for f in pq.read_schema(path)]
    out_col, out_rows, out_d, out_nul = [], [], [], []
    for col in cols:
        ds = rd.read_parquet(path, columns=[col])

        def count_nulls(batch: pa.Table, col=col) -> pa.Table:
            v = batch.column(col)
            return pa.table({
                "_n": pa.array([len(v)], pa.int64()),
                "_nul": pa.array([v.null_count], pa.int64())})

        tot = ds.map_batches(count_nulls, batch_format="pyarrow",
                             batch_size=65536)
        n_rows = int(tot.sum("_n") or 0)
        n_null = int(tot.sum("_nul") or 0)

        def to_kv(batch: pa.Table, col=col) -> pa.Table:
            nn = batch.column(col).drop_null()
            return pa.table({
                "v": pc.cast(nn, pa.string()),
                "c": pa.array(np.ones(len(nn), np.int64))})

        reduced = sorted_keyed_sum(
            ds.map_batches(to_kv, batch_format="pyarrow",
                           batch_size=65536), "v", ["c"])
        n_distinct = reduced.count()
        out_col.append(col)
        out_rows.append(n_rows)
        out_d.append(int(n_distinct))
        out_nul.append(n_null)

    rows = np.asarray(out_rows, np.float64)
    dis = np.asarray(out_d, np.float64)
    nul = np.asarray(out_nul, np.int64)
    return pa.table({
        "column": pa.array(out_col, pa.string()),
        "n_rows": pa.array(np.asarray(out_rows, np.int64)),
        "n_distinct": pa.array(np.asarray(out_d, np.int64)),
        "n_null": pa.array(nul),
        "uniqueness": pa.array(np.round(dis / rows, 6), pa.float64()),
        "is_key": pa.array((dis == rows) & (nul == 0)),
    })


def customer_survival_km(sf_dir: str, censor_days: int = 180,
                       max_keys: int = 100_000):
    """Kaplan–Meier customer-retention survival curve — the censoring-aware
    churn estimate (Kaplan & Meier 1958) next to the point-in-time
    ``events_weekly_retention``: a customer's lifetime is first→last
    ORDER DATE in calendar days; customers still ordering within
    ``censor_days`` of the window end are right-CENSORED (their true
    lifetime is unknown, they only attest "≥ t"), everyone else
    churned at their last order day. S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over
    churn times, with the standard convention that at a tied time
    events precede censorings. One row per churn time: risk-set size,
    churn count, survival.

    Scale shape: per-customer (min, max) via ONE customer-keyed groupby (the
    only full-volume shuffle); lifetimes then collapse to the
    per-duration (churned, censored) histogram — bounded by the
    TIMELINE, not the customer count (``max_keys`` loud-guard) — and the
    suffix-sum risk sets + cumulative product run driver-side on that
    bounded table."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def part(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "o_custkey": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "_f": ts, "_l": ts})
        g = df.groupby("o_custkey", as_index=False) \
            .agg(f=("_f", "min"), l=("_l", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    spans = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("o_custkey") \
        .aggregate(Min("f", alias_name="f"), Max("l", alias_name="l")) \
        .materialize()
    t1 = int(spans.max("l"))
    cutoff = t1 - censor_days * 86_400_000_000

    def collapse(batch: pa.Table) -> pa.Table:
        f = batch.column("f").to_numpy(zero_copy_only=False)
        last = batch.column("l").to_numpy(zero_copy_only=False)
        dur = (last.astype("datetime64[us]").astype("datetime64[D]")
               .astype(np.int64)
               - f.astype("datetime64[us]").astype("datetime64[D]")
               .astype(np.int64))
        observed = last < cutoff
        df = pd.DataFrame({
            "dur": dur,
            "d_n": observed.astype(np.int64),
            "c_n": (~observed).astype(np.int64)})
        g = df.groupby("dur", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = spans.map_batches(collapse, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby("dur") \
        .aggregate(Sum("d_n", alias_name="d_n"),
                   Sum("c_n", alias_name="c_n")).to_pandas()
    if len(hist) > max_keys:
        raise ValueError(
            f"customer_survival_km: {len(hist)} distinct durations "
            f"exceed max_keys={max_keys}")
    hist = hist.sort_values("dur").reset_index(drop=True)
    leave = (hist["d_n"] + hist["c_n"]).to_numpy(np.int64)
    total = int(leave.sum())
    n_risk = total - np.concatenate(([0], np.cumsum(leave)[:-1]))
    d = hist["d_n"].to_numpy(np.int64)
    surv = np.cumprod(np.where(d > 0, 1.0 - d / n_risk, 1.0))
    keep = d > 0
    return pa.table({
        "duration_days": pa.array(
            hist["dur"].to_numpy(np.int64)[keep], pa.int64()),
        "n_risk": pa.array(n_risk[keep], pa.int64()),
        "n_events": pa.array(d[keep], pa.int64()),
        "survival": pa.array(np.round(surv[keep], 6), pa.float64()),
    })


def events_daily_holt(sf_dir: str, alpha: float = 0.3,
                      beta: float = 0.1):
    """Holt linear (double) exponential smoothing over the daily
    revenue series — the trend-aware forecasting recursion next to
    ``events_daily_cusum``: level lₜ = α·xₜ + (1−α)(lₜ₋₁ + bₜ₋₁),
    trend bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁, initialized l₁ = x₁,
    b₁ = x₂ − x₁ (Holt 1957). Per-day rows with the one-step-ahead
    fitted value fₜ = lₜ₋₁ + bₜ₋₁ (null on the first day).

    Scale shape: the daily aggregate is the distributed reduction
    (events_daily combiner); the smoothing recursion is inherently
    sequential and runs on the BOUNDED calendar series driver-side.
    Smoothing factors are written as α and (1 − α) in BOTH engines so
    the doubles agree bit-for-bit; the recursion is contractive, so
    the 1e-12 daily-sum noise never reaches the 4dp rounding."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    y = daily["rev"].to_numpy(np.float64)
    n = len(y)
    level = np.zeros(n)
    trend = np.zeros(n)
    fitted = np.full(n, np.nan)
    lv = y[0]
    bv = y[1] - y[0]
    level[0], trend[0] = lv, bv
    for t in range(1, n):
        fitted[t] = lv + bv
        l_new = alpha * y[t] + (1 - alpha) * (lv + bv)
        bv = beta * (l_new - lv) + (1 - beta) * bv
        lv = l_new
        level[t], trend[t] = lv, bv
    return pa.table({
        "day": pa.array(daily["day"].to_numpy(np.int64)),
        "revenue": pa.array(np.round(y, 4), pa.float64()),
        "level": pa.array(np.round(level, 4), pa.float64()),
        "trend": pa.array(np.round(trend, 4), pa.float64()),
        "fitted": pa.array(np.round(fitted, 4), pa.float64()),
    })


def doc_kwic(sf_dir: str, keyword: str = "join", width: int = 2):
    """Keyword-in-context concordance — every occurrence of
    ``keyword`` in the corpus with up to ``width`` tokens of context
    on each side, the corpus-linguistics inspection surface next to
    the aggregate term statistics (one row per occurrence: doc, 0-based
    token position, left/right context strings).

    Scale shape: a stateless ``map_batches`` explode (the corpus
    tokenization convention, lower + whitespace split) — no shuffle at
    all; output is bounded by keyword frequency, not corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, poss, lefts, rights = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = (text or "").lower().split()
            for i, t in enumerate(toks):
                if t == keyword:
                    ids.append(did)
                    poss.append(i)
                    lefts.append(" ".join(toks[max(0, i - width):i]))
                    rights.append(" ".join(toks[i + 1:i + 1 + width]))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "left_ctx": pa.array(lefts, pa.string()),
            "right_ctx": pa.array(rights, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=65536)


def nation_segment_similarity(sf_dir: str):
    """Pairwise cosine similarity between nations' customer-segment
    distributions — "which markets look alike", the
    distribution-similarity audit a mixture-rebalance pipeline runs
    before pooling sources. One row per unordered nation pair (lex
    a < b) with the cosine of their segment-count vectors.

    Scale shape: the customer table reduces to the BOUNDED
    nation × segment histogram (≤ 25×5 cells) via a per-batch combiner
    + one groupby; the nation-name lookup is a 25-row broadcast and
    the 300-pair cosine algebra runs driver-side on the bounded
    table."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int),
                     nat["n_name"]))

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "nk": batch.column("c_nationkey")
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "seg": batch.column("c_mktsegment").to_pandas()})
        g = df.groupby(["nk", "seg"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = cust.map_batches(part, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby(["nk", "seg"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    piv = cells.pivot_table(index="nk", columns="seg", values="n",
                            fill_value=0, aggfunc="sum")
    keys = sorted(piv.index)
    m = piv.loc[keys].to_numpy(np.float64)
    norm = np.sqrt((m * m).sum(axis=1))
    sim = (m @ m.T) / (norm[:, None] * norm[None, :])
    rows_a, rows_b, cos = [], [], []
    nms = [names[int(k)] for k in keys]
    order = np.argsort(np.asarray(nms, dtype=object))
    for ii in range(len(keys)):
        for jj in range(ii + 1, len(keys)):
            a, b = order[ii], order[jj]
            rows_a.append(nms[a])
            rows_b.append(nms[b])
            cos.append(round(float(sim[a, b]), 6))
    return pa.table({
        "nation_a": pa.array(rows_a, pa.string()),
        "nation_b": pa.array(rows_b, pa.string()),
        "cosine": pa.array(cos, pa.float64()),
    })


def orders_seasonal_index(sf_dir: str):
    """Month-of-year seasonal index of order revenue — index_m =
    12 · revenue_m / revenue_total, the classical-decomposition
    seasonal factor (ratio-to-moving-average simplified to
    ratio-to-grand-mean over a whole-year panel). One row per calendar
    month with order count, revenue and the index.

    Scale shape: a 12-cell histogram combiner — every batch reduces to
    ≤ 12 (month, n, rev) partials, one groupby sums them, the index
    algebra is driver-side on 12 rows."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        mo = pc.month(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"month": mo, "_n": np.int64(1), "_rev": v})
        g = df.groupby("month", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("month") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_rev", alias_name="rev")).to_pandas() \
        .sort_values("month").reset_index(drop=True)
    tot = float(m["rev"].sum())
    return pa.table({
        "month": pa.array(m["month"].to_numpy(np.int64)),
        "n_orders": pa.array(m["n"].to_numpy(np.int64)),
        "revenue": pa.array(
            np.round(m["rev"].to_numpy(np.float64), 2), pa.float64()),
        "seasonal_index": pa.array(
            np.round(12.0 * m["rev"].to_numpy(np.float64) / tot, 6),
            pa.float64()),
    })


def event_type_hour_residuals(sf_dir: str, max_cells: int = 100_000):
    """Standardized Pearson residuals of the event_type × hour
    contingency table — (observed − expected)/√expected per OBSERVED
    cell, the drill-down that says WHICH cells drive the association
    the ``event_type_hour_cramersv`` summary reports (|residual| > 2
    ≈ a significant cell). One row per observed cell.

    Scale shape: the same bounded-cell histogram combiner as the
    χ²/V/MI family; expected counts and residuals are driver-side
    algebra on ≤ n_types×24 cells (``max_cells`` loud-guard)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "hour": pc.hour(batch.column("ts"))
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["event_type", "hour"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"event_type_hour_residuals: {len(cells)} cells exceed "
            f"max_cells={max_cells}")
    n = cells["n"].to_numpy(np.float64)
    total = n.sum()
    rt = cells.groupby("event_type")["n"].transform("sum") \
        .to_numpy(np.float64)
    ct = cells.groupby("hour")["n"].transform("sum") \
        .to_numpy(np.float64)
    exp = rt * ct / total
    res = (n - exp) / np.sqrt(exp)
    return pa.table({
        "event_type": pa.array(cells["event_type"], pa.string()),
        "hour": pa.array(cells["hour"].to_numpy(np.int64)),
        "observed": pa.array(n.astype(np.int64)),
        "expected": pa.array(np.round(exp, 6), pa.float64()),
        "residual": pa.array(np.round(res, 6), pa.float64()),
    })


def orders_interarrival_expfit(sf_dir: str, max_keys: int = 100_000):
    """Exponential fit + goodness-of-fit of customer order
    interarrival times — λ̂ = 1/mean(gap) (the MLE) and the
    Kolmogorov–Smirnov D between the pooled gap ECDF and Exp(λ̂), the
    "is demand memoryless" audit behind queueing assumptions. One
    summary row (n_gaps, lambda, ks_d).

    Scale shape: gaps form per customer inside bounded ``map_groups``
    groups (a customer's order count); the pooled gap distribution
    then collapses to its integer-day HISTOGRAM (timeline-bounded,
    ``max_keys`` loud-guard), and both the mean and the exact ECDF
    sup-distance run on the histogram prefix scan driver-side — the
    Mann-Whitney/KS convention: no per-row ranks ever ship."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["o_orderdate"].to_numpy()
                    .astype("datetime64[D]").astype(np.int64))
        if len(d) < 2:
            return pd.DataFrame({"gap": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        df = pd.DataFrame({"gap": np.diff(d)})
        out = df.groupby("gap", as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    hist = ds.groupby("o_custkey") \
        .map_groups(gaps, batch_format="pandas") \
        .groupby("gap").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    if len(hist) > max_keys:
        raise ValueError(
            f"orders_interarrival_expfit: {len(hist)} distinct gaps "
            f"exceed max_keys={max_keys}")
    hist = hist.sort_values("gap").reset_index(drop=True)
    g = hist["gap"].to_numpy(np.float64)
    n = hist["n"].to_numpy(np.float64)
    total = n.sum()
    lam = total / float((g * n).sum())
    cum = np.cumsum(n)
    fe_hi = cum / total                    # ECDF at gap (right limit)
    fe_lo = (cum - n) / total              # ECDF just below gap
    fx = 1.0 - np.exp(-lam * g)
    ks = float(np.maximum(np.abs(fe_hi - fx),
                          np.abs(fe_lo - fx)).max())
    return pa.table({
        "n_gaps": pa.array([int(total)], pa.int64()),
        "lambda": pa.array([round(lam, 6)], pa.float64()),
        "ks_d": pa.array([round(ks, 6)], pa.float64()),
    })


def events_type_burstiness(sf_dir: str, max_cells: int = 1_000_000):
    """Per-type burstiness of the event stream — the Fano factor
    F = Var/Mean of each type's per-hour arrival counts over the full
    observation window (F ≈ 1 = Poisson, F > 1 = bursty), the
    dispersion audit that complements the memorylessness test
    ``orders_interarrival_expfit``. One row per event type.

    Scale shape: events reduce to the (type, hour-bucket) count
    histogram — TIMELINE-bounded (``max_cells`` loud-guard) — and the
    empty buckets every type silently has enter the moments as exact
    zeros via the global bucket count B: Var_pop = Σx²/B − (Σx/B)²
    needs only the observed cells plus B. Driver sees cells, never
    events."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        hb = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[h]").astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "bucket": hb})
        g = df.groupby(["event_type", "bucket"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "bucket"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"events_type_burstiness: {len(cells)} cells exceed "
            f"max_cells={max_cells}")
    b0 = int(cells["bucket"].min())
    b1 = int(cells["bucket"].max())
    nb = float(b1 - b0 + 1)
    out = []
    for et, g in cells.groupby("event_type"):
        x = g["n"].to_numpy(np.float64)
        s, ss = x.sum(), (x * x).sum()
        mean = s / nb
        var = ss / nb - mean * mean
        out.append((et, int(s), mean, var / mean))
    out.sort()
    return pa.table({
        "event_type": pa.array([o[0] for o in out], pa.string()),
        "n_events": pa.array([o[1] for o in out], pa.int64()),
        "mean_per_hour": pa.array(
            [round(o[2], 6) for o in out], pa.float64()),
        "fano_factor": pa.array(
            [round(o[3], 6) for o in out], pa.float64()),
    })


def revenue_price_volume_decomp(sf_dir: str, year0: int = 1996,
                                year1: int = 1997, form: str = "auto",
                                broadcast_limit: int = BROADCAST_LIMIT):
    """Laspeyres/Paasche price–volume decomposition of the
    year-over-year revenue change per part type — ΔR/R₀ splits exactly
    into a volume effect P₀·(Q₁−Q₀)/R₀ (quantity change at old prices)
    and a price effect Q₁·(P₁−P₀)/R₀ (price change at new volumes),
    the index-number identity behind every "was it price or demand"
    revenue bridge. One row per type present in both years; only
    scale-free percentage effects are emitted (raw currency deltas
    would sit at the edge of the 6dp agreement margin).

    Scale shape: the ``revenue_by_part_type`` gated-dimension pattern —
    partkey→type broadcast (sorted searchsorted probe) at or below
    ``broadcast_limit``, native join above it; per-batch (type, year)
    combiner partials so the final groupby carries ≤ types×2 rows per
    batch; the decomposition algebra runs driver-side on the bounded
    (type, year) table."""
    import ray

    from .dedup import _join_parts

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    if form == "auto":
        form = "broadcast" if part_ds.count() <= broadcast_limit \
            else "join"
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def _partial(types, yr, qty, rev) -> pa.Table:
        df = pd.DataFrame({"p_type": types, "year": yr,
                           "_q": qty, "_r": rev})
        df = df[(df["year"] == year0) | (df["year"] == year1)]
        g = df.groupby(["p_type", "year"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    if form == "broadcast":
        part = part_ds.to_pandas()
        codes, vocab = pd.factorize(part["p_type"])
        vocab = np.asarray(vocab, dtype=object)
        ref = ray.put(_sorted_probe_arrays(
            part["p_partkey"].to_numpy(np.int64),
            codes.astype(np.int32)))

        def probe(batch: pa.Table, ref=ref, vocab=vocab) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            keys = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            code = _probe_sorted(sk, sv, keys, -1)
            types = np.where(code >= 0,
                             vocab[np.maximum(code, 0)], "")
            yr = pc.year(batch.column("l_shipdate")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            q = batch.column("l_quantity") \
                .to_numpy(zero_copy_only=False)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount") \
                .to_numpy(zero_copy_only=False)
            return _partial(types, yr, q, ep * (1.0 - dc))

        partials = li.map_batches(probe, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        joined = li.join(part_ds, join_type="inner", on=("l_partkey",),
                         right_on=("p_partkey",),
                         num_partitions=_join_parts(li, part_ds))

        def jpartial(batch: pa.Table) -> pa.Table:
            yr = pc.year(batch.column("l_shipdate")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            q = batch.column("l_quantity") \
                .to_numpy(zero_copy_only=False)
            ep = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            dc = batch.column("l_discount") \
                .to_numpy(zero_copy_only=False)
            return _partial(batch.column("p_type").to_pandas(), yr,
                            q, ep * (1.0 - dc))

        partials = joined.map_batches(jpartial, batch_format="pyarrow",
                                      batch_size=65536)

    agg = partials.groupby(["p_type", "year"]) \
        .aggregate(Sum("_q", alias_name="q"),
                   Sum("_r", alias_name="r")).to_pandas()
    y0 = agg[agg["year"] == year0].set_index("p_type")
    y1 = agg[agg["year"] == year1].set_index("p_type")
    both = sorted(set(y0.index) & set(y1.index))
    rows = []
    for t in both:
        q0, r0 = float(y0.loc[t, "q"]), float(y0.loc[t, "r"])
        q1, r1 = float(y1.loc[t, "q"]), float(y1.loc[t, "r"])
        p0, p1 = r0 / q0, r1 / q1
        rows.append((t, q0, q1,
                     round((r1 - r0) / r0, 6),
                     round(p0 * (q1 - q0) / r0, 6),
                     round(q1 * (p1 - p0) / r0, 6)))
    return pa.table({
        "p_type": pa.array([r[0] for r in rows], pa.string()),
        "q0": pa.array([round(r[1], 2) for r in rows], pa.float64()),
        "q1": pa.array([round(r[2], 2) for r in rows], pa.float64()),
        "pct_total": pa.array([r[3] for r in rows], pa.float64()),
        "pct_volume": pa.array([r[4] for r in rows], pa.float64()),
        "pct_price": pa.array([r[5] for r in rows], pa.float64()),
    })


def user_conversion_shrinkage(sf_dir: str):
    """Empirical-Bayes shrinkage of per-user purchase rates — fit a
    Beta prior to the population of raw rates by method of moments
    (α = m·c, β = (1−m)·c, c = m(1−m)/v − 1) and report each user's
    posterior-mean rate (k+α)/(n+α+β), the James–Stein-flavored fix
    for "this user is 2/2 = 100% converting" small-sample noise. One
    row per user with raw and shrunk rates.

    Scale shape: per-user (n, k) via ONE user-keyed groupby combiner
    (the only full-volume shuffle); the prior moments reduce over the
    user-keyed RATE table through scalar map-sums; α/β then ride into
    a stateless final map. Nothing driver-side but four scalars."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def part(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pandas().to_numpy(object)
        df = pd.DataFrame({
            "user_id": batch.column("user_id")
            .to_numpy(zero_copy_only=False),
            "_n": np.int64(1),
            "_k": (et == "purchase").astype(np.int64)})
        g = df.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = ds.map_batches(part, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("user_id") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_k", alias_name="k")).materialize()

    def mom(batch: pa.Table) -> pa.Table:
        r = batch.column("k").to_numpy(zero_copy_only=False) \
            / batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "_c": pa.array([batch.num_rows], pa.int64()),
            "_s": pa.array([float(r.sum())]),
            "_ss": pa.array([float((r * r).sum())])})

    m = per_user.map_batches(mom, batch_format="pyarrow",
                             batch_size=65536)
    cnt = float(m.sum("_c"))
    s, ss = float(m.sum("_s")), float(m.sum("_ss"))
    mean = s / cnt
    var = ss / cnt - mean * mean
    common = mean * (1 - mean) / var - 1
    alpha = mean * common
    beta = (1 - mean) * common

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        k = batch.column("k").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "n_events": batch.column("n").cast(pa.int64()),
            "n_purchases": batch.column("k").cast(pa.int64()),
            "raw_rate": pa.array(np.round(k / n, 6), pa.float64()),
            "shrunk_rate": pa.array(
                np.round((k + alpha) / (n + alpha + beta), 6),
                pa.float64()),
        })

    return per_user.map_batches(finish, batch_format="pyarrow",
                                batch_size=65536)


def events_daily_ccf(sf_dir: str, max_lag: int = 7):
    """Cross-correlation function between two daily series from the
    event stream — purchase revenue vs error count, at lags 0…
    ``max_lag`` (does today's error volume co-move with purchase
    revenue k days later?) — the lead/lag diagnostic next to the
    single-series ``events_value_autocorr``. One row per lag with
    Pearson r over the overlapping day pairs (x leads by ``lag``).

    Scale shape: events reduce to TWO timeline-bounded daily series
    through one combiner + groupby; the lag alignment and the ≤
    max_lag+1 correlations run driver-side on the bounded calendar
    table (the CUSUM/Holt convention)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        et = batch.column("event_type").to_pandas().to_numpy(object)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "day": days,
            "_rev": np.where(et == "purchase", v, 0.0),
            "_err": (et == "error").astype(np.int64)})
        g = df.groupby("day", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day") \
        .aggregate(Sum("_rev", alias_name="rev"),
                   Sum("_err", alias_name="err")).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    day = daily["day"].to_numpy(np.int64)
    rev = daily["rev"].to_numpy(np.float64)
    err = daily["err"].to_numpy(np.float64)
    pos = {d: i for i, d in enumerate(day)}
    out_lag, out_n, out_r = [], [], []
    for lag in range(max_lag + 1):
        xs, ys = [], []
        for i, d in enumerate(day):
            j = pos.get(d + lag)
            if j is not None:
                xs.append(err[i])
                ys.append(rev[j])
        x = np.asarray(xs)
        y = np.asarray(ys)
        n = len(x)
        sx, sy = x.sum(), y.sum()
        cov = (x * y).sum() - sx * sy / n
        vx = (x * x).sum() - sx * sx / n
        vy = (y * y).sum() - sy * sy / n
        out_lag.append(lag)
        out_n.append(n)
        out_r.append(round(float(cov / np.sqrt(vx * vy)), 6))
    return pa.table({
        "lag_days": pa.array(out_lag, pa.int64()),
        "n_pairs": pa.array(out_n, pa.int64()),
        "ccf": pa.array(out_r, pa.float64()),
    })


def events_markov_entropy(sf_dir: str):
    """Entropy rate of the event-type Markov chain — H =
    −Σᵢ πᵢ Σⱼ Pᵢⱼ log₂ Pᵢⱼ with π the empirical source-state
    frequency, the predictability summary of the
    ``events_type_transitions`` matrix (0 bits = deterministic
    behavior, log₂|types| = uniform). One summary row with the
    conditional entropy rate, the marginal entropy of the source
    states, and the ratio (how much the past type tells you).

    Scale shape: rides the transitions op's bounded machinery —
    per-user pair emission in ``map_groups``, one |types|²-sized
    groupby, entropy algebra on the tiny matrix driver-side."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type",
                                  "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": [], "to_type": [],
                                 "c": []})
        df = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
        df["c"] = np.int64(1)
        return df.groupby(["from_type", "to_type"],
                          as_index=False)["c"].sum()

    counts = ds.groupby("user_id") \
        .map_groups(pairs, batch_format="pandas") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("c", alias_name="n")).to_pandas()
    n = counts["n"].to_numpy(np.float64)
    total = n.sum()
    row = counts.groupby("from_type")["n"].transform("sum") \
        .to_numpy(np.float64)
    p_cond = n / row
    pi = row / total
    h_rate = float(-(pi * p_cond * np.log2(p_cond)).sum())
    marg = counts.groupby("from_type")["n"].sum() \
        .to_numpy(np.float64) / total
    h_marg = float(-(marg * np.log2(marg)).sum())
    return pa.table({
        "n_transitions": pa.array([int(total)], pa.int64()),
        "n_states": pa.array([counts["from_type"].nunique()],
                             pa.int64()),
        "entropy_rate_bits": pa.array([round(h_rate, 6)],
                                      pa.float64()),
        "marginal_entropy_bits": pa.array([round(h_marg, 6)],
                                          pa.float64()),
        "predictability_gain": pa.array(
            [round(1.0 - h_rate / h_marg, 6)], pa.float64()),
    })


def orders_hill_tail_index(sf_dir: str, k: int = 500):
    """Hill estimator of the order-value tail index — α̂ =
    k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k largest values (Hill 1975), the
    heavy-tail audit behind "can we trust the mean": α ≤ 2 means
    infinite variance, α ≤ 1 infinite mean. One summary row with the
    threshold x₍ₖ₊₁₎ and α̂.

    Scale shape: the statistic only needs the global top k+1 order
    statistics, so it rides the distributed TOP-K pattern (per-batch
    local top-(k+1) combiner, one small sort over blocks×(k+1) rows);
    the log-ratio algebra is driver-side on k values. No full sort,
    no full shuffle."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def local_top(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice") \
            .to_numpy(zero_copy_only=False)
        if len(v) > k + 1:
            v = np.partition(v, len(v) - (k + 1))[-(k + 1):]
        return pa.table({"v": pa.array(v, pa.float64())})

    top = ds.map_batches(local_top, batch_format="pyarrow",
                         batch_size=65536) \
        .sort("v", descending=True).limit(k + 1).to_pandas()
    v = top["v"].to_numpy(np.float64)
    xk1 = float(v[k])
    logs = np.log(v[:k] / xk1)
    alpha = k / float(logs.sum())
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "threshold": pa.array([round(xk1, 2)], pa.float64()),
        "hill_alpha": pa.array([round(alpha, 6)], pa.float64()),
    })


def events_daily_changepoint(sf_dir: str):
    """Single best mean-shift changepoint in the daily revenue series
    by binary segmentation — split the series at the t minimizing
    SSE(left) + SSE(right) (equivalently maximizing the two-segment
    cost reduction; the first step of the PELT/binary-segmentation
    family). One summary row: the split day (first day of the right
    segment), segment means and the SSE reduction vs the unsplit
    series. Earliest day wins cost ties (both engines scan in day
    order).

    Scale shape: the daily aggregate is the distributed reduction; the
    O(days) split scan runs driver-side on the bounded calendar series
    via prefix sums — SSE(prefix) = ss₁..t − s₁..t²/t needs no second
    pass."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    day = daily["day"].to_numpy(np.int64)
    y = daily["rev"].to_numpy(np.float64)
    n = len(y)
    ps = np.cumsum(y)
    pss = np.cumsum(y * y)
    tot_s, tot_ss = ps[-1], pss[-1]
    sse_full = tot_ss - tot_s * tot_s / n
    # split after index t (left = 0..t, right = t+1..n-1), t in 0..n-2
    t = np.arange(n - 1)
    n1 = (t + 1).astype(np.float64)
    n2 = n - n1
    s1 = ps[t]
    s2 = tot_s - s1
    ss1 = pss[t]
    ss2 = tot_ss - ss1
    cost = (ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)
    best = int(np.argmin(np.round(cost, 6)))
    return pa.table({
        "split_day": pa.array([int(day[best + 1])], pa.int64()),
        "n_before": pa.array([best + 1], pa.int64()),
        "n_after": pa.array([n - best - 1], pa.int64()),
        "mean_before": pa.array(
            [round(float(s1[best] / n1[best]), 4)], pa.float64()),
        "mean_after": pa.array(
            [round(float(s2[best] / n2[best]), 4)], pa.float64()),
        "sse_reduction": pa.array(
            [round(float(sse_full - cost[best]), 4)], pa.float64()),
    })


def event_type_hour_gtest(sf_dir: str, max_cells: int = 100_000):
    """G-test (likelihood-ratio) of event_type × hour independence —
    G = 2·Σ o·ln(o/e), the information-theoretic twin of the Pearson
    χ² (G = 2N·ln2·MI, so this closes the association-test family:
    χ², V, MI, residuals, G all over one contingency). One summary
    row.

    Scale shape: the same bounded-cell histogram combiner as the rest
    of the family; only observed cells enter (o = 0 terms vanish), so
    the driver-side algebra needs no dense grid."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "hour": pc.hour(batch.column("ts"))
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["event_type", "hour"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"event_type_hour_gtest: {len(cells)} cells exceed "
            f"max_cells={max_cells}")
    n = cells["n"].to_numpy(np.float64)
    total = n.sum()
    rt = cells.groupby("event_type")["n"].transform("sum") \
        .to_numpy(np.float64)
    ct = cells.groupby("hour")["n"].transform("sum") \
        .to_numpy(np.float64)
    g_stat = float(2.0 * (n * np.log(n * total / (rt * ct))).sum())
    r = cells["event_type"].nunique()
    c = cells["hour"].nunique()
    return pa.table({
        "n": pa.array([int(total)], pa.int64()),
        "df": pa.array([(r - 1) * (c - 1)], pa.int64()),
        "g_stat": pa.array([round(g_stat, 6)], pa.float64()),
    })


def events_daily_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs test on the daily revenue series — are
    above-median and below-median days randomly interleaved, or do
    they clump (trend/regime) or alternate (overdifferencing)? One
    summary row: run count, above/below counts, expected runs and the
    z-statistic under the null.

    Scale shape: daily aggregate = the distributed reduction; the
    median split (exact, midpoint-of-middle-two convention) and the
    O(days) run count scan run driver-side on the bounded calendar
    series. Days equal to the median are dropped (the standard
    convention)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    y = daily["rev"].to_numpy(np.float64)
    med = float(np.median(np.round(y, 4)))
    yr = np.round(y, 4)
    side = yr[yr != med] > med
    n1 = int(side.sum())
    n2 = int(len(side) - n1)
    runs = int(1 + (side[1:] != side[:-1]).sum()) if len(side) else 0
    mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2) ** 2 * (n1 + n2 - 1.0)))
    z = (runs - mu) / np.sqrt(var)
    return pa.table({
        "n_above": pa.array([n1], pa.int64()),
        "n_below": pa.array([n2], pa.int64()),
        "n_runs": pa.array([runs], pa.int64()),
        "expected_runs": pa.array([round(mu, 6)], pa.float64()),
        "z_stat": pa.array([round(float(z), 6)], pa.float64()),
    })


def doc_length_lognormal_fit(sf_dir: str):
    """Lognormal fit + goodness-of-fit of the document length
    distribution — μ̂, σ̂ = moments of ln(n_chars) (the MLE) and the
    KS D between the length ECDF and LogN(μ̂, σ̂²), the "are my docs
    the usual web-length shape" audit (web document lengths are
    famously lognormal-ish). One summary row.

    Scale shape: ln-moments reduce through scalar map-sums; the exact
    ECDF sup-distance runs on the length HISTOGRAM (n_chars is
    integer, value-bounded) via the same prefix-scan convention as
    ``orders_interarrival_expfit``. Φ is the Abramowitz–Stegun
    26.2.17 polynomial (|err| < 7.5e-8), written IDENTICALLY in both
    engines (DuckDB has no erf) — the shared approximation error
    cancels in the comparison."""
    from ..functions.sortagg import sorted_keyed_sum

    ds = _read(sf_dir, "documents", ["n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "c": pa.array(np.ones(len(v), np.int64))})

    hist = sorted_keyed_sum(
        ds.map_batches(prep, batch_format="pyarrow",
                       batch_size=65536), "v", ["c"]) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    v = hist["v"].to_numpy(np.float64)
    c = hist["c"].to_numpy(np.float64)
    total = c.sum()
    lv = np.log(v)
    mu = float((lv * c).sum() / total)
    sd = float(np.sqrt((lv * lv * c).sum() / total - mu * mu))
    cum = np.cumsum(c)
    fe_hi = cum / total
    fe_lo = (cum - c) / total
    z = (lv - mu) / sd
    az = np.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    pdf = np.exp(-az * az / 2.0) / np.sqrt(2.0 * np.pi)
    poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
               + t * (-1.821255978 + t * 1.330274429))))
    upper = pdf * poly                     # 1 - Phi(|z|)
    fx = np.where(z >= 0, 1.0 - upper, upper)
    ks = float(np.maximum(np.abs(fe_hi - fx),
                          np.abs(fe_lo - fx)).max())
    return pa.table({
        "n_docs": pa.array([int(total)], pa.int64()),
        "mu_log": pa.array([round(mu, 6)], pa.float64()),
        "sigma_log": pa.array([round(sd, 6)], pa.float64()),
        "ks_d": pa.array([round(ks, 6)], pa.float64()),
    })


def events_halves_proportion_ztest(sf_dir: str):
    """Two-proportion z-test of the purchase share between the first
    and second half of the event stream (split at the midpoint
    calendar day, the PSI convention) — did the conversion mix drift?
    One summary row: both proportions, the pooled z and the absolute
    difference.

    Scale shape: the events reduce to four counters (n, purchases per
    half) through one combiner + a two-row groupby; z algebra is
    driver-side scalars."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def day_range(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"_mn": pa.array([int(d.min())], pa.int64()),
                         "_mx": pa.array([int(d.max())], pa.int64())})

    rng = ds.map_batches(day_range, batch_format="pyarrow",
                         batch_size=65536)
    split = (int(rng.min("_mn")) + int(rng.max("_mx"))) // 2

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        et = batch.column("event_type").to_pandas().to_numpy(object)
        half = (d > split).astype(np.int64)
        df = pd.DataFrame({
            "half": half, "_n": np.int64(1),
            "_k": (et == "purchase").astype(np.int64)})
        g = df.groupby("half", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("half") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_k", alias_name="k")).to_pandas() \
        .set_index("half")
    n1, k1 = float(m.loc[0, "n"]), float(m.loc[0, "k"])
    n2, k2 = float(m.loc[1, "n"]), float(m.loc[1, "k"])
    p1, p2 = k1 / n1, k2 / n2
    pp = (k1 + k2) / (n1 + n2)
    z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    return pa.table({
        "n_first": pa.array([int(n1)], pa.int64()),
        "n_second": pa.array([int(n2)], pa.int64()),
        "p_first": pa.array([round(p1, 6)], pa.float64()),
        "p_second": pa.array([round(p2, 6)], pa.float64()),
        "z_stat": pa.array([round(float(z), 6)], pa.float64()),
    })


def order_value_means_by_priority(sf_dir: str):
    """Arithmetic, geometric and harmonic mean order value per
    priority — the Pythagorean-means triple (AM ≥ GM ≥ HM, with the
    gaps measuring spread) that finishes the aggregate family next to
    median/MAD/trimmed/winsorized: GM = exp(mean ln x), HM =
    n/Σ(1/x). One row per priority.

    Scale shape: one combiner pass reduces each batch to per-priority
    (n, Σx, Σln x, Σ1/x) partials; a k-row groupby and driver algebra
    finish."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "o_orderpriority": batch.column("o_orderpriority")
            .to_pandas(),
            "_n": np.int64(1), "_s": v, "_l": np.log(v),
            "_r": 1.0 / v})
        g = df.groupby("o_orderpriority", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("o_orderpriority") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_s", alias_name="s"),
                   Sum("_l", alias_name="l"),
                   Sum("_r", alias_name="r")).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    n = m["n"].to_numpy(np.float64)
    return pa.table({
        "o_orderpriority": pa.array(m["o_orderpriority"], pa.string()),
        "n_orders": pa.array(m["n"].to_numpy(np.int64)),
        "mean_value": pa.array(
            np.round(m["s"].to_numpy(np.float64) / n, 4),
            pa.float64()),
        "geomean_value": pa.array(
            np.round(np.exp(m["l"].to_numpy(np.float64) / n), 4),
            pa.float64()),
        "harmean_value": pa.array(
            np.round(n / m["r"].to_numpy(np.float64), 4),
            pa.float64()),
    })


def events_levene_test(sf_dir: str):
    """Brown–Forsythe (median-centered Levene) test of variance
    equality across event types — W = ((N−k)/(k−1)) ·
    Σnⱼ(z̄ⱼ−z̄)² / ΣΣ(z−z̄ⱼ)² with z = |x − medianⱼ|, the robust
    "are the spreads equal" companion to ``events_value_anova`` (which
    assumes they are). One summary row.

    Scale shape: per-type medians via the distributed two-pass
    histogram selection (``grouped_median_distributed``, never a
    whole group in one task), broadcast into a vectorized |x−med|
    combiner pass, and the ANOVA-on-deviations algebra from k-row
    moment partials driver-side."""
    import ray

    ds = _read(sf_dir, "events", ["event_type", "value"])
    med = grouped_median_distributed(ds, "event_type", "value")
    med_map = {k: float(v) for k, v in
               zip(med.column("event_type").to_pylist(),
                   med.column("median").to_pylist())}
    mref = ray.put(med_map)

    def part(batch: pa.Table, mref=mref) -> pa.Table:
        mm = ray.get(mref)
        et = batch.column("event_type").to_pandas()
        v = batch.column("value").to_numpy(zero_copy_only=False)
        meds = et.map(mm).to_numpy(np.float64)
        z = np.abs(v - meds)
        df = pd.DataFrame({"event_type": et, "_n": np.int64(1),
                           "_s": z, "_ss": z * z})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_s", alias_name="s"),
                   Sum("_ss", alias_name="ss")).to_pandas()
    n = m["n"].to_numpy(np.float64)
    s = m["s"].to_numpy(np.float64)
    ss = m["ss"].to_numpy(np.float64)
    k = len(m)
    nn = n.sum()
    gm = s.sum() / nn
    num = float((n * (s / n - gm) ** 2).sum())
    den = float((ss - s * s / n).sum())
    w = ((nn - k) / (k - 1.0)) * num / den
    return pa.table({
        "k_groups": pa.array([k], pa.int64()),
        "n": pa.array([int(nn)], pa.int64()),
        "w_stat": pa.array([round(w, 6)], pa.float64()),
    })


def events_median_test(sf_dir: str):
    """Mood's median test across event types — the χ² on the
    type × (above/below grand median) contingency, the fully
    nonparametric location test that completes the family (ANOVA =
    means, Kruskal-ish MW = two-sample ranks, this = k-sample signs).
    One summary row; values equal to the grand median are excluded
    (the standard convention).

    Scale shape: the grand median via the SAME distributed histogram
    selection (constant grouping key — no per-task group
    materialization), then a k×2 contingency combiner and driver χ²."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def const_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "_g": pa.array(np.zeros(batch.num_rows, np.int64)),
            "value": batch.column("value").cast(pa.float64())})

    gm_t = grouped_median_distributed(
        ds.map_batches(const_key, batch_format="pyarrow",
                       batch_size=65536), "_g", "value")
    gmed = float(gm_t.column("median")[0].as_py())

    def part(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").to_pandas()
        keep = v != gmed
        df = pd.DataFrame({
            "event_type": et[keep],
            "_a": (v[keep] > gmed).astype(np.int64),
            "_b": (v[keep] < gmed).astype(np.int64)})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("_a", alias_name="a"),
                   Sum("_b", alias_name="b")).to_pandas()
    a = m["a"].to_numpy(np.float64)
    b = m["b"].to_numpy(np.float64)
    nn = a.sum() + b.sum()
    ra = a.sum()
    rb = b.sum()
    nj = a + b
    ea = nj * ra / nn
    eb = nj * rb / nn
    chi2 = float(((a - ea) ** 2 / ea).sum()
                 + ((b - eb) ** 2 / eb).sum())
    return pa.table({
        "k_groups": pa.array([len(m)], pa.int64()),
        "n": pa.array([int(nn)], pa.int64()),
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
    })


def events_kruskal_wallis(sf_dir: str):
    """Kruskal–Wallis H across all event types' value distributions —
    the k-sample rank generalization of ``events_value_mannwhitney``
    (and the nonparametric twin of ``events_value_anova``): H =
    (12/(N(N+1))) Σ nⱼ R̄ⱼ² − 3(N+1), tie-corrected by
    1 − Σ(t³−t)/(N³−N). One summary row.

    Scale shape: ranks NEVER attach to rows — the per-distinct-value
    (value, per-type count) histogram from ``sorted_keyed_sum`` plus
    ONE distributed exclusive prefix scan gives every value's midrank
    (the Mann-Whitney/Spearman pattern), and Σ ranks per type is a
    weighted sum over the histogram. Tie term rides the same table."""
    import ray

    from ..functions.sortagg import sorted_keyed_sum

    ds = _read(sf_dir, "events", ["event_type", "value"])
    types = sorted(r["event_type"] for r in
                   ds.groupby("event_type").count().iter_rows())
    t_idx = {t: i for i, t in enumerate(types)}
    k = len(types)

    def prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pandas().to_numpy(object)
        cols = {"value": batch.column("value").cast(pa.float64())}
        for t, i in t_idx.items():
            cols[f"c{i}"] = pa.array((et == t).astype(np.int64))
        return pa.table(cols)

    cnames = [f"c{i}" for i in range(k)]
    g = sorted_keyed_sum(ds.map_batches(prep, batch_format="pyarrow",
                                        batch_size=65536),
                         "value", cnames) \
        .sort("value").materialize()

    # block partials -> exclusive prefix of total counts (midranks)
    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bid": pa.array([], pa.float64()),
                             "tc": pa.array([], pa.int64())})
        v = batch.column("value").to_numpy(zero_copy_only=False)
        tot = np.zeros(batch.num_rows, np.int64)
        for c in cnames:
            tot += batch.column(c).to_numpy(zero_copy_only=False)
        return pa.table({
            "bid": pa.array([float(v.min())], pa.float64()),
            "tc": pa.array([int(tot.sum())], pa.int64())})

    blocks = sorted(
        (r["bid"], r["tc"])
        for r in g.map_batches(block_partial, batch_format="pyarrow",
                               batch_size=None).iter_rows())
    bases = {}
    run = 0
    for bid, tc in blocks:
        bases[bid] = run
        run += tc
    bref = ray.put(bases)

    def rank_partial(batch: pa.Table, bref=bref) -> pa.Table:
        if batch.num_rows == 0:
            out = {f"r{i}": pa.array([], pa.float64())
                   for i in range(k)}
            out["_t3"] = pa.array([], pa.float64())
            return pa.table(out)
        bases = ray.get(bref)
        df = batch.to_pandas().sort_values("value")
        cs = np.column_stack([df[c].to_numpy(np.float64)
                              for c in cnames])
        tot = cs.sum(axis=1)
        below = bases[float(df["value"].iloc[0])] \
            + np.cumsum(tot) - tot
        mid = below + (tot + 1) / 2.0
        out = {f"r{i}": pa.array([float((cs[:, i] * mid).sum())])
               for i in range(k)}
        out["_t3"] = pa.array([float((tot ** 3 - tot).sum())])
        return pa.table(out)

    parts = g.map_batches(rank_partial, batch_format="pyarrow",
                          batch_size=None)
    rsum = np.array([float(parts.sum(f"r{i}")) for i in range(k)])
    ties = float(parts.sum("_t3") or 0.0)
    ncnt = np.array([float(g.sum(c) or 0.0) for c in cnames])
    nn = ncnt.sum()
    h = (12.0 / (nn * (nn + 1.0))) \
        * float((rsum * rsum / ncnt).sum()) - 3.0 * (nn + 1.0)
    corr = 1.0 - ties / (nn ** 3 - nn)
    return pa.table({
        "k_groups": pa.array([k], pa.int64()),
        "n": pa.array([int(nn)], pa.int64()),
        "h_stat": pa.array([round(h / corr, 6)], pa.float64()),
    })


def events_hour_trend_test(sf_dir: str):
    """Cochran–Armitage trend test of purchase share across the
    ordered hour-of-day — is conversion drifting monotonically through
    the day, not just varying (the ordered-alternative sharpening of
    the contingency χ²)? z = Σkᵢsᵢ − p̂Σnᵢsᵢ over
    √(p̂(1−p̂)(Σnᵢsᵢ² − (Σnᵢsᵢ)²/N)), scores sᵢ = hour. One summary
    row.

    Scale shape: the 24-cell (hour, n, purchases) histogram combiner;
    driver-side scalar algebra."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def part(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pandas().to_numpy(object)
        df = pd.DataFrame({
            "hour": pc.hour(batch.column("ts"))
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "_n": np.int64(1),
            "_k": (et == "purchase").astype(np.int64)})
        g = df.groupby("hour", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("hour") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_k", alias_name="k")).to_pandas()
    s = m["hour"].to_numpy(np.float64)
    n = m["n"].to_numpy(np.float64)
    kk = m["k"].to_numpy(np.float64)
    nn = n.sum()
    p = kk.sum() / nn
    num = float((kk * s).sum()) - p * float((n * s).sum())
    den = np.sqrt(p * (1 - p)
                  * (float((n * s * s).sum())
                     - float((n * s).sum()) ** 2 / nn))
    return pa.table({
        "n": pa.array([int(nn)], pa.int64()),
        "p_overall": pa.array([round(float(p), 6)], pa.float64()),
        "z_trend": pa.array([round(num / den, 6)], pa.float64()),
    })


def events_daily_peaks(sf_dir: str):
    """Local maxima of the daily revenue series — days strictly above
    both calendar neighbors (the minimal peak-detection primitive
    under every alerting rule; endpoints can't be peaks). One row per
    peak day with its prominence over the higher neighbor.

    Scale shape: daily aggregate = the distributed reduction; the
    neighbor comparison is a lag/lead scan on the bounded calendar
    series driver-side."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    y = np.round(daily["rev"].to_numpy(np.float64), 4)
    day = daily["day"].to_numpy(np.int64)
    if len(y) < 3:
        return pa.table({"day": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.float64()),
                         "prominence": pa.array([], pa.float64())})
    mid = np.arange(1, len(y) - 1)
    is_peak = (y[mid] > y[mid - 1]) & (y[mid] > y[mid + 1])
    pk = mid[is_peak]
    prom = y[pk] - np.maximum(y[pk - 1], y[pk + 1])
    return pa.table({
        "day": pa.array(day[pk], pa.int64()),
        "revenue": pa.array(y[pk], pa.float64()),
        "prominence": pa.array(np.round(prom, 4), pa.float64()),
    })


def doc_filter_rules(sf_dir: str):
    """Explicit Gopher + C4 quality-rule battery per document — the
    canonical training-data filters (Rae et al. 2021 §A1.1; Raffel
    et al. 2020 §2.2) as per-rule columns, not a composite score (the
    composite lives in ``doc_quality``): a curator needs to see WHICH
    rule fired before trusting a drop. One row per doc with the raw
    signals, each rule verdict and the two keep flags.

    Rules (on the whitespace-token convention): Gopher = word count in
    [50, 100k], mean word length in [3, 10], ≥80% words containing a
    letter, ≥2 distinct function words present; C4 = ≥3 sentences, no
    'javascript'/'lorem ipsum', no '{'. Terminal-punctuation line
    ratio is emitted as a signal (single-line synthetic docs make it
    degenerate, but the machinery is the real one).

    Scale shape: one stateless pruned-column ``map_batches`` — the
    same embarrassingly-parallel stage shape as ``doc_quality``; zero
    shuffle."""
    STOPS = ("the", "and", "a", "of", "to", "in")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rules(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in
               ["doc_id", "word_count", "mean_word_len",
                "alpha_ratio", "stop_hits", "n_sentences",
                "term_punct_line_ratio", "keep_gopher", "keep_c4"]}
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            t = text or ""
            low = t.lower()
            words = low.split()
            wc = len(words)
            mwl = sum(len(w) for w in words) / max(wc, 1)
            alpha = sum(1 for w in words
                        if any("a" <= c <= "z" for c in w)) \
                / max(wc, 1)
            stop_hits = sum(1 for s in STOPS if s in words)
            n_sent = len([s for s in t.split(".") if s.strip()])
            lines = [ln for ln in t.split("\n") if ln.strip()]
            term = sum(1 for ln in lines
                       if ln.rstrip()[-1:] in '.!?"') \
                / max(len(lines), 1)
            out["doc_id"].append(did)
            out["word_count"].append(wc)
            # half-away-from-zero: word-length sums divide by powers
            # of two, landing EXACTLY on .xxx5 midpoints where
            # banker's rounding diverges from DuckDB ROUND
            out["mean_word_len"].append(
                float(np.floor(mwl * 1e4 + 0.5) / 1e4))
            out["alpha_ratio"].append(round(alpha, 6))
            out["stop_hits"].append(stop_hits)
            out["n_sentences"].append(n_sent)
            out["term_punct_line_ratio"].append(round(term, 6))
            out["keep_gopher"].append(
                50 <= wc <= 100_000 and 3.0 <= mwl <= 10.0
                and alpha >= 0.8 and stop_hits >= 2)
            out["keep_c4"].append(
                n_sent >= 3 and "javascript" not in low
                and "lorem ipsum" not in low and "{" not in t)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "word_count": pa.array(out["word_count"], pa.int64()),
            "mean_word_len": pa.array(out["mean_word_len"],
                                      pa.float64()),
            "alpha_ratio": pa.array(out["alpha_ratio"], pa.float64()),
            "stop_hits": pa.array(out["stop_hits"], pa.int64()),
            "n_sentences": pa.array(out["n_sentences"], pa.int64()),
            "term_punct_line_ratio": pa.array(
                out["term_punct_line_ratio"], pa.float64()),
            "keep_gopher": pa.array(out["keep_gopher"]),
            "keep_c4": pa.array(out["keep_c4"]),
        })

    return ds.map_batches(rules, batch_format="pyarrow",
                          batch_size=65536)


def events_active_users(sf_dir: str):
    """DAU / WAU / MAU + stickiness — daily distinct users, the
    trailing 7- and 28-day distinct-user windows ending each day, and
    DAU/MAU stickiness, the product-analytics headline series. One
    row per day.

    Scale shape: events reduce to the distinct (user, day) pair table
    via one groupby (the only full-volume shuffle); the trailing
    windows then count distinct users over a day-bounded pair table
    driver-side — bounded by users × timeline-days, the same envelope
    as ``events_sliding_distinct_users`` (which gates this shape's
    distributed form); the windows here are two sorted-array sweeps,
    not a rescan per day."""
    from ray.data.aggregate import Count as _Count

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": batch.column("user_id")
            .to_numpy(zero_copy_only=False),
            "day": d}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pu = ds.map_batches(pairs, batch_format="pyarrow",
                        batch_size=65536) \
        .groupby(["user_id", "day"]).aggregate(_Count()) \
        .select_columns(["user_id", "day"]).to_pandas()
    days = np.sort(pu["day"].unique())
    user = pu["user_id"].to_numpy(np.int64)
    day = pu["day"].to_numpy(np.int64)
    out_dau, out_wau, out_mau = [], [], []
    for d0 in days:
        out_dau.append(len(np.unique(user[day == d0])))
        out_wau.append(len(np.unique(user[(day > d0 - 7)
                                          & (day <= d0)])))
        out_mau.append(len(np.unique(user[(day > d0 - 28)
                                          & (day <= d0)])))
    dau = np.asarray(out_dau, np.float64)
    mau = np.asarray(out_mau, np.float64)
    return pa.table({
        "day": pa.array(days, pa.int64()),
        "dau": pa.array(np.asarray(out_dau, np.int64)),
        "wau": pa.array(np.asarray(out_wau, np.int64)),
        "mau": pa.array(np.asarray(out_mau, np.int64)),
        "stickiness": pa.array(np.round(dau / mau, 6), pa.float64()),
    })


def events_conversion_wilson(sf_dir: str, z: float = 1.959964):
    """Per-type user-reach with Wilson 95% score intervals — for each
    event type, the share of ALL users who performed it at least once,
    with the Wilson interval (the right small-sample CI for
    proportions; never leaves [0,1], unlike the Wald interval). One
    row per type.

    Scale shape: reach reduces to the distinct (type, user) pair table
    via one groupby combiner; the CI algebra is k-row driver-side."""
    from ray.data.aggregate import Count as _Count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    n_users = ds.groupby("user_id").count().count()

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "user_id": batch.column("user_id")
            .to_numpy(zero_copy_only=False)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    m = ds.map_batches(pairs, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby(["event_type", "user_id"]).aggregate(_Count()) \
        .groupby("event_type").aggregate(_Count()).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    k = m["count()"].to_numpy(np.float64)
    n = float(n_users)
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * np.sqrt(p * (1 - p) / n
                                 + z * z / (4 * n * n))
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "n_users_reached": pa.array(k.astype(np.int64)),
        "reach": pa.array(np.round(p, 6), pa.float64()),
        "wilson_lo": pa.array(np.round(center - half, 6),
                              pa.float64()),
        "wilson_hi": pa.array(np.round(center + half, 6),
                              pa.float64()),
    })


def events_retention_curve(sf_dir: str):
    """Classic day-N retention — the share of all users active exactly
    N days after their FIRST activity day, for every offset N seen in
    the data (the curve a growth team reads before any cohort
    breakdown; ``events_weekly_retention`` is its calendar-cohort
    cousin). One row per offset.

    Scale shape: the distinct (user, day) pair table (one groupby);
    per-user first day via a second user-keyed groupby; one join back
    onto the pairs turns each activity into its offset, and a bounded
    offset histogram finishes. All shuffles are user- or
    offset-keyed."""
    from ray.data.aggregate import Count as _Count, Min as _Min

    from .dedup import _join_parts

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": batch.column("user_id")
            .to_numpy(zero_copy_only=False),
            "day": d}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pu = ds.map_batches(pairs, batch_format="pyarrow",
                        batch_size=65536) \
        .groupby(["user_id", "day"]).aggregate(_Count()) \
        .select_columns(["user_id", "day"]).materialize()
    firsts = pu.groupby("user_id") \
        .aggregate(_Min("day", alias_name="first_day")).materialize()
    n_users = firsts.count()

    j = pu.join(firsts, "inner", _join_parts(pu, firsts),
                on=("user_id",))

    def offs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "offset": pa.array(
                batch.column("day").to_numpy(zero_copy_only=False)
                - batch.column("first_day")
                .to_numpy(zero_copy_only=False), pa.int64())})

    hist = j.map_batches(offs, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("offset").aggregate(_Count(alias_name="n_active")) \
        .to_pandas().sort_values("offset").reset_index(drop=True)
    return pa.table({
        "offset_days": pa.array(hist["offset"].to_numpy(np.int64)),
        "n_active": pa.array(hist["n_active"].to_numpy(np.int64)),
        "retention": pa.array(
            np.round(hist["n_active"].to_numpy(np.float64)
                     / float(n_users), 6), pa.float64()),
    })


def events_forecast_accuracy(sf_dir: str, season: int = 7):
    """Forecast-accuracy metrics of the seasonal-naive baseline on
    daily revenue — ŷ_t = y_{t−7}, scored with MAE, RMSE, MAPE and
    MASE (error scaled by the naive |y_t − y_{t−1}| mean — Hyndman &
    Koehler 2006; MASE < 1 beats the one-step naive), the metric
    battery every forecasting pipeline reports. One summary row over
    the days with a 7-day-old ancestor.

    Scale shape: the daily aggregate is the distributed reduction;
    the lag alignment and the four error sums run on the bounded
    calendar series driver-side (the CCF convention)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    day = daily["day"].to_numpy(np.int64)
    y = daily["rev"].to_numpy(np.float64)
    pos = {d: i for i, d in enumerate(day)}
    e, a = [], []
    for i, d in enumerate(day):
        j = pos.get(d - season)
        if j is not None:
            e.append(y[i] - y[j])
            a.append(y[i])
    e = np.asarray(e)
    a = np.asarray(a)
    d1 = []
    for i, d in enumerate(day):
        j = pos.get(d - 1)
        if j is not None:
            d1.append(abs(y[i] - y[j]))
    scale = float(np.mean(d1))
    mae = float(np.abs(e).mean())
    rmse = float(np.sqrt((e * e).mean()))
    mape = float((np.abs(e) / a).mean())
    return pa.table({
        "n_scored": pa.array([len(e)], pa.int64()),
        "mae": pa.array([round(mae, 4)], pa.float64()),
        "rmse": pa.array([round(rmse, 4)], pa.float64()),
        "mape": pa.array([round(mape, 6)], pa.float64()),
        "mase": pa.array([round(mae / scale, 6)], pa.float64()),
    })


def customer_balance_outliers(sf_dir: str):
    """Tukey-fence outlier audit of customer account balances per
    market segment — counts outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR],
    the boxplot rule every data-profiling pass runs. One row per
    segment with the fences and the outlier counts.

    Scale shape: Q1/Q3 via the distributed histogram-selection
    quantile machinery (``grouped_median_distributed`` with q=0.25 /
    0.75 — no task holds a group); the fence counts are one combiner
    pass with the 5-row fence table broadcast."""
    import ray

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    q1 = grouped_median_distributed(ds, "c_mktsegment", "c_acctbal",
                                    q=0.25)
    q3 = grouped_median_distributed(ds, "c_mktsegment", "c_acctbal",
                                    q=0.75)
    f = {}
    for k, v in zip(q1.column("c_mktsegment").to_pylist(),
                    q1.column("median").to_pylist()):
        f[k] = [float(v), None]
    for k, v in zip(q3.column("c_mktsegment").to_pylist(),
                    q3.column("median").to_pylist()):
        f[k][1] = float(v)
    fences = {k: (a - 1.5 * (b - a_b), b + 1.5 * (b - a_b))
              for k, (a, b) in f.items()
              for a_b in [a]}
    fref = ray.put(fences)

    def part(batch: pa.Table, fref=fref) -> pa.Table:
        fn = ray.get(fref)
        seg = batch.column("c_mktsegment").to_pandas()
        v = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        lo = seg.map(lambda s: fn[s][0]).to_numpy(np.float64)
        hi = seg.map(lambda s: fn[s][1]).to_numpy(np.float64)
        df = pd.DataFrame({
            "c_mktsegment": seg, "_n": np.int64(1),
            "_lo": (v < lo).astype(np.int64),
            "_hi": (v > hi).astype(np.int64)})
        g = df.groupby("c_mktsegment", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("c_mktsegment") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_lo", alias_name="n_low"),
                   Sum("_hi", alias_name="n_high")).to_pandas() \
        .sort_values("c_mktsegment").reset_index(drop=True)
    lo = np.array([fences[s][0] for s in m["c_mktsegment"]])
    hi = np.array([fences[s][1] for s in m["c_mktsegment"]])

    # fences carry <= 5 decimal digits (quartile interpolation of
    # 2-decimal data), so 6dp rounding is the identity on the true
    # value — 4dp would sit ON the .xxxx5 midpoint where one-ulp
    # engine differences flip the rounded digit
    return pa.table({
        "c_mktsegment": pa.array(m["c_mktsegment"], pa.string()),
        "n_customers": pa.array(m["n"].to_numpy("int64")),
        "fence_low": pa.array(np.round(lo, 6), pa.float64()),
        "fence_high": pa.array(np.round(hi, 6), pa.float64()),
        "n_low_outliers": pa.array(m["n_low"].to_numpy("int64")),
        "n_high_outliers": pa.array(m["n_high"].to_numpy("int64")),
    })


def events_daily_entropy(sf_dir: str):
    """Daily Shannon entropy of the event-type mix — the
    composition-drift series (entropy collapse = one type took over
    that day, e.g. an error storm), next to the volume-based
    ``events_daily_anomaly``. One row per day, entropy in bits.

    Scale shape: the (day, type) histogram combiner — timeline ×
    k cells — then per-day entropy driver-side on the bounded
    table."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "day": d,
            "event_type": batch.column("event_type").to_pandas(),
            "n": np.int64(1)})
        g = df.groupby(["day", "event_type"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["day", "event_type"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    tot = cells.groupby("day")["n"].transform("sum") \
        .to_numpy(np.float64)
    p = cells["n"].to_numpy(np.float64) / tot
    cells["_h"] = -p * np.log2(p)
    g = cells.groupby("day", as_index=False).agg(
        n_events=("n", "sum"), entropy_bits=("_h", "sum")) \
        .sort_values("day").reset_index(drop=True)
    return pa.table({
        "day": pa.array(g["day"].to_numpy(np.int64)),
        "n_events": pa.array(g["n_events"].to_numpy(np.int64)),
        "entropy_bits": pa.array(
            np.round(g["entropy_bits"].to_numpy(np.float64), 6),
            pa.float64()),
    })


def orders_weekday_index(sf_dir: str):
    """Day-of-week revenue index — 7·revenue_d/revenue_total per ISO
    weekday, the weekly-cycle factor next to the month-of-year
    ``orders_seasonal_index``. One row per weekday (1 = Monday).

    Scale shape: a 7-cell histogram combiner; driver algebra."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        dow = pc.day_of_week(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False).astype(np.int64) + 1
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"weekday": dow, "_n": np.int64(1),
                           "_rev": v})
        g = df.groupby("weekday", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = ds.map_batches(part, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("weekday") \
        .aggregate(Sum("_n", alias_name="n"),
                   Sum("_rev", alias_name="rev")).to_pandas() \
        .sort_values("weekday").reset_index(drop=True)
    tot = float(m["rev"].sum())
    return pa.table({
        "weekday": pa.array(m["weekday"].to_numpy(np.int64)),
        "n_orders": pa.array(m["n"].to_numpy(np.int64)),
        "revenue": pa.array(
            np.round(m["rev"].to_numpy(np.float64), 2), pa.float64()),
        "weekday_index": pa.array(
            np.round(7.0 * m["rev"].to_numpy(np.float64) / tot, 6),
            pa.float64()),
    })


def events_type_share_timeline(sf_dir: str):
    """Per-day event-type composition — (day, type) → count and
    within-day share, the stacked-area table behind the
    ``events_daily_entropy`` summary. One row per (day, type).

    Scale shape: the same timeline × k histogram combiner; shares
    driver-side on the bounded cell table."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "day": d,
            "event_type": batch.column("event_type").to_pandas(),
            "n": np.int64(1)})
        g = df.groupby(["day", "event_type"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["day", "event_type"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    tot = cells.groupby("day")["n"].transform("sum") \
        .to_numpy(np.float64)
    return pa.table({
        "day": pa.array(cells["day"].to_numpy(np.int64)),
        "event_type": pa.array(cells["event_type"], pa.string()),
        "n": pa.array(cells["n"].to_numpy(np.int64)),
        "share": pa.array(
            np.round(cells["n"].to_numpy(np.float64) / tot, 6),
            pa.float64()),
    })


def orders_status_mix_by_year(sf_dir: str):
    """Order-status composition per year — (year, status) → count and
    within-year share, the fulfillment-health trend. One row per
    (year, status).

    Scale shape: years × statuses histogram combiner; shares
    driver-side."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])

    def part(batch: pa.Table) -> pa.Table:
        y = pc.year(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "year": y,
            "o_orderstatus": batch.column("o_orderstatus")
            .to_pandas(),
            "n": np.int64(1)})
        g = df.groupby(["year", "o_orderstatus"],
                       as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["year", "o_orderstatus"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    tot = cells.groupby("year")["n"].transform("sum") \
        .to_numpy(np.float64)
    return pa.table({
        "year": pa.array(cells["year"].to_numpy(np.int64)),
        "o_orderstatus": pa.array(cells["o_orderstatus"],
                                  pa.string()),
        "n_orders": pa.array(cells["n"].to_numpy(np.int64)),
        "share": pa.array(
            np.round(cells["n"].to_numpy(np.float64) / tot, 6),
            pa.float64()),
    })


def lineitem_cooks_distance(sf_dir: str, top_k: int = 20):
    """Per-returnflag OLS regression diagnostics: Cook's distance of
    every lineitem under price ~ quantity, top-``top_k`` influential
    rows per flag — the classic "which rows bend the fit" audit
    (reference-adjacent: the quality/outlier filters family).

    Scale shape: pass 1 is a six-moment combiner (n, Σx, Σy, Σx²,
    Σxy, Σy²) per flag — the exchange is |flags| rows; the fit
    (slope, intercept, SSE via the closed form
    SSE = Syy_c − b·Sxy_c) happens driver-side on that tiny table and
    broadcasts via closure. Pass 2 is stateless per-row math plus a
    per-batch top-k combiner, so the driver's final sort sees at most
    blocks × flags × k candidate rows, never the table."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag",
                "l_quantity", "l_extendedprice"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        y = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "f": batch.column("l_returnflag").to_pandas(),
            "n": np.int64(1), "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y, "syy": y * y})
        g = df.groupby("f", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = li.map_batches(moments, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby("f") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"),
                   Sum("sxx", alias_name="sxx"),
                   Sum("sxy", alias_name="sxy"),
                   Sum("syy", alias_name="syy")).to_pandas()
    fit = {}
    for _, r in m.iterrows():
        n, sx, sy = float(r["n"]), float(r["sx"]), float(r["sy"])
        sxx, sxy, syy = float(r["sxx"]), float(r["sxy"]), \
            float(r["syy"])
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        sxxc = sxx - sx * sx / n
        s2 = ((syy - sy * sy / n) - b * (sxy - sx * sy / n)) / (n - 2)
        fit[str(r["f"])] = (a, b, sx / n, sxxc, n, s2)

    def local_topk(batch: pa.Table) -> pa.Table:
        flags = batch.column("l_returnflag").to_pandas().to_numpy()
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        y = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber") \
            .to_numpy(zero_copy_only=False)
        keep = []
        for flag, (a, b, xbar, sxxc, n, s2) in fit.items():
            sel = np.flatnonzero(flags == flag)
            if not len(sel):
                continue
            e = y[sel] - (a + b * x[sel])
            h = 1.0 / n + (x[sel] - xbar) ** 2 / sxxc
            d = (e * e) / (2.0 * s2) * h / ((1.0 - h) * (1.0 - h))
            top = sel[np.argsort(-d)[:top_k]]
            dd = (y[top] - (a + b * x[top])) ** 2 / (2.0 * s2) \
                * (1.0 / n + (x[top] - xbar) ** 2 / sxxc) \
                / ((1.0 - (1.0 / n + (x[top] - xbar) ** 2
                           / sxxc)) ** 2)
            keep.append(pd.DataFrame({
                "l_returnflag": flags[top], "l_orderkey": ok[top],
                "l_linenumber": ln[top].astype(np.int64),
                "cooks_d": dd}))
        if not keep:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "l_orderkey": pa.array([], pa.int64()),
                             "l_linenumber": pa.array([], pa.int64()),
                             "cooks_d": pa.array([], pa.float64())})
        return pa.Table.from_pandas(pd.concat(keep),
                                    preserve_index=False)

    cand = li.map_batches(local_topk, batch_format="pyarrow",
                          batch_size=65536).to_pandas()
    cand = cand.sort_values(
        ["l_returnflag", "cooks_d", "l_orderkey", "l_linenumber"],
        ascending=[True, False, True, True])
    cand["rk"] = cand.groupby("l_returnflag").cumcount() + 1
    out = cand[cand["rk"] <= top_k].reset_index(drop=True)
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
        "l_orderkey": pa.array(out["l_orderkey"].to_numpy(np.int64)),
        "l_linenumber": pa.array(
            out["l_linenumber"].to_numpy(np.int64)),
        "cooks_d": pa.array(
            np.round(out["cooks_d"].to_numpy(np.float64), 6)),
        "rk": pa.array(out["rk"].to_numpy(np.int64)),
    })


def events_acf_table(sf_dir: str, max_lag: int = 10):
    """Autocorrelation function of the daily event-count series at lags
    1..``max_lag`` — the full correlogram next to the existing lag-1
    diagnostic (events_value_autocorr). Standard biased estimator:
    r_k = Σ_{t>k}(x_t−μ)(x_{t−k}−μ) / Σ(x_t−μ)².

    Scale shape: the event volume reduces through the same per-day
    count combiner as events_daily (exchange = |days| rows); the
    correlogram itself is driver math over the timeline-bounded daily
    vector. Daily counts are exact ints so μ and the denominator are
    reproducible doubles."""
    ds = _read(sf_dir, "events", ["ts"])

    def part(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        df = pd.DataFrame({"day": np.datetime_as_string(d),
                           "n": np.int64(1)})
        return pa.Table.from_pandas(
            df.groupby("day", as_index=False).sum(),
            preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("n", alias_name="n")).to_pandas()
    daily = daily.sort_values("day")
    v = daily["n"].to_numpy(np.float64)
    mu = float(v.sum()) / len(v)        # integer sum: exact double
    c = v - mu
    den = float((c * c).sum())
    ks, acf, npairs = [], [], []
    for k in range(1, max_lag + 1):
        ks.append(k)
        acf.append(np.round(float((c[k:] * c[:-k]).sum()) / den, 6))
        npairs.append(len(v) - k)
    return pa.table({
        "k": pa.array(np.array(ks, np.int64)),
        "n_pairs": pa.array(np.array(npairs, np.int64)),
        "acf": pa.array(np.array(acf, np.float64)),
    })


# (table, lhs, rhs) functional-dependency candidates audited by
# orders_fd_audit — a bounded, documented probe list, not a search.
FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_name", "p_type"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("nation", "n_nationkey", "n_regionkey"),
]


def orders_fd_audit(sf_dir: str):
    """Functional-dependency audit: for each candidate A→B in
    ``FD_CANDIDATES``, does every A value map to exactly one B? The
    data-profiling primitive behind key discovery and denormalization
    checks (complements orders_key_candidates, which profiles single
    columns).

    Scale shape, per candidate: local per-block (A,B) dedup inside
    map_batches, ONE groupby on A counting distinct partners, then a
    per-block partial (groups, violations) combiner — the driver sees
    blocks×2 numbers. No distinct-pair table ever materializes."""
    rows = []
    for tbl, lhs, rhs in FD_CANDIDATES:
        ds = _read(sf_dir, tbl, [lhs, rhs])

        def dedup(batch: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            df = pd.DataFrame({
                "a": batch.column(lhs).to_pandas(),
                "b": batch.column(rhs).to_pandas()})
            return pa.Table.from_pandas(df.drop_duplicates(),
                                        preserve_index=False)

        def partners(batch: pa.Table) -> pa.Table:
            cnt = batch.column("count()").to_numpy(
                zero_copy_only=False)
            return pa.table({
                "n_lhs": pa.array([len(cnt)], pa.int64()),
                "viol": pa.array([int((cnt - 1).sum())], pa.int64())})

        part = ds.map_batches(dedup, batch_format="pyarrow",
                              batch_size=65536) \
            .groupby(["a", "b"]).count() \
            .groupby("a").count() \
            .map_batches(partners, batch_format="pyarrow") \
            .to_pandas()
        n_lhs = int(part["n_lhs"].sum())
        viol = int(part["viol"].sum())
        rows.append((tbl, lhs, rhs, n_lhs, n_lhs + viol, viol,
                     viol == 0))
    df = pd.DataFrame(rows, columns=[
        "tbl", "lhs", "rhs", "n_lhs", "n_pairs", "n_extra", "holds"])
    return pa.Table.from_pandas(df, preserve_index=False)


# Poisson(1) CDF thresholds shared verbatim with the doc_bootstrap_ci
# SQL oracle — u < cum[k] ⇒ weight k (searchsorted side='right'), tail
# capped at weight 8 (P ≈ 1e-5).
POISSON1_CDF = np.array([
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253])


def doc_bootstrap_ci(sf_dir: str, n_reps: int = 200):
    """Distributed Poisson bootstrap (Chamandy et al. style): a 95% CI
    for the mean document length per lang without resampling — each
    (doc, replicate) pair draws a Poisson(1) weight from a
    deterministic md5 stream, so every worker computes its replicate
    partials independently and the exchange is |langs|×R cells. This
    is THE bootstrap shape that scales: no replicate ever sees the
    corpus, and the driver only quantiles R replicate means per lang.

    Determinism: u_{d,r} = (h32(doc_id)·(2r+1) mod 2³²)/2³² with h32 =
    first 8 md5 hex digits — the same Weyl-style stream the SQL oracle
    replays — and the Poisson inverse-CDF thresholds are the shared
    ``POISSON1_CDF`` literals."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    mults = (2 * np.arange(n_reps, dtype=np.uint64) + 1)

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pandas().to_numpy()
        nch = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        h32 = np.array([
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
            for i in ids], dtype=np.uint64)
        u = ((h32[:, None] * mults[None, :]) & np.uint64(0xFFFFFFFF)) \
            .astype(np.float64) / 4294967296.0
        w = np.searchsorted(POISSON1_CDF, u, side="right") \
            .astype(np.float64)
        out = []
        for lang in np.unique(langs):
            sel = langs == lang
            ws, wn = w[sel], w[sel] * nch[sel][:, None]
            out.append(pd.DataFrame({
                "lang": lang,
                "r": np.arange(n_reps, dtype=np.int64),
                "sw": ws.sum(axis=0), "swx": wn.sum(axis=0),
                "n": np.int64(sel.sum()),
                "sx": float(nch[sel].sum())}))
        return pa.Table.from_pandas(pd.concat(out),
                                    preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["lang", "r"]) \
        .aggregate(Sum("sw", alias_name="sw"),
                   Sum("swx", alias_name="swx"),
                   Sum("n", alias_name="n"),
                   Sum("sx", alias_name="sx")).to_pandas()
    rows = []
    for lang, g in cells.groupby("lang"):
        means = (g["swx"] / g["sw"]).to_numpy(np.float64)
        lo, hi = np.quantile(means, [0.025, 0.975])
        n = int(g["n"].iloc[0])     # every replicate row carries the
        sx = float(g["sx"].iloc[0])  # same per-lang doc partials
        rows.append((str(lang), n, np.round(sx / n, 4),
                     np.round(lo, 4), np.round(hi, 4),
                     len(means)))
    df = pd.DataFrame(rows, columns=[
        "lang", "n_docs", "mean_chars", "ci_lo", "ci_hi", "n_reps"])
    df["n_reps"] = df["n_reps"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def lang_term_enrichment(sf_dir: str, top_k: int = 5,
                         min_count: int = 20):
    """Hypergeometric term-enrichment per lang: for every term with
    in-lang count ≥ ``min_count``, the −log₁₀ hypergeometric PMF of
    drawing exactly k occurrences in the lang's n tokens given the
    term's corpus total K out of N — the standard over-representation
    score (GO-enrichment shape) applied to corpus vocabulary; top
    ``top_k`` terms per lang.

    Scale shape: per-batch Counter partials keyed by lang (exchange =
    distinct (lang, term) cells) → groupby(lang, term) → groupby(term)
    map_groups so each term's corpus total K is computed in-group with
    the ≤|langs| member cells; lang totals broadcast via closure.
    Scoring uses the same lgamma association order as the SQL oracle,
    so the doubles are bit-identical and the per-lang ranking agrees."""
    import math

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for lang, text in zip(batch.column("lang").to_pylist(),
                              batch.column("text").to_pylist()):
            for term in (text or "").lower().split():
                c[(lang, term)] += 1
        langs, terms = zip(*c.keys()) if c else ((), ())
        return pa.table({
            "lang": pa.array(list(langs), pa.string()),
            "term": pa.array(list(terms), pa.string()),
            "k": pa.array(list(c.values()), pa.int64())})

    cells = ds.map_batches(partials, batch_format="pyarrow",
                           batch_size=8192) \
        .groupby(["lang", "term"]) \
        .aggregate(Sum("k", alias_name="k"))
    totals = cells.groupby("lang") \
        .aggregate(Sum("k", alias_name="n")).to_pandas()
    n_by_lang = {str(r["lang"]): float(r["n"])
                 for _, r in totals.iterrows()}
    nn = float(totals["n"].sum())
    lg = math.lgamma
    ln10 = math.log(10.0)

    def score(group: pa.Table) -> pa.Table:
        ks = group.column("k").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        kk = float(ks.sum())        # corpus total for this term
        langs = group.column("lang").to_pylist()
        out_l, out_t, out_k, out_s = [], [], [], []
        for lang, k, term in zip(langs, ks,
                                 group.column("term").to_pylist()):
            if k < min_count:
                continue
            n = n_by_lang[lang]
            a = lg(kk + 1) - lg(k + 1) - lg(kk - k + 1)
            b = lg(nn - kk + 1) - lg(n - k + 1) \
                - lg(nn - kk - (n - k) + 1)
            c = lg(nn + 1) - lg(n + 1) - lg(nn - n + 1)
            out_l.append(lang)
            out_t.append(term)
            out_k.append(int(k))
            out_s.append(-(a + b - c) / ln10)
        return pa.table({"lang": pa.array(out_l, pa.string()),
                         "term": pa.array(out_t, pa.string()),
                         "k": pa.array(out_k, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["lang", "score", "term"], ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("lang").head(top_k),
                                    preserve_index=False)

    cand = cells.groupby("term") \
        .map_groups(score, batch_format="pyarrow") \
        .map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas()
    cand = cand.sort_values(["lang", "score", "term"],
                            ascending=[True, False, True])
    out = cand.groupby("lang").head(top_k).reset_index(drop=True)
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "term": pa.array(out["term"], pa.string()),
        "k": pa.array(out["k"].to_numpy(np.int64)),
        "neg_log10_pmf": pa.array(
            np.round(out["score"].to_numpy(np.float64), 6)),
    })


def lineitem_cume_dist(sf_dir: str, max_domain: int = 4_000_000):
    """CUME_DIST() OVER (PARTITION BY l_returnflag ORDER BY
    l_quantity) per lineitem — the remaining ranking-window shape next
    to RANK/DENSE_RANK/PERCENT_RANK (lineitem_rank_stats). CUME_DIST =
    rows-at-or-below / partition rows, exact under ties by definition.

    Scale shape: identical histogram-rank form as lineitem_rank_stats
    — the bounded (partition, value) histogram is the whole window
    state (combiner-fed groupby, driver rank maps ≤ ``max_domain``
    rows, ray.put broadcast, one searchsorted probe per row). The
    emitted double divides the same two exact ints DuckDB divides, so
    no rounding step is needed."""
    import ray

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag",
                "l_quantity"])

    def hist(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "f": batch.column("l_returnflag").to_pandas(),
            "q": batch.column("l_quantity")
                 .to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["f", "q"], as_index=False).size() \
            .rename(columns={"size": "_n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cdf = li.map_batches(hist, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby(["f", "q"]).aggregate(Sum("_n", alias_name="_n")) \
        .to_pandas()
    if len(cdf) > max_domain:
        raise ValueError(
            f"lineitem_cume_dist: (partition, value) domain "
            f"{len(cdf)} exceeds max_domain={max_domain}; use the "
            f"sort + prefix-scan form instead")

    vocab = sorted(cdf["f"].unique().tolist())
    keys, cd_v, le_v = [], [], []
    for code, flag in enumerate(vocab):
        part = cdf[cdf["f"] == flag].sort_values("q", ascending=True)
        cnts = part["_n"].to_numpy(np.int64)
        n_part = int(cnts.sum())
        at_or_below = np.cumsum(cnts)
        cd = at_or_below.astype(np.float64) / float(n_part)
        qint = part["q"].to_numpy(np.float64).astype(np.int64)
        keys.append(code * (1 << 20) + qint)
        cd_v.append(cd)
        le_v.append(at_or_below)
    skeys = np.concatenate(keys)
    order = np.argsort(skeys)
    ref = ray.put((skeys[order], np.concatenate(cd_v)[order],
                   np.concatenate(le_v)[order]))
    vocab_arr = np.array(vocab, dtype=object)

    def assign(batch: pa.Table, ref=ref, vocab=vocab_arr) -> pa.Table:
        import ray as _ray

        sk, cd, le = _ray.get(ref)
        flags = batch.column("l_returnflag").to_pandas().to_numpy()
        code = np.zeros(len(flags), np.int64)
        for i, name in enumerate(vocab):
            code[flags == name] = i
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        key = code * (1 << 20) + qty.astype(np.int64)
        idx = np.searchsorted(sk, key)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_linenumber": batch.column("l_linenumber"),
            "l_returnflag": batch.column("l_returnflag"),
            "l_quantity": batch.column("l_quantity"),
            "cume_dist": pa.array(cd[idx]),
            "n_at_or_below": pa.array(le[idx]),
        })

    return li.map_batches(assign, batch_format="pyarrow",
                          batch_size=65536)


def events_daily_holt_winters(sf_dir: str, alpha: float = 0.3,
                              beta: float = 0.05, gamma: float = 0.2,
                              period: int = 7):
    """Holt-Winters ADDITIVE seasonal smoothing (triple exponential;
    Winters 1960) over the daily revenue series — the seasonal upgrade
    of ``events_daily_holt``: level lₜ = α(xₜ−sₜ₋ₘ) + (1−α)(lₜ₋₁+bₜ₋₁),
    trend bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, seasonal sₜ = γ(xₜ−lₜ) +
    (1−γ)sₜ₋ₘ with m = ``period``. Standard init over the first two
    seasons: l = mean(season 1), b = (mean(season 2) − mean(season 1))/m,
    sᵢ = xᵢ − mean(season 1). One-step-ahead fit fₜ = lₜ₋₁+bₜ₋₁+sₜ₋ₘ.

    Scale shape: the daily aggregate is the events_daily combiner
    reduction; the recursion is inherently sequential over the BOUNDED
    calendar series driver-side. The SQL oracle replays the identical
    recursion as a recursive CTE carrying the m-element seasonal ring
    as a LIST column, with every smoothing expression written in the
    same association order, so the doubles agree to well below the
    4dp rounding (the recursion is contractive)."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    y = daily["rev"].to_numpy(np.float64)
    m = period
    n = len(y)
    if n < 2 * m:
        raise ValueError("events_daily_holt_winters needs >= 2 "
                         f"seasons ({2 * m} days), got {n}")
    f1 = float(y[:m].sum()) / m
    f2 = float(y[m:2 * m].sum()) / m
    lv = f1
    bv = (f2 - f1) / m
    s = [float(y[i]) - f1 for i in range(m)]
    rows = []
    for t in range(m, n):
        fitted = lv + bv + s[0]
        l_new = alpha * (y[t] - s[0]) + (1 - alpha) * (lv + bv)
        b_new = beta * (l_new - lv) + (1 - beta) * bv
        s_new = gamma * (y[t] - l_new) + (1 - gamma) * s[0]
        s = s[1:] + [s_new]
        lv, bv = l_new, b_new
        rows.append((int(daily["day"].iloc[t]),
                     np.round(y[t], 4), np.round(lv, 4),
                     np.round(bv, 4), np.round(s_new, 4),
                     np.round(fitted, 4)))
    df = pd.DataFrame(rows, columns=[
        "day", "revenue", "level", "trend", "seasonal", "fitted"])
    df["day"] = df["day"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def events_daily_decompose(sf_dir: str, window: int = 7):
    """Classical additive time-series decomposition of the daily
    revenue series (Kendall/Stuart textbook form; the STL-lite
    complement to events_daily_holt_winters): trend = CENTERED
    ``window``-day moving average (full windows only), detrended =
    rev − trend, seasonal = per-ISO-weekday mean of the detrended
    series, residual = detrended − seasonal. Rows limited to days with
    a full trend window, matching the SQL oracle's COUNT(*)-over-
    window guard.

    Scale shape: the daily aggregate is the events_daily combiner
    reduction; the decomposition is exact window math over the
    BOUNDED calendar series driver-side. Weekday means divide the
    same exact sums in both engines; output rounds to 4dp."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(batch: pa.Table) -> pa.Table:
        days = batch.column("ts").cast(pa.date32()) \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"day": days, "v": v})
        g = df.groupby("day", as_index=False).agg(rev=("v", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("day").aggregate(Sum("rev", alias_name="rev")) \
        .to_pandas().sort_values("day").reset_index(drop=True)
    y = daily["rev"].to_numpy(np.float64)
    days = daily["day"].to_numpy(np.int64)
    n = len(y)
    half = window // 2
    # centered moving average over ROW positions (the oracle's
    # ROWS BETWEEN half PRECEDING AND half FOLLOWING with a full-
    # window count guard)
    trend = np.full(n, np.nan)
    for i in range(half, n - half):
        trend[i] = y[i - half:i + half + 1].sum() / window
    keep = ~np.isnan(trend)
    det = y - trend
    # ISO weekday: 1970-01-01 was a Thursday (isodow 4)
    dow = ((days + 3) % 7) + 1
    srows = pd.DataFrame({"dow": dow[keep], "det": det[keep]})
    smap = srows.groupby("dow")["det"].agg(["sum", "count"])
    seasonal_by_dow = (smap["sum"] / smap["count"]).to_dict()
    out = pd.DataFrame({
        "day": days[keep],
        "weekday": dow[keep],
        "revenue": np.round(y[keep], 4),
        "trend": np.round(trend[keep], 4),
        "seasonal": np.round(
            np.array([seasonal_by_dow[d] for d in dow[keep]]), 4),
        "residual": np.round(
            det[keep]
            - np.array([seasonal_by_dow[d] for d in dow[keep]]), 4),
    })
    out["weekday"] = out["weekday"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def doc_cv_folds(sf_dir: str, k: int = 5):
    """Deterministic k-fold cross-validation split with a per-fold
    class-balance audit: fold(doc) = md5-32(doc_id) mod k (the repo's
    hash-sampling law — any worker reassigns a doc identically with no
    shared state), reported as (fold, lang) cells with fold totals and
    within-fold lang shares. The split primitive a training pipeline
    shards eval rounds by, plus the balance check that catches a
    skewed fold before a model does.

    Scale shape: stateless fold assignment inside map_batches (one
    md5 per row), one (fold, lang) combiner groupby — exchange =
    k × |langs| cells."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def part(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        folds = np.array([
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
            % k for i in ids], np.int64)
        df = pd.DataFrame({
            "fold": folds,
            "lang": batch.column("lang").to_pandas(),
            "n": np.int64(1)})
        return pa.Table.from_pandas(
            df.groupby(["fold", "lang"], as_index=False).sum(),
            preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["fold", "lang"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    tot = cells.groupby("fold")["n"].transform("sum") \
        .to_numpy(np.float64)
    return pa.table({
        "fold": pa.array(cells["fold"].to_numpy(np.int64)),
        "lang": pa.array(cells["lang"], pa.string()),
        "n_docs": pa.array(cells["n"].to_numpy(np.int64)),
        "fold_total": pa.array(tot.astype(np.int64)),
        "share": pa.array(np.round(
            cells["n"].to_numpy(np.float64) / tot, 6)),
    })


def part_price_elasticity(sf_dir: str, form: str = "auto",
                          broadcast_limit: int = BROADCAST_LIMIT):
    """Grouped log-log demand regression: per part type, the OLS slope
    of ln(quantity) on ln(unit price) — the price-elasticity-of-demand
    estimate econometrics reads off a log-log fit — plus r². Unit
    price = extendedprice / quantity.

    Scale shape: the partkey→type lookup follows the
    revenue_by_part_type gate (broadcast sorted-probe under
    ``broadcast_limit``, native join above); the regression reduces
    through one six-moment combiner per type — the oracle recomputes
    slope and r² from the SAME moment formulas (not regr_slope, whose
    accumulation order differs)."""
    import ray

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    if form == "auto":
        form = "broadcast" if part_ds.count() <= broadcast_limit \
            else "join"
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def _moments(types, q: np.ndarray, p: np.ndarray) -> pa.Table:
        x = np.log(p / q)       # ln unit price
        y = np.log(q)
        df = pd.DataFrame({
            "p_type": types, "n": np.int64(1), "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y, "syy": y * y})
        return pa.Table.from_pandas(
            df.groupby("p_type", as_index=False).sum(),
            preserve_index=False)

    if form == "broadcast":
        part = part_ds.to_pandas()
        codes, vocab = pd.factorize(part["p_type"])
        vocab = np.asarray(vocab, dtype=object)
        ref = ray.put(_sorted_probe_arrays(
            part["p_partkey"].to_numpy(np.int64),
            codes.astype(np.int32)))

        def gen(batch: pa.Table, ref=ref, vocab=vocab) -> pa.Table:
            import ray as _ray

            sk, sv = _ray.get(ref)
            pk = batch.column("l_partkey") \
                .to_numpy(zero_copy_only=False)
            idx = np.searchsorted(sk, pk)
            types = vocab[sv[idx]]
            return _moments(
                types,
                batch.column("l_quantity")
                .to_numpy(zero_copy_only=False),
                batch.column("l_extendedprice")
                .to_numpy(zero_copy_only=False))

        m = li.map_batches(gen, batch_format="pyarrow",
                           batch_size=65536)
    else:
        from .dedup import _join_parts

        joined = li.join(
            part_ds.rename_columns({"p_partkey": "l_partkey"}),
            "inner", _join_parts(li, part_ds), on=("l_partkey",))

        def gen_j(batch: pa.Table) -> pa.Table:
            return _moments(
                batch.column("p_type").to_pandas().to_numpy(),
                batch.column("l_quantity")
                .to_numpy(zero_copy_only=False),
                batch.column("l_extendedprice")
                .to_numpy(zero_copy_only=False))

        m = joined.map_batches(gen_j, batch_format="pyarrow",
                               batch_size=65536)

    g = m.groupby("p_type") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"),
                   Sum("sxx", alias_name="sxx"),
                   Sum("sxy", alias_name="sxy"),
                   Sum("syy", alias_name="syy")).to_pandas() \
        .sort_values("p_type")
    n = g["n"].to_numpy(np.float64)
    sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
    sxx, sxy, syy = g["sxx"].to_numpy(), g["sxy"].to_numpy(), \
        g["syy"].to_numpy()
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    sxyc = sxy - sx * sy / n
    syyc = syy - sy * sy / n
    r2 = b * sxyc / syyc
    return pa.table({
        "p_type": pa.array(g["p_type"], pa.string()),
        "n_lines": pa.array(g["n"].to_numpy(np.int64)),
        "elasticity": pa.array(np.round(b, 6)),
        "r2": pa.array(np.round(r2, 6)),
    })


def events_markov_absorption(sf_dir: str,
                             absorb_type: str = "purchase"):
    """Expected steps to conversion: make ``absorb_type`` absorbing in
    the per-user event-type Markov chain and solve the fundamental-
    matrix system t = 1 + Q·t (Kemeny & Snell 1960) — "from a view,
    how many events until the purchase, in expectation?" — the
    chain-analysis closure over events_type_transitions.

    Scale shape: transition counts reduce through the same bounded
    per-user map_groups + |types|² groupby; the linear solve is
    driver math on the tiny matrix. Rows-only for the driver; pytest
    gates the defining identity t = 1 + Q·t at 1e-9 plus a
    DuckDB-count numpy replay (tests/test_analysis_scale.py)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type",
                                  "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": [], "to_type": [],
                                 "c": []})
        df = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]})
        df["c"] = np.int64(1)
        return df.groupby(["from_type", "to_type"],
                          as_index=False)["c"].sum()

    counts = ds.groupby("user_id") \
        .map_groups(pairs, batch_format="pandas") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("c", alias_name="n")).to_pandas()
    types = sorted(set(counts["from_type"]) | set(counts["to_type"]))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    m = np.zeros((k, k))
    for _, r in counts.iterrows():
        m[idx[r["from_type"]], idx[r["to_type"]]] = r["n"]
    row = m.sum(axis=1, keepdims=True)
    p = np.divide(m, row, out=np.zeros_like(m), where=row > 0)
    a = idx[absorb_type]
    trans = [i for i in range(k) if i != a]
    q = p[np.ix_(trans, trans)]
    t = np.linalg.solve(np.eye(len(trans)) - q,
                        np.ones(len(trans)))
    out_types = [types[i] for i in trans]
    reach = p[np.ix_(trans, [a])][:, 0]
    return pa.table({
        "from_type": pa.array(out_types, pa.string()),
        "expected_steps": pa.array(np.round(t, 6)),
        "p_direct": pa.array(np.round(reach, 6)),
    })


def orders_hhi_by_year(sf_dir: str):
    """Herfindahl-Hirschman concentration of customer revenue per
    order-year: HHI = Σᵢ sᵢ² over customer revenue shares (×10,000 —
    the antitrust convention), plus the effective number of customers
    1/Σsᵢ² — the concentration metric next to Gini
    (crawl_host_gini) and the Pareto deciles.

    Scale shape: ONE (year, customer) combiner groupby (the exchange
    is customers×years cells); the share squaring re-aggregates
    per-year through a second bounded groupby. Shares divide exact
    sums, so the oracle reproduces the doubles to well below 6dp."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        y = pc.year(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "year": y,
            "cust": batch.column("o_custkey")
            .to_numpy(zero_copy_only=False),
            "rev": batch.column("o_totalprice")
            .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby(["year", "cust"], as_index=False).sum(),
            preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["year", "cust"]) \
        .aggregate(Sum("rev", alias_name="rev")).to_pandas()
    tot = cells.groupby("year")["rev"].transform("sum") \
        .to_numpy(np.float64)
    s = cells["rev"].to_numpy(np.float64) / tot
    cells["s2"] = s * s
    g = cells.groupby("year", as_index=False) \
        .agg(n_customers=("cust", "size"), hhi_frac=("s2", "sum"))
    return pa.table({
        "year": pa.array(g["year"].to_numpy(np.int64)),
        "n_customers": pa.array(
            g["n_customers"].to_numpy(np.int64)),
        "hhi": pa.array(np.round(
            g["hhi_frac"].to_numpy(np.float64) * 10000.0, 4)),
        "effective_customers": pa.array(np.round(
            1.0 / g["hhi_frac"].to_numpy(np.float64), 4)),
    })
