"""Distributed sketch + distinct-count operators.

Exact distinct counting is a groupby (every distinct key crosses the
shuffle once); the HyperLogLog sketch replaces that all-to-all with a
fixed 2^p-register exchange — the standard trade for corpus-scale
cardinality (Flajolet et al., AofA 2007: HyperLogLog — the analysis of a
near-optimal cardinality estimation algorithm).

Scale shape:
- exact: per-batch ``np.unique`` partials prune duplicate keys inside a
  block before the groupby, so the shuffle carries each block's distinct
  keys once, not the raw rows;
- HLL: each batch emits at most 2^p (register, rho) rows, merged by a
  tiny ``groupby(register).max`` — the shuffle volume is independent of
  input size, and the registers themselves are the mergeable state, so
  the same pipeline shape works for any downstream union/re-aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a well-mixed 64-bit hash for
    integer keys (Steele et al., OOPSLA 2014 fast splittable PRNGs)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def distinct_users_by_type(sf_dir: str):
    """Exact distinct user_id count per event_type.

    Two-level groupby: the (event_type, user_id) pairs are deduped by the
    first groupby (with per-batch np.unique partials pruning within-block
    duplicates first), then a Count per type. No driver set, no broadcast.
    """
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def prune(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        uid = batch.column("user_id").to_numpy()
        _, et_inv = np.unique(et, return_inverse=True)
        order = np.lexsort((uid, et_inv))
        ei, ui = et_inv[order], uid[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (ei[1:] != ei[:-1]) | (ui[1:] != ui[:-1])
        return batch.take(pa.array(np.sort(order[first])))

    return (
        ds.map_batches(prune, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )


def hll_partial_registers(ds, col: str, p: int = 14):
    """Dataset of (reg, rho) HLL partials for an integer column: one row
    per register observed per batch (≤ 2^p rows/batch), merged by max."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        h = _splitmix64(batch.column(col).to_numpy().astype(np.uint64))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # top 64-p hash bits shifted up
        # rho = position of the leftmost 1-bit in the remaining bits
        # (1-based); all-zero rest -> 64-p+1
        nz = rest != 0
        lead = np.full(len(h), 64 - p + 1, dtype=np.int64)
        if nz.any():
            r = rest[nz]
            # vectorized count-leading-zeros via float64 exponent trick is
            # unsafe for >2^53; use bit_length via log2 on the high word
            hi = (r >> np.uint64(32)).astype(np.uint32)
            lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            bl_hi = np.zeros(len(r), dtype=np.int64)
            m_hi = hi != 0
            bl_hi[m_hi] = np.floor(
                np.log2(hi[m_hi].astype(np.float64))).astype(np.int64) + 1
            bl_lo = np.zeros(len(r), dtype=np.int64)
            m_lo = (~m_hi) & (lo != 0)
            bl_lo[m_lo] = np.floor(
                np.log2(lo[m_lo].astype(np.float64))).astype(np.int64) + 1
            bitlen = np.where(m_hi, bl_hi + 32, bl_lo)
            lead[nz] = 64 - bitlen + 1
        # max rho per register within the batch
        order = np.lexsort((-lead, reg))
        reg_s, lead_s = reg[order], lead[order]
        first = np.ones(len(reg_s), dtype=bool)
        first[1:] = reg_s[1:] != reg_s[:-1]
        return pa.table({
            "reg": pa.array(reg_s[first], type=pa.int64()),
            "rho": pa.array(lead_s[first], type=pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
    ), m


def hll_estimate(registers: dict[int, int], m: int) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007, §4)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    zsum = (m - len(registers)) * 1.0 + sum(
        2.0 ** -rho for rho in registers.values()
    )
    est = alpha * m * m / zsum
    zeros = m - len(registers)
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def distinct_users_hll(sf_dir: str, p: int = 14):
    """Approximate global distinct user_id count (HLL, ±~1.04/sqrt(2^p)).
    Returns a one-row table (n_users_approx, precision_p); the error
    bound against the exact count is pytest-gated."""
    ds = _read(sf_dir, "events", ["user_id"])
    regs_ds, m = hll_partial_registers(ds, "user_id", p)
    registers = {int(r["reg"]): int(r["rho"]) for r in regs_ds.take_all()}
    est = hll_estimate(registers, m)
    return pa.table({
        "n_users_approx": pa.array([int(round(est))], type=pa.int64()),
        "precision_p": pa.array([p], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd's iterations over map_batches partials)
# ---------------------------------------------------------------------------


def _stack_embeddings(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy per chunk."""
    arr = batch.column(col)
    if arr.num_chunks == 1:
        chunk = arr.chunk(0)
    else:
        chunk = arr.combine_chunks()
    flat = np.asarray(chunk.values, dtype=np.float64)
    d = len(flat) // len(batch)
    return flat.reshape(len(batch), d)


def kmeans_fit(
    sf_dir: str,
    k: int = 8,
    max_iters: int = 20,
    tol: float = 1e-6,
):
    """Distributed Lloyd's k-means over the embeddings table.

    Scale shape (the mini-batch-free classic, Bahmani et al. VLDB 2012
    framing): per iteration the (k x d) centroid matrix is broadcast via
    ``ray.put`` ONCE, each batch computes assignments with one matmul and
    emits only k partial (sum_vec, count) rows, and the driver reduces
    k rows — shuffle volume is O(k*d*num_blocks), independent of n.
    Deterministic init: the k lowest vec_ids (the table is synthetic and
    id-dense; kmeans++ would sample, breaking run-to-run equality).

    Returns (centroids ndarray (k,d), n_iters, inertia).
    """
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # deterministic init: first k by vec_id (tiny driver pull of k rows)
    first = ds.sort("vec_id").limit(k)
    init_rows = first.take_all()
    cent = np.stack([
        np.asarray(r["embedding"], dtype=np.float64) for r in init_rows
    ])

    n_iters, inertia = 0, float("nan")
    for it in range(max_iters):
        cent_ref = ray.put(cent)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)  # noqa: B023 — rebound per iteration
            x = _stack_embeddings(batch)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
            d2 = (
                -2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            best = d2[np.arange(len(x)), assign] + (x * x).sum(axis=1)
            sums = np.zeros((len(c), x.shape[1]))
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=len(c))
            return pa.table({
                "cid": pa.array(np.arange(len(c)), type=pa.int64()),
                "vsum": pa.array(
                    [s.tobytes() for s in sums], type=pa.large_binary()),
                "count": pa.array(counts, type=pa.int64()),
                "sse": pa.array(
                    np.bincount(assign, weights=best, minlength=len(c))),
            })

        parts = ds.map_batches(
            partials, batch_format="pyarrow", batch_size=4096
        ).take_all()
        d = cent.shape[1]
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        sse = 0.0
        for r in parts:
            sums[r["cid"]] += np.frombuffer(r["vsum"], dtype=np.float64)
            counts[r["cid"]] += r["count"]
            sse += r["sse"]
        nz = counts > 0
        new_cent = cent.copy()
        new_cent[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(new_cent - cent).max())
        cent, inertia, n_iters = new_cent, sse, it + 1
        if shift < tol:
            break
    return cent, n_iters, inertia


def kmeans_assignments(sf_dir: str, k: int = 8, max_iters: int = 20):
    """Query surface: cluster id + distance per vec_id (deterministic).

    The fit is the iterative partial-reduction above; the final labeling
    pass is one more broadcast + map_batches. Rows-only oracle (iterative
    algorithms are not SQL-expressible); determinism and quality
    (inertia monotonically non-increasing, all-points-covered) are
    pytest-gated.
    """
    import ray

    cent, n_iters, _ = kmeans_fit(sf_dir, k=k, max_iters=max_iters)
    cent_ref = ray.put(cent)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _stack_embeddings(batch)
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        best = np.sqrt(np.maximum(d2[np.arange(len(x)), assign], 0.0))
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(assign.astype(np.int64)),
            "dist": pa.array(np.round(best, 5)),
        })

    return ds.map_batches(label, batch_format="pyarrow", batch_size=4096)


# --------------------------------------------------------------------------
# Mergeable quantile sketch (t-digest, Dunning & Ertl 2019)
# --------------------------------------------------------------------------

def tdigest_compress(means: np.ndarray, weights: np.ndarray,
                     delta: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Compress (mean, weight) centroids to <= ~2*delta centroids using
    the k1 scale function's q-limit rule (Dunning & Ertl 2019, "Computing
    extremely accurate quantiles using t-digests", alg. 1 merge pass).
    Deterministic: inputs are sorted by (mean, weight); no RNG."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.lexsort((weights, means))
    means = means[order].astype(np.float64)
    weights = weights[order].astype(np.float64)
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = means[0], weights[0]
    w_before = 0.0  # weight fully to the left of the current centroid
    for i in range(1, len(means)):
        q0 = w_before / total
        q2 = (w_before + cur_w + weights[i]) / total
        # k1 scale: the merged centroid may span at most the q-width
        # that keeps k(q2)-k(q0) <= 1 — approximated by the standard
        # 4*delta*q*(1-q) bound on centroid weight
        q_mid = (q0 + q2) / 2.0
        cap = 4.0 * total * q_mid * (1.0 - q_mid) / delta
        if cur_w + weights[i] <= max(cap, 1.0):
            nw = cur_w + weights[i]
            cur_m = cur_m + (means[i] - cur_m) * (weights[i] / nw)
            cur_w = nw
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = means[i], weights[i]
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     q: float) -> float:
    """Quantile estimate by linear interpolation between centroid
    midpoints (the standard t-digest query)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    # cumulative weight at each centroid's midpoint
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


def events_value_tdigest(sf_dir: str, delta: int = 200,
                         quantiles=(0.5, 0.9, 0.99)):
    """Per-event-type streaming quantiles via mergeable t-digests.

    Scale shape: each batch emits ONE serialized digest row per group
    (<= ~2*delta float pairs regardless of batch size), so the shuffle
    volume is O(groups x blocks x delta) — independent of input rows;
    ``groupby(event_type).map_groups`` merges each group's digests with
    one deterministic re-compression (partials sorted by mean before
    merging, so the result depends only on the partial multiset).
    Rank-error law (<= ~1/delta) is pytest-gated against exact
    quantiles (tests/test_sketches.py); rows-only for the driver —
    sketch estimates are not SQL-reproducible.
    """
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        types, blobs = [], []
        for etype, g in df.groupby("event_type"):
            v = g["value"].to_numpy(dtype=np.float64)
            m, w = tdigest_compress(v, np.ones(len(v)), delta=delta)
            types.append(etype)
            blobs.append(np.concatenate([m, w]).tobytes())
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "digest": pa.array(blobs, pa.large_binary()),
        })

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        ms, ws = [], []
        for blob in g["digest"]:
            arr = np.frombuffer(blob, dtype=np.float64)
            h = len(arr) // 2
            ms.append(arr[:h])
            ws.append(arr[h:])
        m, w = tdigest_compress(np.concatenate(ms), np.concatenate(ws),
                                delta=delta)
        row = {"event_type": [g["event_type"].iloc[0]],
               "n": [np.int64(round(w.sum()))]}
        for q in quantiles:
            row[f"p{int(q * 100)}"] = [
                round(tdigest_quantile(m, w, q), 4)]
        return pd.DataFrame(row)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("event_type")
            .map_groups(merge, batch_format="pandas"))


# --------------------------------------------------------------------------
# Bloom filter + broadcast bloom semi-join
# --------------------------------------------------------------------------

def bloom_params(n_expected: int, fp_rate: float = 0.01
                 ) -> tuple[int, int]:
    """Standard sizing: m = -n·ln(p)/ln(2)^2 bits (rounded up to a
    byte), k = (m/n)·ln(2) hash functions (Bloom, CACM 1970)."""
    import math

    n = max(1, n_expected)
    m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + 7) // 8) * 8
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _bloom_indices(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via Kirsch-Mitzenmacher double
    hashing: idx_i = (h1 + i*h2) mod m — two splitmix64 evaluations
    regardless of k."""
    h1 = _splitmix64(keys.astype(np.uint64))
    h2 = _splitmix64(keys.astype(np.uint64)
                     ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m))


def bloom_build(ds, col: str, n_expected: int,
                fp_rate: float = 0.01) -> tuple[bytes, int, int]:
    """Build a Bloom filter over an integer key column. Per-batch
    partial = this batch's bit array (m/8 bytes); partials OR-merge on
    the driver (m is sized to the SMALL side of a semi-join — at
    fp=1%, 10 bits/key — so even 10^9 keys is a 1.2 GB broadcast blob,
    the filter's raison d'être vs shipping the key set)."""
    m, k = bloom_params(n_expected, fp_rate)
    mbytes = m // 8

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bits = np.zeros(mbytes, dtype=np.uint8)
        idx = _bloom_indices(keys, m, k).ravel()
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         (1 << (idx & np.uint64(7))).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()],
                                          pa.large_binary())})

    acc = np.zeros(mbytes, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536) \
            .iter_batches(batch_format="pyarrow"):
        for blob in b.column("bits").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
    return acc.tobytes(), m, k


def bloom_probe_mask(keys: np.ndarray, bits: np.ndarray, m: int,
                     k: int) -> np.ndarray:
    """Vectorized membership test: True = possibly present (the bloom
    guarantee: no false negatives)."""
    idx = _bloom_indices(keys.astype(np.int64), m, k)
    byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
    bit = (1 << (idx & np.uint64(7))).astype(np.uint8)
    return ((byte & bit) == bit).all(axis=1)


def orders_bloom_semijoin(sf_dir: str, segment: str = "BUILDING",
                          fp_rate: float = 0.01):
    """Broadcast-Bloom semi-join — THE standard big-join prune at
    shuffle scale: build a Bloom filter over the SMALL side's keys
    (customers in one market segment), ``ray.put`` it once, prune the
    BIG side (orders) per batch before the exact hash join, so the
    shuffle carries only bloom-surviving rows (~match fraction +
    fp_rate of the input instead of all of it).

    The final exact join makes the output independent of bloom false
    positives — DuckDB-oracle-gated exactly; the prune-rate and
    no-false-negative laws are pytest-gated (tests/test_sketches.py).
    """
    import ray

    from .dedup import _join_parts

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .filter(expr=f"c_mktsegment == '{segment}'") \
        .select_columns(["c_custkey"]).materialize()
    n_keys = cust.count()
    bits_b, m, k = bloom_build(cust, "c_custkey", n_keys, fp_rate)
    ref = ray.put(np.frombuffer(bits_b, dtype=np.uint8))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def prune(batch: pa.Table, ref=ref) -> pa.Table:
        import ray as _ray

        bits = _ray.get(ref)
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        return batch.filter(
            pa.array(bloom_probe_mask(keys, bits, m, k)))

    candidates = orders.map_batches(prune, batch_format="pyarrow",
                                    batch_size=65536)
    joined = candidates.join(
        cust.rename_columns({"c_custkey": "o_custkey"}),
        join_type="inner", on=("o_custkey",),
        num_partitions=_join_parts(candidates, cust))
    return joined.select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice"])


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries)
# --------------------------------------------------------------------------

def mg_summarize(tokens, capacity: int) -> dict[str, int]:
    """Classic Misra-Gries (1982) frequency summary with at most
    ``capacity`` counters: every true count is under-estimated by at
    most n/(capacity+1)."""
    counters: dict[str, int] = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < capacity:
            counters[t] = 1
        else:
            dead = [k for k in counters if counters[k] == 1]
            for k in counters:
                counters[k] -= 1
            for k in dead:
                del counters[k]
    return counters


def mg_merge(summaries, capacity: int) -> dict[str, int]:
    """Mergeable-summaries law (Agarwal et al., PODS 2012): sum
    counters term-wise, then subtract the (capacity+1)-th largest
    value and drop non-positive counters — the merged summary keeps
    the same n/(capacity+1) error bound over the combined stream."""
    total: dict[str, int] = {}
    for s in summaries:
        for t, c in s.items():
            total[t] = total.get(t, 0) + c
    if len(total) > capacity:
        kth = sorted(total.values(), reverse=True)[capacity]
        total = {t: c - kth for t, c in total.items() if c - kth > 0}
    return total


def corpus_top_terms_mg(sf_dir: str, k: int = 50,
                        capacity: int = 4096):
    """Heavy-hitter terms via mergeable Misra-Gries summaries — the
    open-vocabulary variant of the exact ``corpus_top_terms`` groupby: each
    block ships at most ``capacity`` (term, count) rows no matter how
    large its vocabulary, so the exchange is O(capacity × blocks)
    instead of O(distinct terms). Under-estimate error ≤
    n_tokens/(capacity+1); the containment-of-true-top-k law is
    pytest-gated against the exact counts (tests/test_sketches.py).
    Returns (term, est_count) for the top-k estimates, est desc, term
    asc. Rows-only for the driver (sketch estimates, not SQL facts).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = []
        for text in batch.column("text").to_pylist():
            toks.extend((text or "").lower().split())
        s = mg_summarize(toks, capacity)
        return pa.table({
            "term": pa.array(list(s.keys()), pa.string()),
            "c": pa.array(list(s.values()), pa.int64()),
        })

    import pandas as pd

    def merge_all(g: pd.DataFrame) -> pd.DataFrame:
        # term-wise sums arrive pre-aggregated; apply the subtract-kth
        # correction once over the combined counter set
        total = dict(zip(g["term"], g["c"]))
        merged = mg_merge([total], capacity)
        items = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
        items = items[:k]
        return pd.DataFrame({
            "term": [t for t, _ in items],
            "est_count": np.array([c for _, c in items], np.int64),
        })

    from ray.data.aggregate import Sum

    sums = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096)
            .groupby("term").aggregate(Sum("c", alias_name="c")))
    return (sums.map_batches(
        lambda t: t.append_column(
            "_g", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow")
        .groupby("_g")
        .map_groups(lambda g: merge_all(g.drop(columns=["_g"])),
                    batch_format="pandas"))



def kmeans_cluster_means(sf_dir: str, k: int = 8, max_iters: int = 20,
                         dump_dir: str | None = None):
    """Per-cluster per-dimension means of the final k-means labeling, in
    long form (cluster, dim, n, mean_val) — the hard-gateable face of
    the k-means family: the final (vec_id, cluster) assignment table is
    STREAMED to ``dump_dir`` (the self-dump oracle path) and the SQL
    side re-derives every mean by joining the dump back to the
    embeddings view, so the distributed mean reduction (per-block
    partial sums -> k-row combine) is checked value-for-value, not
    rows-only.

    Scale shape: one labeling pass (broadcast matmul, as
    ``kmeans_assignments``) materialized with the embedding carried;
    the dump is a streaming ``write_parquet`` of two thin columns; the
    mean reduction emits k rows per block and the driver folds k rows —
    nothing n-sized ever lands on the driver."""
    import ray

    cent, _, _ = kmeans_fit(sf_dir, k=k, max_iters=max_iters)
    cent_ref = ray.put(cent)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _stack_embeddings(batch)
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1).astype(np.int64)
        return batch.append_column("cluster", pa.array(assign))

    labeled = ds.map_batches(label, batch_format="pyarrow",
                             batch_size=4096).materialize()
    if dump_dir is not None:
        labeled.select_columns(["vec_id", "cluster"]) \
            .write_parquet(dump_dir, mode="overwrite")

    def partials(batch: pa.Table) -> pa.Table:
        x = _stack_embeddings(batch)
        assign = batch.column("cluster").to_numpy(zero_copy_only=False)
        sums = np.zeros((k, x.shape[1]))
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k)
        return pa.table({
            "cid": pa.array(np.arange(k, dtype=np.int64)),
            "vsum": pa.array([s.tobytes() for s in sums],
                             type=pa.large_binary()),
            "count": pa.array(counts, type=pa.int64()),
        })

    parts = labeled.map_batches(partials, batch_format="pyarrow",
                                batch_size=4096).take_all()
    d = cent.shape[1]
    sums = np.zeros((k, d))
    counts = np.zeros(k, dtype=np.int64)
    for r in parts:
        sums[r["cid"]] += np.frombuffer(r["vsum"], dtype=np.float64)
        counts[r["cid"]] += r["count"]
    nz = counts > 0          # empty clusters have no oracle-side rows
    means = sums[nz] / counts[nz, None]
    kk = int(nz.sum())
    return pa.table({
        "cluster": pa.array(np.repeat(
            np.arange(k, dtype=np.int64)[nz], d)),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), kk)),
        "n": pa.array(np.repeat(counts[nz], d)),
        "mean_val": pa.array(np.round(means.ravel(), 6)),
    })


def lineitem_table_checksum(sf_dir: str):
    """Order-insensitive table content fingerprint — the shard-
    validation primitive a replicated 100 TB corpus needs: every row is
    hashed (splitmix64 chain over its identifying + content columns)
    and the row hashes are SUMMED mod 2^64, so any permutation,
    re-partitioning or re-read of the same rows yields the same
    checksum while any single-cell change flips it.

    Scale shape: per-block vectorized hash + one uint64 partial per
    block; the driver folds block partials — shuffle-free, O(blocks)
    driver traffic. The oracle recomputes the whole checksum in SQL
    (splitmix64 via the same HUGEINT mod-2^64 emulation the HLL gate
    uses), fully independently."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy().astype(np.uint64)
        ln = batch.column("l_linenumber").to_numpy().astype(np.uint64)
        price = batch.column("l_extendedprice").to_numpy()
        cents = np.round(price * 100.0).astype(np.uint64)
        h = _splitmix64(_splitmix64(ok * np.uint64(1000003) + ln) ^ cents)
        with np.errstate(over="ignore"):
            s = np.add.reduce(h, dtype=np.uint64)
        return pa.table({
            "part_sum": pa.array([int(s)], type=pa.uint64()),
            "part_n": pa.array([len(h)], type=pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).take_all()
    total = 0
    n = 0
    for r in parts:
        total = (total + int(r["part_sum"])) & 0xFFFFFFFFFFFFFFFF
        n += int(r["part_n"])
    return pa.table({
        "n_rows": pa.array([n], type=pa.int64()),
        "checksum_hi": pa.array([total >> 32], type=pa.int64()),
        "checksum_lo": pa.array([total & 0xFFFFFFFF], type=pa.int64()),
    })


def embedding_covariance(sf_dir: str):
    """Full covariance matrix of the embedding columns — the PCA/whitening
    precursor: each block emits ONE (d x d) Gram partial (X^T X as d
    rows of packed float64) plus per-dim sums, the groupby folds blocks,
    and the driver finishes cov = G/n - mean mean^T on a d x d table.
    Shuffle volume is O(d^2 * blocks), independent of n — the classic
    tall-skinny reduction. Long upper-triangle output (dim_a <= dim_b)
    so the DuckDB covar_pop oracle compares value-for-value."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def part(batch: pa.Table) -> pa.Table:
        x = _stack_embeddings(batch)
        d = x.shape[1]
        g = x.T @ x
        return pa.table({
            "row": pa.array(np.arange(d, dtype=np.int64)),
            "_g": pa.array([r.tobytes() for r in g],
                           type=pa.large_binary()),
            "_s": pa.array(x.sum(axis=0)),
            "_n": pa.array(np.full(d, len(x), dtype=np.int64)),
        })

    parts = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=4096).take_all()
    d = max(int(r["row"]) for r in parts) + 1
    gram = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0
    for r in parts:
        gram[int(r["row"])] += np.frombuffer(r["_g"], dtype=np.float64)
        if int(r["row"]) == 0:
            n += int(r["_n"])
        sums[int(r["row"])] += float(r["_s"])
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    ia, ib = np.triu_indices(d)
    return pa.table({
        "dim_a": pa.array(ia.astype(np.int64)),
        "dim_b": pa.array(ib.astype(np.int64)),
        "cov": pa.array(np.floor(cov[ia, ib] * 1e6 + 0.5) / 1e6),
    })


def embedding_pca(sf_dir: str, k: int = 8):
    """Distributed PCA projection — covariance via the d x d Gram
    reduction above, eigendecomposition of the tiny d x d matrix on the
    driver (the only driver-resident object is d^2 floats), components
    broadcast once, projection one matmul per batch. Deterministic sign
    convention: each component's largest-|loading| coordinate is made
    positive. Returns (vec_id, pc, score) long form plus nothing
    n-sized on the driver. Rows-only gate (eigh is not SQL-expressible);
    orthonormality / variance-sum / reconstruction laws are pytest-gated
    and the covariance input is oracle-gated via embedding_covariance."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def part(batch: pa.Table) -> pa.Table:
        x = _stack_embeddings(batch)
        d = x.shape[1]
        g = x.T @ x
        return pa.table({
            "row": pa.array(np.arange(d, dtype=np.int64)),
            "_g": pa.array([r.tobytes() for r in g],
                           type=pa.large_binary()),
            "_s": pa.array(x.sum(axis=0)),
            "_n": pa.array(np.full(d, len(x), dtype=np.int64)),
        })

    parts = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=4096).take_all()
    d = max(int(r["row"]) for r in parts) + 1
    gram = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0
    for r in parts:
        gram[int(r["row"])] += np.frombuffer(r["_g"], dtype=np.float64)
        if int(r["row"]) == 0:
            n += int(r["_n"])
        sums[int(r["row"])] += float(r["_s"])
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]                  # (d, k)
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    comps = comps * flip[None, :]
    ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        mu, c = ray.get(ref)
        x = _stack_embeddings(batch)
        s = (x - mu[None, :]) @ c        # (n, k)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        kk = c.shape[1]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, kk)),
            "pc": pa.array(np.tile(np.arange(kk, dtype=np.int64),
                                   len(ids))),
            "score": pa.array(np.round(s.ravel(), 6)),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=4096)


def count_min_partials(ds, col: str, width: int = 64, depth: int = 4):
    """Count–Min sketch build (Cormode & Muthukrishnan, J.Alg 2005): a
    ``depth`` × ``width`` counter grid where row r increments cell
    md5(key:r) % width. Each batch reduces to ≤ depth·width partial
    rows via per-unique hashing + bincount, merged by one tiny groupby
    sum — shuffle volume is independent of input size, and the grid is
    the mergeable state (union = cell-wise add).

    Hashing is md5 over the ``"{key}:{row}"`` string (first 8 hex
    chars → int), the repo's deterministic-sampling law, so an SQL
    oracle can recompute every cell exactly. Returns a Dataset of
    (row, cell, n)."""
    import hashlib

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(vals, return_counts=True)
        out_r, out_c, out_n = [], [], []
        for r in range(depth):
            cells = np.array(
                [int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:8],
                     16) % width for v in uniq], dtype=np.int64)
            bc = np.bincount(cells, weights=counts, minlength=width)
            nz = np.nonzero(bc)[0]
            out_r.extend([r] * len(nz))
            out_c.extend(nz.tolist())
            out_n.extend(bc[nz].astype(np.int64).tolist())
        return pa.table({
            "row": pa.array(out_r, pa.int64()),
            "cell": pa.array(out_c, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby(["row", "cell"]).aggregate(Sum("n", alias_name="n"))


def cms_estimate(grid: dict, keys, width: int, depth: int):
    """Point-frequency estimates from a built sketch: min over rows of
    the key's cell counter. ``grid`` maps (row, cell) -> count."""
    import hashlib

    out = []
    for k in keys:
        est = min(
            grid.get((r, int(hashlib.md5(f"{k}:{r}".encode())
                             .hexdigest()[:8], 16) % width), 0)
            for r in range(depth))
        out.append(int(est))
    return out


def user_cms_estimates(sf_dir: str, width: int = 64, depth: int = 4,
                       topn: int = 20):
    """Count–Min estimates vs exact counts for the ``topn`` most active
    users — the heavy-hitter frequency audit (CMS law: estimate ≥
    truth, within εN with high probability; width=64 forces real
    collisions so the gate exercises the min-over-rows reduction).

    Scale shape: the sketch build is one bounded-partial groupby
    (≤ depth·width rows cross the wire); exact counts reduce through
    groupby(user).count; the top-``topn`` selection is a distributed
    sort + limit; estimation reads the ≤ depth·width grid driver-side.
    """
    ds = _read(sf_dir, "events", ["user_id"])
    grid_rows = count_min_partials(ds, "user_id", width, depth) \
        .take_all()
    grid = {(int(r["row"]), int(r["cell"])): int(r["n"])
            for r in grid_rows}
    exact = ds.groupby("user_id").aggregate(
        Count(alias_name="n_exact"))
    top = exact.sort(["n_exact", "user_id"], descending=[True, False]) \
        .limit(topn).take_all()
    uids = [int(r["user_id"]) for r in top]
    ests = cms_estimate(grid, uids, width, depth)
    return pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "n_exact": pa.array([int(r["n_exact"]) for r in top],
                            pa.int64()),
        "n_cms": pa.array(ests, pa.int64()),
    })


def logreg_fit(sf_dir: str, lr: float = 0.5, iters: int = 40,
               l2: float = 1e-3):
    """Distributed full-batch logistic regression (L2-regularized
    gradient descent) predicting ``event_type == 'purchase'`` from
    standardized event value + hour-of-day — the learned-filter
    training loop next to ``kmeans_fit``: every iteration is one
    broadcast of the weight vector + one ``map_batches`` pass whose
    per-block partial is (d+1 gradient floats, loss, n), reduced
    driver-side. The event volume crosses the wire ZERO times; per
    iteration the driver sees blocks × (d+2) floats.

    Deterministic: features standardized by exact distributed moments,
    zero-init weights, fixed lr/iters — no RNG anywhere. The pytest
    law gate (tests/test_sketches.py) checks bitwise-stable re-runs,
    agreement with a single-process numpy GD at 1e-6, and monotone
    loss decrease (convexity + small lr).

    Returns (w, mu, sd, losses): weights [intercept, value_z,
    hour_frac], the standardization constants, and the per-iteration
    mean log-loss trace."""
    import ray

    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["event_type", "value", "ts"]) \
        .materialize()

    def mom(batch: pa.Table) -> pa.Table:
        x = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"_n": pa.array([len(x)], pa.int64()),
                         "_s": pa.array([float(x.sum())]),
                         "_ss": pa.array([float((x * x).sum())])})

    m = ds.map_batches(mom, batch_format="pyarrow", batch_size=65536)
    n_tot = float(m.sum("_n"))
    s, ss = float(m.sum("_s")), float(m.sum("_ss"))
    mu = s / n_tot
    sd = float(np.sqrt(ss / n_tot - mu * mu))

    def features(batch: pa.Table) -> tuple:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        h = pc.hour(batch.column("ts")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.column_stack([
            np.ones(len(v)), (v - mu) / sd, h / 23.0])
        y = (batch.column("event_type").to_pandas()
             .to_numpy(object) == "purchase").astype(np.float64)
        return x, y

    w = np.zeros(3)
    losses = []
    for _ in range(iters):
        wref = ray.put(w)

        def grad_part(batch: pa.Table, wref=wref) -> pa.Table:
            wv = ray.get(wref)
            x, y = features(batch)
            z = x @ wv
            p = 1.0 / (1.0 + np.exp(-z))
            g = x.T @ (p - y)
            loss = float((np.logaddexp(0.0, z) - y * z).sum())
            return pa.table({
                "g": pa.array([g.tobytes()], pa.large_binary()),
                "loss": pa.array([loss]),
                "n": pa.array([len(y)], pa.int64())})

        parts = ds.map_batches(grad_part, batch_format="pyarrow",
                               batch_size=65536).take_all()
        g = np.zeros(3)
        loss = 0.0
        n = 0
        for r in parts:
            g += np.frombuffer(r["g"], dtype=np.float64)
            loss += r["loss"]
            n += r["n"]
        reg = l2 * np.concatenate(([0.0], w[1:]))
        w = w - lr * (g / n + reg)
        losses.append(loss / n)
    return w, mu, sd, losses


def events_purchase_lr(sf_dir: str, lr: float = 0.5, iters: int = 40):
    """Query surface: the fitted coefficient table + resubstitution
    accuracy/log-loss of the purchase classifier. Rows-only oracle
    (iterative optimization is not SQL-expressible); determinism,
    numpy-GD agreement and monotone-loss laws are pytest-gated."""
    import ray

    import pyarrow.compute as pc

    w, mu, sd, losses = logreg_fit(sf_dir, lr=lr, iters=iters)
    wref = ray.put((w, mu, sd))
    ds = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def score(batch: pa.Table) -> pa.Table:
        wv, m_, s_ = ray.get(wref)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        h = pc.hour(batch.column("ts")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.column_stack([np.ones(len(v)), (v - m_) / s_, h / 23.0])
        y = (batch.column("event_type").to_pandas()
             .to_numpy(object) == "purchase").astype(np.float64)
        z = x @ wv
        pred = (z > 0).astype(np.float64)
        return pa.table({
            "_n": pa.array([len(y)], pa.int64()),
            "_ok": pa.array([float((pred == y).sum())]),
            "_loss": pa.array(
                [float((np.logaddexp(0.0, z) - y * z).sum())])})

    agg = ds.map_batches(score, batch_format="pyarrow",
                         batch_size=65536)
    n = float(agg.sum("_n"))
    acc = float(agg.sum("_ok")) / n
    ll = float(agg.sum("_loss")) / n
    return pa.table({
        "feature": pa.array(["intercept", "value_z", "hour_frac"],
                            pa.string()),
        "coef": pa.array(np.round(w, 6), pa.float64()),
        "n": pa.array([int(n)] * 3, pa.int64()),
        "train_accuracy": pa.array([round(acc, 6)] * 3, pa.float64()),
        "train_log_loss": pa.array([round(ll, 6)] * 3, pa.float64()),
    })


def gmm_fit(sf_dir: str, k: int = 5, max_iters: int = 30,
            tol: float = 1e-7, var_floor: float = 1e-6):
    """Distributed EM for a diagonal-covariance Gaussian mixture over
    the embeddings table — the SOFT-clustering twin of ``kmeans_fit``
    (Dempster et al. 1977; the map-reduce EM shape of Chu et al.,
    NIPS 2006: sufficient statistics are sums over rows, so each batch
    emits k×(2d+2) partial numbers and the driver M-step reduces a
    k-row table; shuffle volume independent of n).

    Per iteration: (weights, means, vars) broadcast via ``ray.put``
    once; each batch computes log-responsibilities with one vectorized
    logsumexp and emits per-component partials (Σr, Σr·x, Σr·x²,
    per-batch loglik). Deterministic init: means = the k lowest
    vec_ids (kmeans_fit's law), variance = per-dim global moments
    (one combiner pass), weights uniform. Convergence = relative
    loglik improvement < ``tol``; EM guarantees the per-iteration
    loglik sequence is non-decreasing (pytest law).

    Returns (weights (k,), means (k,d), vars (k,d), logliks list)."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    first = ds.sort("vec_id").limit(k).take_all()
    means = np.stack([np.asarray(r["embedding"], np.float64)
                      for r in first])
    d = means.shape[1]

    def mom(batch: pa.Table) -> pa.Table:
        x = _stack_embeddings(batch)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([x.sum(axis=0).tobytes()],
                           pa.large_binary()),
            "sx2": pa.array([(x * x).sum(axis=0).tobytes()],
                            pa.large_binary())})

    mrows = ds.map_batches(mom, batch_format="pyarrow",
                           batch_size=4096).take_all()
    n_tot = sum(r["n"] for r in mrows)
    sx = np.sum([np.frombuffer(r["sx"], np.float64) for r in mrows],
                axis=0)
    sx2 = np.sum([np.frombuffer(r["sx2"], np.float64) for r in mrows],
                 axis=0)
    gvar = np.maximum(sx2 / n_tot - (sx / n_tot) ** 2, var_floor)
    vars_ = np.tile(gvar, (k, 1))
    weights = np.full(k, 1.0 / k)
    logliks: list = []

    for _ in range(max_iters):
        params_ref = ray.put((weights, means, vars_))

        def estep(batch: pa.Table) -> pa.Table:
            w, mu, vr = ray.get(params_ref)  # noqa: B023
            x = _stack_embeddings(batch)
            # log N(x | mu_j, diag(vr_j)) row-vectorized over j
            lp = np.empty((len(x), len(w)))
            for j in range(len(w)):
                z = (x - mu[j]) ** 2 / vr[j]
                lp[:, j] = (np.log(w[j])
                            - 0.5 * (np.log(2 * np.pi * vr[j]).sum()
                                     + z.sum(axis=1)))
            m = lp.max(axis=1, keepdims=True)
            lse = m[:, 0] + np.log(np.exp(lp - m).sum(axis=1))
            r = np.exp(lp - lse[:, None])        # responsibilities
            return pa.table({
                "comp": pa.array(np.arange(len(w)), pa.int64()),
                "sr": pa.array(r.sum(axis=0)),
                "srx": pa.array([(r[:, j:j + 1] * x).sum(axis=0)
                                 .tobytes() for j in range(len(w))],
                                pa.large_binary()),
                "srx2": pa.array([(r[:, j:j + 1] * x * x).sum(axis=0)
                                  .tobytes() for j in range(len(w))],
                                 pa.large_binary()),
                "ll": pa.array(np.full(len(w), lse.sum() / len(w)))})

        parts = ds.map_batches(estep, batch_format="pyarrow",
                               batch_size=4096).take_all()
        sr = np.zeros(k)
        srx = np.zeros((k, d))
        srx2 = np.zeros((k, d))
        ll = 0.0
        for r in parts:
            j = r["comp"]
            sr[j] += r["sr"]
            srx[j] += np.frombuffer(r["srx"], np.float64)
            srx2[j] += np.frombuffer(r["srx2"], np.float64)
            ll += r["ll"]
        logliks.append(ll)
        weights = sr / sr.sum()
        means = srx / sr[:, None]
        vars_ = np.maximum(srx2 / sr[:, None] - means ** 2, var_floor)
        if len(logliks) >= 2 and \
                abs(logliks[-1] - logliks[-2]) \
                <= tol * abs(logliks[-2]):
            break
    return weights, means, vars_, logliks


def gmm_assignments(sf_dir: str, k: int = 5, max_iters: int = 30):
    """Query surface: per-vector MAP component + max responsibility
    (rounded 6) under the fitted mixture — deterministic. Rows-only
    for the driver; pytest gates the EM loglik monotonicity law and
    byte-agreement of assignments with a driver numpy EM replay
    (tests/test_sketches.py)."""
    import ray

    weights, means, vars_, _ = gmm_fit(sf_dir, k=k,
                                       max_iters=max_iters)
    ref = ray.put((weights, means, vars_))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def label(batch: pa.Table) -> pa.Table:
        w, mu, vr = ray.get(ref)
        x = _stack_embeddings(batch)
        lp = np.empty((len(x), len(w)))
        for j in range(len(w)):
            z = (x - mu[j]) ** 2 / vr[j]
            lp[:, j] = (np.log(w[j])
                        - 0.5 * (np.log(2 * np.pi * vr[j]).sum()
                                 + z.sum(axis=1)))
        m = lp.max(axis=1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(lp - m).sum(axis=1))
        r = np.exp(lp - lse[:, None])
        comp = lp.argmax(axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "comp": pa.array(comp.astype(np.int64)),
            "resp": pa.array(
                np.round(r[np.arange(len(x)), comp], 6))})

    return ds.map_batches(label, batch_format="pyarrow",
                          batch_size=4096).sort("vec_id")


def gmm_fit_numpy(vecs: np.ndarray, k: int = 5, max_iters: int = 30,
                  tol: float = 1e-7, var_floor: float = 1e-6):
    """Driver oracle: same EM with the same deterministic init over an
    in-memory matrix (vecs must be sorted by vec_id)."""
    means = vecs[:k].copy()
    gvar = np.maximum(vecs.var(axis=0), var_floor)
    vars_ = np.tile(gvar, (k, 1))
    weights = np.full(k, 1.0 / k)
    logliks = []
    for _ in range(max_iters):
        lp = np.empty((len(vecs), k))
        for j in range(k):
            z = (vecs - means[j]) ** 2 / vars_[j]
            lp[:, j] = (np.log(weights[j])
                        - 0.5 * (np.log(2 * np.pi * vars_[j]).sum()
                                 + z.sum(axis=1)))
        m = lp.max(axis=1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(lp - m).sum(axis=1))
        r = np.exp(lp - lse[:, None])
        logliks.append(float(lse.sum()))
        sr = r.sum(axis=0)
        weights = sr / sr.sum()
        means = (r.T @ vecs) / sr[:, None]
        ex2 = (r.T @ (vecs * vecs)) / sr[:, None]
        vars_ = np.maximum(ex2 - means ** 2, var_floor)
        if len(logliks) >= 2 and \
                abs(logliks[-1] - logliks[-2]) \
                <= tol * abs(logliks[-2]):
            break
    return weights, means, vars_, logliks


def pav_isotonic(rates: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Pool-Adjacent-Violators (Ayer et al. 1955): the weighted
    non-decreasing fit to ``rates`` (already sorted by x). Returns the
    fitted value per input position. O(n) stack form — exact, no
    iteration-to-convergence."""
    vals: list = []      # (mean, weight, n_positions) blocks
    for r, w in zip(rates.astype(np.float64),
                    weights.astype(np.float64)):
        vals.append([r, w, 1])
        while len(vals) >= 2 and vals[-2][0] >= vals[-1][0]:
            m2, w2, c2 = vals.pop()
            m1, w1, c1 = vals.pop()
            vals.append([(m1 * w1 + m2 * w2) / (w1 + w2),
                         w1 + w2, c1 + c2])
    out = np.empty(len(rates))
    i = 0
    for m, _w, c in vals:
        out[i:i + c] = m
        i += c
    return out


def events_isotonic_calibration(sf_dir: str, bin_width: float = 10.0):
    """Isotonic (monotone) calibration of P(purchase | value): bin the
    value axis, reduce each bin's (purchases, events) distributedly,
    then fit the weighted non-decreasing rate curve with PAV — the
    classifier-calibration primitive (Zadrozny & Elkan, KDD 2002)
    next to the logistic model (events_purchase_lr).

    Scale shape: one bounded-histogram combiner groupby (bins =
    value_range / bin_width cells, data-independent); PAV runs
    driver-side over the sorted bin table — O(bins), exact, no
    convergence loop. Rows-only for the driver; pytest gates
    monotonicity, weighted-mean preservation, block-pooling means and
    a driver PAV replay (tests/test_sketches.py)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def part(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = batch.column("value").to_numpy(zero_copy_only=False)
        y = (batch.column("event_type").to_pandas()
             .to_numpy() == "purchase").astype(np.int64)
        b = np.floor(v / bin_width).astype(np.int64)
        df = pd.DataFrame({"bin": b, "y": y, "n": np.int64(1)})
        g = df.groupby("bin", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum as _Sum
    hist = ds.map_batches(part, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("bin").aggregate(_Sum("y", alias_name="y"),
                                  _Sum("n", alias_name="n")) \
        .to_pandas().sort_values("bin").reset_index(drop=True)
    y = hist["y"].to_numpy(np.float64)
    n = hist["n"].to_numpy(np.float64)
    raw = y / n
    iso = pav_isotonic(raw, n)
    return pa.table({
        "bin_lo": pa.array(hist["bin"].to_numpy(np.int64)
                           * bin_width, pa.float64()),
        "n_events": pa.array(hist["n"].to_numpy(np.int64)),
        "n_purchases": pa.array(hist["y"].to_numpy(np.int64)),
        "rate_raw": pa.array(np.round(raw, 6)),
        "rate_iso": pa.array(np.round(iso, 6)),
    })


def ridge_fit(sf_dir: str, lam: float = 1.0):
    """Closed-form ridge regression (Tikhonov) predicting the
    purchase indicator from [1, value_z, hour_frac] — the linear-
    probability twin of ``logreg_fit``, solved EXACTLY in two
    distributed passes via the normal equations
    w = (XᵀX + λI′)⁻¹ Xᵀy (I′ zeroes the intercept cell — the
    standard unpenalized-intercept convention):

    - pass 1: value moments (mean/sd) for standardization;
    - pass 2: per-block partials of the d×d Gram matrix XᵀX, Xᵀy,
      Σy, Σy² — (d² + d + 2) floats per block, the map-reduce
      sufficient-statistics shape (Chu et al., NIPS 2006);
    - driver: one d×d solve. No iteration, no convergence knob.

    Returns (w, mu, sd, mse, r2)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["event_type", "value", "ts"]) \
        .materialize()

    def mom(batch: pa.Table) -> pa.Table:
        x = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"_n": pa.array([len(x)], pa.int64()),
                         "_s": pa.array([float(x.sum())]),
                         "_ss": pa.array([float((x * x).sum())])})

    m = ds.map_batches(mom, batch_format="pyarrow", batch_size=65536)
    n_tot = float(m.sum("_n"))
    s, ss = float(m.sum("_s")), float(m.sum("_ss"))
    mu = s / n_tot
    sd = float(np.sqrt(ss / n_tot - mu * mu))
    d = 3

    def gram(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        h = pc.hour(batch.column("ts")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.column_stack([
            np.ones(len(v)), (v - mu) / sd, h / 23.0])
        y = (batch.column("event_type").to_pandas()
             .to_numpy(object) == "purchase").astype(np.float64)
        return pa.table({
            "xtx": pa.array([(x.T @ x).tobytes()], pa.large_binary()),
            "xty": pa.array([(x.T @ y).tobytes()], pa.large_binary()),
            "sy": pa.array([float(y.sum())]),
            "syy": pa.array([float((y * y).sum())]),
            "n": pa.array([len(y)], pa.int64())})

    parts = ds.map_batches(gram, batch_format="pyarrow",
                           batch_size=65536).take_all()
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    sy = syy = 0.0
    for r in parts:
        xtx += np.frombuffer(r["xtx"], np.float64).reshape(d, d)
        xty += np.frombuffer(r["xty"], np.float64)
        sy += r["sy"]
        syy += r["syy"]
    pen = lam * np.eye(d)
    pen[0, 0] = 0.0                     # intercept unpenalized
    w = np.linalg.solve(xtx + pen, xty)
    # mse / r2 from the same sufficient statistics: ||y - Xw||² =
    # yᵀy − 2wᵀXᵀy + wᵀXᵀXw
    sse = syy - 2.0 * float(w @ xty) + float(w @ xtx @ w)
    mse = sse / n_tot
    ybar = sy / n_tot
    sst = syy - n_tot * ybar * ybar
    return w, mu, sd, mse, 1.0 - sse / sst


def events_purchase_ridge(sf_dir: str, lam: float = 1.0):
    """Query surface: ridge coefficients + fit stats (one row per
    feature, stats repeated — the logreg query's layout). Rows-only;
    pytest gates the normal-equations solve against a DuckDB-loaded
    numpy replay and the sufficient-statistics SSE identity
    (tests/test_sketches.py)."""
    w, mu, sd, mse, r2 = ridge_fit(sf_dir, lam=lam)
    return pa.table({
        "feature": pa.array(["intercept", "value_z", "hour_frac"],
                            pa.string()),
        "coef": pa.array(np.round(w, 8)),
        "train_mse": pa.array(np.round(np.full(3, mse), 8)),
        "train_r2": pa.array(np.round(np.full(3, r2), 8)),
    })


def conformal_interval(sf_dir: str, alpha: float = 0.1,
                       lam: float = 1.0):
    """Split-conformal prediction interval (Vovk et al.; Lei et al.
    JASA 2018) for event value from time-of-day features — the
    DISTRIBUTION-FREE uncertainty primitive: train a ridge model on
    folds {0,1,2} (md5 split law), take the ⌈(n_cal+1)(1−α)⌉-th
    smallest absolute residual on calibration fold 3 as q̂, and the
    interval ŷ ± q̂ is guaranteed ≥ 1−α marginal coverage on
    exchangeable data — checked empirically on held-out fold 4.

    Scale shape: fold assignment is the stateless md5 law; training
    is the ridge sufficient-statistics reduction (Gram partials on
    the train fold only); q̂ is an EXACT order statistic via ONE
    distributed sort + limit(k) of the calibration residuals (the
    conformal guarantee needs the exact rank, not a sketch — the sort
    is the operator's inherent exchange); coverage is a stateless
    count. Returns a one-row summary table."""
    import hashlib
    import math

    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["event_id", "value", "ts"]) \
        .materialize()

    def with_fold(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        folds = np.array([
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
            % 5 for i in ids], np.int64)
        h = pc.hour(batch.column("ts")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        d = pc.day_of_week(batch.column("ts")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "fold": pa.array(folds),
            "x1": pa.array(h / 23.0),
            "x2": pa.array(d / 6.0),
            "y": batch.column("value")})

    feat = ds.map_batches(with_fold, batch_format="pyarrow",
                          batch_size=65536).materialize()

    def gram_train(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(batch.column("fold"),
                                       pa.scalar(2, pa.int64())))
        x = np.column_stack([
            np.ones(t.num_rows),
            t.column("x1").to_numpy(zero_copy_only=False),
            t.column("x2").to_numpy(zero_copy_only=False)])
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table({
            "xtx": pa.array([(x.T @ x).tobytes()], pa.large_binary()),
            "xty": pa.array([(x.T @ y).tobytes()], pa.large_binary()),
            "n": pa.array([t.num_rows], pa.int64())})

    parts = feat.map_batches(gram_train, batch_format="pyarrow",
                             batch_size=65536).take_all()
    xtx = np.zeros((3, 3))
    xty = np.zeros(3)
    n_train = 0
    for r in parts:
        xtx += np.frombuffer(r["xtx"], np.float64).reshape(3, 3)
        xty += np.frombuffer(r["xty"], np.float64)
        n_train += r["n"]
    pen = lam * np.eye(3)
    pen[0, 0] = 0.0
    w = np.linalg.solve(xtx + pen, xty)

    def residuals(batch: pa.Table, fold: int) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("fold"),
                                  pa.scalar(fold, pa.int64())))
        x = np.column_stack([
            np.ones(t.num_rows),
            t.column("x1").to_numpy(zero_copy_only=False),
            t.column("x2").to_numpy(zero_copy_only=False)])
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table({"res": pa.array(np.abs(y - x @ w))})

    cal = feat.map_batches(lambda t: residuals(t, 3),
                           batch_format="pyarrow",
                           batch_size=65536).materialize()
    n_cal = cal.count()
    k = math.ceil((n_cal + 1) * (1.0 - alpha))
    if k > n_cal:
        qhat = float("inf")
    else:
        # exact k-th smallest: one distributed sort + limit(k)
        qhat = float(cal.sort("res").limit(k)
                     .to_pandas()["res"].iloc[-1])

    test = feat.map_batches(lambda t: residuals(t, 4),
                            batch_format="pyarrow",
                            batch_size=65536)
    cov_parts = test.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "in_band": pa.array([int(
                (t.column("res").to_numpy(zero_copy_only=False)
                 <= qhat).sum())], pa.int64())}),
        batch_format="pyarrow")
    n_test = int(cov_parts.sum("n") or 0)
    n_in = int(cov_parts.sum("in_band") or 0)
    return pa.table({
        "alpha": pa.array([alpha]),
        "n_train": pa.array([n_train], pa.int64()),
        "n_cal": pa.array([n_cal], pa.int64()),
        "n_test": pa.array([n_test], pa.int64()),
        "q_hat": pa.array([np.round(qhat, 4)]),
        "coverage": pa.array([np.round(n_in / max(n_test, 1), 4)]),
    })
