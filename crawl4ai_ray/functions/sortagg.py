"""Sort-based keyed reduction for HIGH-CARDINALITY keys.

Ray's ``groupby().aggregate()`` is a range sort followed by a
per-group Python finisher — fine when groups are few, pathological
when nearly every row is its own group (measured in this repo:
150 s for 1.2M singleton pair groups, 653 s for 7.9M, ~30 s for the
580k (order, supplier) pairs of TPC-H Q21 — where a plain range sort
of the same rows runs in well under a second).

``sorted_keyed_sum`` keeps the sort (the operator's inherent
exchange) and replaces the per-group finisher with one vectorized
``np.unique``/``np.bincount`` pass per BLOCK: after a range sort,
equal keys are globally contiguous, so every run strictly inside a
block is complete and its partial sums are exact.  Only each block's
FIRST and LAST key can span block boundaries; those ≤2-per-block
boundary rows are summed on the driver and unioned back as one tiny
block.  The result stays a distributed Dataset — nothing key-sized
ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["sorted_keyed_sum", "sorted_keyed_count",
           "sorted_distinct_keys"]

_UFUNC = {"sum": np.add, "max": np.maximum, "min": np.minimum}


def sorted_keyed_sum(ds, key: str, val_cols: list,
                     key_type: pa.DataType | None = None,
                     how: str = "sum"):
    """Exact per-key ``how``-reduction (sum/max/min) of ``val_cols``
    grouped by the (single, numeric) ``key`` column — semantics of
    ``ds.groupby(key).aggregate(...)`` with sort + run-length
    execution.  Composite keys should be packed into one integer by
    the caller (e.g. ``hi32 << 32 | lo32``).  Returns a Dataset with
    columns ``[key, *val_cols]`` (each value column keeps its numpy
    dtype; integer sums stay int64)."""
    ufunc = _UFUNC[how]
    s = ds.sort(key)

    def runs(batch: pa.Table) -> pa.Table:
        col = batch.column(key).combine_chunks()
        n = len(col)
        if n == 0:
            # typed empties from the input schema, so empty sorted
            # partitions never change the unified block schema
            cols = {key: pa.array([], key_type or col.type)}
            for v in val_cols:
                vt = batch.column(v).type
                cols[v] = pa.array([], pa.int64()
                                   if pa.types.is_integer(vt) else vt)
            cols["_bnd"] = pa.array([], pa.bool_())
            return pa.table(cols)
        # keys are globally sorted -> runs are contiguous; find run
        # starts with one vectorized neighbor-compare (arrow kernel
        # for strings, numpy otherwise), reduce each run with one
        # ufunc.reduceat — no per-group Python
        if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type):
            import pyarrow.compute as _pc

            ne = _pc.not_equal(col.slice(1), col.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.flatnonzero(ne) + 1))
            key_vals = col.take(pa.array(starts, pa.int64()))
        else:
            k = col.to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(
                np.concatenate(([True], k[1:] != k[:-1])))
            key_vals = pa.array(k[starts])
        bnd = np.zeros(len(starts), bool)
        bnd[0] = bnd[-1] = True
        cols = {key: key_vals}
        for v in val_cols:
            w = batch.column(v).to_numpy(zero_copy_only=False)
            red = ufunc.reduceat(w, starts)
            if how == "sum" and np.issubdtype(w.dtype, np.integer):
                red = red.astype(np.int64)
            cols[v] = pa.array(red)
        cols["_bnd"] = pa.array(bnd)
        return pa.table(cols)

    parts = s.map_batches(runs, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior = parts.filter(expr="_bnd == False") \
        .select_columns([key] + list(val_cols))
    bpd = parts.filter(expr="_bnd == True").to_pandas()  # ≤ 2 × blocks
    if key not in bpd.columns or len(bpd) == 0:  # empty ds drops schema
        return interior
    merged = bpd.groupby(key, as_index=False)[list(val_cols)].agg(how)
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(merged, preserve_index=False)))


def sorted_keyed_count(ds, key: str, out: str = "_n"):
    """``ds.groupby(key).count()`` with sort + run-length execution:
    a per-batch ``np.unique`` combiner first collapses each batch to
    (key, partial count), then ``sorted_keyed_sum`` folds the
    partials exactly."""
    def combine(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        vals, counts = np.unique(k, return_counts=True)
        return pa.table({key: pa.array(vals),
                         out: pa.array(counts.astype(np.int64))})

    return sorted_keyed_sum(
        ds.map_batches(combine, batch_format="pyarrow",
                       batch_size=65536), key, [out])


def sorted_distinct_keys(ds, key: str):
    """DISTINCT ``key`` (single numeric column) via the same
    machinery; returns a Dataset with just the key column."""
    return sorted_keyed_count(ds, key).select_columns([key])


def triu_pairs_by_runs(vals: "np.ndarray", st: "np.ndarray",
                       en: "np.ndarray", names=("a", "b"),
                       max_run: int | None = None) -> pa.Table:
    """Vectorized unordered-pair fan-out for runs [st, en) over a
    sorted ``vals`` array (each run = one group's sorted members): for
    each distinct run length m, gather all runs of that length into an
    (R, m) matrix and emit its upper triangle in bulk — no per-group
    Python call. Runs longer than ``max_run`` are dropped (the LSH
    bucket cap semantics)."""
    lens = en - st
    if max_run is not None:
        keep = lens <= max_run
        st, lens = st[keep], lens[keep]
    a_parts, b_parts = [], []
    for m in np.unique(lens):
        if m < 2:
            continue
        rs = st[lens == m]
        mat = vals[rs[:, None] + np.arange(m)[None, :]]
        iu, ju = np.triu_indices(int(m), k=1)
        a_parts.append(mat[:, iu].ravel())
        b_parts.append(mat[:, ju].ravel())
    if not a_parts:
        return pa.table({names[0]: pa.array([], pa.int64()),
                         names[1]: pa.array([], pa.int64())})
    return pa.table({
        names[0]: pa.array(np.concatenate(a_parts).astype(np.int64)),
        names[1]: pa.array(np.concatenate(b_parts).astype(np.int64)),
    })
