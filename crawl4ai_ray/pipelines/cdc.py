"""Changelog / CDC pipelines: latest-wins compaction and SCD2 history.

The missing family flagged in the round-4 gap review: a 100 TB corpus
is never rebuilt from scratch — it is UPSERTED.  These operators take
an append-only changelog (key, version, payload...) and produce

- ``orders_upsert_latest``: the compacted current-state table (one row
  per key, the row with the highest version — MERGE INTO latest-wins
  semantics, the shape of Iceberg/Delta changelog compaction), and
- ``orders_scd2``: the slowly-changing-dimension type-2 history (one
  row per version with ``[eff_from, eff_to)`` validity intervals and
  an ``is_current`` flag).

Reference surface: crawl4ai's cache layer is a latest-wins upsert by
url (``async_database.py`` aio_insert_or_replace semantics); this
module generalizes it to arbitrary keyed changelogs on Ray Data.

Scale shape
-----------
``sorted_latest_wins`` is the sortagg pattern (functions/sortagg.py)
applied to ARGMAX instead of SUM: one range sort by (key, version) —
the operator's inherent exchange — then a per-block vectorized
run-last pass.  A key run strictly inside one block is complete, so
its last row IS the global winner; only each block's first and last
runs can span boundaries, and those ≤2-per-block winner rows are
merged on the driver and unioned back as one tiny block.  Nothing
key-sized lands on the driver, no per-group Python finisher runs.

The changelog itself is synthesized deterministically from the orders
table (version 1 = every row; version 2 = keys ≡ 0 mod 7 with a price
bump and status 'U'; version 3 = keys ≡ 0 mod 21, status 'V') so the
DuckDB oracle can rebuild the identical stream — no external data.
The price arithmetic is pure double addition (no rounding) so the Ray
and SQL sides are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# generic operator: latest-wins changelog compaction
# ---------------------------------------------------------------------------

def sorted_latest_wins(ds, key: str, order_col: str):
    """Compact a keyed changelog to one row per ``key`` — the row with
    the maximum ``order_col`` (version / commit timestamp), all payload
    columns riding along.  Semantics of

        SELECT * FROM log QUALIFY
        row_number() OVER (PARTITION BY key ORDER BY order_col DESC) = 1

    executed as sort + vectorized run-last (see module docstring).
    ``(key, order_col)`` pairs must be unique (true for any changelog
    with per-key monotone versions).  Returns a Dataset with the input
    columns minus the internal boundary flag.
    """
    s = ds.sort([key, order_col])
    in_schema = ds.schema()
    names = list(in_schema.names)

    def run_last(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            cols = {c: pa.array([], in_schema.base_schema.field(c).type)
                    for c in names}
            cols["_bnd"] = pa.array([], pa.bool_())
            return pa.table(cols)
        k = batch.column(key).to_numpy(zero_copy_only=False)
        # run ends: last index of each equal-key run (sorted input)
        ends = np.concatenate(
            (np.flatnonzero(k[1:] != k[:-1]), [n - 1]))
        out = batch.take(pa.array(ends, pa.int64()))
        bnd = np.zeros(len(ends), bool)
        bnd[0] = bnd[-1] = True   # only these runs can span blocks
        return out.append_column("_bnd", pa.array(bnd))

    parts = s.map_batches(run_last, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior = parts.filter(expr="_bnd == False").select_columns(names)
    bpd = parts.filter(expr="_bnd == True").to_pandas()  # ≤ 2 × blocks
    if key not in bpd.columns or len(bpd) == 0:
        return interior
    # the global winner of a boundary run is the portion-winner with
    # the max order_col (ties impossible: (key, order) unique)
    win = (bpd.sort_values([key, order_col])
           .groupby(key, as_index=False).tail(1))[names]
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(win, preserve_index=False)))


# ---------------------------------------------------------------------------
# the deterministic synthetic changelog over orders
# ---------------------------------------------------------------------------

def _changelog(sf_dir: str):
    """Append-only changelog: (o_orderkey, version, o_orderstatus,
    o_totalprice, o_orderdate).  v1 = base; v2 for keys % 7 == 0
    (price + 10.0, status 'U'); v3 for keys % 21 == 0 (price + 25.0,
    status 'V').  Pure double addition — bit-identical in DuckDB.
    All three version streams are emitted in ONE pass over the base
    read (a single-scan multi-stream explode, not three reads)."""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    base = _read(sf_dir, "orders", cols)

    def explode(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = batch.column("o_totalprice").to_numpy(
            zero_copy_only=False)
        status = batch.column("o_orderstatus").to_pylist()
        date = batch.column("o_orderdate")
        m7 = np.flatnonzero(k % 7 == 0)
        m21 = np.flatnonzero(k % 21 == 0)
        n, n7, n21 = len(k), len(m7), len(m21)
        keys = np.concatenate((k, k[m7], k[m21]))
        ver = np.concatenate((np.full(n, 1), np.full(n7, 2),
                              np.full(n21, 3))).astype(np.int64)
        prices = np.concatenate((price, price[m7] + 10.0,
                                 price[m21] + 25.0))
        stats = status + ["U"] * n7 + ["V"] * n21
        idx = pa.array(np.concatenate(
            (np.arange(n), m7, m21)).astype(np.int64))
        return pa.table({
            "o_orderkey": pa.array(keys),
            "version": pa.array(ver),
            "o_orderstatus": pa.array(stats, pa.string()),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": date.take(idx),
        })

    return base.map_batches(explode, batch_format="pyarrow",
                            batch_size=65536)


def orders_upsert_latest(sf_dir: str):
    """Compacted current state of the synthetic orders changelog —
    latest-wins MERGE semantics via ``sorted_latest_wins``.  Columns
    (o_orderkey, version, o_orderstatus, o_totalprice), ordered by
    key, match the QUALIFY row_number oracle."""
    log = _changelog(sf_dir).drop_columns(["o_orderdate"])
    return (sorted_latest_wins(log, "o_orderkey", "version")
            .sort("o_orderkey"))


def orders_scd2(sf_dir: str):
    """SCD type-2 history of the synthetic changelog: each version is
    effective from ``o_orderdate + (version-1)*30`` days until the
    next version's start (exclusive), open intervals closed with
    '9999-12-31'; ``is_current`` marks the latest version.

    Scale shape: the interval stitch is per-key with ≤3 rows per
    group — a bounded ``groupby(key).map_groups``; the exchange is the
    single hash/range partition by key that any SCD2 build needs.
    """
    log = _changelog(sf_dir)

    def to_eff(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[D]")
        v = batch.column("version").to_numpy(zero_copy_only=False)
        eff = d + (v - 1) * 30
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "version": batch.column("version"),
            "o_orderstatus": batch.column("o_orderstatus"),
            "o_totalprice": batch.column("o_totalprice"),
            "eff_from": pa.array(np.datetime_as_string(eff)),
        })

    eff = log.map_batches(to_eff, batch_format="pyarrow")

    # run-length interval stitch (NOT per-key map_groups — 150k
    # single-digit groups is the documented pathological shape): one
    # sort by (key, version), then each row's eff_to is simply the
    # NEXT row's eff_from when the key continues.  Within a block
    # that's a vectorized shift; only each block's LAST row needs the
    # next block's first row, so blocks emit their interior rows
    # resolved plus one boundary row, and the driver stitches the
    # ≤1-per-block boundaries against the next block's first
    # (key, eff_from) pair.
    s = eff.sort(["o_orderkey", "version"]).materialize()
    names = ["o_orderkey", "version", "o_orderstatus", "o_totalprice",
             "eff_from"]
    OPEN = "9999-12-31"

    def stitch_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {c: pa.array(
                [], pa.int64() if c in ("o_orderkey", "version")
                else (pa.float64() if c == "o_totalprice"
                      else pa.string())) for c in names}
            cols["eff_to"] = pa.array([], pa.string())
            cols["is_current"] = pa.array([], pa.bool_())
            cols["_bnd"] = pa.array([], pa.bool_())
            cols["_first_key"] = pa.array([], pa.int64())
            cols["_first_eff"] = pa.array([], pa.string())
            return pa.table(cols)
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        ef = np.asarray(batch.column("eff_from").to_pylist(),
                        dtype=object)
        cont = np.zeros(n, bool)
        cont[:-1] = k[1:] == k[:-1]
        eff_to = np.where(cont, np.roll(ef, -1), OPEN)
        out = {c: batch.column(c) for c in names}
        out["eff_to"] = pa.array(eff_to.tolist(), pa.string())
        out["is_current"] = pa.array(~cont)
        bnd = np.zeros(n, bool)
        bnd[-1] = True              # provisional: fixed by the driver
        out["_bnd"] = pa.array(bnd)
        out["_first_key"] = pa.array(np.full(n, k[0], np.int64))
        out["_first_eff"] = pa.array([str(ef[0])] * n, pa.string())
        return pa.table(out)

    parts = s.map_batches(stitch_block, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior = parts.filter(expr="_bnd == False") \
        .select_columns(names + ["eff_to", "is_current"])
    bpd = parts.filter(expr="_bnd == True").to_pandas()  # 1 × blocks
    if len(bpd) == 0:
        return interior.sort(["o_orderkey", "version"])
    bpd = bpd.sort_values(["o_orderkey", "version"],
                          kind="mergesort").reset_index(drop=True)
    nxt_key = bpd["_first_key"].shift(-1)
    nxt_eff = bpd["_first_eff"].shift(-1)
    cont = (bpd["o_orderkey"] == nxt_key).to_numpy()
    bpd["eff_to"] = np.where(cont, nxt_eff, OPEN)
    bpd["is_current"] = ~cont
    fixed = bpd[names + ["eff_to", "is_current"]]
    return (interior.union(rd.from_arrow(
        pa.Table.from_pandas(fixed, preserve_index=False)))
        .sort(["o_orderkey", "version"]))
