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
    status 'V').  Pure double addition — bit-identical in DuckDB."""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    base = _read(sf_dir, "orders", cols)

    def version_stream(v: int, mod: int, status: str, bump: float):
        def mk(batch: pa.Table) -> pa.Table:
            if mod > 1:
                k = batch.column("o_orderkey").to_numpy(
                    zero_copy_only=False)
                batch = batch.filter(pa.array(k % mod == 0))
            n = len(batch)
            price = batch.column("o_totalprice")
            if bump:
                price = pc.add(price, bump)
            return pa.table({
                "o_orderkey": batch.column("o_orderkey"),
                "version": pa.array(np.full(n, v, np.int64)),
                "o_orderstatus": (pa.array([status] * n, pa.string())
                                  if status else
                                  batch.column("o_orderstatus")),
                "o_totalprice": price,
                "o_orderdate": batch.column("o_orderdate"),
            })
        return base.map_batches(mk, batch_format="pyarrow")

    v1 = version_stream(1, 1, "", 0.0)
    v2 = version_stream(2, 7, "U", 10.0)
    v3 = version_stream(3, 21, "V", 25.0)
    return v1.union(v2).union(v3)


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

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("version")
        nxt = g["eff_from"].shift(-1)
        g["eff_to"] = nxt.fillna("9999-12-31")
        g["is_current"] = nxt.isna()
        return g

    return (eff.groupby("o_orderkey")
            .map_groups(stitch, batch_format="pandas")
            .sort(["o_orderkey", "version"]))
