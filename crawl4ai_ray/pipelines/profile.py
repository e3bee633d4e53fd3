"""Column-cardinality profiling — the data-quality sweep a pipeline
runs before training on a new table: per column, row count, null
count, and EXACT distinct count.

Scale shape: one pass PER COLUMN over a single-column pruned read
(``read_parquet(columns=[c])`` — only that column's pages leave
storage).  Row/null counts fold per-batch partials through a tiny
``sum``; the exact distinct count goes through the sortagg
run-length machinery (``sorted_keyed_count``) after a per-batch
local ``np.unique`` combiner, so the exchange carries one row per
distinct value per block — never raw rows.  The result is one row
per column, assembled driver-side (bounded by the schema width).

Timestamps profile via their int64 microsecond view; all other types
pass through natively (numpy/arrow distinct on exact binary values,
matching SQL ``count(DISTINCT col)`` semantics — NULLs excluded).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd


def column_profile(sf_dir: str, table: str = "orders"):
    """(column, n_rows, n_null, n_distinct) for every column of
    ``table`` — exact counts, SQL ``count(DISTINCT ...)`` parity."""
    from ..functions.sortagg import sorted_keyed_count

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path)
    out = {"column": [], "n_rows": [], "n_null": [], "n_distinct": []}

    for name in schema.names:
        typ = schema.field(name).type
        ds = rd.read_parquet(path, columns=[name])

        def counts(batch: pa.Table, name=name) -> pa.Table:
            col = batch.column(name)
            return pa.table({
                "n": pa.array([len(col)], pa.int64()),
                "nn": pa.array([col.null_count], pa.int64()),
            })

        part = ds.map_batches(counts, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
        n_rows, n_null = int(part["n"].sum()), int(part["nn"].sum())

        def local_unique(batch: pa.Table, name=name,
                         is_ts=pa.types.is_timestamp(typ)) -> pa.Table:
            col = batch.column(name).combine_chunks()
            col = col.drop_null()
            if is_ts:
                col = col.cast(pa.int64())
            u = pc.unique(col)
            return pa.table({"k": u})

        uniq = ds.map_batches(local_unique, batch_format="pyarrow",
                              batch_size=65536)
        n_distinct = sorted_keyed_count(uniq, "k").count()

        out["column"].append(name)
        out["n_rows"].append(n_rows)
        out["n_null"].append(n_null)
        out["n_distinct"].append(int(n_distinct))

    return pa.table({
        "column": pa.array(out["column"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_null": pa.array(out["n_null"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
    }).sort_by("column")
