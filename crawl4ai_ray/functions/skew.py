"""Skew-safe (salted) aggregation shapes.

A ``groupby(hot_key)`` routes EVERY row of a hot key through one
reducer — the canonical all-to-all skew failure at 100 TB (five event
types over billions of rows means five reducers do all the work).
Salting splits each hot group into ``num_salts`` sub-groups that
reduce in parallel, then folds the per-salt partials with a second,
tiny groupby.  The fold is only correct when the partial statistic is
decomposable across the salt; these helpers pick the salt so it is:

- ``salted_distinct_count``: COUNT(DISTINCT v) BY k.  The salt is
  derived from the DISTINCT value itself (``hash(v) % num_salts``), so
  every occurrence of a value lands in exactly one salt bucket and the
  per-salt distinct counts ADD — the two-stage exact distinct of the
  classic MapReduce playbook.  A per-batch ``np.unique`` combiner
  first collapses each block to its unique (k, salt, v) triples, so
  the exchange carries at most one row per distinct value per block,
  not one per input row.

The law test (tests/test_skew.py) checks byte-equality against the
unsalted pandas reference across salt counts and block layouts; the
``distinct_users_salted`` query is DuckDB-oracled end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic avalanche hash for int64 salts (splitmix64
    finalizer) — sequential ids must not all land in one bucket."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def salted_distinct_count(ds, key: str, distinct_col: str,
                          num_salts: int = 16, out: str = "n_distinct"):
    """Exact ``COUNT(DISTINCT distinct_col) GROUP BY key`` with the
    hot-key shuffle split ``num_salts`` ways.  ``distinct_col`` must be
    integer-typed (the salt hashes its value).  Returns a Dataset with
    columns ``[key, out]``."""

    def local_unique(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = batch.column(distinct_col).to_numpy(zero_copy_only=False)
        salt = (_splitmix64(v) % np.uint64(num_salts)).astype(np.int64)
        df = pd.DataFrame({key: k, "_salt": salt, distinct_col: v})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    triples = ds.map_batches(local_unique, batch_format="pyarrow",
                             batch_size=65536)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            out: [int(g[distinct_col].nunique())],
        })

    partials = (triples.groupby([key, "_salt"])
                .map_groups(per_bucket, batch_format="pandas"))
    return partials.groupby(key).aggregate(Sum(out, alias_name=out))
