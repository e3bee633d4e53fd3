"""Laws for the salted aggregation shapes (functions/skew.py).

The fold across salt buckets is exact only because the salt is a
function of the DISTINCT value; the law test drives skewed inputs
(one key holds 90% of rows) through every (num_salts, blocks) layout
and demands byte-equality with the unsalted pandas reference, then
checks the salt actually spreads the hot key across buckets (the
whole point of the operator).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_ray.functions.skew import _splitmix64, salted_distinct_count


def _mk(n=20_000, seed=11):
    rng = np.random.default_rng(seed)
    # heavy skew: key 0 gets ~90% of rows
    key = np.where(rng.random(n) < 0.9, 0,
                   rng.integers(1, 6, n)).astype(np.int64)
    val = rng.integers(0, 3_000, n).astype(np.int64)
    return pd.DataFrame({"k": key, "v": val})


@pytest.mark.parametrize("num_salts,blocks", [(1, 1), (4, 8), (16, 8)])
def test_salted_distinct_equals_reference(ray_session, num_salts, blocks):
    df = _mk()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(blocks)
    got = (salted_distinct_count(ds, "k", "v", num_salts=num_salts)
           .sort("k").to_pandas().reset_index(drop=True))
    want = (df.groupby("k")["v"].nunique().rename("n_distinct")
            .reset_index().astype({"n_distinct": "int64"}))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_salt_spreads_hot_key():
    # the hot key's distinct values must spread over ALL buckets —
    # otherwise the salted plan degenerates back to one reducer
    vals = np.arange(3_000, dtype=np.int64)
    buckets = _splitmix64(vals) % np.uint64(16)
    counts = np.bincount(buckets.astype(np.int64), minlength=16)
    assert (counts > 0).all()
    assert counts.max() < 3 * counts.mean()
