"""Laws for functions/sortagg.py — the sort + per-block run-length
keyed reduction that replaces Ray's per-group Aggregate finisher on
high-cardinality keys. Ground truth: pandas groupby on the same rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from crawl4ai_ray.functions.sortagg import (sorted_distinct_keys,
                                            sorted_keyed_count,
                                            sorted_keyed_sum)


def _ds(df: pd.DataFrame, n_blocks: int):
    import ray.data as rd

    # many small blocks so first/last-run boundary handling engages
    tables = [pa.Table.from_pandas(part, preserve_index=False)
              for part in np.array_split(df, n_blocks)]
    return rd.from_arrow(tables)


@pytest.mark.parametrize("how", ["sum", "max", "min"])
def test_keyed_reduction_matches_pandas(ray_session, how):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 400, n),          # ~12 rows per key
        "a": rng.normal(size=n),
        "b": rng.integers(-50, 50, n).astype(np.int64),
    })
    got = sorted_keyed_sum(_ds(df, 16), "k", ["a", "b"], how=how) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)[["a", "b"]].agg(how) \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"k": "int64"}), want,
                                  check_dtype=False, atol=1e-9)


def test_singleton_keys_and_skewed_run(ray_session):
    # one giant run spanning several blocks + singleton tail keys
    df = pd.DataFrame({
        "k": np.concatenate([np.zeros(3000, np.int64),
                             np.arange(1, 501)]),
        "a": np.ones(3500),
    })
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    got = sorted_keyed_sum(_ds(df, 12), "k", ["a"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got.loc[0, "a"] == 3000.0          # the block-spanning run
    assert (got.loc[1:, "a"] == 1.0).all()
    assert len(got) == 501


def test_count_and_distinct(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 100, 2000)})
    got = sorted_keyed_count(_ds(df, 8), "k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False).size() \
        .rename(columns={"size": "_n"})
    assert got["k"].tolist() == want["k"].tolist()
    assert got["_n"].tolist() == want["_n"].tolist()
    dk = sorted(sorted_distinct_keys(_ds(df, 8), "k")
                .to_pandas()["k"].tolist())
    assert dk == sorted(df["k"].unique().tolist())


def test_empty_and_tiny_inputs(ray_session):
    empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "a": pd.Series([], dtype="float64")})
    got = sorted_keyed_sum(_ds(empty, 1), "k", ["a"]).to_pandas()
    assert len(got) == 0
    one = pd.DataFrame({"k": [42], "a": [2.5]})
    got = sorted_keyed_sum(_ds(one, 1), "k", ["a"]).to_pandas()
    assert got["k"].tolist() == [42] and got["a"].tolist() == [2.5]
