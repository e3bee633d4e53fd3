"""Laws for the changelog/CDC family (pipelines/cdc.py).

- ``sorted_latest_wins`` must equal the QUALIFY row_number()=1 result
  regardless of block layout: runs that span block boundaries are the
  failure mode, so the law test forces MANY small blocks over keys
  with up to 8 versions each (every block boundary lands inside some
  run) and checks byte-equality against the pandas reference.
- The synthetic changelog is deterministic: same sf_dir -> same rows.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_ray.pipelines import cdc

SF = "/root/testdata/sf0.001"


def _ref_latest(df: pd.DataFrame, key: str, order: str) -> pd.DataFrame:
    return (df.sort_values([key, order])
            .groupby(key, as_index=False).tail(1)
            .sort_values(key).reset_index(drop=True))


@pytest.mark.parametrize("blocks", [1, 7, 64])
def test_sorted_latest_wins_block_layout_invariant(ray_session, blocks):
    rng = np.random.default_rng(7)
    n_keys, reps = 400, 8
    keys = np.repeat(np.arange(n_keys), reps)
    ver = np.tile(np.arange(1, reps + 1), n_keys)
    # drop a random subset so run lengths vary 1..8
    keep = rng.random(len(keys)) < 0.7
    keep[::reps] = True  # every key keeps at least version 1
    df = pd.DataFrame({
        "k": keys[keep], "v": ver[keep],
        "payload": rng.integers(0, 1 << 30, keep.sum()),
        "tag": np.array(["s%d" % (x % 13) for x in ver[keep]]),
    })
    # shuffle rows so the input is NOT pre-sorted
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(blocks)
    got = (cdc.sorted_latest_wins(ds, "k", "v")
           .sort("k").to_pandas().reset_index(drop=True))
    want = _ref_latest(df, "k", "v")[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_upsert_latest_matches_reference_semantics(ray_session):
    got = cdc.orders_upsert_latest(SF).to_pandas()
    # keys divisible by 21 end at v3/'V', by 7 only at v2/'U', rest v1
    k = got["o_orderkey"].to_numpy()
    v = got["version"].to_numpy()
    assert (v[k % 21 == 0] == 3).all()
    assert (v[(k % 7 == 0) & (k % 21 != 0)] == 2).all()
    assert (v[k % 7 != 0] == 1).all()
    # exactly one row per key
    assert len(got) == got["o_orderkey"].nunique()


def test_scd2_intervals_chain(ray_session):
    h = cdc.orders_scd2(SF).to_pandas()
    # per key: versions contiguous from 1, intervals chain, exactly
    # one current row whose eff_to is the open sentinel
    for _, g in h.groupby("o_orderkey"):
        g = g.sort_values("version")
        assert list(g["version"]) == list(range(1, len(g) + 1))
        assert (g["eff_from"].iloc[1:].to_numpy()
                == g["eff_to"].iloc[:-1].to_numpy()).all()
        assert g["is_current"].sum() == 1
        assert g["eff_to"].iloc[-1] == "9999-12-31"
        assert bool(g["is_current"].iloc[-1])

