"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 and compare SQL-checkable ones against the DuckDB oracle
(row-count + column names + order-insensitive values)."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(ray_session, name):
    q = entry_mod.queries()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(_duck(entry_mod.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-6)


def test_rows_only_queries_run(ray_session):
    qs = entry_mod.queries()
    rows_only = [k for k in qs if k not in entry_mod.oracle_sql()
                 and not k.startswith("crawl_")]
    for name in rows_only:
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None, name
        # an all-filtered pipeline may legitimately return an empty frame
        assert len(df.columns) > 0 or len(df) == 0, name


def test_connected_components():
    from crawl4ai_ray.pipelines.dedup import connected_components

    labels = connected_components(
        [(1, 2), (2, 3), (7, 8), (10, 10)], [1, 2, 3, 5, 7, 8, 10]
    )
    assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 8: 7, 10: 10}
    # transitive chain across pair order
    labels2 = connected_components([(5, 3), (1, 5), (9, 1)], [1, 3, 5, 9])
    assert set(labels2.values()) == {1}


def test_minhash_dedup_survivors(ray_session):
    from crawl4ai_ray.pipelines.dedup import minhash_dedup_survivors

    t = minhash_dedup_survivors(SF_DIR).to_pandas()
    assert len(t) == 500
    # canonical ids are component minima and survivors are exactly them
    assert (t[t.survivor].doc_id == t[t.survivor].canonical_id).all()
    assert (t.canonical_id <= t.doc_id).all()
    surv = set(t[t.survivor].doc_id)
    assert set(t.canonical_id) <= surv


def test_lsh_recall_on_clustered_vectors(ray_session, tmp_path):
    """LSH ANN recall gate on data where ANN is meaningful (clustered
    vectors; the sf embeddings are near-uniform random, the worst case for
    any LSH). Recall >= 0.9 of brute-force top-10 required."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl4ai_ray.pipelines.similarity import brute_force_topk, lsh_topk

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((10, 64)) * 3
    vecs = np.concatenate(
        [c + rng.standard_normal((50, 64)) for c in centers]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)
    exact = set(_to_pandas(brute_force_topk(sf, k=10))["vec_id"])
    approx = set(_to_pandas(lsh_topk(sf, k=10))["vec_id"])
    assert len(exact) == 10
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall}"


def test_entry_smoke(ray_session):
    ds = entry_mod.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert {"url", "depth", "seq", "spans"} <= set(df.columns)


def test_registry_consistency():
    """Every oracle key has a queries() entry; the registry is SQL-first
    (any driver sample prefix maximizes hard-gate coverage); no dupes."""
    qs = list(entry_mod.queries())
    sql = set(entry_mod.oracle_sql())
    assert sql <= set(qs)
    assert len(qs) == len(set(qs))
    first_nonsql = next(i for i, k in enumerate(qs) if k not in sql)
    assert all(k in sql for k in qs[:first_nonsql])
    assert not any(k in sql for k in qs[first_nonsql:])
