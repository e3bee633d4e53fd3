"""Hard equality gates for deterministic non-SQL-expressible queries:
live pipeline output must equal the committed golden parquet exactly
(tools/gen_query_goldens.py regenerates after intentional law changes)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _run(name):
    import __ray_entry__ as entry

    res = entry.queries()[name]("/root/testdata/sf0.001")
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("name", ["simhash_table", "doc_embeddings"])
def test_query_matches_golden(ray_session, name):
    got = _run(name)
    want = pq.read_table(
        f"tests/golden/query/{name}_sf0001.parquet").to_pandas()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for col in want.columns:
        g, w = got[col], want[col]
        if g.dtype == object and hasattr(g.iloc[0], "__len__") \
                and not isinstance(g.iloc[0], str):
            # list-valued columns (embeddings): elementwise exact
            for a, b in zip(g, w):
                assert list(a) == list(b)
        else:
            pd.testing.assert_series_equal(g, w, check_names=False)
