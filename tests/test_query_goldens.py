"""Hard equality gates for deterministic non-SQL-expressible queries:
live pipeline output must equal the committed golden parquet exactly
(tools/gen_query_goldens.py regenerates after intentional law changes).
Covers every rows-only query whose output is deterministic — seeded hash
families (minhash/simhash/LSH), pure per-row transforms (embeddings,
quality, fake-codec decode), and synthetic-site crawl derivatives."""

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _golden_names():
    import sys

    sys.path.insert(0, "tools")
    try:
        from gen_query_goldens import GOLDEN_QUERIES
    finally:
        sys.path.pop(0)
    return GOLDEN_QUERIES


def _run(name):
    import sys

    import __ray_entry__ as entry

    sys.path.insert(0, "tools")
    try:
        from gen_query_goldens import canonicalize
    finally:
        sys.path.pop(0)
    return canonicalize(entry.queries()[name]("/root/testdata/sf0.001"))


@pytest.mark.parametrize("name", _golden_names())
def test_query_matches_golden(ray_session, name):
    got = _run(name)
    want = pq.read_table(
        f"tests/golden/query/{name}_sf0001.parquet").to_pandas()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for col in want.columns:
        g, w = got[col], want[col]
        if g.dtype == object and len(g) and hasattr(g.iloc[0], "__len__") \
                and not isinstance(g.iloc[0], str):
            # list-valued columns (embeddings, tags): elementwise exact
            for a, b in zip(g, w):
                assert list(a) == list(b)
        else:
            pd.testing.assert_series_equal(g, w, check_names=False)
