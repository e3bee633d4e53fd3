"""BM25 corpus ranking (two-pass partial+final) + fit_html/pretty-print."""

import math

from crawl4ai_ray.functions.textutils import (
    fast_format_html,
    preprocess_html_for_schema,
)
from crawl4ai_ray.pipelines.analysis import bm25_rank

SF = "/root/testdata/sf0.001"


def test_bm25_rank_matches_local_computation(ray_session):
    import collections

    import pyarrow.parquet as pq

    query = "window batch stream"
    got = bm25_rank(SF, query=query, k=10).to_pandas()
    assert len(got) == 10
    # local single-process BM25 with the same law
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))
    terms = query.split()
    n = len(docs)
    df = {w: sum(1 for _, tx in docs if w in set(tx.lower().split()))
          for w in terms}
    avgdl = sum(len(tx.split()) for _, tx in docs) / n
    idf = {w: math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5)) for w in terms}

    def score(tx):
        tf = collections.Counter(tx.lower().split())
        dl = len(tx.split())
        s = 0.0
        for w in terms:
            f = tf.get(w, 0)
            if f:
                s += idf[w] * (f * 2.2) / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        return round(s, 6)

    want = sorted(((score(tx), -d) for d, tx in docs), reverse=True)[:10]
    want_ids = [-d for _, d in want]
    assert list(got["doc_id"]) == want_ids
    assert abs(got["bm25"].iloc[0] - want[0][0]) < 1e-5


def test_preprocess_html_for_schema():
    html = '<div data-x="' + "a" * 300 + '"><p>' + "t" * 600 + "</p></div>"
    out = preprocess_html_for_schema(html)
    assert len(out) < len(html)
    assert 'data-x="' + "a" * 200 + '..."' in out
    assert "t" * 500 + "..." in out
    assert preprocess_html_for_schema("") == ""


def test_fast_format_html():
    out = fast_format_html("<div><p>a</p><p>b</p></div>")
    lines = out.splitlines()
    assert lines[0] == "<div>"
    assert lines[1].startswith("  <p>")
    assert out.count("\n") >= 4
