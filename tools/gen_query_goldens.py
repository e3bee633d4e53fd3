#!/usr/bin/env python
"""Freeze golden outputs for deterministic non-SQL-expressible queries.

These queries have no DuckDB oracle (minhash/simhash signatures, LSH
probes, fake-codec decodes, markdown fidelity, crawl-derived stats) but
are fully deterministic for a given input: seeded hash families, pure
per-row transforms, or synthetic-site crawls. This writes their sf0.001
outputs to tests/golden/query/ as parquet; pytest gates the live
pipelines against these snapshots (tests/test_query_goldens.py),
upgrading each from rows-only to a hard equality check. Regenerate ONLY
after an intentional law change:

    python tools/gen_query_goldens.py
"""

import hashlib
import os
import sys

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# every golden-gated query; canonical order = stable sort by all scalar
# columns (list-valued columns ride along and are compared elementwise)
GOLDEN_QUERIES = [
    "simhash_table",
    "doc_embeddings",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "minhash_dedup_survivors",
    "doc_quality",
    "bm25_rank",
    "cosine_near_pairs",
    "cosine_near_pairs_lsh",
    "ann_topk_lsh",
    "media_decode",
    "media_frame_sample",
    "doc_semantic_clusters",
    "crawl_span_kinds",
    "crawl_fit_markdown",
    "crawl_markdown_compat",
    "seed_sitemaps",
    "doc_llm_blocks",
    "crawl_adaptive",
    "crawl_adaptive_embedding",
    "ann_topk_ivf",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "embedding_kmeans",
    "distinct_users_hll",
    "doc_llm_tables",
    "crawl_pagerank",
    "crawl_hits",
    "crawl_host_stats",
    "seed_cc",
    "pdf_pages",
    "link_preview",
    "crawl_rendered",
    "media_resize",
    "doc_quality_classifier",
    "media_ann_topk",
    "crawl_corpus_prepare",
    "events_user_ewma",
    "crawl_anchor_texts",
    "media_phash_dedup",
    "corpus_bpe_merges",
    "doc_bpe_subwords",
    # probed bit-exact across fresh sessions AND parallelism levels
    # (4 vs 16 cpus) before gating — deterministic merge orders
    "embedding_pca",
    "events_value_tdigest",
    "corpus_top_terms_mg",
]


def canonicalize(res):
    """Query result -> pandas frame in a deterministic row order (stable
    sort by every scalar column)."""
    import pandas as pd

    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    keys = [c for c in df.columns
            if df[c].dtype != object
            or (len(df) and isinstance(df[c].iloc[0], str))]
    if len(df) and keys:
        df = df.sort_values(keys, kind="mergesort")
    return df.reset_index(drop=True)


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    qs = entry.queries()
    out_dir = "tests/golden/query"
    os.makedirs(out_dir, exist_ok=True)
    names = sys.argv[1:] or GOLDEN_QUERIES
    unknown = [n for n in names if n not in GOLDEN_QUERIES]
    if unknown:
        raise SystemExit(f"not in GOLDEN_QUERIES: {unknown}")
    for name in names:
        tbl = canonicalize(qs[name]("/root/testdata/sf0.001"))
        path = os.path.join(out_dir, f"{name}_sf0001.parquet")
        pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                       path)
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()[:16]
        print(f"{name}: {len(tbl)} rows -> {path} ({digest})")
    ray.shutdown()


if __name__ == "__main__":
    main()
