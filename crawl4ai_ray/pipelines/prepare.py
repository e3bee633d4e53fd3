"""End-to-end training-data preparation — the flagship COMPOSITION of
the corpus-cleaning layer (the FineWeb/C4 recipe shape: filter → scrub
→ dedup → model-based filter → shard): every stage is one of this
repo's individually-gated operators, chained as ONE lazy Ray Dataset
pipeline, and the whole chain is DuckDB-recomputable so the composed
result carries a rows+schema+hash gate (`corpus_prepare`), not just
per-stage gates.

Stages (all streaming, one pass over the text):
1. token count + PII scrub — vectorized Arrow kernels
   (split_pattern_regex length; the corpus.PII_* RE2 chain on the raw
   text) in a single stateless map_batches;
2. min-words filter (C4's shortest-page rule);
3. exact dedup on md5(clean_text), smallest doc_id survives — one
   groupby(min) plus one doc_id hash join, the exact_dedup shape;
4. perplexity filter: join corpus.lm_perplexity (bigram LM trained on
   the trusted slice) and keep ppl <= cutoff — CCNet's keep-fluent
   rule (comparisons happen on the law-rounded 2dp value, so both
   engines agree exactly);
5. shard assignment via the shuffle_shards md5 law; per-shard stats
   reduce through per-batch partials into one tiny groupby.

Scale shape: no stage materializes the corpus — the only exchanges are
the dedup groupby/join, the ppl doc_id join, and the final k-row stats
groupby; text leaves the pipeline at stage 3 (only ids/counters flow
on). With ``out_dir`` set, the kept documents also stream to
shard-partitioned parquet (resumable: reruns skip when the _SUCCESS
marker exists; Ray retries individual write tasks on failure).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min, Sum

from .corpus import PII_EMAIL, PII_IPV4, PII_PHONE, lm_perplexity


def prepare_training_data(sf_dir: str, min_words: int = 12,
                          ppl_cutoff: float = 45.0, n_shards: int = 8,
                          seed: int = 7, out_dir: str | None = None,
                          docs=None, train_source: str = "src0"):
    """Returns the per-shard stats table (shard_id, n_docs, sum_words)
    for the surviving documents; optionally writes the cleaned corpus
    to ``out_dir`` partitioned by shard. Pass ``docs`` (a (doc_id,
    text, source) Dataset — e.g. crawled markdown) to run the same
    chain over any corpus; ``train_source`` selects the trusted slice
    the perplexity model trains on."""
    import pyarrow.compute as pc

    from .dedup import _join_parts

    ppl_docs = docs
    if docs is None:
        docs = _readdocs(sf_dir)

    def scrub_count(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column("text"), pa.string())
        low = pc.utf8_lower(txt)
        n_words = pc.cast(pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(low), r"\s+")), pa.int64())
        clean = pc.replace_substring_regex(txt, PII_EMAIL, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, PII_IPV4, "<IP>")
        clean = pc.replace_substring_regex(clean, PII_PHONE, "<PHONE>")
        md5s = [hashlib.md5(s.encode()).hexdigest()
                for s in clean.to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "clean_text": clean,
            "n_words": n_words,
            "content_md5": pa.array(md5s, pa.string()),
        })

    staged = docs.map_batches(scrub_count, batch_format="pyarrow",
                              batch_size=None) \
        .filter(expr=f"n_words >= {min_words}")

    survivors = staged.select_columns(["content_md5", "doc_id"]) \
        .groupby("content_md5") \
        .aggregate(Min("doc_id", alias_name="doc_id")) \
        .select_columns(["doc_id"])
    deduped = staged.join(survivors, join_type="inner", on=("doc_id",),
                          num_partitions=_join_parts(staged, survivors))

    ppl = lm_perplexity(sf_dir, train_source=train_source,
                        docs=ppl_docs).select_columns(["doc_id", "ppl"])
    kept = deduped.join(ppl, join_type="inner", on=("doc_id",),
                        num_partitions=_join_parts(deduped, ppl)) \
        .filter(expr=f"ppl <= {ppl_cutoff}")

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hv = np.array(
            [int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8],
                 16) for i in ids], np.int64)
        return batch.append_column("shard_id", pa.array(hv % n_shards))

    sharded = kept.map_batches(assign, batch_format="pyarrow",
                               batch_size=8192)

    if out_dir is not None:
        import os

        marker = os.path.join(out_dir, "_SUCCESS")
        if not os.path.exists(marker):
            # stream the corpus to the sink, then compute stats FROM
            # the written parquet — materializing `sharded` to feed
            # both consumers would pin the whole cleaned corpus in the
            # object store at scale
            sharded.write_parquet(out_dir, partition_cols=["shard_id"],
                                  mode="overwrite")
            with open(marker, "w") as f:
                f.write("ok\n")
        sharded = rd.read_parquet(
            out_dir, columns=["shard_id", "n_words"],
            file_extensions=["parquet"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            # hive-partitioned reads surface shard_id as string —
            # normalize so both sink and sinkless paths emit int64
            "shard_id": pd.to_numeric(
                batch.column("shard_id").to_pandas()).astype(np.int64),
            "_n": np.int64(1),
            "_w": batch.column("n_words")
                .to_numpy(zero_copy_only=False)})
        g = df.groupby("shard_id", as_index=False).agg(
            _n=("_n", "sum"), _w=("_w", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return sharded.map_batches(stats_partial, batch_format="pyarrow",
                               batch_size=8192) \
        .groupby("shard_id") \
        .aggregate(Sum("_n", alias_name="n_docs"),
                   Sum("_w", alias_name="sum_words")) \
        .sort("shard_id")


def _readdocs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
