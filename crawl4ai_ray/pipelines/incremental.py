"""Incremental (streaming-ingest) exact dedup — the daily-crawl-drop
shape: each arriving batch dedups against EVERYTHING already ingested,
not just itself, via a persistent content-hash state table. This is
what turns the one-shot ``exact_dedup`` into an operational pipeline
(CommonCrawl-style monthly drops, news feeds, re-crawls).

State layout: ``state_dir/ingest=K/`` parquet fragments of
(content_md5) with a ``_COMMIT`` marker each — crash-safe append-only
(an uncommitted fragment is ignored and rewritten on retry), the same
superstep-commit discipline as the crawl sink.

Scale shape: the new batch computes md5 map-side; the probe against
history is ONE hash ``left_anti`` join vs the state table read
column-pruned (at 100 TB the state is itself hash-partitioned parquet;
the join shuffles only (md5, doc_id) pairs, never text); within-batch
dups reduce through the exact_dedup groupby(min). No driver set, no
broadcast of the unbounded history.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min


def _with_md5(ds):
    def add(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((t or "").encode()).hexdigest()
                for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "content_md5", pa.array(md5s, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None)


def _committed_fragments(state_dir: str) -> list[str]:
    frags = []
    if os.path.isdir(state_dir):
        for d in sorted(os.listdir(state_dir)):
            p = os.path.join(state_dir, d)
            if os.path.exists(os.path.join(p, "_COMMIT")):
                frags.append(p)
    return frags


def ingest_dedup(docs_ds, state_dir: str, tag: str):
    """Dedup ``docs_ds`` (doc_id, text) against the state AND itself,
    append the survivors' hashes to the state under ``ingest=tag``,
    and return the surviving (doc_id, content_md5, ingest) Dataset —
    the hive dir name surfaces as an ``ingest`` provenance column.
    Re-running a committed tag is a no-op returning the recorded
    survivors."""
    from .dedup import _join_parts

    frag = os.path.join(state_dir, f"ingest={tag}")
    if os.path.exists(os.path.join(frag, "_COMMIT")):
        return rd.read_parquet(frag, file_extensions=["parquet"])

    hashed = _with_md5(docs_ds).select_columns(
        ["doc_id", "content_md5"])
    # within-batch: smallest doc_id per hash survives
    local = hashed.groupby("content_md5") \
        .aggregate(Min("doc_id", alias_name="doc_id"))

    frags = _committed_fragments(state_dir)
    if frags:
        hist = rd.read_parquet(frags, columns=["content_md5"],
                               file_extensions=["parquet"])
        # tiny histories must collapse to one partition (the
        # zero-column empty-partition join quirk)
        parts = (1 if hist.count() < 1024
                 else _join_parts(local, hist))
        fresh = local.join(hist, join_type="left_anti",
                           on=("content_md5",), num_partitions=parts)
    else:
        fresh = local

    os.makedirs(frag, exist_ok=True)
    fresh_mat = fresh.materialize()  # tiny: (md5, doc_id) survivors
    if fresh_mat.count() == 0:
        # a fully-duplicated batch must still leave a TYPED fragment —
        # an empty Ray write drops the schema and later reads of the
        # state (and the caller) would see a zero-column dataset
        import pyarrow.parquet as pq

        pq.write_table(pa.table({
            "content_md5": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64())}),
            os.path.join(frag, "empty.parquet"))
    else:
        # overwrite: a crashed (uncommitted) attempt leaves partial
        # files that an APPEND rerun would duplicate
        fresh_mat.write_parquet(frag, mode="overwrite")
    with open(os.path.join(frag, "_COMMIT"), "w") as f:
        f.write("ok\n")
    return rd.read_parquet(frag, file_extensions=["parquet"])


def incremental_dedup_demo(sf_dir: str, state_dir: str | None = None):
    """The ``doc_incremental_dedup`` query: three overlapping ingest
    windows over documents (overlaps guarantee cross-batch duplicates)
    — each batch dedups against all earlier state; output is every
    survivor as (batch, doc_id). SQL-oracle: global first-occurrence
    rank over (batch order, doc_id) per hash."""
    import shutil
    import tempfile

    owned = state_dir is None
    if owned:
        state_dir = tempfile.mkdtemp(prefix="c4r_ing_")
    try:
        windows = [("b0", 0, 200), ("b1", 100, 350), ("b2", 250, 500)]
        outs = []
        for tag, lo, hi in windows:
            docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"]) \
                .filter(expr=f"doc_id >= {lo} and doc_id < {hi}")
            surv = ingest_dedup(docs, state_dir, tag).to_pandas()
            surv["batch"] = tag
            outs.append(surv[["batch", "doc_id"]])
        out = pd.concat(outs).sort_values(["batch", "doc_id"]) \
            .reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)
    finally:
        if owned:
            shutil.rmtree(state_dir, ignore_errors=True)
