"""Tokenized binary-shard export — the trainer handoff step: turn the
cleaned corpus into Megatron-style indexed binary shards (a ``.bin``
stream of token ids plus a ``.idx`` of document boundaries) that a
data loader can mmap without touching parquet or a tokenizer at train
time.

Format (little-endian):
- ``shard-K.bin`` — the shard's documents' token ids, concatenated,
  uint32.
- ``shard-K.idx`` — int64 array: [n_docs, doc_id*n_docs,
  offset*(n_docs+1)] where offsets index token positions in the .bin
  (offset[i]..offset[i+1] is document i's id range).

Determinism: token ids come from the corpus vocabulary in sorted
order (no RNG, no insertion-order dependence); shard membership and
in-shard order follow the shuffle_shards md5 law — two runs (or two
engines) produce byte-identical files.

Scale shape: the vocabulary reduces through per-batch distinct
partials into one groupby (Heaps-law bounded) and broadcasts once;
shard writers run as ``groupby(shard).map_groups`` — ONE writer task
per shard, which is exactly Megatron's preprocessing parallelism
(size n_shards so one shard fits a worker: tokens-per-shard ≈
corpus/n_shards). The driver sees only the k-row manifest.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.tokenizers import load_tokenizer
from .corpus import _read


def export_tokenized_shards(sf_dir: str, out_dir: str,
                            n_shards: int = 4,
                            tokenizer: str = "whitespace",
                            seed: int = 7) -> pa.Table:
    """Write shard-K.bin/.idx under ``out_dir``; returns the manifest
    (shard_id, n_docs, n_tokens, bin_crc32)."""
    os.makedirs(out_dir, exist_ok=True)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tok = load_tokenizer(tokenizer)

    def vocab_partial(batch: pa.Table) -> pa.Table:
        seen = set()
        for t in batch.column("text").to_pylist():
            seen.update(tok.tokenize(t))
        return pa.table({"w": pa.array(sorted(seen), pa.string()),
                         "_one": pa.array([1] * len(seen), pa.int64())})

    from ray.data.aggregate import Max

    vocab_df = docs.map_batches(vocab_partial, batch_format="pyarrow",
                                batch_size=8192) \
        .groupby("w").aggregate(Max("_one", alias_name="_one")) \
        .to_pandas()
    vocab = pd.Index(np.sort(vocab_df["w"].to_numpy()))
    vref = ray.put(vocab)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hv = np.array(
            [int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8],
                 16) for i in ids], np.int64)
        return batch.append_column("hv", pa.array(hv)) \
            .append_column("shard_id", pa.array(hv % n_shards))

    sharded = docs.map_batches(assign, batch_format="pyarrow",
                               batch_size=8192)

    def write_shard(g: pd.DataFrame, vref=vref, out_dir=out_dir,
                    tokenizer=tokenizer) -> pd.DataFrame:
        vocab = ray.get(vref)
        tk = load_tokenizer(tokenizer)
        g = g.sort_values(["hv", "doc_id"]).reset_index(drop=True)
        sid = int(g["shard_id"].iloc[0])
        ids_all, offsets = [], [0]
        for t in g["text"]:
            tid = vocab.get_indexer(np.asarray(tk.tokenize(t), object))
            ids_all.append(tid.astype(np.uint32))
            offsets.append(offsets[-1] + len(tid))
        binb = (np.concatenate(ids_all) if ids_all
                else np.empty(0, np.uint32)).tobytes()
        idx = np.concatenate([
            [np.int64(len(g))],
            g["doc_id"].to_numpy(np.int64),
            np.asarray(offsets, np.int64)]).tobytes()
        with open(os.path.join(out_dir, f"shard-{sid:04d}.bin"),
                  "wb") as f:
            f.write(binb)
        with open(os.path.join(out_dir, f"shard-{sid:04d}.idx"),
                  "wb") as f:
            f.write(idx)
        return pd.DataFrame({
            "shard_id": [np.int64(sid)],
            "n_docs": [np.int64(len(g))],
            "n_tokens": [np.int64(offsets[-1])],
            "bin_crc32": [np.int64(zlib.crc32(binb))],
        })

    return sharded.groupby("shard_id") \
        .map_groups(write_shard, batch_format="pandas") \
        .sort("shard_id")


def read_tokenized_shard(out_dir: str, shard_id: int):
    """mmap-style reader for the exported format: returns
    (doc_ids int64[n], list of uint32 token-id arrays)."""
    with open(os.path.join(out_dir, f"shard-{shard_id:04d}.idx"),
              "rb") as f:
        idx = np.frombuffer(f.read(), np.int64)
    n = int(idx[0])
    doc_ids = idx[1:1 + n]
    offsets = idx[1 + n:]
    with open(os.path.join(out_dir, f"shard-{shard_id:04d}.bin"),
              "rb") as f:
        binb = np.frombuffer(f.read(), np.uint32)
    toks = [binb[offsets[i]:offsets[i + 1]] for i in range(n)]
    return doc_ids, toks
