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


# ---------------------------------------------------------------------------
# WebDataset tar shards — the multimodal trainer handoff format
# ---------------------------------------------------------------------------


def wds_export(docs_ds, out_dir: str, n_shards: int = 8,
               url_col: str = "url", text_col: str = "markdown"):
    """WebDataset-style tar shard export (the img2dataset/WebDataset
    convention a multimodal loader streams): per document a
    ``{key}.md`` text entry and a ``{key}.json`` metadata entry
    (url + the interleaved spans' media refs when a ``spans`` column
    is present), grouped into ``shard-K.tar`` files.

    Determinism (the shuffle_shards md5 law): shard =
    md5('url:0') % n_shards, key = md5(url)[:16], entries sorted by
    key, tar mtime/uid/gid pinned to 0 — two runs or two engines
    produce byte-identical tars.

    Scale shape: ONE writer task per shard via
    ``groupby(shard).map_groups`` (the Megatron-export parallelism;
    size n_shards so a shard fits a worker). Returns the k-row
    manifest (shard, file, n_docs, n_bytes)."""
    import io
    import json
    import tarfile

    os.makedirs(out_dir, exist_ok=True)
    has_spans = "spans" in docs_ds.schema().names
    cols = [url_col, text_col] + (["spans"] if has_spans else [])
    ds = docs_ds.select_columns(cols)

    def assign(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        sh = [int(hashlib.md5(f"{u}:0".encode()).hexdigest()[:8], 16)
              % n_shards for u in urls]
        return batch.append_column("shard",
                                   pa.array(sh, pa.int64()))

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g.column("shard")[0].as_py())
        urls = g.column(url_col).to_pylist()
        texts = g.column(text_col).to_pylist()
        spans = g.column("spans").to_pylist() if has_spans \
            else [None] * len(urls)
        rows = sorted(
            (hashlib.md5(u.encode()).hexdigest()[:16], u, t, sp)
            for u, t, sp in zip(urls, texts, spans))
        path = os.path.join(out_dir, f"shard-{shard:04d}.tar")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for key, u, t, sp in rows:
                meta = {"url": u}
                if sp is not None:
                    meta["media_refs"] = [s["media_ref"] for s in sp
                                          if s.get("media_ref")]
                for name, payload in (
                        (f"{key}.md", (t or "").encode()),
                        (f"{key}.json",
                         json.dumps(meta, sort_keys=True).encode())):
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(payload))
        data = buf.getvalue()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "file": pa.array([path], pa.string()),
            "n_docs": pa.array([len(rows)], pa.int64()),
            "n_bytes": pa.array([len(data)], pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("shard").map_groups(write_shard,
                                     batch_format="pyarrow")


def wds_read(in_dir: str):
    """Read a wds_export directory back into a Dataset of
    (key, url, text, n_media_refs) — distributed tar parsing inside
    map_batches over read_binary_files."""
    import io
    import json
    import tarfile

    files = rd.read_binary_files(in_dir, file_extensions=["tar"])

    def parse(batch: pa.Table) -> pa.Table:
        keys, urls, texts, nrefs = [], [], [], []
        for data in batch.column("bytes").to_pylist():
            with tarfile.open(fileobj=io.BytesIO(data)) as tar:
                members = {m.name: tar.extractfile(m).read()
                           for m in tar.getmembers()}
            for name, payload in members.items():
                if not name.endswith(".json"):
                    continue
                key = name[:-5]
                meta = json.loads(payload)
                keys.append(key)
                urls.append(meta["url"])
                texts.append(members[f"{key}.md"].decode())
                nrefs.append(len(meta.get("media_refs", [])))
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "n_media_refs": pa.array(nrefs, pa.int64()),
        })

    return files.map_batches(parse, batch_format="pyarrow")
