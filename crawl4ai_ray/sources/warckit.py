"""WARC archive sink + source for crawl documents.

The standard web-archive interchange format (ISO 28500 / WARC 1.1),
written from scratch on stdlib gzip: the engine's crawl output has no
raw-HTTP column by design (fetch → interleaved spans + markdown in one
fused pass), so records are WARC ``conversion`` records — the type the
spec defines for transformed content — carrying the page's markdown
payload. This is the export a corpus consumer feeds to standard WARC
tooling, and the re-import path proves byte fidelity.

Reference surface: the reference exports raw results via its Docker
API / file sinks only (no WARC writer exists there — this is one of
the beyond-the-reference capabilities, like the dedup/sketch layers).

Scale shape:
- ``warc_export``: one ``.warc.gz`` file per input BLOCK, written
  task-side inside ``map_batches`` (the engine's task-side-sink
  pattern — no driver funnel, resumable per file); file names are
  deterministic (min url_hash of the block), so a re-run overwrites
  rather than duplicates.
- records use per-record gzip members (the WARC convention that keeps
  archives seekable); stdlib gzip reads concatenated members
  transparently.
- ``warc_read``: ``read_binary_files`` over the directory →
  per-file record parsing inside ``map_batches`` — distributed,
  schema (url, payload, digest).

Determinism: WARC-Date is pinned to the epoch and WARC-Record-ID is
derived from md5(url) (no clock, no RNG — the repo's reproducibility
law), so export → read → hash is byte-stable across runs and engines.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa

_WARC_DATE = "1970-01-01T00:00:00Z"


def _record_bytes(url: str, payload: bytes) -> bytes:
    digest = hashlib.sha256(payload).hexdigest()
    rec_id = hashlib.md5(url.encode()).hexdigest()
    headers = (
        "WARC/1.1\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_WARC_DATE}\r\n"
        f"WARC-Record-ID: <urn:md5:{rec_id}>\r\n"
        f"WARC-Payload-Digest: sha256:{digest}\r\n"
        "Content-Type: text/markdown; charset=utf-8\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    )
    return headers.encode() + payload + b"\r\n\r\n"


def warc_export(docs_ds, out_dir: str,
                url_col: str = "url", text_col: str = "markdown"):
    """Write one ``part-<hex>.warc.gz`` per block; returns the manifest
    Dataset (file, n_records, n_bytes) — tiny, one row per block."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        urls = batch.column(url_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        tag = min(hashlib.md5(u.encode()).hexdigest()[:12]
                  for u in urls)
        path = os.path.join(out_dir, f"part-{tag}.warc.gz")
        n = 0
        buf = io.BytesIO()
        for u, t in zip(urls, texts):
            payload = (t or "").encode()
            # one gzip MEMBER per record — the WARC seekability
            # convention; members concatenate into one .warc.gz
            buf.write(gzip.compress(_record_bytes(u, payload),
                                    mtime=0))
            n += 1
        data = buf.getvalue()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"file": pa.array([path], pa.string()),
                         "n_records": pa.array([n], pa.int64()),
                         "n_bytes": pa.array([len(data)], pa.int64())})

    return docs_ds.map_batches(write_block, batch_format="pyarrow",
                               batch_size=None)


def parse_warc_bytes(data: bytes):
    """Yield (url, payload_bytes, declared_digest) from a .warc.gz
    byte string (concatenated gzip members or plain)."""
    raw = gzip.GzipFile(fileobj=io.BytesIO(data)).read() \
        if data[:2] == b"\x1f\x8b" else data
    pos = 0
    while pos < len(raw):
        head_end = raw.index(b"\r\n\r\n", pos)
        head = raw[pos:head_end].decode()
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields["content-length"])
        body_start = head_end + 4
        payload = raw[body_start:body_start + length]
        yield (fields["warc-target-uri"], payload,
               fields.get("warc-payload-digest", ""))
        pos = body_start + length + 4      # skip the \r\n\r\n trailer


def warc_read(in_dir: str):
    """Read a warc_export directory back into a Dataset of
    (url, payload: binary, declared_digest)."""
    import ray.data as rd

    files = rd.read_binary_files(in_dir, file_extensions=["gz"])

    def parse(batch: pa.Table) -> pa.Table:
        urls, payloads, digests = [], [], []
        for data in batch.column("bytes").to_pylist():
            for url, payload, digest in parse_warc_bytes(data):
                urls.append(url)
                payloads.append(payload)
                digests.append(digest)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "declared_digest": pa.array(digests, pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow")
