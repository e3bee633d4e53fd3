"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool map_batches
stages.

The reference treats media as URL references plus optional raw bytes
(screenshot/pdf in CrawlResult, /root/reference/crawl4ai/models.py:138-140);
a training-data engine must carry the payloads themselves. Real codecs
(PIL/ffmpeg) are NOT available in this container, so the decode kernels are
STUBS over a deterministic fake container format (``FakeCodec``) — clearly
marked below; the Ray-side plumbing (schemas, batch sizing for large binary
rows, actor signatures, output layout) is real and tested. Swapping
``FakeCodec`` for PIL/ffmpeg is a per-kernel change.

Batch-size guidance: payloads here are ~4-64 KiB; real images are MBs —
size ``batch_size`` so batch_size × row_bytes × concurrency stays within
worker heap (the module defaults assume ≤1 MiB rows → batch_size 64).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

_MAGIC = b"FAKE"
_KINDS = ("image", "audio", "video")


class FakeCodec:
    """Deterministic stand-in for PIL/ffmpeg: a tiny container format.

    Layout: magic(4) kind(1) width(u16) height(u16) n_frames(u16)
    sample_rate(u32) seed(u64) | body = xorshift byte stream.
    """

    @staticmethod
    def encode(kind: str, seed: int, *, width: int = 0, height: int = 0,
               n_frames: int = 1, sample_rate: int = 0,
               body_len: int = 4096) -> bytes:
        header = _MAGIC + struct.pack(
            "<BHHHIQ", _KINDS.index(kind), width, height, n_frames,
            sample_rate, seed & 0xFFFFFFFFFFFFFFFF,
        )
        rng = np.random.default_rng(seed & 0xFFFFFFFF)
        return header + rng.integers(0, 256, size=body_len,
                                     dtype=np.uint8).tobytes()

    @staticmethod
    def decode(blob: bytes) -> dict:
        if blob[:4] != _MAGIC:
            raise ValueError("not a FAKE container — real decode would need "
                             "PIL/ffmpeg, unavailable in this environment")
        kind_i, w, h, nf, sr, seed = struct.unpack("<BHHHIQ", blob[4:23])
        return {
            "kind": _KINDS[kind_i],
            "width": int(w),
            "height": int(h),
            "n_frames": int(nf),
            "sample_rate": int(sr),
            "seed": int(seed),
            "body": blob[23:],
        }


def _media_row(i: int, seed: int = 42) -> tuple[str, bytes]:
    """One deterministic media item — pure in media_id, so any task can
    generate any slice of the corpus without driver state."""
    kind = _KINDS[i % 3]
    s = seed * 1_000_003 + i
    if kind == "image":
        blob = FakeCodec.encode(kind, s, width=64 + (i % 8) * 32,
                                height=64 + (i % 5) * 32, body_len=4096)
    elif kind == "audio":
        blob = FakeCodec.encode(kind, s, sample_rate=16000,
                                n_frames=100 + i % 50, body_len=8192)
    else:
        blob = FakeCodec.encode(kind, s, width=320, height=240,
                                n_frames=24 + i % 72, body_len=16384)
    return kind, blob


def _neardup_row(j: int, n: int, seed: int = 42,
                 every: int = 10) -> tuple[str, bytes]:
    """Planted near-dup j (media_id = n + j): base payload every*j with
    three body bytes XOR-flipped inside the dHash window."""
    kind, base = _media_row(every * j, seed)
    blob = bytearray(base)
    for off in (5, 25, 55):                        # inside body[:72]
        blob[23 + off] ^= 0x80
    return kind, bytes(blob)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus: media_id, kind, payload(binary), meta.

    Driver-side form — test scaffolding and small-n use only; the
    pipelines stream the same corpus task-side via ``media_dataset``."""
    ids, kinds, payloads = [], [], []
    for i in range(n):
        kind, blob = _media_row(i, seed)
        ids.append(i)
        kinds.append(kind)
        payloads.append(blob)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )


def media_dataset(n: int, seed: int = 42, *, with_neardups: bool = False,
                  every: int = 10, ids_per_block: int = 4096):
    """The media corpus as a task-side-generated Dataset: the driver
    holds only id ranges; every payload byte is produced inside
    ``map_batches`` workers (payloads are pure functions of media_id).
    This is the pipelines' input path — at 10x corpus scale the
    driver-side table form held ~1.5 GB of payload bytes on the driver;
    this form holds none. ids_per_block trades generation parallelism
    against downstream shuffle fan-in: 4096 ids ≈ 16–64 MB of payloads
    per block (inside the default block target) and measured 12.5 s vs
    26 s at 256-id blocks for the 55k-item phash pipeline — groupby
    cost tracks input block count, not row count."""
    import ray.data as rd

    n_dups = ((n + every - 1) // every) if with_neardups else 0

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        kinds, payloads = [], []
        for i in ids:
            if i < n:
                kind, blob = _media_row(int(i), seed)
            else:
                kind, blob = _neardup_row(int(i) - n, n, seed, every)
            kinds.append(kind)
            payloads.append(blob)
        return pa.table({
            "media_id": pa.array(ids.astype(np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        })

    return rd.range(n + n_dups, override_num_blocks=max(
        1, (n + n_dups) // ids_per_block)).map_batches(
            gen, batch_format="pyarrow", batch_size=ids_per_block)


class MediaDecodeStage:
    """Actor-pool stage: decode payload headers → typed metadata columns.

    __init__ is where a real implementation loads PIL/ffmpeg once per
    actor; __call__ decodes a batch. STUB: decodes the FakeCodec container;
    non-FAKE payloads raise (the honest unavailable-codec path)."""

    def __init__(self, strict: bool = False):
        self.codec = FakeCodec()
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, frames, rates, checksums = [], [], [], [], []
        for blob in batch.column("payload").to_pylist():
            try:
                d = self.codec.decode(blob)
            except (ValueError, struct.error, IndexError):
                if self.strict:
                    raise
                d = {"width": -1, "height": -1, "n_frames": -1,
                     "sample_rate": -1, "body": b""}
            widths.append(d["width"])
            heights.append(d["height"])
            frames.append(d["n_frames"])
            rates.append(d["sample_rate"])
            checksums.append(
                hashlib.blake2b(d["body"], digest_size=8).hexdigest()
            )
        return (
            batch.drop_columns(["payload"])
            .append_column("width", pa.array(widths, type=pa.int32()))
            .append_column("height", pa.array(heights, type=pa.int32()))
            .append_column("n_frames", pa.array(frames, type=pa.int32()))
            .append_column("sample_rate", pa.array(rates, type=pa.int32()))
            .append_column("checksum", pa.array(checksums, type=pa.string()))
        )


class MediaFeatureStage:
    """Actor-pool stage: payload → 16-dim float feature vector (STUB: bytes
    of a keyed blake2b digest, scaled; a real stage would run a vision/audio
    model loaded once in __init__). Output feeds the similarity pipelines."""

    DIM = 16

    def __init__(self):
        self.dim = self.DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob in batch.column("payload").to_pylist():
            dig = hashlib.blake2b(blob, digest_size=self.dim).digest()
            feats.append(
                (np.frombuffer(dig, dtype=np.uint8).astype(np.float32)
                 / 127.5 - 1.0).tolist()
            )
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32()))
        )


class ImageResizeStage:
    """Actor-pool stage: deterministic 'resize' of image payloads — real
    plumbing (reads header, rewrites container at target dims), stub math
    (body re-seeded; a real kernel would interpolate pixels)."""

    def __init__(self, target_width: int = 224, target_height: int = 224):
        self.tw = target_width
        self.th = target_height

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob, kind in zip(batch.column("payload").to_pylist(),
                              batch.column("kind").to_pylist()):
            if kind != "image":
                out.append(blob)
                continue
            d = FakeCodec.decode(blob)
            out.append(
                FakeCodec.encode("image", d["seed"], width=self.tw,
                                 height=self.th,
                                 body_len=max(64, self.tw * self.th // 48))
            )
        return batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(out, type=pa.large_binary()),
        )


class FrameSampleStage:
    """Explode stage: sample every ``stride``-th frame of video payloads →
    one row per sampled frame (media_id, frame_idx, frame_checksum).
    Non-video rows are dropped. Output row count is data-dependent, the
    flat_map shape."""

    def __init__(self, stride: int = 8):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, sums = [], [], []
        for mid, kind, blob in zip(batch.column("media_id").to_pylist(),
                                   batch.column("kind").to_pylist(),
                                   batch.column("payload").to_pylist()):
            if kind != "video":
                continue
            d = FakeCodec.decode(blob)
            body = d["body"]
            nf = max(1, d["n_frames"])
            frame_len = max(1, len(body) // nf)
            for fi in range(0, nf, self.stride):
                frame = body[fi * frame_len:(fi + 1) * frame_len]
                ids.append(mid)
                idxs.append(fi)
                sums.append(
                    hashlib.blake2b(frame, digest_size=8).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame_checksum": pa.array(sums, type=pa.string()),
            }
        )


def media_pipeline(sf_dir: str, *, n: int | None = None):
    """End-to-end multimodal demo over a deterministic media corpus sized
    from the documents table: decode metadata for every payload."""
    import pyarrow.parquet as pq

    if n is None:
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = media_dataset(n)
    return ds.map_batches(MediaDecodeStage, batch_format="pyarrow",
                          batch_size=64, concurrency=2)


def frame_sample_pipeline(sf_dir: str, *, n: int | None = None,
                          stride: int = 8):
    import pyarrow.parquet as pq

    if n is None:
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = media_dataset(n)
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_kwargs={"stride": stride},
                          batch_format="pyarrow", batch_size=64,
                          concurrency=2)


def resize_pipeline(sf_dir: str, *, n: int | None = None,
                    target_width: int = 224, target_height: int = 224):
    """The `media_resize` query: decode → resize (actor pool) → verify by
    re-decoding — per-image (media_id, width, height, payload_crc32).
    Deterministic (golden-gated); the resize math is the FakeCodec stub,
    the Ray plumbing (actor signature, binary column rewrite, batch
    sizing for image payloads) is real."""
    import zlib

    import pyarrow.parquet as pq

    if n is None:
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = media_dataset(n)
    resized = ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"target_width": target_width,
                               "target_height": target_height},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        ids, ws, hs, crcs = [], [], [], []
        for mid, kind, blob in zip(batch.column("media_id").to_pylist(),
                                   batch.column("kind").to_pylist(),
                                   batch.column("payload").to_pylist()):
            if kind != "image":
                continue
            d = FakeCodec.decode(blob)
            ids.append(mid)
            ws.append(d["width"])
            hs.append(d["height"])
            crcs.append(zlib.crc32(blob))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "payload_crc": pa.array(crcs, pa.int64()),
        })

    return resized.map_batches(summarize, batch_format="pyarrow")


def media_ann_pipeline(sf_dir: str, *, n: int | None = None, k: int = 5,
                       n_query: int = 4, dump_dir: str | None = None):
    """Multimodal similarity search — `media_ann_topk`: extract features
    for every media payload (actor-pool MediaFeatureStage; a real
    deployment swaps in a vision/audio model loaded once per actor) and
    return the cosine top-k corpus matches for each of the first
    ``n_query`` media items.

    Scale shape: the query matrix ships ONCE via ray.put; each batch
    computes one (batch × dim) @ (dim × n_query) matmul and emits at
    most k rows PER QUERY per batch (the brute_force_topk local-top-k
    combiner law, including its tie rule: round-5 cos desc, media_id
    asc), so the final per-query rank sees ≤ k·blocks rows inside a
    bounded ``map_groups``. Deterministic end to end (golden-gated)."""
    import ray
    import pyarrow.parquet as pq

    if n is None:
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = media_dataset(n)

    feat = MediaFeatureStage()
    qt = synth_media_table(n_query)   # tiny: just the query rows
    qmat = np.asarray(
        feat(qt).column("features").to_pylist(), np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qids = qt.column("media_id").to_pylist()
    qref = ray.put((qmat, np.asarray(qids, np.int64)))

    if dump_dir is not None:
        # stream the per-item features to the oracle path: DuckDB
        # recomputes every cosine and the (cos desc, media_id) top-k
        # rank independently of the combiner
        class FeatureDump:
            def __init__(self):
                self.stage = MediaFeatureStage()

            def __call__(self, batch: pa.Table) -> pa.Table:
                return self.stage(batch).select(["media_id", "features"])

        ds.map_batches(FeatureDump, batch_format="pyarrow",
                       batch_size=64,
                       concurrency=(1, 2)).write_parquet(dump_dir)

    class FeatureTopK:
        def __init__(self):
            self.stage = MediaFeatureStage()

        def __call__(self, batch: pa.Table) -> pa.Table:
            qmat, qids = ray.get(qref)
            fb = self.stage(batch)
            ids = np.asarray(fb.column("media_id").to_pylist(), np.int64)
            mat = np.asarray(fb.column("features").to_pylist(),
                             np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cos = np.round(mat @ qmat.T, 5)       # (n, n_query)
            out_q, out_m, out_c = [], [], []
            for j, qid in enumerate(qids):
                keep = ids != qid                  # exclude self
                cj, mj = cos[keep, j], ids[keep]
                if len(mj) > k:
                    order = np.lexsort((mj, -cj))[:k]
                    cj, mj = cj[order], mj[order]
                out_q.extend([qid] * len(mj))
                out_m.extend(mj.tolist())
                out_c.extend(cj.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "media_id": pa.array(out_m, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            })

    partials = ds.map_batches(FeatureTopK, batch_format="pyarrow",
                              batch_size=64, concurrency=(1, 2))

    def finish(g):
        g = g.sort_values(["cos", "media_id"],
                          ascending=[False, True]).head(k)
        return g.reset_index(drop=True)

    import pandas as pd  # noqa: F811 — map_groups pandas finisher

    return partials.groupby("query_id") \
        .map_groups(finish, batch_format="pandas") \
        .sort(["query_id", "cos", "media_id"],
              descending=[False, True, False])


class PerceptualHashStage:
    """Actor-pool stage: payload → 64-bit dHash (difference hash).

    A real implementation decodes with PIL, resizes to a 9×8 grayscale
    grid and compares horizontal neighbors (the classic dHash of
    Krawetz's "Kind of Like That"); the STUB applies the identical
    comparison over the FakeCodec body's first 9×8 bytes, so flipping a
    handful of payload bytes moves only a handful of hash bits — the
    property the near-dup pipeline below relies on and tests plant."""

    def __init__(self):
        self.codec = FakeCodec()

    @staticmethod
    def dhash(body: bytes) -> int:
        grid = np.frombuffer(body[:72], dtype=np.uint8).reshape(8, 9)
        bits = (grid[:, 1:] > grid[:, :-1]).ravel()   # 8 rows × 8 bits
        return int(np.packbits(bits).view(">u8")[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for blob in batch.column("payload").to_pylist():
            try:
                d = self.codec.decode(blob)
                hashes.append(self.dhash(d["body"]))
            except (ValueError, struct.error, IndexError):
                hashes.append((1 << 64) - 1)   # undecodable sentinel
        return pa.table({
            "media_id": batch.column("media_id"),
            "phash": pa.array(np.asarray(hashes, dtype=np.uint64),
                              pa.uint64()),
        })


def synth_media_with_neardups(n: int, seed: int = 42,
                              every: int = 10) -> pa.Table:
    """The media corpus plus planted near-duplicates: every ``every``-th
    payload is re-emitted (media_id = n + j) with three body bytes
    XOR-flipped inside the dHash window — ≤ 6 hash bits moved."""
    base = synth_media_table(n, seed=seed)
    ids, kinds, payloads = [], [], []
    for j in range((n + every - 1) // every):
        kind, blob = _neardup_row(j, n, seed, every)
        ids.append(n + j)
        kinds.append(kind)
        payloads.append(blob)
    dups = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })
    return pa.concat_tables([base, dups])


def phash_dedup_pipeline(sf_dir: str, *, n: int | None = None,
                         radius: int = 6, n_bands: int = 8,
                         dump_dir: str | None = None):
    """`media_phash_dedup` — perceptual-hash near-duplicate pairs over
    the media corpus (planted near-dups included): dHash per payload
    (actor pool), band-bucket the 64-bit hash, pair within buckets at
    Hamming ≤ radius, dedupe pairs across bands.

    With n_bands=8 the detection is EXACT for radius ≤ 7 (pigeonhole:
    ≤7 differing bits cannot touch all 8 bands, so every true pair
    shares at least one clean band — the FastSS-style completeness
    lemma). The trade: 8-bit bands mean ≤256 buckets per band, so
    bucket sizes grow linearly with the corpus; at 100 TB use wider
    bands (4×16: probabilistic recall, simhash_near_pairs-style) or
    shard each bucket by a secondary hash before pairing — the same
    knob `pipelines/dedup.py` documents for SimHash banding.

    Scale shape: hash per payload (actor pool, no shuffle) → n_bands
    rows per item into a bucket groupby (the one exchange) → per-bucket
    vectorized XOR-popcount pairing → a (pair)-keyed dedupe groupby on
    the (small) near-dup pair set. Deterministic end to end. When
    ``dump_dir`` is given the (media_id, phash) table streams there so
    the SQL oracle can recompute EVERY pair brute-force
    (bit_count(xor(a, b)) <= radius over the full cross join) — a
    banding-completeness proof, not just a replay.
    """
    import pyarrow.parquet as pq
    from ray.data.aggregate import Min

    if n is None:
        n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = media_dataset(n, with_neardups=True)

    if dump_dir is not None:
        class HashDump:
            def __init__(self):
                self.stage = PerceptualHashStage()

            def __call__(self, batch: pa.Table) -> pa.Table:
                hb = self.stage(batch)
                # signed-bits view: DuckDB XORs BIGINTs; popcount is
                # invariant under the reinterpret
                return pa.table({
                    "media_id": hb.column("media_id"),
                    "phash_bits": pa.array(
                        hb.column("phash").to_numpy(zero_copy_only=False)
                        .view(np.int64), pa.int64()),
                })

        ds.map_batches(HashDump, batch_format="pyarrow",
                       batch_size=256,
                       concurrency=(1, 2)).write_parquet(dump_dir)

    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1

    class HashAndBand:
        def __init__(self):
            self.stage = PerceptualHashStage()

        def __call__(self, batch: pa.Table) -> pa.Table:
            hb = self.stage(batch)
            ids = hb.column("media_id").to_numpy(zero_copy_only=False)
            ph = hb.column("phash").to_numpy(zero_copy_only=False)
            reps = []
            for b in range(n_bands):
                band_val = (ph >> (b * band_bits)) & mask
                reps.append(pa.table({
                    "bucket": pa.array(
                        (np.int64(b) << np.int64(band_bits))
                        | band_val.astype(np.int64)),
                    "media_id": pa.array(ids),
                    "phash": pa.array(ph, pa.uint64()),
                }))
            return pa.concat_tables(reps)

    empty = pa.table({"media_a": pa.array([], pa.int64()),
                      "media_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        ids = g.column("media_id").to_numpy(zero_copy_only=False)
        ph = g.column("phash").to_numpy(zero_copy_only=False)
        m = len(ids)
        if m < 2:
            return empty
        xor = np.bitwise_xor.outer(ph, ph)
        dist = np.unpackbits(
            xor.view(np.uint8).reshape(m, m, 8), axis=2).sum(axis=2)
        ai, bj = np.nonzero(np.triu(dist <= radius, k=1))
        if not len(ai):
            return empty
        a, b = ids[ai], ids[bj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({
            "media_a": pa.array(a2),
            "media_b": pa.array(b2),
            "hamming": pa.array(dist[ai, bj].astype(np.int64)),
        })

    return (ds.map_batches(HashAndBand, batch_format="pyarrow",
                           batch_size=256, concurrency=(1, 2))
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pyarrow")
            .groupby(["media_a", "media_b"])
            .aggregate(Min("hamming", alias_name="hamming"))
            .sort(["media_a", "media_b"]))
