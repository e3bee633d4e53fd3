"""Deduplication pipelines over the documents table.

Large-scale training-data curation operators, expressed Ray-Data-first:

- exact_dedup: content-hash groupby (hash-partition + per-group first) with
  per-batch partial aggregation before the shuffle (combiner pattern).
- minhash_lsh: shingle → minhash signature → band → bucket groupby →
  candidate pairs → exact Jaccard verification. Signatures are computed
  vectorized (numpy) per batch; the band explosion is the only shuffle.
- simhash: 64-bit simhash per doc; near-dup candidates via 16-bit band
  buckets; verified by Hamming distance.
- ngram_jaccard: exact n-gram Jaccard verification used by both (and
  directly for small candidate sets).

MinHash follows Broder, "On the resemblance and containment of documents"
(SEQUENCES 1997) with the banding LSH of Leskovec/Rajaraman/Ullman (MMDS
ch. 3); SimHash follows Charikar, "Similarity estimation techniques from
rounding algorithms" (STOC 2002) as applied by Manku et al. (WWW 2007)
for near-duplicate web pages.

The reference crawler has only exact URL/content dedup (SURVEY.md §2.7);
these near-dup operators are the corpus-curation extensions the engine adds.

Scale notes: signature/banding stages are linear map_batches; the bucket
groupby shuffles only (band_id, band_hash, doc_id) rows (~24 B/row). Pair
verification here broadcasts the (small) shingle-set dict at sandbox scale;
the 100 TB path replaces the broadcast with a doc_id-bucketed self-join
(hash both pair sides by doc_id, join per bucket) — same verify kernel.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

_MERSENNE = (1 << 61) - 1


def _doc_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def _hash64_bytes(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str, prefix_len: int = 64):
    """Group documents by md5 of the first ``prefix_len`` chars; one output
    row per distinct key with duplicate count and first doc_id.

    Matches the DuckDB oracle:
        SELECT md5(substr(text,1,64)) AS content_md5, count(*) AS dup_count,
               min(doc_id) AS first_doc_id FROM documents GROUP BY 1
    """
    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])

    def key_and_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        keys = [
            hashlib.md5(t[:prefix_len].encode("utf-8")).hexdigest()
            for t in texts
        ]
        # per-batch partial aggregation (combiner) before the shuffle
        df = pd.DataFrame({"content_md5": keys, "doc_id": ids})
        g = df.groupby("content_md5", as_index=False).agg(
            _cnt=("doc_id", "size"), _min=("doc_id", "min")
        )
        return pa.table(
            {
                "content_md5": pa.array(g["content_md5"], type=pa.string()),
                "_cnt": pa.array(g["_cnt"], type=pa.int64()),
                "_min": pa.array(g["_min"], type=pa.int64()),
            }
        )

    partial = ds.map_batches(key_and_partial, batch_format="pyarrow",
                             batch_size=8192)
    return partial.groupby("content_md5").aggregate(
        Sum("_cnt", alias_name="dup_count"),
        Min("_min", alias_name="first_doc_id"),
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    words = text.lower().split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter((_hash64_bytes(s) for s in shingles), dtype=np.uint64,
                    count=len(shingles))
    )


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    return rng.integers(1, np.iinfo(np.uint64).max, size=num_perm,
                        dtype=np.uint64)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    # Vectorized splitmix64 finalizer — uint64 wraparound arithmetic.
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _signature(sh: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Per-permutation min of splitmix64(shingle ^ seed) — a fully
    vectorized uint64 minhash (one (n_shingles, num_perm) broadcast)."""
    if len(sh) == 0:
        return np.full(len(seeds), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = _splitmix64(sh[:, None] ^ seeds[None, :])
    return z.min(axis=0)


class MinHashStage:
    """Actor-pool stage: per-doc shingle set → minhash signature → band
    rows. Permutation params built once per actor in __init__."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3):
        assert num_perm % bands == 0
        self.seeds = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for did, text in zip(ids, texts):
            sig = _signature(_shingle_hashes(text or "", self.k), self.seeds)
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(seg.tobytes(), digest_size=8).digest(),
                    "little",
                )
                out_doc.append(did)
                out_band.append(band)
                out_hash.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(np.array(out_hash, dtype=np.uint64)),
            }
        )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def minhash_lsh_pairs(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                      k: int = 3, threshold: float = 0.7):
    """Near-duplicate pairs (doc_a < doc_b, exact Jaccard >= threshold).

    shingle→minhash→band (map_batches, actor pool) → bucket groupby →
    candidate pairs → exact-Jaccard verify against broadcast shingle sets.
    """
    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])
    band_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    )

    # Candidate pairs from band buckets. The band table is compact
    # (doc_id, band_id, band_hash ≈ 20 B/row), so bucket-pair generation
    # runs driver-side in polars — a per-bucket map_groups here costs one
    # Python/pandas round-trip per bucket (tens of thousands of tiny
    # groups) and is ~20× slower. At corpus scale the same algebra runs
    # distributed: sort by (band_id, band_hash) + per-block run detection.
    import polars as pl

    band_pl = pl.from_arrow(
        pa.concat_tables(
            list(band_rows.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
        )
    )
    buckets = (
        band_pl.group_by(["band_id", "band_hash"])
        .agg(pl.col("doc_id").sort().alias("ids"))
        .filter(pl.col("ids").list.len() > 1)
    )
    rows_a, rows_b = [], []
    for ids in buckets["ids"].to_list():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                rows_a.append(a)
                rows_b.append(b)
    import pandas as pd

    cand_tbl = pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b}) \
        .drop_duplicates()
    if len(cand_tbl) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # broadcast shingle sets for exact verification (sandbox scale; see
    # module docstring for the bucketed-join path at corpus scale)
    docs = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"]) \
        .to_pandas()
    shingles = {
        int(r.doc_id): _shingle_hashes(r.text or "", k)
        for r in docs.itertuples()
    }
    ref = ray.put(shingles)

    cand_ds = rd.from_pandas(cand_tbl.reset_index(drop=True))

    def verify(batch, shingle_ref=ref):
        sh = ray.get(shingle_ref)
        import pandas as pd

        out = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            j = jaccard(sh[int(a)], sh[int(b)])
            if j >= threshold:
                out.append((int(a), int(b), round(j, 6)))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]) \
            if out else pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                      "doc_b": pd.Series(dtype="int64"),
                                      "jaccard": pd.Series(dtype="float64")})

    return cand_ds.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def connected_components(pairs, all_ids) -> dict[int, int]:
    """doc_id → canonical (minimum) id of its near-dup component.

    Candidate pair sets are tiny relative to the corpus (LSH-filtered), so
    union-find runs driver-side; the corpus-scale equivalent is iterative
    min-label propagation (explode edges both ways → groupby(node).min →
    join labels back, repeat until fixpoint — ray_guide near-dup pattern).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {int(i): find(int(i)) for i in all_ids}


def minhash_dedup_survivors(sf_dir: str, *, threshold: float = 0.5,
                            k: int = 2):
    """The deduplicated corpus: near-dup components collapse to their
    minimum doc_id (keep-first); returns (doc_id, canonical_id, survivor)."""
    import pyarrow.parquet as pq

    pairs_tbl = minhash_lsh_pairs(sf_dir, threshold=threshold, k=k)
    if hasattr(pairs_tbl, "to_pandas"):
        pairs_df = pairs_tbl.to_pandas()
    else:
        pairs_df = pairs_tbl
    ids = pq.read_table(_doc_path(sf_dir), columns=["doc_id"]) \
        .column("doc_id").to_pylist()
    labels = connected_components(
        list(zip(pairs_df["doc_a"], pairs_df["doc_b"])), ids
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "canonical_id": pa.array([labels[int(i)] for i in ids],
                                     type=pa.int64()),
            "survivor": pa.array([labels[int(i)] == int(i) for i in ids],
                                 type=pa.bool_()),
        }
    )


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (term-frequency weighted)."""
    from collections import Counter

    acc = np.zeros(64, dtype=np.int64)
    for word, cnt in Counter(text.lower().split()).items():
        h = _hash64_bytes(word)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), cnt, -cnt)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_table(sf_dir: str):
    """(doc_id, simhash) for every document — deterministic signature table."""
    ds = rd.read_parquet(_doc_path(sf_dir), columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        sims = np.array(
            [simhash64(t or "") for t in batch.column("text").to_pylist()],
            dtype=np.uint64,
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(sims)}
        )

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=4096)


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: candidates from 16-bit band buckets
    (any equal quarter ⇒ hamming could be ≤ 3·16), verified by exact
    Hamming distance ≤ max_hamming."""
    sims = simhash_table(sf_dir).to_pandas()
    import pandas as pd

    rows = []
    for band in range(4):
        key = (sims["simhash"].to_numpy().astype(np.uint64)
               >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"doc_id": sims["doc_id"], "key": key})
        for _, g in df.groupby("key"):
            ids = sorted(g["doc_id"].tolist())
            rows += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    if not rows:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int32())})
    cand = pd.DataFrame(rows, columns=["doc_a", "doc_b"]).drop_duplicates()
    sim_of = dict(zip(sims["doc_id"].astype(int), sims["simhash"].astype(np.uint64)))
    out = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        d = int(bin(int(sim_of[int(a)]) ^ int(sim_of[int(b)])).count("1"))
        if d <= max_hamming:
            out.append((int(a), int(b), d))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in out], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in out], type=pa.int64()),
            "hamming": pa.array([r[2] for r in out], type=pa.int32()),
        }
    )
