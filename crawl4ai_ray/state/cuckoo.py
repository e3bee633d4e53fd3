"""Cuckoo filter over uint64 key hashes — the fast path of the URL-seen set.

The reference keeps a per-strategy in-process ``visited: Set[str]``
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:152) and prototypes a
bloom filter (deep_crawling/crazy.py:102-165). At 10^10-URL frontier scale a
Python set of strings cannot exist on one node; the engine shards the seen
set by ``url_hash % n_shards`` across actors, each holding:

- this cuckoo filter (compact, serializable — the checkpoint artifact), and
- an exact uint64 hash set as ground truth (false positives from the filter
  are resolved against it; SURVEY.md §7.5 "filter is an optimization, not
  the source of truth").

Design follows Fan et al., "Cuckoo Filter: Practically Better Than
Bloom" (CoNEXT 2014): partial-key cuckoo hashing, bucket size 4, 16-bit
fingerprints, alternate bucket i2 = i1 xor H(fp).

Numpy storage: ``(n_buckets, bucket_size)`` uint16 fingerprints, 0 = empty.
``contains_batch`` is fully vectorized; inserts are per-item (amortized cost
is tiny next to fetch/parse).
"""

from __future__ import annotations

import numpy as np

_EMPTY = 0
_MAX_KICKS = 500

_M64 = 0xFFFFFFFFFFFFFFFF


def _splitmix64_scalar(h: int) -> int:
    """SplitMix64 finalizer (Steele et al., public domain) over a Python int.

    The primary bucket index must NOT reuse the raw low hash bits: the seen
    set routes hashes to shards by ``h % n_shards`` (seen.py), so within a
    shard the low bits are constant and ``h & (n_buckets-1)`` would hit only
    1/n_shards of the table (silent insert failures from ~0.62 load).
    Mixing decorrelates bucket choice from shard routing."""
    h = (h + 0x9E3779B97F4A7C15) & _M64
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & _M64
    return h ^ (h >> 31)


def _splitmix64_batch(h: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 over a uint64 array (wrapping arithmetic)."""
    h = h.astype(np.uint64, copy=True)
    h += np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _fingerprint(h: np.ndarray | int):
    """16-bit nonzero fingerprint from the high bits of the 64-bit hash."""
    fp = (np.uint64(h) >> np.uint64(48)).astype(np.uint16) if isinstance(h, np.ndarray) \
        else np.uint16((int(h) >> 48) & 0xFFFF)
    if isinstance(fp, np.ndarray):
        fp = np.where(fp == 0, np.uint16(1), fp)
        return fp
    return fp if fp != 0 else np.uint16(1)


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, bucket_size: int = 4):
        n_buckets = 1
        while n_buckets * bucket_size < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng_state = np.uint64(0x9E3779B97F4A7C15)

    # -- index helpers ------------------------------------------------------

    def _i1(self, h):
        return np.uint64(_splitmix64_scalar(int(h)) & (self.n_buckets - 1))

    def _i2(self, i1, fp):
        # partial-key cuckoo: alternate bucket = i1 xor H(fp)
        fph = (np.uint64(fp) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return (np.uint64(i1) ^ fph) & np.uint64(self.n_buckets - 1)

    # -- single-item ops ----------------------------------------------------

    def insert(self, h: int) -> bool:
        fp = _fingerprint(h)
        i1 = int(self._i1(h))
        i2 = int(self._i2(i1, fp))
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        i = i1 if int(self._rng_state) & 1 else i2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            self._rng_state = np.uint64(
                (int(self._rng_state) * 6364136223846793005 + 1442695040888963407)
                & 0xFFFFFFFFFFFFFFFF
            )
            slot = int(self._rng_state) % self.bucket_size
            cur, self.table[i, slot] = self.table[i, slot], cur
            i = int(self._i2(i, cur))
            row = self.table[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table full — caller should grow/flush

    # -- batch ops ----------------------------------------------------------

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test; may return false positives."""
        h = hashes.astype(np.uint64, copy=False)
        fp = _fingerprint(h)
        i1 = (_splitmix64_batch(h) & np.uint64(self.n_buckets - 1)).astype(np.int64)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995))
        i2 = ((i1.astype(np.uint64) ^ fph) & np.uint64(self.n_buckets - 1)).astype(np.int64)
        rows1 = self.table[i1]           # (n, bucket_size)
        rows2 = self.table[i2]
        fpc = fp[:, None]
        return ((rows1 == fpc).any(axis=1)) | ((rows2 == fpc).any(axis=1))

    def insert_batch(self, hashes: np.ndarray) -> int:
        """Insert all; return the number of FAILED inserts (table full).

        Callers (SeenShard) must treat a nonzero return as a signal to
        rebuild at larger capacity — a dropped insert is a filter false
        negative, which breaks the seen set's no-false-negative contract."""
        failed = 0
        for h in hashes:
            if not self.insert(int(h)):
                failed += 1
        return failed

    # -- serialization (checkpoint artifact) --------------------------------

    def to_bytes(self) -> bytes:
        header = np.array([self.n_buckets, self.bucket_size, self.count],
                          dtype=np.int64).tobytes()
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n_buckets, bucket_size, count = np.frombuffer(blob[:24], dtype=np.int64)
        f = cls.__new__(cls)
        f.n_buckets = int(n_buckets)
        f.bucket_size = int(bucket_size)
        f.count = int(count)
        f.table = (
            np.frombuffer(blob[24:], dtype=np.uint16)
            .reshape(f.n_buckets, f.bucket_size)
            .copy()
        )
        f._rng_state = np.uint64(0x9E3779B97F4A7C15)
        return f
