"""Sharded URL-seen set: cuckoo-filter fast path + exact uint64 ground truth.

Replaces the reference's single-process ``visited: Set[str]``
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:152) with N shard
actors keyed by ``url_hash % N``. Each shard holds a ``CuckooFilter`` (the
compact, serializable checkpoint artifact) and an exact uint64 set that
resolves filter false positives — the filter is an optimization, the exact
set is truth (SURVEY.md §7.5). At cluster scale each shard is pinned to a
node; here they are plain Ray actors.

API is batch-first: callers hash-partition a batch of url_hashes by shard
and issue one ``check_and_add`` per shard (one RPC per shard per superstep,
not per URL).
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter


def _in_sorted(sorted_arr: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Membership of ``hashes`` in an already-sorted array via
    searchsorted — O(n log m), unlike np.isin which re-sorts its second
    argument on every call (code-review r2)."""
    if not len(sorted_arr):
        return np.zeros(len(hashes), dtype=bool)
    idx = np.searchsorted(sorted_arr, hashes)
    idx[idx == len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[idx] == hashes


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity)
        self._exact_sorted = np.zeros(0, dtype=np.uint64)  # ground truth

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """For each hash (in order): True if already seen, else mark seen.

        Within-batch duplicates: first occurrence returns False (new),
        subsequent return True — identical to sequential ``in``+``add`` on
        the reference's visited set. Fully vectorized: cuckoo pre-filter,
        exact resolution via np.isin against the sorted exact array,
        within-batch first-occurrence via np.unique."""
        hashes = hashes.astype(np.uint64, copy=False)
        maybe = self.filter.contains_batch(hashes)
        seen_before = np.zeros(len(hashes), dtype=bool)
        if maybe.any() and len(self._exact_sorted):
            idx = np.nonzero(maybe)[0]
            seen_before[idx] = _in_sorted(self._exact_sorted, hashes[idx])
        # within-batch duplicates: only the first occurrence is "new"
        _, first_idx = np.unique(hashes, return_index=True)
        is_first = np.zeros(len(hashes), dtype=bool)
        is_first[first_idx] = True
        out = seen_before | ~is_first
        new = hashes[first_idx][~seen_before[first_idx]]
        if len(new):
            self._insert_new(new)
        return out

    def _insert_new(self, new: np.ndarray) -> None:
        """Union into the exact set, then keep the filter in sync.

        Order matters: the exact set is updated FIRST so a rebuild (which
        re-inserts from the exact array) covers ``new``; in that case the
        incremental insert is skipped to avoid double-counting. A failed
        incremental insert (table locally full) forces an immediate rebuild
        — a dropped fingerprint is a filter false negative, which would
        make check_and_add report seen URLs as new."""
        new = np.unique(new)
        # merge two sorted arrays in O(m+n) instead of union1d's full
        # re-sort (np.insert with searchsorted positions keeps order)
        pos = np.searchsorted(self._exact_sorted, new)
        self._exact_sorted = np.insert(self._exact_sorted, pos, new)
        if self._maybe_rebuild():
            return
        if self.filter.insert_batch(new):
            self._rebuild()

    def _maybe_rebuild(self) -> bool:
        """Rebuild at 2x+ before load gets near the cuckoo failure zone."""
        cap = self.filter.n_buckets * self.filter.bucket_size
        if len(self._exact_sorted) <= 0.8 * cap:
            return False
        self._rebuild()
        return True

    def _rebuild(self) -> None:
        """Rebuild from the exact array at <=0.6 load; if a pathological
        fingerprint distribution still overflows (e.g. low-entropy hashes
        collapsing to one fingerprint), keep doubling until every insert
        lands — the filter must never carry a false negative."""
        cap = self.filter.n_buckets * self.filter.bucket_size
        new_cap = cap
        while len(self._exact_sorted) > 0.6 * new_cap:
            new_cap *= 2
        while True:
            f = CuckooFilter(capacity=new_cap,
                             bucket_size=self.filter.bucket_size)
            if f.insert_batch(self._exact_sorted) == 0:
                break
            new_cap *= 2
        self.filter = f

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = hashes.astype(np.uint64, copy=False)
        maybe = self.filter.contains_batch(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        if maybe.any() and len(self._exact_sorted):
            idx = np.nonzero(maybe)[0]
            out[idx] = _in_sorted(self._exact_sorted, hashes[idx])
        return out

    def add(self, hashes: np.ndarray) -> int:
        hashes = np.unique(hashes.astype(np.uint64, copy=False))
        fresh = hashes[~_in_sorted(self._exact_sorted, hashes)]
        if len(fresh):
            self._insert_new(fresh)
        return len(self._exact_sorted)

    def size(self) -> int:
        return len(self._exact_sorted)

    def snapshot(self) -> tuple[bytes, bytes]:
        """(cuckoo blob, exact-hash ndarray bytes) for checkpointing."""
        return self.filter.to_bytes(), self._exact_sorted.tobytes()

    def restore(self, filter_blob: bytes, exact_blob: bytes) -> int:
        """Restore from a checkpoint. The filter is REBUILT from the exact
        hash array instead of trusting the serialized table: the exact set
        is the source of truth, and a blob written under a different
        bucket-index scheme (e.g. a pre-splitmix64 checkpoint) would
        silently return false negatives when probed by the current code.
        The blob still rides in snapshots for size accounting/debugging."""
        old = CuckooFilter.from_bytes(filter_blob)
        self._exact_sorted = np.frombuffer(exact_blob, dtype=np.uint64).copy()
        cap = max(old.n_buckets * old.bucket_size, 1 << 8)
        f = CuckooFilter(capacity=cap, bucket_size=old.bucket_size)
        if f.insert_batch(self._exact_sorted):
            self.filter = f   # let _rebuild grow it
            self._rebuild()
        else:
            self.filter = f
        return len(self._exact_sorted)


class SeenSet:
    """Driver-side handle over the shard actors."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 16):
        self.n_shards = n_shards
        self.shards = [
            SeenShard.remote(i, capacity_per_shard) for i in range(n_shards)
        ]

    def _partition(self, hashes: np.ndarray):
        shard_of = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        return shard_of

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Batch check-and-add preserving input order semantics.

        Order within a shard is preserved (stable partition), and
        cross-shard order doesn't matter because two different hashes never
        contend; duplicate hashes land on the same shard in order.
        """
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        hashes = hashes.astype(np.uint64, copy=False)
        shard_of = self._partition(hashes)
        out = np.empty(len(hashes), dtype=bool)
        futs, idxs = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futs.append(self.shards[s].check_and_add.remote(hashes[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        hashes = hashes.astype(np.uint64, copy=False)
        shard_of = self._partition(hashes)
        out = np.empty(len(hashes), dtype=bool)
        futs, idxs = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futs.append(self.shards[s].contains.remote(hashes[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        shard_of = self._partition(hashes)
        futs = []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futs.append(self.shards[s].add.remote(hashes[idx]))
        ray.get(futs)

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[tuple[bytes, bytes]]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[tuple[bytes, bytes]]) -> None:
        if len(blobs) != self.n_shards:
            # hash->shard routing is h % n_shards: restoring into a
            # different shard count would silently misplace every hash
            # (code-review r2)
            raise ValueError(
                f"checkpoint has {len(blobs)} seen-set shards but this "
                f"run is configured with {self.n_shards}; resume with "
                f"n_seen_shards={len(blobs)}")
        ray.get(
            [
                s.restore.remote(fb, eb)
                for s, (fb, eb) in zip(self.shards, blobs)
            ]
        )

    def kill(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
