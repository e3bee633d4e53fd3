"""Fetch cache — CacheMode semantics over a parquet-backed store (S8).

The reference caches full CrawlResults in SQLite keyed by URL
(/root/reference/crawl4ai/async_database.py:232-246) with CacheMode
deciding reads/writes (cache_context.py:4-92):

    ENABLED    → read + write
    READ_ONLY  → read, no write
    WRITE_ONLY → write, no read
    DISABLED / BYPASS → neither

Here the cache is a parquet directory of (url_hash, url, html, status)
parts. Reads broadcast the store once per run (``ray.put``) and the fetch
stage consults it before fetching; parse re-runs deterministically on the
cached HTML, which reproduces the reference's cached CrawlResult (its
parse is deterministic too). Writes happen task-side in the sink stage —
one part file per task, append-only, so cache writes are as resumable as
document writes. At corpus scale the broadcast dict becomes a sharded
lookup actor (same shape as the seen-set); the store layout is unchanged.
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

VALID_MODES = ("enabled", "disabled", "read_only", "write_only", "bypass")


def _check_mode(mode: str) -> str:
    """A misspelled mode must fail loudly, not silently behave as bypass
    (code-review r2)."""
    if mode not in VALID_MODES:
        raise ValueError(
            f"invalid cache_mode {mode!r}; expected one of {VALID_MODES}")
    return mode


def should_read(mode: str) -> bool:
    return _check_mode(mode) in ("enabled", "read_only")


def should_write(mode: str) -> bool:
    return _check_mode(mode) in ("enabled", "write_only")


class CacheStore:
    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def load(self) -> dict[int, tuple[str, int]]:
        """url_hash → (html, status). Deduped last-write-wins: part names
        lead with a zero-padded write timestamp, so lexicographic order IS
        write order (pre-timestamp uuid-only parts sort first and lose,
        which is the correct bias for stale entries)."""
        out: dict[int, tuple[str, int]] = {}
        for name in sorted(os.listdir(self.cache_dir)):
            if not name.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(self.cache_dir, name),
                              columns=["url_hash", "html", "status"])
            for h, html, status in zip(t.column("url_hash").to_pylist(),
                                       t.column("html").to_pylist(),
                                       t.column("status").to_pylist()):
                out[int(h)] = (html, int(status))
        return out

    def append_batch(self, batch: pa.Table) -> None:
        """Task-side append of (url_hash, url, html, status) rows."""
        if batch.num_rows == 0:
            return
        # timestamp prefix makes sorted(filenames) == write order (the
        # load() last-write-wins law); uuid suffix keeps concurrent
        # writers collision-free; atomic rename keeps readers consistent
        final = os.path.join(
            self.cache_dir,
            f"cache-{time.time_ns():020d}-{uuid.uuid4().hex}.parquet",
        )
        tmp = final + ".tmp"
        pq.write_table(batch.select(["url_hash", "url", "html", "status"]),
                       tmp)
        os.replace(tmp, final)

    def size(self) -> int:
        return len(self.load())
