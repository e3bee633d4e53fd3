"""Distributed frontier discovery — the 10^10-scale path, implemented.

The engine's driver-side discovery (crawl.py:_next_frontier_bfs) finalizes
each superstep's candidates on the driver: fine at sandbox scale after the
sink combiner, impossible for 10^8-row levels. This module implements the
same algebra as Ray Data operations where the driver only ever sees
O(#blocks) metadata rows — candidate data moves block-to-block through the
object store:

1. **Global ordered dedup** — range-partitioned sort by (url_hash,
   parent_seq, link_idx) → every block owns a contiguous key range →
   per-block first-occurrence dedup is globally correct except at block
   boundaries. A metadata pass collects each block's (first, last)
   url_hash (tiny), the driver marks blocks whose first key continues the
   previous block's run, and a distributed map drops those first rows
   (each block identified by its own first key in a broadcast set).
2. **Seen-set check** — map_batches holding the serialized shard-actor
   handles; each task issues one check_and_add per shard for its batch.
   Safe in any order: after step 1 each url_hash appears exactly once.
3. **Deterministic seq** — sort survivors by (parent_seq, link_idx); a
   metadata pass collects per-block (first_key, count); the driver
   prefix-sums offsets in key order and broadcasts {first_key: offset};
   a final map assigns ``seq = offset + local_rank``.

Sorted intermediates are materialized (they are consumed twice: metadata
pass + data pass) — the same object-store residency any distributed sort
output has. Equivalence with the driver path is asserted in
tests/test_discovery_distributed.py. max_pages capacity truncation
(per-page over the deduped set) composes after this stage unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


_CAND_SCHEMA = pa.schema([
    ("url", pa.string()), ("url_hash", pa.uint64()), ("host", pa.string()),
    ("depth", pa.int32()), ("score", pa.float32()),
    ("parent_seq", pa.int64()), ("link_idx", pa.int32()),
])


def _empty_frontier(cand=None) -> pa.Table:
    base = cand.slice(0, 0) if isinstance(cand, pa.Table) \
        else _CAND_SCHEMA.empty_table()
    return base.append_column("seq", pa.array([], pa.int64()))


def next_frontier_distributed(cand, seen, next_seq: int,
                              *, n_blocks: int = 8, with_stats: bool = False,
                              remaining: float | int = None,
                              use_score_order: bool = False,
                              as_dataset: bool = False):
    """Distributed equivalent of the driver's level dedup + seen check +
    seq assignment over a candidate table (already gated by the sink
    combiner). ``cand`` is a driver ``pa.Table`` (pre-sliced here) or an
    already-distributed ``ray.data.Dataset`` (e.g. a ``read_parquet`` of
    the sink's candidate parquet — the driver-free path; candidate data
    then never touches driver heap). Returns the next frontier ordered by
    seq — as a driver table, or a Dataset when ``as_dataset`` (the
    frontier-table mode consumes it with a join + write_parquet); with
    ``with_stats`` also returns {"skipped_seen": ...} (the count removed by
    the cross-level seen check, matching the driver path's lineage law).

    ``remaining`` (finite int) engages the reference's per-page capacity
    truncation (bfs_strategy.py:124-131) distributed: a per-parent
    groupby keeps the first ``remaining`` candidates of each parent — in
    (-score, link_idx) order when ``use_score_order`` (scorer present),
    link_idx order otherwise — and the post-truncation order becomes the
    seq order, exactly like the driver path. Truncated rows are already
    marked seen (reference quirk: over-capacity candidates burn seen
    entries) and are NOT counted in skipped_seen."""
    import math as _math

    capacity = remaining is not None and remaining != _math.inf

    if isinstance(cand, rd.Dataset):
        ds = cand
    else:
        if cand.num_rows == 0:
            out = _empty_frontier(cand)
            if as_dataset:
                out = rd.from_arrow(out)
            return (out, {"skipped_seen": 0}) if with_stats else out
        per = (cand.num_rows + n_blocks - 1) // n_blocks
        ds = rd.from_arrow(
            [cand.slice(i * per, per) for i in range(n_blocks)
             if i * per < cand.num_rows]
        )

    # -- 1. sort + boundary-aware per-block dedup ---------------------------
    sorted_ds = ds.sort(["url_hash", "parent_seq", "link_idx"]).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first": pa.array([], pa.uint64()),
                             "last": pa.array([], pa.uint64()),
                             "first_ps": pa.array([], pa.int64()),
                             "first_li": pa.array([], pa.int64())})
        return pa.table(
            {"first": pa.array([batch.column("url_hash")[0].as_py()],
                               type=pa.uint64()),
             "last": pa.array(
                 [batch.column("url_hash")[batch.num_rows - 1].as_py()],
                 type=pa.uint64()),
             # (parent_seq, link_idx) of the first row — the sort key's
             # unique tail, identifying THIS block's first row exactly
             "first_ps": pa.array(
                 [batch.column("parent_seq")[0].as_py()], type=pa.int64()),
             "first_li": pa.array(
                 [int(batch.column("link_idx")[0].as_py())],
                 type=pa.int64())}
        )

    meta = (
        sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                              batch_size=None)
        .to_pandas()
        .sort_values(["first", "first_ps", "first_li"])
    )
    # Drop decisions are keyed by the first ROW's unique (parent_seq,
    # link_idx), not by the url_hash VALUE: a duplicate run that starts
    # exactly at a block boundary and spans a further boundary would
    # otherwise put its hash in a value-keyed drop set and delete the
    # run's global first occurrence too (code-review r2).
    drop_rows: set[tuple[int, int]] = set()
    prev_last = None
    for r in meta.itertuples():
        if prev_last is not None and int(r.first) == int(prev_last):
            drop_rows.add((int(r.first_ps), int(r.first_li)))
        prev_last = r.last
    drop_ref = ray.put(drop_rows)

    def dedup(batch: pa.Table, drop_ref=drop_ref) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        drops = ray.get(drop_ref)
        h = batch.column("url_hash").to_numpy(zero_copy_only=False)
        keep = np.empty(len(h), dtype=bool)
        first_key = (int(batch.column("parent_seq")[0].as_py()),
                     int(batch.column("link_idx")[0].as_py()))
        keep[0] = first_key not in drops
        keep[1:] = h[1:] != h[:-1]
        return batch.filter(pa.array(keep))

    # -- 2. distributed seen-set check --------------------------------------
    # Retry safety (code-review r2): a mutating check_and_add inside a
    # retryable map task would report everything already-seen on replay
    # and silently drop the block. Split into (a) a READ-ONLY contains()
    # filter — idempotent, so Ray may retry it freely — materialized so
    # every membership test observes the pre-superstep state, then (b) an
    # IDEMPOTENT add() pass marking all deduped candidates seen
    # (re-adding on retry is a no-op). Same final state and same return
    # as the old single check_and_add, exactly-once no longer required.
    shards = seen.shards
    n_shards = seen.n_shards

    def _partition(hashes):
        return (hashes % np.uint64(n_shards)).astype(np.int64)

    def filter_unseen(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashes = batch.column("url_hash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        shard_of = _partition(hashes)
        dup = np.zeros(len(hashes), dtype=bool)
        futs, idxs = [], []
        for s in range(n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futs.append(shards[s].contains.remote(hashes[idx]))
                idxs.append(idx)
        for idx, r in zip(idxs, ray.get(futs)):
            dup[idx] = r
        return batch.filter(pa.array(~dup))

    def mark_seen(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            hashes = batch.column("url_hash") \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
            shard_of = _partition(hashes)
            futs = []
            for s in range(n_shards):
                idx = np.nonzero(shard_of == s)[0]
                if len(idx):
                    futs.append(shards[s].add.remote(hashes[idx]))
            ray.get(futs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    deduped = sorted_ds.map_batches(dedup, batch_format="pyarrow",
                                    batch_size=None).materialize()
    n_after_dedup = deduped.count() if (with_stats or capacity) else None
    survivors = deduped.map_batches(filter_unseen, batch_format="pyarrow",
                                    batch_size=None)

    # -- 2b. optional per-parent capacity truncation ------------------------
    # Reference law: only over-capacity parents reorder (score desc,
    # stable) before truncating; post-truncation order IS the seq order.
    # A per-parent groupby is the extra shuffle this path pays; group size
    # is bounded by links-per-page. link_rank (position within parent in
    # final order) becomes the second sort key so step 3 is unambiguous.
    rank_col = "link_idx"
    n_truncated = 0
    if capacity:
        cap = int(remaining)
        survivors = survivors.materialize()
        n_surv = survivors.count()
        if n_surv == 0:
            capacity = False
            n_truncated = 0

    if capacity:
        def truncate(g, cap=cap, use_score_order=use_score_order):
            g = g.sort_values("link_idx", kind="mergesort")
            if use_score_order and len(g) > cap:
                g = g.sort_values("score", kind="mergesort",
                                  ascending=False)
            g = g.iloc[:cap].copy()
            g["link_rank"] = np.arange(len(g), dtype=np.int32)
            return g

        survivors = survivors.groupby("parent_seq") \
            .map_groups(truncate, batch_format="pandas")
        rank_col = "link_rank"

    # -- 3. sort by discovery key + block-offset seq ------------------------
    final_sorted = survivors.sort(["parent_seq", rank_col]).materialize()
    # every deduped candidate is marked seen AFTER the reads completed
    # (BFS law: over-capacity candidates are marked seen too); add() is
    # idempotent so task retries are harmless
    deduped.map_batches(mark_seen, batch_format="pyarrow",
                        batch_size=None).count()
    if capacity:
        n_truncated = n_surv - final_sorted.count()

    def key_count(batch: pa.Table, rank_col=rank_col) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"ps": pa.array([], pa.int64()),
                             "li": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        return pa.table(
            {"ps": [batch.column("parent_seq")[0].as_py()],
             "li": [batch.column(rank_col)[0].as_py()],
             "n": [batch.num_rows]}
        )

    meta2 = final_sorted.map_batches(
        key_count, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if meta2.empty:
        out = _empty_frontier(cand)
        if as_dataset:
            out = rd.from_arrow(out)
        if with_stats:
            return out, {"skipped_seen": n_after_dedup}
        return out
    meta2 = meta2.sort_values(["ps", "li"])
    offsets: dict[tuple, int] = {}
    acc = next_seq
    for r in meta2.itertuples():
        offsets[(int(r.ps), int(r.li))] = acc
        acc += int(r.n)
    n_out = acc - next_seq
    off_ref = ray.put(offsets)

    def assign(batch: pa.Table, off_ref=off_ref,
               rank_col=rank_col) -> pa.Table:
        if batch.num_rows == 0:
            if rank_col in batch.column_names and rank_col != "link_idx":
                batch = batch.drop_columns([rank_col])
            return batch.append_column("seq", pa.array([], pa.int64()))
        offs = ray.get(off_ref)
        key = (batch.column("parent_seq")[0].as_py(),
               batch.column(rank_col)[0].as_py())
        base = offs[key]
        if rank_col != "link_idx":
            batch = batch.drop_columns([rank_col])
        return batch.append_column(
            "seq",
            pa.array(np.arange(base, base + batch.num_rows, dtype=np.int64)),
        )

    assigned = final_sorted.map_batches(assign, batch_format="pyarrow",
                                        batch_size=None)
    if as_dataset:
        if with_stats:
            skipped = n_after_dedup - n_out - n_truncated
            return assigned, {"skipped_seen": skipped, "n_new": n_out}
        return assigned

    out_blocks = [
        b for b in assigned.iter_batches(batch_format="pyarrow",
                                         batch_size=None)
        if b.num_rows
    ]
    if not out_blocks:
        out = _empty_frontier(cand)
    else:
        out = pa.concat_tables(out_blocks).sort_by("seq")
    if with_stats:
        return out, {"skipped_seen":
                     n_after_dedup - out.num_rows - n_truncated}
    return out


# -- best-first frontier-table machinery -------------------------------------
#
# The priority pool lives as append-only parquet fragments; "removal" of
# popped rows is a driver-held tombstone set of push_seq keys (unique pool
# row ids), compacted away once dead rows outnumber live ones. Per superstep
# the pool is scanned ONCE as a distributed map (per-block tombstone filter +
# local top-k), so the driver only ever sees k rows per block — cheaper than
# the full sort-shuffle the north-star design budgets per scheduling round.
# A score-banded fragment layout would prune the scan further; the scan is
# already O(pool / cluster) wall-time per pop batch and amortizes with the
# (large, in table mode) bff_batch_size.


def pool_pop_topk(pool_ds: rd.Dataset, popped_keys, k: int):
    """Distributed batch pop: global k smallest pool rows by the reference
    heap order (score, depth, url, push_seq) — bff_strategy.py:129-152 —
    excluding tombstoned ``popped_keys`` (int64 push_seq array). Returns a
    driver pa.Table of <= k rows (the pop batch is O(bff_batch_size) by
    construction, never O(pool))."""
    import polars as pl

    popped_ref = ray.put(np.asarray(popped_keys, dtype=np.int64))

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        dead = ray.get(popped_ref)
        if len(dead):
            ps = batch.column("push_seq").to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(~np.isin(ps, dead)))
        if batch.num_rows > k:
            batch = (
                pl.from_arrow(batch)
                .sort(["score", "depth", "url", "push_seq"])
                .head(k)
                .to_arrow()
                .cast(batch.schema)
            )
        return batch

    parts = [
        b for b in pool_ds.map_batches(
            local_topk, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not parts:
        return None
    merged = pl.from_arrow(pa.concat_tables(parts)) \
        .sort(["score", "depth", "url", "push_seq"]).head(k)
    return merged.to_arrow().cast(parts[0].schema)


def bff_pool_append(cand_ds: rd.Dataset, seen, push_seq0: int,
                    kept_seqs, rem_of, parent_of: dict,
                    frag_dir: str) -> int:
    """Distributed best-first link discovery: gate this superstep's
    candidate parquet (already depth/passes-gated task-side by the sink)
    and append survivors to the pool as a new parquet fragment, replicating
    the driver law (crawl.py:_run_best_first candidate block) exactly:

    1. parent_seq must be a kept successful result (``kept_seqs``, small —
       bounded by the pop batch);
    2. visited check is a READ-ONLY contains() against the seen shards
       (bff marks visited only at pop time);
    3. per-parent capacity: candidate rank (in link_idx order) must be
       < ``rem_of[parent_seq]`` (the reference's streaming remaining law;
       ``rem_of=None`` disables);
    4. push_seq assigns sequentially from ``push_seq0`` in global
       (parent_seq, link_idx) order — one distributed sort, then a
       per-block offset map driven by tiny per-(block, parent) run-length
       metadata (#parents <= pop batch, so the broadcast maps are O(batch)).

    No candidate row ever transits driver heap. Returns the appended row
    count (the driver tracks pool size arithmetically)."""
    import pyarrow.compute as pc

    ks_ref = ray.put(np.asarray(sorted(kept_seqs), dtype=np.int64))
    shards, n_shards = seen.shards, seen.n_shards

    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ks = ray.get(ks_ref)
        ps = batch.column("parent_seq").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(np.isin(ps, ks)))
        if batch.num_rows == 0:
            return batch
        hashes = batch.column("url_hash") \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        shard_of = (hashes % np.uint64(n_shards)).astype(np.int64)
        vis = np.zeros(len(hashes), dtype=bool)
        futs, idxs = [], []
        for s in range(n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futs.append(shards[s].contains.remote(hashes[idx]))
                idxs.append(idx)
        for idx, r in zip(idxs, ray.get(futs)):
            vis[idx] = r
        return batch.filter(pa.array(~vis))

    sorted_ds = (
        cand_ds.map_batches(gate, batch_format="pyarrow", batch_size=None)
        .sort(["parent_seq", "link_idx"])
        .materialize()
    )

    def _runs(ps: np.ndarray):
        change = np.nonzero(np.diff(ps))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ps)]])
        return starts, ends

    def group_meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bps": pa.array([], pa.int64()),
                             "bli": pa.array([], pa.int64()),
                             "ps": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ps = batch.column("parent_seq").to_numpy(zero_copy_only=False)
        starts, ends = _runs(ps)
        # (bps, bli) = the block's first (parent_seq, link_idx): unique
        # block id under the sort (link_idx is unique within a parent)
        return pa.table({
            "bps": pa.array([int(ps[0])] * len(starts), pa.int64()),
            "bli": pa.array(
                [int(batch.column("link_idx")[0].as_py())] * len(starts),
                pa.int64()),
            "ps": pa.array(ps[starts].astype(np.int64)),
            "n": pa.array((ends - starts).astype(np.int64)),
        })

    meta_parts = [
        b for b in sorted_ds.map_batches(
            group_meta, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not meta_parts:
        return 0
    mt = pa.concat_tables(meta_parts).to_pandas() \
        .sort_values(["bps", "bli"], kind="mergesort")
    start_rank: dict[tuple, int] = {}
    totals: dict[int, int] = {}
    for r in mt.itertuples():
        p = int(r.ps)
        start_rank[(int(r.bps), int(r.bli), p)] = totals.get(p, 0)
        totals[p] = totals.get(p, 0) + int(r.n)
    kept_of = {
        p: (min(t, max(0, int(rem_of.get(p, 0)))) if rem_of is not None
            else t)
        for p, t in totals.items()
    }
    base: dict[int, int] = {}
    acc = push_seq0
    for p in sorted(totals):
        base[p] = acc
        acc += kept_of[p]
    n_new = acc - push_seq0
    if n_new == 0:
        return 0
    maps_ref = ray.put((start_rank, kept_of, base, dict(parent_of)))

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "url": pa.array([], pa.string()),
            "url_hash": pa.array([], pa.uint64()),
            "host": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "score": pa.array([], pa.float32()),
            "parent": pa.array([], pa.string()),
            "push_seq": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        sr, kept, bases, parents = ray.get(maps_ref)
        ps = batch.column("parent_seq").to_numpy(zero_copy_only=False)
        bkey = (int(ps[0]), int(batch.column("link_idx")[0].as_py()))
        starts, ends = _runs(ps)
        keep = np.zeros(len(ps), dtype=bool)
        pseq = np.empty(len(ps), dtype=np.int64)
        for s, e in zip(starts, ends):
            p = int(ps[s])
            r0 = sr[(bkey[0], bkey[1], p)]
            rr = np.arange(r0, r0 + (e - s), dtype=np.int64)
            keep[s:e] = rr < kept[p]
            pseq[s:e] = bases[p] + rr
        out = batch.filter(pa.array(keep))
        if out.num_rows == 0:
            return empty
        parent = pa.array(
            [parents.get(int(x), "") for x in
             out.column("parent_seq").to_numpy(zero_copy_only=False)],
            pa.string())
        return pa.table({
            "url": out.column("url"),
            "url_hash": out.column("url_hash").cast(pa.uint64()),
            "host": out.column("host"),
            "depth": pc.cast(pc.add(out.column("source_depth"), 1),
                             pa.int32()),
            "score": out.column("score").cast(pa.float32()),
            "parent": parent,
            "push_seq": pa.array(pseq[keep]),
        })

    sorted_ds.map_batches(
        emit, batch_format="pyarrow", batch_size=None
    ).write_parquet(frag_dir)
    return n_new
