"""BPE tokenizer training (Sennrich et al. 2016, ACL — "Neural
Machine Translation of Rare Words with Subword Units") over the
documents corpus.

The classic algorithm is two-phase, and the phases have very
different scale profiles:

1. **Word counting** — the only pass that touches the corpus.  Runs
   fully distributed: per-batch ``Counter`` partials folded by the
   string-key sortagg sum (one row per word type per block crosses
   the exchange; at 100 TB this is the same shape as corpus_vocab).
2. **Merge learning** — iterates over the WORD-TYPE table (bounded by
   Heaps' law: vocabulary grows ~O(sqrt(corpus)), and the merge loop
   never re-reads the corpus).  Each round is one ``map_batches``
   pass over the type Dataset emitting per-block pair-count partials;
   the driver folds the (bounded) pair table, picks the argmax merge
   under the deterministic (count desc, pair asc) tie rule, and
   broadcasts the rule for the vectorized re-encode pass.  The
   per-round driver fold is gated the same way the PageRank driver
   form is: it holds PAIR COUNTS (distinct adjacent symbol pairs),
   never corpus data.

Gates: the merge sequence is byte-equal to a pure-python reference
implementation of the paper's algorithm (tests/test_bpe.py), and the
query entry returns the learned merge table deterministically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

EOW = "</w>"


def _word_counts(sf_dir: str):
    """Distributed (word, n) over the documents text — the corpus
    pass.  Same tokenization convention as corpus_vocab."""
    from ..functions.sortagg import sorted_keyed_sum
    from .corpus import _read, _tokens

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for text in batch.column("text").to_pylist():
            c.update(_tokens(text))
        return pa.table({
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
    return sorted_keyed_sum(counts, "word", ["n"],
                            key_type=pa.string())


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-block adjacent-pair counts, weighted by word frequency."""
    import collections

    c = collections.Counter()
    for syms, n in zip(batch.column("syms").to_pylist(),
                       batch.column("n").to_pylist()):
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += n
    if not c:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    lefts, rights = zip(*c.keys())
    return pa.table({
        "left": pa.array(list(lefts), pa.string()),
        "right": pa.array(list(rights), pa.string()),
        "cnt": pa.array(list(c.values()), pa.int64()),
    })


def bpe_train(sf_dir: str, n_merges: int = 40, min_pair: int = 2):
    """Learn ``n_merges`` BPE merges; returns an Arrow table
    (rank, left, right, freq) in learning order.  Stops early when no
    pair reaches ``min_pair``."""
    wc = _word_counts(sf_dir)

    def symbolize(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        syms = [list(w) + [EOW] for w in words]
        return pa.table({
            "syms": pa.array(syms, pa.list_(pa.string())),
            "n": batch.column("n"),
        })

    types = wc.map_batches(symbolize, batch_format="pyarrow",
                           batch_size=None).materialize()

    # The merge loop is the one place the Dataset API is the wrong
    # tool: n_merges SEQUENTIAL rounds over a bounded working set pay
    # Dataset planning/execution fixed costs twice per round (~0.35 s
    # x 80 at toy scale).  The type table lives in the object store as
    # plain block refs and each round is ONE wave of raw Ray tasks
    # that fuse apply-previous-merge + count-pairs, returning the new
    # block (stays in the store) and its small pair table (fetched).
    # This is the documented raw-task escape hatch for iterative
    # algorithms; the law gate (byte-equal merge sequence vs the
    # reference implementation) is unchanged.
    @ray.remote(num_returns=2)
    def apply_and_count(tbl: pa.Table, rule):
        if tbl.num_rows == 0 or "syms" not in tbl.schema.names:
            # degenerate empty block (schema-less union remnant)
            empty = pa.table({
                "syms": pa.array([], pa.list_(pa.string())),
                "n": pa.array([], pa.int64()),
            })
            return empty, _pair_partials(empty)
        if rule is not None:
            a, b = rule
            ab = a + b
            out = []
            for syms in tbl.column("syms").to_pylist():
                i, m, res = 0, len(syms), []
                while i < m:
                    if (i + 1 < m and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(ab)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            tbl = pa.table({
                "syms": pa.array(out, pa.list_(pa.string())),
                "n": tbl.column("n"),
            })
        return tbl, _pair_partials(tbl)

    refs = types.to_arrow_refs()
    merges, rule = [], None
    for rank in range(n_merges):
        waves = [apply_and_count.remote(r, rule) for r in refs]
        refs = [w[0] for w in waves]
        parts = [p for p in ray.get([w[1] for w in waves])
                 if p.num_rows]
        if not parts:
            break
        folded = pa.concat_tables(parts).to_pandas() \
            .groupby(["left", "right"], as_index=False) \
            .agg(cnt=("cnt", "sum")) \
            .sort_values(["cnt", "left", "right"],
                         ascending=[False, True, True],
                         kind="mergesort")
        best = folded.iloc[0]
        if int(best["cnt"]) < min_pair:
            break
        a, b = str(best["left"]), str(best["right"])
        merges.append((rank, a, b, int(best["cnt"])))
        rule = (a, b)

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "freq": pa.array([m[3] for m in merges], pa.int64()),
    })


def _encode_word(word: str, prio: dict) -> list[str]:
    """Greedy merge-priority BPE encode of one word (the paper's
    apply-time procedure: repeatedly merge the pair with the LOWEST
    learned rank until no learned pair remains)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = prio.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def doc_bpe_encode(sf_dir: str, n_merges: int = 40):
    """Encode every document with the merges ``bpe_train`` learned on
    the same corpus: one exploded row per subword piece —
    (doc_id, pos, piece).  The trained merge table is tokenizer-sized
    (n_merges rows) — broadcast once; encode is a stateless map with a
    per-batch word-level memo (Zipf makes the hit rate high).  Law
    gate: piece concatenation round-trips the original tokens and
    every piece is a learned symbol (tests/test_bpe.py)."""
    from .corpus import _read, _tokens

    merges = bpe_train(sf_dir, n_merges=n_merges).to_pandas()
    prio = {(a, b): r for r, a, b in
            zip(merges["rank"], merges["left"], merges["right"])}
    pref = ray.put(prio)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(batch: pa.Table, pref=pref) -> pa.Table:
        prio = ray.get(pref)
        memo: dict = {}
        docs, poss, pieces = [], [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            out = []
            for w in _tokens(text):
                enc = memo.get(w)
                if enc is None:
                    enc = _encode_word(w, prio)
                    memo[w] = enc
                out.extend(enc)
            docs.append(np.full(len(out), d, np.int64))
            poss.append(np.arange(len(out), dtype=np.int64))
            pieces.extend(out)
        if not pieces:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "piece": pa.array([], pa.string())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(docs)),
            "pos": pa.array(np.concatenate(poss)),
            "piece": pa.array(pieces, pa.string()),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          batch_size=256).sort(["doc_id", "pos"])
