"""Corpus-preparation operators a training-data pipeline needs beyond
the reference's own surface: benchmark decontamination, inverted-index
postings, and stratified deterministic sampling.

Reference scope note: cbwinslow/crawl4ai has no corpus-level operators
(its unit is one page); these are the Ray-Data-native corpus layer the
SURVEY's §2 "beyond the reference" mandate calls for. All three are
DuckDB-oracle-gated.

Scale shapes:
- decontamination (Brown et al. 2020 appendix C / The Pile: n-gram
  overlap against held-out benchmarks): the benchmark side is SMALL by
  nature — build its n-gram set once, ``ray.put`` it, and score every
  batch against the broadcast set; no shuffle at all, output is one row
  per document.
- postings: tf is computed entirely inside a document, so the map stage
  emits final (term, doc_id, tf) rows with no shuffle; only df (a
  per-term count) shuffles, carrying one row per distinct (term, doc)
  — then a term-keyed hash join attaches df. No driver state.
- stratified sample: per-batch local top-n per stratum (top-n of a
  union is the top-n of per-part top-ns) caps the shuffle at
  n rows/stratum/block; the final per-stratum selection ranks at most
  n*n_blocks rows. Hash-ordered (md5) so every engine picks the SAME
  docs — no RNG state, reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _tokens(text: str) -> list[str]:
    """The corpus tokenization convention (same as bm25_rank /
    corpus_top_terms: lower + whitespace split)."""
    return (text or "").lower().split()


def _ngrams(words: list[str], n: int) -> set[str]:
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def decontaminate(sf_dir: str, n: int = 3, bench_max_doc: int = 20):
    """Benchmark-contamination scan: distinct word n-gram overlap of
    every document against a benchmark set (docs with
    doc_id < bench_max_doc stand in for the held-out eval set).

    Counts are integer-exact (n_hit / n_grams as columns, the
    contaminated flag compares 2*n_hit >= n_grams) so the DuckDB oracle
    matches bit-for-bit with no float-rounding-mode hazards.
    """
    bench_tbl = pa.concat_tables(
        _read(sf_dir, "documents", ["doc_id", "text"])
        .filter(expr=f"doc_id < {bench_max_doc}")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    bench: set[str] = set()
    for text in bench_tbl.column("text").to_pylist():
        bench |= _ngrams(_tokens(text), n)
    bench_ref = ray.put(bench)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        n_grams, n_hit = [], []
        for text in batch.column("text").to_pylist():
            g = _ngrams(_tokens(text), n)
            n_grams.append(len(g))
            n_hit.append(len(g & b))
        ng = np.asarray(n_grams, dtype=np.int64)
        nh = np.asarray(n_hit, dtype=np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_grams": pa.array(ng),
            "n_hit": pa.array(nh),
            "contaminated": pa.array(
                ((2 * nh >= ng) & (ng > 0)).astype(np.int32)),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def corpus_postings(sf_dir: str, min_df: int = 2):
    """Inverted-index postings: (term, doc_id, tf, df) for every term
    with document frequency >= min_df."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        import collections

        terms, docs, tfs = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for term, tf in collections.Counter(_tokens(text)).items():
                terms.append(term)
                docs.append(doc_id)
                tfs.append(tf)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "tf": pa.array(tfs, type=pa.int64()),
        })

    postings = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None)
    # postings are distinct per (term, doc): df is a plain per-term count
    df = postings.groupby("term").aggregate(Count(alias_name="df"))
    from .dedup import _join_parts

    joined = postings.join(
        df, join_type="inner", on=("term",),
        num_partitions=_join_parts(postings, df),
    )
    return joined.filter(expr=f"df >= {min_df}")


def stratified_sample(sf_dir: str, n_per: int = 25):
    """Deterministic stratified sample: the n_per docs per language
    whose md5(doc_id) hex prefix sorts lowest (hash order = reproducible
    pseudo-random order, identical in python and DuckDB)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def with_hash(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h8 = [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in ids]
        t = batch.append_column("h8", pa.array(h8, type=pa.string()))
        df = t.to_pandas()
        df = df.sort_values(["lang", "h8", "doc_id"])
        return pa.Table.from_pandas(df.groupby("lang").head(n_per),
                                    preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h8", "doc_id"]).head(n_per)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ds.map_batches(with_hash, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .map_groups(pick, batch_format="pandas")
    )


def tfidf_topterms(sf_dir: str, k: int = 5):
    """Per-document TF-IDF top-k terms — the classic corpus
    summarization / keyword-extraction operator (Sparck Jones 1972).

    Scale shape: tf is per-document (map-side, no shuffle); df shuffles
    one row per distinct (term, doc); idf attaches via a term-keyed hash
    join; the per-doc top-k ranks inside ``groupby(doc_id).map_groups``
    where each group is one document's vocabulary (bounded by doc
    length, never by corpus size). N (total docs) is one scalar.

    tfidf = tf * ln((1+N)/(1+df)), rounded to 6 dp on BOTH sides (the
    DuckDB oracle applies the same formula in float64; the products are
    irrational so 6-dp midpoint rounding-mode hazards don't arise —
    validated at sf0.001/0.01).
    """
    import math

    from .dedup import _join_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def explode(batch: pa.Table) -> pa.Table:
        import collections

        terms, docs, tfs = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for term, tf in collections.Counter(_tokens(text)).items():
                terms.append(term)
                docs.append(doc_id)
                tfs.append(tf)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "tf": pa.array(tfs, type=pa.int64()),
        })

    postings = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None)
    df = postings.groupby("term").aggregate(Count(alias_name="df"))
    joined = postings.join(
        df, join_type="inner", on=("term",),
        num_partitions=_join_parts(postings, df),
    )

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy().astype(np.float64)
        dfv = batch.column("df").to_numpy().astype(np.float64)
        # scalar math.log per distinct df value would be cheaper; the
        # vector np.log is bit-identical to libm log on float64
        tfidf = np.round(tf * np.log((1.0 + n_docs) / (1.0 + dfv)), 6)
        return batch.append_column("tfidf", pa.array(tfidf))

    scored = joined.map_batches(score, batch_format="pyarrow")

    # per-doc top-k as ONE global sort + vectorized run-position
    # filter instead of 5000 per-doc map_groups Python calls (the
    # dominant cost of this operator at sf0.1); each block's first and
    # last doc — the only runs that can span blocks — complete on the
    # driver and union back (≤ 2 × blocks docs).
    out_cols = ["doc_id", "term", "tf", "df", "tfidf"]
    s = scored.sort(["doc_id", "tfidf", "term"],
                    descending=[False, True, False])

    def topk_runs(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(d)
        if n == 0:
            cols = {c: batch.column(c) for c in out_cols}
            cols["rnk"] = pa.array([], pa.int64())
            cols["_bnd"] = pa.array([], pa.bool_())
            return pa.table(cols)
        starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        inv = np.searchsorted(starts, np.arange(n), side="right") - 1
        pos = np.arange(n) - starts[inv]
        bnd_row = (d == d[0]) | (d == d[-1])
        keep = bnd_row | (pos < k)
        t = batch.filter(pa.array(keep))
        cols = {c: t.column(c) for c in out_cols}
        cols["rnk"] = pa.array((pos[keep] + 1).astype(np.int64))
        cols["_bnd"] = pa.array(bnd_row[keep])
        return pa.table(cols)

    parts = s.map_batches(topk_runs, batch_format="pyarrow",
                          batch_size=None).materialize()
    interior = parts.filter(expr="_bnd == False") \
        .select_columns(out_cols + ["rnk"])
    bpd = parts.filter(expr="_bnd == True").to_pandas() \
        .drop(columns=["rnk", "_bnd"])
    if len(bpd) == 0:
        return interior
    bpd = bpd.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True])
    bpd = bpd.groupby("doc_id").head(k).reset_index(drop=True)
    bpd["rnk"] = bpd.groupby("doc_id").cumcount().to_numpy() + 1
    return interior.union(rd.from_arrow(
        pa.Table.from_pandas(bpd[out_cols + ["rnk"]],
                             preserve_index=False)))


def ngram_dup_stats(sf_dir: str, n: int = 5):
    """Cross-document duplicate n-gram statistics — the corpus-level
    duplication measure of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"): for each document, how many of
    its word 5-gram positions carry a gram that also appears in at
    least one OTHER document. Complements doc_repetition_stats (Gopher
    WITHIN-doc repetition) with the BETWEEN-doc axis.

    Integer-exact outputs (counts only) — no float hazards against the
    DuckDB oracle.

    Scale shape: the explode emits one row per distinct (doc, gram)
    with its in-doc count (map-side combine); ndocs per gram is a plain
    groupby count over those rows; a gram-keyed hash join attaches it;
    the final per-doc aggregate ships 4 ints per (doc, gram). Nothing
    is driver-resident and no stage holds more than a block.
    """
    import collections

    from .dedup import _join_parts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        docs, grams, cnts = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            w = _tokens(text)
            c = collections.Counter(
                " ".join(w[i:i + n]) for i in range(len(w) - n + 1))
            for g, cnt in c.items():
                docs.append(doc_id)
                grams.append(g)
                cnts.append(cnt)
        return pa.table({
            "doc_id": pa.array(docs, type=pa.int64()),
            "g": pa.array(grams, type=pa.string()),
            "cnt": pa.array(cnts, type=pa.int64()),
        })

    percnt = ds.map_batches(explode, batch_format="pyarrow",
                            batch_size=None)
    nd = percnt.groupby("g").aggregate(Count(alias_name="ndocs"))
    joined = percnt.join(nd, join_type="inner", on=("g",),
                         num_partitions=_join_parts(percnt, nd))

    def partial(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        if len(doc) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_grams": z,
                             "n_dup_grams": z, "n_distinct_grams": z,
                             "n_dup_distinct": z})
        cnt = batch.column("cnt").to_numpy().astype(np.float64)
        dup = (batch.column("ndocs").to_numpy() >= 2).astype(np.float64)
        ks, inv = np.unique(doc, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(ks, type=pa.int64()),
            "n_grams": pa.array(np.bincount(inv, weights=cnt)
                                .astype(np.int64)),
            "n_dup_grams": pa.array(np.bincount(inv, weights=cnt * dup)
                                    .astype(np.int64)),
            "n_distinct_grams": pa.array(np.bincount(inv)
                                         .astype(np.int64)),
            "n_dup_distinct": pa.array(np.bincount(inv, weights=dup)
                                       .astype(np.int64)),
        })

    from ..functions.sortagg import sorted_keyed_sum

    return sorted_keyed_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        "doc_id",
        ["n_grams", "n_dup_grams", "n_distinct_grams",
         "n_dup_distinct"])


def substr_dedup(sf_dir: str, length: int = 8, min_count: int = 2,
                 key: str = "string"):
    """ExactSubstr deduplication (Lee et al. 2022 §4.1): find the exact
    token substrings of ``length`` tokens that occur at least
    ``min_count`` times in the WHOLE corpus (including repeats inside
    one document, per the paper), and emit per-document CUT SPANS — the
    maximal merged [cut_start, cut_end) token intervals covered by
    duplicated windows, i.e. the ranges the paper's pipeline would
    remove before training. Complements ngram_dup_stats (counts only)
    with the actionable span output.

    Output: one row per (doc, span): doc_id, cut_start, cut_end
    (0-based token indices, end exclusive), n_tokens = span width.

    Distributed shape: the explode emits one row per window position
    (doc_id, pos, window-key); corpus frequency is a plain groupby-count
    over the window key; an inner join against the ``>= min_count``
    keys keeps only duplicated positions (typically a small fraction);
    interval merging is a bounded ``map_groups`` per document (group
    size <= the doc's token count). Nothing is driver-resident.

    ``key="string"`` shuffles the L-token window text itself — exact,
    and the DuckDB-oracle form. ``key="hash"`` shuffles an 8-byte
    hash of the window instead — the 100 TB path (the shuffle carries
    ~8 bytes/window instead of ~6L; the hash is masked to 63 bits so
    the key column stays int64 through Ray's groupby, whose output
    blocks re-infer Python ints and overflow on uint64-range values;
    collision probability is bounded by n²/2⁶³ ≈ 1e-7 at a billion
    windows; the paper's exact alternative is a distributed suffix
    array, which buys nothing at this window length). Both paths
    produce identical spans on any collision-free corpus and are
    tested equal.
    """
    from ..functions.urlkit import hash64
    from .dedup import _join_parts

    if key not in ("string", "hash"):
        raise ValueError(f"key must be 'string' or 'hash', got {key!r}")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        docs, poss, keys = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            w = _tokens(text)
            for i in range(len(w) - length + 1):
                docs.append(doc_id)
                poss.append(i)
                keys.append(" ".join(w[i:i + length]))
        if key == "hash":
            karr = pa.array([hash64(g) & 0x7FFF_FFFF_FFFF_FFFF
                             for g in keys], type=pa.int64())
        else:
            karr = pa.array(keys, type=pa.string())
        return pa.table({
            "doc_id": pa.array(docs, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
            "g": karr,
        })

    # batch_size=None keeps one task per input block — a fixed
    # batch_size here COALESCES the doc stream (5000 docs -> 2 tasks at
    # 4096) and the whole window groupby inherits parallelism 2
    # (ds.stats(): Aggregate 20s -> 4s at sf0.1/32cpu after the change)
    pos_tbl = ds.map_batches(explode, batch_format="pyarrow",
                             batch_size=None)
    # ~one group per corpus token position: the sortagg shape (and
    # only the key column enters the count exchange)
    from ..functions.sortagg import sorted_keyed_count

    cnt = sorted_keyed_count(pos_tbl.select_columns(["g"]), "g",
                             out="c")

    def keep_dup(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column("c"), min_count))

    dup_keys = cnt.map_batches(keep_dup, batch_format="pyarrow") \
        .materialize()
    # tiny dup sets must collapse to ONE join partition — an all-empty
    # hash-join partition builds a zero-column table and acero fails
    # ("No match ... FieldRef(g)"; the graph._pr_parts quirk)
    parts = (1 if dup_keys.count() < 1024
             else _join_parts(pos_tbl, dup_keys))
    joined = pos_tbl.join(dup_keys, join_type="inner", on=("g",),
                          num_partitions=parts)

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        p = np.sort(g["pos"].to_numpy())
        brk = np.where(np.diff(p) > length)[0]
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(p) - 1]))
        cut_start = p[starts]
        cut_end = p[ends] + length
        return pd.DataFrame({
            "doc_id": np.full(len(starts), int(g["doc_id"].iloc[0]),
                              dtype=np.int64),
            "cut_start": cut_start.astype(np.int64),
            "cut_end": cut_end.astype(np.int64),
            "n_tokens": (cut_end - cut_start).astype(np.int64),
        })

    return joined.groupby("doc_id").map_groups(merge_spans,
                                               batch_format="pandas")


def weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted sampling without replacement
    (Efraimidis & Spirakis, IPL 2006): rank every document by
    ``ln(u)/w`` where ``u`` is a hash-derived uniform and ``w`` the
    weight (n_chars — the "sample long documents more" corpus law);
    the global top-k of that key IS a weighted sample, and because u
    comes from md5(doc_id) instead of an RNG the pick is reproducible
    across engines — the same determinism trick as stratified_sample.

    Scale shape: the key is per-row (map-side); each batch keeps its
    local top-k, so the final exchange sorts at most k·n_blocks rows —
    the top-k-of-union law. DuckDB-oracle-gated (key computed with the
    same integer-exact u and float64 ln on both sides, rounded to
    10 dp; doc_id tiebreak)."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def key_and_prune(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        w = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        u = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in ids], np.float64) / float(2 ** 32)
        skey = np.round(np.log(u) / w, 10)
        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": batch.column("n_chars"),
            "skey": pa.array(skey),
        })
        df = t.to_pandas().sort_values(
            ["skey", "doc_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["skey", "doc_id"],
                            ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    def prune_again(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["skey", "doc_id"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    pruned = ds.map_batches(key_and_prune, batch_format="pyarrow",
                            batch_size=8192)
    # second-level local top-k: the first prune leaves k rows/block
    # (k x n_blocks globally — ~60M rows at 10^10 docs); re-batching
    # k x 8192 rows per task bounds the final single group at
    # k x blocks/8192 regardless of input size (top-k-of-union law
    # applies at every level)
    pruned = pruned.map_batches(prune_again, batch_format="pyarrow",
                                batch_size=8192 * k)
    return (pruned
            .map_batches(lambda t: t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, np.int64))),
                batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: finish(g.drop(columns=["_g"])),
                        batch_format="pandas"))


def pack_sequences(sf_dir: str, capacity: int = 2048,
                   tokenizer: str = "whitespace"):
    """Sequence packing for training — concatenate documents in doc_id
    order into fixed-capacity token bins (the standard pre-training
    batching transform) and emit each document's placement:
    ``(doc_id, n_tokens, start_offset, first_bin, last_bin)`` where
    offsets index the global concatenated token stream and
    ``bin = offset // capacity`` (documents may straddle bins).

    Scale shape — the distributed PREFIX SCAN (two-pass exclusive
    cumsum, the Blelloch 1990 pattern): pass 1 computes one token-count
    partial per block (tiny rows to the driver); the driver cumsums the
    per-block partials into block base offsets (one int per block);
    pass 2 broadcasts the bases and each block derives its rows' exact
    global offsets locally. No shuffle at all — the scan's sequential
    dependency is carried entirely by the block-offset vector. Blocks
    are indexed by the stable doc_id order (sort key = the block's min
    doc_id), so the result is independent of read parallelism.
    Integer-exact; DuckDB-oracle-gated against a window SUM.

    ``tokenizer`` selects the counting contract ('whitespace' default,
    'bpeish' for the RE2-compatible BPE-style pre-tokenizer — also
    SQL-oracle-checkable — or a HuggingFace model name when
    transformers is installed). The tokenizer loads once per worker
    process (functions/tokenizers.load_tokenizer is process-cached),
    never per batch.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(batch: pa.Table, spec=tokenizer) -> pa.Table:
        from ..functions.tokenizers import load_tokenizer

        tok = load_tokenizer(spec)
        toks = [tok.count(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(toks, pa.int64()),
        })

    counted = ds.map_batches(counts, batch_format="pyarrow",
                             batch_size=8192).materialize()

    # pass 1: per-block partials. batch_size=None = one batch per BLOCK
    # of the materialized dataset, so pass 2 (same dataset, same
    # batch_size=None) sees exactly the same boundaries and can key its
    # base lookup by the block's min doc_id. Partials are one tiny row
    # per block — driver-safe at any input size.
    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bid": pa.array([], pa.int64()),
                             "tot": pa.array([], pa.int64())})
        ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "bid": pa.array([int(ids.min())], pa.int64()),
            "tot": pa.array([int(batch.column("n_tokens")
                                 .to_numpy().sum())], pa.int64()),
        })

    blocks = sorted(
        (r["bid"], r["tot"])
        for r in counted.map_batches(block_partial,
                                     batch_format="pyarrow",
                                     batch_size=None).iter_rows())
    bases = {}
    run = 0
    for bid, tot in blocks:
        bases[bid] = run
        run += tot

    import ray

    bref = ray.put(bases)

    def place(batch: pa.Table, bref=bref) -> pa.Table:
        bases = ray.get(bref)
        df = batch.to_pandas().sort_values("doc_id")
        base = bases[int(df["doc_id"].min())]
        start = base + df["n_tokens"].cumsum().shift(fill_value=0)
        start = start.to_numpy(dtype=np.int64)
        n = df["n_tokens"].to_numpy(dtype=np.int64)
        end = start + n
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            "n_tokens": pa.array(n),
            "start_offset": pa.array(start),
            "first_bin": pa.array(start // capacity),
            # empty docs occupy no tokens: their bin interval collapses
            # to the start bin (max(end-1, start) guard)
            "last_bin": pa.array(np.maximum(end - 1, start) // capacity),
        })

    return counted.map_batches(place, batch_format="pyarrow",
                               batch_size=None)


def interleaved_pack(docs_ds, capacity: int = 2048,
                     media_tokens: int = 64):
    """Sequence packing for INTERLEAVED text+media documents — the
    multimodal pre-training batching transform (MMC4/OBELICS-style
    corpora): each document's token cost is its whitespace text tokens
    plus a fixed ``media_tokens`` budget per media span (the
    patch-token placeholder convention), and documents concatenate in
    url order into fixed-``capacity`` bins. Emits per-doc placement
    ``(url, n_text_tokens, n_media, n_tokens, start_offset, first_bin,
    last_bin)``.

    Scale shape — the same distributed prefix scan as
    ``pack_sequences`` (two-pass exclusive cumsum over url-ranged
    blocks): a distributed sort by url makes blocks url-ranged, pass 1
    ships ONE (min-url, total) row per block to the driver, the driver
    cumsums block bases, pass 2 broadcasts them and every block places
    its rows locally. No shuffle beyond the sort; integer-exact."""
    import ray

    def counts(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        txt_t, med_n = [], []
        for spans in batch.column("spans").to_pylist():
            t = sum(len((s["text"] or "").lower().split())
                    for s in spans if s["kind"] == "text")
            m = sum(1 for s in spans if s["media_ref"])
            txt_t.append(t)
            med_n.append(m)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "n_text_tokens": pa.array(txt_t, pa.int64()),
            "n_media": pa.array(med_n, pa.int64()),
        })

    counted = docs_ds.map_batches(counts, batch_format="pyarrow",
                                  batch_size=8192) \
        .sort("url").materialize()

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bid": pa.array([], pa.string()),
                             "tot": pa.array([], pa.int64())})
        urls = batch.column("url").to_pylist()
        tot = int(batch.column("n_text_tokens").to_numpy().sum()
                  + media_tokens
                  * batch.column("n_media").to_numpy().sum())
        return pa.table({
            "bid": pa.array([min(urls)], pa.string()),
            "tot": pa.array([tot], pa.int64()),
        })

    blocks = sorted(
        (r["bid"], r["tot"])
        for r in counted.map_batches(block_partial,
                                     batch_format="pyarrow",
                                     batch_size=None).iter_rows())
    bases = {}
    run = 0
    for bid, tot in blocks:
        bases[bid] = run
        run += tot
    bref = ray.put(bases)

    def place(batch: pa.Table, bref=bref) -> pa.Table:
        bases = ray.get(bref)
        df = batch.to_pandas().sort_values("url")
        n = (df["n_text_tokens"].to_numpy(np.int64)
             + media_tokens * df["n_media"].to_numpy(np.int64))
        base = bases[str(df["url"].iloc[0])]
        start = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        end = start + n
        return pa.table({
            "url": pa.array(df["url"].tolist(), pa.string()),
            "n_text_tokens": pa.array(
                df["n_text_tokens"].to_numpy(np.int64)),
            "n_media": pa.array(df["n_media"].to_numpy(np.int64)),
            "n_tokens": pa.array(n),
            "start_offset": pa.array(start.astype(np.int64)),
            "first_bin": pa.array((start // capacity)
                                  .astype(np.int64)),
            "last_bin": pa.array((np.maximum(end - 1, start)
                                  // capacity).astype(np.int64)),
        })

    return counted.map_batches(place, batch_format="pyarrow",
                               batch_size=None)


def shuffle_shards(sf_dir: str, n_shards: int = 8, seed: int = 7):
    """Deterministic training-shard export assignment — the
    write-training-shards transform: a seed-rotatable global hash
    shuffle (shard = md5-uniform(doc_id:seed) % n_shards, balanced in
    expectation) with exact in-shard positions in hash order, so every
    engine/run lays out byte-identical shards without a random_shuffle
    whose result depends on block structure.

    Scale shape: the hash assignment is a stateless map; positions come
    from the shared partitioned-ROW_NUMBER machinery
    (analysis._pnum_prepare/_pnum_rn — sort + block-offset prefix scan),
    so no shard is ever a single task and nothing but one tiny row per
    (block, shard) visits the driver. DuckDB-oracle-gated
    (`doc_shuffle_shards`; same md5-hex law as weighted_sample)."""
    import hashlib

    import ray

    from .analysis import _pnum_prepare, _pnum_rn

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hv = np.array(
            [int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16)
             for i in ids], np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "hv": pa.array(hv),
            "shard_id": pa.array(hv % n_shards),
        })

    hashed = ds.map_batches(assign_shard, batch_format="pyarrow",
                            batch_size=8192)
    sorted_ds, bases, _totals = _pnum_prepare(
        hashed, ["shard_id", "hv", "doc_id"], [False, False, False],
        "shard_id", "doc_id")
    bref = ray.put(bases)

    def emit(batch: pa.Table, bref=bref) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shard_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        rn, _pr = _pnum_rn(batch, "shard_id", "doc_id", _ray.get(bref))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "shard_id": batch.column("shard_id"),
            "pos": pa.array(rn - 1),
        })

    return sorted_ds.map_batches(emit, batch_format="pyarrow",
                                 batch_size=None)


# ---------------------------------------------------------------------------
# round-5: PII redaction and LM-perplexity filtering — the two C4/CCNet
# cleaning steps the corpus layer still lacked.
# ---------------------------------------------------------------------------

# RE2-compatible patterns (no backrefs/lookarounds) so the SAME pattern
# text runs in Arrow's RE2 kernels here and in DuckDB's RE2 oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b555-\d{4}\b"


def pii_redact(sf_dir: str):
    """C4/Dolma-style PII scrub (Raffel et al. 2020 §2.2 cleaning;
    Dolma's PII taggers): count and mask email / IPv4 / phone spans in
    every document, emitting the redacted text plus per-kind counts.

    The synthetic documents table carries no organic PII, so the
    pipeline first injects a deterministic PII suffix derived from
    doc_id (email, IP, 555-phone) — the SQL oracle builds the SAME
    augmented string from the same columns, then counts and redacts
    independently with DuckDB's regex engine, making the regex
    semantics and replacement order a real cross-check.

    Scale shape: one stateless ``map_batches`` of pure Arrow compute —
    string concat, ``count_substring_regex``, three chained
    ``replace_substring_regex`` — zero Python per row, zero shuffle;
    at 100 TB this is the cheapest kind of stage there is (reference
    scope note: crawl4ai's per-page sanitizers live in utils.py; this
    is the corpus-wide batch form)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        txt = pc.cast(batch.column("text"), pa.string())
        dstr = pc.cast(did, pa.string())
        dnp = did.to_numpy(zero_copy_only=False).astype(np.int64)

        def _m(mod: int) -> pa.Array:  # pyarrow 16 has no pc.mod kernel
            return pc.cast(pa.array(dnp % mod), pa.string())

        aug = pc.binary_join_element_wise(
            txt, pa.scalar(" contact user"), dstr,
            pa.scalar("@mail.example.com from 10."),
            _m(200), pa.scalar("."), _m(250), pa.scalar("."), _m(100),
            pa.scalar(" tel 555-"),
            pc.utf8_lpad(pc.cast(pa.array((dnp * 7) % 10000), pa.string()),
                         4, "0"),
            "")
        n_email = pc.count_substring_regex(aug, PII_EMAIL)
        clean = pc.replace_substring_regex(aug, PII_EMAIL, "<EMAIL>")
        n_ip = pc.count_substring_regex(clean, PII_IPV4)
        clean = pc.replace_substring_regex(clean, PII_IPV4, "<IP>")
        n_phone = pc.count_substring_regex(clean, PII_PHONE)
        clean = pc.replace_substring_regex(clean, PII_PHONE, "<PHONE>")
        return pa.table({
            "doc_id": did,
            "n_email": pc.cast(n_email, pa.int64()),
            "n_ip": pc.cast(n_ip, pa.int64()),
            "n_phone": pc.cast(n_phone, pa.int64()),
            "clean_text": clean,
        })

    return ds.map_batches(scrub, batch_format="pyarrow",
                          batch_size=None)


def lm_perplexity(sf_dir: str, train_source: str = "src0",
                  alpha: float = 0.5, max_grams: int | None = None,
                  docs=None):
    """CCNet-style LM-perplexity quality signal (Wenzek et al. 2020:
    score every document under a language model trained on a trusted
    slice; low perplexity ≈ fluent text): an add-α-smoothed bigram LM
    with unigram-count denominators is trained on the ``train_source``
    documents, then every document is scored —
    ``p(w_i | w_{i-1}) = (c(w1,w2) + α) / (c(w1) + α·V)`` with V the
    training vocabulary size, ``ppl = exp(-mean log p)`` over positions
    2..n. Documents with fewer than two tokens drop out (no scorable
    transition), matching the SQL oracle's group-by.

    Scale shape: counting is per-batch pandas-groupby partials
    (unigrams ride as ``w2=''`` rows, impossible for real tokens) into
    ONE (w1, w2) groupby — the exchange is bounded by distinct grams
    per block, not tokens; the fitted model is a broadcast artifact
    (``ray.put`` once), exactly CCNet's shape (its KenLM file ships to
    every worker), with vocabulary pruning the documented knob if a
    corpus's gram table outgrows the object store. Scoring is an
    embarrassingly-parallel ``map_batches``: tokens map to ids via one
    vectorized ``pd.Index.get_indexer``, bigram counts via one int64
    key lookup against an indexed Series — no per-token Python.
    Perplexity rounds with DuckDB's half-away-from-zero law
    (analysis._round2_duck); log values are irrational so midpoints
    cannot occur and 2dp absorbs summation-order ulps."""
    import ray
    from ray.data.aggregate import Sum

    from .analysis import _round2_duck

    if docs is None:  # any (doc_id, text, source) Dataset works —
        # crawl_corpus_prepare feeds crawled markdown through here
        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        txt = batch.column("text").to_pylist()
        w1, w2 = [], []
        for s, t in zip(src, txt):
            if s != train_source:
                continue
            toks = (t or "").lower().split()
            w1.extend(toks)
            w2.extend([""] * len(toks))          # unigram marker rows
            w1.extend(toks[:-1])
            w2.extend(toks[1:])
        if not w1:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        g = pd.DataFrame({"w1": w1, "w2": w2}) \
            .groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    gram_ds = docs.map_batches(gram_partial, batch_format="pyarrow",
                               batch_size=None) \
        .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c")) \
        .materialize()  # compact gram table feeds both branches once

    n_grams = gram_ds.count()  # free: gram_ds is materialized
    if max_grams is None and n_grams > 20_000_000:
        raise ValueError(
            f"lm_perplexity: {n_grams} distinct grams exceed the "
            "broadcast-model budget; pass max_grams=<N> to prune the "
            "bigram table (count-cutoff, KenLM-style) — the "
            "fail-loud-not-silently-collect discipline")
    uni = gram_ds.filter(expr="w2 == ''").to_pandas()
    big_ds = gram_ds.filter(expr="w2 != ''")
    if max_grams is not None:
        # count-cutoff pruning (KenLM-style): keep the max_grams most
        # frequent bigrams via a distributed sort+limit — the knob that
        # bounds the broadcast model when a corpus's gram table would
        # outgrow the object store. Pruned transitions fall back to the
        # add-α floor, so pruning can only RAISE a doc's perplexity
        # (law-tested); unigrams stay complete (Heaps-law bounded).
        big_ds = big_ds.sort(["c", "w1", "w2"],
                             descending=[True, False, False]) \
            .limit(max_grams)
    big = big_ds.to_pandas()

    vocab = pd.Index(uni["w1"].to_numpy())
    uni_c = uni["c"].to_numpy(np.int64)
    nv = len(vocab)
    i1 = vocab.get_indexer(big["w1"].to_numpy())
    i2 = vocab.get_indexer(big["w2"].to_numpy())
    big_c = pd.Series(big["c"].to_numpy(np.float64),
                      index=i1.astype(np.int64) * nv + i2)
    model = ray.put((vocab, uni_c, big_c, nv))

    def score(batch: pa.Table, model=model) -> pa.Table:
        import ray as _ray

        vocab, uni_c, big_c, nv = _ray.get(model)
        ids, toks, lens = [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            tk = (t or "").lower().split()
            if len(tk) < 2:
                continue
            ids.append(i)
            toks.extend(tk)
            lens.append(len(tk))
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lm_tokens": pa.array([], pa.int64()),
                             "ppl": pa.array([], pa.float64())})
        tid = vocab.get_indexer(np.asarray(toks, object))
        lens = np.asarray(lens, np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        prev, cur = tid[:-1], tid[1:]
        uc = np.where(prev >= 0, uni_c[np.maximum(prev, 0)], 0)
        key = prev.astype(np.int64) * nv + cur
        bc = pd.Series(key).map(big_c).fillna(0.0).to_numpy()
        bc[(prev < 0) | (cur < 0)] = 0.0       # OOV never counted
        lp = np.log((bc + alpha) / (uc + alpha * nv))
        # zero out the seam transitions (last token of doc k -> first
        # of doc k+1) and the per-doc reduce via reduceat on starts
        lp[ends[:-1] - 1] = 0.0
        sums = np.add.reduceat(
            np.concatenate([lp, [0.0]]), starts)[:len(ids)]
        ppl = np.exp(-sums / (lens - 1))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lm_tokens": pa.array(lens - 1),
            "ppl": pa.array(_round2_duck(ppl)),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=None).sort("doc_id")


def temperature_mix(sf_dir: str, tau: float = 0.7, n_total: int = 200):
    """Temperature-based source mixing (the multilingual-sampling law
    of mT5 / XLM-R, used for source mixing in LLaMA-style pipelines):
    source s gets a quota ∝ size_s^tau of the n_total sampled docs —
    tau=1 is proportional, tau→0 approaches uniform, 0<tau<1 upweights
    small sources. Within a source, picks are the stratified_sample
    hash order (md5(doc_id) prefix), so the sample is deterministic
    and engine-independent end to end.

    Exactness: the tempered weight rounds to 6dp with DuckDB's
    half-away-from-zero law before the quota division, and quotas are
    floor(n_total·w/Σw) — integer on both sides (the floor boundary
    is ulp-safe because pow outputs are irrational; same stance as
    doc_weighted_sample's 10dp ln rounding).

    Scale shape: per-source sizes reduce through per-batch partials
    into ONE tiny groupby (source cardinality is small by nature);
    quotas broadcast as a dict; the per-source selection is the
    local-top-q-per-block law (top-q of a union = top-q of per-part
    top-qs), so the shuffle carries ≤ q rows per source per block."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def szpart(batch: pa.Table) -> pa.Table:
        df = batch.select(["source", "n_chars"]).to_pandas()
        g = df.groupby("source", as_index=False)["n_chars"].sum()
        g["n_chars"] = g["n_chars"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    sizes = ds.map_batches(szpart, batch_format="pyarrow",
                           batch_size=8192) \
        .groupby("source").aggregate(Sum("n_chars", alias_name="size")) \
        .to_pandas()
    # DuckDB round(x, 6): half away from zero (x > 0 here)
    w = np.floor(np.power(sizes["size"].to_numpy(np.float64), tau)
                 * 1e6 + 0.5) / 1e6
    quota = np.floor(n_total * w / w.sum()).astype(np.int64)
    qmap = dict(zip(sizes["source"].tolist(), quota.tolist()))
    qref = ray.put(qmap)

    def with_hash(batch: pa.Table, qref=qref) -> pa.Table:
        q = ray.get(qref)
        ids = batch.column("doc_id").to_pylist()
        h8 = [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in ids]
        df = batch.append_column("h8", pa.array(h8, pa.string())) \
            .select(["doc_id", "source", "h8"]).to_pandas() \
            .sort_values(["source", "h8", "doc_id"])
        parts = [g.head(q.get(s, 0))
                 for s, g in df.groupby("source", sort=False)]
        out = pd.concat(parts) if parts else df.head(0)
        return pa.Table.from_pandas(out, preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        g = g.sort_values(["h8", "doc_id"]) \
            .head(q.get(g["source"].iloc[0], 0)).reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.map_batches(with_hash, batch_format="pyarrow",
                          batch_size=8192) \
        .groupby("source").map_groups(pick, batch_format="pandas")


def substr_apply(sf_dir: str, length: int = 8, min_count: int = 2,
                 key: str = "string"):
    """The actionable half of ExactSubstr dedup (Lee et al. 2022 §4.1
    "we remove the duplicated spans"): apply ``substr_dedup``'s cut
    spans to the corpus, emitting each document's surviving text.

    Output: doc_id, n_kept, n_cut, clean_text — clean_text is the
    space-join of the surviving lowercased tokens (the corpus
    tokenization convention; a fully-duplicated document survives as
    an empty string, not a dropped row).

    Scale shape: spans pack to ONE row per cut document (a bounded
    ``map_groups``: group = that doc's spans) with the intervals
    serialized to an int64 binary blob — Arrow's hash join rejects
    list-typed payloads, the documented workaround — then one
    ``left_outer`` doc_id join puts each doc next to its spans and a
    stateless map cuts tokens; documents without spans pass through
    untouched. Nothing is driver-resident. DuckDB-oracle-gated end to
    end (the oracle re-derives the spans AND the cut)."""
    from .dedup import _join_parts

    spans = substr_dedup(sf_dir, length=length, min_count=min_count,
                         key=key)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        arr = np.stack([g["cut_start"].to_numpy(np.int64),
                        g["cut_end"].to_numpy(np.int64)],
                       axis=1).reshape(-1)
        return pd.DataFrame({
            "doc_id": [np.int64(g["doc_id"].iloc[0])],
            "spans_blob": [arr.tobytes()],
        })

    packed = spans.groupby("doc_id").map_groups(pack,
                                                batch_format="pandas")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    joined = docs.join(packed, "left_outer",
                       _join_parts(docs, packed), on=("doc_id",))

    def cut(batch: pa.Table) -> pa.Table:
        ids, n_kept, n_cut, texts = [], [], [], []
        for doc_id, text, blob in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
                batch.column("spans_blob").to_pylist()):
            w = _tokens(text)
            if blob:
                se = np.frombuffer(blob, np.int64).reshape(-1, 2)
                mask = np.ones(len(w), bool)
                for s, e in se:
                    mask[s:e] = False
                kept = [t for t, m in zip(w, mask) if m]
            else:
                kept = w
            ids.append(doc_id)
            n_kept.append(len(kept))
            n_cut.append(len(w) - len(kept))
            texts.append(" ".join(kept))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "n_cut": pa.array(n_cut, pa.int64()),
            "clean_text": pa.array(texts, pa.string()),
        })

    return joined.map_batches(cut, batch_format="pyarrow",
                              batch_size=None).sort("doc_id")


def corpus_profile(sf_dir: str, table: str = "documents"):
    """Data-profiling / expectations operator (the Great-Expectations
    shape a lake pipeline runs before training): per-column row count,
    null count, EXACT distinct count, and lexicographic min/max — the
    distinct-vs-rows comparison is the key-uniqueness check, null
    counts are the completeness check, bounds catch domain drift.

    Scale shape: bounds/nulls reduce through one per-batch partial row
    per column; distincts go through per-batch local dedup into ONE
    (column, value) groupby — the exchange is bounded by per-block
    distinct values summed over columns (for a true high-cardinality
    key this is the exact-distinct shape; swap in the HLL sketch from
    pipelines/sketches when ±2% suffices). All values compare as
    strings (both engines cast before min/max), so one schema profiles
    every column."""
    ds = _read(sf_dir, table)
    cols = ds.schema().names

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            s = batch.column(c).to_pandas().astype("string")
            nn = int(s.isna().sum())
            sv = s.dropna()
            rows.append({
                "column": c, "n": np.int64(len(s)),
                "n_null": np.int64(nn),
                "min_val": sv.min() if len(sv) else None,
                "max_val": sv.max() if len(sv) else None})
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    bounds = _read(sf_dir, table) \
        .map_batches(stats_partial, batch_format="pyarrow",
                     batch_size=None) \
        .groupby("column") \
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("n_null", alias_name="n_null"),
                   Min("min_val", alias_name="min_val"),
                   Max("max_val", alias_name="max_val"))

    def distinct_partial(batch: pa.Table) -> pa.Table:
        col_out, val_out = [], []
        for c in cols:
            vals = batch.column(c).to_pandas().astype("string") \
                .dropna().unique()
            col_out.extend([c] * len(vals))
            val_out.extend(vals.tolist())
        return pa.table({"column": pa.array(col_out, pa.string()),
                         "value": pa.array(val_out, pa.string())})

    def dcount(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"column": [g["column"].iloc[0]],
                             "n_distinct": [np.int64(len(g))]})

    distincts = _read(sf_dir, table) \
        .map_batches(distinct_partial, batch_format="pyarrow",
                     batch_size=None) \
        .groupby(["column", "value"]).aggregate(Count(alias_name="_c")) \
        .map_batches(lambda b: b.select(["column"]),
                     batch_format="pyarrow") \
        .groupby("column").map_groups(dcount, batch_format="pandas")

    # k columns on both sides — one partition, no empty-partition quirk
    return bounds.join(distincts, join_type="inner", on=("column",),
                       num_partitions=1).sort("column")

def pmi_bigrams(sf_dir: str, min_count: int = 5, k: int = 100):
    """Pointwise-mutual-information bigram collocations (Church &
    Hanks 1990) — the corpus phrase-mining operator: find the k word
    pairs that co-occur far more than their unigram frequencies
    predict.  ``pmi = ln(p(x,y) / (p(x)·p(y)))`` with ``p(x,y) =
    c_xy/B`` (B = total bigram positions) and ``p(x) = c_x/W``
    (W = total tokens); only pairs with ``c_xy >= min_count``.

    Scale shape: ONE tokenize pass emits per-block partial counts for
    bigrams and unigrams together (unigram rows carry the ``w2 = ''``
    sentinel, which a whitespace tokenizer can never produce), so the
    only shuffle is one (w1, w2) groupby over per-block DISTINCT pairs
    — never over raw positions.  W and B are sums over the grouped
    table; the ``min_count`` filter prunes the long tail before the
    two vocabulary-keyed hash joins attach c_x/c_y; a per-batch local
    top-k combiner caps the final sort at batches×k rows (the
    ann_topk pattern).  No driver state, no full materialization of
    raw positions.
    """
    from ray.data.aggregate import Sum

    from .dedup import _join_parts

    ds = _read(sf_dir, "documents", ["text"])

    def explode(batch: pa.Table) -> pa.Table:
        import collections

        uni: collections.Counter = collections.Counter()
        big: collections.Counter = collections.Counter()
        for text in batch.column("text").to_pylist():
            t = _tokens(text)
            uni.update(t)
            big.update(zip(t[:-1], t[1:]))
        w1 = [a for a, _ in big] + list(uni)
        w2 = [b for _, b in big] + [""] * len(uni)
        c = list(big.values()) + list(uni.values())
        return pa.table({
            "w1": pa.array(w1, type=pa.string()),
            "w2": pa.array(w2, type=pa.string()),
            "c": pa.array(c, type=pa.int64()),
        })

    counts = (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    ucnt = counts.filter(expr="w2 == ''")
    bcnt = counts.filter(expr="w2 != ''")
    w_tot = float(ucnt.sum("c"))
    b_tot = float(bcnt.sum("c"))

    filt = bcnt.filter(expr=f"c >= {min_count}")

    def _rename(cols):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select(list(cols)).rename_columns(
                list(cols.values()))
        return fn

    u1 = ucnt.map_batches(_rename({"w1": "w1", "c": "c_x"}),
                          batch_format="pyarrow")
    u2 = ucnt.map_batches(_rename({"w1": "w2", "c": "c_y"}),
                          batch_format="pyarrow")
    j = filt.map_batches(
        _rename({"w1": "w1", "w2": "w2", "c": "c_xy"}),
        batch_format="pyarrow")
    j = j.join(u1, join_type="inner", on=("w1",),
               num_partitions=_join_parts(j, u1))
    j = j.join(u2, join_type="inner", on=("w2",),
               num_partitions=_join_parts(j, u2))

    def score(batch: pa.Table) -> pa.Table:
        cxy = batch.column("c_xy").to_numpy().astype(np.float64)
        cx = batch.column("c_x").to_numpy().astype(np.float64)
        cy = batch.column("c_y").to_numpy().astype(np.float64)
        # operand order mirrors the oracle SQL exactly:
        # (c_xy*W)*W / ((B*c_x)*c_y) so both engines round the same ulp
        pmi = np.round(np.log((cxy * w_tot * w_tot)
                              / ((b_tot * cx) * cy)), 6)
        return batch.append_column("pmi", pa.array(pmi))

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    top = (
        j.map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(key=["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    top = top.sort_values(["pmi", "w1", "w2"],
                          ascending=[False, True, True]).reset_index(drop=True)
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return pa.Table.from_pandas(
        top[["w1", "w2", "c_xy", "c_x", "c_y", "pmi", "rnk"]],
        preserve_index=False)

def length_filter(sf_dir: str, q: float = 0.9,
                  max_domain: int = 1_000_000):
    """Global-quantile length filter — keep documents whose token count
    is at or below the corpus-wide q-quantile (discrete, DuckDB
    ``quantile_disc`` convention: the smallest value whose cumulative
    count reaches ``ceil(q·n)``).  The common "drop the longest tail
    before packing" corpus-prep step.

    Scale shape (the grouped_median histogram-selection pattern,
    ungrouped): doc lengths live in a BOUNDED value domain, so the
    (n_tokens → count) histogram IS the full order statistic — per-block
    histogram partials, one tiny groupby, threshold selection on the
    driver over ≤``max_domain`` distinct lengths (guarded loud), then a
    stateless second pass filters.  No sort, no materialization of the
    corpus; shuffle volume = distinct lengths per block.
    """
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def nwords(batch: pa.Table) -> pa.Table:
        n = [len(_tokens(t)) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n, type=pa.int64()),
        })

    counted = ds.map_batches(nwords, batch_format="pyarrow",
                             batch_size=None).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch.column("n_tokens").to_numpy(),
                         return_counts=True)
        return pa.table({"n_tokens": pa.array(v, type=pa.int64()),
                         "_c": pa.array(c, type=pa.int64())})

    hist = (
        counted.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_tokens").aggregate(Sum("_c", alias_name="c"))
        .to_pandas()
    )
    if len(hist) > max_domain:
        raise ValueError(
            f"length_filter histogram has {len(hist)} distinct lengths "
            f"(> max_domain={max_domain}); raise max_domain only if the "
            "driver can hold the histogram")
    hist = hist.sort_values("n_tokens")
    cum = hist["c"].to_numpy().cumsum()
    rank = math.ceil(q * int(cum[-1]))
    thresh = int(hist["n_tokens"].to_numpy()[
        np.searchsorted(cum, rank, side="left")])

    return counted.filter(expr=f"n_tokens <= {thresh}") \
        .add_column("p_thresh", lambda df: np.full(len(df), thresh,
                                                   dtype=np.int64))


def dsir_sample(sf_dir: str, *, n_buckets: int = 1024, k: int = 100,
                target_lang: str = "en"):
    """DSIR-style importance resampling (Xie et al. 2023,
    arXiv:2302.03169 "Data Selection for Language Models via Importance
    Resampling"): hashed-unigram bag features, smoothed bucket unigram
    models for the target domain (``lang == target_lang``) vs the full
    raw pool, per-doc importance weight

        w(d) = sum over token occurrences of
               ln p_target(bucket) - ln p_raw(bucket)

    with +1 smoothing over ``n_buckets`` hash buckets, then the top-k
    docs by (weight, doc_id). The paper samples with Gumbel noise; the
    deterministic top-k keeps the op exactly SQL-checkable end-to-end
    (bucket = first 8 hex digits of md5(token) mod n_buckets — the same
    expression DuckDB evaluates, so the oracle recomputes the whole
    pipeline from raw text, not from a dump).

    Scale shape: one tokenize+count pass emits <= n_buckets partial rows
    per block (target_count, raw_count) -> a groupby-sum over n_buckets
    keys; the dense log-ratio vector (n_buckets doubles) is broadcast
    once via ``ray.put``; the scoring pass is stateless map_batches; the
    tail is local-topk -> sort -> limit so the global sort ever sees
    only blocks x k rows. Nothing n-sized lands on the driver.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _bucket_of(tok: str, cache: dict) -> int:
        b = cache.get(tok)
        if b is None:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8],
                    16) % n_buckets
            cache[tok] = b
        return b

    def bucket_partials(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        ct = np.zeros(n_buckets, dtype=np.int64)
        cr = np.zeros(n_buckets, dtype=np.int64)
        cache: dict = {}
        for text, lang in zip(texts, langs):
            toks = _tokens(text)
            if not toks:
                continue
            bks = np.fromiter((_bucket_of(t, cache) for t in toks),
                              dtype=np.int64, count=len(toks))
            cnt = np.bincount(bks, minlength=n_buckets)
            cr += cnt
            if lang == target_lang:
                ct += cnt
        nz = (ct > 0) | (cr > 0)
        return pa.table({
            "bucket": pa.array(np.nonzero(nz)[0].astype(np.int64)),
            "ct": pa.array(ct[nz]),
            "cr": pa.array(cr[nz]),
        })

    counts = (ds.map_batches(bucket_partials, batch_format="pyarrow",
                             batch_size=4096)
              .groupby("bucket")
              .aggregate(Sum("ct", alias_name="ct"),
                         Sum("cr", alias_name="cr"))
              .take_all())                       # <= n_buckets rows
    ct = np.zeros(n_buckets, dtype=np.float64)
    cr = np.zeros(n_buckets, dtype=np.float64)
    for r in counts:
        ct[r["bucket"]] = r["ct"]
        cr[r["bucket"]] = r["cr"]
    t_tot, r_tot = ct.sum(), cr.sum()
    logratio = (np.log((ct + 1.0) / (t_tot + n_buckets))
                - np.log((cr + 1.0) / (r_tot + n_buckets)))
    lr_ref = ray.put(logratio)

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cache: dict = {}
        out_id, out_w = [], []
        for did, text in zip(ids, texts):
            toks = _tokens(text)
            if not toks:
                continue            # the oracle's join drops token-less docs
            bks = np.fromiter((_bucket_of(t, cache) for t in toks),
                              dtype=np.int64, count=len(toks))
            out_id.append(did)
            out_w.append(round(float(lr[bks].sum()), 6))
        return pa.table({
            "doc_id": pa.array(np.asarray(out_id, dtype=np.int64)),
            "weight": pa.array(np.asarray(out_w, dtype=np.float64)),
        })

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["weight", "doc_id"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (ds.map_batches(score, batch_format="pyarrow",
                           batch_size=4096)
            .map_batches(local_topk, batch_format="pyarrow")
            .sort(["weight", "doc_id"], descending=[True, False])
            .limit(k))


# ---------------------------------------------------------------------------
# vocabulary build + token-id encoding (round-5 session 3)
# ---------------------------------------------------------------------------

def corpus_vocab(sf_dir: str, min_count: int = 3):
    """Vocabulary construction: every token with corpus frequency
    >= ``min_count`` gets a dense 1-based id ranked by (count desc,
    token asc) — id 0 stays reserved for OOV, the convention
    ``doc_encode_ids`` relies on.

    Scale shape: per-batch ``Counter`` partials collapse each block to
    its distinct terms; ``sorted_keyed_sum`` (string keys) folds them
    exactly without a per-group Python finisher; the cutoff filter
    prunes the long tail BEFORE the ranking sort, so the id-assignment
    sort sees only the kept vocabulary.  Ids are assigned with the
    block-offset scan (one (first_term, n_rows) partial per block to
    the driver, bases broadcast back) — no driver-side vocabulary.
    """
    from ..functions.sortagg import sorted_keyed_sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for text in batch.column("text").to_pylist():
            c.update(_tokens(text))
        return pa.table({
            "term": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    counts = ds.map_batches(partial_counts, batch_format="pyarrow",
                            batch_size=None)
    total = sorted_keyed_sum(counts, "term", ["n"],
                             key_type=pa.string())
    kept = total.filter(expr=f"n >= {min_count}")
    ranked = kept.sort(["n", "term"], descending=[True, False]) \
        .materialize()

    # block-offset id assignment: one tiny partial per block
    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_term": pa.array([], pa.string()),
                             "first_n": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        return pa.table({
            "first_term": pa.array([batch.column("term")[0].as_py()]),
            "first_n": pa.array([batch.column("n")[0].as_py()],
                                pa.int64()),
            "rows": pa.array([batch.num_rows], pa.int64()),
        })

    parts = ranked.map_batches(block_partial, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    parts = parts.sort_values(
        ["first_n", "first_term"], ascending=[False, True],
        kind="mergesort")
    bases = dict(zip(parts["first_term"],
                     np.concatenate(([0],
                                     parts["rows"].cumsum()[:-1]))))
    bref = ray.put(bases)

    def assign(batch: pa.Table, bref=bref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "token_id": pa.array([], pa.int64())})
        base = ray.get(bref)[batch.column("term")[0].as_py()]
        ids = base + 1 + np.arange(batch.num_rows, dtype=np.int64)
        return batch.append_column("token_id", pa.array(ids))

    return ranked.map_batches(assign, batch_format="pyarrow",
                              batch_size=None)


def doc_encode_ids(sf_dir: str, min_count: int = 3,
                   vocab_limit: int = 5_000_000):
    """Token-id encoding of every document against ``corpus_vocab``:
    one exploded row per token position — (doc_id, pos, token_id),
    pos 0-based over the doc's whitespace tokens, OOV mapped to 0.

    Scale shape: the vocabulary (post-cutoff) is the small side by
    nature (Heaps' law; practical vocabs are <=a few million entries)
    — materialized once, gated by ``vocab_limit``, shipped with
    ``ray.put`` as SORTED arrays, and probed per batch with one
    vectorized ``np.searchsorted`` over all positions.  The encode
    itself is a stateless linear explode: no shuffle at all.
    """
    vocab = corpus_vocab(sf_dir, min_count=min_count)
    nv = vocab.count()
    if nv > vocab_limit:
        raise ValueError(
            f"doc_encode_ids: vocabulary {nv} exceeds the broadcast "
            f"gate {vocab_limit}; raise vocab_limit or shard the "
            "encode by vocab range")
    vt = vocab.select_columns(["term", "token_id"]).to_pandas()
    terms = vt["term"].to_numpy()
    order = np.argsort(terms)
    sorted_terms = terms[order]
    sorted_ids = vt["token_id"].to_numpy()[order]
    vref = ray.put((sorted_terms, sorted_ids))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(batch: pa.Table, vref=vref) -> pa.Table:
        sorted_terms, sorted_ids = ray.get(vref)
        doc_ids, texts = (batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist())
        toks, docs, poss = [], [], []
        for d, text in zip(doc_ids, texts):
            words = _tokens(text)
            toks.extend(words)
            docs.append(np.full(len(words), d, np.int64))
            poss.append(np.arange(len(words), dtype=np.int64))
        if not toks:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "token_id": pa.array([], pa.int64())})
        tok_arr = np.asarray(toks, dtype=object)
        idx = np.searchsorted(sorted_terms, tok_arr)
        idx_c = np.clip(idx, 0, len(sorted_terms) - 1)
        hit = sorted_terms[idx_c] == tok_arr
        ids = np.where(hit, sorted_ids[idx_c], 0).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate(docs)),
            "pos": pa.array(np.concatenate(poss)),
            "token_id": pa.array(ids),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          batch_size=256).sort(["doc_id", "pos"])


def mixture_rebalance(sf_dir: str):
    """Data-mixture rebalancing: downsample each source toward an
    EQUAL target share (the data-curation step that stops one crawl
    dump from dominating the training mix).  A source with n_s docs
    keeps each doc with probability ``min(1, (N/k)/n_s)`` — decided
    deterministically by md5(doc_id) against a per-source threshold,
    so the selection is reproducible across engines and runs (same
    convention as ``hash_sample``).

    Thresholds are INTEGER arithmetic — ``(N * 2^32) // (k * n_s)``,
    capped at 2^32 — so the Ray and SQL sides agree exactly with no
    float rounding anywhere.

    Scale shape: pass 1 is a k-row groupby count (k = #sources);
    thresholds broadcast as a tiny dict; pass 2 is a stateless
    hash-filter map — no further shuffle.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    counts = (ds.groupby("source").aggregate(Count(alias_name="n_s"))
              .to_pandas())
    n_total = int(counts["n_s"].sum())
    k = len(counts)
    thr = {s: min(1 << 32, (n_total * (1 << 32)) // (k * int(n)))
           for s, n in zip(counts["source"], counts["n_s"])}
    tref = ray.put(thr)

    def keep(batch: pa.Table, tref=tref) -> pa.Table:
        t = ray.get(tref)
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        h = np.array([int(hashlib.md5(str(i).encode())
                          .hexdigest()[:8], 16) for i in ids],
                     dtype=np.int64)
        lim = np.array([t[s] for s in srcs], dtype=np.int64)
        return batch.filter(pa.array(h < lim))

    return (ds.map_batches(keep, batch_format="pyarrow",
                           batch_size=4096)
            .sort("doc_id"))


def filter_funnel(sf_dir: str, min_chars: int = 200,
                  alpha_min: float = 0.55,
                  mwl_lo: float = 3.0, mwl_hi: float = 12.0):
    """Quality-filter cascade with per-stage rejection accounting — the
    pipeline-observability table every corpus-prep run reports (how
    many documents each rule removed, applied SEQUENTIALLY: min length
    → English → alpha ratio → mean word length).

    Scale shape: ONE pass; each batch evaluates all four predicates
    vectorized (pandas str kernels over the batch) and reduces to a
    5-int partial (total + survivors of each prefix), so the exchange
    is blocks×5 ints and the funnel assembles from one summed row.
    Predicate arithmetic (char counts, space counts, the two float
    divisions) is written identically to the oracle SQL so the
    boolean outcomes are exact, not approximately equal."""
    ds = _read(sf_dir, "documents", ["text", "n_chars", "lang"])

    def part(batch: pa.Table) -> pa.Table:
        t = batch.column("text").to_pandas()
        n = t.str.len().to_numpy(np.int64)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        lang = batch.column("lang").to_pandas().to_numpy(object)
        alpha = t.str.count(r"[a-zA-Z]").to_numpy(np.int64)
        # spaces via replace-length, exactly the SQL's formula
        spaces = (n - t.str.replace(" ", "", regex=False)
                  .str.len().to_numpy(np.int64))
        p1 = nc >= min_chars
        p2 = lang == "en"
        p3 = (alpha.astype(np.float64) / n) >= alpha_min
        mwl = (n.astype(np.float64) - spaces) / (spaces + 1)
        p4 = (mwl >= mwl_lo) & (mwl <= mwl_hi)
        c12 = p1 & p2
        c123 = c12 & p3
        return pa.table({
            "n0": pa.array([len(n)], pa.int64()),
            "n1": pa.array([int(p1.sum())], pa.int64()),
            "n2": pa.array([int(c12.sum())], pa.int64()),
            "n3": pa.array([int(c123.sum())], pa.int64()),
            "n4": pa.array([int((c123 & p4).sum())], pa.int64()),
        })

    from ray.data.aggregate import Sum
    agg = ds.map_batches(part, batch_format="pyarrow",
                         batch_size=65536) \
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n0", "n1", "n2", "n3", "n4")])
    ns = [int(agg[f"n{i}"] or 0) for i in range(5)]
    names = ["min_length", "lang_en", "alpha_ratio", "mean_word_len"]
    return pa.table({
        "stage": pa.array(np.arange(1, 5, dtype=np.int64)),
        "filter": pa.array(names),
        "n_in": pa.array([ns[i] for i in range(4)], pa.int64()),
        "n_kept": pa.array([ns[i + 1] for i in range(4)], pa.int64()),
        "n_rejected": pa.array(
            [ns[i] - ns[i + 1] for i in range(4)], pa.int64()),
    })


def perplexity_buckets(sf_dir: str, k: int = 3):
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.3: rank the
    corpus by LM perplexity, cut into equal-size terciles, keep the
    head for high-quality training data): NTILE(k) over the
    ``lm_perplexity`` scores with (ppl, doc_id) total order, reduced
    to per-bucket doc counts and exact ppl ranges.

    Scale shape: one global sort by (ppl, doc_id) — the operator's
    inherent exchange — then the ``_pnum_prepare`` block-offset prefix
    scan assigns exact global row numbers (one tiny partial row per
    block on the driver), the NTILE law (first n%k tiles get
    floor(n/k)+1 rows) maps row number → bucket per batch, and the
    output fold is a k-row groupby of per-block partials. min/max are
    exact selections of 2-dp-rounded values, so no float-summation
    order can leak in."""
    from ray.data.aggregate import Max, Min, Sum

    from .analysis import _pnum_prepare, _pnum_rn

    ppl = lm_perplexity(sf_dir).map_batches(
        lambda t: t.append_column("_g", pa.array(
            np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow")
    sorted_ds, bases, totals = _pnum_prepare(
        ppl, ["_g", "ppl", "doc_id"], [False, False, False],
        "_g", "doc_id")
    bref = ray.put((bases, totals))

    def partial(batch: pa.Table, bref=bref, k=k) -> pa.Table:
        import ray as _ray

        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "_n": pa.array([], pa.int64()),
                          "_mn": pa.array([], pa.float64()),
                          "_mx": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        bases, totals = _ray.get(bref)
        rn, pr = _pnum_rn(batch, "_g", "doc_id", bases)
        n = int(totals[pr[0]])
        size_small = n // k
        n_big = n % k
        big_span = n_big * (size_small + 1)
        in_big = rn <= big_span
        tile = np.where(
            in_big,
            (rn - 1) // max(size_small + 1, 1) + 1,
            n_big + (rn - 1 - big_span) // max(size_small, 1) + 1,
        ).astype(np.int64)
        p = batch.column("ppl").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"bucket": tile, "p": p}).groupby(
            "bucket", as_index=False).agg(
            _n=("p", "size"), _mn=("p", "min"), _mx=("p", "max"))
        df["_n"] = df["_n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return sorted_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None) \
        .groupby("bucket").aggregate(
            Sum("_n", alias_name="n_docs"),
            Min("_mn", alias_name="ppl_min"),
            Max("_mx", alias_name="ppl_max"))


def doc_lang_nb(sf_dir: str):
    """Multinomial Naive Bayes language classifier trained AND scored
    distributed — the classic generative text classifier (add-one
    Laplace smoothing over the corpus vocabulary, log-space scoring)
    as a pure Ray Data pipeline: the model-training groupby and the
    scoring join are both term-keyed shuffles, so neither the vocab
    nor the corpus ever materializes driver-side. One row per doc:
    actual lang, predicted lang, best score and the best-vs-runner-up
    margin. With self-supervised labels (the docs' own ``lang``
    column) this is the resubstitution audit a data pipeline runs
    before trusting a learned filter.

    Determinism across engines: per-(doc, lang) log-scores are ROUNDED
    to 4dp BEFORE the argmax (ties broken by lang asc), so float-sum
    reordering between Ray and the SQL oracle cannot flip the
    prediction — the synthetic corpus shares vocabulary across langs,
    which makes raw scores nearly tied by construction.

    Scale shape: (1) per-batch Counter partials → groupby(lang, term)
    = the class-conditional count table; (2) class totals, priors and
    |V| are k-row / scalar aggregates; (3) a per-term map_groups emits
    the DENSE (term, cand_lang, logp) table (k rows per term, Laplace
    fill for unseen (term, lang)); (4) one term-keyed hash join ships
    each doc's (term, tf) rows onto logp, and groupby(doc, cand) sums
    — the document text crosses the wire exactly once, as token
    counts."""
    from ray.data.aggregate import Sum

    from .dedup import _join_parts

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"]) \
        .materialize()

    def explode(batch: pa.Table) -> pa.Table:
        import collections

        ids, langs, terms, tfs = [], [], [], []
        for did, lang, text in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("lang").to_pylist(),
                                   batch.column("text").to_pylist()):
            c = collections.Counter(_tokens(text))
            for t, n in c.items():
                ids.append(did)
                langs.append(lang)
                terms.append(t)
                tfs.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    tok = ds.map_batches(explode, batch_format="pyarrow",
                         batch_size=None).materialize()

    ctab = tok.groupby(["lang", "term"]) \
        .aggregate(Sum("tf", alias_name="c")).materialize()
    ctot = {r["lang"]: int(r["c"])
            for r in ctab.groupby("lang")
            .aggregate(Sum("c", alias_name="c")).iter_rows()}
    vocab_n = ctab.groupby("term").aggregate(Count()).count()
    nd = {r["lang"]: int(r["count()"])
          for r in ds.groupby("lang").aggregate(Count()).iter_rows()}
    n_docs = sum(nd.values())
    langs = sorted(ctot)
    priors = {l: float(np.log(nd[l] / n_docs)) for l in langs}

    def dense(g: pa.Table, langs=tuple(langs)) -> pa.Table:
        term = g.column("term")[0].as_py()
        have = {r["lang"]: r["c"] for r in g.to_pylist()}
        lp = [float(np.log((have.get(l, 0) + 1)
                           / (ctot[l] + vocab_n))) for l in langs]
        return pa.table({
            "term": pa.array([term] * len(langs), pa.string()),
            "cand": pa.array(list(langs), pa.string()),
            "logp": pa.array(lp, pa.float64()),
        })

    dmodel = ctab.groupby("term").map_groups(
        dense, batch_format="pyarrow").materialize()

    n = _join_parts(tok, dmodel)
    j = tok.join(dmodel, "inner", n, on=("term",))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id")
            .to_numpy(zero_copy_only=False),
            "lang": batch.column("lang").to_pandas(),
            "cand": batch.column("cand").to_pandas(),
            "_s": batch.column("tf").to_numpy(zero_copy_only=False)
            * batch.column("logp").to_numpy(zero_copy_only=False)})
        # pivot the candidate dimension into COLUMNS right here: the
        # shuffle then carries one row per (doc, lang) with k score
        # columns, and the argmax is a stateless vectorized pass —
        # no k-row-group map_groups (5000 tiny pandas groups cost
        # ~15 s at sf0.1; this shape costs none)
        piv = df.pivot_table(index=["doc_id", "lang"],
                             columns="cand", values="_s",
                             aggfunc="sum", fill_value=0.0)
        piv = piv.reindex(columns=list(langs), fill_value=0.0)
        piv.columns = [f"s_{c}" for c in piv.columns]
        return pa.Table.from_pandas(piv.reset_index(),
                                    preserve_index=False)

    scols = [f"s_{c}" for c in langs]
    sc = j.map_batches(partial, batch_format="pyarrow",
                       batch_size=65536) \
        .groupby(["doc_id", "lang"]) \
        .aggregate(*[Sum(c, alias_name=c) for c in scols])

    lang_arr = np.asarray(langs, dtype=object)
    prior_vec = np.array([priors[c] for c in langs])

    def pick(batch: pa.Table) -> pa.Table:
        s = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False)
             for c in scols]) + prior_vec[None, :]
        s = np.round(s, 4)
        # argmax with lang-asc tie-break: np.argmax takes the FIRST
        # max and columns are lang-sorted
        best_i = np.argmax(s, axis=1)
        rows = np.arange(len(s))
        best = s[rows, best_i]
        s2 = s.copy()
        s2[rows, best_i] = -np.inf
        second = s2.max(axis=1)
        actual = batch.column("lang").to_pandas().to_numpy(object)
        pred = lang_arr[best_i]
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "lang": pa.array(actual, pa.string()),
            "pred_lang": pa.array(pred.tolist(), pa.string()),
            "score": pa.array(best, pa.float64()),
            "margin": pa.array(np.round(best - second, 4),
                               pa.float64()),
            "correct": pa.array(pred == actual),
        })

    return sc.map_batches(pick, batch_format="pyarrow",
                          batch_size=65536)


def corpus_lexical_richness(sf_dir: str):
    """Corpus lexical-richness profile per language — type-token ratio
    and hapax-legomena share (types seen exactly once / types), the
    vocabulary-growth health check a corpus curator reads next to the
    Zipf slope (a scraped-boilerplate corpus has few hapaxes; an
    OCR-noise corpus has too many). One row per lang.

    Scale shape: per-batch Counter partials keyed (lang, term) →
    ``sorted_keyed_sum`` exact fold → per-lang scalar reductions over
    the term table (types, hapaxes, tokens are all one groupby of the
    TERM-sized table, never the corpus)."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from ..functions.sortagg import sorted_keyed_sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for lang, text in zip(batch.column("lang").to_pylist(),
                              batch.column("text").to_pylist()):
            for t in _tokens(text):
                c[(lang, t)] += 1
        keys = list(c.keys())
        return pa.table({
            # tab separator: tokens are whitespace-split so they can
            # never contain one (NUL would be truncated by the sort
            # boundary sampling's C-string handling)
            "k": pa.array([f"{l}\t{t}" for l, t in keys],
                          pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    terms = sorted_keyed_sum(
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       batch_size=None), "k", ["n"],
        key_type=pa.string())

    def split(batch: pa.Table) -> pa.Table:
        ks = batch.column("k").to_pylist()
        n = batch.column("n").to_numpy(zero_copy_only=False)
        langs = [k.split("\t", 1)[0] for k in ks]
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "tokens": pa.array(n, pa.int64()),
            "hapax": pa.array((n == 1).astype(np.int64)),
        })

    g = terms.map_batches(split, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("lang") \
        .aggregate(_Count(alias_name="types"),
                   _Sum("tokens", alias_name="tokens"),
                   _Sum("hapax", alias_name="hapaxes")).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    ty = g["types"].to_numpy(np.int64)
    tok = g["tokens"].to_numpy(np.int64)
    hp = g["hapaxes"].to_numpy(np.int64)
    return pa.table({
        "lang": pa.array(g["lang"], pa.string()),
        "types": pa.array(ty, pa.int64()),
        "tokens": pa.array(tok, pa.int64()),
        "hapaxes": pa.array(hp, pa.int64()),
        "type_token_ratio": pa.array(
            np.round(ty / tok, 6), pa.float64()),
        "hapax_share": pa.array(np.round(hp / ty, 6), pa.float64()),
    })


def lang_jsd_matrix(sf_dir: str, max_cells: int = 1_000_000):
    """Pairwise Jensen–Shannon divergence (bits) between languages'
    term distributions — the symmetric, bounded [0,1] distribution
    distance a mixture curator reads next to the cosine similarity:
    JSD(p,q) = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2 (no smoothing needed —
    a term absent from both sides never enters). One row per unordered
    lang pair (lex a < b).

    Scale shape: the ``corpus_lexical_richness`` (lang, term) count
    reduction (Counter partials → sortagg exact fold); the divergence
    algebra runs driver-side on the VOCAB × langs probability matrix
    (``max_cells`` loud-guard — vocab-bounded, not corpus-bounded)."""
    from ..functions.sortagg import sorted_keyed_sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for lang, text in zip(batch.column("lang").to_pylist(),
                              batch.column("text").to_pylist()):
            for t in _tokens(text):
                c[(lang, t)] += 1
        keys = list(c.keys())
        return pa.table({
            "k": pa.array([f"{l}\t{t}" for l, t in keys], pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    terms = sorted_keyed_sum(
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       batch_size=None), "k", ["n"],
        key_type=pa.string()).to_pandas()
    if len(terms) > max_cells:
        raise ValueError(
            f"lang_jsd_matrix: {len(terms)} (lang, term) cells exceed "
            f"max_cells={max_cells}")
    parts = terms["k"].str.split("\t", n=1, expand=True)
    terms = pd.DataFrame({"lang": parts[0], "term": parts[1],
                          "n": terms["n"].to_numpy(np.float64)})
    piv = terms.pivot_table(index="term", columns="lang", values="n",
                            fill_value=0.0, aggfunc="sum")
    langs = sorted(piv.columns)
    m = piv[langs].to_numpy(np.float64)
    p = m / m.sum(axis=0)[None, :]
    rows_a, rows_b, jsd = [], [], []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            pa_, pb_ = p[:, i], p[:, j]
            mm = pa_ + pb_
            mask_a = pa_ > 0
            mask_b = pb_ > 0
            d = (0.5 * pa_[mask_a]
                 * np.log2(2 * pa_[mask_a] / mm[mask_a])).sum() \
                + (0.5 * pb_[mask_b]
                   * np.log2(2 * pb_[mask_b] / mm[mask_b])).sum()
            rows_a.append(langs[i])
            rows_b.append(langs[j])
            jsd.append(round(float(d), 6))
    return pa.table({
        "lang_a": pa.array(rows_a, pa.string()),
        "lang_b": pa.array(rows_b, pa.string()),
        "jsd_bits": pa.array(jsd, pa.float64()),
    })


def corpus_term_burstiness(sf_dir: str, top_k: int = 20):
    """Church–Gale term burstiness for the top-k corpus terms — for
    each term, collection frequency CF, document frequency DF and
    burstiness CF/DF (mean occurrences per containing doc): function
    words sit near 1, topical/boilerplate terms burst ≫ 1 (Church &
    Gale 1995), the repeated-template smell test on a scraped corpus.
    One row per top-CF term (ties broken lexically).

    Scale shape: the postings explode emits final (term, tf) partials
    with DF=1 markers per (term, doc) inside the map stage; ONE
    term-keyed groupby folds CF and DF; the top-k cut is a bounded
    sort of the TERM table."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        import collections

        terms, cfs, dfs = [], [], []
        for text in batch.column("text").to_pylist():
            c = collections.Counter(_tokens(text))
            for t, n in c.items():
                terms.append(t)
                cfs.append(n)
                dfs.append(1)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "cf": pa.array(cfs, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
        })

    g = ds.map_batches(explode, batch_format="pyarrow",
                       batch_size=None) \
        .groupby("term") \
        .aggregate(_Sum("cf", alias_name="cf"),
                   _Sum("df", alias_name="df")) \
        .sort(["cf", "term"], descending=[True, False]) \
        .limit(top_k).to_pandas()
    cf = g["cf"].to_numpy(np.int64)
    df = g["df"].to_numpy(np.int64)
    return pa.table({
        "term": pa.array(g["term"], pa.string()),
        "cf": pa.array(cf, pa.int64()),
        "df": pa.array(df, pa.int64()),
        "burstiness": pa.array(np.round(cf / df, 6), pa.float64()),
    })


def doc_compress_ratio(sf_dir: str, level: int = 6):
    """Per-document zlib compression ratio — compressed/raw bytes at
    a fixed level, the classic repetition/quality signal (a Gopher-
    style filter drops docs that compress too well = templated spam,
    or too poorly = random noise). One row per doc. Rows-only for the
    driver (DuckDB has no zlib); determinism + bound laws + the
    monotone relation to the repetition stats are pytest-gated
    (tests/test_corpus.py).

    Scale shape: a stateless ``map_batches`` over pruned (doc_id,
    text) — embarrassingly parallel, CPU-bound, zero shuffle; exactly
    the stage shape the actor-pool fetch/parse stages use."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_r, out_raw = [], []
        for text in batch.column("text").to_pylist():
            raw = (text or "").encode("utf-8")
            comp = zlib.compress(raw, level)
            out_raw.append(len(raw))
            out_r.append(round(len(comp) / max(len(raw), 1), 6))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "raw_bytes": pa.array(out_raw, pa.int64()),
            "compress_ratio": pa.array(out_r, pa.float64()),
        })

    return ds.map_batches(ratio, batch_format="pyarrow",
                          batch_size=65536)


def corpus_vocab_growth(sf_dir: str):
    """Vocabulary growth curve (Heaps' law empirically) — distinct
    types seen within the first N tokens of the doc_id-ordered token
    stream, at N = 1, 2, 4, … and the full stream, the curve whose
    slope says whether more data still buys vocabulary. One row per
    threshold.

    Scale shape: global token offsets come from the
    ``pack_sequences`` distributed prefix scan (block partials →
    driver cumsum → broadcast bases, no shuffle); each doc emits its
    terms' FIRST within-doc positions (a per-doc property), one
    doc-keyed join attaches the doc's start offset, and
    groupby(term).min gives each type's first global position. The
    curve itself is a ≤64-bucket histogram of those positions —
    term-table-sized reductions throughout, never the token stream."""
    from ray.data.aggregate import Min as _Min

    from .dedup import _join_parts

    packed = pack_sequences(sf_dir).materialize()
    offsets = packed.select_columns(["doc_id", "start_offset"]) \
        .materialize()
    total = int(packed.sum("n_tokens"))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def first_pos(batch: pa.Table) -> pa.Table:
        docs, terms, poss = [], [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            seen = {}
            for i, t in enumerate(_tokens(text)):
                if t not in seen:
                    seen[t] = i
            for t, i in seen.items():
                docs.append(d)
                terms.append(t)
                poss.append(i)
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "pos": pa.array(poss, pa.int64()),
        })

    fp = ds.map_batches(first_pos, batch_format="pyarrow",
                        batch_size=None)
    j = fp.join(offsets, "inner", _join_parts(fp, offsets),
                on=("doc_id",))

    def glob(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": batch.column("term").cast(pa.string()),
            "gp": pa.array(
                batch.column("pos").to_numpy(zero_copy_only=False)
                + batch.column("start_offset")
                .to_numpy(zero_copy_only=False), pa.int64()),
        })

    firsts = j.map_batches(glob, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("term").aggregate(_Min("gp", alias_name="fp")) \
        .to_pandas()
    fps = np.sort(firsts["fp"].to_numpy(np.int64))
    thr = []
    k = 0
    while (1 << k) <= total:
        thr.append(1 << k)
        k += 1
    if not thr or thr[-1] != total:
        thr.append(total)
    n_types = np.searchsorted(fps, np.asarray(thr), side="left")
    return pa.table({
        "n_tokens_seen": pa.array(thr, pa.int64()),
        "n_types": pa.array(n_types.astype(np.int64), pa.int64()),
    })


def doc_lang_confusion(sf_dir: str):
    """Aggregated confusion matrix of the Naive Bayes language
    classifier — (actual, predicted) → count + within-actual share,
    the model-evaluation rollup of the per-doc ``doc_lang_nb`` (the
    synthetic corpus shares vocabulary across langs, so the off-
    diagonal mass IS the story). One row per observed (actual,
    predicted) pair.

    Scale shape: rides the full distributed NB pipeline, then one
    bounded k×k groupby over its per-doc output."""
    from ray.data.aggregate import Count as _Count

    preds = doc_lang_nb(sf_dir)

    def pairs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch.column("lang").cast(pa.string()),
            "pred_lang": batch.column("pred_lang").cast(pa.string()),
        })

    g = preds.map_batches(pairs, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby(["lang", "pred_lang"]) \
        .aggregate(_Count(alias_name="n")).to_pandas()
    row_tot = g.groupby("lang")["n"].transform("sum") \
        .to_numpy(np.float64)
    return pa.table({
        "lang": pa.array(g["lang"], pa.string()),
        "pred_lang": pa.array(g["pred_lang"], pa.string()),
        "n": pa.array(g["n"].to_numpy("int64"), pa.int64()),
        "share_of_actual": pa.array(
            np.round(g["n"].to_numpy(np.float64) / row_tot, 6),
            pa.float64()),
    })


def source_lang_mix(sf_dir: str, max_cells: int = 1_000_000):
    """Source × language mixture audit — the contingency χ² and
    Cramér's V over (source, lang), the "did one feed change its
    language mix" drift check a corpus curator runs per ingest. One
    summary row (the per-cell drill-down is ``doc_dup_rate_by_source``'s
    sibling and derivable from the same cells).

    Scale shape: the bounded-cell histogram combiner (sources ×
    langs), χ² via the Σo²/e − N identity driver-side."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read(sf_dir, "documents", ["source", "lang"])

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch.column("source").to_pandas(),
            "lang": batch.column("lang").to_pandas()})
        g = df.groupby(["source", "lang"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = ds.map_batches(part, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby(["source", "lang"]) \
        .aggregate(_Sum("n", alias_name="n")).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"source_lang_mix: {len(cells)} cells exceed "
            f"max_cells={max_cells}")
    n = cells["n"].to_numpy(np.float64)
    total = n.sum()
    rt = cells.groupby("source")["n"].transform("sum") \
        .to_numpy(np.float64)
    ct = cells.groupby("lang")["n"].transform("sum") \
        .to_numpy(np.float64)
    chi2 = float((n * n * total / (rt * ct)).sum() - total)
    r = cells["source"].nunique()
    c = cells["lang"].nunique()
    v = float(np.sqrt(chi2 / (total * (min(r, c) - 1))))
    return pa.table({
        "n_docs": pa.array([int(total)], pa.int64()),
        "n_sources": pa.array([int(r)], pa.int64()),
        "n_langs": pa.array([int(c)], pa.int64()),
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
        "cramers_v": pa.array([round(v, 6)], pa.float64()),
    })


def corpus_kneser_ney(sf_dir: str, top_k: int = 50,
                      discount: float = 0.75):
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    the Chen-Goodman 1999 benchmark winner and KenLM's default) for the
    corpus's ``top_k`` most frequent bigrams — the LM-smoothing
    upgrade over lm_perplexity's add-α:

        P(w|v) = max(c(vw)−d, 0)/c(v) + d·N₁₊(v·)/c(v) · N₁₊(·w)/B

    with d = ``discount``, N₁₊(v·) = distinct continuations of v,
    N₁₊(·w) = distinct contexts of w (the continuation count — KN's
    insight: "Francisco" is frequent but follows only "San"), and B =
    total distinct bigram types.

    Scale shape: ONE bigram-count groupby (per-batch pandas combiner,
    exchange = distinct grams per block); the three marginals are
    groupbys OVER THE COMPACT GRAM TABLE (vocab-sized, not
    token-sized); the top-k selection is a per-block combiner; only
    the ≤k matching marginal rows reach the driver (broadcast-set
    filters). Every division is exact-int / exact-int, so the SQL
    oracle reproduces the doubles bit-for-bit before the 6dp round."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    docs = _read(sf_dir, "documents", ["text"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        w1, w2 = [], []
        for t in batch.column("text").to_pylist():
            toks = (t or "").lower().split()
            w1.extend(toks[:-1])
            w2.extend(toks[1:])
        if not w1:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        g = pd.DataFrame({"w1": w1, "w2": w2}) \
            .groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    grams = docs.map_batches(gram_partial, batch_format="pyarrow",
                             batch_size=8192) \
        .groupby(["w1", "w2"]).aggregate(_Sum("c", alias_name="c")) \
        .materialize()
    n_types = grams.count()          # B: distinct bigram types

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["c", "w1", "w2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(top_k),
                                    preserve_index=False)

    top = grams.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas().sort_values(["c", "w1", "w2"],
                                 ascending=[False, True, True]) \
        .head(top_k).reset_index(drop=True)
    ctx_need = set(top["w1"])
    wrd_need = set(top["w2"])

    def ctx_filter(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(df[df["w1"].isin(ctx_need)],
                                    preserve_index=False)

    def wrd_filter(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(df[df["w2"].isin(wrd_need)],
                                    preserve_index=False)

    ctx = grams.groupby("w1") \
        .aggregate(_Sum("c", alias_name="cv"),
                   _Count(alias_name="n1v")) \
        .map_batches(ctx_filter, batch_format="pyarrow").to_pandas() \
        .set_index("w1")
    wrd = grams.groupby("w2") \
        .aggregate(_Count(alias_name="n1w")) \
        .map_batches(wrd_filter, batch_format="pyarrow").to_pandas() \
        .set_index("w2")

    c = top["c"].to_numpy(np.float64)
    cv = ctx.loc[top["w1"], "cv"].to_numpy(np.float64)
    n1v = ctx.loc[top["w1"], "n1v"].to_numpy(np.float64)
    n1w = wrd.loc[top["w2"], "n1w"].to_numpy(np.float64)
    p = np.maximum(c - discount, 0.0) / cv \
        + discount * n1v / cv * (n1w / n_types)
    return pa.table({
        "w1": pa.array(top["w1"], pa.string()),
        "w2": pa.array(top["w2"], pa.string()),
        "c": pa.array(top["c"].to_numpy(np.int64)),
        "p_kn": pa.array(np.round(p, 6)),
    })


def _hash_uniform(key: str, n: int) -> np.ndarray:
    """n deterministic uniforms in (0,1) from md5(key) via the Weyl
    stream (the doc_bootstrap_ci law): u_i = (h32·(2i+1) mod 2³²)/2³²,
    shifted off 0."""
    import hashlib

    h = np.uint64(int(hashlib.md5(key.encode()).hexdigest()[:8], 16))
    mults = 2 * np.arange(n, dtype=np.uint64) + 1
    u = ((h * mults) & np.uint64(0xFFFFFFFF)).astype(np.float64) \
        / 4294967296.0
    return 0.05 + 0.9 * u


def nmf_fit(sf_dir: str, k: int = 5, vocab_size: int = 300,
            max_iters: int = 25, eps: float = 1e-12):
    """Distributed NMF topic model via Lee-Seung multiplicative
    updates (NIPS 2001) on the doc×term TF matrix over the top
    ``vocab_size`` corpus terms — the parts-based topic factorization
    next to PCA/GMM/k-means:

        W ← W ∘ (VHᵀ)/(WHHᵀ+ε),   H ← H ∘ (WᵀV)/(WᵀWH+ε)

    Distributed shape (row-partitioned V, the standard HPC NMF
    split): H (k×V, small) broadcasts via ``ray.put`` each iteration;
    each batch updates ITS OWN W rows locally (the W update needs
    only H) and emits k×V / k×k partials (WᵀV, WᵀW) plus a loss
    partial; the driver reduces partials and updates H. W never
    crosses the exchange as a matrix — its rows persist WITH the
    data in the state Dataset (doc_id, tf, w), materialized per
    iteration. Loss = ||V−WH||²_F
    is non-increasing per update (the Lee-Seung guarantee — the
    pytest law), init is the md5-Weyl uniform stream keyed by
    doc_id / term index, so runs are bit-reproducible.

    Returns (vocab list, H (k×V), losses, state_ds)."""
    import ray
    from ray.data.aggregate import Sum as _Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # vocab: top terms by count, ties by term (deterministic)
    def tpart(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update((t or "").lower().split())
        return pa.table({
            "term": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    vt = docs.map_batches(tpart, batch_format="pyarrow",
                          batch_size=8192) \
        .groupby("term").aggregate(_Sum("n", alias_name="n")) \
        .to_pandas().sort_values(["n", "term"],
                                 ascending=[False, True]) \
        .head(vocab_size)
    vocab = vt["term"].tolist()
    vix = {t: i for i, t in enumerate(vocab)}
    nv = len(vocab)

    def init_state(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tf_rows, w_rows = [], []
        for did, txt in zip(ids, batch.column("text").to_pylist()):
            tf = np.zeros(nv)
            for tok in (txt or "").lower().split():
                j = vix.get(tok)
                if j is not None:
                    tf[j] += 1.0
            tf_rows.append(tf.tobytes())
            w_rows.append(_hash_uniform(f"w{int(did)}", k).tobytes())
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "tf": pa.array(tf_rows, pa.large_binary()),
            "w": pa.array(w_rows, pa.large_binary())})

    state = docs.map_batches(init_state, batch_format="pyarrow",
                             batch_size=4096).materialize()
    h = np.stack([_hash_uniform(f"h{j}", nv) for j in range(k)])
    losses: list = []

    for _ in range(max_iters):
        href = ray.put(h)

        def step(batch: pa.Table) -> pa.Table:
            hh = ray.get(href)                    # noqa: B023
            n = batch.num_rows
            v = np.frombuffer(
                b"".join(batch.column("tf").to_pylist()),
                np.float64).reshape(n, nv)
            w = np.frombuffer(
                b"".join(batch.column("w").to_pylist()),
                np.float64).reshape(n, k).copy()
            # W update with current H
            hht = hh @ hh.T
            w *= (v @ hh.T) / (w @ hht + eps)
            # partials for the H update + loss under updated W
            wtv = w.T @ v
            wtw = w.T @ w
            resid = v - w @ hh
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "tf": batch.column("tf"),
                "w": pa.array([r.tobytes() for r in w],
                              pa.large_binary()),
                "_wtv": pa.array([wtv.tobytes()] + [b""] * (n - 1),
                                 pa.large_binary()),
                "_wtw": pa.array([wtw.tobytes()] + [b""] * (n - 1),
                                 pa.large_binary()),
                "_loss": pa.array(
                    [float((resid * resid).sum())] + [0.0] * (n - 1)),
            })

        state = state.map_batches(step, batch_format="pyarrow",
                                  batch_size=4096).materialize()
        wtv = np.zeros((k, nv))
        wtw = np.zeros((k, k))
        loss = 0.0
        for bt in state.iter_batches(batch_format="pyarrow",
                                     batch_size=4096):
            for blob in bt.column("_wtv").to_pylist():
                if blob:
                    wtv += np.frombuffer(blob, np.float64) \
                        .reshape(k, nv)
            for blob in bt.column("_wtw").to_pylist():
                if blob:
                    wtw += np.frombuffer(blob, np.float64) \
                        .reshape(k, k)
            loss += float(np.sum(bt.column("_loss").to_numpy(
                zero_copy_only=False)))
        losses.append(loss)
        h *= wtv / (wtw @ h + eps)
        state = state.drop_columns(["_wtv", "_wtw", "_loss"]) \
            .materialize()
    return vocab, h, losses, state


def doc_nmf_topics(sf_dir: str, k: int = 5, top_terms: int = 8):
    """Query surface: top terms per NMF topic with weights — the
    topic-model readout. Rows-only; pytest gates the Lee-Seung
    monotone-loss law, bit-reproducibility, nonnegativity and a numpy
    replay (tests/test_corpus.py)."""
    vocab, h, _losses, _state = nmf_fit(sf_dir, k=k)
    rows = []
    varr = np.array(vocab, dtype=object)
    for t in range(k):
        order = np.lexsort((varr, -h[t]))[:top_terms]
        for r, j in enumerate(order):
            rows.append((t, r + 1, vocab[j],
                         float(np.round(h[t, j], 5))))
    import pandas as pd

    df = pd.DataFrame(rows, columns=["topic", "rank", "term",
                                     "weight"])
    df["topic"] = df["topic"].astype(np.int64)
    df["rank"] = df["rank"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def nmf_fit_numpy(texts: list, doc_ids: list, k: int = 5,
                  vocab_size: int = 300, max_iters: int = 25,
                  eps: float = 1e-12):
    """Driver oracle: same updates, same md5-Weyl init, in-memory."""
    import collections

    c = collections.Counter()
    for t in texts:
        c.update((t or "").lower().split())
    vt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = [t for t, _ in vt]
    vix = {t: i for i, t in enumerate(vocab)}
    nv = len(vocab)
    v = np.zeros((len(texts), nv))
    for i, t in enumerate(texts):
        for tok in (t or "").lower().split():
            j = vix.get(tok)
            if j is not None:
                v[i, j] += 1.0
    w = np.stack([_hash_uniform(f"w{int(d)}", k) for d in doc_ids])
    h = np.stack([_hash_uniform(f"h{j}", nv) for j in range(k)])
    losses = []
    for _ in range(max_iters):
        w *= (v @ h.T) / (w @ (h @ h.T) + eps)
        resid = v - w @ h
        losses.append(float((resid * resid).sum()))
        h *= (w.T @ v) / ((w.T @ w) @ h + eps)
    return vocab, h, losses


def doc_winnowing(sf_dir: str, k: int = 3, window: int = 4):
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003 — the MOSS algorithm): per document, hash every word
    ``k``-gram (md5-32, the repo's SQL-replayable hash law) and keep
    the sliding-window minima set over windows of ``window``
    consecutive grams — the guarantee: any shared run of
    ``window + k − 1`` words between two documents shares a
    fingerprint. Emits per-doc fingerprint-set summaries (count,
    density, min, additive checksum) — the compare-ready digest a
    plagiarism/near-dup pass joins on.

    Scale shape: one stateless map_batches pass (hashing + sliding
    minima are per-doc numpy); no exchange beyond the output rows.
    The SQL oracle recomputes every gram hash, the ROWS-window
    minima, the distinct set and the checksum independently."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        ids, ng, nf, dens, fmin, fsum = [], [], [], [], [], []
        for did, txt in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist()):
            toks = (txt or "").lower().split()
            grams = [" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1)]
            h = np.array([
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                for g in grams], dtype=np.int64)
            if len(h) >= window:
                sw = np.lib.stride_tricks.sliding_window_view(
                    h, window).min(axis=1)
                fps = np.unique(sw)
            else:
                fps = np.unique(h)      # short doc: whole-doc minima
                if len(h):
                    fps = np.array([int(h.min())], np.int64)
            ids.append(int(did))
            ng.append(len(h))
            nf.append(len(fps))
            dens.append(round(len(fps) / len(h), 6) if len(h)
                        else 0.0)
            fmin.append(int(fps.min()) if len(fps) else -1)
            fsum.append(int(fps.sum() % 2147483647) if len(fps)
                        else -1)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(ng, pa.int64()),
            "n_fps": pa.array(nf, pa.int64()),
            "density": pa.array(dens, pa.float64()),
            "fp_min": pa.array(fmin, pa.int64()),
            "fp_checksum": pa.array(fsum, pa.int64())})

    return docs.map_batches(fp, batch_format="pyarrow",
                            batch_size=4096).sort("doc_id")
