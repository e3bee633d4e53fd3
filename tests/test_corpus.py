"""Corpus-prep operators: decontamination, postings, stratified sample.

The three driver-style oracle gates live in test_entry_oracle.py (these
queries are in oracle_sql()); here we gate the operator-specific laws:
benchmark docs are always contaminated, postings tf sums to the token
count, stratified picks are stable and exactly n per stratum.
"""

import duckdb
import pyarrow as pa
import pytest

from crawl4ai_ray.pipelines import corpus

SF = "/root/testdata/sf0.001"


def _pd(ds):
    return ds.to_pandas()


def test_decontaminate_benchmark_docs_fully_hit():
    df = _pd(corpus.decontaminate(SF)).set_index("doc_id")
    bench = df[df.index < 20]
    nonempty = bench[bench["n_grams"] > 0]
    assert (nonempty["n_hit"] == nonempty["n_grams"]).all()
    assert (nonempty["contaminated"] == 1).all()
    # and the flag law holds corpus-wide
    law = ((2 * df["n_hit"] >= df["n_grams"]) & (df["n_grams"] > 0))
    assert (df["contaminated"] == law.astype("int32")).all()


def test_postings_tf_sums_to_token_count():
    df = _pd(corpus.corpus_postings(SF, min_df=1))
    con = duckdb.connect()
    try:
        want = con.execute(
            f"""
            SELECT sum(len(string_split_regex(trim(lower(text)), '\\s+')))
            FROM read_parquet('{SF}/documents.parquet')
            """
        ).fetchone()[0]
    finally:
        con.close()
    assert df["tf"].sum() == want
    # df column is consistent: every term's df equals its distinct-doc count
    per_term = df.groupby("term").agg(
        n_docs=("doc_id", "nunique"), df_col=("df", "first"),
        df_nunique=("df", "nunique"))
    assert (per_term["df_nunique"] == 1).all()
    assert (per_term["n_docs"] == per_term["df_col"]).all()


def test_stratified_sample_exact_n_and_stable():
    a = _pd(corpus.stratified_sample(SF, n_per=10))
    b = _pd(corpus.stratified_sample(SF, n_per=10))
    key = ["lang", "rnk"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[["lang", "doc_id", "h8", "rnk"]].equals(
        b[["lang", "doc_id", "h8", "rnk"]])
    counts = a.groupby("lang").size()
    assert (counts == 10).all()
    # hash order: within a stratum rnk follows h8 lexicographic order
    for _, g in a.groupby("lang"):
        assert list(g.sort_values("rnk")["h8"]) == sorted(g["h8"])


def test_tfidf_topterms_laws():
    df = _pd(corpus.tfidf_topterms(SF, k=5))
    # at most k rows per doc, rank is 1..n within each doc
    per = df.groupby("doc_id")
    assert (per.size() <= 5).all()
    for _, g in per:
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        # ranks follow (tfidf desc, term asc)
        key = list(zip(-g["tfidf"], g["term"]))
        assert key == sorted(key)
    # a corpus-ubiquitous term (df == N) has tfidf < any rarer term's
    n_docs = df["doc_id"].nunique()
    assert (df.loc[df["df"] < n_docs, "tfidf"] > 0).all()


def test_ngram_dup_stats_laws():
    df = _pd(corpus.ngram_dup_stats(SF, n=5)).set_index("doc_id")
    # dup counts are bounded by totals
    assert (df["n_dup_grams"] <= df["n_grams"]).all()
    assert (df["n_dup_distinct"] <= df["n_distinct_grams"]).all()
    assert (df["n_distinct_grams"] <= df["n_grams"]).all()
    # the sf0.001 corpus has duplicated docs (exact_dedup finds 23
    # groups) — their 5-grams must register as cross-doc duplicates
    assert (df["n_dup_grams"] > 0).any()
    # law cross-check on one pair: exact-duplicate docs share ALL grams
    import duckdb

    con = duckdb.connect()
    try:
        row = con.execute(
            f"""
            SELECT list(doc_id) FROM (
              SELECT doc_id, md5(text) h
              FROM read_parquet('{SF}/documents.parquet'))
            GROUP BY h HAVING count(*) > 1 LIMIT 1
            """
        ).fetchone()
        pair = row[0] if row else None
    finally:
        con.close()
    if pair:
        a = df.loc[pair[0]]
        assert a["n_dup_grams"] == a["n_grams"]


def test_weighted_sample_bias_law():
    # ES-sampling with n_chars weights must over-represent long docs:
    # mean length of the 50 picks exceeds the corpus mean
    import duckdb

    df = _pd(corpus.weighted_sample(SF, k=50))
    assert len(df) == 50
    assert list(df["rnk"]) == list(range(1, 51))
    con = duckdb.connect()
    try:
        mean_all = con.execute(
            f"SELECT avg(n_chars) FROM "
            f"read_parquet('{SF}/documents.parquet')").fetchone()[0]
    finally:
        con.close()
    assert df["n_chars"].mean() > mean_all


def test_pack_sequences_scan_laws():
    df = _pd(corpus.pack_sequences(SF, capacity=2048)) \
        .sort_values("doc_id").reset_index(drop=True)
    # offsets are an exclusive prefix sum in doc_id order: contiguous,
    # non-overlapping, starting at 0
    assert df.loc[0, "start_offset"] == 0
    ends = df["start_offset"] + df["n_tokens"]
    assert (df["start_offset"].iloc[1:].to_numpy()
            == ends.iloc[:-1].to_numpy()).all()
    # bin laws
    assert (df["first_bin"] == df["start_offset"] // 2048).all()
    assert (df["last_bin"] >= df["first_bin"]).all()
    # capacity respected: a doc never spans more bins than its size
    # requires (ceil(n/C)+1 upper bound for arbitrary alignment)
    spans = df["last_bin"] - df["first_bin"] + 1
    assert (spans <= (df["n_tokens"] // 2048) + 2).all()


def _write_docs(tmp_path, texts):
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_substr_dedup_spans_merge_and_within_doc_repeats(tmp_path):
    """ExactSubstr laws on crafted docs: (a) a shared run longer than L
    merges into ONE maximal span; (b) a substring repeated twice INSIDE
    one doc counts toward corpus frequency (Lee et al. count total
    occurrences, not distinct docs); (c) unique text emits nothing."""
    shared = " ".join(f"s{i}" for i in range(12))       # 12-token run
    texts = [
        f"{shared} unique tail one two three four five six",
        f"lead in words here {shared} trailing bits",
        # within-doc repeat of an 8-token run, absent elsewhere
        " ".join(f"r{i}" for i in range(8)) + " gap "
        + " ".join(f"r{i}" for i in range(8)),
        "totally unique text with no duplicated windows at all ok",
    ]
    sf = _write_docs(tmp_path, texts)
    df = _pd(corpus.substr_dedup(sf, length=8)).sort_values(
        ["doc_id", "cut_start"]).reset_index(drop=True)
    # doc 0: shared run at tokens [0, 12) -> one merged span
    d0 = df[df.doc_id == 0]
    assert len(d0) == 1
    assert (int(d0.cut_start.iloc[0]), int(d0.cut_end.iloc[0])) == (0, 12)
    # doc 1: shared run starts at token 4
    d1 = df[df.doc_id == 1]
    assert len(d1) == 1
    assert (int(d1.cut_start.iloc[0]), int(d1.cut_end.iloc[0])) == (4, 16)
    # doc 2: both within-doc occurrences cut as SEPARATE spans — the
    # duplicated windows are at pos 0 and 9 (9 - 0 > L), and the "gap"
    # token between them survives
    d2 = df[df.doc_id == 2].reset_index(drop=True)
    assert len(d2) == 2
    assert [(int(r.cut_start), int(r.cut_end))
            for r in d2.itertuples()] == [(0, 8), (9, 17)]
    # doc 3: nothing
    assert (df.doc_id == 3).sum() == 0
    assert (df.n_tokens == df.cut_end - df.cut_start).all()


def test_substr_dedup_hash_key_path_equal():
    """The 8-byte-key scale path produces the same spans as the exact
    string-keyed form on the test corpus."""
    a = _pd(corpus.substr_dedup(SF, length=8)).sort_values(
        ["doc_id", "cut_start"]).reset_index(drop=True)
    b = _pd(corpus.substr_dedup(SF, length=8, key="hash")).sort_values(
        ["doc_id", "cut_start"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert (a.n_tokens >= 8).all()


def test_pii_redact_laws():
    df = _pd(corpus.pii_redact(SF)).set_index("doc_id")
    # every doc carries exactly the injected email/IP/phone (the
    # synthetic text itself has no @, dotted quads, or 555- tokens)
    assert (df["n_email"] == 1).all()
    assert (df["n_ip"] == 1).all()
    assert (df["n_phone"] == 1).all()
    # redaction is complete: no pattern survives in the output
    import re
    for pat in (corpus.PII_EMAIL, corpus.PII_IPV4, corpus.PII_PHONE):
        assert not df["clean_text"].str.contains(pat, regex=True).any()
    assert df["clean_text"].str.endswith("tel <PHONE>").all()
    assert df["clean_text"].str.contains("<EMAIL> from <IP>").all()


def test_lm_perplexity_laws():
    df = _pd(corpus.lm_perplexity(SF))
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM "
        f"read_parquet('{SF}/documents.parquet')").df()
    df = df.merge(docs, on="doc_id")
    # every multi-token doc is scored, ppl is finite-positive
    assert (df["ppl"] > 0).all()
    assert (df["lm_tokens"] >= 1).all()
    # the model is trained ON src0, so src0 text must look more fluent
    # to it than the corpus at large (CCNet's in-domain law)
    in_dom = df.loc[df["source"] == "src0", "ppl"].mean()
    out_dom = df.loc[df["source"] != "src0", "ppl"].mean()
    assert in_dom < out_dom
    # perplexity can never beat the best single transition probability:
    # with add-0.5 smoothing p <= (c_max+0.5)/(c_max+0.5V) < 1 => ppl > 1
    assert (df["ppl"] > 1.0).all()


def test_temperature_mix_laws():
    import numpy as np

    df = _pd(corpus.temperature_mix(SF, tau=0.7, n_total=200))
    sizes = duckdb.sql(
        f"SELECT source, sum(n_chars) AS size FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY source").df()
    w = np.floor(sizes["size"].to_numpy(float) ** 0.7 * 1e6 + 0.5) / 1e6
    quota = np.floor(200 * w / w.sum()).astype(int)
    qmap = dict(zip(sizes["source"], quota))
    got = df.groupby("source").size()
    # per-source counts equal the tempered quotas (capped by availability)
    for s, q in qmap.items():
        assert got.get(s, 0) == min(q, 25)
    # ranks are contiguous 1..q within each source
    for s, g in df.groupby("source"):
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1))
    # tau=1 gives proportional quotas — larger source, larger quota
    prop = _pd(corpus.temperature_mix(SF, tau=1.0, n_total=200)) \
        .groupby("source").size()
    big = sizes.sort_values("size").iloc[-1]["source"]
    small = sizes.sort_values("size").iloc[0]["source"]
    assert prop[big] > prop[small]
    # tempering compresses the spread vs proportional
    assert got.max() - got.min() <= prop.max() - prop.min()


def test_substr_apply_laws():
    spans = _pd(corpus.substr_dedup(SF)).sort_values(
        ["doc_id", "cut_start"])
    out = _pd(corpus.substr_apply(SF)).set_index("doc_id")
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF}/documents.parquet')").df() \
        .set_index("doc_id")
    # token accounting: n_kept + n_cut == token count, and n_cut equals
    # the doc's merged span widths
    per_doc_cut = spans.groupby("doc_id")["n_tokens"].sum()
    for did, row in out.iterrows():
        w = (docs.loc[did, "text"] or "").lower().split()
        assert row["n_kept"] + row["n_cut"] == len(w)
        assert row["n_cut"] == per_doc_cut.get(did, 0)
        # the surviving text is a subsequence of the tokens
        kept = row["clean_text"].split() if row["clean_text"] else []
        assert len(kept) == row["n_kept"]
        it = iter(w)
        assert all(t in it for t in kept)
    # documents without spans pass through verbatim (normalized join)
    clean_ids = set(out.index) - set(spans["doc_id"])
    assert clean_ids
    some = list(sorted(clean_ids))[:5]
    for did in some:
        assert out.loc[did, "clean_text"] == \
            " ".join((docs.loc[did, "text"] or "").lower().split())


def test_lm_perplexity_pruning_laws():
    full = _pd(corpus.lm_perplexity(SF)).set_index("doc_id")
    # a cap above the true gram count is a no-op (byte-equal)
    huge = _pd(corpus.lm_perplexity(SF, max_grams=10_000_000)) \
        .set_index("doc_id")
    assert full.equals(huge)
    # count-cutoff pruning can only raise perplexity (mass removed
    # from the kept numerators; denominators unchanged)
    pruned = _pd(corpus.lm_perplexity(SF, max_grams=50)) \
        .set_index("doc_id")
    assert (pruned["ppl"] >= full["ppl"] - 0.01).all()
    assert pruned["ppl"].mean() > full["ppl"].mean()
    assert (pruned.index == full.index).all()


def test_substr_dedup_fuzz_vs_bruteforce(tmp_path):
    """Seeded random corpus with planted repeats -> spans must equal an
    independent O(n^2) python reference (stronger than the SQL oracle:
    nothing shared but the tokenization)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 60))]
        texts.append(" ".join(words))
    # plant exact 10-token repeats across and within docs
    chunk = [rng.choice(vocab) for _ in range(10)]
    texts[3] += " " + " ".join(chunk)
    texts[17] = " ".join(chunk) + " " + texts[17]
    texts[29] += " " + " ".join(chunk) + " filler " + " ".join(chunk)
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")

    L = 8
    # brute-force reference: count every L-window, mark duplicated
    # positions, merge per doc with the <=L gap rule
    from collections import Counter
    docs = [t.lower().split() for t in texts]
    cnt = Counter(" ".join(w[i:i + L])
                  for w in docs for i in range(len(w) - L + 1))
    want = []
    for did, w in enumerate(docs):
        pos = [i for i in range(len(w) - L + 1)
               if cnt[" ".join(w[i:i + L])] >= 2]
        while pos:
            start = prev = pos.pop(0)
            while pos and pos[0] - prev <= L:
                prev = pos.pop(0)
            want.append((did, start, prev + L, prev + L - start))

    got = _pd(corpus.substr_dedup(sf)) \
        .sort_values(["doc_id", "cut_start"]).reset_index(drop=True)
    got_tuples = list(got.itertuples(index=False, name=None))
    assert sorted(got_tuples) == sorted(want)

    # apply: cut tokens must equal the reference mask cut
    out = _pd(corpus.substr_apply(sf)).set_index("doc_id")
    spans_by_doc = {}
    for did, s, e, _n in want:
        spans_by_doc.setdefault(did, []).append((s, e))
    for did, w in enumerate(docs):
        mask = [True] * len(w)
        for s, e in spans_by_doc.get(did, []):
            for i in range(s, e):
                mask[i] = False
        kept = [t for t, m in zip(w, mask) if m]
        assert out.loc[did, "clean_text"] == " ".join(kept)


def test_dsir_sample_laws():
    """DSIR weight law: every selected doc's weight equals the brute
    log-ratio sum recomputed in-process; ranking is (weight desc,
    doc_id asc); exactly k rows."""
    import hashlib
    import math

    import numpy as np
    import pyarrow.parquet as pq

    df = _pd(corpus.dsir_sample(SF, k=50))
    assert len(df) == 50
    w = df["weight"].to_numpy()
    assert (np.diff(w) <= 0).all()
    # tie order: equal weights must be doc_id-ascending
    for v in np.unique(w):
        ids = df.loc[df["weight"] == v, "doc_id"].to_numpy()
        assert (np.diff(ids) > 0).all()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pylist()
    B = 1024

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    ct = np.zeros(B)
    cr = np.zeros(B)
    for r in docs:
        for t in (r["text"] or "").lower().split():
            b = bucket(t)
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    lr = (np.log((ct + 1.0) / (ct.sum() + B))
          - np.log((cr + 1.0) / (cr.sum() + B)))
    by_id = {r["doc_id"]: r["text"] for r in docs}
    for _, row in df.iterrows():
        want = round(float(sum(
            lr[bucket(t)] for t in by_id[row["doc_id"]].lower().split())), 6)
        assert math.isclose(row["weight"], want, abs_tol=1e-6)


def test_vocab_encode_laws(ray_session):
    """Vocab: dense 1-based ids in (count desc, term asc) order, every
    kept term >= min_count. Encode: round-trip — decoding non-OOV ids
    through the vocab reproduces the original tokens; OOV ids are
    exactly the below-cutoff tokens; positions are 0..len-1 per doc."""
    import numpy as np

    v = corpus.corpus_vocab(SF, min_count=3).to_pandas() \
        .sort_values("token_id").reset_index(drop=True)
    assert list(v["token_id"]) == list(range(1, len(v) + 1))
    assert (v["n"] >= 3).all()
    key = list(zip(-v["n"], v["term"]))
    assert key == sorted(key)

    enc = corpus.doc_encode_ids(SF, min_count=3).to_pandas()
    id2term = dict(zip(v["token_id"], v["term"]))
    vocab_terms = set(v["term"])
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = dict(zip(docs["doc_id"], docs["text"]))
    for doc_id, g in enc.groupby("doc_id"):
        g = g.sort_values("pos")
        words = docs[doc_id].lower().split()
        assert list(g["pos"]) == list(range(len(words)))
        for w, tid in zip(words, g["token_id"]):
            if w in vocab_terms:
                assert id2term[tid] == w
            else:
                assert tid == 0


def test_mixture_rebalance_laws(ray_session):
    """Sources at or below the equal share are kept whole (threshold
    caps at 2^32); over-represented sources shrink toward N/k; the
    selection is a pure function of doc_id (stable across runs)."""
    import pyarrow.parquet as pq

    out = corpus.mixture_rebalance(SF).to_pandas()
    out2 = corpus.mixture_rebalance(SF).to_pandas()
    assert out.equals(out2)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    n = docs.groupby("source").size()
    target = len(docs) / len(n)
    kept = out.groupby("source").size().reindex(n.index).fillna(0)
    for s in n.index:
        if n[s] <= target:
            assert kept[s] == n[s]          # under target: keep all
        else:
            # binomial around target with p=target/n_s; allow 5 sigma
            p = target / n[s]
            sigma = (n[s] * p * (1 - p)) ** 0.5
            assert abs(kept[s] - target) < 5 * sigma + 1


def test_interleaved_pack_blocking_insensitive():
    """Placement is a pure function of (url -> spans): rebuilding from
    differently sliced blocks yields identical offsets/bins, and costs
    obey n_tokens == n_text_tokens + 64*n_media with contiguous
    start_offsets in url order."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawl4ai_ray.pipelines.corpus import interleaved_pack

    def span(kind, text="", ref="", off=0):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    rows = []
    rng = np.random.default_rng(5)
    for i in range(37):
        spans = []
        for j in range(int(rng.integers(0, 6))):
            if rng.random() < 0.6:
                spans.append(span("text",
                                  " ".join(["w"] * int(
                                      rng.integers(0, 9))), "", j))
            else:
                spans.append(span("image", "", f"img{i}_{j}", j))
        rows.append({"url": f"http://x.test/p{i:03d}", "spans": spans})
    t = pa.Table.from_pylist(rows)

    a = interleaved_pack(rd.from_arrow(
        [t.slice(i * 5, 5) for i in range(8)])).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    b = interleaved_pack(rd.from_arrow(
        [t.slice(0, 20), t.slice(20)])).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert (a["n_tokens"] ==
            a["n_text_tokens"] + 64 * a["n_media"]).all()
    # contiguous concatenation: next start == prev start + prev tokens
    s = a["start_offset"].to_numpy()
    n = a["n_tokens"].to_numpy()
    assert (s[1:] == s[:-1] + n[:-1]).all()
    assert s[0] == 0


def test_compress_ratio_laws(ray_session):
    import zlib

    df = _pd(corpus.doc_compress_ratio(SF)).set_index("doc_id")
    df2 = _pd(corpus.doc_compress_ratio(SF)).set_index("doc_id")
    assert df.sort_index().equals(df2.sort_index())  # deterministic
    assert (df["compress_ratio"] > 0).all()
    # text compresses; ratio stays below 1 for real documents
    assert (df.loc[df["raw_bytes"] > 100, "compress_ratio"] < 1).all()
    # spot-check three docs against a direct zlib call
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 3").fetchall()
    for did, text in rows:
        raw = text.encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert df.loc[did, "compress_ratio"] == want
    # highly repetitive text compresses better than the median doc
    rep = zlib.compress(("spam " * 200).encode(), 6)
    assert len(rep) / 1000 < df["compress_ratio"].median()


@pytest.mark.usefixtures("ray_session")
def test_nmf_lee_seung_laws_and_replay():
    """Frobenius loss is non-increasing (Lee-Seung 2001 guarantee),
    the distributed fit matches an in-memory replay with the same
    md5-Weyl init, factors stay nonnegative, and the topic readout is
    well-formed."""
    import duckdb
    import numpy as np

    from crawl4ai_ray.pipelines.corpus import (
        doc_nmf_topics, nmf_fit, nmf_fit_numpy)

    sf = "/root/testdata/sf0.01"
    vocab, h, losses, _state = nmf_fit(sf, max_iters=10)
    assert all(b <= a * (1 + 1e-9) for a, b in zip(losses, losses[1:]))
    assert (h >= 0).all()

    df = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet' "
        f"ORDER BY doc_id").df()
    v2, h2, l2 = nmf_fit_numpy(df["text"].tolist(),
                               df["doc_id"].tolist(), max_iters=10)
    assert vocab == v2
    assert np.allclose(losses, l2, rtol=1e-6)
    assert np.allclose(h, h2, rtol=1e-4, atol=1e-8)

    t = doc_nmf_topics(sf).to_pandas()
    assert len(t) == 5 * 8
    assert (t.groupby("topic")["rank"].max() == 8).all()
    assert (t["weight"] >= 0).all()
    # within a topic, weights are non-increasing by rank
    for _, g in t.groupby("topic"):
        w = g.sort_values("rank")["weight"].to_numpy()
        assert (np.diff(w) <= 1e-9).all()
