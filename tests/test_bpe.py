"""BPE merge learning must be byte-equal to the paper's algorithm.

The reference below is the textbook Sennrich et al. (2016) procedure
implemented directly on a python dict of word frequencies — the same
corpus pass the distributed version performs, executed serially.  The
law is exact merge-sequence equality: ranks, pairs, and frequencies.
"""

import collections

import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.pipelines.bpe import EOW, bpe_train

SF = "/root/testdata/sf0.001"


def _reference_bpe(texts, n_merges, min_pair=2):
    wc = collections.Counter()
    for t in texts:
        wc.update((t or "").lower().split())
    types = {tuple(list(w) + [EOW]): n for w, n in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs = collections.Counter()
        for syms, n in types.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair:
            break
        merges.append((rank, a, b, cnt))
        new_types = {}
        for syms, n in types.items():
            res, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_types[tuple(res)] = new_types.get(tuple(res), 0) + n
        types = new_types
    return merges


def test_bpe_matches_reference(ray_session):
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    want = _reference_bpe(texts, n_merges=25)
    got = bpe_train(SF, n_merges=25).to_pandas()
    assert len(got) == len(want)
    for row, (rank, a, b, cnt) in zip(got.itertuples(index=False), want):
        assert (row.rank, row.left, row.right, row.freq) \
            == (rank, a, b, cnt)


def test_bpe_merge_laws(ray_session):
    t = bpe_train(SF, n_merges=12).to_pandas()
    # ranks dense from 0; frequencies non-increasing is NOT required
    # (a merge can create a new frequent pair), but every merged pair
    # must have been reachable: its left/right are single chars, EOW,
    # or concatenations of earlier merges
    assert list(t["rank"]) == list(range(len(t)))
    known = set()
    for _, r in t.iterrows():
        for side in (r["left"], r["right"]):
            assert len(side) == 1 or side == EOW or side in known
        known.add(r["left"] + r["right"])
    assert (t["freq"] >= 2).all()


def test_bpe_encode_roundtrip(ray_session):
    """Every doc's piece sequence, with EOW markers removed and pieces
    concatenated, reproduces its lowercased whitespace tokens; every
    multi-char piece is a learned merge symbol."""
    from crawl4ai_ray.pipelines.bpe import doc_bpe_encode, bpe_train

    n_merges = 15
    merges = bpe_train(SF, n_merges=n_merges).to_pandas()
    symbols = set(merges["left"] + merges["right"])
    enc = doc_bpe_encode(SF, n_merges=n_merges).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for doc_id, g in list(enc.groupby("doc_id"))[:50]:
        g = g.sort_values("pos")
        joined = "".join(g["piece"]).replace(EOW, " ").rstrip()
        assert joined == " ".join((texts[doc_id] or "").lower().split())
        for p in g["piece"]:
            assert len(p.replace(EOW, "x")) == 1 or p == EOW \
                or p in symbols
