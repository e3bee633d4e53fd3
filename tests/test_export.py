"""Tokenized-shard export laws: round-trip decode equals re-tokenizing
the raw text, shard membership follows the md5 law, two runs are
byte-identical."""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd

from crawl4ai_ray.pipelines.export import (export_tokenized_shards,
                                           read_tokenized_shard)

SF = "/root/testdata/sf0.001"


def test_export_round_trip_and_determinism(tmp_path):
    out1 = str(tmp_path / "a")
    man = export_tokenized_shards(SF, out1, n_shards=4).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF}/documents.parquet')").df() \
        .set_index("doc_id")
    assert len(man) == 4
    assert int(man["n_docs"].sum()) == len(docs)

    # vocabulary = sorted distinct whitespace tokens of the corpus
    vocab = pd.Index(sorted({w for t in docs["text"]
                             for w in (t or "").lower().split()}))

    total_tokens = 0
    for sid in man["shard_id"]:
        doc_ids, toks = read_tokenized_shard(out1, int(sid))
        # md5 shard law + in-shard (hv, doc_id) order
        hv = np.array([int(hashlib.md5(f"{i}:7".encode())
                           .hexdigest()[:8], 16) for i in doc_ids])
        assert (hv % 4 == int(sid)).all()
        assert list(doc_ids) == sorted(
            doc_ids, key=lambda d: (hv[list(doc_ids).index(d)], d))
        for did, tid in zip(doc_ids, toks):
            words = (docs.loc[did, "text"] or "").lower().split()
            assert list(tid) == list(vocab.get_indexer(
                np.asarray(words, object)).astype(np.uint32))
            total_tokens += len(tid)
    assert total_tokens == int(man["n_tokens"].sum())

    # determinism: a second export is byte-identical
    out2 = str(tmp_path / "b")
    man2 = export_tokenized_shards(SF, out2, n_shards=4).to_pandas()
    assert man.equals(man2)
    for f in sorted(os.listdir(out1)):
        with open(os.path.join(out1, f), "rb") as fa, \
                open(os.path.join(out2, f), "rb") as fb:
            assert fa.read() == fb.read()
