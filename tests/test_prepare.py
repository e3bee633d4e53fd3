"""Composed prepare_training_data laws: stage effects are real (each
filter drops something), the sink equals the stats, resume skips."""

import os
import shutil

import duckdb
import ray.data as rd

from crawl4ai_ray.pipelines.prepare import prepare_training_data

SF = "/root/testdata/sf0.001"


def test_prepare_stage_effects_and_sink(tmp_path):
    out = str(tmp_path / "prep")
    os.makedirs(out)
    stats = prepare_training_data(SF, out_dir=out).to_pandas()
    total_in = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    kept = int(stats["n_docs"].sum())
    # the chain drops documents (filters are live) but keeps most
    assert 0 < kept < total_in
    assert kept > total_in * 0.5
    # every shard is populated and stats match the written corpus
    assert len(stats) == 8
    assert (stats["n_docs"] > 0).all()
    written = rd.read_parquet(out)
    assert written.count() == kept
    df = written.to_pandas()
    # dedup law: no surviving duplicate content
    assert df["content_md5"].is_unique
    # ppl law: nothing above the cutoff survived
    assert (df["ppl"] <= 45.0).all()
    # PII law: no raw email pattern survives in clean_text
    assert not df["clean_text"].str.contains("@", regex=False).any() \
        or not df["clean_text"].str.contains(
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            regex=True).any()
    # resume: a second run with the marker present skips the write
    # (stats still computed) and leaves the output untouched
    before = sorted(os.listdir(out))
    stats2 = prepare_training_data(SF, out_dir=out).to_pandas()
    assert stats.equals(stats2)
    assert sorted(os.listdir(out)) == before
