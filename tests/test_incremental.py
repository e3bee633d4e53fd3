"""Incremental-ingest dedup laws: overlap docs drop against state,
committed tags replay as no-ops, uncommitted fragments are ignored."""

import os

import ray.data as rd

from crawl4ai_ray.pipelines.incremental import (ingest_dedup,
                                                incremental_dedup_demo)

SF = "/root/testdata/sf0.001"


def _docs(lo, hi):
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .filter(expr=f"doc_id >= {lo} and doc_id < {hi}")


def test_ingest_drops_overlap_and_replays(ray_session, tmp_path):
    state = str(tmp_path / "state")
    s0 = ingest_dedup(_docs(0, 200), state, "b0").to_pandas()
    assert len(s0) == 200
    s1 = ingest_dedup(_docs(100, 350), state, "b1").to_pandas()
    # docs 100..199 are byte-identical to batch 0's -> dropped
    assert len(s1) == 150
    assert s1["doc_id"].min() >= 200
    # committed tag replays as a no-op with identical survivors
    s1b = ingest_dedup(_docs(100, 350), state, "b1").to_pandas()
    assert sorted(s1b["doc_id"]) == sorted(s1["doc_id"])
    # an uncommitted fragment is invisible to later ingests
    os.makedirs(os.path.join(state, "ingest=junk"))
    s2 = ingest_dedup(_docs(250, 500), state, "b2").to_pandas()
    assert len(s2) == 150  # 250..349 dropped vs b1, 350..499 fresh


def test_demo_covers_every_doc_once(ray_session):
    out = incremental_dedup_demo(SF).to_pandas()
    assert len(out) == 500
    assert out["doc_id"].is_unique
    assert out.groupby("batch").size().tolist() == [200, 150, 150]


def test_fully_duplicated_batch_keeps_schema(ray_session, tmp_path):
    state = str(tmp_path / "s")
    ingest_dedup(_docs(0, 50), state, "a")
    s2 = ingest_dedup(_docs(0, 50), state, "b")
    assert s2.count() == 0
    # the fragment stays TYPED on disk (Dataset schema survives;
    # to_pandas() of zero rows drops columns — a Ray quirk), and the
    # hive dir name surfaces as an `ingest` provenance column
    assert sorted(s2.schema().names) == \
        ["content_md5", "doc_id", "ingest"]
    # and a later batch still probes the (partly empty) state fine
    s3 = ingest_dedup(_docs(25, 75), state, "c").to_pandas()
    assert sorted(s3["doc_id"]) == list(range(50, 75))
