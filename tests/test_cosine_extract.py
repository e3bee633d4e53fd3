"""CosineStrategy semantic extraction (extraction_strategy.py:121-478
behavioral port): Ward clustering laws, semantic filter back-fill,
word-count gate, determinism, and the distributed stage."""

import numpy as np

from crawl4ai_ray.functions.cosine_extract import (
    DEL,
    CosineClusterStrategy,
    cosine_extract_clusters,
    ward_labels,
)


def test_ward_labels_separates_groups():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 16)) * 0.01 + 1.0
    b = rng.standard_normal((4, 16)) * 0.01 \
        + np.array([1.0] * 8 + [-1.0] * 8)
    lab = ward_labels(np.vstack([a, b]), max_dist=0.5)
    assert len(set(lab[:5])) == 1 and len(set(lab[5:])) == 1
    assert lab[0] != lab[5]
    # labels are 1-based, numbered by first occurrence
    assert lab[0] == 1 and lab[5] == 2


def test_ward_cut_distance():
    """max_dist below every pairwise distance → all singletons; above →
    one cluster."""
    emb = np.eye(4)
    assert len(set(ward_labels(emb, max_dist=1e-6))) == 4
    assert len(set(ward_labels(emb, max_dist=10.0))) == 1
    assert list(ward_labels(np.zeros((1, 4)), 0.1)) == [1]
    assert len(ward_labels(np.zeros((0, 4)), 0.1)) == 0


def test_strategy_clusters_and_tags():
    s = CosineClusterStrategy(word_count_threshold=2, max_dist=0.9)
    secs = ["apple banana cherry fruit salad sweet",
            "banana apple fruit bowl tasty",
            "quantum physics particle wave energy",
            "particle quantum field theory physics"]
    out = s.run("u", secs)
    assert [c["index"] for c in out] == [1, 2]
    assert "apple" in out[0]["tags"] and "quantum" in out[1]["tags"]
    # chunk order preserved inside a cluster (reference retains order)
    assert out[0]["content"].startswith("apple banana cherry")
    assert out == s.run("u", secs)          # deterministic

    # word-count gate drops small clusters
    gated = CosineClusterStrategy(word_count_threshold=50,
                                  max_dist=0.9).run("u", secs)
    assert gated == []


def test_semantic_filter_backfill():
    s = CosineClusterStrategy(semantic_filter="quantum physics",
                              sim_threshold=0.2)
    secs = ["apple banana cherry fruit salad sweet",
            "banana apple fruit bowl tasty",
            "quantum physics particle wave energy",
            "particle quantum field theory physics"]
    kept = s._filter_chunks(secs, at_least_k=2)
    assert kept == secs[2:]                  # only physics chunks pass
    # at_least_k back-fill: ask for more than pass the threshold
    kept3 = s._filter_chunks(secs, at_least_k=3)
    assert len(kept3) == 3 and set(secs[2:]) <= set(kept3)


def test_distributed_stage(ray_session):
    ds = cosine_extract_clusters("/root/testdata/sf0.001",
                                 max_dist=0.35)
    df = ds.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"doc_key", "cluster_index", "tags",
                               "content"}
    # determinism across executions
    df2 = cosine_extract_clusters("/root/testdata/sf0.001",
                                  max_dist=0.35).to_pandas()
    a = df.sort_values(["doc_key", "cluster_index"]).reset_index(drop=True)
    b = df2.sort_values(["doc_key", "cluster_index"]).reset_index(drop=True)
    assert a.equals(b)
