"""Product-quantization ANN gates (pipelines/similarity.py pq_*).

PQ is approximate by construction, so the gates are the standard ANN
laws: recall vs brute force on clustered vectors (where ANN is
meaningful), ADC-score error bounds against true cosine, deterministic
codebooks/codes for a fixed seed, and index-cache reuse.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.pipelines.similarity import (
    _normalize,
    _pq_encode_codes,
    _pq_train_codebooks,
    brute_force_topk,
    pq_build,
    pq_topk,
)


def _to_pandas(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _write_clustered(tmp_path, n_centers=10, per=50, dim=64, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, dim)) * 3
    vecs = np.concatenate(
        [c + rng.standard_normal((per, dim)) for c in centers])
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32).tolist() for v in vecs],
            type=pa.list_(pa.float32())),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path), _normalize(vecs)


def test_pq_adc_recall_coarse(ray_session, tmp_path):
    """Plain ADC separates clusters: with 50 clusters of 10, the top-9
    neighbors of vec 0 are its 9 cluster-mates, and the quantized scan
    must surface most of them (fine within-cluster ordering is beyond
    raw PQ resolution — that's what rerank is for)."""
    sf, _ = _write_clustered(tmp_path, n_centers=50, per=10)
    exact = set(_to_pandas(brute_force_topk(sf, k=9))["vec_id"])
    approx = set(_to_pandas(
        pq_topk(sf, k=9, index_dir=str(tmp_path / "pqidx")))["vec_id"])
    assert len(exact) == 9
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ ADC recall {recall}"


def test_pq_rerank_recall_exact(ray_session, tmp_path):
    """ADC shortlist + exact re-rank recovers the true top-10 even on
    dense clusters where raw ADC cannot rank near-ties."""
    sf, _ = _write_clustered(tmp_path)
    exact = set(_to_pandas(brute_force_topk(sf, k=10))["vec_id"])
    approx = set(_to_pandas(pq_topk(
        sf, k=10, rerank=100,
        index_dir=str(tmp_path / "pqidx")))["vec_id"])
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"PQ rerank recall {recall}"


def test_pq_adc_error_bound(ray_session, tmp_path):
    """ADC approximates true cosine: with m=8 6-bit codebooks on
    clustered 64-dim data the mean |cos - adc| must stay small."""
    sf, vecs = _write_clustered(tmp_path)
    idx = str(tmp_path / "pqidx")
    books = pq_build(sf, idx, m=8, nbits=6)
    codes = _pq_encode_codes(vecs, books)
    # reconstruct from codes, compare dot products against vec 0
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(books.shape[0])], axis=1)
    q = vecs[0]
    err = np.abs(vecs @ q - recon @ q)
    assert err.mean() < 0.05, err.mean()
    assert np.quantile(err, 0.95) < 0.15


def test_pq_codebooks_deterministic():
    rng = np.random.default_rng(7)
    x = _normalize(rng.standard_normal((500, 32)))
    a = _pq_train_codebooks(x, m=4, k=16, iters=5, seed=1)
    b = _pq_train_codebooks(x, m=4, k=16, iters=5, seed=1)
    assert np.array_equal(a, b)
    ca = _pq_encode_codes(x, a)
    assert ca.shape == (500, 4) and ca.dtype == np.uint8
    assert np.array_equal(ca, _pq_encode_codes(x, b))


def test_pq_dim_not_divisible_raises():
    x = np.zeros((10, 30))
    with pytest.raises(ValueError, match="not divisible"):
        _pq_train_codebooks(x, m=4, k=4, iters=1, seed=0)


def test_pq_index_cache_reused(ray_session, tmp_path):
    sf, _ = _write_clustered(tmp_path)
    idx = str(tmp_path / "pqidx")
    a = _to_pandas(pq_topk(sf, k=5, index_dir=idx))
    stamp = (tmp_path / "pqidx" / "_SUCCESS_c4r").stat().st_mtime
    b = _to_pandas(pq_topk(sf, k=5, index_dir=idx))
    assert (tmp_path / "pqidx" / "_SUCCESS_c4r").stat().st_mtime == stamp
    assert a.equals(b)
