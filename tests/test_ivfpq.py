"""IVF-PQ composite ANN gates (pipelines/similarity.py ivfpq_*).

The composite quantizer is approximate by construction, so the gates
are the standard ANN laws (recall vs brute force on clustered vectors,
exactness after re-rank, index-cache reuse) plus the law that makes
IVF-PQ worth having over plain PQ: residual codes reconstruct vectors
strictly better than global codes under the same bit budget.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.similarity import (
    _normalize,
    _pq_encode_codes,
    _pq_train_codebooks,
    brute_force_topk,
    ivfpq_topk,
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


def test_ivfpq_probe_recall_coarse(ray_session, tmp_path):
    """With 50 tight clusters of 10 and n_probe=4 of 16 coarse lists,
    the query's cluster-mates share its list, so the pruned ADC scan
    must surface most of the true top-9."""
    sf, _ = _write_clustered(tmp_path, n_centers=50, per=10)
    exact = set(_to_pandas(brute_force_topk(sf, k=9))["vec_id"])
    approx = set(_to_pandas(ivfpq_topk(
        sf, k=9, nlist=16, n_probe=4,
        index_dir=str(tmp_path / "idx")))["vec_id"])
    assert len(exact) == 9
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF-PQ recall {recall}"


def test_ivfpq_rerank_recall_exact(ray_session, tmp_path):
    """ADC shortlist + exact re-rank recovers the true top-10 even on
    dense clusters where quantized scores cannot rank near-ties."""
    sf, _ = _write_clustered(tmp_path)
    exact = set(_to_pandas(brute_force_topk(sf, k=10))["vec_id"])
    approx = set(_to_pandas(ivfpq_topk(
        sf, k=10, nlist=8, n_probe=8, rerank=100,
        index_dir=str(tmp_path / "idx")))["vec_id"])
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF-PQ rerank recall {recall}"


def test_ivfpq_residual_beats_global_codes():
    """The law that justifies the composite: under the same (m, nbits)
    budget, quantizing residuals against per-cluster centroids
    reconstructs clustered vectors with lower error than quantizing the
    raw vectors against one global codebook."""
    rng = np.random.default_rng(11)
    centers = _normalize(rng.standard_normal((8, 64)) * 3)
    vecs = _normalize(np.concatenate(
        [c + 0.1 * rng.standard_normal((64, 64)) for c in centers]))
    assign = np.argmax(vecs @ centers.T, axis=1)

    def recon_err(x):
        books = _pq_train_codebooks(x, m=8, k=16, iters=6, seed=5)
        codes = _pq_encode_codes(x, books)
        recon = np.concatenate(
            [books[j][codes[:, j]] for j in range(8)], axis=1)
        return np.linalg.norm(x - recon, axis=1).mean()

    res_err = recon_err(vecs - centers[assign])
    glob_err = recon_err(vecs)
    assert res_err < glob_err, (res_err, glob_err)


def test_ivfpq_index_cache_reused(ray_session, tmp_path):
    sf, _ = _write_clustered(tmp_path)
    idx = str(tmp_path / "idx")
    a = _to_pandas(ivfpq_topk(sf, k=5, nlist=8, index_dir=idx))
    stamp = (tmp_path / "idx" / "_SUCCESS_c4r").stat().st_mtime
    b = _to_pandas(ivfpq_topk(sf, k=5, nlist=8, index_dir=idx))
    assert (tmp_path / "idx" / "_SUCCESS_c4r").stat().st_mtime == stamp
    assert a.equals(b)
