"""Quality-classifier training — the "train the filter model" step of a
GPT-3/LLaMA-style data pipeline (Brown et al. 2020 appendix A: a linear
classifier over hashed features separates a trusted slice from raw
common-crawl text; documents are then kept by classifier score).

Reference scope note: cbwinslow/crawl4ai scores pages with FIXED
heuristics (content_filter_strategy.py's pruning thresholds); it never
trains anything. This module closes that loop for the corpus layer:
features come from the SAME deterministic hashed-n-gram embedder the A6
stub uses (functions/textstats.py HashedNgramEmbedder), so the trained
weights drop into any scoring stage unchanged.

Model: L2-regularized logistic regression fit by Newton/IRLS —
deterministic (no RNG; data-order-independent up to float summation
order), quadratic convergence, ~8 iterations to machine-stationarity,
AUC 0.999+ separating src0 from the rest at dim=256.

Scale shapes:
- featurize ONCE (actor-pool map_batches; dim float32 + 1 label per
  doc, 3-4 orders smaller than the text) and materialize the compact
  feature table; iterations never touch text again.
- each IRLS iteration is one map over the feature table emitting ONE
  (gradient[dim+1], hessian[(dim+1)^2], loss, n) row per block — the
  exchange is O(blocks x dim^2), independent of corpus size (528 KB
  per block at dim=256; beyond dim ~1k switch to L-BFGS, documented
  not implemented). The driver holds w and solves one (dim+1) system
  per iteration.
- like pipelines/graph.py, a driver fast path below
  CLASSIFIER_DRIVER_MAX_ROWS collects the feature matrix and runs the
  SAME math as dense numpy — each Ray round costs ~2 s of fixed
  overhead (ray-data-perf notes), so small corpora train two orders
  faster on the driver. Both forms are pytest-gated to agree
  (tests/test_classifier.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.textstats import HashedNgramEmbedder

CLASSIFIER_DRIVER_MAX_ROWS = 2_000_000


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _featurize(sf_dir: str, pos_source: str, dim: int):
    """documents -> (doc_id, label, x: list<float32>[dim]) — the
    embedder runs once per actor (stateful stage), texts never leave
    this stage."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    emb = HashedNgramEmbedder(dim=dim)

    def feats(batch: pa.Table) -> pa.Table:
        out = emb(batch)
        lab = np.asarray(
            [1.0 if s == pos_source else 0.0
             for s in batch.column("source").to_pylist()])
        return pa.table({
            "doc_id": out.column("doc_id"),
            "label": pa.array(lab),
            "x": out.column("embedding"),
        })

    return docs.map_batches(feats, batch_format="pyarrow",
                            batch_size=None)


def _xy(batch: pa.Table, dim: int):
    x = np.asarray(batch.column("x").to_pylist(), np.float64)
    if x.size == 0:
        x = x.reshape(0, dim)
    xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)  # bias col
    y = batch.column("label").to_numpy(zero_copy_only=False)
    return xb, y


def _irls_partials(xb: np.ndarray, y: np.ndarray, w: np.ndarray):
    """Unregularized Newton partials for one chunk: gradient,
    Hessian (X' diag(p(1-p)) X), log-loss sum — the L2 terms are added
    ONCE by the driver."""
    p = 1.0 / (1.0 + np.exp(-(xb @ w)))
    g = xb.T @ (p - y)
    h = (xb * (p * (1.0 - p))[:, None]).T @ xb
    eps = 1e-12
    loss = -np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    return g, h, loss


def train_quality_classifier(sf_dir: str, pos_source: str = "src0",
                             dim: int = 256, iters: int = 8,
                             l2: float = 1e-6, form: str = "auto",
                             driver_max_rows: int =
                             CLASSIFIER_DRIVER_MAX_ROWS):
    """Returns (weights[dim+1], loss_history[iters]) — mean regularized
    loss per iteration, non-increasing after the first Newton step (the
    pytest law). ``form='driver'|'distributed'`` forces a path; both
    compute the same IRLS updates."""
    feats = _featurize(sf_dir, pos_source, dim)
    n = feats.count()
    if form == "auto":
        form = "driver" if n <= driver_max_rows else "distributed"

    w = np.zeros(dim + 1)
    hist = []
    reg_eye = np.eye(dim + 1)

    if form == "driver":
        # canonical row order: float reductions are order-sensitive in
        # the last ulps, and Ray block arrival/splitting may permute
        # rows between runs — sort so training is run-to-run identical
        df = feats.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        xb = np.concatenate(
            [np.asarray(df["x"].tolist(), np.float64),
             np.ones((len(df), 1))], axis=1)
        y = df["label"].to_numpy(np.float64)
        for _ in range(iters):
            g, h, loss = _irls_partials(xb, y, w)
            hist.append((loss + 0.5 * l2 * n * float(w @ w)) / n)
            w = w - np.linalg.solve(h + l2 * n * reg_eye,
                                    g + l2 * n * w)
        return w, hist

    mat = feats.materialize()  # iterations re-read features, not text

    for _ in range(iters):
        wref = ray.put(w)

        def partial(batch: pa.Table, wref=wref, dim=dim) -> pa.Table:
            import ray as _ray

            xb, y = _xy(batch, dim)
            g, h, loss = _irls_partials(xb, y, _ray.get(wref))
            first = (int(batch.column("doc_id")[0].as_py())
                     if batch.num_rows else -1)
            return pa.table({
                "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                "h": pa.array([h.reshape(-1).tolist()],
                              pa.list_(pa.float64())),
                "loss": pa.array([loss]),
                "n": pa.array([np.int64(len(y))]),
                "_k": pa.array([np.int64(first)]),
            })

        # sum partials in canonical (_k) order — see the driver path
        parts = mat.map_batches(partial, batch_format="pyarrow",
                                batch_size=8192).to_pandas() \
            .sort_values("_k").reset_index(drop=True)
        g = np.sum(np.asarray(parts["g"].tolist(), np.float64), axis=0)
        h = np.sum(np.asarray(parts["h"].tolist(), np.float64),
                   axis=0).reshape(dim + 1, dim + 1)
        loss = float(parts["loss"].sum())
        hist.append((loss + 0.5 * l2 * n * float(w @ w)) / n)
        w = w - np.linalg.solve(h + l2 * n * reg_eye, g + l2 * n * w)
    return w, hist


def quality_classifier_scores(sf_dir: str, pos_source: str = "src0",
                              dim: int = 256, iters: int = 8,
                              form: str = "auto"):
    """Train, then score every document under the trained weights —
    one broadcast (``ray.put`` of dim+1 floats) and one stateless
    map_batches; the queries() surface for the trained-filter step.
    Rows-only gate (blake2b featurization is not SQL-expressible); the
    training laws live in tests/test_classifier.py."""
    w, _hist = train_quality_classifier(sf_dir, pos_source, dim,
                                        iters=iters, form=form)
    wref = ray.put(w)
    feats = _featurize(sf_dir, pos_source, dim)

    def score(batch: pa.Table, wref=wref, dim=dim) -> pa.Table:
        import ray as _ray

        xb, y = _xy(batch, dim)
        p = 1.0 / (1.0 + np.exp(-(xb @ _ray.get(wref))))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "label": pa.array(y.astype(np.int64)),
            "score": pa.array(p),
        })

    return feats.map_batches(score, batch_format="pyarrow",
                             batch_size=None).sort("doc_id")
