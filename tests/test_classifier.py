"""Quality-classifier trainer laws: Newton/IRLS loss descent, dual-form
(driver vs distributed) agreement, determinism, and real separating
power on the src0-vs-rest task the operator is for."""

import numpy as np

from crawl4ai_ray.pipelines import classifier

SF = "/root/testdata/sf0.001"


def _auc(labels: np.ndarray, scores: np.ndarray) -> float:
    import pandas as pd

    ranks = pd.Series(scores).rank(method="average").to_numpy()
    n1 = labels.sum()
    n0 = len(labels) - n1
    return (ranks[labels == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)


def test_irls_loss_descends_and_converges():
    _w, hist = classifier.train_quality_classifier(SF, form="driver")
    assert len(hist) == 8
    assert all(a > b for a, b in zip(hist, hist[1:]))
    # quadratic convergence: the last step moves the loss by <1e-3
    assert hist[-2] - hist[-1] < 1e-3


def test_dual_forms_agree():
    w_d, h_d = classifier.train_quality_classifier(
        SF, iters=4, form="driver")
    w_x, h_x = classifier.train_quality_classifier(
        SF, iters=4, form="distributed")
    # identical math, float summation order may differ across blocks
    assert np.allclose(w_d, w_x, rtol=1e-8, atol=1e-10)
    assert np.allclose(h_d, h_x, rtol=1e-10)


def test_training_is_deterministic():
    w1, _ = classifier.train_quality_classifier(SF, iters=3,
                                                form="driver")
    w2, _ = classifier.train_quality_classifier(SF, iters=3,
                                                form="driver")
    assert np.array_equal(w1, w2)


def test_scores_separate_the_trusted_slice():
    df = classifier.quality_classifier_scores(SF).to_pandas()
    assert len(df) == 500
    assert df["score"].between(0, 1).all()
    auc = _auc(df["label"].to_numpy(), df["score"].to_numpy())
    assert auc > 0.98


def test_irls_partials_properties():
    """Pure-math laws of the Newton kernel on random data: chunked
    partials sum to the whole-matrix computation, and the fitted
    gradient vanishes."""
    rng = np.random.default_rng(99)
    n, d = 120, 6
    xb = np.concatenate([rng.standard_normal((n, d)),
                         np.ones((n, 1))], axis=1)
    y = (rng.random(n) < 0.3).astype(float)
    w = rng.standard_normal(d + 1) * 0.1

    g, h, loss = classifier._irls_partials(xb, y, w)
    gs = hs = ls = 0
    for lo in range(0, n, 37):          # ragged chunks
        gc, hc, lc = classifier._irls_partials(
            xb[lo:lo + 37], y[lo:lo + 37], w)
        gs, hs, ls = gs + gc, hs + hc, ls + lc
    assert np.allclose(g, gs) and np.allclose(h, hs)
    assert abs(loss - ls) < 1e-8

    # run Newton to convergence: gradient of the regularized loss ~ 0
    l2 = 1e-6
    wk = np.zeros(d + 1)
    for _ in range(12):
        g, h, _ = classifier._irls_partials(xb, y, wk)
        wk = wk - np.linalg.solve(h + l2 * n * np.eye(d + 1),
                                  g + l2 * n * wk)
    g, _h, _ = classifier._irls_partials(xb, y, wk)
    assert np.linalg.norm(g + l2 * n * wk) < 1e-6
