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
