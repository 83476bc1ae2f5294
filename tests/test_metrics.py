"""Metric parity: AUROC/AP/F1 vs sklearn; EdgeWisePrecision semantics;
warmup schedules vs the HF closed forms."""

import numpy as np
import pytest
from sklearn.metrics import (average_precision_score, f1_score,
                             roc_auc_score)

from biomedkg_tpu.training.metrics import (BootstrappedBinaryMetrics,
                                           EdgeWisePrecision,
                                           binary_auroc,
                                           binary_average_precision,
                                           binary_f1)
from biomedkg_tpu.training.optim import warmup_schedule


@pytest.fixture
def preds_targets(rng):
    preds = rng.standard_normal(500)
    target = (rng.random(500) > 0.6).astype(np.float64)
    return preds, target


def test_auroc_matches_sklearn(preds_targets):
    preds, target = preds_targets
    np.testing.assert_allclose(binary_auroc(preds, target),
                               roc_auc_score(target, preds), rtol=1e-9)


def test_auroc_with_ties(rng):
    preds = rng.integers(0, 5, 300).astype(np.float64)  # heavy ties
    target = (rng.random(300) > 0.5).astype(np.float64)
    np.testing.assert_allclose(binary_auroc(preds, target),
                               roc_auc_score(target, preds), rtol=1e-9)


def test_ap_matches_sklearn(preds_targets):
    preds, target = preds_targets
    np.testing.assert_allclose(
        binary_average_precision(preds, target),
        average_precision_score(target, preds), rtol=1e-9)


def test_f1_matches_sklearn(preds_targets):
    preds, target = preds_targets
    probs = 1 / (1 + np.exp(-preds))
    np.testing.assert_allclose(
        binary_f1(preds, target),
        f1_score(target, (probs > 0.5).astype(int)), rtol=1e-9)


def test_bootstrap_outputs(preds_targets):
    preds, target = preds_targets
    m = BootstrappedBinaryMetrics(prefix="val_")
    m.update(preds[:250], target[:250])
    m.update(preds[250:], target[250:])
    out = m.compute()
    for name in ("AUROC", "AveragePrecision", "F1"):
        assert f"val_{name}" in out
        assert f"val_{name}_mean" in out and f"val_{name}_std" in out
        # bootstrap mean should be near the point estimate
        assert abs(out[f"val_{name}_mean"] - out[f"val_{name}"]) < 0.1


def test_edgewise_precision():
    ewp = EdgeWisePrecision({0: "likes", 1: "binds"})
    # raw-score thresholding at 0.5 (reference quirk, metrics.py:24-26)
    ewp.update(preds=[0.9, 0.1, 0.7, 0.4], target=[0, 0, 1, 1])
    out = ewp.compute()
    assert out["likes_pre"] == 0.5
    assert out["binds_pre"] == 0.5
    ewp.update(preds=[2.0], target=[1], mask=[True])
    out = ewp.compute()
    assert out["binds_pre"] == pytest.approx(2 / 3)


def test_warmup_schedules():
    total, ratio, lr = 100, 0.2, 1e-3
    lin = warmup_schedule("linear", lr, total, ratio)
    cos = warmup_schedule("cosine", lr, total, ratio)
    warm = int(total * ratio)
    # ramp
    np.testing.assert_allclose(float(lin(10)), lr * 10 / warm, rtol=1e-6)
    # HF linear decay: lr * (total-step)/(total-warm)
    np.testing.assert_allclose(float(lin(60)), lr * (1 - 40 / 80),
                               rtol=1e-6)
    # cosine endpoints
    np.testing.assert_allclose(float(cos(warm)), lr, rtol=1e-5)
    assert float(cos(total)) < 1e-9
    # monotone decay post-warmup
    vals = [float(cos(s)) for s in range(warm, total, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
