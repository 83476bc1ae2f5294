"""Histogram (device-reducible) eval metrics vs the exact implementations
(VERDICT round-1 item #6): point values must match to <1e-3 and the KGE
eval epoch must produce equivalent metrics in both modes.
"""

from __future__ import annotations

import numpy as np
import jax

from biomedkg_tpu.training.metrics import (BootstrappedBinaryMetrics,
                                           HistogramBinaryMetrics)


def _fixture(n=200_000, seed=0, auroc_ish=0.9):
    rng = np.random.default_rng(seed)
    target = (rng.random(n) < 0.25).astype(np.float64)
    # separated score distributions → realistic AUROC
    logits = rng.normal(loc=target * 2.2 - 1.1, scale=1.0)
    return logits.astype(np.float32), target


def test_histogram_matches_exact_point_values():
    preds, target = _fixture()
    exact = BootstrappedBinaryMetrics(prefix="t_")
    exact.update(preds, target)
    e = exact.compute()

    hist = HistogramBinaryMetrics(prefix="t_")
    hist.update(preds, target)
    h = hist.compute()

    for name in ("AUROC", "AveragePrecision", "F1"):
        assert abs(e[f"t_{name}"] - h[f"t_{name}"]) < 1e-3, \
            (name, e[f"t_{name}"], h[f"t_{name}"])
        # bootstrap std magnitudes should agree (same full-set scale)
        assert h[f"t_{name}_std"] < 0.05


def test_histogram_state_is_additive():
    """Summing per-shard states == one update over the union (the
    psum-reduction contract for multi-host eval)."""
    preds, target = _fixture(n=50_000, seed=1)
    whole = HistogramBinaryMetrics()
    whole.update(preds, target)

    sharded = HistogramBinaryMetrics()
    a = HistogramBinaryMetrics()
    b = HistogramBinaryMetrics()
    a.update(preds[:20_000], target[:20_000])
    b.update(preds[20_000:], target[20_000:])
    sharded.merge_state(a.hist + b.hist, a.f1_counts + b.f1_counts)

    np.testing.assert_allclose(whole.hist, sharded.hist)
    np.testing.assert_allclose(whole.f1_counts, sharded.f1_counts)
    w, s = whole.compute(), sharded.compute()
    for k in w:
        assert abs(w[k] - s[k]) < 1e-12, k


def test_kge_eval_epoch_histogram_vs_exact():
    """Full eval epoch through the module in both modes: same batches,
    metric values within 2e-3, edgewise precision and loss identical."""
    from biomedkg_tpu.data import modules as dm
    from biomedkg_tpu.training.kge_module import KGEModule

    dm.PrimeKGModule.SAINT_EVAL_STEPS = 6
    data = dm.PrimeKGModule(data_dir="./data/primekg", embed_dim=64,
                            node_type=["gene/protein", "drug", "disease"],
                            batch_size=24, val_ratio=0.2, test_ratio=0.2,
                            node_init_method="random")
    data.setup(stage="split")
    mod = KGEModule(encoder_name="rgcn", decoder_name="dismult", in_dim=64,
                    hidden_dim=32, out_dim=32, num_hidden_layers=1,
                    num_relation=data.data.num_edge_types, num_heads=2,
                    scheduler_type="cosine", learning_rate=1e-3,
                    warm_up_ratio=0.2, fuse_method="none", neg_ratio=3,
                    node_init_method="random")
    mod.edge_mapping = data.edge_map_index
    mod.configure_optimizers(10)
    state = mod.init_state(jax.random.PRNGKey(0))

    loader = data.val_dataloader("saint")
    loader.set_epoch(0)
    batches = list(loader)
    rng = jax.random.PRNGKey(9)

    assert mod.eval_impl == "histogram"  # the default
    outs_h = [mod.eval_step(state.params, b, jax.random.fold_in(rng, i))
              for i, b in enumerate(batches)]
    assert "hist" in outs_h[0] and "pred" not in outs_h[0]
    m_hist = mod.eval_epoch(outs_h, "val")

    mod.eval_impl = "exact"
    outs_e = [mod.eval_step(state.params, b, jax.random.fold_in(rng, i))
              for i, b in enumerate(batches)]
    assert "pred" in outs_e[0]
    m_exact = mod.eval_epoch(outs_e, "val")

    for name in ("AUROC", "AveragePrecision", "F1"):
        assert abs(m_hist[f"val_{name}"] - m_exact[f"val_{name}"]) < 2e-3, \
            (name, m_hist[f"val_{name}"], m_exact[f"val_{name}"])
    for idx, rel in data.edge_map_index.items():
        key = str(rel) + "_pre"
        np.testing.assert_allclose(m_hist[key], m_exact[key], atol=1e-6,
                                   err_msg=key)
    np.testing.assert_allclose(m_hist["val_loss"], m_exact["val_loss"],
                               rtol=1e-6)


def test_hist_f1_prob_semantics_matches_exact():
    """Regression: predictions entirely in [0,1] must get torchmetrics'
    prob-threshold F1 from BOTH eval paths (the histogram path used the
    logit>0 threshold, marking every sample predicted-positive)."""
    import numpy as np

    from biomedkg_tpu.training.metrics import (BootstrappedBinaryMetrics,
                                               HistogramBinaryMetrics)

    rng = np.random.default_rng(0)
    preds = rng.random(1000)
    target = (rng.random(1000) < preds).astype(np.float64)

    exact = BootstrappedBinaryMetrics()
    exact.update(preds, target)
    hist = HistogramBinaryMetrics()
    hist.update(preds, target)
    e, h = exact.compute(), hist.compute()
    assert abs(e["F1"] - h["F1"]) < 2e-3, (e["F1"], h["F1"])
    assert abs(e["AUROC"] - h["AUROC"]) < 2e-3

    # logit-range predictions keep the exact on-device counts path
    lp = rng.standard_normal(1000) * 3
    lt = (rng.random(1000) < 1 / (1 + np.exp(-lp))).astype(np.float64)
    e2 = BootstrappedBinaryMetrics(); e2.update(lp, lt)
    h2 = HistogramBinaryMetrics(); h2.update(lp, lt)
    assert abs(e2.compute()["F1"] - h2.compute()["F1"]) < 1e-9


def test_standalone_metrics_empty_input():
    import numpy as np

    from biomedkg_tpu.training.metrics import (binary_auroc,
                                               binary_average_precision,
                                               binary_f1)

    e = np.array([])
    assert binary_auroc(e, e) == 0.5
    assert binary_average_precision(e, e) == 0.0
    assert binary_f1(e, e) == 0.0
