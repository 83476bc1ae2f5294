"""Evaluation metrics: AUROC / AveragePrecision / F1 with bootstrap CIs,
plus per-relation EdgeWisePrecision.

Parity targets: torchmetrics BootStrapper-wrapped MetricCollection
(/root/reference/biomedkg/kge_module.py:63-74; defaults: 10 poisson-weighted
resamples, mean+std) and EdgeWisePrecision
(/root/reference/biomedkg/utils/metrics.py:5-39 — note it thresholds the
*raw* scores at 0.5, a reference quirk kept for parity).

Design: predictions/targets accumulate on host across eval steps (the eval
set is bounded: 100 SAINT batches); all metrics are weighted-count
implementations so a single code path serves both the plain value and the
poisson-bootstrap resamples. EdgeWisePrecision keeps two (num_relations,)
count vectors — a psum-reducible state mirroring torchmetrics'
``dist_reduce_fx="sum"`` for multi-host eval.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _as_probs(preds: np.ndarray) -> np.ndarray:
    """torchmetrics semantics: inputs outside [0,1] are logits → sigmoid."""
    if preds.size and (preds.min() < 0 or preds.max() > 1):
        return _sigmoid(preds)
    return preds


def _tie_group_counts(preds, target, weights):
    """(gp, gn): per-tied-score-group positive/negative weight sums in
    ASCENDING score order — the single representation all AUROC/AP
    implementations here reduce to (bins play the same role in
    HistogramBinaryMetrics)."""
    w = np.ones_like(preds, dtype=np.float64) if weights is None else weights
    pos = target > 0.5
    order = np.argsort(preds, kind="stable")
    s, p, wt = preds[order], pos[order], w[order]
    if not len(s):
        return np.zeros(0), np.zeros(0)
    boundaries = np.concatenate([[True], s[1:] != s[:-1]])
    group_id = np.cumsum(boundaries) - 1
    n_groups = group_id[-1] + 1
    gp = np.bincount(group_id, weights=np.where(p, wt, 0.0),
                     minlength=n_groups)
    gn = np.bincount(group_id, weights=np.where(p, 0.0, wt),
                     minlength=n_groups)
    return gp, gn


def binary_auroc(preds: np.ndarray, target: np.ndarray,
                 weights: Optional[np.ndarray] = None) -> float:
    """Weighted AUROC = P(s_pos > s_neg) + 0.5 P(s_pos = s_neg)."""
    gp, gn = _tie_group_counts(preds, target, weights)
    return _auroc_ap_from_groups(gp, gn)["AUROC"]


def binary_average_precision(preds: np.ndarray, target: np.ndarray,
                             weights: Optional[np.ndarray] = None) -> float:
    """Weighted AP = Σ (R_n − R_{n−1}) P_n over descending-score thresholds."""
    gp, gn = _tie_group_counts(preds, target, weights)
    return _auroc_ap_from_groups(gp, gn)["AveragePrecision"]


def _auroc_ap_from_groups(gp, gn) -> Dict[str, float]:
    """AUROC + AP from ascending tie-group (or histogram-bin) counts —
    THE one implementation (empty input → the degenerate 0.5 / 0.0)."""
    denom = gp.sum() * gn.sum()
    cum_neg = np.concatenate([[0.0], np.cumsum(gn)[:-1]]) if len(gn) \
        else np.zeros(0)
    auroc = (float(np.sum(gp * (cum_neg + 0.5 * gn)) / denom)
             if denom > 0 else 0.5)
    tp = np.cumsum(gp[::-1])
    fp = np.cumsum(gn[::-1])
    total_pos = tp[-1] if len(tp) else 0.0
    if total_pos == 0:
        ap = 0.0
    else:
        recall = tp / total_pos
        precision = tp / np.maximum(tp + fp, 1e-12)
        prev = np.concatenate([[0.0], recall[:-1]])
        ap = float(np.sum((recall - prev) * precision))
    return {"AUROC": auroc, "AveragePrecision": ap}


def binary_f1(preds: np.ndarray, target: np.ndarray,
              weights: Optional[np.ndarray] = None,
              threshold: float = 0.5) -> float:
    w = np.ones_like(preds, dtype=np.float64) if weights is None else weights
    probs = _as_probs(preds)
    pred_pos = probs > threshold
    t = target > 0.5
    tp = np.sum(np.where(pred_pos & t, w, 0.0))
    fp = np.sum(np.where(pred_pos & ~t, w, 0.0))
    fn = np.sum(np.where(~pred_pos & t, w, 0.0))
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom > 0 else 0.0


_METRIC_FNS = {
    "AUROC": binary_auroc,
    "AveragePrecision": binary_average_precision,
    "F1": binary_f1,
}


class BootstrappedBinaryMetrics:
    """AUROC/AP/F1 with poisson-bootstrap mean ± std.

    Mirrors MetricCollection{BootStrapper(AUROC/AP/F1)} cloned with a
    "val_"/"test_" prefix (kge_module.py:63-74).
    """

    # Bootstrap CIs are computed on at most this many predictions (random
    # subsample); the point estimates always use the full set. CI accuracy
    # at 2M samples is far below the CI widths themselves, and this caps
    # eval cost at PrimeKG scale (~50M predictions per epoch).
    MAX_BOOTSTRAP_N = 2_000_000

    def __init__(self, prefix: str = "", num_bootstraps: int = 10,
                 seed: int = 0):
        self.prefix = prefix
        self.num_bootstraps = num_bootstraps
        self.seed = seed
        self.reset()

    @staticmethod
    def _fast_poisson1(rng, n: int) -> np.ndarray:
        """Poisson(1) via inverse-CDF lookup — ~10× faster than
        Generator.poisson for large n (the bootstrap hot path)."""
        k = np.arange(12)
        pmf = np.exp(-1.0) / np.cumprod(np.maximum(k, 1)).astype(np.float64)
        cdf = np.cumsum(pmf)
        return np.searchsorted(cdf, rng.random(n)).astype(np.float64)

    def reset(self):
        self._preds: List[np.ndarray] = []
        self._target: List[np.ndarray] = []

    def update(self, preds, target):
        self._preds.append(np.asarray(preds, dtype=np.float64).ravel())
        self._target.append(np.asarray(target, dtype=np.float64).ravel())

    def compute(self) -> Dict[str, float]:
        if not self._preds:
            return {}
        preds = np.concatenate(self._preds)
        target = np.concatenate(self._target)
        rng = np.random.default_rng(self.seed)

        # Bootstrapping a size-n subsample measures the variability of an
        # n-sample metric, which is ~sqrt(N/n) larger than the full-set
        # metric's; rescale the std so reported CI widths stay calibrated
        # to the full prediction set (torchmetrics BootStrapper parity).
        std_scale = 1.0
        if len(preds) > self.MAX_BOOTSTRAP_N:
            sub = rng.integers(0, len(preds), self.MAX_BOOTSTRAP_N)
            b_preds, b_target = preds[sub], target[sub]
            std_scale = np.sqrt(self.MAX_BOOTSTRAP_N / len(preds))
            point = self._weighted_metrics(preds, target, [None])
            rows = [self._fast_poisson1(rng, len(b_preds))
                    for _ in range(self.num_bootstraps)]
            boots = self._weighted_metrics(b_preds, b_target, rows)
        else:
            # one sort/group pass serves the point row AND every resample
            rows = [self._fast_poisson1(rng, len(preds))
                    for _ in range(self.num_bootstraps)]
            vals = self._weighted_metrics(preds, target, [None] + rows)
            point = {k: v[:1] for k, v in vals.items()}
            boots = {k: v[1:] for k, v in vals.items()}

        out = {}
        for name in _METRIC_FNS:
            out[f"{self.prefix}{name}"] = point[name][0]
            out[f"{self.prefix}{name}_mean"] = float(np.mean(boots[name]))
            out[f"{self.prefix}{name}_std"] = float(
                np.std(boots[name], ddof=1) * std_scale)
        return out

    @staticmethod
    def _weighted_metrics(preds, target, weight_rows) -> Dict[str, list]:
        # Sort ONCE and reuse across every weight row — re-sorting per
        # resample per metric (3 × 11 sorts of ~50M) dominated eval wall
        # clock at PrimeKG scale.
        order = np.argsort(preds, kind="stable")
        s = preds[order]
        t = target[order] > 0.5
        boundaries = np.concatenate([[True], s[1:] != s[:-1]]) \
            if len(s) else np.zeros(0, bool)
        group_id = (np.cumsum(boundaries) - 1) if len(s) else boundaries
        n_groups = int(group_id[-1]) + 1 if len(s) else 0
        probs_pos = _as_probs(preds) > 0.5

        values = {name: [] for name in _METRIC_FNS}
        for w in weight_rows:
            ws = (np.ones_like(s) if w is None else w[order])
            w_pos = np.where(t, ws, 0.0)
            w_neg = np.where(t, 0.0, ws)
            gp = np.bincount(group_id, weights=w_pos, minlength=n_groups)
            gn = np.bincount(group_id, weights=w_neg, minlength=n_groups)
            aa = _auroc_ap_from_groups(gp, gn)  # the ONE implementation
            values["AUROC"].append(aa["AUROC"])
            values["AveragePrecision"].append(aa["AveragePrecision"])
            # F1 @ 0.5 (no sort needed)
            wf = np.ones_like(preds) if w is None else w
            tp_f = np.sum(np.where(probs_pos & (target > 0.5), wf, 0.0))
            fp_f = np.sum(np.where(probs_pos & ~(target > 0.5), wf, 0.0))
            fn_f = np.sum(np.where(~probs_pos & (target > 0.5), wf, 0.0))
            d = 2 * tp_f + fp_f + fn_f
            values["F1"].append(float(2 * tp_f / d) if d > 0 else 0.0)

        return values


class HistogramBinaryMetrics:
    """AUROC/AP/F1 (+ poisson-bootstrap CIs) from fixed-bin score
    histograms — the device-resident, psum-reducible eval state
    (VERDICT round-1 item #6; SURVEY §5 metrics row).

    State per split: ``hist`` (2, NUM_BINS) float32 — weighted counts of
    positives/negatives per sigmoid-probability bin — and ``f1_counts``
    (tp, fp, fn) computed EXACTLY on device with the logit>0 threshold
    (sigmoid(x) > 0.5 ⇔ x > 0, no binning error; when the histogram
    shows every prediction lies in [0, 1], compute() instead follows
    torchmetrics' prob semantics — threshold raw 0.5 — read off the
    bins, matching BootstrappedBinaryMetrics). Both states sum across
    batches/hosts like torchmetrics' ``dist_reduce_fx="sum"``
    (reference utils/metrics.py:12-18), so multi-host eval ships ~256KB
    instead of the full prediction set.

    AUROC/AP treat each bin as a tie group — identical formulas to the
    exact implementation above with bins instead of unique scores; with
    32k bins the deviation is far below the bootstrap CI widths (gated
    <1e-3 in tests/test_metrics_hist.py). Bootstrap resamples draw
    Poisson(count) per bin, which equals per-sample Poisson(1) weights
    aggregated into bins in distribution — and unlike the subsampled
    exact path it bootstraps the FULL set, so no std rescaling is needed.
    """

    NUM_BINS = 32768

    def __init__(self, prefix: str = "", num_bootstraps: int = 10,
                 seed: int = 0):
        self.prefix = prefix
        self.num_bootstraps = num_bootstraps
        self.seed = seed
        self.reset()

    def reset(self):
        self.hist = np.zeros((2, self.NUM_BINS), dtype=np.float64)
        self.f1_counts = np.zeros(3, dtype=np.float64)  # tp, fp, fn

    # -- host update (numpy mirror of the device reduction) -----------------

    def update(self, preds, target, weights=None):
        preds = np.asarray(preds, dtype=np.float64).ravel()
        target = np.asarray(target, dtype=np.float64).ravel() > 0.5
        w = (np.ones_like(preds) if weights is None
             else np.asarray(weights, np.float64).ravel())
        probs = _sigmoid(preds)
        bins = np.minimum((probs * self.NUM_BINS).astype(np.int64),
                          self.NUM_BINS - 1)
        self.hist[0] += np.bincount(bins, weights=np.where(target, w, 0.0),
                                    minlength=self.NUM_BINS)
        self.hist[1] += np.bincount(bins, weights=np.where(target, 0.0, w),
                                    minlength=self.NUM_BINS)
        pred_pos = preds > 0.0
        self.f1_counts[0] += np.sum(np.where(pred_pos & target, w, 0.0))
        self.f1_counts[1] += np.sum(np.where(pred_pos & ~target, w, 0.0))
        self.f1_counts[2] += np.sum(np.where(~pred_pos & target, w, 0.0))

    def merge_state(self, hist, f1_counts):
        """Fold in a device-reduced state (summed across batches/hosts)."""
        self.hist += np.asarray(hist, dtype=np.float64)
        self.f1_counts += np.asarray(f1_counts, dtype=np.float64)

    # -- metric math ----------------------------------------------------------

    @staticmethod
    def _auroc_ap_from_hist(hist) -> Dict[str, float]:
        return _auroc_ap_from_groups(hist[0], hist[1])

    @staticmethod
    def _f1_from_counts(c) -> float:
        tp, fp, fn = c
        denom = 2 * tp + fp + fn
        return float(2 * tp / denom) if denom > 0 else 0.0

    def _prob_mode(self) -> bool:
        """torchmetrics' _as_probs heuristic reconstructed from the
        histogram: the whole eval set lies in [0, 1] iff every occupied
        bin sits inside [sigmoid(0), sigmoid(1)] (up to bin granularity).
        The exact path (BootstrappedBinaryMetrics) thresholds probs at
        0.5 in that case — without this, the two eval paths reported
        DIFFERENT F1 for the same bounded-score predictions."""
        occ = np.nonzero(self.hist.sum(axis=0))[0]
        if not len(occ):
            return False
        lo = int(_sigmoid(np.float64(0.0)) * self.NUM_BINS)
        hi = int(_sigmoid(np.float64(1.0)) * self.NUM_BINS)
        return bool(occ[0] >= lo and occ[-1] <= hi)

    def _f1_from_hist(self, hist) -> float:
        """F1 with the prob-semantics threshold (raw 0.5 ⇔ sigmoid bin
        ≥ bin(sigmoid(0.5))) read off the histogram — binning error only,
        same order as the AUROC/AP bin ties."""
        t_bin = int(_sigmoid(np.float64(0.5)) * self.NUM_BINS)
        tp = hist[0, t_bin:].sum()
        fp = hist[1, t_bin:].sum()
        fn = hist[0, :t_bin].sum()
        return self._f1_from_counts((tp, fp, fn))

    def compute(self) -> Dict[str, float]:
        if self.hist.sum() == 0:
            return {}
        prob_mode = self._prob_mode()
        point = self._auroc_ap_from_hist(self.hist)
        point["F1"] = (self._f1_from_hist(self.hist) if prob_mode
                       else self._f1_from_counts(self.f1_counts))

        rng = np.random.default_rng(self.seed)
        boots = {name: [] for name in point}
        for _ in range(self.num_bootstraps):
            bh = rng.poisson(self.hist)
            bc = rng.poisson(self.f1_counts)
            b = self._auroc_ap_from_hist(bh)
            b["F1"] = (self._f1_from_hist(bh) if prob_mode
                       else self._f1_from_counts(bc))
            for name, v in b.items():
                boots[name].append(v)

        out = {}
        for name, v in point.items():
            out[f"{self.prefix}{name}"] = v
            out[f"{self.prefix}{name}_mean"] = float(np.mean(boots[name]))
            out[f"{self.prefix}{name}_std"] = float(
                np.std(boots[name], ddof=1))
        return out


class EdgeWisePrecision:
    """Per-relation fraction of positive scores above a threshold.

    Parity with reference utils/metrics.py:5-39, including thresholding the
    raw (pre-sigmoid) scores at 0.5. State is two count vectors so it
    psum-reduces across hosts exactly like ``dist_reduce_fx="sum"``.
    """

    def __init__(self, class_mapping: Dict[int, str], threshold: float = 0.5):
        self.class_mapping = class_mapping
        self.threshold = threshold
        self.num_classes = len(class_mapping)
        self.reset()

    def reset(self):
        self.class_counts = np.zeros(self.num_classes, dtype=np.float64)
        self.above_threshold_counts = np.zeros(self.num_classes,
                                               dtype=np.float64)

    def update(self, preds, target, mask=None):
        preds = np.asarray(preds, dtype=np.float64).ravel()
        target = np.asarray(target).ravel().astype(np.int64)
        if mask is not None:
            m = np.asarray(mask).ravel().astype(bool)
            preds, target = preds[m], target[m]
        valid = (target >= 0) & (target < self.num_classes)
        preds, target = preds[valid], target[valid]
        self.class_counts += np.bincount(target, minlength=self.num_classes)
        self.above_threshold_counts += np.bincount(
            target, weights=(preds > self.threshold).astype(np.float64),
            minlength=self.num_classes)

    def compute(self) -> Dict[str, float]:
        out = {}
        for class_idx in range(self.num_classes):
            key = str(self.class_mapping[class_idx]) + "_pre"
            if self.class_counts[class_idx] > 0:
                out[key] = float(self.above_threshold_counts[class_idx]
                                 / self.class_counts[class_idx])
            else:
                out[key] = 0.0
        return out
