"""Downstream DTI classification over frozen KGE node embeddings
(reference /root/reference/ml_exp.py:14-156): mean-pooled (head, tail)
embedding pairs, 3× random negatives, 5-fold stratified CV, per-fold and
mean F1 / AveragePrecision.

Classifier: XGBoost (n_estimators=500, max_depth=5, lr=0.01) when the
package is available; otherwise sklearn's HistGradientBoostingClassifier
with matching capacity — this offline eval is not a TPU kernel target
(SURVEY §2.9)."""

import numpy as np
import pandas as pd
from sklearn.metrics import average_precision_score, f1_score
from sklearn.model_selection import StratifiedKFold

from biomedkg_tpu.common import seed_everything
from biomedkg_tpu.data.node_encoders import KGEEncode

seed_everything(42)


def _make_classifier():
    try:
        import xgboost as xgb

        return xgb.XGBClassifier(n_estimators=500, max_depth=5,
                                 learning_rate=0.01, random_state=42)
    except ModuleNotFoundError:
        from sklearn.ensemble import HistGradientBoostingClassifier

        return HistGradientBoostingClassifier(
            max_iter=500, max_depth=5, learning_rate=0.01, random_state=42)


def main(ckpt_path: str, node_init_method: str, gcl_model: str,
         gcl_fuse_method: str,
         data_dir: str = "data/dpi/dpi_benchmark.csv"):
    kge_encode = KGEEncode(
        ckpt_path=ckpt_path, node_init_method=node_init_method,
        gcl_model=gcl_model, gcl_fuse_method=gcl_fuse_method)

    import os

    if os.path.exists(data_dir):
        df = pd.read_csv(data_dir)
    else:
        from biomedkg_tpu.data.synthetic import synthetic_dpi

        print("[biomedkg_tpu] DPI csv unavailable; using synthetic DTI.")
        df = synthetic_dpi(seed=43)
    df = df.dropna()

    node_names = list(set(df["x_name"]) | set(df["y_name"]))
    node_embeddings = np.asarray(kge_encode(node_names)).squeeze(1)
    # cache-miss diagnostic: misses get xavier-random rows — a large
    # ratio means the DPI names don't match the checkpoint's node
    # vocabulary, and the downstream F1/AP would benchmark noise
    miss = float(getattr(kge_encode, "random_init_ratio", 0.0))
    print(f"[ml_exp] KGE-embedding cache miss ratio: {miss:.3f}")
    if miss > 0.5:
        raise ValueError(
            f"{miss:.0%} of DPI node names missing from the KGE "
            "embedding cache — wrong checkpoint or mismatched node "
            "vocabulary; results would be random-embedding noise")
    mapping = dict(zip(node_names, node_embeddings))

    head = np.stack([mapping[n] for n in df["x_name"]])
    tail = np.stack([mapping[n] for n in df["y_name"]])
    num_pairs = len(df)

    pos = np.stack([head, tail], axis=1)
    rng = np.random.default_rng(42)
    neg_h = head[rng.integers(0, num_pairs, 3 * num_pairs)]
    neg_t = tail[rng.integers(0, num_pairs, 3 * num_pairs)]
    neg = np.stack([neg_h, neg_t], axis=1)

    X = np.concatenate([pos, neg], axis=0).mean(axis=1)
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])

    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=42)
    f1_scores, average_precisions = [], []
    for train_idx, val_idx in skf.split(X, y):
        clf = _make_classifier()
        clf.fit(X[train_idx], y[train_idx])
        pred = clf.predict(X[val_idx])
        proba = clf.predict_proba(X[val_idx])[:, 1]
        f1_scores.append(f1_score(y[val_idx], pred, pos_label=1))
        average_precisions.append(
            average_precision_score(y[val_idx], proba))

    print(f"Result for {ckpt_path}")
    print(f"F1-Scores for each fold: {f1_scores}")
    print(f"Average Precision for each fold: {average_precisions}")
    print(f"Mean F1-Score: {np.mean(f1_scores):.4f}")
    print(f"Mean Average Precision (AP): {np.mean(average_precisions):.4f}")
    print("=" * 20)
    return float(np.mean(f1_scores)), float(np.mean(average_precisions))


if __name__ == "__main__":
    configs = [
        {"ckpt_path": "ckpt/path/to/best.ckpt",
         "node_init_method": "random", "gcl_model": "grace",
         "gcl_fuse_method": "none"},
        {"ckpt_path": "ckpt/path/to/best.ckpt",
         "node_init_method": "lm", "gcl_model": "grace",
         "gcl_fuse_method": "none"},
        {"ckpt_path": "ckpt/path/to/best.ckpt",
         "node_init_method": "gcl", "gcl_model": "grace",
         "gcl_fuse_method": "attention"},
    ]
    for config in configs:
        main(**config)
