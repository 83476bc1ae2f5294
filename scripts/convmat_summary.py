"""Summarize log/convergence_matrix.jsonl into the PERF.md markdown
table (mean±std over seeds per leg) plus the two derived calls VERDICT
r4 item #3 asks for:

  - sorted2 quality cost re-bound against the matrix seed band
  - hybrid (sorted2 -> sorted) keep/retire via epochs-to-0.949-AUROC

Usage: python scripts/convmat_summary.py [path]
"""

import json
import sys

import numpy as np

PATH = sys.argv[1] if len(sys.argv) > 1 else "log/convergence_matrix.jsonl"
TARGET_AUROC = 0.949   # "time-to-quality" bar: within one std of the
                       # 4-epoch dismult plateau


def leg(rec):
    if rec["fill"] is not None:
        return f"fill={rec['fill']}:{rec['decoder']}"
    if rec["plan"] != "sorted":
        return f"{rec['plan']}:{rec['decoder']}"
    return f"matrix:{rec['decoder']}"


def ms(vals):
    v = np.asarray(vals, float)
    return f"{np.nanmean(v):.4f} ± {np.nanstd(v):.4f}"


def epochs_to(rec, target):
    for i, a in enumerate(rec["val_auroc_per_epoch"]):
        if a >= target:
            return i + 1
    return np.nan


def main():
    groups = {}
    with open(PATH) as f:
        for line in f:
            r = json.loads(line)
            groups.setdefault(leg(r), []).append(r)

    print("| leg | seeds | AUROC | AP | F1 | filtered MRR | Hits@10 |"
          " mean wall s |")
    print("|---|---|---|---|---|---|---|---|")
    for tag, recs in groups.items():
        print(f"| {tag} | {len(recs)} | {ms([r['test_auroc'] for r in recs])}"
              f" | {ms([r['test_ap'] for r in recs])}"
              f" | {ms([r['test_f1'] for r in recs])}"
              f" | {ms([r['mrr'] for r in recs])}"
              f" | {ms([r['hits@10'] for r in recs])}"
              f" | {np.mean([r['train_wall_s'] for r in recs]):.0f} |")

    base = groups.get("matrix:dismult")
    if not base:
        return
    b_auroc = np.array([r["test_auroc"] for r in base])
    print(f"\nmatrix:dismult AUROC band: {b_auroc.mean():.4f} "
          f"± {b_auroc.std():.4f} (n={len(b_auroc)})")
    for tag in ("sorted2:dismult", "sorted2->sorted:dismult",
                "fill=0.92:dismult"):
        recs = groups.get(tag)
        if not recs:
            continue
        a = np.array([r["test_auroc"] for r in recs])
        delta = a.mean() - b_auroc.mean()
        sigma = np.sqrt(a.std() ** 2 / len(a)
                        + b_auroc.std() ** 2 / len(b_auroc))
        print(f"{tag}: ΔAUROC vs matrix = {delta:+.4f} "
              f"({delta / sigma if sigma else 0:+.1f} s.e.)")

    print(f"\nepochs to val AUROC ≥ {TARGET_AUROC} (mean over seeds; "
          f"nan = never within {base[0]['epochs']} epochs):")
    for tag in ("matrix:dismult", "sorted2:dismult",
                "sorted2->sorted:dismult", "fill=0.92:dismult"):
        recs = groups.get(tag)
        if not recs:
            continue
        e = np.array([epochs_to(r, TARGET_AUROC) for r in recs], float)
        w = np.array([r["train_wall_s"] / r["epochs"] for r in recs])
        if np.isnan(e).all():
            print(f"  {tag:>24s}: never within {recs[0]['epochs']} epochs "
                  f"({w.mean():.0f}s/epoch)")
            continue
        print(f"  {tag:>24s}: {np.nanmean(e):.2f} epochs "
              f"(~{np.nanmean(e) * w.mean():.0f}s at this leg's "
              f"{w.mean():.0f}s/epoch)")


if __name__ == "__main__":
    main()
