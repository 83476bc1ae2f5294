"""Convergence robustness matrix (VERDICT r4 item #3).

Runs the full KGE training protocol at PrimeKG++ scale (synthetic
fallback graph, reference hyperparameters, production config: dst
layout, bf16 compute, fused negative kernels) across seeds and decoders
and records mean±std AUROC/AP/F1 + filtered MRR, so every parity claim
carries error bars. Legs:

  matrix  — ≥5 seeds × 4 decoders, sorted sampler (production default)
  sorted2 — DistMult × seeds, dual-sorted sampler (re-bound its quality
            cost against the seed band)
  hybrid  — DistMult × seeds, sorted2 epochs 1-2 → sorted after (the
            obvious time-to-quality hybrid; resume-based sampler swap)
  fill    — DistMult × seeds, sorted + occupancy fill_target=0.92
            (convergence evidence for the round-5 packing change)

Each run also records per-epoch val AUROC and epoch wall times
(time-to-quality curves). Results stream to log/convergence_matrix.jsonl.

Usage:
  python scripts/convergence_matrix.py [--legs matrix,sorted2,hybrid,fill]
      [--seeds 5] [--epochs 4] [--mrr-triples 20000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("BIOMEDKG_SYNTHETIC_SCALE", "primekg")

MODEL = dict(in_dim=768, hidden_dim=256, out_dim=256, num_hidden_layers=2)
OUT = "log/convergence_matrix.jsonl"


class _StopAfter:
    """Trainer callback: stop after N epochs (scheduler horizon stays the
    full run so a resumed phase continues the same LR curve)."""

    def __init__(self, epochs):
        self.epochs = epochs
        self.should_stop = False

    def on_validation_end(self, trainer, metrics):
        if trainer.current_epoch + 1 >= self.epochs:
            self.should_stop = True


def make_dm(seed, fill=None):
    from biomedkg_tpu.data.modules import PrimeKGModule

    dm = PrimeKGModule(data_dir="./data/primekg", embed_dim=768,
                       node_type=["gene/protein", "drug", "disease"],
                       batch_size=128, val_ratio=0.2, test_ratio=0.2,
                       node_init_method="random", seed=seed,
                       block_size=256)
    dm.setup("split")
    dm.edge_layout = "dst"
    dm.device_features = True
    dm.saint_fill_target = fill
    return dm


def make_model(decoder, seed, dm):
    from biomedkg_tpu.training.kge_module import KGEModule

    model = KGEModule(
        encoder_name="rgcn", decoder_name=decoder, **MODEL,
        num_relation=dm.data.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=10, node_init_method="random",
        seed=seed, compute_dtype="bfloat16")
    model.edge_layout = "dst"
    model.set_feature_table(dm.graph.x)
    return model


def filtered_mrr(ckpt_path, dm, n_triples, seed):
    from biomedkg_tpu.eval.ranking import filtered_ranking_metrics
    from biomedkg_tpu.sampling.loaders import FullGraphLoader
    from biomedkg_tpu.training.kge_module import load_kge_module

    module, params = load_kge_module(ckpt_path)
    batch = FullGraphLoader(dm.test_data.graph,
                            edge_layout=module.edge_layout).batch()
    z = np.asarray(module.encode(params, batch))[:dm.graph.num_nodes]

    def triples(split):
        ei, et = split.label_edge_index, split.label_edge_type
        return np.stack([ei[0], et, ei[1]], axis=1)

    test = triples(dm.test_data)
    allt = np.concatenate([triples(dm.train_data),
                           triples(dm.val_data), test])
    if len(test) > n_triples:
        sel = np.random.default_rng(0).choice(len(test), n_triples,
                                              replace=False)
        test = test[sel]
    return filtered_ranking_metrics(module.model.decoder,
                                    params["model"]["decoder"], z,
                                    test, allt)


def run_one(decoder, seed, epochs, plan, fill, mrr_triples):
    """plan: ("sorted",) | ("sorted2",) | ("sorted2", "sorted") with the
    swap after epochs//2."""
    from biomedkg_tpu.training.trainer import Trainer

    dm = make_dm(seed, fill=fill)
    model = make_model(decoder, seed, dm)
    model.neg_sampler = plan[0]

    t0 = time.time()
    tmp = f"/tmp/convmat_{decoder}_{seed}.ckpt"
    if len(plan) == 1:
        tr = Trainer(max_epochs=epochs, check_val_every_n_epoch=1,
                     enable_checkpointing=False, enable_progress_bar=False,
                     steps_per_execution=8)
        tr.fit(model, dm.train_dataloader("saint"),
               dm.val_dataloader("saint"))
    else:
        half = epochs // 2
        tr1 = Trainer(max_epochs=epochs, check_val_every_n_epoch=1,
                      enable_checkpointing=False,
                      enable_progress_bar=False, steps_per_execution=8,
                      callbacks=[_StopAfter(half)])
        tr1.fit(model, dm.train_dataloader("saint"),
                dm.val_dataloader("saint"))
        tr1.save(tmp + ".phase1")
        model.neg_sampler = plan[1]
        tr = Trainer(max_epochs=epochs, check_val_every_n_epoch=1,
                     enable_checkpointing=False, enable_progress_bar=False,
                     steps_per_execution=8)
        tr.fit(model, dm.train_dataloader("saint"),
               dm.val_dataloader("saint"), resume_from=tmp + ".phase1")
        tr.history = tr1.history + tr.history
    train_wall = time.time() - t0

    test_metrics = tr.test(model, dm.test_dataloader("saint"))
    tr.save(tmp)
    rank = filtered_mrr(tmp, dm, mrr_triples, seed)
    for p in (tmp, tmp + ".phase1"):
        if os.path.exists(p):
            os.remove(p)

    rec = {
        "decoder": decoder, "seed": seed, "plan": "->".join(plan),
        "fill": fill, "epochs": epochs, "train_wall_s": round(train_wall, 1),
        "val_auroc_per_epoch": [round(h.get("val_AUROC", float("nan")), 5)
                                for h in tr.history],
        "test_auroc": round(test_metrics.get("test_AUROC", float("nan")), 5),
        "test_ap": round(
            test_metrics.get("test_AveragePrecision", float("nan")), 5),
        "test_f1": round(test_metrics.get("test_F1", float("nan")), 5),
        "mrr": round(rank["mrr"], 5),
        "hits@10": round(rank["hits@10"], 5),
    }
    os.makedirs("log", exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("[run] " + json.dumps(rec), flush=True)
    return rec


def summarize(recs, key):
    vals = np.array([r[key] for r in recs], float)
    return f"{np.nanmean(vals):.4f}±{np.nanstd(vals):.4f}"


def _done_keys():
    """(decoder, seed, plan, fill) tuples already recorded — reruns skip
    them, so an interrupted matrix resumes where it left off."""
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                r = json.loads(line)
                done.add((r["decoder"], r["seed"], r["plan"], r["fill"]))
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="matrix,sorted2,hybrid,fill")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--mrr-triples", type=int, default=20000)
    ap.add_argument("--decoders",
                    default="dismult,complex,transe,rotate")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--inproc", action="store_true",
                    help="run every entry in THIS process (debug only: "
                    "jit caches/buffers accumulate ~5 GB per entry — a "
                    "23-entry in-process sweep was host-OOM-killed at "
                    "130 GB RSS)")
    ap.add_argument("--one", nargs=4, metavar=("DEC", "SEED", "PLAN",
                                               "FILL"),
                    help="internal: run a single entry and exit "
                    "(PLAN 'sorted2->sorted'; FILL 'none' or a float)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.one:
        dec, seed, plan, fill = args.one
        run_one(dec, int(seed), args.epochs, tuple(plan.split("->")),
                None if fill == "none" else float(fill),
                args.mrr_triples)
        return
    legs = args.legs.split(",")
    seeds = list(range(args.seeds))
    groups = {}
    done = _done_keys()

    def run_sub(decoder, s, plan, fill):
        import subprocess

        key = (decoder, s, "->".join(plan), fill)
        if key in done:
            print(f"[skip] {key} already in {OUT}", flush=True)
            return None
        cmd = [sys.executable, __file__, "--one", decoder, str(s),
               "->".join(plan), "none" if fill is None else str(fill),
               "--epochs", str(args.epochs),
               "--mrr-triples", str(args.mrr_triples)]
        if args.cpu:
            cmd.append("--cpu")
        subprocess.run(cmd, check=True)
        return None

    def do(tag, decoder, plan, fill):
        if args.inproc:
            recs = [run_one(decoder, s, args.epochs, plan, fill,
                            args.mrr_triples) for s in seeds]
        else:
            for s in seeds:
                run_sub(decoder, s, plan, fill)
            with open(OUT) as f:
                allr = [json.loads(x) for x in f]
            recs = [r for r in allr
                    if (r["decoder"], r["plan"], r["fill"])
                    == (decoder, "->".join(plan), fill)
                    and r["seed"] in seeds]
        groups[tag] = recs

    if "matrix" in legs:
        for dec in args.decoders.split(","):
            do(f"matrix:{dec}", dec, ("sorted",), None)
    if "sorted2" in legs:
        do("sorted2:dismult", "dismult", ("sorted2",), None)
    if "hybrid" in legs:
        do("hybrid:dismult", "dismult", ("sorted2", "sorted"), None)
    if "fill" in legs:
        do("fill:dismult", "dismult", ("sorted",), 0.92)

    print("\n=== summary (mean±std over seeds) ===")
    print(f"{'leg':>18} {'AUROC':>15} {'AP':>15} {'F1':>15} "
          f"{'MRR':>15} {'wall s':>8}")
    for tag, recs in groups.items():
        wall = np.mean([r["train_wall_s"] for r in recs])
        print(f"{tag:>18} {summarize(recs, 'test_auroc'):>15} "
              f"{summarize(recs, 'test_ap'):>15} "
              f"{summarize(recs, 'test_f1'):>15} "
              f"{summarize(recs, 'mrr'):>15} {wall:>8.0f}")


if __name__ == "__main__":
    main()
