"""Reproduce + diagnose the mrr=Infinity rows in log/convergence_matrix.jsonl.

Trains the exact matrix config (dismult, seed 0, sorted, 4 epochs), keeps
the checkpoint, computes filtered ranks with the production two-scan path,
and brute-forces any triple whose rank is < 1 in float64 numpy to see
which scan miscounts.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("BIOMEDKG_SYNTHETIC_SCALE", "primekg")

CKPT = "/tmp/diag_rank.ckpt"


def get_ckpt():
    if os.path.exists(CKPT):
        print("reusing", CKPT, flush=True)
        return
    from scripts.convergence_matrix import make_dm, make_model
    from biomedkg_tpu.training.trainer import Trainer

    dm = make_dm(0)
    model = make_model("dismult", 0, dm)
    model.neg_sampler = "sorted"
    t0 = time.time()
    tr = Trainer(max_epochs=4, check_val_every_n_epoch=1,
                 enable_checkpointing=False, enable_progress_bar=False,
                 steps_per_execution=8)
    tr.fit(model, dm.train_dataloader("saint"), dm.val_dataloader("saint"))
    tr.save(CKPT)
    print(f"trained in {time.time() - t0:.0f}s", flush=True)


def main():
    get_ckpt()
    from scripts.convergence_matrix import make_dm
    from biomedkg_tpu.eval import ranking
    from biomedkg_tpu.sampling.loaders import FullGraphLoader
    from biomedkg_tpu.training.kge_module import load_kge_module

    dm = make_dm(0)
    module, params = load_kge_module(CKPT)
    batch = FullGraphLoader(dm.test_data.graph,
                            edge_layout=module.edge_layout).batch()
    z = np.asarray(module.encode(params, batch))[:dm.graph.num_nodes]
    print("z", z.shape, z.dtype, flush=True)

    def triples(split):
        ei, et = split.label_edge_index, split.label_edge_type
        return np.stack([ei[0], et, ei[1]], axis=1)

    test = triples(dm.test_data)
    allt = np.concatenate([triples(dm.train_data), triples(dm.val_data),
                           test])
    sel = np.random.default_rng(0).choice(len(test), 20000, replace=False)
    test = test[sel]

    num_nodes = int(z.shape[0])
    num_keys = int(allt[:, 1].max()) + 1
    tail_filter = ranking._build_filter(allt, num_nodes, num_keys)
    import jax.numpy as jnp
    zj = jnp.asarray(z)
    dec = module.model.decoder
    dp = params["model"]["decoder"]

    def tails_fn(p, zz, h, t, r):
        return dec.score(p, zz, h, t, r)

    ranks = ranking._direction_ranks(
        dec.score_all_tails, tails_fn, dp, zj,
        test[:, 0], test[:, 1], test[:, 2], tail_filter, 1024, num_keys)
    bad = np.where(ranks < 1.0)[0]
    print(f"tail dir: {len(bad)} ranks < 1 of {len(ranks)}; "
          f"min={ranks.min()}", flush=True)
    print("rank counts near 1:", np.sort(ranks)[:20], flush=True)

    # float64 numpy brute force on the bad triples (and a few controls)
    rel = np.asarray(dp["rel_emb"], np.float64)
    z64 = z.astype(np.float64)
    fkeys, ftails = tail_filter
    probe = list(bad[:8]) + list(range(3))
    for i in probe:
        h, r, t = test[i]
        s = (z64[h] * rel[r]) @ z64.T          # (N,) all-tail scores
        ts = s[t]
        lo = np.searchsorted(fkeys, h * num_keys + r, "left")
        hi = np.searchsorted(fkeys, h * num_keys + r, "right")
        mask = np.ones(num_nodes, bool)
        mask[ftails[lo:hi]] = False
        mask[t] = True
        higher = int(np.sum(s[mask] > ts))
        ties = int(np.sum(s[mask] == ts)) - 1
        true_rank = 1 + higher + 0.5 * ties
        print(f"[{i}] ({h},{r},{t}) two-scan={ranks[i]:.2f} "
              f"f64-brute={true_rank:.2f} filt={hi - lo} "
              f"near-ties={int(np.sum(np.abs(s - ts) < 1e-4))}",
              flush=True)


if __name__ == "__main__":
    main()
