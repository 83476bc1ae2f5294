"""MEASURED reference-scale filtered eval (round-2 VERDICT #7): the full
PrimeKG++-scale test split (no subsampling), both directions, all four
decoders, end-to-end on the chip — wall-clock minutes replace the round-2
"~6 min/decoder" extrapolation.

Usage: python scripts/rank_full_probe.py [decoder ...] [--max N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("BIOMEDKG_SYNTHETIC_SCALE", "primekg")


def main():
    import jax

    from biomedkg_tpu.data.modules import PrimeKGModule
    from biomedkg_tpu.eval.ranking import filtered_ranking_metrics
    from biomedkg_tpu.parallel.dp import stack_batches
    from biomedkg_tpu.sampling.loaders import FullGraphLoader
    from biomedkg_tpu.training.kge_module import KGEModule

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    decoders = args or ["dismult", "transe", "complex", "rotate"]
    max_triples = None
    if "--max" in sys.argv:
        max_triples = int(sys.argv[sys.argv.index("--max") + 1])

    dm = PrimeKGModule(
        data_dir="./data/primekg", embed_dim=768,
        node_type=["gene/protein", "drug", "disease"], batch_size=128,
        val_ratio=0.2, test_ratio=0.2, seed=42)
    dm.setup(stage="split")
    n = dm.graph.num_nodes

    def triples(split):
        ei, et = split.label_edge_index, split.label_edge_type
        return np.stack([ei[0], et.astype(np.int64), ei[1]], axis=1)

    test_triples = triples(dm.test_data)
    if max_triples and len(test_triples) > max_triples:
        test_triples = test_triples[
            np.random.default_rng(0).choice(len(test_triples), max_triples,
                                            replace=False)]
    all_triples = np.concatenate([
        triples(dm.train_data), triples(dm.val_data), triples(dm.test_data)])
    print(f"graph {n} nodes; test triples {len(test_triples)} ×2 dirs; "
          f"filter set {len(all_triples)}", flush=True)

    for dec_name in decoders:
        module = KGEModule(
            encoder_name="rgcn", decoder_name=dec_name, in_dim=768,
            hidden_dim=256, out_dim=256, num_hidden_layers=2,
            num_relation=dm.data.num_edge_types, num_heads=2,
            scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
            fuse_method="none", neg_ratio=10, node_init_method="random",
            compute_dtype="bfloat16")
        dm.device_features = True
        module.set_feature_table(dm.graph.x)
        dm.edge_layout = "dst"
        module.edge_layout = "dst"
        module.configure_optimizers(400)
        state = module.init_state(jax.random.PRNGKey(0))
        loader = iter(dm.train_dataloader(loader_type="saint"))
        step = module._get_train_steps_scan()
        rng = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        for _ in range(25):                       # 200 warm-up train steps
            stacked = jax.device_put(stack_batches(
                [next(loader) for _ in range(8)]))
            rng, r = jax.random.split(rng)
            state, loss = step(state, stacked, r)
        print(f"[{dec_name}] 200-step warm train {float(loss):.4f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

        # full-graph encode in RELATION layout (rank_eval.py's path): the
        # training loaders stay dst
        module.edge_layout = "relation"
        fg = FullGraphLoader(dm.test_data.graph).batch()
        t0 = time.perf_counter()
        z = np.asarray(module.encode(state.params, fg))[:n]
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        mets = filtered_ranking_metrics(
            module.model.decoder, state.params["model"]["decoder"],
            np.asarray(z), test_triples, all_triples)
        t_rank = time.perf_counter() - t0
        per = t_rank * 1e3 / (2 * len(test_triples))
        print(f"[{dec_name}] encode {t_enc:.1f}s; filtered ranking "
              f"{t_rank/60:.2f} min ({per:.3f} ms/triple-dir)  "
              f"mrr={mets['mrr']:.4f} hits@10={mets['hits@10']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
