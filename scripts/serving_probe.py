"""Serving-path latency probe: KGEScorer score/topk on the chip.

Builds the bench-scale graph (synthetic PrimeKG fallback, ~52k nodes),
trains one fast_dev_run batch (parameter VALUES don't matter for
latency), saves a checkpoint, then times the two serving calls end to
end — name lookup, device dispatch, sigmoid fetch, top-k readback —
the way serve.py issues them. Usage:

  python scripts/serving_probe.py [n_queries]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from biomedkg_tpu.data.modules import PrimeKGModule          # noqa: E402
from biomedkg_tpu.serving import KGEScorer                   # noqa: E402
from biomedkg_tpu.training.kge_module import KGEModule       # noqa: E402
from biomedkg_tpu.training.trainer import Trainer            # noqa: E402

MODEL = dict(in_dim=768, hidden_dim=256, out_dim=256, num_hidden_layers=2)


def make_dm():
    return PrimeKGModule(data_dir="./data/primekg", embed_dim=768,
                         node_type=["gene/protein", "drug", "disease"],
                         batch_size=128, val_ratio=0.05, test_ratio=0.05,
                         node_init_method="random", block_size=256)


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    import jax

    dm = make_dm()
    dm.setup("split")
    model = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", **MODEL,
        num_relation=dm.data.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=1, node_init_method="random",
        compute_dtype="bfloat16")
    trainer = Trainer(max_epochs=1, fast_dev_run=True,
                      enable_progress_bar=False)
    trainer.fit(model, dm.train_dataloader(), dm.val_dataloader())
    trainer.save("/tmp/serving_probe.ckpt")

    t0 = time.perf_counter()
    scorer = KGEScorer("/tmp/serving_probe.ckpt", make_dm())
    n_nodes = scorer.z.shape[0]
    print(f"[init] full-graph encode + scorer build: "
          f"{time.perf_counter() - t0:.1f}s  (N={n_nodes}, "
          f"device={jax.devices()[0]})", flush=True)

    g = scorer.dm.data.graph
    rng = np.random.default_rng(0)
    picks = rng.integers(0, g.edge_index.shape[1], size=n_q)
    queries = [(scorer.id_to_name[int(g.edge_index[0, e])],
                {v: k for k, v in scorer.rel_to_id.items()}[
                    int(g.edge_type[e])],
                scorer.id_to_name[int(g.edge_index[1, e])])
               for e in picks]

    scorer.score(*queries[0])                       # compile
    t0 = time.perf_counter()
    for h, r, t in queries:
        scorer.score(h, r, t)
    dt = (time.perf_counter() - t0) / n_q
    print(f"[score] {dt * 1e3:.2f} ms/query  ({1 / dt:,.0f} qps)",
          flush=True)

    scorer.score_many(queries[:1])                  # compile (64 bucket)
    big = (queries * ((256 // len(queries)) + 1))[:256]
    scorer.score_many(big)                          # compile (256 bucket)
    t0 = time.perf_counter()
    for _ in range(5):
        scorer.score_many(big)
    dt = (time.perf_counter() - t0) / (5 * len(big))
    print(f"[score_many] batch 256: {dt * 1e3:.3f} ms/query amortized "
          f"({1 / dt:,.0f} qps)", flush=True)

    scorer.topk_tails(*queries[0][:2], 10)          # compile
    t0 = time.perf_counter()
    for h, r, _ in queries:
        scorer.topk_tails(h, r, 10)
    dt = (time.perf_counter() - t0) / n_q
    print(f"[topk]  {dt * 1e3:.2f} ms/query over {n_nodes} candidates "
          f"({1 / dt:,.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
