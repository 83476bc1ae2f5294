"""Serving-path probe: KGEScorer latency AND throughput under load.

Builds the bench-scale graph (synthetic PrimeKG fallback, ~52k nodes),
trains one fast_dev_run batch (parameter VALUES don't matter for
latency), saves a checkpoint, then measures the serving surface the way
a production deployment would see it:

  1. single-query score / topk round-trip latency (RTT-bound);
  2. closed-loop batch sweep (1 → 1024): amortized ms/query, qps, and
     device dispatches per query;
  3. open-loop load test: Poisson arrivals at several offered rates
     feed a batching server (drain-the-queue policy, max batch 1024);
     reports sustained qps + p50/p99 sojourn latency per rate.

Usage:  python scripts/serving_probe.py [n_queries] [--load-secs S]
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


def sample_queries(scorer, n_q, seed=0):
    g = scorer.dm.data.graph
    rng = np.random.default_rng(seed)
    picks = rng.integers(0, g.edge_index.shape[1], size=n_q)
    id_to_rel = {v: k for k, v in scorer.rel_to_id.items()}
    return [(scorer.id_to_name[int(g.edge_index[0, e])],
             id_to_rel[int(g.edge_type[e])],
             scorer.id_to_name[int(g.edge_index[1, e])])
            for e in picks]


class DispatchCounter:
    """Counts device dispatches by wrapping scorer._score_fn."""

    def __init__(self, scorer):
        self.scorer, self.inner, self.n = scorer, scorer._score_fn, 0

    def __enter__(self):
        def counted(*a, **k):
            self.n += 1
            return self.inner(*a, **k)
        self.scorer._score_fn = counted
        return self

    def __exit__(self, *exc):
        self.scorer._score_fn = self.inner


def batch_sweep(scorer, queries):
    """Closed-loop: ms/query and dispatches/query vs batch size."""
    print("\n[batch sweep]  B      ms/batch   ms/query      qps"
          "   disp/query", flush=True)
    rows = []
    for b in (1, 4, 16, 64, 256, 1024):
        batch = (queries * ((b // len(queries)) + 1))[:b]
        scorer.score_many(batch)                    # compile this bucket
        iters = max(3, min(50, 4096 // b))
        with DispatchCounter(scorer) as dc:
            t0 = time.perf_counter()
            for _ in range(iters):
                scorer.score_many(batch)
            dt = (time.perf_counter() - t0) / iters
        dpq = dc.n / (iters * b)
        rows.append((b, dt * 1e3, dt / b * 1e3, b / dt, dpq))
        print(f"              {b:5d}  {dt * 1e3:9.2f}  {dt / b * 1e3:9.3f}"
              f"  {b / dt:9,.0f}   {dpq:.4f}", flush=True)
    return rows


def warm_buckets(scorer, queries):
    """Compile every score_many pad bucket a drain-the-queue server can
    hit (64..1024) — production servers warm these at startup; a cold
    bucket compile over the tunnel is ~1-3 s and poisons short runs."""
    for b in (1, 64, 128, 256, 512, 1024):
        scorer.score_many((queries * ((b // len(queries)) + 1))[:b])


def load_test(scorer, queries, offered_qps, secs):
    """Open-loop: Poisson arrivals at ``offered_qps`` into a batching
    server that drains the queue (max 1024) per dispatch. Returns
    (achieved qps, p50 ms, p99 ms, mean batch, dispatches)."""
    rng = np.random.default_rng(1)
    n = max(32, int(offered_qps * secs))
    arrivals = np.cumsum(rng.exponential(1.0 / offered_qps, size=n))
    pool = (queries * ((n // len(queries)) + 1))[:n]

    lat = np.empty(n)
    batches = []
    i = 0
    t0 = time.perf_counter()
    while i < n:
        now = time.perf_counter() - t0
        if arrivals[i] > now:                       # queue empty: wait
            time.sleep(min(arrivals[i] - now, 0.05))
            continue
        j = int(np.searchsorted(arrivals, now, side="right"))
        j = min(j, i + 1024, n)                     # drain, cap batch
        scorer.score_many(pool[i:j])
        done = time.perf_counter() - t0
        lat[i:j] = done - arrivals[i:j]
        batches.append(j - i)
        i = j
    wall = time.perf_counter() - t0
    return (n / wall, float(np.percentile(lat, 50) * 1e3),
            float(np.percentile(lat, 99) * 1e3),
            float(np.mean(batches)), len(batches))


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 200
    load_secs = 3.0
    if "--load-secs" in sys.argv:
        load_secs = float(sys.argv[sys.argv.index("--load-secs") + 1])
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

    queries = sample_queries(scorer, n_q)

    scorer.score(*queries[0])                       # compile
    t0 = time.perf_counter()
    for h, r, t in queries:
        scorer.score(h, r, t)
    dt = (time.perf_counter() - t0) / n_q
    print(f"[score] {dt * 1e3:.2f} ms/query  ({1 / dt:,.0f} qps)",
          flush=True)

    scorer.topk_tails(*queries[0][:2], 10)          # compile
    t0 = time.perf_counter()
    for h, r, _ in queries:
        scorer.topk_tails(h, r, 10)
    dt = (time.perf_counter() - t0) / n_q
    print(f"[topk]  {dt * 1e3:.2f} ms/query over {n_nodes} candidates "
          f"({1 / dt:,.0f} qps)", flush=True)

    batch_sweep(scorer, queries)

    warm_buckets(scorer, queries)
    print("\n[load test]  offered    achieved   p50 ms   p99 ms"
          "   mean B   dispatches", flush=True)
    for offered in (100, 500, 2000, 8000, 20000):
        qps, p50, p99, mb, nd = load_test(scorer, queries, offered,
                                          load_secs)
        print(f"             {offered:7,d}   {qps:9,.0f}  {p50:7.1f}"
              f"  {p99:7.1f}   {mb:6.1f}   {nd:6d}", flush=True)


if __name__ == "__main__":
    main()
