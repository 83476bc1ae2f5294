"""Scale-proof the filtered-ranking evaluator on real TPU hardware
(round-1 VERDICT item #5): PrimeKG++-scale (52k nodes) and a 130k-node
stress case, all four decoders, wall-clock + device-memory numbers.

Usage: python scripts/rank_scale_probe.py [small|large] [num_test]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(num_nodes, num_edges, seed=0):
    rng = np.random.default_rng(seed)
    heads = rng.integers(0, num_nodes, num_edges)
    tails = rng.integers(0, num_nodes, num_edges)
    rels = rng.integers(0, 8, num_edges)
    return np.stack([heads, rels, tails], axis=1).astype(np.int64)


def mem_stats(tag):
    import jax

    try:
        s = jax.local_devices()[0].memory_stats() or {}
        peak = s.get("peak_bytes_in_use", 0) / 2**30
        now = s.get("bytes_in_use", 0) / 2**30
        print(f"  [{tag}] HBM in use {now:.2f} GiB, peak {peak:.2f} GiB",
              flush=True)
    except Exception as e:  # axon backend may not expose stats
        print(f"  [{tag}] memory_stats unavailable: {e}", flush=True)


def main():
    import jax.numpy as jnp

    from biomedkg_tpu.models import decoders as D

    case = sys.argv[1] if len(sys.argv) > 1 else "small"
    num_test = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    if case == "small":
        n, e = 52_000, 1_300_000
    else:
        n, e = 130_000, 3_000_000

    d = 256
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    all_triples = build(n, e)
    test_triples = all_triples[
        rng.choice(e, size=num_test, replace=False)]

    from biomedkg_tpu.eval.ranking import filtered_ranking_metrics

    import jax

    for name, cls in [("dismult", D.DistMult), ("transe", D.TransE),
                      ("complex", D.ComplEx), ("rotate", D.RotatE)]:
        dec = cls(8, d)
        params = dec.init(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        m = filtered_ranking_metrics(dec, params, z, test_triples,
                                     all_triples)
        dt = time.perf_counter() - t0
        per = dt / (2 * num_test) * 1e3
        print(f"{name:>8s} N={n:>6d}: {dt:7.1f}s wall for {num_test} test "
              f"triples (both sides) = {per:6.2f} ms/triple-direction; "
              f"mrr={m['mrr']:.4f}", flush=True)
        mem_stats(name)


if __name__ == "__main__":
    main()
