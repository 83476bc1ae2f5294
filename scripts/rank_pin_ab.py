"""Same-session A/B for the filtered-ranking f32 matmul pin (PERF.md
round-5 correctness postscript): pinned (shipped; exact ranks) vs the
pin monkeypatched out (default matmul precision — WRONG ranks on TPU,
timing-only leg). Quantifies what exactness costs at full node count.

The pin multiplies only scan 1's (chunk, N) score matmul (HIGHEST =
multi-pass bf16); scan 2 is gather/compare-bound and unaffected.

Usage: python scripts/rank_pin_ab.py [n_nodes] [num_test] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def degree_realistic_triples(n, e, seed=0):
    """Zipf-ish endpoint draw: reproduces the hub-key filter skew that
    made uniform probes unrepresentative (PERF.md round-5)."""
    rng = np.random.default_rng(seed)
    w = 1.0 / (np.arange(n) + 10.0)
    w /= w.sum()
    heads = rng.choice(n, e, p=w)
    tails = rng.choice(n, e, p=w)
    rels = rng.integers(0, 10, e)
    return np.stack([heads, rels, tails], axis=1).astype(np.int64)


def main():
    import jax
    import jax.numpy as jnp

    from biomedkg_tpu.eval import ranking
    from biomedkg_tpu.models import decoders as D

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 127_000
    num_test = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((n, 256)).astype(np.float32))
    all_triples = degree_realistic_triples(n, 3_500_000)
    test = all_triples[rng.choice(len(all_triples), num_test,
                                  replace=False)]
    dec = D.DistMult(10, 256)
    params = dec.init(jax.random.PRNGKey(0))

    real_pin = ranking._f32_matmuls
    for tag, pin in (("pinned-f32", real_pin),
                     ("default-prec", lambda f: f)):
        ranking._f32_matmuls = pin
        walls = []
        for r in range(reps + 1):
            t0 = time.perf_counter()
            m = ranking.filtered_ranking_metrics(dec, params, z, test,
                                                 all_triples)
            walls.append(time.perf_counter() - t0)
        # rep 0 is the compile; steady = median of the rest
        steady = float(np.median(walls[1:]))
        print(f"{tag:>13s}: cold {walls[0]:6.2f}s, steady "
              f"{steady:6.2f}s /{num_test} triples both dirs "
              f"({steady / (2 * num_test) * 1e3:.3f} ms/triple-dir) "
              f"mrr={m['mrr']:.4f}", flush=True)
    ranking._f32_matmuls = real_pin


if __name__ == "__main__":
    main()
