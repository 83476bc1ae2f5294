"""Stage-B (GCL) step timing on the real chip (round-2 VERDICT #5).

Methodology matches PERF.md round 2: neighbor batches (64 seeds, fanouts
[15, 10]) on the PrimeKG++-scale graph, k=8 scan fusion, value-fetch
timing. Usage: python scripts/gcl_perf_probe.py [dgi|grace|ggd ...]
(each optionally suffixed _bf16 and/or _trace — _trace captures a
jax.profiler trace and prints the per-op attribution via trace_attr).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def probe(tg, batches, model_name, compute_dtype, scan_k=8, groups=4,
          trace_logdir=None):
    import jax

    from biomedkg_tpu.parallel.dp import stack_batches
    from biomedkg_tpu.training.gcl_module import _GCL_CLASSES

    module = _GCL_CLASSES[model_name](
        in_dim=768, hidden_dim=256, out_dim=256, num_hidden_layers=2,
        fuse_method=None, compute_dtype=compute_dtype)
    module.edge_layout = "dst"
    module.configure_optimizers(num_training_steps=10_000)
    rng = jax.random.PRNGKey(0)
    state = module.init_state(rng)
    step_fn = module._get_train_steps_scan()
    stacked = jax.device_put(stack_batches(batches[:scan_k]))

    for _ in range(2):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(groups):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    lv = float(loss)
    dt = time.perf_counter() - t0
    ms = dt / (groups * scan_k) * 1e3
    print(f"{model_name:>6s}/{compute_dtype:<9s}: {ms:7.2f} ms/step  "
          f"loss={lv:.4f}", flush=True)

    if trace_logdir:
        n_dispatch = 3
        jax.profiler.start_trace(trace_logdir)
        for _ in range(n_dispatch):
            rng, r = jax.random.split(rng)
            state, loss = step_fn(state, stacked, r)
        float(loss)
        jax.profiler.stop_trace()
        from trace_attr import attribute

        attribute(trace_logdir, scan_k, n_dispatch, ms)


def main():
    variants = sys.argv[1:] or ["dgi", "grace", "ggd", "dgi_bf16",
                                "grace_bf16", "ggd_bf16"]
    from biomedkg_tpu.sampling.loaders import NeighborBatchLoader

    tg = bench.build_graph()
    loader = NeighborBatchLoader(
        tg.graph, batch_size=64, fanouts=[15, 10], block_size=256,
        seed=0, edge_layout="dst")
    it = iter(loader)
    batches = [next(it) for _ in range(8)]
    b = batches[0]
    print(f"envelope {b.node_mask.shape[0]} nodes / "
          f"{b.edge_mask.shape[0]} edges", flush=True)
    for v in variants:
        name = v.split("_")[0]
        dtype = "bfloat16" if "bf16" in v else "float32"
        probe(tg, batches, name, dtype,
              trace_logdir=f"log/gcl_{v}" if "trace" in v else None)


if __name__ == "__main__":
    main()
