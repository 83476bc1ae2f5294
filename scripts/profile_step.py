"""Capture a jax.profiler trace of the production KGE train step on the
attached chip and decompose the step: wall vs device-busy vs dispatch
gap, a category rollup (kernels / scatters / gathers / adam / rng /
copies), and the top individual ops (the trace→attribute→fix loop that
drove every round-2 optimization — PERF.md).

Usage: python scripts/profile_step.py [logdir] [scan_k] [neg_sampler]
(`make profile`)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import bench  # noqa: E402
from trace_attr import attribute  # noqa: E402


def main():
    import jax

    from biomedkg_tpu.parallel.dp import stack_batches
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
    from biomedkg_tpu.training.kge_module import KGEModule

    logdir = sys.argv[1] if len(sys.argv) > 1 else "log/profile"
    scan_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    neg_sampler = sys.argv[3] if len(sys.argv) > 3 else "sorted"
    tg = bench.build_graph()
    loader = SaintRandomWalkLoader(
        tg.graph, batch_size=bench.BATCH_SIZE,
        walk_length=bench.WALK_LENGTH, num_steps=10**9,
        block_size=bench.BLOCK_SIZE, seed=0, edge_layout="dst")
    it = iter(loader)
    batches = [next(it) for _ in range(scan_k)]
    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", **bench.MODEL,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=bench.NEG_RATIO,
        node_init_method="random", compute_dtype="bfloat16")
    module.neg_sampler = neg_sampler
    module.edge_layout = "dst"
    module.configure_optimizers(num_training_steps=10_000)
    rng = jax.random.PRNGKey(0)
    state = module.init_state(rng)
    step_fn = module._get_train_steps_scan()
    stacked = jax.device_put(stack_batches(batches))
    for _ in range(2):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    float(loss)

    # wall timing (value-fetch methodology, PERF.md)
    wall_groups = 4
    t0 = time.perf_counter()
    for _ in range(wall_groups):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    float(loss)
    wall_ms = (time.perf_counter() - t0) / (wall_groups * scan_k) * 1e3

    n_dispatch = 3
    jax.profiler.start_trace(logdir)
    for _ in range(n_dispatch):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    float(loss)
    jax.profiler.stop_trace()

    attribute(logdir, scan_k, n_dispatch, wall_ms)


if __name__ == "__main__":
    main()
