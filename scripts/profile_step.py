"""Capture a jax.profiler trace of the production KGE train step on the
attached chip and print the top device ops (the trace→attribute→fix loop
that drove every round-2 optimization — PERF.md).

Usage: python scripts/profile_step.py [logdir]   (or `make profile`)
"""

import collections
import glob
import gzip
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    import jax

    from biomedkg_tpu.parallel.dp import stack_batches
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
    from biomedkg_tpu.training.kge_module import KGEModule

    logdir = sys.argv[1] if len(sys.argv) > 1 else "log/profile"
    tg = bench.build_graph()
    loader = SaintRandomWalkLoader(
        tg.graph, batch_size=bench.BATCH_SIZE,
        walk_length=bench.WALK_LENGTH, num_steps=10**9,
        block_size=bench.BLOCK_SIZE, seed=0, edge_layout="dst")
    it = iter(loader)
    batches = [next(it) for _ in range(8)]
    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", **bench.MODEL,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=bench.NEG_RATIO,
        node_init_method="random", compute_dtype="bfloat16")
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

    jax.profiler.start_trace(logdir)
    for _ in range(3):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    float(loss)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz",
                              recursive=True))
    with gzip.open(traces[-1]) as f:
        t = json.load(f)
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            dur[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    steps = 24  # 3 dispatches × 8-step scan
    print(f"top device ops (ms/step over {steps} steps):")
    for name, d in dur.most_common(40):
        if cnt[name] == steps:  # per-step device ops only
            print(f"  {d / 1e3 / steps:7.3f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
