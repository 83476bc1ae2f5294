"""Capture a jax.profiler trace of the production KGE train step on the
attached chip and decompose the step: wall vs device-busy vs dispatch
gap, a category rollup (kernels / scatters / gathers / adam / rng /
copies), and the top individual ops (the trace→attribute→fix loop that
drove every round-2 optimization — PERF.md).

Usage: python scripts/profile_step.py [logdir] [scan_k] [neg_sampler]
(`make profile`)
"""

import collections
import glob
import gzip
import json
import re
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

CATEGORIES = [
    ("negscore kernel", re.compile(r"tpu_custom_call|pallas|custom-call")),
    ("scatter", re.compile(r"scatter")),
    ("gather/slice", re.compile(r"gather|dynamic-slice|dynamic_slice")),
    ("adam/opt", re.compile(r"adam|clip|global_norm|mul_add|scale")),
    ("rng", re.compile(r"threefry|random|rng|iota_.*bits|erf_inv")),
    ("convert/copy", re.compile(r"convert|copy|transpose|bitcast|reshape")),
    ("matmul", re.compile(r"dot|conv")),
    ("fusion (other)", re.compile(r"fusion")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


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

    traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz",
                              recursive=True))
    with gzip.open(traces[-1]) as f:
        t = json.load(f)

    # identify device lanes (TensorCore pids) vs host threads: device op
    # events carry XLA op names; host python/runtime lanes are excluded by
    # only counting events whose name appears >= n_dispatch times or that
    # look like XLA ops
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            dur[name] += e["dur"]
            cnt[name] += 1
    steps = n_dispatch * scan_k
    per_step = {n: d / 1e3 / steps for n, d in dur.items()
                if cnt[n] in (steps, n_dispatch)}  # per-step or per-scan ops
    busy = sum(per_step.values())

    print(f"scan_k={scan_k}  wall {wall_ms:.2f} ms/step   "
          f"device-attributed {busy:.2f} ms/step   "
          f"gap (dispatch/idle/untracked) {wall_ms - busy:.2f} ms")

    rollup = collections.Counter()
    for name, ms in per_step.items():
        rollup[categorize(name)] += ms
    print("category rollup (ms/step):")
    for cat, ms in rollup.most_common():
        print(f"  {ms:7.3f} ms  {cat}")

    print("top device ops (ms/step):")
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:40]:
        tag = "scan" if cnt[name] == n_dispatch else "step"
        print(f"  {ms:7.3f} ms [{tag}]  {name[:86]}")


if __name__ == "__main__":
    main()
