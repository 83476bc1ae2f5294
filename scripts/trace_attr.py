"""Shared trace→per-op attribution for the perf probes (profile_step.py,
gcl_perf_probe.py): parse a jax.profiler trace directory and print the
wall vs device-busy vs dispatch-gap split, a category rollup, and the
top per-step device ops (the trace→attribute→fix loop from PERF.md).
"""

import collections
import glob
import gzip
import json
import re

CATEGORIES = [
    ("pallas/custom kernel", re.compile(r"tpu_custom_call|pallas|custom-call")),
    ("scatter", re.compile(r"scatter")),
    ("gather/slice", re.compile(r"gather|dynamic-slice|dynamic_slice")),
    ("adam/opt", re.compile(r"adam|clip|global_norm|mul_add|scale")),
    ("rng", re.compile(r"threefry|random|rng|iota_.*bits|erf_inv")),
    ("convert/copy", re.compile(r"convert|copy|transpose|bitcast|reshape")),
    ("matmul", re.compile(r"dot|conv|einsum")),
    ("fusion (other)", re.compile(r"fusion")),
]


def categorize(name):
    low = name.lower()
    for cat, pat in CATEGORIES:
        if pat.search(low):
            return cat
    return "other"


def attribute(logdir, scan_k, n_dispatch, wall_ms, top=40):
    """Parse the newest trace under ``logdir`` and print the attribution.

    Events are kept when their occurrence count matches either the total
    step count (per-step ops) or the dispatch count (per-scan ops) —
    this drops host python/runtime lanes and parent spans, exactly the
    round-2/3 methodology (PERF.md misc-tail decomposition).
    """
    traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz",
                              recursive=True))
    with gzip.open(traces[-1]) as f:
        t = json.load(f)

    dur = collections.Counter()
    cnt = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            dur[name] += e["dur"]
            cnt[name] += 1
    steps = n_dispatch * scan_k
    per_step = {n: d / 1e3 / steps for n, d in dur.items()
                if cnt[n] in (steps, n_dispatch)}
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
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:top]:
        tag = "scan" if cnt[name] == n_dispatch else "step"
        print(f"  {ms:7.3f} ms [{tag}]  {name[:86]}")
    return per_step
