"""Whole-step perf probe on the real chip: compares step variants at the
bench envelope (PERF.md methodology — value-fetch timing over scan_k-fused
dispatches). Usage: python scripts/perf_probe.py [variant ...]
where variant ∈ {sorted, iid, sorted_bf16, iid_bf16}.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def probe(tg, batches, neg_sampler, compute_dtype, scan_k=8, groups=4,
          edge_layout="relation", label="", decoder="dismult",
          dst_bwd="scatter"):
    import jax

    from biomedkg_tpu.parallel.dp import stack_batches
    from biomedkg_tpu.training.kge_module import KGEModule

    module = KGEModule(
        encoder_name="rgcn", decoder_name=decoder, **bench.MODEL,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=bench.NEG_RATIO,
        node_init_method="random", compute_dtype=compute_dtype)
    module.neg_sampler = neg_sampler
    module.edge_layout = edge_layout
    if edge_layout == "dst":
        module.dst_bwd = dst_bwd
    module.configure_optimizers(num_training_steps=10_000)
    rng = jax.random.PRNGKey(0)
    state = module.init_state(rng)
    step_fn = module._get_train_steps_scan()
    assert len(batches) >= scan_k, (len(batches), scan_k)
    stacked = jax.device_put(stack_batches(batches[:scan_k]))
    edges = sum(int(np.sum(b.edge_mask)) for b in batches[:scan_k])

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
    tps = groups * edges * (1 + bench.NEG_RATIO) / dt
    print(f"{label:>6s} {decoder:>8s} {neg_sampler:>7s}/"
          f"{compute_dtype:<9s}/{edge_layout:<8s}/{dst_bwd:<7s}: "
          f"{ms:7.2f} ms/step  "
          f"{tps/1e6:7.2f} M triplets/s   loss={lv:.4f}", flush=True)


def main():
    variants = sys.argv[1:] or ["iid", "sorted", "iid_bf16", "sorted_bf16"]
    tg = bench.build_graph()
    loaders = {}

    def get_batches(layout, batch_size=bench.BATCH_SIZE, count=8):
        key = (layout, batch_size)
        if key not in loaders or len(loaders[key]) < count:
            from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader

            ld = SaintRandomWalkLoader(
                tg.graph, batch_size=batch_size,
                walk_length=bench.WALK_LENGTH, num_steps=10**9,
                block_size=bench.BLOCK_SIZE, seed=0, edge_layout=layout)
            it = iter(ld)
            loaders[key] = [next(it) for _ in range(count)]
            b = loaders[key][0]
            print(f"  [b{batch_size}/{layout}] envelope "
                  f"{b.node_mask.shape[0]} nodes / "
                  f"{b.edge_mask.shape[0]} edges", flush=True)
        return loaders[key]

    batches = get_batches("relation")
    print(f"envelope: {batches[0].node_mask.shape[0]} nodes / "
          f"{batches[0].edge_mask.shape[0]} edges padded; "
          f"real edges/batch ≈ {int(np.sum(batches[0].edge_mask))}",
          flush=True)
    for v in variants:
        sampler = ("sorted2" if v.startswith("sorted2")
                   else "sorted" if v.startswith("sorted") else "iid")
        dtype = "bfloat16" if "bf16" in v else "float32"
        layout = "dst" if "dst" in v else "relation"
        bs = bench.BATCH_SIZE
        scan_k = 8
        decoder = "dismult"
        for part in v.split("_"):
            if part.startswith("b") and part[1:].isdigit():
                bs = int(part[1:])
            if part.startswith("k") and part[1:].isdigit():
                scan_k = int(part[1:])
            if part in ("complex", "transe", "rotate"):
                decoder = part
        dst_bwd = "perm" if "perm" in v.split("_") else "scatter"
        probe(tg, get_batches(layout, bs, count=scan_k), sampler, dtype,
              edge_layout=layout, label=f"b{bs}", scan_k=scan_k,
              decoder=decoder, dst_bwd=dst_bwd)


if __name__ == "__main__":
    main()
