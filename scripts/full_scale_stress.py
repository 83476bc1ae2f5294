"""Full-scale UNFILTERED PrimeKG++ stress leg (VERDICT round-3 item #4).

The reference trains only the gene/drug/disease-filtered subgraph
(reference configs/data/primekg.yaml:5, ~52k nodes / 1.3M edges / R=8);
real PrimeKG++ is ~127k nodes / ~4M edges / 10 node types / 30 relation
signatures. This probe runs the rebuild PAST the reference's configured
workload on a schema-faithful synthetic (data/synthetic.py
PRIMEKG_FULL_*) and documents:

  1. ``fits`` — where the negscore fused-kernel VMEM gate cliffs over
     (batch node envelope × R), i.e. when training falls back to the
     sorted-gather path, and the R=30 gate state at the production
     envelopes.
  2. ``train`` — KGE training steps on the full graph (R=30, 10 types):
     correctness everywhere, throughput when a TPU is attached
     (kernel path vs forced-fallback A/B).
  3. ``typed`` — the typed-table hetero path at 10 node types.
  4. ``rank`` — the filtered-ranking evaluator at the full node count.
  5. ``mem`` — array-size ledger + device memory stats (HBM headroom).

Usage: python scripts/full_scale_stress.py [legs] [--edges N] [--cpu]
  legs: comma list of fits,train,typed,rank,mem (default: all)
  --cpu: force the CPU platform (sitecustomize ignores JAX_PLATFORMS)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CACHE = "data/full_scale_graph.npz"
MODEL = dict(in_dim=768, hidden_dim=256, out_dim=256, num_hidden_layers=2)


def build_graph(num_edges, embed_dim):
    from biomedkg_tpu.sampling.csr import CSRGraph

    if os.path.exists(CACHE):
        z = np.load(CACHE, allow_pickle=True)
        if int(z["num_edges_requested"]) == num_edges \
                and z["x"].shape[1] == embed_dim:
            g = CSRGraph(num_nodes=int(z["num_nodes"]),
                         edge_index=z["edge_index"],
                         edge_type=z["edge_type"],
                         num_relations=int(z["num_relations"]), x=z["x"])
            return g, z["node_type_of"], list(z["type_names"])

    from biomedkg_tpu.data.node_encoders import RandomEncode
    from biomedkg_tpu.data.synthetic import synthetic_primekg_full
    from biomedkg_tpu.data.triplet import TripletGraph

    t0 = time.time()
    df = synthetic_primekg_full(num_edges=num_edges, seed=42)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=embed_dim))
    print(f"[build] {tg.graph.num_nodes} nodes, "
          f"{tg.graph.edge_index.shape[1]} edges, "
          f"R={tg.graph.num_relations}, "
          f"{len(tg.node_type_names)} node types "
          f"({time.time() - t0:.0f}s)", flush=True)
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez(CACHE, num_nodes=tg.graph.num_nodes,
             edge_index=tg.graph.edge_index, edge_type=tg.graph.edge_type,
             num_relations=tg.graph.num_relations, x=tg.graph.x,
             node_type_of=tg.node_type_of,
             type_names=np.array(tg.node_type_names, dtype=object),
             num_edges_requested=num_edges)
    return tg.graph, tg.node_type_of, list(tg.node_type_names)


def leg_fits(graph):
    """Map the negscore fits() cliff over (node envelope, R)."""
    from biomedkg_tpu.ops.pallas import negscore

    d = MODEL["out_dim"]
    print(f"\n=== fits() gate map (d={d}, BLOCK={negscore.BLOCK}, "
          f"budget={negscore.VMEM_BUDGET // 2**20} MiB) ===")
    rs = [8, 16, 30, 64, 128, 256]
    ns = [1536, 3072, 6144, 9216, 12288, 15360]
    print("nodes\\R " + " ".join(f"{r:>5}" for r in rs))
    cliff = {}
    for n in ns:
        row = [negscore.fits(n, d, r) for r in rs]
        print(f"{n:>7} " + " ".join("   ok" if v else " FALL"
                                    for v in row))
        for r, v in zip(rs, row):
            if not v and r not in cliff:
                cliff[r] = n
    # the exact node cliff at R=30 (full schema) and R=8 (filtered)
    for r in (8, 30):
        n = 128
        while negscore.fits(n, d, r):
            n += 128
        print(f"[fits] R={r}: kernel path up to {n - 128} batch nodes, "
              f"falls back at {n}")
    return cliff


def _make_module(graph, compute_dtype="bfloat16", neg_ratio=10):
    from biomedkg_tpu.training.kge_module import KGEModule

    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", **MODEL,
        num_relation=graph.num_relations, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=neg_ratio,
        node_init_method="random", compute_dtype=compute_dtype)
    module.edge_layout = "dst"
    return module


def leg_train(graph, steps, scan_k, batch_size=128, walk_length=10,
              fill=None):
    """KGE training at R=30 / full node count. Prints the batch envelope,
    which negative path the gate picks, and steps/s + triplets/s."""
    import jax

    from biomedkg_tpu.ops.pallas import negscore
    from biomedkg_tpu.parallel.dp import stack_batches
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader

    print(f"\n=== train leg (R={graph.num_relations}, "
          f"N={graph.num_nodes}, platform={jax.default_backend()}) ===")
    loader = SaintRandomWalkLoader(graph, batch_size=batch_size,
                                   walk_length=walk_length,
                                   num_steps=10 ** 9, block_size=256,
                                   seed=0, edge_layout="dst",
                                   fill_target=fill)
    it = iter(loader)
    batches = [next(it) for _ in range(scan_k)]
    occ = np.mean([b.edge_mask.mean() for b in batches])
    print(f"[train] fill_target={fill}: edge-slot occupancy "
          f"{occ:.1%}, dropped={loader.dropped_edges}")
    env_nodes = batches[0].x.shape[0] if batches[0].x is not None \
        else len(batches[0].node_mask)
    env_edges = len(batches[0].edge_type)
    kern = negscore.fits(env_nodes, MODEL["out_dim"], graph.num_relations)
    print(f"[train] batch envelope: {env_nodes} nodes, {env_edges} edge "
          f"slots; fused-neg kernel gate at R={graph.num_relations}: "
          f"{'KERNEL' if kern else 'FALLBACK (sorted-gather path)'}")

    module = _make_module(graph)
    module.configure_optimizers(num_training_steps=max(steps, 1) * scan_k)
    rng = jax.random.PRNGKey(0)
    state = module.init_state(rng)
    step_fn = module._get_train_steps_scan()
    stacked = jax.device_put(stack_batches(batches))
    edges_per_group = sum(int(np.sum(b.edge_mask)) for b in batches)

    rng, r = jax.random.split(rng)
    t0 = time.time()
    state, loss = step_fn(state, stacked, r)
    print(f"[train] compile+first group: {time.time() - t0:.1f}s "
          f"loss={float(loss):.4f}")
    t0 = time.time()
    for _ in range(steps):
        rng, r = jax.random.split(rng)
        state, loss = step_fn(state, stacked, r)
    lv = float(loss)
    dt = time.time() - t0
    tps = steps * edges_per_group * (1 + 10) / dt if steps else 0.0
    print(f"[train] {steps} groups x {scan_k} steps: "
          f"{dt / max(steps * scan_k, 1) * 1000:.2f} ms/step, "
          f"{tps / 1e6:.2f}M triplets/s, loss={lv:.4f}")
    assert np.isfinite(lv)
    return tps


def leg_typed(graph, node_type_of, type_names, steps=3):
    """Typed-table hetero step at 10 node types (single-device mesh on
    CPU; whatever mesh the platform offers elsewhere)."""
    import jax
    import optax

    from biomedkg_tpu.models.decoders import DistMult
    from biomedkg_tpu.models.encoders import RGCN
    from biomedkg_tpu.parallel.mesh import make_mesh
    from biomedkg_tpu.parallel.typed_shard import make_typed_spmd_step
    from biomedkg_tpu.sampling.typed_batch import TypedSaintSampler

    print(f"\n=== typed leg ({len(type_names)} node types) ===")
    sampler = TypedSaintSampler(graph, node_type_of, type_names,
                                batch_size=64, walk_length=6, num_steps=1,
                                seed=7)
    batch = sampler.sample()
    flat, n_real = sampler.flat_real(batch)
    sizes = {t: int(np.sum(node_type_of == i))
             for i, t in enumerate(type_names)}
    print(f"[typed] per-type node counts: {sizes}")

    enc = RGCN(in_dim=graph.x.shape[1], hidden_dim=64, out_dim=64,
               num_hidden_layers=1, num_relations=graph.num_relations,
               drop_out=False)
    dec = DistMult(graph.num_relations, 64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params = {"encoder": enc.init(k1), "decoder": dec.init(k2)}
    tx = optax.adam(1e-3)
    n_dev = len(jax.devices())
    mesh = make_mesh(dp=n_dev, tp=1)
    step = make_typed_spmd_step(enc, dec, tx, mesh, batch, neg_ratio=2)
    opt = tx.init(params)
    losses = []
    key = jax.random.PRNGKey(2)
    for _ in range(steps):
        key, r = jax.random.split(key)
        params, opt, loss = step(params, opt, r, batch,
                                 jax.numpy.asarray(flat), n_real)
        losses.append(float(loss))
    print(f"[typed] {steps} hetero steps, losses={losses}")
    assert all(np.isfinite(v) for v in losses)


def leg_rank(graph, num_test=2000):
    """Filtered ranking at the full node count (full z table in HBM)."""
    import jax

    from biomedkg_tpu.eval.ranking import filtered_ranking_metrics
    from biomedkg_tpu.models.decoders import DistMult

    print(f"\n=== rank leg (N={graph.num_nodes}, "
          f"{num_test} test triples) ===")
    rng = np.random.default_rng(0)
    d = MODEL["out_dim"]
    z = rng.standard_normal((graph.num_nodes, d)).astype(np.float32)
    dec = DistMult(graph.num_relations, d)
    dec_params = dec.init(jax.random.PRNGKey(0))
    e = graph.edge_index
    sel = rng.choice(e.shape[1], size=num_test, replace=False)
    test = np.stack([e[0][sel], graph.edge_type[sel], e[1][sel]],
                    axis=1).astype(np.int64)
    allt = np.stack([e[0], graph.edge_type, e[1]], axis=1).astype(np.int64)
    t0 = time.time()
    out = filtered_ranking_metrics(dec, dec_params, jax.numpy.asarray(z),
                                   test, allt)
    print(f"[rank] {time.time() - t0:.1f}s  mrr={out['mrr']:.4f} "
          f"hits@10={out['hits@10']:.4f} (random z — protocol "
          f"mechanics only)")


def leg_shard(graph, n_shards=8, dim=64):
    """Graph-sharded training at FULL scale on the virtual mesh:
    balanced partition + halo exchange at 127k nodes / 3.5M edges —
    the dryrun proves these on a 256-node toy; this leg proves the halo
    plan and LPT balance hold at the real shape (and reports the comm
    ledger at scale)."""
    import jax
    import optax

    from biomedkg_tpu.models.decoders import DistMult
    from biomedkg_tpu.models.encoders import RGCN
    from biomedkg_tpu.parallel.graph_shard import (build_halo_plan,
                                                   make_sharded_train_step,
                                                   partition_graph,
                                                   sharded_rgcn_encode)
    from biomedkg_tpu.parallel.mesh import make_mesh
    from biomedkg_tpu.sampling.loaders import FullGraphLoader
    from biomedkg_tpu.training.kge_module import TrainState

    n_dev = len(jax.devices())
    if n_dev < n_shards:
        print(f"[shard] need {n_shards} devices, have {n_dev} — set "
              f"XLA_FLAGS=--xla_force_host_platform_device_count=8; skip")
        return
    print(f"\n=== shard leg (N={graph.num_nodes}, "
          f"E={graph.edge_index.shape[1]}, P={n_shards}) ===")
    # narrow feature slice: the leg proves partition/collective behavior,
    # not matmul width
    import numpy as _np

    from biomedkg_tpu.sampling.csr import CSRGraph

    g64 = CSRGraph(num_nodes=graph.num_nodes, edge_index=graph.edge_index,
                   edge_type=graph.edge_type,
                   num_relations=graph.num_relations,
                   x=np.ascontiguousarray(graph.x[:, :dim]))
    t0 = time.time()
    batch = FullGraphLoader(g64, block_size=256).batch()
    print(f"[shard] full batch padded to {batch.x.shape[0]} nodes / "
          f"{len(batch.edge_type)} edge slots ({time.time() - t0:.0f}s)")
    t0 = time.time()
    plain = partition_graph(batch, num_shards=n_shards,
                            num_relations=graph.num_relations,
                            block_size=256)
    bal = partition_graph(batch, num_shards=n_shards,
                          num_relations=graph.num_relations,
                          block_size=256, balance=True)
    e_plain = [int(m.sum()) for m in plain.edge_mask]
    e_bal = [int(m.sum()) for m in bal.edge_mask]
    print(f"[shard] partition {time.time() - t0:.0f}s; real edges/device "
          f"contiguous {e_plain} (max/min "
          f"{max(e_plain) / max(1, min(e_plain)):.2f}) vs balanced "
          f"{e_bal} (max/min {max(e_bal) / max(1, min(e_bal)):.2f}); "
          f"padded envelope {plain.edge_type.shape[1]} -> "
          f"{bal.edge_type.shape[1]} slots/device")
    t0 = time.time()
    plan = build_halo_plan(bal, bal.x.shape[1])
    ag_rows = bal.x.shape[1] * (n_shards - 1)
    halo_rows = n_shards * plan.halo
    print(f"[shard] halo plan {time.time() - t0:.0f}s: {plan.halo} "
          f"rows/pair padded; per-device per-layer rows out: all_gather "
          f"{ag_rows} vs halo {halo_rows} "
          f"({halo_rows / ag_rows:.3f}x); real send rows/device "
          f"{[int(s) for s in plan.send_counts.sum(1)]}")

    mesh = make_mesh(dp=n_shards, tp=1)
    enc = RGCN(in_dim=dim, hidden_dim=dim, out_dim=dim,
               num_hidden_layers=1, num_relations=graph.num_relations,
               drop_out=False)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    enc_params = enc.init(k1)

    t0 = time.time()
    z = np.asarray(sharded_rgcn_encode(enc, enc_params, bal, mesh,
                                       halo_plan=plan))
    print(f"[shard] halo full-graph encode: {time.time() - t0:.0f}s "
          f"(compile+run), z{z.shape} finite={np.isfinite(z).all()}",
          flush=True)

    # TRAIN comparison: XLA:CPU collectives terminate a rendezvous when
    # device threads stagger >40 s, and this host runs 8 virtual devices
    # on ONE core — the backward at 127k nodes cannot make that budget
    # (the full-scale TRAIN belongs to real multichip hardware; the halo
    # plan + partition were just proven at full scale by the encode).
    # Run the step parity at a reduced R=30 scale that fits the budget.
    import jax as _jax

    if graph.num_nodes > 40_000 and _jax.default_backend() == "cpu":
        from biomedkg_tpu.data.node_encoders import RandomEncode
        from biomedkg_tpu.data.synthetic import (PRIMEKG_FULL_NODE_SIZES,
                                                 synthetic_primekg_full)
        from biomedkg_tpu.data.triplet import TripletGraph

        sizes = {t: max(64, n // 8)
                 for t, n in PRIMEKG_FULL_NODE_SIZES.items()}
        df = synthetic_primekg_full(num_edges=300_000, seed=7,
                                    node_sizes=sizes)
        tg = TripletGraph(df, encoder=RandomEncode(embed_dim=dim))
        tgraph = tg.graph
        print(f"[shard] TRAIN sub-leg reduced for the 1-core CPU mesh "
              f"emulation: {tgraph.num_nodes} nodes, "
              f"{tgraph.edge_index.shape[1]} edges, "
              f"R={tgraph.num_relations}", flush=True)
        tbatch = FullGraphLoader(tgraph, block_size=256).batch()
        tbal = partition_graph(tbatch, num_shards=n_shards,
                               num_relations=tgraph.num_relations,
                               block_size=256, balance=True)
        tplan = build_halo_plan(tbal, tbal.x.shape[1])
    else:
        tgraph, tbal, tplan = graph, bal, plan

    enc_t = RGCN(in_dim=dim, hidden_dim=dim, out_dim=dim,
                 num_hidden_layers=1, num_relations=tgraph.num_relations,
                 drop_out=False)
    dec_t = DistMult(tgraph.num_relations, dim)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params_init = jax.tree_util.tree_map(
        lambda a: _np.array(a),
        {"encoder": enc_t.init(k1), "decoder": dec_t.init(k2)})
    tx = optax.adam(1e-3)
    l_ag = None
    for tag, hp in (("all_gather", None), ("halo", tplan)):
        p0 = jax.tree_util.tree_map(jax.numpy.array, params_init)
        state = TrainState(p0, tx.init(p0),
                           jax.numpy.zeros((), jax.numpy.int32))
        step = make_sharded_train_step(enc_t, dec_t, tx, mesh,
                                       tgraph.num_relations, neg_ratio=2,
                                       halo_plan=hp)
        t0 = time.time()
        state, loss = step(state, tbal, jax.random.PRNGKey(1))
        l0 = float(loss)
        t1 = time.time()
        state, loss = step(state, tbal, jax.random.PRNGKey(2))
        print(f"[shard] {tag} TRAIN: compile+step {t1 - t0:.0f}s, "
              f"step2 {time.time() - t1:.1f}s, losses {l0:.4f} "
              f"{float(loss):.4f}", flush=True)
        if tag == "all_gather":
            l_ag = l0
        else:
            assert abs(l0 - l_ag) < 1e-3, (l0, l_ag)
    print("[shard] halo == all_gather first-step loss ok", flush=True)


def leg_mem(graph):
    import jax

    print("\n=== memory ledger ===")
    n, d_in = graph.x.shape
    d = MODEL["out_dim"]
    items = {
        "feature table (N, 768) f32": n * d_in * 4,
        "z table (N, 256) f32": n * d * 4,
        "edge_index int32 x2": graph.edge_index.size * 4,
        "rgcn w_rel stacks (R tiers)": sum(
            graph.num_relations * a * b * 4 for a, b in
            [(768, 256), (256, 256), (256, 256), (256, 256)]),
    }
    for k, v in items.items():
        print(f"  {k}: {v / 2**20:.1f} MiB")
    print(f"  TOTAL static: {sum(items.values()) / 2**30:.2f} GiB "
          f"(v5e HBM = 16 GiB)")
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        print(f"  device: in_use={s.get('bytes_in_use', 0) / 2**30:.2f} "
              f"GiB peak={s.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB")
    except Exception as exc:
        print(f"  device memory_stats unavailable: {exc}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("legs", nargs="?", default="fits,train,typed,rank,mem")
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--scan-k", type=int, default=8)
    ap.add_argument("--fill", type=float, default=None,
                    help="SAINT fill_target for the train leg (e.g. 0.92)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    graph, node_type_of, type_names = build_graph(args.edges,
                                                  args.embed_dim)
    legs = args.legs.split(",")
    results = {}
    if "fits" in legs:
        leg_fits(graph)
    if "train" in legs:
        results["triplets_per_sec"] = leg_train(graph, args.steps,
                                                args.scan_k,
                                                fill=args.fill)
    if "typed" in legs:
        leg_typed(graph, node_type_of, type_names)
    if "shard" in legs:
        leg_shard(graph)
    if "rank" in legs:
        leg_rank(graph)
    if "mem" in legs:
        leg_mem(graph)
    print("\nFULL_SCALE_STRESS_DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
