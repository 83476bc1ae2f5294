"""Parallel layer on the virtual 8-device CPU mesh: DP shard_map, GSPMD
dp×tp, graph-partitioned full-graph forward, and the graft dryrun."""

import jax
import numpy as np
import pytest

from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.models.encoders import RGCN
from biomedkg_tpu.parallel.graph_shard import (partition_graph,
                                               sharded_rgcn_encode)
from biomedkg_tpu.parallel.mesh import make_mesh
from biomedkg_tpu.sampling.loaders import FullGraphLoader

DIM = 16


@pytest.fixture(scope="module")
def graph():
    df = synthetic_triplets(num_gene=100, num_drug=40, num_disease=30,
                            num_edges=1200, seed=5)
    return TripletGraph(df, encoder=RandomEncode(embed_dim=DIM))


def test_mesh_devices():
    assert len(jax.devices()) == 8  # conftest virtual mesh
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_graph_sharded_forward_matches_single_device(graph):
    tg = graph
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=tg.num_edge_types,
               drop_out=False)
    params = enc.init(jax.random.PRNGKey(0))

    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    ref = np.asarray(enc.apply(params, batch.x, batch.edge_index,
                               batch.edge_type, batch.edge_mask,
                               batch.block_rel, training=False))

    mesh = make_mesh(dp=8, tp=1)
    sharded = partition_graph(batch, num_shards=8,
                              num_relations=tg.num_edge_types,
                              block_size=64)
    out = np.asarray(sharded_rgcn_encode(enc, params, sharded, mesh))
    real = batch.node_mask
    np.testing.assert_allclose(out[real], ref[real], rtol=2e-4, atol=2e-4)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graph_sharded_training_matches_single_device(graph):
    """Round-2 VERDICT #6: the sharded-table regime TRAINS. One step of
    make_sharded_train_step (psum'd loss + grads through the collectives,
    adam update) must match a single-device computation of the identical
    loss on the same edges + FIXED negatives."""
    import jax.numpy as jnp
    import optax

    from biomedkg_tpu.models.decoders import DistMult
    from biomedkg_tpu.models.factory import GAE
    from biomedkg_tpu.parallel.graph_shard import make_sharded_train_step
    from biomedkg_tpu.training.kge_module import TrainState

    tg = graph
    R = tg.num_edge_types
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=R, drop_out=False)
    dec = DistMult(R, DIM)
    model = GAE(enc, dec)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    P_SH = 8
    sharded = partition_graph(batch, num_shards=P_SH, num_relations=R,
                              block_size=64)
    rng = np.random.default_rng(0)
    K = 3
    e_p = sharded.edge_type.shape[1]
    n_pad = batch.x.shape[0]
    fixed_neg = rng.integers(0, tg.graph.num_nodes,
                             (P_SH, 2, K, e_p)).astype(np.int32)

    # the step donates its input state; snapshot params for the reference
    params = jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)),
                                    params)
    mesh = make_mesh(dp=P_SH, tp=1)
    step = make_sharded_train_step(enc, dec, tx, mesh, R, neg_ratio=K)
    new_state, loss = step(state, sharded, jax.random.PRNGKey(1),
                           fixed_neg=fixed_neg)
    loss = float(loss)

    # single-device reference: same per-shard edges/negatives flattened
    def ref_loss(params):
        z = enc.apply(params["encoder"], batch.x, batch.edge_index,
                      batch.edge_type, batch.edge_mask, batch.block_rel,
                      training=False)
        num = den = 0.0
        for p in range(P_SH):
            ei = sharded.edge_index[p]
            et = sharded.edge_type[p].astype(np.int32)
            em = sharded.edge_mask[p].astype(np.float32)
            pos = dec.score(params["decoder"], z, ei[0], ei[1], et)
            neg = dec.score_neg(params["decoder"], z,
                                jnp.asarray(fixed_neg[p, 0]),
                                jnp.asarray(fixed_neg[p, 1]),
                                jnp.asarray(et)).reshape(-1)
            pred = jnp.concatenate([pos, neg])
            gt = jnp.concatenate([jnp.ones_like(pos),
                                  jnp.zeros_like(neg)])
            w = jnp.concatenate([em, jnp.tile(em, K)])
            per = -(gt * jax.nn.log_sigmoid(pred)
                    + (1 - gt) * jax.nn.log_sigmoid(-pred))
            num = num + jnp.sum(per * w)
            den = den + jnp.sum(w)
        bce = num / den
        nm = batch.node_mask.astype(np.float32)
        reg_z = jnp.sum((z ** 2) * nm[:, None]) / (np.sum(nm) * DIM)
        reg_rel = jnp.mean(params["decoder"]["rel_emb"] ** 2)
        return bce + 1e-2 * (reg_z + reg_rel)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    assert abs(loss - float(ref_l)) < 1e-5, (loss, float(ref_l))

    # adam-updated params must match a reference update with ref grads
    upd, _ = tx.update(ref_g, tx.init(params), params)
    ref_params = optax.apply_updates(params, upd)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(new_state.params),
            jax.tree_util.tree_leaves_with_path(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=str(ka))


def test_graph_sharded_training_sampled_negatives_runs(graph):
    """Production mode (on-device per-shard sampling) executes and the
    loss decreases over a few steps."""
    import jax.numpy as jnp
    import optax

    from biomedkg_tpu.models.decoders import DistMult
    from biomedkg_tpu.models.factory import GAE
    from biomedkg_tpu.parallel.graph_shard import make_sharded_train_step
    from biomedkg_tpu.training.kge_module import TrainState

    tg = graph
    R = tg.num_edge_types
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=R, drop_out=False)
    dec = DistMult(R, DIM)
    model = GAE(enc, dec)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(5e-3)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    sharded = partition_graph(batch, num_shards=8, num_relations=R,
                              block_size=64)
    mesh = make_mesh(dp=8, tp=1)
    step = make_sharded_train_step(enc, dec, tx, mesh, R, neg_ratio=4)
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(12):
        key, r = jax.random.split(key)
        state, loss = step(state, sharded, r)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_graph_sharded_halo_forward_matches_all_gather(graph):
    """SURVEY §5 halo exchange: shipping only the per-pair halo rows via
    all_to_all must reproduce the full-table all_gather encode exactly
    (same partition, same params), while moving strictly fewer rows."""
    from biomedkg_tpu.parallel.graph_shard import build_halo_plan

    tg = graph
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=tg.num_edge_types,
               drop_out=False)
    params = enc.init(jax.random.PRNGKey(0))
    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    mesh = make_mesh(dp=8, tp=1)
    sharded = partition_graph(batch, num_shards=8,
                              num_relations=tg.num_edge_types,
                              block_size=64)
    shard_n = sharded.x.shape[1]
    plan = build_halo_plan(sharded, shard_n)

    # the halo exchange must move fewer rows than the all_gather
    # (P·H vs N_pad rows received per device per layer)
    assert sharded.x.shape[0] * plan.halo <= batch.x.shape[0], plan.halo

    ref = np.asarray(sharded_rgcn_encode(enc, params, sharded, mesh))
    out = np.asarray(sharded_rgcn_encode(enc, params, sharded, mesh,
                                         halo_plan=plan))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_graph_sharded_halo_training_matches_all_gather(graph):
    """One halo-exchange training step (grads through the all_to_all and
    its reverse-all_to_all transpose) lands the same loss and updated
    params as the proven all_gather step on identical edges/negatives."""
    import jax.numpy as jnp
    import optax

    from biomedkg_tpu.models.decoders import DistMult
    from biomedkg_tpu.models.factory import GAE
    from biomedkg_tpu.parallel.graph_shard import (build_halo_plan,
                                                   make_sharded_train_step)
    from biomedkg_tpu.training.kge_module import TrainState

    tg = graph
    R = tg.num_edge_types
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=R, drop_out=False)
    dec = DistMult(R, DIM)
    model = GAE(enc, dec)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)

    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    P_SH = 8
    sharded = partition_graph(batch, num_shards=P_SH, num_relations=R,
                              block_size=64)
    plan = build_halo_plan(sharded, sharded.x.shape[1])
    rng = np.random.default_rng(3)
    K = 3
    e_p = sharded.edge_type.shape[1]
    fixed_neg = rng.integers(0, tg.graph.num_nodes,
                             (P_SH, 2, K, e_p)).astype(np.int32)
    mesh = make_mesh(dp=P_SH, tp=1)

    results = []
    for halo_plan in (None, plan):
        params_i = jax.tree_util.tree_map(
            lambda a: jnp.array(np.asarray(a)), params)
        state = TrainState(params_i, tx.init(params_i),
                           jnp.zeros((), jnp.int32))
        step = make_sharded_train_step(enc, dec, tx, mesh, R, neg_ratio=K,
                                       halo_plan=halo_plan)
        new_state, loss = step(state, sharded, jax.random.PRNGKey(1),
                               fixed_neg=fixed_neg)
        results.append((float(loss), new_state.params))

    (l_ag, p_ag), (l_halo, p_halo) = results
    assert abs(l_ag - l_halo) < 1e-6, (l_ag, l_halo)
    # adam's m/sqrt(v) normalization amplifies f32 summation-order noise
    # (all_to_all-transpose scatter order vs all_gather transpose) where
    # grads are near zero — compare at the update scale (lr=1e-2)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ag),
            jax.tree_util.tree_leaves_with_path(p_halo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5, err_msg=str(ka))


def test_halo_plan_invariants(graph):
    """Host-side check independent of the mesh: simulating the exchange
    in numpy, every edge's remapped src resolves to exactly the row the
    global id owns."""
    from biomedkg_tpu.parallel.graph_shard import build_halo_plan

    tg = graph
    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    sharded = partition_graph(batch, num_shards=8,
                              num_relations=tg.num_edge_types,
                              block_size=64)
    shard_n = sharded.x.shape[1]
    plan = build_halo_plan(sharded, shard_n)
    p_sh = sharded.x.shape[0]
    x = np.arange(p_sh * shard_n, dtype=np.float32).reshape(p_sh, shard_n)

    for q in range(p_sh):
        # recv[p] = x rows p ships to q (the all_to_all result for q)
        recv = np.stack([x[p][plan.send_idx[p, q]] for p in range(p_sh)])
        x_aug = np.concatenate([x[q], recv.reshape(-1)])
        got = x_aug[plan.src_remap[q]]
        want = x.reshape(-1)[sharded.edge_index[q][0]]
        np.testing.assert_array_equal(got, want)


def test_balanced_partition_matches_and_balances(graph):
    """balance=True (degree-aware LPT relabeling) must (a) reproduce the
    single-device forward after un-permuting via node_order, (b) strictly
    reduce the per-device real-edge imbalance vs the contiguous
    partition, and (c) still interoperate with the halo plan."""
    from biomedkg_tpu.parallel.graph_shard import build_halo_plan

    tg = graph
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=tg.num_edge_types,
               drop_out=False)
    params = enc.init(jax.random.PRNGKey(0))
    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    ref = np.asarray(enc.apply(params, batch.x, batch.edge_index,
                               batch.edge_type, batch.edge_mask,
                               batch.block_rel, training=False))
    mesh = make_mesh(dp=8, tp=1)

    plain = partition_graph(batch, num_shards=8,
                            num_relations=tg.num_edge_types, block_size=64)
    bal = partition_graph(batch, num_shards=8,
                          num_relations=tg.num_edge_types, block_size=64,
                          balance=True)

    def spread(sh):
        e = [int(m.sum()) for m in sh.edge_mask]
        return max(e) - min(e)

    assert spread(bal) < spread(plain), (spread(bal), spread(plain))
    # every original node appears exactly once in the relabeling
    assert np.array_equal(np.sort(bal.node_order),
                          np.arange(batch.x.shape[0]))
    # pad row stays the global last slot
    assert bal.node_order[-1] == batch.x.shape[0] - 1

    z = np.asarray(sharded_rgcn_encode(enc, params, bal, mesh))
    z_orig = np.empty_like(z)
    z_orig[bal.node_order] = z
    real = batch.node_mask.astype(bool)
    np.testing.assert_allclose(z_orig[real], ref[real],
                               rtol=1e-4, atol=1e-4)

    # halo plan built on the balanced partition still reproduces it
    plan = build_halo_plan(bal, bal.x.shape[1])
    z_h = np.asarray(sharded_rgcn_encode(enc, params, bal, mesh,
                                         halo_plan=plan))
    np.testing.assert_allclose(z_h, z, rtol=1e-5, atol=1e-5)


def test_trainer_devices_engages_data_parallel(graph):
    """Lightning `devices=N` drop-in (reference train_kge.py passes
    cfg.devices to Trainer): N>1 runs the shard_map DP step — one batch
    per device per optimizer step, pmean'd grads — and the step/batch
    bookkeeping follows DDP semantics (len(loader)//N optimizer steps,
    tail dropped)."""
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
    from biomedkg_tpu.training.kge_module import KGEModule
    from biomedkg_tpu.training.trainer import Trainer

    tg = graph
    loader = SaintRandomWalkLoader(tg.graph, batch_size=8, walk_length=4,
                                   num_steps=18, block_size=32, seed=0)
    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    trainer = Trainer(max_epochs=1, devices=8, enable_checkpointing=False,
                      enable_progress_bar=False)
    trainer.fit(module, loader)
    # 18 batches / 8 devices -> 2 optimizer steps, 2-batch tail dropped
    assert trainer.global_step == 2, trainer.global_step
    loss = trainer.history[-1]["train_loss_epoch"]
    assert np.isfinite(loss) and 0.0 < loss < 2.0

    # params actually moved (replicated out-spec, host-fetchable)
    w = np.asarray(
        trainer.state.params["model"]["decoder"]["rel_emb"])
    assert np.isfinite(w).all()


def test_trainer_devices_data_parallel_gcl(graph):
    """devices=N covers the GCL modules too (shared _forward_loss
    contract, training/stepping.py)."""
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
    from biomedkg_tpu.training.gcl_module import DGIModule
    from biomedkg_tpu.training.trainer import Trainer

    tg = graph
    loader = SaintRandomWalkLoader(tg.graph, batch_size=8, walk_length=4,
                                   num_steps=8, block_size=32, seed=1)
    module = DGIModule(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
                       num_hidden_layers=1, scheduler_type="cosine",
                       learning_rate=1e-3, warm_up_ratio=0.1,
                       fuse_method="none")
    trainer = Trainer(max_epochs=1, devices=8, enable_checkpointing=False,
                      enable_progress_bar=False)
    trainer.fit(module, loader)
    assert trainer.global_step == 1
    assert np.isfinite(trainer.history[-1]["train_loss_epoch"])


def test_trainer_devices_dp_scan_fusion(graph):
    """devices=N composes with steps_per_execution=k: k optimizer steps
    per dispatch, each over N per-device batches (the pod production
    mode — pmean DP + lax.scan dispatch fusion)."""
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
    from biomedkg_tpu.training.kge_module import KGEModule
    from biomedkg_tpu.training.trainer import Trainer

    tg = graph
    loader = SaintRandomWalkLoader(tg.graph, batch_size=8, walk_length=4,
                                   num_steps=36, block_size=32, seed=2)
    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    trainer = Trainer(max_epochs=1, devices=8, steps_per_execution=2,
                      enable_checkpointing=False,
                      enable_progress_bar=False)
    trainer.fit(module, loader)
    # 36 batches, 16 per dispatch (8 dp x 2 scan) -> 2 dispatches =
    # 4 optimizer steps; 4-batch tail dropped
    assert trainer.global_step == 4, trainer.global_step
    assert np.isfinite(trainer.history[-1]["train_loss_epoch"])


def test_trainer_devices_string_forms():
    """Lightning accepts ``devices`` as int-string ("2"), "auto", and the
    comma-id string the reference's default config ships ("0,1",
    configs/kge.yaml `devices: 0,1` — OmegaConf loads it as a str).
    Round-5 regression: the comma form crashed int() in _resolve_dp."""
    from biomedkg_tpu.training.trainer import Trainer

    def resolve(d):
        tr = Trainer(max_epochs=1, devices=d)
        n, devs = tr._resolve_dp()
        return n, [dv.id for dv in devs]

    assert resolve("0,1") == (2, [0, 1])
    assert resolve("0,")[0] == 1              # trailing comma tolerated
    assert resolve("2") == (2, [0, 1])        # int-string = count
    assert resolve("auto")[0] == 8            # conftest virtual mesh
    # out-of-range ids in the comma form warn and are dropped
    with pytest.warns(UserWarning, match="don't exist"):
        n, ids = resolve("0,99")
    assert (n, ids) == (1, [0])
