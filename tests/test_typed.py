"""Hetero-native typed-table mode (round-2 VERDICT #9): per-type tables
+ per-signature edge blocks must reproduce the homogeneous RGCN exactly,
and a KGE model must TRAIN through the typed path."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.models.decoders import DistMult
from biomedkg_tpu.models.encoders import RGCN
from biomedkg_tpu.models.typed import concat_tables, to_typed, typed_encode

D = 24


@pytest.fixture(scope="module")
def graph():
    df = synthetic_triplets(num_gene=80, num_drug=40, num_disease=30,
                            num_edges=1500, seed=9)
    rng = np.random.default_rng(0)
    return TripletGraph(
        df, encoder=lambda ns: rng.standard_normal(
            (len(ns), D)).astype(np.float32))


def test_typed_encode_matches_homogeneous(graph):
    tg = graph
    g = tg.graph
    enc = RGCN(in_dim=D, hidden_dim=32, out_dim=16, num_hidden_layers=1,
               num_relations=g.num_relations, drop_out=False)
    params = enc.init(jax.random.PRNGKey(0))

    ref = enc.apply(params, jnp.asarray(g.x),
                    jnp.asarray(g.edge_index.astype(np.int32)),
                    jnp.asarray(g.edge_type.astype(np.int32)),
                    jnp.ones(g.num_edges, bool),
                    jnp.zeros(1, jnp.int32), training=False)

    typed = to_typed(tg)
    # block structure: every signature is single-relation / single-type
    assert len(typed.sigs) >= g.num_relations
    assert typed.num_nodes == g.num_nodes
    tables = typed_encode(params, typed, training=False)
    z = concat_tables(tables, typed.type_names)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_typed_tables_train(graph):
    """A KGE config (RGCN+DistMult) trains through the typed path:
    full-batch BCE against iid corruption, loss decreases to a sane
    discriminative level."""
    tg = graph
    g = tg.graph
    typed = to_typed(tg)
    enc = RGCN(in_dim=D, hidden_dim=48, out_dim=24, num_hidden_layers=1,
               num_relations=g.num_relations, drop_out=False)
    dec = DistMult(g.num_relations, 24)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": enc.init(r1), "decoder": dec.init(r2)}
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    src = jnp.asarray(g.edge_index[0].astype(np.int32))
    dst = jnp.asarray(g.edge_index[1].astype(np.int32))
    rel = jnp.asarray(g.edge_type.astype(np.int32))
    n = g.num_nodes

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            tables = typed_encode(p["encoder"], typed)
            z = concat_tables(tables, typed.type_names)
            pos = dec.score(p["decoder"], z, src, dst, rel)
            r_s, r_d = jax.random.split(rng)
            ns = jax.random.randint(r_s, (4,) + rel.shape, 0, n)
            nd = jax.random.randint(r_d, (4,) + rel.shape, 0, n)
            neg = dec.score_neg(p["decoder"], z, ns, nd, rel).reshape(-1)
            pred = jnp.concatenate([pos, neg])
            gt = jnp.concatenate([jnp.ones_like(pos),
                                  jnp.zeros_like(neg)])
            return jnp.mean(
                -(gt * jax.nn.log_sigmoid(pred)
                  + (1 - gt) * jax.nn.log_sigmoid(-pred)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(120):
        key, r = jax.random.split(key)
        params, opt, loss = step(params, opt, r)
        losses.append(float(loss))
    assert losses[-1] < 0.45, losses[-1]
    assert losses[-1] < losses[0] - 0.2


def test_typed_saint_batch_matches_homogeneous(graph):
    """Typed SAINT sub-batch encode (per-type tables + per-signature
    masked blocks, sampling/typed_batch.py) == homogeneous RGCN on the
    same induced subgraph."""
    from biomedkg_tpu.models.typed import typed_encode_batch
    from biomedkg_tpu.sampling.typed_batch import TypedSaintSampler

    tg = graph
    g = tg.graph
    sampler = TypedSaintSampler(g, tg.node_type_of, tg.node_type_names,
                                batch_size=16, walk_length=4, num_steps=3,
                                seed=3)
    nodes, ei, et = sampler._sample_raw(sampler.rng)
    batch = sampler.split(nodes, ei, et)
    assert sampler.dropped_edges == 0

    enc = RGCN(in_dim=D, hidden_dim=32, out_dim=16, num_hidden_layers=1,
               num_relations=g.num_relations, drop_out=False)
    params = enc.init(jax.random.PRNGKey(0))

    # homogeneous reference on the induced subgraph (batch-local ids)
    ref = enc.apply(params, jnp.asarray(g.x[nodes]),
                    jnp.asarray(ei.astype(np.int32)),
                    jnp.asarray(et.astype(np.int32)),
                    jnp.ones(et.shape[0], bool),
                    jnp.zeros(1, jnp.int32), training=False)
    ref = np.asarray(ref)

    tables = typed_encode_batch(params, batch)
    t_of = tg.node_type_of[nodes]
    local = np.zeros(len(nodes), np.int32)
    for ti in range(len(tg.node_type_names)):
        sel = t_of == ti
        local[sel] = np.arange(int(sel.sum()))
    for i, (ti, li) in enumerate(zip(t_of, local)):
        t = tg.node_type_names[ti]
        np.testing.assert_allclose(np.asarray(tables[t])[li], ref[i],
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"node {i} type {t}")

    # supervision edges point at the right batch-global rows
    from biomedkg_tpu.models.typed import concat_tables
    z = np.asarray(concat_tables(tables, list(batch.x.keys())))
    base = {t: sampler.type_base[t] for t in sampler.type_names}
    for j in range(et.shape[0]):
        sbg = base[tg.node_type_names[t_of[ei[0, j]]]] + local[ei[0, j]]
        np.testing.assert_allclose(z[sbg], ref[ei[0, j]], rtol=2e-4,
                                   atol=2e-4)
        assert batch.pos[2, j] == et[j]
    assert int(batch.pos[3].sum()) == et.shape[0]


def test_typed_saint_envelope_static_and_trains(graph):
    """Every typed SAINT batch shares one pytree structure (single
    compiled step), negatives draw only real batch rows, and a short
    run learns."""
    import optax

    from biomedkg_tpu.models.typed import concat_tables, typed_encode_batch
    from biomedkg_tpu.sampling.typed_batch import TypedSaintSampler

    tg = graph
    g = tg.graph
    sampler = TypedSaintSampler(g, tg.node_type_of, tg.node_type_names,
                                batch_size=24, walk_length=6,
                                num_steps=40, seed=0)
    shapes = None
    for batch in sampler:
        s = jax.tree_util.tree_map(lambda a: np.shape(a), batch)
        if shapes is None:
            shapes = s
        assert s == shapes
        flat, n_real = sampler.flat_real(batch)
        assert flat.shape == (sampler.total_budget,)
        # every flat entry is a REAL batch-global row
        for t in sampler.type_names:
            lo = sampler.type_base[t]
            hi = lo + int(batch.num_nodes[t])
            inside = (flat >= lo) & (flat < lo + sampler.node_budget[t])
            assert (flat[inside] < hi).all()
        break

    enc = RGCN(in_dim=D, hidden_dim=48, out_dim=24, num_hidden_layers=1,
               num_relations=g.num_relations, drop_out=False)
    dec = DistMult(g.num_relations, 24)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": enc.init(r1), "decoder": dec.init(r2)}
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng, batch, flat_real, n_real):
        def loss_fn(p):
            tables = typed_encode_batch(p["encoder"], batch)
            z = concat_tables(tables, list(batch.x.keys()))
            src, dst, rel = batch.pos[0], batch.pos[1], batch.pos[2]
            w = batch.pos[3].astype(jnp.float32)
            pos = dec.score(p["decoder"], z, src, dst, rel)
            r_s, r_d = jax.random.split(rng)
            js = jax.random.randint(r_s, (4,) + rel.shape, 0, n_real)
            jd = jax.random.randint(r_d, (4,) + rel.shape, 0, n_real)
            neg = dec.score_neg(p["decoder"], z, flat_real[js],
                                flat_real[jd], rel)
            wsum = jnp.maximum(w.sum(), 1.0) * 5
            return (jnp.sum(-jax.nn.log_sigmoid(pos) * w)
                    + jnp.sum(-jax.nn.log_sigmoid(-neg) * w[None, :])
                    ) / wsum

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(3):
        sampler.set_epoch(epoch)
        for batch in sampler:
            flat, n_real = sampler.flat_real(batch)
            key, r = jax.random.split(key)
            params, opt, loss = step(params, opt, r, batch,
                                     jnp.asarray(flat), n_real)
            losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, (losses[0], losses[-1])
    assert losses[-1] < 0.55, losses[-1]


def test_typed_sharded_step_matches_single_device(graph):
    """Row-sharded typed-table training step (parallel/typed_shard.py,
    8-device mesh) == the same step on one device: loss and updated
    params."""
    import optax

    from biomedkg_tpu.parallel.mesh import make_mesh
    from biomedkg_tpu.parallel.typed_shard import make_typed_spmd_step
    from biomedkg_tpu.sampling.typed_batch import TypedSaintSampler

    tg = graph
    g = tg.graph
    sampler = TypedSaintSampler(g, tg.node_type_of, tg.node_type_names,
                                batch_size=24, walk_length=6,
                                num_steps=2, seed=1)
    batch = sampler.sample()
    flat, n_real = sampler.flat_real(batch)

    enc = RGCN(in_dim=D, hidden_dim=32, out_dim=16, num_hidden_layers=1,
               num_relations=g.num_relations, drop_out=False)
    dec = DistMult(g.num_relations, 16)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"encoder": enc.init(r1), "decoder": dec.init(r2)}
    tx = optax.adam(1e-3)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
    step8 = make_typed_spmd_step(enc, dec, tx, mesh, batch, neg_ratio=4)
    p8, _, l8 = step8(params, tx.init(params), key, batch,
                      jnp.asarray(flat), n_real)

    mesh1 = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    step1 = make_typed_spmd_step(enc, dec, tx, mesh1, batch, neg_ratio=4)
    p1, _, l1 = step1(params, tx.init(params), key, batch,
                      jnp.asarray(flat), n_real)

    assert abs(float(l8) - float(l1)) < 1e-5, (float(l8), float(l1))
    for a, b in zip(jax.tree_util.tree_leaves(p8),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
