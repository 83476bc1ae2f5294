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
    tables = typed_encode(params, typed, enc.dims, training=False)
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
            tables = typed_encode(p["encoder"], typed, enc.dims)
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
