"""Sharded execution of the typed-table layout (models/typed.py,
sampling/typed_batch.py).

The per-type tables ARE the natural sharding unit the typed layout was
designed around: a type's (B_t, d) block row-shards over the mesh
without padding other types to a common width or interleaving rows.
This module annotates exactly that — per-type tables split over the
mesh's first axis, edge blocks/supervision replicated, parameters
replicated — and lets GSPMD place the collectives (the per-signature
``take``/``segment_sum`` pair becomes gather + reduce over the table
axis, riding ICI).

Replaces nothing in the reference (it has no multi-device hetero path
at all — Lightning DDP replicates the merged homogeneous graph,
data_module.py:71-145); this is the TPU-native scaling story for the
hetero-native mode. Wired into ``__graft_entry__.dryrun_multichip`` and
parity-tested against the single-device step (tests/test_typed.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def typed_batch_shardings(batch, mesh: Mesh, axis: str = "dp"):
    """NamedSharding pytree for a TypedBatch: per-type node tables
    row-sharded over ``axis`` (budgets are 8-aligned by the sampler's
    probe, so any power-of-two mesh divides them), everything else
    replicated."""
    rows = NamedSharding(mesh, P(axis))
    rows2d = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    return type(batch)(
        x={t: rows2d for t in batch.x},
        nodes={t: rows for t in batch.nodes},
        num_nodes={t: rep for t in batch.num_nodes},
        counts={t: rows2d for t in batch.counts},
        sigs={k: rep for k in batch.sigs},
        pos=rep,
    )


def make_typed_spmd_step(encoder, decoder, tx, mesh: Mesh,
                         template_batch, neg_ratio: int = 4,
                         axis: str = "dp"):
    """Jitted typed-table training step with row-sharded tables
    (compiled ONCE against ``template_batch``'s static envelope — every
    sampler batch shares it).

    Same math as training/typed_train.typed_saint_train's step (masked
    BCE over the pos+neg concat on the concatenated tables); the only
    difference is placement: GSPMD turns the per-signature gathers into
    all-gathers of the source type's shard and the segment-sums into
    sharded reductions.
    """
    from ..models.typed import concat_tables, typed_encode_batch

    rep = NamedSharding(mesh, P())

    def step(params, opt, rng, batch, flat_real, n_real):
        def loss_fn(p):
            tables = typed_encode_batch(p["encoder"], batch)
            z = concat_tables(tables, list(batch.x.keys()))
            src, dst, rel = batch.pos[0], batch.pos[1], batch.pos[2]
            w = batch.pos[3].astype(jnp.float32)
            pos = decoder.score(p["decoder"], z, src, dst, rel)
            r_s, r_d = jax.random.split(rng)
            shape = (neg_ratio,) + rel.shape
            js = jax.random.randint(r_s, shape, 0, n_real)
            jd = jax.random.randint(r_d, shape, 0, n_real)
            neg = decoder.score_neg(p["decoder"], z, flat_real[js],
                                    flat_real[jd], rel)
            wsum = jnp.maximum(w.sum(), 1.0) * (1 + neg_ratio)
            bce = (jnp.sum(-jax.nn.log_sigmoid(pos) * w)
                   + jnp.sum(-jax.nn.log_sigmoid(-neg) * w[None, :])) \
                / wsum
            reg = sum(jnp.mean(v ** 2) for v in
                      jax.tree_util.tree_leaves(p["decoder"]))
            return bce + 1e-2 * (jnp.mean(z ** 2) + reg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep,
                      typed_batch_shardings(template_batch, mesh, axis),
                      rep, rep),
        out_shardings=(rep, rep, rep))
