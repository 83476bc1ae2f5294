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
    row-sharded over ``axis``, everything else replicated. NOTE: the
    sampler's probe 8-aligns budgets, so meshes up to 8 devices divide
    them evenly; larger axes may get GSPMD's implicit padding on the
    last shard — pass explicit budgets rounded to the axis size to keep
    shards balanced on 16+ device axes."""
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

    SAME loss object as training/typed_train.typed_saint_train's step
    (make_typed_batch_loss — one builder, the two paths cannot drift;
    ``encoder.drop_out`` is honored); the only difference is placement:
    GSPMD turns the per-signature gathers into all-gathers of the source
    type's shard and the segment-sums into sharded reductions.
    """
    from ..training.typed_train import make_typed_batch_loss

    rep = NamedSharding(mesh, P())
    batch_loss = make_typed_batch_loss(encoder, decoder, neg_ratio)

    def step(params, opt, rng, batch, flat_real, n_real):
        loss, grads = jax.value_and_grad(batch_loss)(
            params, rng, batch, flat_real, n_real)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep,
                      typed_batch_shardings(template_batch, mesh, axis),
                      rep, rep),
        out_shardings=(rep, rep, rep))
