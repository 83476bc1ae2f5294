"""SPMD training steps over the device mesh.

Two composable strategies replace the reference's Lightning-DDP/NCCL row
(SURVEY §2.9):

  * ``make_dp_train_step`` — pure data parallelism via shard_map: each
    device trains on its own padded subgraph batch (the Pallas grouped-GEMM
    runs unbatched per device), gradients pmean over the ``dp`` axis (ICI
    allreduce), parameters replicated. This is the production path for
    SAINT-batch training.
  * ``make_spmd_train_step`` — dp × tp via jit + sharding annotations:
    parameters carry tensor-parallel shardings (sharding.py), batches stack
    over a leading dp axis, and XLA GSPMD inserts the activation collectives
    (annotate-and-propagate, per the scaling-book recipe).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling.batch import GraphBatch
from ..training.kge_module import TrainState

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def stack_batches(batches: List[GraphBatch]) -> GraphBatch:
    """Stack per-device batches along a new leading (dp) axis."""
    return GraphBatch(*[
        np.stack([np.asarray(getattr(b, f)) for b in batches])
        for f in GraphBatch._fields])


def make_dp_train_step(module, mesh: Mesh):
    """shard_map data-parallel step: one subgraph batch per dp device."""
    tx = module.tx
    assert tx is not None, "configure_optimizers first"

    def per_device(params, opt_state, step, batch, rng):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = rng[0]

        def loss_fn(p):
            return module._forward_loss(p, batch, rng, training=True)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step + 1, loss

    mapped = shard_map(
        per_device, mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp")),
        out_specs=(P(), P(), P(), P()))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batches: GraphBatch, rngs):
        params, opt_state, step, loss = mapped(
            state.params, state.opt_state, state.step, batches, rngs)
        return TrainState(params, opt_state, step), loss

    return step_fn


def make_dp_train_steps_scan(module, mesh: Mesh, k: int):
    """DP × fused-execution: ``k`` optimizer steps per dispatch, each
    consuming one batch per dp device (batch leaves shaped (k, dp, ...)).

    Composes the two latency levers: pmean'd data parallelism (the DDP
    analog) AND the lax.scan step fusion that cut the single-chip
    dispatch gap 1.5 → 0.29 ms/step (PERF.md k=32 trace) — on a pod the
    per-dispatch RTT would otherwise be paid k times per device group.
    """
    tx = module.tx
    assert tx is not None, "configure_optimizers first"

    def per_device(params, opt_state, step, batches, rngs):
        batches = jax.tree_util.tree_map(lambda x: x[:, 0], batches)
        rngs = rngs[:, 0]

        def body(carry, xs):
            p, opt = carry
            batch, rng = xs

            def loss_fn(q):
                return module._forward_loss(q, batch, rng, training=True)

            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            grads = jax.lax.pmean(grads, "dp")
            updates, opt = tx.update(grads, opt, p)
            p = optax.apply_updates(p, updates)
            return (p, opt), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, rngs))
        return (params, opt_state, step + k,
                jax.lax.pmean(losses[-1], "dp"))

    mapped = shard_map(
        per_device, mesh,
        in_specs=(P(), P(), P(), P(None, "dp"), P(None, "dp")),
        out_specs=(P(), P(), P(), P()))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, batches: GraphBatch, rngs):
        params, opt_state, step, loss = mapped(
            state.params, state.opt_state, state.step, batches, rngs)
        return TrainState(params, opt_state, step), loss

    return step_fn


def stack_batch_groups(groups: List[GraphBatch]) -> GraphBatch:
    """Stack k already-dp-stacked groups along a new leading (k) axis."""
    return GraphBatch(*[
        np.stack([np.asarray(getattr(g, f)) for g in groups])
        for f in GraphBatch._fields])


def make_spmd_train_step(module, mesh: Mesh, param_shardings):
    """jit + GSPMD step: tp-sharded params, dp-stacked batches."""
    tx = module.tx
    assert tx is not None, "configure_optimizers first"
    batch_sh = GraphBatch(*[NamedSharding(mesh, P("dp"))
                            for _ in GraphBatch._fields])
    rng_sh = NamedSharding(mesh, P("dp"))
    # optimizer-state shardings are inferred by jit

    def loss_fn(params, batches, rngs):
        def per(batch, rng):
            return module._forward_loss(params, batch, rng,
                                        training=True)[0]

        return jnp.mean(jax.vmap(per)(batches, rngs))

    @functools.partial(
        jax.jit,
        in_shardings=(None, batch_sh, rng_sh),
        donate_argnums=(0,))
    def step_fn(state: TrainState, batches: GraphBatch, rngs):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batches,
                                                  rngs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.lax.with_sharding_constraint(params, param_shardings)
        return TrainState(params, opt_state, state.step + 1), loss

    return step_fn
