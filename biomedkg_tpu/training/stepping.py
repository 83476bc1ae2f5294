"""Shared jitted-step scaffolding for training modules.

Every module defines ``_forward_loss(params, batch, rng, training) ->
(loss, aux)``; this mixin supplies:

  * single train/eval steps (jit, donated state)
  * ``train_steps``: K steps fused into ONE device dispatch via lax.scan
    over stacked batches — on a TPU behind an RPC tunnel (or any small-batch
    regime) per-step dispatch latency dominates; scanning K steps amortizes
    it to 1/K. The loop body is traced once, so compile cost is unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class JittedStepsMixin:
    tx: Any
    _jit_cache: Dict[str, Any]
    feature_table: Any = None

    def _forward_loss(self, params, batch, rng, training):
        raise NotImplementedError

    def set_feature_table(self, x) -> None:
        """Keep the full node-feature table resident in device HBM; batches
        then carry node ids only and features are gathered on device
        (pairs with the data modules' ``device_features = True``)."""
        self.feature_table = jax.device_put(jnp.asarray(x))
        self._jit_cache.clear()  # steps close over the table

    @staticmethod
    def _widen(batch):
        """Widen compact wire dtypes (int16 indices / int8 relations) to the
        int32 the kernels index with — a free on-device cast that lets the
        host ship ~2.5× fewer bytes per batch (sampling/batch.py)."""
        return batch._replace(
            edge_index=batch.edge_index.astype(jnp.int32),
            edge_type=batch.edge_type.astype(jnp.int32),
            block_rel=batch.block_rel.astype(jnp.int32),
            node_ids=batch.node_ids.astype(jnp.int32),
            src_edges=batch.src_edges.astype(jnp.int32),
            src_pos=batch.src_pos.astype(jnp.int32))

    def _batch_features(self, batch):
        if batch.x.size == 0:  # static shape → python-level branch
            assert self.feature_table is not None, \
                "batch has no features; call set_feature_table first"
            from ..ops.segment import take_rows

            return take_rows(self.feature_table, batch.node_ids)
        return batch.x

    def init_state(self, rng) -> TrainState:
        params = self.init(rng)
        assert self.tx is not None, "call configure_optimizers first"
        return TrainState(params, self.tx.init(params),
                          jnp.zeros((), jnp.int32))

    def _grad_update(self, state: TrainState, batch, rng):
        def loss_fn(p):
            return self._forward_loss(p, batch, rng, training=True)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def _get_train_step(self):
        if "train" not in self._jit_cache:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_step(state, batch, rng):
                return self._grad_update(state, batch, rng)

            self._jit_cache["train"] = train_step
        return self._jit_cache["train"]

    def _get_train_steps_scan(self):
        if "train_scan" not in self._jit_cache:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def train_steps(state, batches, rng):
                k = jax.tree_util.tree_leaves(batches)[0].shape[0]
                rngs = jax.random.split(rng, k)

                def body(carry, xs):
                    batch, r = xs
                    new_state, loss = self._grad_update(carry, batch, r)
                    return new_state, loss

                state, losses = jax.lax.scan(body, state, (batches, rngs))
                return state, losses[-1]

            self._jit_cache["train_scan"] = train_steps
        return self._jit_cache["train_scan"]

    def _get_fullbatch_scan(self):
        """K grad updates over ONE device-resident batch in a single
        dispatch (full-batch training mode, loader_type='full'): the whole
        multi-epoch loop is one XLA program, so per-step dispatch latency
        — the dominant cost for small graphs, and ~35ms over a tunneled
        TPU — is paid once."""
        if "fullbatch_scan" not in self._jit_cache:
            @functools.partial(jax.jit, donate_argnums=(0,),
                               static_argnums=(3,))
            def train_many(state, batch, rng, num_steps):
                def body(carry, i):
                    new_state, loss = self._grad_update(
                        carry, batch, jax.random.fold_in(rng, i))
                    return new_state, loss

                state, losses = jax.lax.scan(
                    body, state, jnp.arange(num_steps))
                return state, losses[-1]

            self._jit_cache["fullbatch_scan"] = train_many
        return self._jit_cache["fullbatch_scan"]

    def train_fullbatch(self, state, batch, rng, num_steps: int):
        """num_steps fused full-batch updates; returns (state, last_loss)."""
        return self._get_fullbatch_scan()(state, batch, rng, num_steps)

    def _maybe_reduce_eval(self, aux):
        """Modules may define ``_reduce_eval_aux`` to shrink per-batch eval
        output to a psum-reducible metric state ON DEVICE (histograms +
        counts instead of the full prediction arrays) — the multi-host-safe
        path, and ~1000× less D2H traffic over a tunneled chip."""
        reducer = getattr(self, "_reduce_eval_aux", None)
        if reducer is not None and \
                getattr(self, "eval_impl", "exact") == "histogram":
            return reducer(aux)
        return aux

    def _get_eval_step(self):
        if "eval" not in self._jit_cache:
            @jax.jit
            def eval_step(params, batch, rng):
                _, aux = self._forward_loss(params, batch, rng,
                                            training=False)
                return self._maybe_reduce_eval(aux)

            self._jit_cache["eval"] = eval_step
        return self._jit_cache["eval"]

    def _get_eval_steps_scan(self):
        if "eval_scan" not in self._jit_cache:
            @jax.jit
            def eval_steps(params, batches, rng):
                k = jax.tree_util.tree_leaves(batches)[0].shape[0]
                rngs = jax.random.split(rng, k)

                def body(_, xs):
                    batch, r = xs
                    _, aux = self._forward_loss(params, batch, r,
                                                training=False)
                    return None, self._maybe_reduce_eval(aux)

                _, auxes = jax.lax.scan(body, None, (batches, rngs))
                return auxes  # stacked along a leading K axis

            self._jit_cache["eval_scan"] = eval_steps
        return self._jit_cache["eval_scan"]

    def train_step(self, state, batch, rng):
        state, loss = self._get_train_step()(state, batch, rng)
        # loss stays a device array — fetching it here would force a sync
        # every step (costly over a tunneled device); callers convert
        # lazily when they actually log.
        return state, {"train_loss": loss}

    def train_steps(self, state, stacked_batches, rng):
        """K fused steps; returns (state, logs) with the last step's loss."""
        state, loss = self._get_train_steps_scan()(state, stacked_batches,
                                                   rng)
        return state, {"train_loss": loss}

    def eval_step(self, params, batch, rng):
        return self._get_eval_step()(params, batch, rng)

    def eval_steps(self, params, stacked_batches, rng):
        """K fused eval batches per dispatch; returns a list of aux dicts
        (unstacked along the leading axis)."""
        auxes = self._get_eval_steps_scan()(params, stacked_batches, rng)
        k = jax.tree_util.tree_leaves(auxes)[0].shape[0]
        return [jax.tree_util.tree_map(lambda a: a[i], auxes)
                for i in range(k)]
