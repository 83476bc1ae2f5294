"""Tiny functional neural-net layer library.

Models in this framework are pure functions over parameter pytrees: every
module exposes ``init(rng) -> params`` and ``apply(params, ...) -> out``.
This keeps everything jit/vmap/shard_map-friendly and makes donation and
sharding annotations trivial — no framework state objects cross the XLA
boundary.

Initializer semantics follow the torch defaults the reference relies on
(torch.nn.Linear's kaiming-uniform, xavier_uniform_/xavier_normal_,
PyG's glorot) so training dynamics match.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Params = dict


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def kaiming_uniform(rng, shape, fan_in: Optional[int] = None, dtype=jnp.float32):
    """torch.nn.Linear default weight init (kaiming_uniform_, a=sqrt(5))."""
    fan_in = fan_in if fan_in is not None else shape[-2] if len(shape) > 1 else shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def xavier_uniform(rng, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ over the last two dims (a.k.a. glorot)."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def xavier_normal(rng, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ over the last two dims."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype)


def uniform_fan(rng, shape, fan: int, dtype=jnp.float32):
    """PyG's ``uniform(size, tensor)`` init: U(-1/sqrt(fan), 1/sqrt(fan))."""
    bound = 1.0 / math.sqrt(fan)
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

def linear_init(rng, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    """Parameters for a dense layer, stored (in_dim, out_dim) for x @ W."""
    w_rng, b_rng = jax.random.split(rng)
    params = {"w": kaiming_uniform(w_rng, (in_dim, out_dim), fan_in=in_dim,
                                   dtype=dtype)}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        params["b"] = jax.random.uniform(b_rng, (out_dim,), dtype, -bound, bound)
    return params


def linear_apply(params: Params, x: jax.Array) -> jax.Array:
    out = jnp.dot(x, params["w"], preferred_element_type=x.dtype)
    if "b" in params:
        out = out + params["b"]
    return out


def embedding_init(rng, num: int, dim: int, dtype=jnp.float32) -> Params:
    """torch.nn.Embedding default init: N(0, 1)."""
    return {"table": jax.random.normal(rng, (num, dim), dtype)}


def embedding_apply(params: Params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["table"], ids, axis=0)


def dropout(rng, x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    """Inverted dropout; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def mask_feature(rng, x: jax.Array, p: float) -> jax.Array:
    """Zero individual (node, feature) entries with prob ``p`` — PyG
    ``mask_feature(mode='all')``, the mode the reference GRACE/GGD
    augmentations use (model/gcl.py:40-43,76-78). NOT a column mask
    (mode='col'): sharing one (F,) mask across all nodes removes every
    bit of node-level stochasticity from the contrastive views.
    """
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return x * keep.astype(x.dtype)


def sigmoid_binary_cross_entropy(logits: jax.Array, labels: jax.Array,
                                 weights: Optional[jax.Array] = None) -> jax.Array:
    """Mean BCE-with-logits, optionally masked (matches F.binary_cross_entropy_with_logits)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(labels * log_p + (1.0 - labels) * log_not_p)
    if weights is None:
        return jnp.mean(loss)
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(loss * weights) / denom
