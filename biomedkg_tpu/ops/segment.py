"""Segment (gather/scatter) ops for message passing on static-shape batches.

These replace the reference's torch-scatter / torch-sparse CUDA kernels that
back PyG's GCNConv / RGCNConv / RGATConv message passing
(/root/reference/biomedkg/model/encoder.py:50-59,112-121,153-162).

All shapes are static: ``E`` is the padded edge budget, ``N`` the padded node
budget; padding edges carry ``mask == 0`` and contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def take_rows(x, index) -> jax.Array:
    """Row gather with in-bounds promise (batch construction guarantees it:
    padding edges target the dummy node, sampled indices are moduli)."""
    return jnp.asarray(x).at[jnp.asarray(index)].get(
        mode="promise_in_bounds")


def scatter_add(values: jax.Array, index: jax.Array, num_segments: int) -> jax.Array:
    """Sum ``values`` rows into ``num_segments`` buckets keyed by ``index``."""
    shape = (num_segments,) + values.shape[1:]
    return jnp.zeros(shape, values.dtype).at[index].add(
        values, mode="promise_in_bounds")


def scatter_max(values: jax.Array, index: jax.Array, num_segments: int) -> jax.Array:
    """Max-reduce ``values`` rows into buckets keyed by ``index``."""
    return jax.ops.segment_max(values, index, num_segments=num_segments)


def per_dst_relation_counts(
    dst: jax.Array,
    edge_type: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    num_relations: int,
) -> jax.Array:
    """Count real edges per (dst node, relation) pair → (N, R) float array.

    PyG's RGCNConv aggregates with a per-relation mean
    (encoder.py:22-24 uses the default ``aggr='mean'``), i.e. messages of
    relation r into node i are divided by |N_r(i)|. The padded-batch analog
    masks padding edges out of the counts.
    """
    flat = dst * num_relations + edge_type
    counts = jnp.zeros(num_nodes * num_relations, jnp.float32).at[flat].add(
        edge_mask.astype(jnp.float32), mode="promise_in_bounds")
    return counts.reshape(num_nodes, num_relations)


def segment_softmax(
    scores: jax.Array,
    index: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Numerically-stable softmax of ``scores`` grouped by ``index``.

    Used by the RGAT attention (reference RGATConv backend). ``scores`` may be
    (E,) or (E, H); masked entries get probability 0.
    """
    squeeze = scores.ndim == 1
    if squeeze:
        scores = scores[:, None]
    neg = jnp.finfo(scores.dtype).min
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, neg)
    seg_max = jax.ops.segment_max(scores, index, num_segments=num_segments)
    seg_max = jnp.maximum(seg_max, neg)  # empty segments stay finite
    shifted = scores - seg_max[index]
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(mask[:, None], expd, 0.0)
    denom = jax.ops.segment_sum(expd, index, num_segments=num_segments)
    out = expd / jnp.maximum(denom[index], 1e-16)
    return out[:, 0] if squeeze else out
