"""Per-relation message transform with automatic backend dispatch.

``relation_matmul(msg, weights, edge_type)`` computes
``out[e] = msg[e] @ weights[edge_type[e]]`` — the core of every relational
GNN layer (reference RGCNConv/RGATConv backends, encoder.py:6-121).

Backends:
  * ``pallas`` — relation-sorted blocked grouped-GEMM on the MXU
    (see ops/pallas/relmm.py); requires ``block_rel`` metadata produced by
    the samplers and a TPU backend.
  * ``scan``   — masked per-relation dense matmuls via lax.scan; runs
    anywhere (CPU test meshes, interpret mode) and is exact.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .pallas.relmm import relation_matmul_sorted


def _relmm_scan(msg: jax.Array, weights: jax.Array,
                edge_type: jax.Array) -> jax.Array:
    """Fallback: accumulate masked dense matmuls over the relation axis."""
    def body(acc, r_and_w):
        r, w = r_and_w
        contrib = jnp.dot(msg, w, preferred_element_type=jnp.float32)
        acc = acc + jnp.where((edge_type == r)[:, None], contrib, 0.0)
        return acc, None

    num_rel = weights.shape[0]
    init = jnp.zeros((msg.shape[0], weights.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(
        body, init, (jnp.arange(num_rel, dtype=edge_type.dtype), weights)
    )
    return out.astype(msg.dtype)


def relation_matmul(
    msg: jax.Array,
    weights: jax.Array,
    edge_type: jax.Array,
    block_rel: Optional[jax.Array] = None,
    block_size: Optional[int] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatch to the best available backend.

    ``block_rel`` is the per-block relation id for relation-sorted padded
    batches (None → the edges are not relation-block aligned and the scan
    path is used). ``block_size`` is DERIVED from the batch's own
    metadata (``E_pad // len(block_rel)``) unless given explicitly — the
    loader decides the relation-block granularity (``data.block_size``),
    and a fixed kernel-side default silently disagrees with any
    non-default loader setting (the backward segment_sum then scatters
    ``E/256`` per-block gradients with ``E/64`` indices).
    """
    if impl == "auto":
        # ("tpu", "axon") like every other kernel gate in the repo —
        # tpu-only silently demoted the axon plugin backend to the
        # R-masked-matmul scan (R× the FLOPs)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        impl = "pallas" if (block_rel is not None and on_tpu) else "scan"
    if impl == "pallas":
        if block_rel is None:
            raise ValueError("pallas relation_matmul requires block_rel metadata")
        if block_size is None:
            if msg.shape[0] % block_rel.shape[0]:
                raise ValueError(
                    f"E_pad ({msg.shape[0]}) is not a multiple of the "
                    f"block count ({block_rel.shape[0]}) — block_rel does "
                    "not describe this batch's edge layout")
            block_size = msg.shape[0] // block_rel.shape[0]
        elif block_size * block_rel.shape[0] != msg.shape[0]:
            raise ValueError(
                f"explicit block_size {block_size} disagrees with the "
                f"batch layout: {block_rel.shape[0]} blocks × "
                f"{block_size} ≠ E_pad {msg.shape[0]}")
        return relation_matmul_sorted(msg, weights, block_rel, block_size)
    return _relmm_scan(msg, weights, edge_type)
