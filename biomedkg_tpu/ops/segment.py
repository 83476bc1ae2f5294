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


import functools


def _fast_gather(x, index):
    return jnp.take(x, index, axis=0, mode="clip")


def _fast_scatter(values, index, num_segments):
    return jax.ops.segment_sum(values, index, num_segments=num_segments)


@jax.custom_vjp
def take_rows(x, index) -> jax.Array:
    """Row gather with an explicitly-paired backward.

    TPU microbenchmarks (PERF.md) show XLA's mode choices swing gather /
    scatter cost by 100-1000×: clip-mode gathers and segment_sum scatters
    are the fast lowerings, while e.g. the autodiff transpose of a
    promise-in-bounds gather lowers to a catastrophically slow scatter.
    This custom VJP pins the fast pair: clip gather forward, segment_sum
    backward. Indices are in-bounds by batch construction (padding edges
    target the dummy node; sampled indices are moduli).
    """
    return _fast_gather(jnp.asarray(x), jnp.asarray(index))


def _take_rows_fwd(x, index):
    return take_rows(x, index), (index, x.shape[0])


def _take_rows_bwd(res, g):
    index, n = res
    # accumulate in f32: bf16 segment-sums swamp after ~256 same-magnitude
    # terms (hub nodes), and the sorted/perm/matbwd variants all accumulate
    # f32 — grad-equivalence across dst_bwd variants requires it here too
    return _fast_scatter(g.astype(jnp.float32), index,
                         n).astype(g.dtype), None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def take_rows_matbwd(x, index) -> jax.Array:
    """Row gather from a SMALL table with a one-hot-matmul backward.

    For tables with few rows (relation embeddings: R ≈ 8-64 on PrimeKG),
    the autodiff scatter-add of the gather transpose lowers to a fusion
    that drags the whole upstream elementwise computation down to
    ~200 GB/s (PERF.md trace: the rel-grad scatter fusion was 5.75 ms of a
    31 ms step). Expressing the transpose as ``onehot(index, R)ᵀ @ g``
    keeps the upstream fusion a clean (full-bandwidth) elementwise kernel
    and turns the reduction itself into a tiny MXU matmul.

    Numerics: the matmul accumulates in f32 (same as segment_sum on f32
    gradients); results match scatter_add to float rounding.
    """
    return _fast_gather(jnp.asarray(x), jnp.asarray(index))


def _take_rows_matbwd_fwd(x, index):
    return take_rows_matbwd(x, index), (index, x.shape[0])


def _take_rows_matbwd_bwd(res, g):
    index, n = res
    onehot = (index[:, None] == jnp.arange(n, dtype=index.dtype)[None, :])
    dx = jax.lax.dot_general(
        onehot.astype(g.dtype), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    return dx, None


take_rows_matbwd.defvjp(_take_rows_matbwd_fwd, _take_rows_matbwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_rows_sorted(x, index, max_windows: int = 1) -> jax.Array:
    """Row gather whose backward uses the Pallas sorted-segment-sum kernel.

    For SORTED ``index`` (the KGE negative-source sampler emits sorted
    uniforms; destination-sorted batch edges) the gather transpose touches
    only a narrow window of output rows per chunk, so the scatter-add
    becomes a dense MXU matmul (ops/pallas/segsum.py) instead of XLA's
    ~200 GB/s scatter fusion. Exact for any index order; fast when sorted.

    ``max_windows``: 1 for dense sampled ids (negatives), more for
    irregular densities (graph destinations) — see sorted_segment_sum.
    """
    return _fast_gather(jnp.asarray(x), jnp.asarray(index))


def _take_rows_sorted_fwd(x, index, max_windows):
    return take_rows_sorted(x, index, max_windows), (index, x.shape[0])


def _take_rows_sorted_bwd(max_windows, res, g):
    from .pallas.segsum import sorted_segment_sum

    index, n = res
    return sorted_segment_sum(g, index, n,
                              max_windows).astype(g.dtype), None


take_rows_sorted.defvjp(_take_rows_sorted_fwd, _take_rows_sorted_bwd)



@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add(values: jax.Array, index: jax.Array,
                num_segments: int) -> jax.Array:
    """Sum ``values`` rows into ``num_segments`` buckets keyed by ``index``,
    with the backward pinned to the fast clip-mode gather (see take_rows)."""
    return _fast_scatter(values, index, num_segments)


def _scatter_add_fwd(values, index, num_segments):
    return _fast_scatter(values, index, num_segments), index


def _scatter_add_bwd(num_segments, index, g):
    return _fast_gather(g, index), None


scatter_add.defvjp(_scatter_add_fwd, _scatter_add_bwd)


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
    flat = dst.astype(jnp.int32) * num_relations \
        + edge_type.astype(jnp.int32)
    counts = jax.ops.segment_sum(edge_mask.astype(jnp.float32), flat,
                                 num_segments=num_nodes * num_relations)
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
    # take_rows, not []: plain advanced indexing lowers to the slow
    # scalar-path gather and its autodiff transpose to the ~200 GB/s
    # scatter (PERF.md) — this is RGAT's per-layer gradient path
    shifted = scores - take_rows(seg_max, index)
    expd = jnp.exp(shifted)
    if mask is not None:
        expd = jnp.where(mask[:, None], expd, 0.0)
    denom = jax.ops.segment_sum(expd, index, num_segments=num_segments)
    out = expd / jnp.maximum(take_rows(denom, index), 1e-16)
    return out[:, 0] if squeeze else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def take_rows_via_perm(x, index, perm_pos, sorted_keys,
                       max_windows: int = 3, out_budget: int = 0):
    """Row gather whose backward routes through a SHIPPED sorted
    permutation (round-3: the last src-keyed scatters).

    Forward: plain clip-mode gather ``x[index]`` — unchanged, full HBM
    speed. Backward: instead of scattering the (E, d) gradient at the
    UNSORTED ``index`` keys (~100 GB/s XLA scatter RMW — the 4×0.53 ms
    h_all and 0.48 ms pos-path costs of the round-2 trace), the gradient
    rows are PERMUTED into an order where the keys are sorted
    (``perm_pos`` — e.g. the (src, rel)-lexsorted edge copy the dst
    layout ships, GraphBatch.src_pos) with one HBM-speed gather, then
    reduced by the Pallas sorted-segment kernel at ``sorted_keys``.

    Caller contract: ``sorted_keys[i] == flat_key(index[perm_pos[i]])``
    for rows whose gradient is nonzero (pads may point anywhere with
    zero gradient), and sorted ascending.
    """
    return _fast_gather(jnp.asarray(x), jnp.asarray(index))


def _take_rows_via_perm_fwd(x, index, perm_pos, sorted_keys, max_windows,
                            out_budget):
    return (_fast_gather(jnp.asarray(x), jnp.asarray(index)),
            (perm_pos, sorted_keys, x.shape[0]))


def _take_rows_via_perm_bwd(max_windows, out_budget, res, g):
    from .pallas.segsum import sorted_segment_sum

    perm_pos, sorted_keys, n = res
    g2 = _fast_gather(g, perm_pos)
    dx = sorted_segment_sum(g2, sorted_keys, n, max_windows,
                            out_budget).astype(g.dtype)
    return dx, None, None, None


take_rows_via_perm.defvjp(_take_rows_via_perm_fwd, _take_rows_via_perm_bwd)
