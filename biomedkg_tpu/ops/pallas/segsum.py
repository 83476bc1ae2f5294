"""Pallas TPU kernel: segment-sum of rows keyed by SORTED segment ids.

The KGE negative path scatter-adds (K·E, d) gradient rows into the batch's
(N, d) node-embedding gradient. XLA lowers that scatter to a ~200 GB/s
fusion — the single largest cost in the round-1 trace (PERF.md). When the
segment ids are sorted (the framework samples negative sources as sorted
uniforms — see training/kge_module.py), each contiguous chunk of rows
touches only a narrow window of output rows, so the reduction becomes a
dense MXU matmul against a tiny one-hot built in registers:

    out[lo:lo+W] += onehotᵀ(ids - lo) @ data_chunk        (W × B) @ (B × d)

The output block lives in VMEM for the whole grid (constant index map) and
is written back to HBM once. Rows whose id falls outside their chunk's
window are dropped by the kernel and summed by a (runtime-conditional,
normally skipped) XLA fallback — the op is exact for ANY sorted input.

This replaces the torch-scatter CUDA backward kernels behind PyG's
negative-sampling decode path (reference biomedkg/kge_module.py:86-129).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048      # rows reduced per grid step (MXU contraction dim)
WINDOW = 256      # output rows addressable per window
ALIGN = 128       # window base alignment
MAX_WINDOWS = 4   # disjoint windows per chunk (empty ones skip compute)
VMEM_OUT_BYTES = 8 * 1024 * 1024  # resident output-block budget


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(n_pad, lo_ref, ids_ref, data_ref, out_ref):
    # window count is carried by the grid's third dimension, not a param
    c = pl.program_id(1)
    w = pl.program_id(2)

    @pl.when((c == 0) & (w == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[c % 8, :]                             # (BLOCK,) lane-major
    # logical (disjoint) window w of this chunk; the STORE window clamps
    # to stay in-bounds near the top — ids beyond n_pad - WINDOW still
    # land correctly because id - base < WINDOW holds for all id < n_pad.
    logical = lo_ref[c] * ALIGN + w * WINDOW
    base = pl.multiple_of(jnp.minimum(logical, n_pad - WINDOW), ALIGN)
    in_win = (ids >= logical) & (ids < logical + WINDOW)

    @pl.when(jnp.any(in_win))                           # skip empty windows
    def _():
        # one-hot (WINDOW, BLOCK): lane-major ids broadcast along sublanes
        # against the window iota — no relayout; ids outside the logical
        # window (incl. padding id < 0) are masked off.
        rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, BLOCK), 0) + base
        oh = ((rows == ids[None, :]) & in_win[None, :]).astype(
            data_ref.dtype)
        acc = jax.lax.dot_general(                      # oh @ data
            oh, data_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(base, WINDOW), :] += acc


def _segsum_pallas(data, ids, lo_blocks, num_out_padded, num_win,
                   d_shard=None):
    num_chunks = data.shape[0] // BLOCK
    d = data.shape[1]
    d_shard = d_shard or d
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # w is the minor grid dim: consecutive steps share the chunk's data
        # block, so pallas re-uses the buffer without a second DMA. The
        # major j dim shards the FEATURE axis so the VMEM-resident output
        # block stays within budget for large node counts.
        grid=(d // d_shard, num_chunks, num_win),
        in_specs=[
            # ids stream in (8, BLOCK) tiles (8 chunks per DMA, row c%8
            # read in-kernel): keeps them lane-major with zero relayout —
            # a (BLOCK, 1) column layout would lane-pad 128× (a 262 MB
            # copy, caught in the round-2 trace), (1, BLOCK) blocks
            # violate the (8, 128) tiling rule, and full-VMEM residency
            # OOMs at millions of rows.
            pl.BlockSpec((8, BLOCK), lambda j, c, w, lo: (c // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, d_shard), lambda j, c, w, lo: (c, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_out_padded, d_shard),
                               lambda j, c, w, lo: (0, j),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, num_out_padded)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_out_padded, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * data.shape[0] * WINDOW * d,
            bytes_accessed=data.size * data.dtype.itemsize
            + num_out_padded * d * 4,
            transcendentals=0,
        ),
    )
    ids2d = ids.reshape(num_chunks, BLOCK)
    if num_chunks % 8:
        ids2d = jnp.pad(ids2d, ((0, 8 - num_chunks % 8), (0, 0)),
                        constant_values=-1)
    return call(lo_blocks, ids2d, data)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum(data: jax.Array, ids: jax.Array,
                       num_segments: int,
                       max_windows: int = MAX_WINDOWS,
                       out_budget: int = 0) -> jax.Array:
    """``out[n] = Σ_{i: ids[i] == n} data[i]`` for (near-)sorted ``ids``.

    Args:
      data: (M, d) rows; f32 or bf16 (accumulation is f32 either way).
      ids: (M,) int32 in [0, num_segments); rows to ignore carry id -1.
        Exactness holds for any input; *performance* requires ids sorted
        ascending (modulo -1 padding) so chunk windows stay narrow.
      num_segments: static output row count.
      max_windows: windows per chunk. Even empty windows cost a grid step
        (~µs each), so callers with guaranteed-dense sorted ids (the
        negative sampler: expected span ≈ N·B/M ≪ WINDOW) pass 1 and let
        the runtime-conditional fallback cover the astronomically-rare
        overflow; irregular densities (graph aggregation) keep 4.

    ``out_budget``: optional per-call VMEM resident-output budget
    override (bytes); callers with wide key spaces (the (N·R)-row
    aggregate-then-transform conv) trade VMEM headroom for avoiding
    d-sharded multi-pass reads.

    Returns (num_segments, d) f32.
    """
    return _segsum_impl(data, ids, num_segments, max_windows, out_budget)


def _segsum_xla(data, ids, num_segments):
    """Plain segment_sum path (CPU test meshes / non-TPU backends)."""
    ids = ids.astype(jnp.int32)
    safe = jnp.where(ids >= 0, ids, num_segments)
    return jax.ops.segment_sum(
        data.astype(jnp.float32), safe,
        num_segments=num_segments + 1)[:num_segments]


def _segsum_impl(data, ids, num_segments, max_windows=MAX_WINDOWS,
                 out_budget=0):
    if jax.default_backend() not in ("tpu", "axon") \
            and not _FORCE_KERNEL:
        return _segsum_xla(data, ids, num_segments)
    return _segsum_kernel_path(data, ids, num_segments, max_windows,
                               out_budget)


_FORCE_KERNEL = False  # tests flip this under force_tpu_interpret_mode


def _segsum_kernel_path(data, ids, num_segments, max_windows=MAX_WINDOWS,
                        out_budget=0):
    budget = out_budget or VMEM_OUT_BYTES
    m, d = data.shape
    ids = ids.astype(jnp.int32)
    m_pad = _round_up(max(m, BLOCK), BLOCK)
    n_pad = _round_up(max(num_segments, WINDOW), ALIGN)
    if m_pad != m:
        data = jnp.pad(data, ((0, m_pad - m), (0, 0)))
        ids = jnp.pad(ids, (0, m_pad - m), constant_values=-1)

    # per-chunk window base, in ALIGN units: the chunk's FIRST element
    # (sorted ids ⇒ the chunk minimum). A strided slice, deliberately:
    # segment-min / small-int gathers lower to multi-ms scalar-path
    # fusions on this backend (PERF.md trace). Each chunk gets NUM_WIN
    # disjoint windows above its base; empty ones are skipped in-kernel,
    # so irregular id densities (graph aggregation by destination) cost
    # only occupied windows.
    valid = ids >= 0
    first = jnp.maximum(ids[::BLOCK], 0)
    lo_blocks = first // ALIGN
    num_win = min(max_windows, -(-n_pad // WINDOW))

    # the output block lives in VMEM for a whole feature-shard pass: shard
    # the feature axis until it fits, or cede to the XLA scatter for node
    # counts beyond what lane-width shards can cover.
    # Mosaic lane-pads the trailing dim to 128 in VMEM: a narrow output
    # (e.g. d=8 degree counts) still occupies n_pad×128 lanes — budget on
    # the PADDED width or large-N narrow calls stack-OOM at compile
    # (measured: 27.29M requested for a (51712, 8) f32 output)
    def _padded_bytes(ds):
        return n_pad * max(ds, 128) * 4

    # largest feature shard that fits the budget: any divisor of d that
    # is a multiple of 128 qualifies (Mosaic requires lane-aligned
    # trailing block dims unless the block spans the whole axis) — a
    # halving-only search missed e.g. 768 → 256 (768 = 3×256)
    d_shard = d
    if _padded_bytes(d_shard) > budget:
        cands = [s for s in range(128, d, 128)
                 if d % s == 0 and _padded_bytes(s) <= budget]
        if not cands:
            return _segsum_xla(data, ids, num_segments)  # cede, not crash
        d_shard = max(cands)

    out = _segsum_pallas(data, ids, lo_blocks, n_pad, num_win,
                         d_shard)[:num_segments]

    # exactness fallback: rows above their chunk's window span (rare —
    # requires an id jump > NUM_WIN·WINDOW within one sorted chunk) are
    # reduced by a plain segment_sum — inside a cond so the common case
    # pays one scalar test only. lo broadcasts chunk→rows (NOT a gather —
    # see above).
    lo_rows = jnp.broadcast_to(
        lo_blocks[:, None] * ALIGN, (m_pad // BLOCK, BLOCK)).reshape(-1)
    in_window = ((ids >= lo_rows)
                 & (ids - lo_rows < num_win * WINDOW)) | ~valid
    num_out = jnp.sum(~in_window)

    def _fallback(_):
        leftover = jnp.where(in_window[:, None], 0.0,
                             data.astype(jnp.float32))
        safe_ids = jnp.where(valid, ids, num_segments)
        return out + jax.ops.segment_sum(
            leftover, safe_ids, num_segments=num_segments + 1)[:num_segments]

    return jax.lax.cond(num_out > 0, _fallback, lambda _: out, None)


def _segsum_fwd(data, ids, num_segments, max_windows, out_budget):
    # zero-size dtype token: residuals must be JAX types
    return _segsum_impl(data, ids, num_segments, max_windows,
                        out_budget), (ids, jnp.zeros((0,), data.dtype))


def _segsum_bwd(num_segments, max_windows, out_budget, res, g):
    ids, dtype_token = res
    safe = jnp.clip(ids, 0, num_segments - 1)
    d_data = jnp.take(g, safe, axis=0, mode="clip")
    d_data = jnp.where((ids >= 0)[:, None], d_data, 0.0)
    return d_data.astype(dtype_token.dtype), None


sorted_segment_sum.defvjp(_segsum_fwd, _segsum_bwd)
