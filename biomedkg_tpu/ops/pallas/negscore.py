"""Fused negative-scoring Pallas kernels (forward + backward) for ALL
four decoders.

The negative path scores K·E corrupted triples per step with ``ns``
SORTED (the stratified sampler, training/kge_module.py). The unfused XLA
lowering materializes h = z[ns], t = z[nd] and the combine as (K·E, d)
HBM arrays and reads them back — ~4 HBM round-trips of ~260 MB each at
the bench envelope. These kernels keep the whole z table (bf16)
VMEM-resident and rebuild h from a windowed one-hot against the sorted
ids on the MXU, so the only (K·E, d)-sized traffic is the unavoidable
t-side stream.

Two kernel families share the structure (gather-h windows, dz_src window
accumulation, one-hot d(rel_emb) matmul, streamed/dense dt):

  * BILINEAR modes ("distmult", "complex"): score = Σ_j G(h,t)_j ·
    rel_emb[rel]_j. Forward never materializes per-slot relation rows —
    scores for ALL R relations come from one (R, d) @ (d, B) projection
    and the slot's relation picks its column.
  * DISTANCE modes ("transe", "rotate"): not bilinear in r, so per-slot
    relation rows ARE built in-kernel (ohr @ rel_emb — one extra
    (R, B)ᵀ(B, d) matmul per chunk, the same structure the backward
    already used) and the score is the L1 translation distance
    (reference decoder.py:21-38; the L1 row normalization is hoisted to
    one differentiable (N, d) table pass — see _make_neg_scores) or the
    rotate-and-L2 form (RotatE; sin/cos of the slot's phase rows on the
    VPU). RotatE's γ offset stays OUTSIDE the kernel (constant —
    gradient-free).

Caller contract: ns sorted ascending. Sizes must satisfy the VMEM budget
(z bf16 + accumulators) — the caller falls back to the unfused path
otherwise (see fits()); feature dims must be lane-aligned (d % 128, and
% 256 for the half-width complex modes) — enforced by the decoder gates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segsum import ALIGN, WINDOW, _round_up

# kill-switch for A/B convergence probes: BIOMEDKG_NO_FUSED_NEG=1 forces
# every decoder onto its unfused sorted path (checked by the decoder gates)
import os

DISABLE = os.environ.get("BIOMEDKG_NO_FUSED_NEG", "") == "1"

BLOCK = 2048
# All four modes now run the full BLOCK. History: the distance kernels
# originally ran B = 1024 because transe's in-kernel L1 normalization
# and its VJP held ~9 live f32 (B, d) temporaries (measured 17.18 M
# scoped-VMEM requested at B = 2048). Round 3 hoisted that
# normalization OUT of the kernel (the z table is pre-normalized once
# per step and XLA autodiffs the (N, d) pass); the remaining plain
# |h + r − t| and rotate-and-L2 bodies both fit at 2048 (rotate
# measured 16.34 → 16.05 ms/step on the chip).
VMEM_BUDGET = 10 * 1024 * 1024

BILINEAR_MODES = ("distmult", "complex")
DISTANCE_MODES = ("transe", "rotate")


def fits(num_nodes: int, d: int, num_relations: int) -> bool:
    n_pad = _round_up(max(num_nodes, WINDOW), ALIGN)
    z_bytes = n_pad * d * 2                     # bf16 table
    acc_bytes = n_pad * d * 4                   # f32 dz accumulator (bwd)
    stream = BLOCK * d * (2 + 2) * 2            # t in + dt out, 2 buffers
    # per-chunk (R, BLOCK) temporaries: the f32 projection `pt` in the
    # bilinear forward and the one-hot `ohr` (bf16 matmul operand) in the
    # backward — large relation vocabularies must fall back, not blow the
    # scoped-VMEM budget at compile time
    rel_tmp = num_relations * BLOCK * (4 + 2)
    return z_bytes + acc_bytes + stream + num_relations * d * 8 \
        + rel_tmp < VMEM_BUDGET



def _combine_fwd(mode, h, t):
    """G(h, t) such that score = Σ_j G_j · rel_emb[rel]_j — the bilinear
    form of the decoder. "distmult": G = h∘t. "complex": half-width
    re/im blocks, G = [h_re∘t_re + h_im∘t_im | h_re∘t_im − h_im∘t_re]
    (the intended reference ComplEx, models/decoders.py)."""
    if mode == "distmult":
        return h * t
    half = h.shape[1] // 2
    h_re, h_im = h[:, :half], h[:, half:]
    t_re, t_im = t[:, :half], t[:, half:]
    return jnp.concatenate([h_re * t_re + h_im * t_im,
                            h_re * t_im - h_im * t_re], axis=1)


def _combine_dh(mode, r, t):
    """∂score/∂h given the slot's relation rows and t (bilinear modes)."""
    if mode == "distmult":
        return r * t
    half = r.shape[1] // 2
    r_re, r_im = r[:, :half], r[:, half:]
    t_re, t_im = t[:, :half], t[:, half:]
    return jnp.concatenate([r_re * t_re + r_im * t_im,
                            r_re * t_im - r_im * t_re], axis=1)


def _combine_dt(mode, r, h):
    """∂score/∂t given the slot's relation rows and h (bilinear modes)."""
    if mode == "distmult":
        return r * h
    half = r.shape[1] // 2
    r_re, r_im = r[:, :half], r[:, half:]
    h_re, h_im = h[:, :half], h[:, half:]
    return jnp.concatenate([r_re * h_re - r_im * h_im,
                            r_re * h_im + r_im * h_re], axis=1)


# -- distance-mode math (f32 on the VPU) -----------------------------------

def _split(v):
    half = v.shape[1] // 2
    return v[:, :half], v[:, half:]


def _distance_score(mode, h, t, r_rows):
    """(B,) raw scores. transe: -‖h + r − t‖₁ on the PRE-NORMALIZED z
    table (decoder.py:21-38 semantics; the L1 row normalization and its
    VJP run once per step over (N, d) in XLA — see _make_neg_scores —
    instead of per chunk in both kernels, which is what forced the
    distance modes to half-size chunks until round 3).
    rotate: -Σ_j |h∘e^{iθ} − t|_j (γ added by the caller; ``r_rows`` is
    the slot's PRE-COMPUTED [cos θ | sin θ] rows — the (R, d) table costs
    R·d transcendentals once per step outside the kernel instead of
    B·d/2 per chunk in both kernels)."""
    h = h.astype(jnp.float32)
    t = t.astype(jnp.float32)
    r = r_rows.astype(jnp.float32)
    if mode == "transe":
        return -jnp.sum(jnp.abs(h + r - t), axis=1)
    h_re, h_im = _split(h)
    t_re, t_im = _split(t)
    c, s = _split(r)
    u_re = h_re * c - h_im * s - t_re
    u_im = h_re * s + h_im * c - t_im
    dist = jnp.sqrt(jnp.maximum(u_re ** 2 + u_im ** 2, 1e-12))
    return -jnp.sum(dist, axis=1)


def _distance_bwd(mode, h, t, r_rows, ds_col):
    """(dh (B, d), dt (B, d), dre_slot (B, dr)) for the distance modes;
    exact VJPs of _distance_score (all f32)."""
    h = h.astype(jnp.float32)
    t = t.astype(jnp.float32)
    r = r_rows.astype(jnp.float32)
    ds = ds_col.astype(jnp.float32)
    if mode == "transe":
        sg = jnp.sign(h + r - t)
        dh = -ds * sg
        return dh, -dh, dh
    h_re, h_im = _split(h)
    t_re, t_im = _split(t)
    c, s = _split(r)
    rot_re = h_re * c - h_im * s
    rot_im = h_re * s + h_im * c
    u_re, u_im = rot_re - t_re, rot_im - t_im
    dist = jnp.sqrt(jnp.maximum(u_re ** 2 + u_im ** 2, 1e-12))
    du_re = -ds * u_re / dist
    du_im = -ds * u_im / dist
    dh = jnp.concatenate([du_re * c + du_im * s,
                          -du_re * s + du_im * c], axis=1)
    dt = jnp.concatenate([-du_re, -du_im], axis=1)
    dre_slot = -du_re * rot_im + du_im * rot_re
    return dh, dt, dre_slot


def _window_accumulate(n_pad, ids, body):
    """Run ``body(base, in_win)`` for every WINDOW-sized span that
    contains an id. Contiguous windows from the chunk's min id to its max
    (scalar bounds), swept by a fori_loop — kernel code size is ONE body
    regardless of the padded node count (the round-2 static unroll grew
    to ~n_pad/WINDOW copies, inflating compile time; advisor item).
    Coverage is total for sorted ids, so no id is ever dropped; typically
    exactly one window is occupied at production densities."""
    valid = ids >= 0
    big = jnp.int32(2 ** 30)
    minv = jnp.min(jnp.where(valid, ids, big))
    maxv = jnp.max(jnp.where(valid, ids, -1))
    start = (jnp.minimum(minv, jnp.int32(n_pad - 1)) // ALIGN) * ALIGN
    nwin = jnp.where(maxv >= 0, (maxv - start) // WINDOW + 1, 0)

    def loop(w, carry):
        logical = start + w * WINDOW
        base = pl.multiple_of(jnp.minimum(logical, n_pad - WINDOW), ALIGN)
        in_win = (ids >= logical) & (ids < logical + WINDOW)
        body(base, in_win)
        return carry

    jax.lax.fori_loop(0, nwin, loop, 0)


def _gather_h(n_pad, ids, z_ref, h_ref, dtype):
    """h_ref (B, d) ← windowed one-hot gather of z rows at sorted ids."""
    h_ref[:] = jnp.zeros_like(h_ref)

    def body(base, in_win):
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (WINDOW, ids.shape[0]), 0) + base
        oh = ((rows == ids[None, :]) & in_win[None, :]).astype(dtype)
        z_win = z_ref[pl.ds(base, WINDOW), :]
        h_ref[:] += jax.lax.dot_general(
            oh, z_win, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    _window_accumulate(n_pad, ids, body)


def _scatter_windows(n_pad, ids, grads, dz_ref):
    """dz_ref[ids] += grads via windowed one-hot matmuls — the scatter
    transpose of _gather_h (one body, shared by every backward kernel)."""

    def body(base, in_win):
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (WINDOW, ids.shape[0]), 0) + base
        oh = ((rows == ids[None, :]) & in_win[None, :]).astype(grads.dtype)
        dz_ref[pl.ds(base, WINDOW), :] += jax.lax.dot_general(
            oh, grads, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _window_accumulate(n_pad, ids, body)


def _score_chunk(mode, h, t, rel, re_ref):
    """(B,) scores for one chunk — the shared forward tail. Bilinear
    modes project against ALL R relations in one (R, d) @ (d, B) matmul
    and the slot's relation picks its column; distance modes build the
    slot's relation rows in-kernel (ohr @ rel table)."""
    if mode in BILINEAR_MODES:
        ht = _combine_fwd(mode, h, t)
        pt = jax.lax.dot_general(                    # (R, B) projection
            re_ref[:], ht, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ohr = (jax.lax.broadcasted_iota(
            jnp.int32, (re_ref.shape[0], rel.shape[0]), 0)
            == rel[None, :])
        return jnp.sum(jnp.where(ohr, pt, 0.0), axis=0)
    _, r_rows = _slot_rel(re_ref, rel, t.dtype)
    return _distance_score(mode, h, t, r_rows)


def _slot_rel(re_ref, rel, dtype):
    """(ohr (R, B) one-hot, r_rows (B, dr)) for the chunk's relation ids."""
    num_rel = re_ref.shape[0]
    ohr = (jax.lax.broadcasted_iota(jnp.int32, (num_rel, rel.shape[0]), 0)
           == rel[None, :]).astype(dtype)
    r_rows = jax.lax.dot_general(
        ohr, re_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    return ohr, r_rows


def _fwd_kernel(mode, n_pad, ids_ref, rel_ref, t_ref, z_ref,
                re_ref, out_ref, h_ref):
    c = pl.program_id(0)
    ids = ids_ref[c % 8, :]                          # (B,) lane-major
    _gather_h(n_pad, ids, z_ref, h_ref, t_ref.dtype)
    rel = rel_ref[c % 8, :]                          # (B,) lane-major
    out_ref[c % 8, :] = _score_chunk(mode, h_ref[:], t_ref[:], rel, re_ref)


def _chunk_grads(mode, h, t, r_rows, ohr, ds_col):
    """Per-chunk (dh, dt, dre_update) shared by both backward kernels.
    dre_update is the (R, dr) one-hot-matmul accumulation term."""
    if mode in BILINEAR_MODES:
        dh = ds_col * _combine_dh(mode, r_rows, t)
        dt = ds_col * _combine_dt(mode, r_rows, h)
        dre_slot = ds_col * _combine_fwd(mode, h, t)
    else:
        dh, dt, dre_slot = _distance_bwd(mode, h, t, r_rows, ds_col)
        dh = dh.astype(t.dtype)
        dt = dt.astype(t.dtype)
        dre_slot = dre_slot.astype(t.dtype)  # match ohr for the matmul
    dre_up = jax.lax.dot_general(
        ohr, dre_slot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dh, dt, dre_up


def _bwd_kernel(mode, n_pad, ids_ref, rel_ref, t_ref, ds_ref, z_ref,
                re_ref, dz_ref, dre_ref, dt_ref, h_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dre_ref[:] = jnp.zeros_like(dre_ref)

    ids = ids_ref[c % 8, :]
    _gather_h(n_pad, ids, z_ref, h_ref, t_ref.dtype)
    h = h_ref[:]
    rel = rel_ref[c % 8, :]
    ohr, r_rows = _slot_rel(re_ref, rel, t_ref.dtype)
    ds_col = ds_ref[c % 8, :].reshape(-1, 1).astype(t_ref.dtype)
    t = t_ref[:]
    dh, dt, dre_up = _chunk_grads(mode, h, t, r_rows, ohr, ds_col)
    dt_ref[:] = dt.astype(dt_ref.dtype)
    dre_ref[:] += dre_up
    _scatter_windows(n_pad, ids, dh, dz_ref)


def _fwd_kernel_ds(mode, n_pad, ids_ref, rel_ref, nd_ref, z_ref,
                   re_ref, out_ref, h_ref, t_ref):
    """Forward with BOTH endpoint gathers in-VMEM (the "sorted2"
    sampler: nd is iid uniform inside a per-chunk random narrow band —
    the window sweep needs only a narrow min..max span, not sorted
    order; a band wrapping the id range degrades that chunk to a
    longer fori_loop, same code)."""
    c = pl.program_id(0)
    ids = ids_ref[c % 8, :]
    _gather_h(n_pad, ids, z_ref, h_ref, jnp.bfloat16)
    nd = nd_ref[c % 8, :]
    _gather_h(n_pad, nd, z_ref, t_ref, jnp.bfloat16)
    rel = rel_ref[c % 8, :]
    out_ref[c % 8, :] = _score_chunk(mode, h_ref[:], t_ref[:], rel, re_ref)


def _bwd_kernel_ds(mode, n_pad, ids_ref, rel_ref, nd_ref, ds_ref,
                   z_ref, re_ref, dz_ref, dre_ref, h_ref, t_ref):
    """Backward with the dst contribution folded into the SAME windowed
    dz accumulation as the src side — no (K·E, d) dt stream, no XLA
    scatter, and no O(n_pad) dense one-hot sweep (the dominant FLOP term
    of the dense-dst kernel)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dre_ref[:] = jnp.zeros_like(dre_ref)

    ids = ids_ref[c % 8, :]
    _gather_h(n_pad, ids, z_ref, h_ref, jnp.bfloat16)
    nd = nd_ref[c % 8, :]
    _gather_h(n_pad, nd, z_ref, t_ref, jnp.bfloat16)
    h = h_ref[:]
    t = t_ref[:]
    rel = rel_ref[c % 8, :]
    ohr, r_rows = _slot_rel(re_ref, rel, jnp.bfloat16)
    ds_col = ds_ref[c % 8, :].reshape(-1, 1).astype(jnp.bfloat16)
    dh, dt, dre_up = _chunk_grads(mode, h, t, r_rows, ohr, ds_col)
    dre_ref[:] += dre_up
    _scatter_windows(n_pad, ids, dh, dz_ref)
    _scatter_windows(n_pad, nd, dt, dz_ref)


def _fwd_call_ds(mode, z, ns, nd, rel_ids, rel_emb):
    block = BLOCK
    num_chunks, chunks8, n_pad, zb, tiles = _prep(z, ns, rel_ids, block)
    d = z.shape[1]
    r = rel_emb.shape[0]
    tile_spec = pl.BlockSpec((8, block), lambda c: (c // 8, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_ds, mode, n_pad),
        grid=(num_chunks,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # z (full, bf16)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_emb
        ],
        out_specs=pl.BlockSpec((8, block), lambda c: (c // 8, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.bfloat16),
                        pltpu.VMEM((block, d), jnp.bfloat16)],
        out_shape=jax.ShapeDtypeStruct((chunks8, block), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * ns.shape[0] * (2 * WINDOW + r) * d,
            bytes_accessed=n_pad * d * 2,
            transcendentals=0,
        ),
    )(tiles(ns.astype(jnp.int32), -1),
      tiles(rel_ids.astype(jnp.int32), 0),
      tiles(jnp.clip(nd, 0, n_pad - 1).astype(jnp.int32), 0),
      zb, rel_emb.astype(jnp.bfloat16))
    return out.reshape(-1)[:ns.shape[0]]


def _bwd_call_ds(mode, z, ns, nd, rel_ids, rel_emb, ds):
    block = BLOCK
    num_chunks, chunks8, n_pad, zb, tiles = _prep(z, ns, rel_ids, block)
    d = z.shape[1]
    r, dr = rel_emb.shape
    if mode == "rotate":
        dr //= 2                  # rel input is [cos|sin]; grad is dθ
    r_pad = _round_up(max(r, 8), 8)
    re = rel_emb.astype(jnp.bfloat16)
    if r_pad != r:
        re = jnp.pad(re, ((0, r_pad - r), (0, 0)))
    tile_spec = pl.BlockSpec((8, block), lambda c: (c // 8, 0),
                             memory_space=pltpu.VMEM)
    dz, dre = pl.pallas_call(
        functools.partial(_bwd_kernel_ds, mode, n_pad),
        grid=(num_chunks,),
        in_specs=[
            tile_spec, tile_spec, tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # z
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_emb
        ],
        out_specs=[
            pl.BlockSpec((n_pad, d), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, dr), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((block, d), jnp.bfloat16),
                        pltpu.VMEM((block, d), jnp.bfloat16)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, dr), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ns.shape[0] * (4 * WINDOW + 2 * r) * d,
            bytes_accessed=n_pad * d * 6,
            transcendentals=0,
        ),
    )(tiles(ns.astype(jnp.int32), -1),
      tiles(rel_ids.astype(jnp.int32), 0),
      tiles(jnp.clip(nd, 0, n_pad - 1).astype(jnp.int32), 0),
      tiles(ds.astype(jnp.float32), 0), zb, re)
    return dz[:z.shape[0]], dre[:r]


DENSE_DST_SUB = 512      # dst one-hot sub-block rows
DENSE_DST_MAX = 2048     # use the dense dst path when n_pad ≤ this


def _bwd_kernel_dense(mode, n_pad, ids_ref, rel_ref, nd_ref, t_ref,
                      ds_ref, z_ref, re_ref, dz_ref, dre_ref, h_ref):
    """Backward with the dst-side scatter fused in: dz accumulates BOTH
    the windowed src contribution and a dense one-hot dst contribution
    (sub-blocked over output rows to bound VMEM). O(M·N·d) MXU FLOPs —
    only viable for small node envelopes, where it beats XLA's ~60 GB/s
    scatter by ~2×."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dre_ref[:] = jnp.zeros_like(dre_ref)

    ids = ids_ref[c % 8, :]
    _gather_h(n_pad, ids, z_ref, h_ref, t_ref.dtype)
    h = h_ref[:]
    rel = rel_ref[c % 8, :]
    ohr, r_rows = _slot_rel(re_ref, rel, t_ref.dtype)
    ds_col = ds_ref[c % 8, :].reshape(-1, 1).astype(t_ref.dtype)
    t = t_ref[:]
    dh, dt, dre_up = _chunk_grads(mode, h, t, r_rows, ohr, ds_col)
    dre_ref[:] += dre_up
    _scatter_windows(n_pad, ids, dh, dz_ref)

    nd = nd_ref[c % 8, :]
    for sub in range(n_pad // DENSE_DST_SUB):
        base = sub * DENSE_DST_SUB
        rows_d = jax.lax.broadcasted_iota(
            jnp.int32, (DENSE_DST_SUB, nd.shape[0]), 0) + base
        oh_d = (rows_d == nd[None, :]).astype(t_ref.dtype)
        dz_ref[pl.ds(base, DENSE_DST_SUB), :] += jax.lax.dot_general(
            oh_d, dt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _prep(z, ns, rel_ids, block):
    m = ns.shape[0]
    assert m % block == 0, (
        f"fused neg path needs K·E ({m}) % {block} == 0 — loaders align "
        f"edge budgets to lcm(block, 2048)")
    num_chunks = m // block
    chunks8 = _round_up(num_chunks, 8)
    n_pad = _round_up(max(z.shape[0], WINDOW), ALIGN)
    zb = z.astype(jnp.bfloat16)
    if n_pad != z.shape[0]:
        zb = jnp.pad(zb, ((0, n_pad - z.shape[0]), (0, 0)))

    def tiles(v, fill):
        t2 = v.reshape(num_chunks, block)
        if chunks8 != num_chunks:
            t2 = jnp.pad(t2, ((0, chunks8 - num_chunks), (0, 0)),
                         constant_values=fill)
        return t2

    return num_chunks, chunks8, n_pad, zb, tiles


def _fwd_call(mode, z, ns, t_rows, rel_ids, rel_emb):
    block = BLOCK
    num_chunks, chunks8, n_pad, zb, tiles = _prep(z, ns, rel_ids, block)
    d = z.shape[1]
    r = rel_emb.shape[0]
    tile_spec = pl.BlockSpec((8, block), lambda c: (c // 8, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, mode, n_pad),
        grid=(num_chunks,),
        in_specs=[
            tile_spec, tile_spec,
            pl.BlockSpec((block, d), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # z (full, bf16)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_emb
        ],
        out_specs=pl.BlockSpec((8, block), lambda c: (c // 8, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.bfloat16)],
        out_shape=jax.ShapeDtypeStruct((chunks8, block), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * ns.shape[0] * (WINDOW + r) * d,
            bytes_accessed=t_rows.size * 2 + n_pad * d * 2,
            transcendentals=0,  # [cos|sin] table hoisted out of the kernel
        ),
    )(tiles(ns.astype(jnp.int32), -1),
      tiles(rel_ids.astype(jnp.int32), 0), t_rows.astype(jnp.bfloat16),
      zb, rel_emb.astype(jnp.bfloat16))
    return out.reshape(-1)[:ns.shape[0]]


def _bwd_call(mode, z, ns, t_rows, rel_ids, rel_emb, ds, nd=None):
    """Returns (dz_src, dre, dt) in streamed mode (nd None) or
    (dz_src_and_dst, dre, None) in dense-dst mode (small envelopes)."""
    block = BLOCK
    num_chunks, chunks8, n_pad, zb, tiles = _prep(z, ns, rel_ids, block)
    d = z.shape[1]
    r, dr = rel_emb.shape
    if mode == "rotate":
        dr //= 2                  # rel input is [cos|sin]; grad is dθ
    r_pad = _round_up(max(r, 8), 8)
    re = rel_emb.astype(jnp.bfloat16)
    if r_pad != r:
        re = jnp.pad(re, ((0, r_pad - r), (0, 0)))
    tile_spec = pl.BlockSpec((8, block), lambda c: (c // 8, 0),
                             memory_space=pltpu.VMEM)
    if nd is not None:
        dz, dre = pl.pallas_call(
            functools.partial(_bwd_kernel_dense, mode, n_pad),
            grid=(num_chunks,),
            in_specs=[
                tile_spec, tile_spec, tile_spec,
                pl.BlockSpec((block, d), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                tile_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),   # z
                pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_emb
            ],
            out_specs=[
                pl.BlockSpec((n_pad, d), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_pad, dr), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((block, d), jnp.bfloat16)],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, dr), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * ns.shape[0] * (2 * WINDOW + n_pad + 2 * r) * d,
                bytes_accessed=t_rows.size * 2 + n_pad * d * 6,
                transcendentals=0,  # hoisted [cos|sin] table
            ),
        )(tiles(ns.astype(jnp.int32), -1),
          tiles(rel_ids.astype(jnp.int32), 0),
          # nd one-hot pads target row n_pad-1 — harmless: dt rows for
          # pads are zero because ds pads are zero
          tiles(jnp.clip(nd, 0, n_pad - 1).astype(jnp.int32), 0),
          t_rows.astype(jnp.bfloat16),
          tiles(ds.astype(jnp.float32), 0), zb, re)
        return dz[:z.shape[0]], dre[:r], None
    dz, dre, dt = pl.pallas_call(
        functools.partial(_bwd_kernel, mode, n_pad),
        grid=(num_chunks,),
        in_specs=[
            tile_spec, tile_spec,
            pl.BlockSpec((block, d), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # z
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rel_emb
        ],
        out_specs=[
            pl.BlockSpec((n_pad, d), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, dr), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((block, d), jnp.bfloat16)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, dr), jnp.float32),
            jax.ShapeDtypeStruct((ns.shape[0], d), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ns.shape[0] * (2 * WINDOW + 2 * r) * d,
            bytes_accessed=t_rows.size * 4 + n_pad * d * 6,
            transcendentals=0,  # hoisted [cos|sin] table
        ),
    )(tiles(ns.astype(jnp.int32), -1),
      tiles(rel_ids.astype(jnp.int32), 0), t_rows.astype(jnp.bfloat16),
      tiles(ds.astype(jnp.float32), 0), zb, re)
    return dz[:z.shape[0]], dre[:r], dt


def _make_neg_scores(mode, dual_sorted: bool = False):
    def _rel_table(rel_emb):
        if mode == "rotate":
            # tiny (R, d/2) phase table → [cos | sin] once per step; the
            # kernels then build per-slot rows with one ohr matmul and do
            # NO transcendentals over (B, d) chunks
            return jnp.concatenate([jnp.cos(rel_emb), jnp.sin(rel_emb)],
                                   axis=1)
        return rel_emb

    if dual_sorted:
        @jax.custom_vjp
        def neg_scores(z, ns, nd, rel_ids, rel_emb):
            """Fused scores with BOTH endpoints gathered in-VMEM.

            ``ns`` sorted ascending; ``nd`` narrow-banded per BLOCK
            chunk (the "sorted2" sampler — iid draws inside a random
            band; order within the chunk is irrelevant, only the span
            matters). No (K·E, d) HBM traffic at all: no t stream in,
            no dt stream out, the dst gradient folds into the same
            windowed dz accumulator.
            """
            return _fwd_call_ds(mode, z, ns, nd, rel_ids,
                                _rel_table(rel_emb))

        def _op_fwd(z, ns, nd, rel_ids, rel_emb):
            re_t = _rel_table(rel_emb)
            scores = _fwd_call_ds(mode, z, ns, nd, rel_ids, re_t)
            return scores, (z, ns, nd, rel_ids, re_t)

        def _op_bwd(res, ds):
            z, ns, nd, rel_ids, re_t = res
            dz, dre = _bwd_call_ds(mode, z, ns, nd, rel_ids, re_t, ds)
            return (dz.astype(z.dtype), None, None, None,
                    dre.astype(re_t.dtype))

        neg_scores.defvjp(_op_fwd, _op_bwd)
    else:
        @jax.custom_vjp
        def neg_scores(z, ns, nd, rel_ids, rel_emb):
            """Fused scores for (z[ns], rel_emb[rel_ids], z[nd]) triples.

            ``ns`` sorted ascending. Returns f32 (K·E,) scores. The t-side
            gather runs in XLA (index-pattern-agnostic, full HBM speed);
            everything else stays in VMEM.
            """
            t_rows = jnp.take(z, nd, axis=0,
                              mode="clip").astype(jnp.bfloat16)
            return _fwd_call(mode, z, ns, t_rows, rel_ids,
                             _rel_table(rel_emb))

        def _op_fwd(z, ns, nd, rel_ids, rel_emb):
            t_rows = jnp.take(z, nd, axis=0,
                              mode="clip").astype(jnp.bfloat16)
            re_t = _rel_table(rel_emb)
            scores = _fwd_call(mode, z, ns, t_rows, rel_ids, re_t)
            return scores, (z, ns, nd, rel_ids, re_t, t_rows)

        def _op_bwd(res, ds):
            z, ns, nd, rel_ids, rel_emb, t_rows = res
            n_pad = _round_up(max(z.shape[0], WINDOW), ALIGN)
            if n_pad <= DENSE_DST_MAX and n_pad % DENSE_DST_SUB == 0:
                # small envelope: the dst scatter fuses into the kernel as
                # dense one-hot matmuls (~2× XLA's scatter at this envelope)
                dz, dre, _ = _bwd_call(mode, z, ns, t_rows, rel_ids,
                                       rel_emb, ds, nd=nd)
            else:
                dz_src, dre, dt = _bwd_call(mode, z, ns, t_rows, rel_ids,
                                            rel_emb, ds)
                # t-side gradient: plain scatter (nd unsorted by
                # construction). f32 accumulation — measured no slower
                # than bf16 (PERF.md), and the transe table-level
                # normalization VJP amplifies accumulator rounding
                safe_nd = jnp.clip(nd, 0, z.shape[0] - 1)
                dz = dz_src + jax.ops.segment_sum(dt.astype(jnp.float32),
                                                  safe_nd,
                                                  num_segments=z.shape[0])
            return (dz.astype(z.dtype), None, None, None,
                    dre.astype(rel_emb.dtype))

        neg_scores.defvjp(_op_fwd, _op_bwd)
    if mode != "transe":
        return neg_scores

    def transe_pre_normalized(z, ns, nd, rel_ids, rel_emb):
        """TransE with the L1 row normalization HOISTED to one
        differentiable (N, d) table pass: the kernel then computes the
        plain translation distance with ~3 live (B, d) temporaries
        instead of ~9, which is what lets the distance modes run the
        full BLOCK (2048). XLA autodiffs this pass — the
        normalization VJP lands on N table rows once instead of on every
        K·E slot."""
        zf = z.astype(jnp.float32)
        zn = zf / jnp.maximum(jnp.sum(jnp.abs(zf), axis=1, keepdims=True),
                              1e-12)
        return neg_scores(zn.astype(z.dtype), ns, nd, rel_ids, rel_emb)

    return transe_pre_normalized


distmult_neg_scores = _make_neg_scores("distmult")
complex_neg_scores = _make_neg_scores("complex")
transe_neg_scores = _make_neg_scores("transe")
rotate_neg_scores = _make_neg_scores("rotate")

# Dual-sorted ("sorted2") variants: ns AND nd sorted draws (random cyclic
# pairing) — both gathers ride the windowed one-hot path and the dst
# gradient folds into the in-kernel dz accumulator (zero (K·E, d) HBM).
distmult_neg_scores_ds = _make_neg_scores("distmult", dual_sorted=True)
complex_neg_scores_ds = _make_neg_scores("complex", dual_sorted=True)
transe_neg_scores_ds = _make_neg_scores("transe", dual_sorted=True)
rotate_neg_scores_ds = _make_neg_scores("rotate", dual_sorted=True)
