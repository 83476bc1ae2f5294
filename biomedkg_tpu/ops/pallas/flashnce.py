"""Pallas TPU kernel: fused flash-style InfoNCE denominators (fwd + bwd).

GRACE's L2L-intraview InfoNCE (reference biomedkg/gcl_module.py:171-190,
PyGCL DualBranchContrast semantics) needs, per row i of the two
L2-normalized projection tables ``an``/``bn`` (N, d):

    denom[i] = logsumexp_j concat(inter[i, :], intra[i, :])
    inter[i, j] = an[i]·bn[j]/τ + col[j]
    intra[i, j] = an[i]·an[j]/τ + col[j]   (diag masked to −∞)

The XLA path (training/gcl_module._flash_pos_denom) already streams
(block, N) tiles and recomputes them in a custom VJP, but every tile's
two (block, N) f32 logit matrices still round-trip VMEM↔HBM between the
matmul and the softmax/logsumexp consumers. This kernel fuses the whole
tile pipeline — two MXU matmuls, masking, running max/sum-exp — so only
the (N,) outputs and (block, d) operand tiles touch HBM:

  forward   grid (ni, nj), j inner: online logsumexp in (block, 1) VMEM
            scratch, one denom row-block written per i.
  backward  two kernels (the standard flash split — TPU output blocks
            accumulate only across CONSECUTIVE grid steps):
              rows:  d_an[i] += (gi @ bn[j] + gt @ an[j]) / τ   (j inner)
              cols:  d_bn[j] += gi.T @ an[i] / τ,
                     d_an[j] += gt.T @ an[i] / τ                (i inner)
            with gi = g_denom·exp(inter − denom), gt likewise for intra —
            softmax cotangents rebuilt from the saved (N,) denom only.

The positive term (the inter diagonal) is a cheap rowwise dot handled
OUTSIDE the kernel by the caller. ``col`` is the additive f32 padding
mask (0 / finfo.min), non-differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = jnp.finfo(jnp.float32).min

_FORCE_KERNEL = False  # tests flip this under force_tpu_interpret_mode


def _logits(a, b, aj, colj, tau, diag, r0, c0):
    """The (block, block) inter/intra tile pair, masked."""
    inter = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / tau + colj
    intra = jax.lax.dot_general(
        a, aj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) / tau + colj
    blk = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) + c0
    intra = jnp.where(diag & (rows == cols), NEG, intra)
    return inter, intra


def _fwd_kernel(tau, nj, a_ref, b_ref, aj_ref, col_ref, den_ref,
                m_scr, s_scr):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        s_scr[:] = jnp.zeros_like(s_scr)

    blk = a_ref.shape[0]
    inter, intra = _logits(a_ref[:], b_ref[:], aj_ref[:], col_ref[j, :],
                           tau, i == j, i * blk, j * blk)
    local = jnp.maximum(jnp.max(inter, axis=1, keepdims=True),
                        jnp.max(intra, axis=1, keepdims=True))
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, local)
    s_scr[:] = (s_scr[:] * jnp.exp(m_old - m_new)
                + jnp.sum(jnp.exp(inter - m_new), axis=1, keepdims=True)
                + jnp.sum(jnp.exp(intra - m_new), axis=1, keepdims=True))
    m_scr[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        # (block, 1) column write — same sublane orientation as the
        # running stats, no lane transpose for Mosaic to lower
        den_ref[:] = m_scr[:] + jnp.log(s_scr[:])


def _softmax_cots(a, b, aj, colj, gd, dn, tau, diag, r0, c0):
    """gi/gt = g_denom·softmax rebuilt from the saved denominators."""
    inter, intra = _logits(a, b, aj, colj, tau, diag, r0, c0)
    gi = gd * jnp.exp(inter - dn)
    gt = gd * jnp.exp(intra - dn)
    return gi, gt


def _bwd_rows_kernel(tau, nj, a_ref, b_ref, aj_ref, col_ref, gd_ref,
                     dn_ref, da_ref, acc_scr):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    blk = a_ref.shape[0]
    gd, dn = gd_ref[:], dn_ref[:]                       # (block, 1) columns
    gi, gt = _softmax_cots(a_ref[:], b_ref[:], aj_ref[:], col_ref[j, :],
                           gd, dn, tau, i == j, i * blk, j * blk)
    acc_scr[:] += (
        jnp.dot(gi, b_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + jnp.dot(gt, aj_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)) / tau

    @pl.when(j == nj - 1)
    def _():
        da_ref[:] = acc_scr[:]


def _bwd_cols_kernel(tau, ni, a_ref, b_ref, aj_ref, col_ref, gd_ref,
                     dn_ref, db_ref, daj_ref, db_scr, daj_scr):
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        db_scr[:] = jnp.zeros_like(db_scr)
        daj_scr[:] = jnp.zeros_like(daj_scr)

    blk = a_ref.shape[0]
    gd, dn = gd_ref[:], dn_ref[:]                       # (block, 1) columns
    gi, gt = _softmax_cots(a_ref[:], b_ref[:], aj_ref[:], col_ref[j, :],
                           gd, dn, tau, i == j, i * blk, j * blk)
    a32 = a_ref[:].astype(jnp.float32)
    db_scr[:] += jax.lax.dot_general(
        gi, a32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / tau
    daj_scr[:] += jax.lax.dot_general(
        gt, a32, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / tau

    @pl.when(i == ni - 1)
    def _():
        db_ref[:] = db_scr[:]
        daj_ref[:] = daj_scr[:]


def _tile_spec(block, d, which):
    """Block indexed by the FIRST ("i") or SECOND ("j") grid dimension.

    NOTE: positional — in the cols kernel the grid is (j, i), so "i"
    selects the j tile there and "j" the i tile (the call sites pick
    specs by grid POSITION, not by letter)."""
    return pl.BlockSpec((block, d), {"i": lambda a, b: (a, 0),
                                     "j": lambda a, b: (b, 0)}[which],
                        memory_space=pltpu.VMEM)


def _full_spec(nt, block):
    """Whole (nt, block) col-mask array resident in VMEM (N·4 bytes —
    ~25 KB at the production batch). A block spec equal to the array
    shape is always Mosaic-legal, unlike a (1, block) row block whose
    sublane dim of 1 violates the (8, 128) tiling rule and whose lane
    blocking would demand block % 128 == 0; the kernels pick their row
    with a dynamic sublane index instead."""
    return pl.BlockSpec((nt, block), lambda a, b: (0, 0),
                        memory_space=pltpu.VMEM)


def _col_spec(block, which):
    """(block, 1) column block of an (N, 1) array — sublane-oriented, so
    per-row quantities (g_denom, denom) broadcast against (block, block)
    logit tiles without a lane transpose."""
    return pl.BlockSpec((block, 1), {"i": lambda a, b: (a, 0),
                                     "j": lambda a, b: (b, 0)}[which],
                        memory_space=pltpu.VMEM)


def fits(n: int, d: int, block: int, itemsize: int = 4) -> bool:
    """Conservative VMEM check sized to the WORST kernel (cols backward):
    double-buffered operand tiles (Pallas pipelines inputs), four live
    (block, block) f32 logit tiles (inter/intra and their gi/gt
    cotangents coexist), and four (block, d) f32 accumulators (2 scratch
    + 2 output blocks). Interpret mode ignores VMEM, so this gate is the
    only thing standing between the picker and a Mosaic scoped-vmem
    failure on hardware — prefer undersized tiles over a crash."""
    ops = 2 * 3 * block * d * itemsize
    logits = 4 * block * block * 4
    accs = 4 * block * d * 4
    # whole (nt, block) mask resident (see _full_spec); 2x for Pallas's
    # double-buffered input windows.
    col = 2 * n * 4
    return n % block == 0 and d % 128 == 0 and block % 16 == 0 \
        and ops + logits + accs + col < 13 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_denom(an, bn, col, block: int, tau: float):
    """(N,) InfoNCE log-denominators via the fused Pallas pipeline.

    ``an``/``bn`` are the L2-normalized projection tables (N, d), f32 or
    bf16; ``col`` the (N,) additive f32 mask. Padding/diag semantics
    match training/gcl_module._flash_fwd exactly (tested)."""
    return _denom_impl(an, bn, col, block, tau)


def _denom_impl(an, bn, col, block, tau):
    n, d = an.shape
    nt = n // block
    grid = (nt, nt)
    col2 = col.reshape(nt, block)
    den = pl.pallas_call(
        functools.partial(_fwd_kernel, tau, nt),
        grid=grid,
        in_specs=[_tile_spec(block, d, "i"), _tile_spec(block, d, "j"),
                  _tile_spec(block, d, "j"), _full_spec(nt, block)],
        out_specs=_col_spec(block, "i"),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, 1), jnp.float32),
                        pltpu.VMEM((block, 1), jnp.float32)],
    )(an, bn, an, col2)
    return den.reshape(-1)


def _vjp_fwd(an, bn, col, block, tau):
    den = _denom_impl(an, bn, col, block, tau)
    return den, (an, bn, col, den)


def _vjp_bwd(block, tau, res, g):
    an, bn, col, den = res
    n, d = an.shape
    nt = n // block
    col2 = col.reshape(nt, block)
    gd2 = g.reshape(n, 1).astype(jnp.float32)
    dn2 = den.reshape(n, 1)

    da_rows = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, tau, nt),
        grid=(nt, nt),
        in_specs=[_tile_spec(block, d, "i"), _tile_spec(block, d, "j"),
                  _tile_spec(block, d, "j"), _full_spec(nt, block),
                  _col_spec(block, "i"), _col_spec(block, "i")],
        out_specs=pl.BlockSpec((block, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32)],
    )(an, bn, an, col2, gd2, dn2)

    db, da_cols = pl.pallas_call(
        functools.partial(_bwd_cols_kernel, tau, nt),
        grid=(nt, nt),
        in_specs=[_tile_spec(block, d, "j"), _tile_spec(block, d, "i"),
                  _tile_spec(block, d, "i"), _full_spec(nt, block),
                  _col_spec(block, "j"), _col_spec(block, "j")],
        out_specs=[pl.BlockSpec((block, d), lambda j, i: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block, d), lambda j, i: (j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((n, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block, d), jnp.float32),
                        pltpu.VMEM((block, d), jnp.float32)],
    )(an, bn, an, col2, gd2, dn2)

    da = (da_rows + da_cols).astype(an.dtype)
    return da, db.astype(bn.dtype), jnp.zeros_like(col)


flash_denom.defvjp(_vjp_fwd, _vjp_bwd)
