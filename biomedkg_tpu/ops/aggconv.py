"""Aggregate-then-transform RGCN convolution (round-2 VERDICT #4).

The node-centric conv (encoders.py) computes h_all = einsum(x, w_rel)
then gathers per-edge rows at flat key rel·N + src; its autodiff
transpose is an UNSORTED (R·N)-keyed scatter of (E, d) gradients —
~0.53 ms/layer at the bench envelope, the largest remaining step cost
after round 2 (PERF.md trace). This module reorders the factorization:

  forward:   a[dst·R + rel] += norm · x[src]      (SpMM over the graph)
             out = einsum("nrd,rdk->nk", a, w_rel) + x @ w_root + b
  backward:  da = einsum("nk,rdk->nrd", dout, w_rel)
             dw = einsum("nrd,nk->rdk", a, dout)
             dx[src] += norm · da[dst·R + rel]    (SpMM over the TRANSPOSE)

Both SpMMs are segment-sums: the forward one over the (dst, rel)-sorted
primary edge order (key dst·R + rel is globally sorted — batch.py
lexsorts), the backward one over the SRC-SORTED edge copy the dst-layout
batch ships (GraphBatch.src_edges). Each therefore runs on the Pallas
windowed sorted-segment kernel (ops/pallas/segsum.py) instead of XLA's
~100 GB/s scatter — the classic CSR/CSC transpose pair, shipped as data
instead of recomputed. Gathers stay unsorted XLA clip-takes (full HBM
speed, index-pattern-agnostic).

Reference semantics: mean-per-relation RGCNConv aggregation
(/root/reference/biomedkg/model/encoder.py:24-60) — ``norm`` is the
masked 1/|N_r(dst)| factor, identical to the node-centric path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas.segsum import sorted_segment_sum
from .segment import take_rows

# windows per chunk for the (N·R)-keyed forward aggregation: a chunk of
# dst-sorted edges spans ~(chunk/avg_deg)·R keys — wider than the plain
# dst aggregation, so give it more room (empty windows skip in-kernel)
FWD_WINDOWS = 3
BWD_WINDOWS = 2
# the (N·R)-row output (~12.6 MB at the bench envelope) exceeds segsum's
# default 8 MB resident budget and would d-shard into multi-pass reads;
# grant it the room instead (output + two (BLOCK, d) stream buffers still
# fit the 16 MB core VMEM at d = 256)
FWD_OUT_BUDGET = 13 * 1024 * 1024


@jax.custom_vjp
def agg_conv(x, w_rel, src, key, norm, s2, key2, norm2):
    """out[n] = Σ_r W_r · (Σ_{e: dst=n, rel=r} norm_e · x[src_e]).

    Args:
      x: (N, din) node features.
      w_rel: (R, din, dout).
      src: (E,) primary-order source ids.
      key: (E,) SORTED flat keys dst·R + rel (pad edges repeat the last
        real key; their norm is 0).
      norm: (E,) masked mean normalization (0 on pads).
      s2/key2/norm2: the src-sorted copy — s2 SORTED source ids, key2 its
        dst·R + rel keys (unsorted), norm2 its masked norms.
    """
    out, _ = _fwd(x, w_rel, src, key, norm, s2, key2, norm2)
    return out


def _fwd(x, w_rel, src, key, norm, s2, key2, norm2):
    n = x.shape[0]
    r = w_rel.shape[0]
    msg = take_rows(x, src) * norm[:, None].astype(x.dtype)
    a = sorted_segment_sum(msg, key, n * r, FWD_WINDOWS,
                           FWD_OUT_BUDGET).astype(x.dtype)
    out = jnp.einsum("nrd,rdk->nk", a.reshape(n, r, -1), w_rel,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out, (x, w_rel, a)


def _bwd(res, dout):
    x, w_rel, a, src, key, norm, s2, key2, norm2 = res
    n = x.shape[0]
    r = w_rel.shape[0]
    a3 = a.reshape(n, r, -1)
    dout = dout.astype(x.dtype)
    dw = jnp.einsum("nrd,nk->rdk", a3, dout,
                    preferred_element_type=jnp.float32
                    ).astype(w_rel.dtype)
    da = jnp.einsum("nk,rdk->nrd", dout, w_rel,
                    preferred_element_type=jnp.float32
                    ).astype(x.dtype).reshape(n * r, -1)
    # transpose SpMM over the src-sorted copy: gather da rows at the
    # copy's keys (unsorted clip-take), scale, sorted-scatter into dx
    dmsg2 = take_rows(da, key2) * norm2[:, None].astype(x.dtype)
    dx = sorted_segment_sum(dmsg2, s2, n, BWD_WINDOWS).astype(x.dtype)
    return dx, dw, None, None, None, None, None, None


def _fwd_vjp(x, w_rel, src, key, norm, s2, key2, norm2):
    out, (x_, w_, a) = _fwd(x, w_rel, src, key, norm, s2, key2, norm2)
    return out, (x_, w_, a, src, key, norm, s2, key2, norm2)


agg_conv.defvjp(_fwd_vjp, _bwd)
