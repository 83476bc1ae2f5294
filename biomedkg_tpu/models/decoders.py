"""Triplet-scoring decoders: TransE, DistMult, ComplEx, RotatE.

Functional re-designs of /root/reference/biomedkg/model/decoder.py:21-77.
Each decoder provides:

  * ``init(rng)``                       — relation-embedding parameters
  * ``score(params, z, head, tail, rel)`` — per-edge scores (fuses with the
    on-device negative sampler inside the jitted train step; XLA folds the
    gathers + elementwise math into surrounding kernels)
  * ``score_all_tails(params, z, head, rel)`` — (E, N) candidate matrix for
    the filtered-ranking evaluator (eval/ranking.py); expressed as matmuls /
    broadcasts so it tiles onto the MXU.

ComplEx in the reference is doubly broken (Parameter assigned before
super().__init__ and a width mismatch, decoder.py:52-77); here it is the
*intended* model: z split into real/imag halves, relation embeddings of
matching half-width packed into one (R, d) table so the L2 regularizer
(kge_module.py:128) sees a single ``rel_emb``. RotatE is an addition the
reference lacks but its benchmark configs call for.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.segment import take_rows, take_rows_matbwd, take_rows_sorted


def _tail_take(z, tail, tail_sorted):
    """Tail-row gather; destination-sorted batches (layout='dst') route
    the backward through the Pallas sorted segment-sum (4 windows: graph
    destination densities are irregular)."""
    return (take_rows_sorted(z, tail, 4) if tail_sorted
            else take_rows(z, tail))


def _head_take(z, head, head_perm):
    """Head-row gather; with ``head_perm=(src_pos, s2)`` (the dst
    batch's (src, rel)-lexsorted copy) the backward permutes the gradient
    into src-sorted order and reduces on the Pallas sorted kernel instead
    of the unsorted head scatter (0.48 ms/step in the round-2 trace)."""
    if head_perm is not None:
        from ..ops.segment import take_rows_via_perm

        src_pos, s2 = head_perm
        return take_rows_via_perm(z, head, src_pos, s2, 2)
    return take_rows(z, head)


class _Decoder:
    def __init__(self, num_relations: int, hidden_channels: int):
        self.num_relations = num_relations
        self.hidden_channels = hidden_channels

    def init(self, rng) -> dict:
        return {"rel_emb": nn.xavier_uniform(
            rng, (self.num_relations, self.hidden_channels))}

    def score_neg(self, params, z, neg_src, neg_dst, rel):
        """Score (K, E) negative endpoint sets sharing one (E,) relation
        column. Gathers relation rows ONCE and broadcasts over the K
        corruption sets — profiling showed the tiled per-negative relation
        gather materializing a (K·E, d) array was a top HBM consumer
        (PERF.md trace analysis). Default: per-decoder broadcast form."""
        k, e = neg_src.shape
        h = take_rows(z, neg_src.reshape(-1)).reshape(k, e, -1)
        t = take_rows(z, neg_dst.reshape(-1)).reshape(k, e, -1)
        # follow z's dtype: in bf16 mixed-precision mode the (K·E, d)
        # gathers/products halve their HBM traffic
        r = take_rows_matbwd(params["rel_emb"], rel).astype(z.dtype)  # (E, d)
        return self._combine(h, r[None], t).astype(jnp.float32)

    def _combine(self, h, r, t):  # pragma: no cover - overridden
        raise NotImplementedError


class TransE(_Decoder):
    """score = -|| L1norm(h) + r - L1norm(t) ||_1 (reference decoder.py:21-38)."""

    def init(self, rng) -> dict:
        bound = 6.0 / math.sqrt(self.hidden_channels)
        emb = jax.random.uniform(
            rng, (self.num_relations, self.hidden_channels),
            minval=-bound, maxval=bound)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return {"rel_emb": emb}

    @staticmethod
    def _l1_normalize(v):
        return v / jnp.maximum(jnp.sum(jnp.abs(v), -1, keepdims=True), 1e-12)

    def _combine(self, h, r, t):
        h = self._l1_normalize(h)
        t = self._l1_normalize(t)
        return -jnp.sum(jnp.abs(h + r - t), axis=-1)

    def score_neg_sorted(self, params, z, neg_src, neg_dst, rel,
                         dst_sorted=False):
        """Sorted-source negatives. Not bilinear in r, so no
        project-then-select — but the fused Pallas kernel has a distance
        combine mode ("transe": per-slot relation rows rebuilt in-kernel
        via ohr @ rel_emb; the L1 row normalization is hoisted to one
        differentiable table pass so the kernel runs the full BLOCK,
        ops/pallas/negscore.py). ``dst_sorted``: neg_dst is narrow-
        banded per chunk (the "sorted2" sampler) → the fully-VMEM `_ds`
        kernel. Fallback: sorted-gather path whose scatter transpose
        routes through the Pallas sorted segment-sum."""
        from ..ops.pallas import negscore

        if (not negscore.DISABLE
                and jax.default_backend() in ("tpu", "axon")
                and z.dtype == jnp.bfloat16
                and z.shape[1] % 128 == 0        # lane-aligned blocks
                and neg_src.shape[0] % negscore.BLOCK == 0
                and negscore.fits(z.shape[0], z.shape[1],
                                  self.num_relations)):
            kern = (negscore.transe_neg_scores_ds if dst_sorted
                    else negscore.transe_neg_scores)
            return kern(z, neg_src, neg_dst, rel, params["rel_emb"])

        h = self._l1_normalize(take_rows_sorted(z, neg_src))
        t = self._l1_normalize(take_rows(z, neg_dst))
        r = take_rows_matbwd(params["rel_emb"], rel).astype(z.dtype)
        return -jnp.sum(jnp.abs(h + r - t), axis=-1).astype(jnp.float32)

    def score(self, params, z, head, tail, rel, tail_sorted=False,
              head_perm=None):
        h = self._l1_normalize(_head_take(z, head, head_perm))
        t = self._l1_normalize(_tail_take(z, tail, tail_sorted))
        r = take_rows_matbwd(params["rel_emb"], rel)
        return -jnp.sum(jnp.abs(h + r - t), axis=-1)

    def score_all_tails(self, params, z, head, rel):
        zn = self._l1_normalize(z)                      # (N, d)
        h = take_rows(zn, head)                  # (E, d)
        r = take_rows_matbwd(params["rel_emb"], rel)    # (E, d)
        hr = (h + r)[:, None, :]                        # (E, 1, d)
        return -jnp.sum(jnp.abs(hr - zn[None, :, :]), axis=-1)

    def score_all_heads(self, params, z, tail, rel):
        zn = self._l1_normalize(z)
        t = take_rows(zn, tail)
        r = take_rows_matbwd(params["rel_emb"], rel)
        rt = (r - t)[:, None, :]                        # (E, 1, d)
        return -jnp.sum(jnp.abs(zn[None, :, :] + rt), axis=-1)


class DistMult(_Decoder):
    """score = Σ h·r·t (reference decoder.py:41-49)."""

    def _combine(self, h, r, t):
        return jnp.sum(h * r * t, axis=-1)

    def score_neg_sorted(self, params, z, neg_src, neg_dst, rel,
                         dst_sorted=False):
        """Flat negative scoring tuned for the sorted-source sampler.

        ``neg_src`` is a SORTED (K·E,) index vector (kge_module's
        stratified-uniform sampler), ``neg_dst`` iid, ``rel`` the per-slot
        relation ids. Two trace-driven restructurings vs ``score_neg``:

        * the h-side gather uses ``take_rows_sorted`` whose backward is the
          Pallas windowed one-hot segment-sum (ops/pallas/segsum.py) instead
          of XLA's slow scatter fusion — the round-1 top device cost;
        * relation rows are never materialized per-slot ("project then
          select"): scores for ALL R relations come from one
          (K·E, d) @ (d, R) MXU matmul and the slot's relation picks its
          column, so the rel_emb gradient is a clean matmul too. Exact for
          any decoder bilinear in r (DistMult, ComplEx).
        """
        from ..ops.pallas import negscore

        if (not negscore.DISABLE
                and jax.default_backend() in ("tpu", "axon")
                and z.dtype == jnp.bfloat16  # keeps f32 mode full-precision
                and z.shape[1] % 128 == 0    # lane-aligned (BLOCK, d) tiles
                and neg_src.shape[0] % negscore.BLOCK == 0
                and negscore.fits(z.shape[0], z.shape[1],
                                  self.num_relations)):
            # fully-fused Pallas path: z stays VMEM-resident, h rebuilt
            # from the sorted one-hot on the MXU — only the t-side stream
            # touches HBM at (K·E, d) size; with dst_sorted (the
            # "sorted2" sampler) even that stream disappears into the
            # windowed `_ds` kernels (ops/pallas/negscore.py)
            kern = (negscore.distmult_neg_scores_ds if dst_sorted
                    else negscore.distmult_neg_scores)
            return kern(z, neg_src, neg_dst, rel, params["rel_emb"])

        h = take_rows_sorted(z, neg_src)
        t = take_rows(z, neg_dst)
        ht = h * t
        all_rel = jnp.dot(ht, params["rel_emb"].T.astype(z.dtype),
                          preferred_element_type=jnp.float32)  # (K·E, R)
        onehot = (rel[:, None]
                  == jnp.arange(self.num_relations,
                                dtype=rel.dtype)[None, :])
        return jnp.sum(all_rel * onehot, axis=-1)

    def score(self, params, z, head, tail, rel, tail_sorted=False,
              head_perm=None):
        h = _head_take(z, head, head_perm)
        t = _tail_take(z, tail, tail_sorted)
        r = take_rows_matbwd(params["rel_emb"], rel)
        return jnp.sum(h * r * t, axis=-1)

    def score_all_tails(self, params, z, head, rel):
        h = take_rows(z, head)
        r = take_rows_matbwd(params["rel_emb"], rel)
        return jnp.dot(h * r, z.T, preferred_element_type=jnp.float32)

    def score_all_heads(self, params, z, tail, rel):
        t = take_rows(z, tail)
        r = take_rows_matbwd(params["rel_emb"], rel)
        return jnp.dot(t * r, z.T, preferred_element_type=jnp.float32)


class ComplEx(_Decoder):
    """Re(<h, r, conj(t)>) with half-width complex embeddings.

    ``rel_emb[:, :d/2]`` is the real part, ``rel_emb[:, d/2:]`` the imaginary
    part, matching z's chunking (the intent of reference decoder.py:64-77).
    """

    def _chunk(self, v):
        half = self.hidden_channels // 2
        return v[..., :half], v[..., half:]

    def _combine(self, h, r, t):
        h_re, h_im = self._chunk(h)
        t_re, t_im = self._chunk(t)
        r_re, r_im = self._chunk(r)
        s = (h_re * r_re - h_im * r_im) * t_re
        s += (h_re * r_im + h_im * r_re) * t_im
        return jnp.sum(s, axis=-1)

    def score_neg_sorted(self, params, z, neg_src, neg_dst, rel,
                         dst_sorted=False):
        """Sorted-source negative scoring (see DistMult's docstring):
        ComplEx is bilinear in r — score = Σ_j G(h,t)_j · rel_emb[rel]_j
        with G = [h_re∘t_re + h_im∘t_im | h_re∘t_im − h_im∘t_re] — so the
        project-then-select and fused-kernel paths apply unchanged."""
        from ..ops.pallas import negscore

        if (not negscore.DISABLE
                and jax.default_backend() in ("tpu", "axon")
                and z.dtype == jnp.bfloat16
                and self.hidden_channels % 256 == 0  # lane-aligned halves
                and neg_src.shape[0] % negscore.BLOCK == 0
                and negscore.fits(z.shape[0], z.shape[1],
                                  self.num_relations)):
            kern = (negscore.complex_neg_scores_ds if dst_sorted
                    else negscore.complex_neg_scores)
            return kern(z, neg_src, neg_dst, rel, params["rel_emb"])

        h_re, h_im = self._chunk(take_rows_sorted(z, neg_src))
        t_re, t_im = self._chunk(take_rows(z, neg_dst))
        g = jnp.concatenate([h_re * t_re + h_im * t_im,
                             h_re * t_im - h_im * t_re], axis=-1)
        all_rel = jnp.dot(g, params["rel_emb"].T.astype(z.dtype),
                          preferred_element_type=jnp.float32)  # (K·E, R)
        onehot = (rel[:, None]
                  == jnp.arange(self.num_relations,
                                dtype=rel.dtype)[None, :])
        return jnp.sum(all_rel * onehot, axis=-1)

    def score(self, params, z, head, tail, rel, tail_sorted=False,
              head_perm=None):
        h_re, h_im = self._chunk(_head_take(z, head, head_perm))
        t_re, t_im = self._chunk(_tail_take(z, tail, tail_sorted))
        r_re, r_im = self._chunk(take_rows_matbwd(params["rel_emb"], rel))
        s = (h_re * r_re - h_im * r_im) * t_re
        s += (h_re * r_im + h_im * r_re) * t_im
        return jnp.sum(s, axis=-1)

    def score_all_tails(self, params, z, head, rel):
        h_re, h_im = self._chunk(take_rows(z, head))
        r_re, r_im = self._chunk(take_rows_matbwd(params["rel_emb"], rel))
        z_re, z_im = self._chunk(z)
        a = h_re * r_re - h_im * r_im                   # (E, d/2)
        b = h_re * r_im + h_im * r_re
        return (jnp.dot(a, z_re.T, preferred_element_type=jnp.float32)
                + jnp.dot(b, z_im.T, preferred_element_type=jnp.float32))

    def score_all_heads(self, params, z, tail, rel):
        t_re, t_im = self._chunk(take_rows(z, tail))
        r_re, r_im = self._chunk(take_rows_matbwd(params["rel_emb"], rel))
        z_re, z_im = self._chunk(z)
        # Re(<h, r, conj(t)>) grouped by h components:
        a = t_re * r_re + t_im * r_im                   # coeff of h_re
        b = t_im * r_re - t_re * r_im                   # coeff of h_im
        return (jnp.dot(a, z_re.T, preferred_element_type=jnp.float32)
                + jnp.dot(b, z_im.T, preferred_element_type=jnp.float32))


class RotatE(_Decoder):
    """gamma - || h ∘ e^{iθ_r} - t ||_2 over half-width complex pairs.

    Not in the reference repo; required by its benchmark suite
    (BASELINE.json config "RGCN/GAT encoder + RotatE decoder").
    """

    def __init__(self, num_relations: int, hidden_channels: int,
                 gamma: float = 12.0):
        super().__init__(num_relations, hidden_channels)
        self.gamma = gamma

    def init(self, rng) -> dict:
        half = self.hidden_channels // 2
        phases = jax.random.uniform(rng, (self.num_relations, half),
                                    minval=-math.pi, maxval=math.pi)
        return {"rel_emb": phases}

    def _chunk(self, v):
        half = self.hidden_channels // 2
        return v[..., :half], v[..., half:]

    def _combine(self, h, r, t):
        h_re, h_im = self._chunk(h)
        t_re, t_im = self._chunk(t)
        c, s = jnp.cos(r), jnp.sin(r)
        rot_re = h_re * c - h_im * s
        rot_im = h_re * s + h_im * c
        dist = jnp.sqrt(jnp.maximum(
            (rot_re - t_re) ** 2 + (rot_im - t_im) ** 2, 1e-12))
        return self.gamma - jnp.sum(dist, axis=-1)

    def _rotated(self, params, z, head, rel, head_perm=None):
        h_re, h_im = self._chunk(_head_take(z, head, head_perm))
        theta = take_rows_matbwd(params["rel_emb"], rel)
        c, s = jnp.cos(theta), jnp.sin(theta)
        return h_re * c - h_im * s, h_re * s + h_im * c

    def score_neg_sorted(self, params, z, neg_src, neg_dst, rel,
                         dst_sorted=False):
        """Sorted-source negatives (see TransE.score_neg_sorted): the
        fused kernel's "rotate" distance mode computes sin/cos of the
        slot's phase rows in-kernel; γ is a gradient-free constant added
        outside."""
        from ..ops.pallas import negscore

        if (not negscore.DISABLE
                and jax.default_backend() in ("tpu", "axon")
                and z.dtype == jnp.bfloat16
                and self.hidden_channels % 256 == 0  # lane-aligned halves
                and neg_src.shape[0] % negscore.BLOCK == 0
                and negscore.fits(z.shape[0], z.shape[1],
                                  self.num_relations)):
            kern = (negscore.rotate_neg_scores_ds if dst_sorted
                    else negscore.rotate_neg_scores)
            raw = kern(z, neg_src, neg_dst, rel, params["rel_emb"])
            return self.gamma + raw

        h_re, h_im = self._chunk(take_rows_sorted(z, neg_src))
        theta = take_rows_matbwd(params["rel_emb"], rel).astype(z.dtype)
        c, sn = jnp.cos(theta), jnp.sin(theta)
        rot_re = h_re * c - h_im * sn
        rot_im = h_re * sn + h_im * c
        t_re, t_im = self._chunk(take_rows(z, neg_dst))
        dist = jnp.sqrt(jnp.maximum(
            (rot_re - t_re) ** 2 + (rot_im - t_im) ** 2, 1e-12))
        return (self.gamma - jnp.sum(dist, axis=-1)).astype(jnp.float32)

    def score(self, params, z, head, tail, rel, tail_sorted=False,
              head_perm=None):
        rot_re, rot_im = self._rotated(params, z, head, rel, head_perm)
        t_re, t_im = self._chunk(_tail_take(z, tail, tail_sorted))
        dist = jnp.sqrt(jnp.maximum(
            (rot_re - t_re) ** 2 + (rot_im - t_im) ** 2, 1e-12))
        return self.gamma - jnp.sum(dist, axis=-1)

    def score_all_tails(self, params, z, head, rel):
        rot_re, rot_im = self._rotated(params, z, head, rel)
        z_re, z_im = self._chunk(z)
        d_re = rot_re[:, None, :] - z_re[None, :, :]
        d_im = rot_im[:, None, :] - z_im[None, :, :]
        dist = jnp.sqrt(jnp.maximum(d_re ** 2 + d_im ** 2, 1e-12))
        return self.gamma - jnp.sum(dist, axis=-1)

    def score_all_heads(self, params, z, tail, rel):
        # |h∘r - t| = |h - t∘conj(r)| (rotation is an isometry), so rotate
        # the tail backwards and compare against all candidate heads.
        t_re, t_im = self._chunk(take_rows(z, tail))
        theta = take_rows_matbwd(params["rel_emb"], rel)
        c, s = jnp.cos(theta), jnp.sin(theta)
        bt_re = t_re * c + t_im * s
        bt_im = -t_re * s + t_im * c
        z_re, z_im = self._chunk(z)
        d_re = bt_re[:, None, :] - z_re[None, :, :]
        d_im = bt_im[:, None, :] - z_im[None, :, :]
        dist = jnp.sqrt(jnp.maximum(d_re ** 2 + d_im ** 2, 1e-12))
        return self.gamma - jnp.sum(dist, axis=-1)
