"""GCL training modules: DGI / GRACE / GGD with in-framework contrastive
losses (no PyGCL dependency).

Behavioral parity with /root/reference/biomedkg/gcl_module.py:17-234:

  * BaseGCL: fusion → model → loss; Adam + warmup schedule shared with KGE
  * DGIModule: SingleBranchContrast(JSD, mode="G2L") over (z, summary, zn)
    — the JSD estimator is implemented directly (softplus form)
  * GRACEModule: DualBranchContrast(InfoNCE(tau=0.2), mode="L2L",
    intraview_negs=True) over projected two-view embeddings, cosine
    similarity, symmetrized
  * GGDModule: BCE-with-logits over summed pos/neg projections

All losses are masked over padding nodes so one compiled step serves every
padded batch.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.encoders import GCNEncoder
from ..models.factory import FusionFactory
from ..models.gcl import DGI, GGD, GRACE
from .checkpoint import load_checkpoint
from .optim import make_optimizer
from .stepping import JittedStepsMixin, TrainState  # noqa: F401

_LOG2 = math.log(2.0)


def _masked_mean(values, mask):
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def jsd_g2l_loss(z, g, zn, node_mask):
    """PyGCL SingleBranchContrast(JSD, 'G2L') for the DGI triple
    (gcl_module.py:127,140-143): each real node vs the graph summary."""
    d_pos = jnp.squeeze(z @ g.T, -1).astype(jnp.float32)
    d_neg = jnp.squeeze(zn @ g.T, -1).astype(jnp.float32)
    e_pos = _masked_mean(_LOG2 - jax.nn.softplus(-d_pos), node_mask)
    e_neg = _masked_mean(jax.nn.softplus(-d_neg) + d_neg - _LOG2, node_mask)
    return e_neg - e_pos


def _l2_normalize(h):
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True),
                           1e-12)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_pos_denom(an, bn, col, block: int, tau: float):
    """Per-row (pos, denom) of the L2L-intraview InfoNCE in (block, N)
    tiles with a FLASH-STYLE custom VJP: the forward saves only the
    (N,) pos/denom vectors; the backward recomputes each tile's
    similarity rows and folds the softmax cotangents into four MXU
    matmuls per tile. Without this, autodiff through the scan spills
    the f32 softmax residuals — 2 × (N, N) per direction, ~630 MB of
    HBM write+read at the 6.3k-node production batch — which dominated
    the GRACE step (PERF.md GCL pass). ``an``/``bn`` are L2-normalized
    rows; ``col`` is the f32 additive padding mask (0 / finfo.min),
    mask-derived and non-differentiable."""
    pos, denom = _flash_fwd(an, bn, col, block, tau)
    return pos, denom


def _flash_fwd(an, bn, col, block: int, tau: float):
    n = an.shape[0]
    neg = jnp.finfo(jnp.float32).min
    a_tiles = an.reshape(n // block, block, an.shape[1])
    idx = jnp.arange(n, dtype=jnp.int32).reshape(n // block, block)
    cols = jnp.arange(n, dtype=jnp.int32)

    def tile(_, inp):
        ab, ib = inp
        inter = ((ab @ bn.T) / tau).astype(jnp.float32) + col[None, :]
        intra = ((ab @ an.T) / tau).astype(jnp.float32)
        eye = ib[:, None] == cols[None, :]
        intra = jnp.where(eye, neg, intra + col[None, :])
        pos = jnp.sum(jnp.where(eye, inter, 0.0), axis=1)
        denom = jnp.logaddexp(
            jax.scipy.special.logsumexp(inter, axis=1),
            jax.scipy.special.logsumexp(intra, axis=1))
        return None, (pos, denom)

    _, (pos, denom) = jax.lax.scan(tile, None, (a_tiles, idx))
    return pos.reshape(-1), denom.reshape(-1)


def _flash_vjp_fwd(an, bn, col, block: int, tau: float):
    pos, denom = _flash_fwd(an, bn, col, block, tau)
    return (pos, denom), (an, bn, col, denom)


def _flash_vjp_bwd(block: int, tau: float, res, cts):
    an, bn, col, denom = res
    g_pos, g_denom = cts
    n, d = an.shape
    neg = jnp.finfo(jnp.float32).min
    cols = jnp.arange(n, dtype=jnp.int32)
    tiles = (an.reshape(n // block, block, d),
             jnp.arange(n, dtype=jnp.int32).reshape(n // block, block),
             g_pos.reshape(n // block, block),
             g_denom.reshape(n // block, block),
             denom.reshape(n // block, block))

    def tile(carry, inp):
        d_an_cols, d_bn_cols = carry
        ab, ib, gp, gd, dnm = inp
        # recompute this tile's logits exactly as the forward did
        inter = ((ab @ bn.T) / tau).astype(jnp.float32) + col[None, :]
        intra = ((ab @ an.T) / tau).astype(jnp.float32)
        eye = ib[:, None] == cols[None, :]
        intra = jnp.where(eye, neg, intra + col[None, :])
        # softmax cotangents: d denom/d logit = softmax weight; the pos
        # cotangent lands on the inter diagonal
        gi = (gd[:, None] * jnp.exp(inter - dnm[:, None])
              + jnp.where(eye, gp[:, None], 0.0)).astype(an.dtype)
        gt = (gd[:, None] * jnp.exp(intra - dnm[:, None])).astype(an.dtype)
        d_ab = (gi @ bn + gt @ an) / tau
        d_bn_cols += (gi.T @ ab).astype(jnp.float32) / tau
        d_an_cols += (gt.T @ ab).astype(jnp.float32) / tau
        return (d_an_cols, d_bn_cols), d_ab

    zero = jnp.zeros((n, d), jnp.float32)
    (d_an_cols, d_bn_cols), d_ab = jax.lax.scan(tile, (zero, zero), tiles)
    d_an = (d_ab.reshape(n, d).astype(jnp.float32) + d_an_cols)
    return (d_an.astype(an.dtype), d_bn_cols.astype(bn.dtype),
            jnp.zeros_like(col))


_flash_pos_denom.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def infonce_intraview_loss(h1, h2, node_mask, tau: float = 0.2,
                           block: int = 0):
    """PyGCL DualBranchContrast(InfoNCE(tau), 'L2L', intraview_negs=True)
    (gcl_module.py:171-173): cosine similarities, positives on the
    inter-view diagonal, negatives = all inter-view + non-diagonal
    intra-view pairs; symmetrized over the two directions.

    ``block > 0`` (and dividing N) streams the similarity rows in
    (block, N) tiles through a lax.scan — flash-style: the two (N, N)
    inter/intra matrices (157 MB each at the 6.3k-node production batch,
    round-2 VERDICT #4) are never materialized in HBM, in the backward
    either (the custom VJP recomputes tiles; see _flash_pos_denom).
    Numerics match the dense form to f32 round-off (logsumexp in f32
    regardless of input dtype)."""

    def direction_dense(a, b):
        an, bn = _l2_normalize(a), _l2_normalize(b)
        inter = ((an @ bn.T) / tau).astype(jnp.float32)
        intra = ((an @ an.T) / tau).astype(jnp.float32)
        neg = jnp.finfo(jnp.float32).min
        col = jnp.where(node_mask[None, :], 0.0, neg)
        inter = inter + col
        eye = jnp.eye(inter.shape[0], dtype=bool)
        intra = jnp.where(eye, neg, intra + col)
        pos = jnp.diagonal(inter)
        denom = jnp.logaddexp(
            jax.scipy.special.logsumexp(inter, axis=1),
            jax.scipy.special.logsumexp(intra, axis=1))
        return _masked_mean(-(pos - denom), node_mask)

    def direction_blocked(a, b):
        an, bn = _l2_normalize(a), _l2_normalize(b)
        neg = jnp.finfo(jnp.float32).min
        col = jnp.where(node_mask, 0.0, neg).astype(jnp.float32)
        import os

        from ..ops.pallas import flashnce

        if ((flashnce._FORCE_KERNEL
             or (jax.default_backend() in ("tpu", "axon")
                 and os.environ.get("BIOMEDKG_FLASHNCE", "").lower()
                 not in ("", "0", "false")))
                and flashnce.fits(an.shape[0], an.shape[1], block)):
            # fully-fused tile pipeline: only the (N,) denominators and
            # (block, d) operand tiles touch HBM (ops/pallas/flashnce.py).
            # OPT-IN (BIOMEDKG_FLASHNCE=1): chip-measured 2026-08-19 the
            # kernels LOSE to the XLA flash-VJP path below — GRACE bf16
            # 7.95 vs 7.41 ms/step at the best VMEM-feasible block (448;
            # 224 → 9.10, 896 needs ~22 MB > VMEM) — because XLA already
            # fuses the streamed (block, N) tile pipeline well and the
            # Pallas grid revisits operand tiles nt× per pass (PERF.md
            # round-4 "flash-NCE decision"). Kept for parity tests and
            # future hardware where the VMEM budget admits larger blocks.
            # The positive term is the inter diagonal — a rowwise dot.
            pos = (jnp.sum(an * bn, axis=1) / tau).astype(jnp.float32) \
                + col
            denom = flashnce.flash_denom(an, bn, col, block, tau)
        else:
            pos, denom = _flash_pos_denom(an, bn, col, block, tau)
        return _masked_mean(-(pos - denom), node_mask)

    direction = (direction_blocked
                 if block and h1.shape[0] % block == 0 else direction_dense)
    return 0.5 * (direction(h1, h2) + direction(h2, h1))


def ggd_bce_loss(pos_h, neg_h, node_mask):
    """BCE over summed projections (gcl_module.py:229-234), masked."""
    pred = jnp.concatenate([pos_h, neg_h]).astype(jnp.float32)
    gt = jnp.concatenate([jnp.ones_like(pos_h), jnp.zeros_like(neg_h)])
    w = jnp.concatenate([node_mask, node_mask]).astype(pred.dtype)
    log_p = jax.nn.log_sigmoid(pred)
    log_np = jax.nn.log_sigmoid(-pred)
    loss = -(gt * log_p + (1 - gt) * log_np)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


class BaseGCL(JittedStepsMixin):
    kind = "gcl"
    model_name = "base"

    def __init__(self, in_dim: int, hidden_dim: int, out_dim: int,
                 num_hidden_layers: int, scheduler_type: str = "cosine",
                 learning_rate: float = 2e-4, warm_up_ratio: float = 0.03,
                 fuse_method: Optional[str] = None, seed: int = 42,
                 compute_dtype: str = "float32"):
        self.hparams = dict(
            in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
            num_hidden_layers=num_hidden_layers,
            scheduler_type=scheduler_type, learning_rate=learning_rate,
            warm_up_ratio=warm_up_ratio, fuse_method=fuse_method, seed=seed,
            compute_dtype=compute_dtype)
        # bf16 encoder/similarity compute (MXU-native) with f32 master
        # weights and f32 logsumexp/means; "float32" = full precision.
        self.compute_dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                              else jnp.float32)
        self.encoder = GCNEncoder(in_dim=in_dim, hidden_dim=hidden_dim,
                                  out_dim=out_dim,
                                  num_hidden_layers=num_hidden_layers)
        self.model = self._build_model()
        self.modality_transform = FusionFactory.create_fuser(
            method=fuse_method, embed_dim=in_dim)
        self.lr = learning_rate
        self.scheduler_type = scheduler_type
        self.warm_up_ratio = warm_up_ratio
        self.seed = seed
        self.tx: Optional[optax.GradientTransformation] = None
        self._jit_cache: Dict[str, Any] = {}

    @property
    def edge_layout(self) -> str:
        return self.encoder.edge_layout

    @edge_layout.setter
    def edge_layout(self, value: str):
        """"dst" (destination-sorted batches → Pallas sorted-segment
        aggregation) or "relation"; must match the loaders'."""
        assert value in ("relation", "dst"), value
        self.encoder.edge_layout = value
        self._jit_cache.clear()

    def _build_model(self):  # pragma: no cover - overridden
        raise NotImplementedError

    def init(self, rng) -> dict:
        r1, r2 = jax.random.split(rng)
        params = {"model": self.model.init(r1)}
        if self.modality_transform is not None:
            params["fusion"] = self.modality_transform.init(r2)
        return params

    def configure_optimizers(self, num_training_steps: int,
                             grad_clip: float = 1.0):
        self.tx = make_optimizer(self.lr, self.scheduler_type,
                                 num_training_steps, self.warm_up_ratio,
                                 grad_clip)
        self._jit_cache.clear()

    def fusion_fn(self, params, x, rng=None, training=False):
        """Reference gcl_module.py:43-50."""
        if self.modality_transform is not None:
            return self.modality_transform.apply(params["fusion"], x,
                                                 rng=rng, training=training)
        if x.ndim == 3:
            return jnp.mean(x, axis=1)
        return x

    def calculate_loss(self, params, x, batch, rng, training):
        raise NotImplementedError

    def _forward_loss(self, params, batch, rng, training: bool):
        batch = self._widen(batch)
        r_fuse, r_model = jax.random.split(rng)
        x = self.fusion_fn(params, self._batch_features(batch),
                           rng=r_fuse, training=training)
        if self.compute_dtype == jnp.bfloat16:
            from ..common import tree_cast

            params = dict(params,
                          model=tree_cast(params["model"], jnp.bfloat16))
            x = x.astype(jnp.bfloat16)
        loss = self.calculate_loss(params, x, batch, r_model, training)
        return loss, {"loss": loss}

    def eval_epoch(self, outputs, split: str) -> Dict[str, float]:
        losses = [float(a["loss"]) for a in outputs]
        return {f"{split}_loss": float(np.mean(losses)) if losses else 0.0}

    def encode(self, params, batch):
        """Reference BaseGCL.forward (gcl_module.py:56-59): fused features
        through the clean encoder — used for embedding export. Jitted
        once via _jit_cache (a per-call @jax.jit closure would retrace
        the full-graph forward on every export call)."""
        fwd = self._jit_cache.get("encode")
        if fwd is None:
            @jax.jit
            def fwd(p, b):
                b = self._widen(b)
                x = self.fusion_fn(p, self._batch_features(b),
                                   training=False)
                return self.encoder.apply(p["model"]["encoder"], x,
                                          b.edge_index, b.edge_mask,
                                          training=False)
            self._jit_cache["encode"] = fwd

        return fwd(params, batch)


class DGIModule(BaseGCL):
    model_name = "dgi"

    def _build_model(self):
        return DGI(encoder=self.encoder,
                   hidden_dim=self.hparams["hidden_dim"])

    def calculate_loss(self, params, x, batch, rng, training):
        z, g, zn = self.model.apply(params["model"], x, batch.edge_index,
                                    batch.edge_mask, batch.node_mask,
                                    rng=rng, training=training)
        return jsd_g2l_loss(z, g, zn, batch.node_mask)


class GRACEModule(BaseGCL):
    model_name = "grace"

    def _build_model(self):
        return GRACE(encoder=self.encoder,
                     hidden_dim=self.hparams["hidden_dim"],
                     proj_dim=self.hparams["hidden_dim"])

    def calculate_loss(self, params, x, batch, rng, training):
        _, z1, z2 = self.model.apply(params["model"], x, batch.edge_index,
                                     batch.edge_mask, batch.node_mask,
                                     rng=rng, training=training)
        h1 = self.model.project(params["model"], z1)
        h2 = self.model.project(params["model"], z2)
        n = h1.shape[0]
        # largest sublane-aligned divisor ≤ 1024: small tiles multiply
        # lax.scan step overhead (6272 = 2⁷·7² picked 128 → 49 steps ×
        # 2 directions; 896 → 7 steps). Prefer a divisor the fused
        # Pallas pipeline accepts (ops/pallas/flashnce.fits) so e.g. an
        # N divisible by 1024 doesn't overflow the tile VMEM budget and
        # silently fall back to the XLA flash path.
        block = 0
        if n >= 2048:
            from ..ops.pallas.flashnce import fits

            d = h1.shape[1]
            kern = [b for b in range(16, 1025, 8)
                    if n % b == 0 and fits(n, d, b)]
            block = max(kern) if kern else max(
                (b for b in range(8, 1025, 8) if n % b == 0), default=0)
        return infonce_intraview_loss(h1, h2, batch.node_mask, block=block)


class GGDModule(BaseGCL):
    model_name = "ggd"

    def _build_model(self):
        return GGD(encoder=self.encoder,
                   hidden_dim=self.hparams["hidden_dim"],
                   n_proj=1, aug_p=0.5)

    def calculate_loss(self, params, x, batch, rng, training):
        pos_h, neg_h = self.model.apply(params["model"], x,
                                        batch.edge_index, batch.edge_mask,
                                        batch.node_mask, rng=rng,
                                        training=training)
        return ggd_bce_loss(pos_h, neg_h, batch.node_mask)


_GCL_CLASSES = {"dgi": DGIModule, "grace": GRACEModule, "ggd": GGDModule}


def create_gcl_model(cfg, seed: int = 42) -> BaseGCL:
    """Reference train_gcl.py:15-38. ``seed`` must be forwarded from the
    run config — the Trainer derives every init/train/eval PRNGKey from
    ``model.seed``, so omitting it made all GCL seed sweeps train with
    identical parameters and rng streams."""
    cls = _GCL_CLASSES.get(cfg.model_name)
    if cls is None:
        raise NotImplementedError(cfg.model_name)
    return cls(in_dim=cfg.in_dim, hidden_dim=cfg.hidden_dim,
               out_dim=cfg.out_dim,
               num_hidden_layers=cfg.num_hidden_layers,
               scheduler_type=cfg.scheduler_type,
               learning_rate=cfg.learning_rate,
               warm_up_ratio=cfg.warm_up_ratio,
               fuse_method=cfg.fuse_method, seed=seed,
               compute_dtype=cfg.get("compute_dtype", "float32"))


def load_gcl_module(ckpt_path: str):
    """GCL ``load_from_checkpoint`` analog (reference node.py:204-211)."""
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["kind"] == "gcl", f"not a GCL checkpoint: {ckpt_path}"
    cls = _GCL_CLASSES[ckpt["extras"]["model_name"]]
    module = cls(**ckpt["hparams"])
    return module, ckpt["params"]
