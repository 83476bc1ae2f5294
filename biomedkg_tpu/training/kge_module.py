"""KGE training module: fusion → GNN encode → negative sampling → decode →
masked BCE + L2 regularization, with bootstrapped AUROC/AP/F1 and
per-relation precision.

Behavioral parity with /root/reference/biomedkg/kge_module.py:18-248,
re-designed as pure jitted functions over a TrainState:

  * negative sampling runs **on device** inside the jitted step
    (jax.random uniform corruption, rejection-free — PyG's
    ``negative_sampling`` excludes observed pairs; at PrimeKG sparsity the
    collision probability is ~E/N² < 1e-3, quantified in tests) and the
    decoder scores fuse with it in one XLA program
  * negative edge types are shuffled repeats of the batch's types when
    neg_ratio is set, unshuffled otherwise (kge_module.py:86-102)
  * loss = BCE-with-logits + 1e-2·(mean z² + mean rel_emb²)
    (kge_module.py:127-129), masked over padding edges/nodes
  * ``fix_edge_id`` pins every (real) edge's relation — the DPI transfer
    path (kge_module.py:242-248, train_dpi.py:33-35); the relation-block
    metadata is pinned too so the Pallas grouped-GEMM stays consistent
  * the reference's Adam covers only ``self.model.parameters()``
    (kge_module.py:211) leaving fusion params frozen at init; here all
    parameters train (the intended behavior — documented deviation)
"""

from __future__ import annotations

import math

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import nn
from ..models.factory import FusionFactory, KGEModelFactory
from .checkpoint import load_checkpoint
from .metrics import (BootstrappedBinaryMetrics, EdgeWisePrecision,
                      HistogramBinaryMetrics)
from .optim import make_optimizer
from .stepping import JittedStepsMixin, TrainState  # noqa: F401 (re-export)


def _mix_factor(e: int, bound: Optional[int] = None) -> int:
    """Largest divisor of ``e`` that is ≤ bound (default √e) — the stride
    of the transpose permutation decorrelating relation runs from the
    sorted source sample (see _forward_loss)."""
    if bound is None:
        bound = int(math.isqrt(e))
    best = 1
    for d in range(1, bound + 1):
        if e % d == 0:
            best = d
    if best == 1 and e > 4:
        import warnings

        warnings.warn(
            f"edge budget {e} has no divisor in [2, {bound}]: the "
            "stride-transpose negative pairing degrades to identity, "
            "re-coupling relation runs with narrow source bands (slower "
            "convergence — see _forward_loss). Pad the edge budget to a "
            "composite size.", stacklevel=2)
    return best


def _sorted_uniform_sample(rng, ke: int, num_real_nodes):
    """(ke,) SORTED uniform node draw via the exponential-spacing
    construction (no device sort)."""
    gaps = -jnp.log(jax.random.uniform(rng, (ke + 1,), minval=1e-12))
    cum = jnp.cumsum(gaps)
    # clamp: the last ratios round to exactly 1.0f whenever the final
    # exponential gap < cum[-1]·2⁻²⁵ (~1.5% of steps at ke≈5e5), which
    # would emit the invalid id num_real_nodes (the pad row)
    return jnp.minimum((cum[:-1] / cum[-1] * num_real_nodes)
                       .astype(jnp.int32), num_real_nodes - 1)


def sample_negatives_sorted(r_src, r_dst, r_off, ratio: int,
                            num_edges: int, num_real_nodes,
                            dual: bool = False):
    """Stratified-sorted negative sampling (see _forward_loss for the
    semantics argument). Returns (neg_src sorted (K·E,), neg_dst
    (K·E,), off (K,)) where slot (k, e) of the flat layout pairs with
    batch edge (e + off[k]) mod E.

    ``dual=False`` ("sorted"): neg_dst iid uniform. ``dual=True``
    ("sorted2"): neg_dst is built PER KERNEL CHUNK as iid uniform draws
    inside a randomly-placed narrow band — slot j of chunk c gets
    floor(N · frac(δ_c + U_{c,j}/nc)). Each slot's dst marginal is a
    uniform mixture over the band placement δ_c = exactly uniform, the
    pairing within a band is fully iid, and independence from the src
    value holds because the draws are independent. The payoff: nd spans
    ≤ 1/nc of the id range within every kernel chunk (except ~1
    expected wrapped band per step), so BOTH endpoint gathers and BOTH
    grad scatters ride the narrow windowed one-hot Pallas path
    (ops/pallas/negscore.py `_ds` kernels) — zero (K·E, d) HBM traffic
    in the negative path."""
    ke = ratio * num_edges
    neg_src = _sorted_uniform_sample(r_src, ke, num_real_nodes)
    if dual:
        from ..ops.pallas.negscore import BLOCK as _B

        r_d1, r_d2 = jax.random.split(r_dst)
        # Per kernel chunk: iid uniform draws INSIDE a randomly-placed
        # narrow band — v = frac(δ_c + U/nc). The `_ds` kernels' window
        # sweep needs only a NARROW SPAN per chunk (the one-hot match
        # handles arbitrary order and duplicates; full-range per-chunk
        # draws measured +7 ms/step from full-table sweeps). Mixing over
        # δ_c ~ U[0,1) makes every slot's marginal exactly uniform, and
        # within a band the pairing is fully iid — the step's (src, dst)
        # support is K·E/B independent 2-D band patches, NOT the 1-D
        # monotone curves that a rolled global sorted draw produces (the
        # round-2 lattice sampler's measured failure mode; a rolled
        # variant of this sampler still cost ~0.003 AUROC at the
        # convergence A/B). All elementwise — a per-row roll/
        # take_along_axis gather measured +12 ms/step (the known
        # small-int-gather scalar-path pitfall). Expected wrapped bands
        # per step: nc·(1/nc) = 1 (same full-span sweep cost as one
        # rolled wrap).
        nc = ke // _B if ke % _B == 0 else 1
        u = jax.random.uniform(r_d1, (nc, ke // nc))
        delta = jax.random.uniform(r_d2, (nc, 1))
        v = jnp.mod(delta + u / nc, 1.0)
        neg_dst = jnp.minimum((v * num_real_nodes).astype(jnp.int32),
                              num_real_nodes - 1).reshape(-1)
    else:
        neg_dst = (jax.random.uniform(r_dst, (ke,))
                   * num_real_nodes).astype(jnp.int32)
    off = jax.random.randint(r_off, (ratio,), 0, num_edges)
    return neg_src, neg_dst, off


def _parse_neg_ratio(neg_ratio) -> Optional[int]:
    """Handle the reference's ``neg_ratio: none`` YAML-string quirk
    (configs/dpi.yaml:14)."""
    if neg_ratio is None:
        return None
    if isinstance(neg_ratio, str):
        return None if neg_ratio.lower() in ("none", "null", "") \
            else int(neg_ratio)
    return int(neg_ratio) or None


class KGEModule(JittedStepsMixin):
    kind = "kge"

    def __init__(self, encoder_name: str, decoder_name: str, in_dim: int,
                 hidden_dim: int, out_dim: int, num_hidden_layers: int,
                 num_relation: int, num_heads: int, scheduler_type: str,
                 learning_rate: float, warm_up_ratio: float,
                 fuse_method: str, neg_ratio, node_init_method: str,
                 seed: int = 42, compute_dtype: str = "float32",
                 remat: bool = False, neg_sampler: str = "sorted",
                 cold_start_dropout: float = 0.0):
        self.hparams = dict(
            encoder_name=encoder_name, decoder_name=decoder_name,
            in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
            num_hidden_layers=num_hidden_layers, num_relation=num_relation,
            num_heads=num_heads, scheduler_type=scheduler_type,
            learning_rate=learning_rate, warm_up_ratio=warm_up_ratio,
            fuse_method=fuse_method, neg_ratio=neg_ratio,
            node_init_method=node_init_method, seed=seed,
            compute_dtype=compute_dtype, remat=remat,
            neg_sampler=neg_sampler, cold_start_dropout=cold_start_dropout)
        # Cold-start augmentation (unseen-node protocol, data/inductive.py):
        # per training step, each node is isolated in the ENCODER with this
        # probability — its incident edges are masked out of aggregation
        # while its supervision edges still score — so W_root·x must carry
        # the signal and attribute-derived features transfer to nodes with
        # no training edges. Without it the encoder can ignore features
        # entirely (neighborhoods suffice transductively) and cold-start
        # AUROC sits at chance; quantified in tests/test_inductive.py.
        self.cold_start_dropout = float(cold_start_dropout or 0.0)
        # bf16 encoder compute (MXU-native) with f32 master weights and
        # f32 decoding/loss; "float32" = full precision.
        self.compute_dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                              else jnp.float32)

        self.modality_transform = (
            FusionFactory.create_fuser(method=fuse_method, embed_dim=in_dim)
            if node_init_method == "lm" else None)
        self.model = KGEModelFactory.get_model(
            encoder_name=encoder_name, decoder_name=decoder_name,
            in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
            num_hidden_layers=num_hidden_layers, num_relation=num_relation,
            num_heads=num_heads)
        self.model.encoder.remat = bool(remat)

        self.lr = learning_rate
        self.scheduler_type = scheduler_type
        self.warm_up_ratio = warm_up_ratio
        self.neg_ratio = _parse_neg_ratio(neg_ratio)
        self.seed = seed
        self._fix_edge_id: Optional[int] = None
        self._filter_negatives = False
        # "sorted": stratified-sorted negative sources (training only;
        # Pallas fast path, exactly-uniform marginals — see _forward_loss).
        # "sorted2": BOTH endpoints sorted draws (random cyclic pairing) —
        # the fully-VMEM `_ds` kernel path, zero (K·E, d) HBM traffic.
        # "iid": plain iid corruption = the reference's PyG
        # negative_sampling semantics (kge_module.py:86-102). Config
        # surface: ``model.neg_sampler`` (configs/model/kge.yaml).
        assert neg_sampler in ("sorted", "sorted2", "iid"), neg_sampler
        self._neg_sampler = neg_sampler
        self._edge_index_map: Dict[int, str] = {}

        self.valid_metrics = BootstrappedBinaryMetrics(prefix="val_")
        self.test_metrics = BootstrappedBinaryMetrics(prefix="test_")
        self.tx: Optional[optax.GradientTransformation] = None
        self._jit_cache: Dict[str, Any] = {}
        # "histogram": eval batches reduce ON DEVICE to psum-able histogram
        # + count states (multi-host-safe, ~1000× less D2H); "exact": host
        # concatenation + subsampled bootstrap (torchmetrics-exact values).
        self._eval_impl = "histogram"

    @property
    def eval_impl(self) -> str:
        return self._eval_impl

    @eval_impl.setter
    def eval_impl(self, value: str):
        assert value in ("histogram", "exact"), value
        self._eval_impl = value
        self._jit_cache.clear()  # eval step closes over the reduction

    # -- reference property surface -----------------------------------------

    @property
    def edge_mapping(self):
        return self._edge_index_map

    @edge_mapping.setter
    def edge_mapping(self, mapping: Dict[int, str]):
        self._edge_index_map = mapping
        self.edge_wise_pre_valid = EdgeWisePrecision(class_mapping=mapping)
        self.edge_wise_pre_test = EdgeWisePrecision(class_mapping=mapping)

    @property
    def fix_edge_id(self):
        return self._fix_edge_id

    @fix_edge_id.setter
    def fix_edge_id(self, edge_id: int):
        self._fix_edge_id = edge_id
        self._jit_cache.clear()  # step functions close over the fixed id

    @property
    def edge_layout(self) -> str:
        return getattr(self.model.encoder, "edge_layout", "relation")

    @edge_layout.setter
    def edge_layout(self, value: str):
        """Batch edge ordering: "relation" (single-relation Pallas
        grouped-GEMM blocks) or "dst" (destination-sorted → Pallas
        sorted-segment aggregation). Must match the loaders'
        ``edge_layout``."""
        assert value in ("relation", "dst"), value
        # support = the encoder's OWN __init__ defined the attribute;
        # assigning here must not create it (that would defeat this
        # guard for the next set)
        supported = hasattr(self.model.encoder, "edge_layout")
        if value == "dst" and not supported:
            raise ValueError(
                f"{type(self.model.encoder).__name__} requires "
                f"relation-blocked batches (layout='relation')")
        if supported:
            self.model.encoder.edge_layout = value
        self._jit_cache.clear()

    @property
    def dst_bwd(self) -> str:
        return getattr(self.model.encoder, "dst_bwd", "scatter")

    @dst_bwd.setter
    def dst_bwd(self, value: str):
        assert value in ("scatter", "perm", "agg"), value
        supported = hasattr(self.model.encoder, "dst_bwd")
        if value != "scatter" and not supported:
            raise ValueError(
                f"{type(self.model.encoder).__name__} has no dst-layout "
                f"backward variants (dst_bwd must stay 'scatter')")
        if supported:
            self.model.encoder.dst_bwd = value
        self._jit_cache.clear()

    @property
    def use_agg_conv(self) -> bool:  # back-compat alias
        return self.dst_bwd == "agg"

    @use_agg_conv.setter
    def use_agg_conv(self, value: bool):
        self.dst_bwd = "agg" if value else "scatter"

    @property
    def neg_sampler(self) -> str:
        return self._neg_sampler

    @neg_sampler.setter
    def neg_sampler(self, value: str):
        assert value in ("sorted", "sorted2", "iid"), value
        self._neg_sampler = value
        self._jit_cache.clear()  # the step closes over the sampler choice

    @property
    def filter_negatives(self) -> bool:
        return self._filter_negatives

    @filter_negatives.setter
    def filter_negatives(self, value: bool):
        """Observed-pair exclusion for sampled negatives (PyG
        ``negative_sampling`` semantics, reference kge_module.py:93):
        candidates colliding with a REAL batch edge are resampled for up
        to 3 rounds — the same bounded-retry approximation PyG itself
        uses. Off by default (rejection-free corruption; <0.1% collisions
        at PrimeKG sparsity, tests/test_negatives.py); turn on for the
        eval protocol where collisions deflate measured AUROC."""
        self._filter_negatives = bool(value)
        self._jit_cache.clear()

    # -- functional core ------------------------------------------------------

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
        """Reference kge_module.py:77-84."""
        if self.modality_transform is not None:
            return self.modality_transform.apply(params["fusion"], x,
                                                 rng=rng, training=training)
        if x.ndim == 3:
            return jnp.mean(x, axis=1)
        return x

    def _effective_types(self, batch):
        etype, block_rel = batch.edge_type, batch.block_rel
        if self._fix_edge_id is not None:
            etype = jnp.full_like(etype, self._fix_edge_id)
            block_rel = jnp.full_like(block_rel, self._fix_edge_id)
        return etype, block_rel

    def _forward_loss(self, params, batch, rng, training: bool):
        batch = self._widen(batch)
        r_fuse, r_enc, r_neg, r_perm, r_cold = jax.random.split(rng, 5)
        x = self.fusion_fn(params, self._batch_features(batch),
                           rng=r_fuse, training=training)
        etype, block_rel = self._effective_types(batch)

        conv_mask = batch.edge_mask
        if training and self.cold_start_dropout > 0.0:
            # isolate a random node subset in the encoder only (see
            # __init__); clip-mode 1-D takes — bool/advanced indexing
            # lowers to scalar-path fusions on TPU (PERF.md)
            keep = (jax.random.uniform(r_cold, (batch.node_mask.shape[0],))
                    >= self.cold_start_dropout).astype(jnp.float32)
            ksrc = jnp.take(keep, batch.edge_index[0], mode="clip")
            kdst = jnp.take(keep, batch.edge_index[1], mode="clip")
            conv_mask = conv_mask * (ksrc * kdst).astype(conv_mask.dtype)

        enc_params = params["model"]["encoder"]
        if self.compute_dtype == jnp.bfloat16:
            from ..common import tree_cast

            enc_params = tree_cast(enc_params, jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
        enc_kwargs = {}
        if (self.edge_layout == "dst" and batch.src_edges.size
                and self.dst_bwd != "scatter"):
            # src-keyed-backward variants via the shipped
            # (src, rel)-lexsorted copy — "perm" (take_rows_via_perm:
            # sorted-kernel gradient reduction) or "agg" (ops/aggconv.py;
            # measured dead end at the bench envelope, PERF.md). The copy
            # mirrors whatever the primary order sees: fix_edge_id
            # rewrites its relation row identically, and cold-start
            # dropout masks its edges with the same per-node keep draw.
            se = batch.src_edges.astype(jnp.int32)
            if self._fix_edge_id is not None:
                se = se.at[2].set(self._fix_edge_id)
            if training and self.cold_start_dropout > 0.0:
                k2 = (jnp.take(keep, se[0], mode="clip")
                      * jnp.take(keep, se[1], mode="clip"))
                se = se.at[3].set(se[3] * k2.astype(se.dtype))
            enc_kwargs["src_edges"] = se
            enc_kwargs["src_pos"] = batch.src_pos
        z = self.model.encoder.apply(enc_params, x, batch.edge_index, etype,
                                     conv_mask, block_rel, rng=r_enc,
                                     training=training, **enc_kwargs)
        z = z.astype(jnp.float32)

        src, dst = batch.edge_index[0], batch.edge_index[1]
        emask = batch.edge_mask
        pos_kwargs = {}
        if "src_edges" in enc_kwargs and self.dst_bwd == "perm":
            # head-grad scatter → permuted sorted reduction (decoders
            # _head_take); s2 is the copy's sorted source column
            pos_kwargs["head_perm"] = (batch.src_pos.astype(jnp.int32),
                                       enc_kwargs["src_edges"][0])
        pos_pred = self.model.decode(
            params["model"], z, src, dst, etype,
            tail_sorted=self.edge_layout == "dst", **pos_kwargs)

        # --- on-device negative sampling (kge_module.py:86-102) ---
        # Negatives are K = neg_ratio corruption sets of shape (K, E) whose
        # relation column is shared with the positives; score_neg gathers
        # the relation rows once (trace-driven optimization, PERF.md).
        # The reference shuffles the tiled edge types before pairing them
        # with sampled endpoints (kge_module.py:96-101); because (neg_src,
        # neg_dst) are iid uniform and independent of position, the shuffle
        # changes nothing distributionally and is elided (it cost a
        # 500k-element sort per step on TPU).
        ratio = self.neg_ratio or 1
        num_edges = etype.shape[0]
        num_real_nodes = jnp.maximum(
            jnp.sum(batch.node_mask.astype(jnp.int32)), 1)
        r_s, r_d = jax.random.split(r_neg)

        use_sorted = (self.neg_sampler in ("sorted", "sorted2")
                      and training
                      and not self._filter_negatives
                      and hasattr(self.model.decoder, "score_neg_sorted"))
        if use_sorted:
            # --- stratified-sorted negative sources ---------------------
            # Sources are drawn as SORTED uniforms via the exponential-
            # spacing construction (no device sort), so the z-grad scatter
            # lowers to the Pallas windowed segment-sum (ops/pallas/
            # segsum.py) instead of XLA's ~200 GB/s scatter — the round-1
            # top trace cost. Slot (k, e) pairs with edge (e + off_k) mod E
            # (fresh uniform offsets per step), so every negative's source
            # marginal is EXACTLY uniform (a mixture of all order
            # statistics of an iid sample is the sampling distribution)
            # and each edge's K negatives stratify across K node bands —
            # unbiased with lower variance than iid corruption. Reference
            # semantics preserved: shuffled-repeat relation multiset with
            # uniform endpoints (kge_module.py:86-102); quantified in
            # tests/test_negatives.py.
            dual = self.neg_sampler == "sorted2"
            neg_src, neg_dst, off = sample_negatives_sorted(
                r_s, r_d, r_perm, ratio, num_edges, num_real_nodes,
                dual=dual)
            # Slot (k, s) pairs with edge σ((s + off_k) mod E) where σ is a
            # fixed stride-transpose permutation. The random cyclic shift
            # makes every edge's K negatives stratified-uniform across K
            # node bands; the transpose matters because batch edges are
            # RELATION-SORTED — without it a relation's (contiguous) edge
            # run would pair with a narrow band of the sorted source
            # sample every step, starving it of negative diversity
            # (observed: visibly slower convergence). Both maps are
            # realized as dynamic slices + reshapes — small-int GATHERS
            # (jnp.take / [] indexing) lower to multi-ms scalar-path
            # fusions on this backend (PERF.md trace).
            a_dim = _mix_factor(num_edges)

            def _rolled(v):
                dbl = jnp.concatenate([v, v])
                return jnp.stack([
                    jax.lax.dynamic_slice(dbl, (off[k],), (num_edges,))
                    .reshape(a_dim, num_edges // a_dim).T.reshape(-1)
                    for k in range(ratio)]).reshape(-1)

            rel_slots = _rolled(etype)
            z_neg = (z.astype(jnp.bfloat16)
                     if self.compute_dtype == jnp.bfloat16 else z)
            neg_pred = self.model.decoder.score_neg_sorted(
                params["model"]["decoder"], z_neg, neg_src, neg_dst,
                rel_slots, dst_sorted=dual)
            neg_mask = _rolled(emask)
            pred = jnp.concatenate([pos_pred, neg_pred])
            gt = jnp.concatenate([jnp.ones_like(pos_pred),
                                  jnp.zeros_like(neg_pred)])
            weights = jnp.concatenate([emask, neg_mask]).astype(pred.dtype)
            return self._finish_loss(params, batch, z, pred, gt, weights,
                                     pos_pred, etype, emask)

        neg_src = (jax.random.uniform(r_s, (ratio, num_edges))
                   * num_real_nodes).astype(jnp.int32)
        neg_dst = (jax.random.uniform(r_d, (ratio, num_edges))
                   * num_real_nodes).astype(jnp.int32)
        if self._filter_negatives:
            # observed-pair exclusion (PyG negative_sampling,
            # kge_module.py:93): reject candidates matching a real batch
            # edge and resample, 3 bounded rounds (PyG's own retry cap).
            # Membership test = searchsorted over the batch's sorted
            # (src, dst) keys — O(K·E·log E) on device, no host sync.
            # Keys are int32 (x64 is disabled on TPU): fine for batch-local
            # exclusion where n_pad² < 2³¹ — enforced statically.
            n_pad = batch.node_mask.shape[0]
            assert n_pad <= 46340, (
                f"filter_negatives packs (src, dst) into int32 keys; "
                f"node budget {n_pad} overflows — shrink the batch "
                f"envelope or extend the keys to a two-column search")
            big = jnp.array(np.iinfo(np.int32).max, jnp.int32)
            edge_keys = jnp.where(emask.astype(bool),
                                  src.astype(jnp.int32) * n_pad
                                  + dst.astype(jnp.int32), big)
            edge_keys = jnp.sort(edge_keys)

            def observed(ns, nd):
                cand = ns * n_pad + nd
                pos = jnp.searchsorted(edge_keys, cand.reshape(-1))
                pos = pos.reshape(cand.shape)
                found = jnp.take(edge_keys,
                                 jnp.minimum(pos, edge_keys.shape[0] - 1))
                return (pos < edge_keys.shape[0]) & (found == cand)

            for i in range(3):
                hit = observed(neg_src, neg_dst)
                rr = jax.random.fold_in(r_perm, i)
                rs2, rd2 = jax.random.split(rr)
                res_s = (jax.random.uniform(rs2, neg_src.shape)
                         * num_real_nodes).astype(jnp.int32)
                res_d = (jax.random.uniform(rd2, neg_dst.shape)
                         * num_real_nodes).astype(jnp.int32)
                neg_src = jnp.where(hit, res_s, neg_src)
                neg_dst = jnp.where(hit, res_d, neg_dst)
        z_neg = (z.astype(jnp.bfloat16)
                 if self.compute_dtype == jnp.bfloat16 else z)
        neg_pred = self.model.decoder.score_neg(
            params["model"]["decoder"], z_neg, neg_src, neg_dst,
            etype).reshape(-1)
        neg_mask = jnp.broadcast_to(emask[None], (ratio, num_edges))

        pred = jnp.concatenate([pos_pred, neg_pred])
        gt = jnp.concatenate([jnp.ones_like(pos_pred),
                              jnp.zeros_like(neg_pred)])
        weights = jnp.concatenate(
            [emask, neg_mask.reshape(-1)]).astype(pred.dtype)
        return self._finish_loss(params, batch, z, pred, gt, weights,
                                 pos_pred, etype, emask)

    def _finish_loss(self, params, batch, z, pred, gt, weights, pos_pred,
                     etype, emask):
        """Masked BCE + 1e-2·L2 regularization (kge_module.py:127-129)."""
        bce = nn.sigmoid_binary_cross_entropy(pred, gt, weights)
        nmask = batch.node_mask.astype(z.dtype)
        reg_z = jnp.sum((z ** 2) * nmask[:, None]) / (
            jnp.maximum(jnp.sum(nmask), 1.0) * z.shape[-1])
        dec_params = params["model"]["decoder"]
        reg_rel = sum(jnp.mean(v ** 2)
                      for v in jax.tree_util.tree_leaves(dec_params))
        loss = bce + 1e-2 * (reg_z + reg_rel)

        aux = {"pred": pred, "gt": gt, "weights": weights,
               "pos_pred": pos_pred, "edge_type": etype,
               "edge_mask": emask, "loss": loss}
        return loss, aux

    # -- eval epoch aggregation --------------------------------------------------

    def _reduce_eval_aux(self, aux):
        """Device-side metric-state reduction (VERDICT round-1 item #6):
        one (2, B) score histogram + exact (tp, fp, fn) counts + the
        per-relation EdgeWisePrecision count pair. Every array sums across
        batches AND hosts (psum) exactly like torchmetrics'
        ``dist_reduce_fx="sum"`` (reference utils/metrics.py:12-18)."""
        nbins = HistogramBinaryMetrics.NUM_BINS
        pred, gt, w = aux["pred"], aux["gt"], aux["weights"]
        t = gt > 0.5
        probs = jax.nn.sigmoid(pred)
        bins = jnp.minimum((probs * nbins).astype(jnp.int32), nbins - 1)
        hist = jnp.stack([
            jnp.zeros(nbins, jnp.float32).at[bins].add(
                jnp.where(t, w, 0.0)),
            jnp.zeros(nbins, jnp.float32).at[bins].add(
                jnp.where(t, 0.0, w)),
        ])
        pred_pos = pred > 0.0  # sigmoid(x) > 0.5 ⇔ x > 0: exact threshold
        f1_counts = jnp.stack([
            jnp.sum(jnp.where(pred_pos & t, w, 0.0)),
            jnp.sum(jnp.where(pred_pos & ~t, w, 0.0)),
            jnp.sum(jnp.where(~pred_pos & t, w, 0.0)),
        ])
        num_rel = self.hparams["num_relation"]
        em = aux["edge_mask"].astype(jnp.float32)
        et = aux["edge_type"]
        # raw-score 0.5 threshold: the reference quirk (utils/metrics.py:24)
        above = em * (aux["pos_pred"] > 0.5)
        edge_counts = jnp.zeros(num_rel, jnp.float32).at[et].add(em)
        edge_above = jnp.zeros(num_rel, jnp.float32).at[et].add(above)
        return {"hist": hist, "f1_counts": f1_counts,
                "edge_counts": edge_counts, "edge_above": edge_above,
                "loss": aux["loss"]}

    def _eval_epoch_from_states(self, outputs, split: str):
        hm = HistogramBinaryMetrics(prefix=f"{split}_")
        hist = np.zeros((2, hm.NUM_BINS), np.float64)
        f1c = np.zeros(3, np.float64)
        num_rel = self.hparams["num_relation"]
        cnt = np.zeros(num_rel, np.float64)
        above = np.zeros(num_rel, np.float64)
        losses = []
        for o in outputs:
            hist += np.asarray(o["hist"], np.float64)
            f1c += np.asarray(o["f1_counts"], np.float64)
            cnt += np.asarray(o["edge_counts"], np.float64)
            above += np.asarray(o["edge_above"], np.float64)
            losses.append(float(o["loss"]))
        hm.merge_state(hist, f1c)
        out = hm.compute()
        for idx, name in self._edge_index_map.items():
            key = str(name) + "_pre"
            out[key] = float(above[idx] / cnt[idx]) if cnt[idx] > 0 else 0.0
        out[f"{split}_loss"] = float(np.mean(losses)) if losses else 0.0
        return out

    def eval_epoch(self, outputs, split: str) -> Dict[str, float]:
        if outputs and isinstance(outputs[0], dict) \
                and "hist" in outputs[0]:
            return self._eval_epoch_from_states(outputs, split)
        metrics = self.valid_metrics if split == "val" else self.test_metrics
        metrics.reset()
        edgewise = getattr(self, f"edge_wise_pre_{'valid' if split == 'val' else 'test'}", None)
        if edgewise is not None:
            edgewise.reset()
        losses = []
        for aux in outputs:
            w = np.asarray(aux["weights"]) > 0
            metrics.update(np.asarray(aux["pred"])[w],
                           np.asarray(aux["gt"])[w])
            if edgewise is not None:
                edgewise.update(np.asarray(aux["pos_pred"]),
                                np.asarray(aux["edge_type"]),
                                mask=np.asarray(aux["edge_mask"]))
            losses.append(float(aux["loss"]))
        out = metrics.compute()
        if edgewise is not None:
            out.update(edgewise.compute())
        out[f"{split}_loss"] = float(np.mean(losses)) if losses else 0.0
        return out

    # -- export / inference --------------------------------------------------------

    def encode(self, params, batch):
        """Deterministic full forward (reference KGEModule.forward,
        kge_module.py:104-107) for embedding export. Jitted once per
        module via _jit_cache (a per-call @jax.jit closure would retrace
        the full-graph forward on every export/serving call)."""
        fwd = self._jit_cache.get("encode")
        if fwd is None:
            @jax.jit
            def fwd(p, b):
                b = self._widen(b)
                x = self.fusion_fn(p, self._batch_features(b),
                                   training=False)
                etype, block_rel = self._effective_types(b)
                return self.model.encode(p["model"], x, b.edge_index,
                                         etype, b.edge_mask, block_rel,
                                         training=False)
            self._jit_cache["encode"] = fwd

        return fwd(params, batch)


def load_kge_module(ckpt_path: str):
    """``KGEModule.load_from_checkpoint`` analog (reference test_kge.py:22)."""
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["kind"] == "kge", f"not a KGE checkpoint: {ckpt_path}"
    module = KGEModule(**ckpt["hparams"])
    return module, ckpt["params"]
