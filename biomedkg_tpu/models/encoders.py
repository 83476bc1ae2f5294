"""Graph encoders: relational GCN, relational GAT, plain GCN.

Functional re-designs of the reference encoders
(/root/reference/biomedkg/model/encoder.py:6-162) for static-shape padded
batches (sampling/batch.py): gathers + relation-blocked grouped GEMM on the
MXU + masked scatter aggregation, instead of PyG's torch-scatter kernels.

Layer stacking matches the reference exactly: in→hidden,
num_hidden_layers×(hidden→hidden), hidden→out, with ReLU + dropout(0.2)
between layers and none after the last (encoder.py:50-59).

Note on RGAT: the reference's RGAT never ran as shipped (factory.py:78 passes
``num_relations=`` to a ctor expecting ``num_relation``, and the ctor passes
``num_relation=`` to PyG's RGATConv which expects ``num_relations``). This
implementation provides the *intended* behavior — additive relational
attention — with head-averaging so hidden dims stay constant across layers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.segment import take_rows, take_rows_matbwd
from ..ops import (
    per_dst_relation_counts,
    relation_matmul,
    scatter_add,
    segment_softmax,
    sorted_segment_sum,
)

# dst_bwd="perm" tuning: windows per chunk and the VMEM budget for the
# (N·R, dout) sorted-reduce output of the src-keyed backward (must stay
# consistent with ops/pallas/segsum.py's scoped-VMEM sharding rules)
PERM_BWD_WINDOWS = 3
PERM_BWD_VMEM = 13 * 1024 * 1024


def _layer_dims(in_dim, hidden_dim, out_dim, num_hidden_layers):
    dims = [(in_dim, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * num_hidden_layers
    dims += [(hidden_dim, out_dim)]
    return dims


class RGCN:
    """Relational GCN stack (reference encoder.py:6-59).

    Per layer: out_i = x_i @ W_root + b + Σ_r (1/|N_r(i)|) Σ_{j∈N_r(i)} x_j @ W_r
    (PyG RGCNConv semantics with the default per-relation mean aggregation).
    """

    def __init__(self, in_dim: int, hidden_dim: int, out_dim: int,
                 num_hidden_layers: int, num_relations: int,
                 drop_out: bool = True, remat: bool = False,
                 conv_impl: str = "auto"):
        self.dims = _layer_dims(in_dim, hidden_dim, out_dim, num_hidden_layers)
        self.num_relations = num_relations
        self.drop_out = drop_out
        # jax.checkpoint each conv: trades recompute for activation memory
        # (full-graph forwards on large graphs).
        self.remat = remat
        # "edge": gather→grouped-GEMM over relation-sorted edge blocks
        #         (Pallas; FLOPs = E·din·dout) — wins when E < R·N.
        # "node": transform every node under every relation
        #         (R dense MXU matmuls; FLOPs = R·N·din·dout) then gather at
        #         width dout — wins in the dense-subgraph regime E ≫ R·N
        #         (SAINT batches on PrimeKG have E/N ≈ 30 ≫ R) with 3× less
        #         gather traffic.
        # "auto": pick per call by the FLOP/byte comparison.
        self.conv_impl = conv_impl
        # "dst": batches carry destination-sorted edges (sampling/batch.py
        # layout="dst") — the aggregation scatter runs through the Pallas
        # sorted segment-sum (ops/pallas/segsum.py) and the conv is forced
        # node-centric (no single-relation blocks exist in this layout).
        self.edge_layout = "relation"
        # dst-layout backward for the h_all gather transpose:
        #   "scatter" — XLA scatter at the unsorted rel·N+src keys
        #   "perm"    — permute grads via the shipped (src, rel)-lexsorted
        #               copy, then Pallas sorted segment-sum
        #               (ops/segment.take_rows_via_perm)
        #   "agg"     — aggregate-then-transform conv (ops/aggconv.py;
        #               measured dead end at the bench envelope, PERF.md)
        self.dst_bwd = "scatter"

    def init(self, rng) -> dict:
        layers = []
        for din, dout in self.dims:
            rng, r1, r2 = jax.random.split(rng, 3)
            layers.append({
                "w_rel": nn.xavier_uniform(r1, (self.num_relations, din, dout)),
                "w_root": nn.xavier_uniform(r2, (din, dout)),
                "b": jnp.zeros((dout,)),
            })
        return {"layers": layers}

    def _edge_norm(self, edge_index, edge_type, edge_mask, num_nodes):
        """Per-edge 1/|N_r(dst)| mean normalization — identical for every
        conv layer, so ``apply`` hoists it out of the layer loop (the
        count scatter + flat take cost ~0.5 ms/layer in the round-2
        trace). Clip-mode 1-D take: ``cnt[dst, edge_type]`` 2-D indexing
        lowers to a slow scalar-path gather fusion on TPU."""
        dst = edge_index[1]
        if self.edge_layout == "dst":
            ohr = self._rel_onehot(edge_type)
            cnt2d = self._dst_rel_counts(dst, edge_mask, num_nodes, ohr)
            flat_cnt = self._count_lookup(cnt2d, dst, ohr)
        else:
            cnt = per_dst_relation_counts(dst, edge_type, edge_mask,
                                          num_nodes, self.num_relations)
            flat_cnt = jnp.take(cnt.reshape(-1),
                                dst * self.num_relations + edge_type,
                                mode="clip")
        return edge_mask.astype(jnp.float32) / jnp.maximum(flat_cnt, 1.0)

    def _dst_rel_counts(self, dst, edge_mask, num_nodes, ohr):
        """(N, R) per-(dst, rel) real-edge counts via the sorted kernel
        (dst-sorted edges; the 1-element count scatter/gather pair are
        scalar-path fusions worth ~0.8 ms/step — round-2 trace). ``ohr``
        is the (E, R) relation one-hot from _rel_onehot — built ONCE per
        (edges, relation-ids) pair and shared with _count_lookup so the
        count table and the lookup cannot diverge."""
        ohr_f = (ohr & edge_mask[:, None].astype(bool)).astype(jnp.float32)
        return sorted_segment_sum(ohr_f, dst, num_nodes, 4)  # (N, R)

    def _rel_onehot(self, edge_type):
        return (edge_type[:, None]
                == jnp.arange(self.num_relations,
                              dtype=edge_type.dtype)[None, :])

    @staticmethod
    def _count_lookup(cnt2d, dst, ohr):
        """Per-edge count as a WIDE row gather + one-hot select."""
        rows = take_rows(cnt2d, dst)                          # (E, R)
        return jnp.sum(jnp.where(ohr, rows, 0.0), axis=1)

    def _conv(self, lp, x, edge_index, edge_type, edge_mask, block_rel,
              norm, perm=None):
        src, dst = edge_index[0], edge_index[1]
        num_nodes = x.shape[0]
        num_edges = edge_type.shape[0]
        impl = self.conv_impl
        if impl == "auto":
            impl = ("node" if num_edges >= self.num_relations * num_nodes
                    else "edge")
        if self.edge_layout == "dst":
            impl = "node"
        if impl == "node" and perm is not None:
            # R dense MXU matmuls in (N, R, dout) layout so the flat key
            # src·R + rel matches the shipped (src, rel)-lexsorted copy;
            # the gather's backward permutes grads into that order and
            # reduces on the sorted Pallas kernel (take_rows_via_perm)
            # instead of XLA's unsorted (R·N)-keyed scatter
            src_pos, key2 = perm
            from ..ops.segment import take_rows_via_perm

            h_all = jnp.einsum("nd,rdk->nrk", x, lp["w_rel"],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
            flat = src * self.num_relations + edge_type.astype(jnp.int32)
            h = take_rows_via_perm(
                h_all.reshape(-1, h_all.shape[-1]), flat, src_pos, key2,
                PERM_BWD_WINDOWS, PERM_BWD_VMEM)
            h = h * edge_mask[:, None].astype(h.dtype)
        elif impl == "node":
            # R dense (N, din) @ (din, dout) MXU matmuls, then a width-dout
            # gather at flat index rel·N + src.
            h_all = jnp.einsum("nd,rdk->rnk", x, lp["w_rel"],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
            flat = edge_type.astype(jnp.int32) * num_nodes + src
            h = take_rows(h_all.reshape(-1, h_all.shape[-1]), flat)
            h = h * edge_mask[:, None].astype(h.dtype)
        else:
            msg = take_rows(x, src) \
                * edge_mask[:, None].astype(x.dtype)
            h = relation_matmul(msg, lp["w_rel"], edge_type, block_rel)
        norm = norm.astype(h.dtype)
        if self.edge_layout == "dst":
            agg = sorted_segment_sum(h * norm[:, None], dst,
                                     num_nodes).astype(h.dtype)
        else:
            agg = scatter_add(h * norm[:, None], dst, num_nodes)
        return jnp.dot(x, lp["w_root"],
                       preferred_element_type=jnp.float32).astype(x.dtype) \
            + lp["b"] + agg

    def apply(self, params, x, edge_index, edge_type, edge_mask, block_rel,
              *, rng: Optional[jax.Array] = None, training: bool = False,
              src_edges=None, src_pos=None):
        edge_index = edge_index.astype(jnp.int32)
        edge_type = edge_type.astype(jnp.int32)
        block_rel = block_rel.astype(jnp.int32)
        layers = params["layers"]
        num_nodes = x.shape[0]

        if (self.edge_layout == "dst" and src_edges is not None
                and src_edges.size and self.dst_bwd == "agg"):
            # aggregate-then-transform conv (ops/aggconv.py): both SpMM
            # scatters sorted — forward over the (dst, rel)-lexsorted
            # primary order, backward over the shipped src-sorted copy
            from ..ops.aggconv import agg_conv

            r = self.num_relations
            src, dst = edge_index[0], edge_index[1]
            se = src_edges.astype(jnp.int32)
            s2, d2, r2, m2 = se[0], se[1], se[2], se[3]
            ohr = self._rel_onehot(edge_type)
            cnt2d = self._dst_rel_counts(dst, edge_mask, num_nodes, ohr)
            norm = edge_mask.astype(jnp.float32) / jnp.maximum(
                self._count_lookup(cnt2d, dst, ohr), 1.0)
            norm2 = m2.astype(jnp.float32) / jnp.maximum(
                self._count_lookup(cnt2d, d2, self._rel_onehot(r2)), 1.0)
            key = dst * r + edge_type
            key2 = d2 * r + r2

            def conv_agg(lp, x):
                # wide-input layers (din > dout, e.g. the 768→256 input
                # layer) keep the transform-then-aggregate node path: the
                # agg factorization's SpMM runs at din width, 3× the
                # traffic there, and segsum would need d-sharding
                if lp["w_rel"].shape[1] > lp["w_rel"].shape[2]:
                    return self._conv(lp, x, edge_index, edge_type,
                                      edge_mask, block_rel, norm)
                agg = agg_conv(x, lp["w_rel"], src, key,
                               norm.astype(x.dtype), s2, key2,
                               norm2.astype(x.dtype))
                return jnp.dot(x, lp["w_root"],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype) + lp["b"] + agg

            conv_agg = (jax.checkpoint(conv_agg) if self.remat
                        else conv_agg)
            for i, lp in enumerate(layers[:-1]):
                x = jax.nn.relu(conv_agg(lp, x))
                if self.drop_out:
                    rng, sub = (jax.random.split(rng) if rng is not None
                                else (None, None))
                    x = nn.dropout(sub, x, 0.2, deterministic=not training)
            return conv_agg(layers[-1], x)

        perm = None
        if (self.edge_layout == "dst" and self.dst_bwd == "perm"
                and src_edges is not None and src_edges.size
                and src_pos is not None and src_pos.size):
            se = src_edges.astype(jnp.int32)
            key2 = se[0] * self.num_relations + se[2]
            perm = (src_pos.astype(jnp.int32), key2)

        conv = jax.checkpoint(self._conv) if self.remat else self._conv
        norm = self._edge_norm(edge_index, edge_type, edge_mask, x.shape[0])
        for i, lp in enumerate(layers[:-1]):
            x = jax.nn.relu(
                conv(lp, x, edge_index, edge_type, edge_mask, block_rel,
                     norm, perm))
            if self.drop_out:
                rng, sub = (jax.random.split(rng) if rng is not None
                            else (None, None))
                x = nn.dropout(sub, x, 0.2, deterministic=not training)
        return conv(layers[-1], x, edge_index, edge_type, edge_mask,
                    block_rel, norm, perm)


class RGAT:
    """Relational graph attention stack (intended reference encoder.py:62-121).

    Additive attention per head: e_uv = leaky_relu(a_src[r]·(x_u W_r) +
    a_dst[r]·(x_v W_r)), softmax over incoming edges of v across relations,
    heads averaged (keeps layer width = hidden_dim like the reference stack).
    """

    def __init__(self, in_dim: int, hidden_dim: int, out_dim: int,
                 num_hidden_layers: int, num_relations: int,
                 num_heads: int = 1, drop_out: bool = True):
        self.dims = _layer_dims(in_dim, hidden_dim, out_dim, num_hidden_layers)
        self.num_relations = num_relations
        self.num_heads = num_heads
        self.drop_out = drop_out

    def init(self, rng) -> dict:
        layers = []
        for din, dout in self.dims:
            rng, r1, r2, r3 = jax.random.split(rng, 4)
            layers.append({
                "w_rel": nn.xavier_uniform(
                    r1, (self.num_relations, din, self.num_heads * dout)),
                "att_src": nn.xavier_uniform(
                    r2, (self.num_relations, self.num_heads, dout)),
                "att_dst": nn.xavier_uniform(
                    r3, (self.num_relations, self.num_heads, dout)),
                "b": jnp.zeros((dout,)),
            })
        return {"layers": layers}

    def _conv(self, lp, x, edge_index, edge_type, edge_mask, block_rel, dout):
        src, dst = edge_index[0], edge_index[1]
        num_nodes, heads = x.shape[0], self.num_heads
        msg_src = take_rows(x, src) * edge_mask[:, None].astype(x.dtype)
        msg_dst = take_rows(x, dst) * edge_mask[:, None].astype(x.dtype)
        hs = relation_matmul(msg_src, lp["w_rel"], edge_type, block_rel)
        hd = relation_matmul(msg_dst, lp["w_rel"], edge_type, block_rel)
        hs = hs.reshape(-1, heads, dout)
        hd = hd.reshape(-1, heads, dout)
        a_src = take_rows_matbwd(lp["att_src"], edge_type)   # (E, H, dh)
        a_dst = take_rows_matbwd(lp["att_dst"], edge_type)
        logits = jax.nn.leaky_relu(
            jnp.sum(hs * a_src, -1) + jnp.sum(hd * a_dst, -1), 0.2)  # (E, H)
        alpha = segment_softmax(logits, dst, num_nodes, mask=edge_mask)
        weighted = (hs * alpha[..., None]).reshape(-1, heads * dout)
        agg = scatter_add(weighted, dst, num_nodes)
        agg = agg.reshape(num_nodes, heads, dout).mean(axis=1)
        return agg + lp["b"]

    def apply(self, params, x, edge_index, edge_type, edge_mask, block_rel,
              *, rng: Optional[jax.Array] = None, training: bool = False):
        edge_index = edge_index.astype(jnp.int32)
        edge_type = edge_type.astype(jnp.int32)
        block_rel = block_rel.astype(jnp.int32)
        layers = params["layers"]
        for i, lp in enumerate(layers[:-1]):
            dout = self.dims[i][1]
            x = jax.nn.relu(self._conv(lp, x, edge_index, edge_type,
                                       edge_mask, block_rel, dout))
            if self.drop_out:
                rng, sub = (jax.random.split(rng) if rng is not None
                            else (None, None))
                x = nn.dropout(sub, x, 0.2, deterministic=not training)
        return self._conv(layers[-1], x, edge_index, edge_type, edge_mask,
                          block_rel, self.dims[-1][1])


class GCNEncoder:
    """Homogeneous GCN stack used by all GCL models (encoder.py:124-162).

    PyG GCNConv semantics: self-loops added, symmetric D^-1/2 (A+I) D^-1/2
    normalization with in-degree computed on real (masked) edges.
    """

    def __init__(self, in_dim: int, hidden_dim: int, out_dim: int,
                 num_hidden_layers: int, drop_out: bool = True):
        self.dims = _layer_dims(in_dim, hidden_dim, out_dim, num_hidden_layers)
        self.drop_out = drop_out
        # "dst": destination-sorted batches → Pallas sorted-segment
        # aggregation (GCN has no relation blocks, so the sorted layout is
        # valid for every GCL batch; augmentation edge-dropout is a mask
        # and preserves the order)
        self.edge_layout = "relation"

    def init(self, rng) -> dict:
        layers = []
        for din, dout in self.dims:
            rng, r1 = jax.random.split(rng)
            layers.append({
                "w": nn.xavier_uniform(r1, (din, dout)),
                "b": jnp.zeros((dout,)),
            })
        return {"layers": layers}

    def _edge_norm(self, edge_index, edge_mask, num_nodes, dtype):
        """Symmetric D^{-1/2}(A)D^{-1/2} edge weights + 1/deg self-loop
        — layer-invariant, so ``apply`` hoists it out of the layer loop
        (same rationale as RGCN._edge_norm: XLA does not CSE the
        per-layer count scatter)."""
        src, dst = edge_index[0], edge_index[1]
        em = edge_mask.astype(dtype)
        deg = scatter_add(em[:, None], dst, num_nodes)[:, 0] + 1.0
        dis = jax.lax.rsqrt(deg)
        # clip-mode takes: [] indexing lowers to slow scalar-path gathers
        norm_e = jnp.take(dis, src, mode="clip") \
            * jnp.take(dis, dst, mode="clip") * em
        return norm_e, (1.0 / deg)

    def _conv(self, lp, x, edge_index, edge_mask, norm_e, self_w):
        src, dst = edge_index[0], edge_index[1]
        num_nodes = x.shape[0]
        h = jnp.dot(x, lp["w"], preferred_element_type=jnp.float32).astype(x.dtype)
        msg = take_rows(h, src) * norm_e[:, None]
        if self.edge_layout == "dst":
            agg = sorted_segment_sum(msg, dst, num_nodes).astype(h.dtype)
        else:
            agg = scatter_add(msg, dst, num_nodes)
        agg = agg + h * self_w[:, None]  # self-loop term
        return agg + lp["b"]

    def apply(self, params, x, edge_index, edge_mask,
              *, rng: Optional[jax.Array] = None, training: bool = False):
        edge_index = edge_index.astype(jnp.int32)
        layers = params["layers"]
        norm_e, self_w = self._edge_norm(edge_index, edge_mask,
                                         x.shape[0], x.dtype)
        for lp in layers[:-1]:
            x = jax.nn.relu(self._conv(lp, x, edge_index, edge_mask,
                                       norm_e, self_w))
            if self.drop_out:
                rng, sub = (jax.random.split(rng) if rng is not None
                            else (None, None))
                x = nn.dropout(sub, x, 0.2, deterministic=not training)
        return self._conv(layers[-1], x, edge_index, edge_mask, norm_e,
                          self_w)
