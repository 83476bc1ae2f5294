"""Graph-partitioned full-graph execution: feature-table + edge sharding.

The scale axis of this domain is the graph, not a sequence (SURVEY §5
long-context row): the context-parallel analog is sharding the node
feature/embedding table across devices and partitioning edges by
destination shard. Each RGCN layer then:

  1. exchanges the remote node rows its local edges reference — either
     a full ``all_gather`` of the feature shards, or (``halo_plan``) an
     ``all_to_all`` HALO EXCHANGE that ships only the rows each shard
     actually needs (the SURVEY §5 plan: per-pair send lists are
     precomputed on the host, so the collective moves P·H·d instead of
     N_pad·d per device per layer, H = the worst per-pair halo),
  2. transforms + aggregates its local edge partition (all dsts are local
     by construction, so the scatter stays device-local),
  3. produces the next layer's feature shard in place.

Host-side ``partition_graph`` emits per-device relation-block-aligned edge
partitions padded to a common envelope, so the shard_map program is
SPMD-identical across devices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import per_dst_relation_counts, relation_matmul, scatter_add
from ..sampling.batch import GraphBatch, pad_graph_batch
from .dp import shard_map


class ShardedGraph(NamedTuple):
    x: np.ndarray          # (P, N_pad/P, D) node-feature shards
    edge_index: np.ndarray  # (P, 2, E_p) global src, global dst
    edge_type: np.ndarray   # (P, E_p)
    edge_mask: np.ndarray   # (P, E_p)
    block_rel: np.ndarray   # (P, E_p/block)
    node_mask: np.ndarray   # (P, N_pad/P)
    # (N_pad,) original node id of each sharded row (``balance=True``
    # relabels nodes; identity otherwise). Un-permute sharded outputs via
    # ``z_orig[node_order] = z_sharded``.
    node_order: np.ndarray = None


def balanced_node_order(batch: GraphBatch, num_shards: int) -> np.ndarray:
    """Degree-aware LPT node→shard assignment as a relabeling permutation.

    Ownership in the sharded kernels is positional (``dst // shard_n``),
    so balance is achieved by RELABELING: sort nodes by in-degree
    descending and greedily place each on the least-edge-loaded shard
    with free capacity (longest-processing-time heuristic). On power-law
    graphs the contiguous id partition concentrates hubs — the multichip
    dryrun measured a 432:0 max:min per-device edge imbalance on the tiny
    synthetic — while LPT lands within a few % of perfectly even.

    Returns ``node_order``: (N_pad,) original node id for each new slot
    (new slot ``p*shard_n + k`` holds original node ``node_order[...]``).
    The reserved pad row (last row) stays the global last slot.
    """
    import heapq

    n_pad = batch.x.shape[0]
    shard_n = n_pad // num_shards
    dst = batch.edge_index[1][batch.edge_mask]
    deg = np.bincount(dst, minlength=n_pad).astype(np.int64)
    order = np.argsort(-deg[:n_pad - 1], kind="stable")

    cap = np.full(num_shards, shard_n, np.int64)
    cap[-1] -= 1                       # reserve the global pad slot
    members = [[] for _ in range(num_shards)]
    heap = [(0, p) for p in range(num_shards)]
    heapq.heapify(heap)
    spill = []
    for node in order:
        while heap and len(members[heap[0][1]]) >= cap[heap[0][1]]:
            heapq.heappop(heap)
        if not heap:                   # all full (cannot happen: capacity
            spill.append(node)         # sums to n_pad-1 = len(order))
            continue
        load, p = heapq.heappop(heap)
        members[p].append(node)
        heapq.heappush(heap, (load + int(deg[node]), p))
    assert not spill
    members[-1].append(n_pad - 1)      # pad row pinned last
    node_order = np.concatenate([np.asarray(m, np.int64)
                                 for m in members])
    assert len(node_order) == n_pad
    return node_order


def partition_graph(batch: GraphBatch, num_shards: int,
                    num_relations: int, block_size: int = 256,
                    balance: bool = False) -> ShardedGraph:
    """Split a padded full-graph batch into dst-partitioned edge shards.

    ``balance=True`` first relabels nodes via :func:`balanced_node_order`
    so per-device edge loads (and hence the common padded edge envelope)
    even out; the mapping rides in ``ShardedGraph.node_order``.
    """
    n_pad = batch.x.shape[0]
    assert n_pad % num_shards == 0, "node budget must divide the mesh"
    shard_n = n_pad // num_shards

    if balance:
        node_order = balanced_node_order(batch, num_shards)
        old2new = np.empty(n_pad, np.int64)
        old2new[node_order] = np.arange(n_pad)
        ei = old2new[batch.edge_index]
        batch = batch._replace(x=batch.x[node_order],
                               node_mask=batch.node_mask[node_order],
                               edge_index=ei.astype(
                                   batch.edge_index.dtype))
    else:
        node_order = np.arange(n_pad, dtype=np.int64)

    real = batch.edge_mask
    src = batch.edge_index[0][real]
    dst = batch.edge_index[1][real]
    et = batch.edge_type[real]
    owner = dst // shard_n

    parts = []
    for p in range(num_shards):
        sel = owner == p
        parts.append((np.stack([src[sel], dst[sel]]), et[sel]))

    # common relation-block-aligned envelope across shards
    worst = block_size
    for ei_p, et_p in parts:
        counts = np.bincount(et_p, minlength=num_relations)
        padded = int(np.sum(
            (counts + block_size - 1) // block_size) * block_size)
        worst = max(worst, padded)

    xs, eis, ets, ems, brs, nms = [], [], [], [], [], []
    for p, (ei_p, et_p) in enumerate(parts):
        # route dummy edges to this shard's LAST LOCAL row so their
        # dst_local stays in [0, shard_n). NOTE: for p < P-1 that row can
        # be a REAL node — zero contribution is guaranteed solely by the
        # edge_mask zeroing both the message and the norm, not by the
        # target row being a dummy (only the last shard's last row is
        # the reserved pad node).
        pb = pad_graph_batch(
            np.zeros((1, 1), np.float32), ei_p, et_p,
            num_relations=num_relations, node_budget=n_pad,
            edge_budget=worst, block_size=block_size)
        ei = pb.edge_index.copy()
        pad_sel = ~pb.edge_mask
        ei[:, pad_sel] = (p + 1) * shard_n - 1
        xs.append(batch.x[p * shard_n:(p + 1) * shard_n])
        nms.append(batch.node_mask[p * shard_n:(p + 1) * shard_n])
        eis.append(ei)
        ets.append(pb.edge_type)
        ems.append(pb.edge_mask)
        brs.append(pb.block_rel)

    return ShardedGraph(
        x=np.stack(xs), edge_index=np.stack(eis), edge_type=np.stack(ets),
        edge_mask=np.stack(ems), block_rel=np.stack(brs),
        node_mask=np.stack(nms), node_order=node_order)


class HaloPlan(NamedTuple):
    """Host-precomputed halo-exchange plan (one per partition; layers
    reuse it — the edge set does not change across layers).

    ``send_idx[p, q]`` holds the LOCAL row ids (owner p's frame) of the
    rows p must ship to q, padded to the worst per-pair halo ``halo``
    with row 0 (receivers never reference pad slots). ``src_remap[q]``
    rewrites shard q's edge sources into the augmented local frame
    ``[x_local | halo rows]``: locally-owned srcs map to
    ``src − q·shard_n``; a src owned by p at position k of the sorted
    unique send list maps to ``shard_n + p·halo + k``.
    """

    send_idx: np.ndarray   # (P, P, H) int32
    src_remap: np.ndarray  # (P, E_p) int32
    halo: int
    # (P, P) REAL rows p ships to q (before padding to H) — diagnostics
    # only (comm-volume/balance artifacts; the exchange itself always
    # ships the padded (P, H, D) block)
    send_counts: np.ndarray = None


def build_halo_plan(sharded: "ShardedGraph", shard_n: int) -> HaloPlan:
    """Precompute the all_to_all halo exchange for a dst-partitioned graph."""
    p_sh, _, _ = sharded.edge_index.shape
    need = {}
    for q in range(p_sh):
        src = sharded.edge_index[q][0]
        owner = src // shard_n
        for p in range(p_sh):
            if p != q:
                need[(p, q)] = np.unique(src[owner == p])
    halo = max([1] + [len(v) for v in need.values()])
    counts = np.zeros((p_sh, p_sh), np.int32)
    for (p, q), v in need.items():
        counts[p, q] = len(v)
    send_idx = np.zeros((p_sh, p_sh, halo), np.int32)
    remaps = []
    for q in range(p_sh):
        src = sharded.edge_index[q][0]
        owner = src // shard_n
        remap = (src - q * shard_n).astype(np.int64)
        for p in range(p_sh):
            if p == q:
                continue
            uniq = need[(p, q)]
            send_idx[p, q, :len(uniq)] = uniq - p * shard_n
            sel = owner == p
            remap[sel] = (shard_n + p * halo
                          + np.searchsorted(uniq, src[sel]))
        remaps.append(remap.astype(np.int32))
    return HaloPlan(send_idx, np.stack(remaps), halo, counts)


def _exchange(x, axis, halo):
    """Per-layer cross-device row exchange → (rows, src index frame).

    ``halo=None``: all_gather the full table (src frame = global ids).
    ``halo=(send_idx (P,H), src_remap (E_p))``: ship only the
    per-pair halo rows via one all_to_all; srcs index
    ``[x_local | recv]`` via the host-precomputed remap. Both paths are
    plain differentiable jax — the all_to_all transposes to the reverse
    all_to_all and the send gather to a local scatter-add, so grads ride
    the same ICI pattern backward.
    """
    if halo is None:
        return jax.lax.all_gather(x, axis, tiled=True), None
    send_idx, src_remap = halo
    send = jnp.take(x, send_idx.reshape(-1), axis=0,
                    mode="clip").reshape(*send_idx.shape, x.shape[1])
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    x_aug = jnp.concatenate([x, recv.reshape(-1, x.shape[1])], axis=0)
    return x_aug, src_remap


def _encode_shard(layer_params, x, ei, et, em, brel, axis, shard_n,
                  num_rel, halo=None, rng=None, drop_out=False):
    """Per-shard RGCN forward body (dst-local edges; one all_gather — or
    halo all_to_all — of the current feature shard per layer, the only
    cross-device traffic). ``rng`` enables the encoder's inter-layer
    dropout(0.2) — same placement as models/encoders.RGCN.apply."""
    from .. import nn

    my = jax.lax.axis_index(axis)
    # per-(dst, rel) mean norm: dst/et/em are layer-invariant, so hoist
    # the count scatter out of the layer loop; flat clip-mode 1-D take
    # (2-D cnt[dst, et] indexing lowers to a scalar-path gather on TPU —
    # same rationale as encoders.RGCN._edge_norm)
    dst_local = ei[1] - my * shard_n
    cnt = per_dst_relation_counts(dst_local, et, em, shard_n, num_rel)
    flat_cnt = jnp.take(cnt.reshape(-1), dst_local * num_rel + et,
                        mode="clip")
    norm32 = em.astype(jnp.float32) / jnp.maximum(flat_cnt, 1.0)
    for i, lp in enumerate(layer_params):
        x_rows, remap = _exchange(x, axis, halo)
        src = ei[0] if remap is None else remap
        msg = jnp.take(x_rows, src, axis=0, mode="clip") \
            * em[:, None].astype(x_rows.dtype)
        h = relation_matmul(msg, lp["w_rel"], et, brel)
        agg = scatter_add(h * norm32.astype(h.dtype)[:, None], dst_local,
                          shard_n)
        x = jnp.dot(x, lp["w_root"],
                    preferred_element_type=jnp.float32
                    ).astype(x.dtype) + lp["b"] + agg
        if i < len(layer_params) - 1:
            x = jax.nn.relu(x)
            if drop_out:
                rng, sub = jax.random.split(rng)
                x = nn.dropout(sub, x, 0.2, deterministic=False)
    return x


_ENCODE_JIT_CACHE: dict = {}


def sharded_rgcn_encode(encoder, params, sharded: ShardedGraph,
                        mesh: Mesh, axis: str = "dp",
                        halo_plan: HaloPlan | None = None):
    """Full-graph RGCN forward with the feature table sharded over ``axis``.

    Per layer: all_gather feature shards (or, with ``halo_plan``, the
    all_to_all halo exchange) → local relation grouped-GEMM → local
    scatter (dst-partitioned edges never cross shards). The jitted
    program is memoized per (encoder, mesh, axis, plan) identity so
    repeated export calls don't retrace.
    """
    num_rel = encoder.num_relations
    shard_n = sharded.x.shape[1]
    with_halo = halo_plan is not None

    key = (id(encoder), id(mesh), axis, with_halo, shard_n)
    mapped = _ENCODE_JIT_CACHE.get(key)
    if mapped is None:
        def per_shard(layer_params, x_shard, ei, et, em, brel, nmask,
                      sidx, remap):
            x_shard, ei, et = x_shard[0], ei[0].astype(jnp.int32), \
                et[0].astype(jnp.int32)
            em, brel = em[0], brel[0].astype(jnp.int32)
            halo = (sidx[0], remap[0]) if with_halo else None
            x = _encode_shard(layer_params, x_shard, ei, et, em, brel,
                              axis, shard_n, num_rel, halo=halo)
            return x[None]

        spec = P(axis)
        mapped = jax.jit(shard_map(
            per_shard, mesh,
            in_specs=(P(), spec, spec, spec, spec, spec, spec, spec,
                      spec),
            out_specs=spec))
        _ENCODE_JIT_CACHE[key] = mapped

    if halo_plan is None:
        p_sh = sharded.x.shape[0]
        sidx = np.zeros((p_sh, p_sh, 1), np.int32)
        remap = np.zeros(sharded.edge_type.shape, np.int32)
    else:
        sidx, remap = halo_plan.send_idx, halo_plan.src_remap
    out = mapped(params["layers"], sharded.x, sharded.edge_index,
                 sharded.edge_type, sharded.edge_mask,
                 sharded.block_rel, sharded.node_mask,
                 jnp.asarray(sidx), jnp.asarray(remap))
    return out.reshape(-1, out.shape[-1])  # (N_pad, out_dim)


def make_sharded_train_step(encoder, decoder, tx, mesh: Mesh,
                            num_relations: int, neg_ratio: int = 4,
                            axis: str = "dp",
                            halo_plan: HaloPlan | None = None):
    """Full-graph KGE TRAINING with the node-embedding table sharded
    (round-2 VERDICT #6 — the forward-only export path now trains).

    Per step, inside one shard_map program:

      1. each shard encodes its feature partition (``_encode_shard`` —
         one all_gather per layer over ``axis``),
      2. all-gathers the final embeddings once and scores its LOCAL
         (dst-partitioned) positive edges plus ``neg_ratio`` iid
         corruptions over the global node range,
      3. the masked-BCE numerator/denominator and the z-regularizer
         reduce with ``psum`` (same loss semantics as
         training/kge_module.py:398-408: BCE + 1e-2·(mean z² + mean
         rel²)), so every shard holds the identical replicated loss,
      4. grads flow back THROUGH the collectives (all_gather transposes
         to reduce-scatter; replicated params psum their cotangents) and
         a replicated adam update applies.

    The encoder's ``drop_out`` config is honored (inter-layer
    dropout(0.2), per-shard rng streams folded from the step rng — same
    distribution as the single-device path's per-row masks).

    Returns ``step_fn(state, sharded, rng, fixed_neg=None)``;
    ``fixed_neg`` is an optional (P, 2, K, E_p) array of per-shard
    (src, dst) negative ids used by the correctness tests (production
    samples on device from ``rng``).
    """
    import functools

    import optax

    from ..training.kge_module import TrainState

    def loss_shardmap(params, sharded, rng, fixed_neg):
        shard_n = sharded.x.shape[1]
        num_rel = num_relations

        def per_shard(params, x, ei, et, em, brel, nmask, fneg,
                      sidx, remap):
            x, ei = x[0], ei[0].astype(jnp.int32)
            et, em = et[0].astype(jnp.int32), em[0]
            brel, nmask = brel[0].astype(jnp.int32), nmask[0]
            fneg = fneg[0]
            halo = None if halo_plan is None else (sidx[0], remap[0])
            enc_p = params["encoder"]["layers"]
            dec_p = params["decoder"]
            my0 = jax.lax.axis_index(axis)
            # per-shard dropout stream (rows differ per shard, so the
            # masks may too — same distribution as the single-device path)
            r_drop = jax.random.fold_in(jax.random.fold_in(rng, 7), my0)
            z_local = _encode_shard(enc_p, x, ei, et, em, brel, axis,
                                    shard_n, num_rel, halo=halo,
                                    rng=r_drop,
                                    drop_out=encoder.drop_out)
            z_full = jax.lax.all_gather(z_local, axis, tiled=True)

            src, dst = ei[0], ei[1]
            pos = decoder.score(dec_p, z_full, src, dst, et)

            if fneg.size:
                neg_src, neg_dst = fneg[0], fneg[1]          # (K, E_p)
            else:
                my = jax.lax.axis_index(axis)
                r = jax.random.fold_in(rng, my)
                r_s, r_d = jax.random.split(r)
                n_real = jnp.maximum(jax.lax.psum(
                    jnp.sum(nmask.astype(jnp.int32)), axis), 1)
                shape = (neg_ratio, et.shape[0])
                neg_src = (jax.random.uniform(r_s, shape)
                           * n_real).astype(jnp.int32)
                neg_dst = (jax.random.uniform(r_d, shape)
                           * n_real).astype(jnp.int32)
            neg = decoder.score_neg(dec_p, z_full, neg_src, neg_dst,
                                    et).reshape(-1)

            k = neg_src.shape[0]
            pred = jnp.concatenate([pos, neg])
            gt = jnp.concatenate([jnp.ones_like(pos),
                                  jnp.zeros_like(neg)])
            w = jnp.concatenate(
                [em, jnp.broadcast_to(em[None], (k, em.shape[0]))
                 .reshape(-1)]).astype(pred.dtype)
            # masked BCE as psum'd num/den (kge_module semantics)
            logp = jax.nn.log_sigmoid(pred)
            log1mp = jax.nn.log_sigmoid(-pred)
            per = -(gt * logp + (1.0 - gt) * log1mp)
            num = jax.lax.psum(jnp.sum(per * w), axis)
            den = jax.lax.psum(jnp.sum(w), axis)
            bce = num / jnp.maximum(den, 1.0)

            nm = nmask.astype(z_local.dtype)
            z_num = jax.lax.psum(jnp.sum((z_local ** 2) * nm[:, None]),
                                 axis)
            z_den = jax.lax.psum(jnp.sum(nm), axis)
            reg_z = z_num / (jnp.maximum(z_den, 1.0) * z_local.shape[-1])
            reg_rel = sum(jnp.mean(v ** 2) for v in
                          jax.tree_util.tree_leaves(dec_p))
            return bce + 1e-2 * (reg_z + reg_rel)

        spec = P(axis)
        mapped = shard_map(
            per_shard, mesh,
            in_specs=(P(), spec, spec, spec, spec, spec, spec, spec,
                      spec, spec),
            out_specs=P())
        if halo_plan is None:
            p_sh = sharded.x.shape[0]
            sidx = jnp.zeros((p_sh, p_sh, 1), jnp.int32)
            remap = jnp.zeros(sharded.edge_type.shape, jnp.int32)
        else:
            sidx = jnp.asarray(halo_plan.send_idx)
            remap = jnp.asarray(halo_plan.src_remap)
        return mapped(params, sharded.x, sharded.edge_index,
                      sharded.edge_type, sharded.edge_mask,
                      sharded.block_rel, sharded.node_mask, fixed_neg,
                      sidx, remap)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: "TrainState", sharded: ShardedGraph, rng,
                fixed_neg):
        loss, grads = jax.value_and_grad(loss_shardmap)(
            state.params, sharded, rng, fixed_neg)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def run(state, sharded, rng, fixed_neg=None):
        if fixed_neg is None:
            p = sharded.x.shape[0]
            fixed_neg = np.zeros((p, 2, 0, 0), np.int32)
        # node_order is host-only un-permute metadata (balance=True);
        # keep it out of the jitted pytree — it would otherwise ride
        # H2D on every step as an unused (N_pad,) int64 leaf
        sharded = sharded._replace(node_order=None)
        return step_fn(state, sharded, rng, jnp.asarray(fixed_neg))

    return run
