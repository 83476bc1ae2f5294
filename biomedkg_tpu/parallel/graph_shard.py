"""Graph-partitioned full-graph execution: feature-table + edge sharding.

The scale axis of this domain is the graph, not a sequence (SURVEY §5
long-context row): the context-parallel analog is sharding the node
feature/embedding table across devices and partitioning edges by
destination shard. Each RGCN layer then:

  1. all-gathers the node-feature shards over the ``graph`` mesh axis
     (ICI collective — the only cross-device traffic),
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


def partition_graph(batch: GraphBatch, num_shards: int,
                    num_relations: int, block_size: int = 256
                    ) -> ShardedGraph:
    """Split a padded full-graph batch into dst-partitioned edge shards."""
    n_pad = batch.x.shape[0]
    assert n_pad % num_shards == 0, "node budget must divide the mesh"
    shard_n = n_pad // num_shards

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
        # dummy edges must scatter into a masked local slot: route them to
        # this shard's last node row (global id (p+1)*shard_n - 1).
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
        node_mask=np.stack(nms))


def sharded_rgcn_encode(encoder, params, sharded: ShardedGraph,
                        mesh: Mesh, axis: str = "dp"):
    """Full-graph RGCN forward with the feature table sharded over ``axis``.

    Per layer: all_gather feature shards → local relation grouped-GEMM →
    local scatter (dst-partitioned edges never cross shards).
    """
    num_rel = encoder.num_relations
    shard_n = sharded.x.shape[1]

    def per_shard(layer_params, x_shard, ei, et, em, brel, nmask):
        x_shard, ei, et = x_shard[0], ei[0].astype(jnp.int32), \
            et[0].astype(jnp.int32)
        em, brel, nmask = em[0], brel[0].astype(jnp.int32), nmask[0]
        my = jax.lax.axis_index(axis)
        x = x_shard
        for i, lp in enumerate(layer_params):
            x_full = jax.lax.all_gather(x, axis, tiled=True)  # (N_pad, d)
            src, dst = ei[0], ei[1]
            dst_local = dst - my * shard_n
            msg = jnp.take(x_full, src, axis=0) \
                * em[:, None].astype(x_full.dtype)
            h = relation_matmul(msg, lp["w_rel"], et, brel)
            cnt = per_dst_relation_counts(dst_local, et, em, shard_n,
                                          num_rel)
            norm = em.astype(h.dtype) / jnp.maximum(
                cnt[dst_local, et], 1.0)
            agg = scatter_add(h * norm[:, None], dst_local, shard_n)
            x = jnp.dot(x, lp["w_root"],
                        preferred_element_type=jnp.float32
                        ).astype(x.dtype) + lp["b"] + agg
            if i < len(layer_params) - 1:
                x = jax.nn.relu(x)
        return x[None]

    spec = P(axis)
    mapped = shard_map(
        per_shard, mesh,
        in_specs=(P(), spec, spec, spec, spec, spec, spec),
        out_specs=spec)

    out = jax.jit(mapped)(params["layers"], sharded.x, sharded.edge_index,
                          sharded.edge_type, sharded.edge_mask,
                          sharded.block_rel, sharded.node_mask)
    return out.reshape(-1, out.shape[-1])  # (N_pad, out_dim)
