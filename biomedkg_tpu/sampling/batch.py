"""Static-shape padded subgraph batches.

The reference streams variable-size PyG ``Data`` objects out of C++ samplers
(NeighborLoader / GraphSAINTRandomWalkSampler, /root/reference/biomedkg/
data_module.py:71-145). Variable shapes force an XLA recompile per step, so
this framework fixes a (node_budget, edge_budget) envelope per loader and
pads:

  * nodes: real nodes first, zero rows after; the **last** slot is a reserved
    dummy node that padding edges point at.
  * edges: sorted by relation; every relation segment is padded to a multiple
    of ``block_size`` so each block is single-relation — the contract of the
    Pallas grouped-GEMM (ops/pallas/relmm.py). ``block_rel`` records each
    block's relation id. ``edge_mask`` marks real edges.

One jit-compiled train step therefore serves every batch of a run.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class GraphBatch(NamedTuple):
    """Device-ready padded subgraph. All arrays have static shapes.

    ``x`` may be an EMPTY (0,) placeholder when the run keeps the global
    node-feature table resident in device HBM — batches then carry only
    ``node_ids`` (global ids, ~KB instead of ~MB per batch) and features
    are gathered on device. This matters on hosts with slow H2D links.
    """

    x: np.ndarray            # (N_pad, D) / (N_pad, M, D) features, or (0,)
    edge_index: np.ndarray   # (2, E_pad) int32, relation-sorted
    edge_type: np.ndarray    # (E_pad,) int32
    node_mask: np.ndarray    # (N_pad,) bool — real nodes
    edge_mask: np.ndarray    # (E_pad,) bool — real edges
    block_rel: np.ndarray    # (E_pad // block_size,) int32
    num_seed: np.ndarray     # () int32 — seed nodes occupy rows [0, num_seed)
    node_ids: np.ndarray     # (N_pad,) int32 global node ids (pad slots: 0)
    # dst-layout batches also carry a (src, rel)-LEXSORTED copy of the
    # edges — (4, E_pad) rows [src (ascending), dst, rel, mask] — so
    # src-keyed backward scatters run on the sorted Pallas kernel too
    # (the CSR/CSC transpose pair; ops/aggconv.py, ops/segment.py
    # take_rows_via_perm). Empty (0,) otherwise.
    src_edges: np.ndarray = np.zeros(0, np.int16)
    # position of each copy edge in the PRIMARY (dst-sorted) order —
    # the backward's (E, d) gradient permutation; pads point at primary
    # pad slots (zero gradients). Empty (0,) otherwise.
    src_pos: np.ndarray = np.zeros(0, np.int32)

    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]


def pad_graph_batch(
    x: Optional[np.ndarray],
    edge_index: np.ndarray,
    edge_type: np.ndarray,
    num_relations: int,
    node_budget: int,
    edge_budget: int,
    block_size: int = 256,
    num_seed: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
    node_ids: Optional[np.ndarray] = None,
    num_nodes_hint: Optional[int] = None,
    layout: str = "relation",
) -> GraphBatch:
    """Pack a variable-size subgraph into a fixed envelope.

    ``edge_budget`` must be a multiple of ``block_size``. If the
    relation-block-padded edge count exceeds the budget, a uniform random
    subset of real edges is dropped (masked estimators stay unbiased); the
    drop is logged by the calling loader.

    ``layout``:
      * "relation" — relation-sorted single-relation blocks (the Pallas
        grouped-GEMM contract, ops/pallas/relmm.py).
      * "dst" — edges sorted by destination node. Pad SRCs target the
        dummy node; pad DST/REL entries repeat the largest real values
        (keeps the dst·R+rel key monotone and the sorted-segment windows
        narrow) — the edge mask, NOT the ids, is the pad discriminator.
        Enables sorted-segment aggregation in node-centric convolutions
        (ops/pallas/segsum.py); ``block_rel`` is all zeros (unused).
    """
    assert edge_budget % block_size == 0, "edge budget must align to blocks"
    assert layout in ("relation", "dst"), layout
    num_nodes = x.shape[0] if x is not None else num_nodes_hint
    if num_nodes > node_budget - 1:
        raise ValueError(
            f"subgraph has {num_nodes} nodes > budget {node_budget} - 1 dummy"
        )

    edge_index = np.asarray(edge_index, dtype=np.int32)
    edge_type = np.asarray(edge_type, dtype=np.int32)
    num_edges = edge_type.shape[0]

    # Drop overflow edges up front. Capacity is LAYOUT-dependent: "dst"
    # writes edges contiguously (no relation padding — capacity is
    # exactly edge_budget slots), "relation" pays per-relation block
    # padding. Using the padded figure for dst dropped real edges that
    # fit whenever relation diversity exceeded the probed envelope.
    counts = np.bincount(edge_type, minlength=num_relations)
    padded_total = int(np.sum((counts + block_size - 1) // block_size) * block_size)
    over = (num_edges > edge_budget) if layout == "dst" \
        else (padded_total > edge_budget)
    if over:
        rng = rng or np.random.default_rng(0)
        perm = rng.permutation(num_edges)
        if layout == "dst":
            keep = edge_budget
        else:
            # proportional shrink — the old `num_edges − slot_excess`
            # decrement conflated padded-SLOT units with edge counts and
            # dropped EVERYTHING when the padding excess exceeded the
            # edge count, though a large subset fit
            keep = max(1, num_edges * edge_budget // padded_total)
            while keep > 0:
                sel = perm[:keep]
                counts = np.bincount(edge_type[sel],
                                     minlength=num_relations)
                padded_total = int(np.sum(
                    (counts + block_size - 1) // block_size) * block_size)
                if padded_total <= edge_budget:
                    break
                keep = min(keep - 1,
                           keep * edge_budget // max(padded_total, 1))
        sel = perm[:max(keep, 0)]
        edge_index = edge_index[:, sel]
        edge_type = edge_type[sel]
        num_edges = edge_type.shape[0]
        counts = np.bincount(edge_type, minlength=num_relations)

    idx_dt = np.int16 if node_budget < 2**15 else np.int32
    rel_dt = np.int8 if num_relations < 2**7 else np.int32
    if layout == "dst":
        # (dst, rel) lexsort: dst-sorted (the aggregation contract) AND
        # rel-sorted within each dst, so the combined key dst·R + rel is
        # globally sorted — the aggregate-then-transform conv's (N·R)-row
        # SpMM then runs on the sorted kernel (ops/aggconv.py)
        order = np.lexsort((edge_type, edge_index[1]))
        dummy = node_budget - 1
        ei = np.full((2, edge_budget), dummy, dtype=idx_dt)
        et = np.zeros(edge_budget, dtype=rel_dt)
        emask = np.zeros(edge_budget, dtype=bool)
        ei[0, :num_edges] = edge_index[0, order]
        ei[1, :num_edges] = edge_index[1, order]
        et[:num_edges] = edge_type[order]
        emask[:num_edges] = True
        # padding DSTs/RELs repeat the largest real entries instead of the
        # dummy node: their contributions are masked zeros, so any valid
        # id is correct — and not jumping keeps the sorted-segment windows
        # narrow AND the dst·R + rel key monotone through the pad tail
        if num_edges:
            ei[1, num_edges:] = ei[1, num_edges - 1]
            et[num_edges:] = et[num_edges - 1]
        block_rel = np.zeros(edge_budget // block_size, dtype=rel_dt)

        # (src, rel)-lexsorted transpose copy (see GraphBatch.src_edges):
        # both s2 and the flat key s2·R + rel2 are ascending
        sdt = np.int16 if max(node_budget, num_relations) < 2**15 \
            else np.int32
        src_edges = np.zeros((4, edge_budget), dtype=sdt)
        src_pos = np.full(edge_budget, edge_budget - 1, np.int32)
        if num_edges:
            o2 = np.lexsort((et[:num_edges], ei[0, :num_edges]))
            src_edges[0, :num_edges] = ei[0, :num_edges][o2]
            src_edges[1, :num_edges] = ei[1, :num_edges][o2]
            src_edges[2, :num_edges] = et[:num_edges][o2]
            src_edges[3, :num_edges] = 1
            src_edges[0, num_edges:] = src_edges[0, num_edges - 1]
            src_edges[1, num_edges:] = src_edges[1, num_edges - 1]
            src_edges[2, num_edges:] = src_edges[2, num_edges - 1]
            src_pos[:num_edges] = o2
            # pads keep edge_budget-1: a primary PAD slot (zero grad)
            # whenever pads exist at all (num_edges < edge_budget)
        return _finish_batch(x, num_nodes, node_budget, node_ids, num_seed,
                             ei, et, emask, block_rel,
                             src_edges=src_edges, src_pos=src_pos)

    # Relation-sorted placement with per-segment block padding.
    order = np.argsort(edge_type, kind="stable")
    seg_sizes = counts
    seg_padded = ((seg_sizes + block_size - 1) // block_size) * block_size
    seg_offsets = np.concatenate([[0], np.cumsum(seg_padded)[:-1]])

    idx_dtype, rel_dtype = idx_dt, rel_dt  # one dtype rule (hoisted above)
    dummy = node_budget - 1
    ei = np.full((2, edge_budget), dummy, dtype=idx_dtype)
    et = np.zeros(edge_budget, dtype=rel_dtype)
    emask = np.zeros(edge_budget, dtype=bool)
    block_rel = np.zeros(edge_budget // block_size, dtype=rel_dtype)

    sorted_src = edge_index[0, order]
    sorted_dst = edge_index[1, order]
    sorted_type = edge_type[order]
    # Position of each sorted edge inside the padded layout.
    within = np.arange(num_edges) - np.repeat(
        np.concatenate([[0], np.cumsum(seg_sizes)[:-1]]), seg_sizes
    )
    pos = np.repeat(seg_offsets, seg_sizes) + within
    ei[0, pos] = sorted_src
    ei[1, pos] = sorted_dst
    et[pos] = sorted_type
    emask[pos] = True

    for r in range(num_relations):
        if seg_padded[r] == 0:
            continue
        b0 = seg_offsets[r] // block_size
        nb = seg_padded[r] // block_size
        block_rel[b0 : b0 + nb] = r
        # Padding rows inside a relation segment keep that relation's id so
        # the block stays single-relation (they remain masked + dummy-node).
        et[seg_offsets[r] : seg_offsets[r] + seg_padded[r]][
            ~emask[seg_offsets[r] : seg_offsets[r] + seg_padded[r]]
        ] = r

    return _finish_batch(x, num_nodes, node_budget, node_ids, num_seed,
                         ei, et, emask, block_rel)


def _finish_batch(x, num_nodes, node_budget, node_ids, num_seed,
                  ei, et, emask, block_rel,
                  src_edges=None, src_pos=None) -> GraphBatch:
    # Node padding: zero feature rows; last row is the dummy sink.
    if x is not None:
        feat_shape = (node_budget,) + x.shape[1:]
        xp = np.zeros(feat_shape, dtype=np.float32)
        xp[:num_nodes] = x
    else:
        xp = np.zeros(0, dtype=np.float32)  # device-resident-table mode
    nmask = np.zeros(node_budget, dtype=bool)
    nmask[:num_nodes] = True
    ids = np.zeros(node_budget, dtype=np.int32)
    ids[:num_nodes] = (np.asarray(node_ids, np.int32) if node_ids is not None
                       else np.arange(num_nodes, dtype=np.int32))

    return GraphBatch(
        x=xp,
        edge_index=ei,
        edge_type=et,
        node_mask=nmask,
        edge_mask=emask,
        block_rel=block_rel,
        num_seed=np.int32(num_seed if num_seed is not None else num_nodes),
        node_ids=ids,
        src_edges=(src_edges if src_edges is not None
                   else np.zeros(0, np.int16)),
        src_pos=(src_pos if src_pos is not None
                 else np.zeros(0, np.int32)),
    )
