"""GraphSAINT random-walk sampling → fixed-envelope padded batches.

Semantics follow PyG's GraphSAINTRandomWalkSampler as used by the reference
(data_module.py:100-107: batch_size roots, walk_length=10, num_steps=1000
train / 100 eval, no sample_coverage normalization): uniform roots with
replacement, walks over out-neighbors (dead ends stay in place), node set =
unique visited nodes, induced subgraph.

TPU-first difference: each batch is emitted as a relation-block-aligned
GraphBatch (sampling/batch.py) so a single compiled step serves the run.
"""

from __future__ import annotations

import numpy as np

from .batch import GraphBatch, pad_graph_batch
from .csr import CSRGraph


def random_walk(graph: CSRGraph, roots: np.ndarray, walk_length: int,
                rng: np.random.Generator) -> np.ndarray:
    """(B, walk_length+1) visited-node matrix; dead ends repeat the node."""
    from . import native

    indptr, nbr, _, _ = graph.out_csr()
    lib = native.get_lib()
    if lib is not None:
        roots_c = np.ascontiguousarray(roots, np.int64)
        walks = np.empty((len(roots_c), walk_length + 1), np.int64)
        seed = int(rng.integers(0, 2**63 - 1))
        lib.random_walk(native.i64(indptr), native.i64(nbr),
                        native.i64(roots_c), len(roots_c), walk_length,
                        seed, native.i64(walks))
        return walks
    walks = np.empty((len(roots), walk_length + 1), dtype=np.int64)
    walks[:, 0] = roots
    cur = roots.astype(np.int64)
    if len(nbr) == 0:           # edgeless graph: every walk stays put
        walks[:, 1:] = cur[:, None]
        return walks
    for step in range(walk_length):
        starts = indptr[cur]
        deg = indptr[cur + 1] - starts
        offs = (rng.random(len(cur)) * np.maximum(deg, 1)).astype(np.int64)
        # final clamp: a zero-out-degree node whose CSR start == E (sink
        # after the last source id) would gather nbr[E] out of bounds
        # before the deg>0 select masks it away
        idx = np.minimum(starts + np.minimum(offs, np.maximum(deg - 1, 0)),
                         len(nbr) - 1)
        cur = np.where(deg > 0, nbr[idx], cur)
        walks[:, step + 1] = cur
    return walks


class SaintRandomWalkSampler:
    def __init__(self, graph: CSRGraph, batch_size: int, walk_length: int,
                 num_steps: int, block_size: int = 256,
                 seed: int = 0, edge_budget: int | None = None,
                 node_budget: int | None = None,
                 with_features: bool = True, edge_layout: str = "relation"):
        self.graph = graph
        # False → batches carry global node_ids only; features gathered from
        # a device-resident table (sampling/batch.py GraphBatch docstring)
        self.with_features = with_features
        self.edge_layout = edge_layout
        self.batch_size = batch_size
        self.walk_length = walk_length
        self.num_steps = num_steps
        self.block_size = block_size
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.dropped_edges = 0

        max_nodes = batch_size * (walk_length + 1) + 1
        self.node_budget = node_budget or _round_up(max_nodes, 128)
        self.edge_budget = edge_budget or self._probe_edge_budget(seed)

    def _probe_edge_budget(self, seed: int, probes: int = 8) -> int:
        """Estimate the padded edge envelope from a few probe batches."""
        rng = np.random.default_rng(seed + 104729)
        worst = self.block_size
        for _ in range(probes):
            nodes, ei, et = self._sample_raw(rng)
            counts = np.bincount(et, minlength=self.graph.num_relations)
            padded = int(np.sum(
                (counts + self.block_size - 1) // self.block_size
            ) * self.block_size)
            worst = max(worst, padded)
        # align to lcm(block_size, 2048): relation blocks stay aligned AND
        # the negative path's K·E slot count is a multiple of the Pallas
        # segment-sum chunk (ops/pallas/segsum.py BLOCK), so no runtime pad
        # of the (K·E, d) gradient is needed.
        lcm = int(np.lcm(self.block_size, 2048))
        return _round_up(int(worst * 1.5), lcm)

    def _sample_raw(self, rng: np.random.Generator):
        roots = rng.integers(0, self.graph.num_nodes, self.batch_size)
        walks = random_walk(self.graph, roots, self.walk_length, rng)
        nodes = np.unique(walks)
        ei, et = self.graph.induced_subgraph(nodes)
        return nodes, ei, et

    def sample(self) -> tuple[GraphBatch, np.ndarray]:
        """One SAINT batch; returns (padded batch, global node ids)."""
        nodes, ei, et = self._sample_raw(self.rng)
        if self.with_features:
            x = self.graph.x[nodes] if self.graph.x is not None else \
                np.zeros((len(nodes), 1), np.float32)
        else:
            x = None
        before = et.shape[0]
        batch = pad_graph_batch(
            x, ei, et, num_relations=self.graph.num_relations,
            node_budget=self.node_budget, edge_budget=self.edge_budget,
            block_size=self.block_size, num_seed=len(nodes), rng=self.rng,
            node_ids=nodes, num_nodes_hint=len(nodes),
            layout=self.edge_layout)
        self.dropped_edges += before - int(batch.edge_mask.sum())
        return batch, nodes

    def set_epoch(self, epoch: int):
        """Re-key the batch stream for an epoch so any resume point replays
        the identical batches an uninterrupted run would have seen (the
        Trainer calls this; same contract as torch's DistributedSampler)."""
        self.rng = np.random.default_rng((self.seed, epoch))

    def __iter__(self):
        for _ in range(self.num_steps):
            yield self.sample()[0]

    def __len__(self):
        return self.num_steps


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
