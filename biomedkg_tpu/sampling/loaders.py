"""Loader front-end mirroring the reference data_module loader surface.

Maps the reference's four loader kinds (data_module.py:71-145) onto the
static-shape samplers:

  * ``train/val/test_dataloader(loader_type="saint")``  → SaintRandomWalkLoader
  * ``train/val/test_dataloader(loader_type="neighbor")`` → NeighborBatchLoader
  * ``all_dataloader()``       → NeighborBatchLoader([30,30,30])
  * ``subgraph_dataloader()``  → FullGraphLoader — the reference runs one
    NeighborLoader batch **per node** for embedding export (node.py:229-238,
    the slowest offline path, SURVEY §3.4); on TPU a single padded full-graph
    forward replaces it.

A double-buffering prefetch thread keeps host sampling off the device
critical path.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

from .batch import GraphBatch, pad_graph_batch
from .csr import CSRGraph
from .neighbor import NeighborBatchLoader
from .saint import SaintRandomWalkSampler, _round_up


class SaintRandomWalkLoader(SaintRandomWalkSampler):
    """Alias with loader naming (one epoch = num_steps batches)."""


class FullGraphLoader:
    """Single padded batch containing the entire graph."""

    def __init__(self, graph: CSRGraph, block_size: int = 256,
                 edge_layout: str = "relation"):
        self.graph = graph
        self.block_size = block_size
        self.edge_layout = edge_layout
        self._batch = None

    def batch(self) -> GraphBatch:
        if self._batch is None:
            g = self.graph
            import numpy as np

            counts = np.bincount(g.edge_type, minlength=g.num_relations)
            edge_budget = int(np.sum(
                (counts + self.block_size - 1) // self.block_size
            ) * self.block_size)
            edge_budget = max(edge_budget, self.block_size)
            # align to lcm(block_size, 2048) like the SAINT loader: the
            # negative path's K·E slots must be a multiple of the Pallas
            # chunk or every step pays a runtime pad of the (K·E, d) grad
            lcm = int(np.lcm(self.block_size, 2048))
            edge_budget = -(-edge_budget // lcm) * lcm
            x = g.x if g.x is not None else np.zeros((g.num_nodes, 1),
                                                     np.float32)
            self._batch = pad_graph_batch(
                x, g.edge_index, g.edge_type, num_relations=g.num_relations,
                node_budget=_round_up(g.num_nodes + 1, 128),
                edge_budget=edge_budget, block_size=self.block_size,
                num_seed=g.num_nodes,
                node_ids=np.arange(g.num_nodes, dtype=np.int32),
                layout=self.edge_layout)
        return self._batch

    def __iter__(self):
        yield self.batch()

    def __len__(self):
        return 1


def prefetch_to_device(iterable: Iterable, size: int = 2) -> Iterator:
    """Prefetch + async device transfer: batches are device_put from the
    worker thread so host→HBM copies overlap device compute."""
    import jax

    return prefetch((jax.device_put(item) for item in iterable), size=size)


def prefetch(iterable: Iterable, size: int = 2) -> Iterator:
    """Run an iterator in a background thread with a bounded queue.

    Abandoning the generator early (``break`` — e.g. fast_dev_run) closes
    it cleanly: the worker is signalled to stop and the queue drained, so
    no thread stays blocked on ``put`` pinning device-resident batches."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    error: list = []
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate to consumer
            error.append(e)
        finally:
            # blocking-with-stop-check: the queue may still hold
            # unconsumed items; dropping the sentinel would hang the
            # consumer's final q.get()
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
