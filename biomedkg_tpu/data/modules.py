"""Data modules: PrimeKGModule / DPIModule.

Surface parity with /root/reference/biomedkg/data_module.py:8-259 (the
Lightning data modules), instantiated from configs via ``_target_``
(configs/data/primekg.yaml:1). Loader methods return static-shape padded
GraphBatch iterators instead of PyG loaders:

  * train/val/test_dataloader("saint")    → SAINT random-walk batches,
    num_steps 1000/100/100 (data_module.py:100-107,114-121,128-145)
  * train/val/test_dataloader("neighbor") → [30,30,30] fan-out batches
  * all_dataloader()                       → [30,30,30] over the full graph
  * subgraph_dataloader()                  → single full-graph padded batch
    (replacing the reference's batch-per-node export loop)
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..sampling.loaders import (FullGraphLoader, NeighborBatchLoader,
                                SaintRandomWalkLoader)
from . import node_encoders as node
from .dpi import DPI
from .primekg import PrimeKG
from .split import random_link_split


def get_node_encode_method(node_init_method: Optional[str], embed_dim: int,
                           model_name: Optional[str],
                           fuse_method: Optional[str],
                           modality_config_path: str):
    """Reference data_module.py:8-24."""
    if node_init_method is None or node_init_method == "random":
        return node.RandomEncode(embed_dim=embed_dim)
    if node_init_method == "lm":
        return node.LMMultiModalsEncode(
            config_file=modality_config_path, embed_dim=embed_dim)
    if node_init_method == "gcl":
        return node.GCLEncode(model_name=model_name, fuse_method=fuse_method,
                              embed_dim=embed_dim)
    raise ValueError(f"Unknown node_init_method: {node_init_method!r}")


class _BaseModule:
    """Shared loader plumbing for the PrimeKG / DPI data modules."""

    SAINT_WALK_LENGTH = 10
    SAINT_TRAIN_STEPS = 1000
    SAINT_EVAL_STEPS = 100
    FANOUTS = [30, 30, 30]

    def __init__(self, batch_size: int, val_ratio: float, test_ratio: float,
                 seed: int = 42, block_size: int = 256,
                 unseen_node_ratio: float = 0.0,
                 unseen_node_types: Optional[List[str]] = None):
        # smoke-test knob only (scripts/pipeline_full.py --tiny on 1-core
        # CPU): production keeps the reference's 1000-step SAINT epochs
        steps = os.environ.get("BIOMEDKG_SAINT_STEPS")
        if steps:
            self.SAINT_TRAIN_STEPS = int(steps)
            self.SAINT_EVAL_STEPS = max(1, int(steps) // 10)
        self.batch_size = batch_size
        self.val_ratio = val_ratio
        self.test_ratio = test_ratio
        self.seed = seed
        self.block_size = block_size
        # >0 → node-holdout inductive split (data/inductive.py): that
        # fraction of nodes (optionally restricted to unseen_node_types,
        # cleaned names e.g. ["drug"]) is held out; edges touching them
        # become val/test supervision only and ``self.inductive`` carries
        # the cold-start eval graph + held-out edges.
        self.unseen_node_ratio = float(unseen_node_ratio or 0.0)
        self.unseen_node_types = unseen_node_types
        self.inductive = None
        # True → loaders omit features from batches (node_ids only); the
        # training module holds the full feature table in device HBM and
        # gathers on device. Avoids shipping MBs of features per batch over
        # slow host→device links.
        self.device_features = False
        # "relation" (grouped-GEMM blocks) or "dst" (sorted-segment
        # aggregation) — must match the training module's ``edge_layout``.
        self.edge_layout = "relation"
        # Occupancy-aware SAINT packing (sampling/saint.py fill_target):
        # None keeps the reference's fixed root count; a float in (0, 1]
        # tops up walk roots per TRAIN batch until realized edges fill
        # that fraction of the static envelope. Applied to the train
        # loader only — eval metrics stay on reference-distribution
        # batches.
        self.saint_fill_target = None

    def _post_setup(self, dataset):
        self.edge_map_index = dataset.edge_map_index
        self.data = dataset
        self.graph = dataset.graph
        self._saint_budgets = None
        self._neighbor_budgets = None
        if getattr(self, "_do_split", True):
            if self.unseen_node_ratio > 0.0:
                from .inductive import node_pool_for_types, unseen_node_split

                pool = None
                if self.unseen_node_types:
                    pool = node_pool_for_types(
                        dataset.node_type_of, dataset.node_type_names,
                        self.unseen_node_types)
                self.inductive = unseen_node_split(
                    self.graph, self.unseen_node_ratio, self.val_ratio,
                    self.test_ratio, seed=self.seed, node_pool=pool)
                self.train_data = self.inductive.train
                self.val_data = self.inductive.val
                self.test_data = self.inductive.test
            else:
                self.train_data, self.val_data, self.test_data = \
                    random_link_split(self.graph, self.val_ratio,
                                      self.test_ratio, seed=self.seed)

    # -- loaders -----------------------------------------------------------
    #
    # Budgets are probed ONCE on the largest split graph (test carries
    # train+val message-passing edges) and shared by every loader of that
    # kind, so train/val/test batches have identical static shapes and the
    # jitted step/eval programs each compile exactly once per run.

    def _probe_graph(self):
        return (self.test_data.graph if getattr(self, "_do_split", True)
                else self.graph)

    def _saint(self, split, num_steps, seed_offset, fill_target=None):
        if self._saint_budgets is None:
            # budgets probed WITH the fill plan (if any) so train and
            # eval loaders still share one static envelope per run
            probe = SaintRandomWalkLoader(
                self._probe_graph(), batch_size=self.batch_size,
                walk_length=self.SAINT_WALK_LENGTH, num_steps=1,
                block_size=self.block_size, seed=self.seed,
                fill_target=self.saint_fill_target)
            self._saint_budgets = (probe.node_budget, probe.edge_budget)
        nb, eb = self._saint_budgets
        return SaintRandomWalkLoader(
            split.graph, batch_size=self.batch_size,
            walk_length=self.SAINT_WALK_LENGTH, num_steps=num_steps,
            block_size=self.block_size, seed=self.seed + seed_offset,
            node_budget=nb, edge_budget=eb, fill_target=fill_target,
            with_features=not self.device_features,
            edge_layout=self.edge_layout)

    def _neighbor(self, split, shuffle, seed_offset):
        if self._neighbor_budgets is None:
            probe = NeighborBatchLoader(
                self._probe_graph(), batch_size=self.batch_size,
                fanouts=self.FANOUTS, block_size=self.block_size,
                seed=self.seed)
            self._neighbor_budgets = (probe.node_budget, probe.edge_budget)
        nb, eb = self._neighbor_budgets
        return NeighborBatchLoader(
            split.graph, batch_size=self.batch_size, fanouts=self.FANOUTS,
            shuffle=shuffle, block_size=self.block_size,
            seed=self.seed + seed_offset, node_budget=nb, edge_budget=eb,
            with_features=not self.device_features,
            edge_layout=self.edge_layout)

    def _full(self, split, steps):
        # TPU-native extra mode beyond the reference: full-batch training —
        # the whole (train-split) graph as one padded batch per step.
        # PrimeKG++ fits a single chip's HBM comfortably; larger graphs use
        # parallel/graph_shard.py.
        loader = FullGraphLoader(split.graph, block_size=self.block_size,
                                 edge_layout=self.edge_layout)

        class _Repeat:
            def __iter__(self):
                import jax

                # device_put ONCE: the batch is invariant across steps, so
                # yielding the device-resident pytree makes the trainer's
                # per-step device_put a no-op instead of re-copying the
                # full feature matrix (~400 MB at PrimeKG scale) every step
                batch = jax.device_put(loader.batch())
                for _ in range(steps):
                    yield batch

            def __len__(self):
                return steps

        return _Repeat()

    def train_dataloader(self, loader_type: str = "neighbor"):
        assert loader_type in ("neighbor", "saint", "full")
        if loader_type == "saint":
            return self._saint(self.train_data, self.SAINT_TRAIN_STEPS, 1,
                               fill_target=self.saint_fill_target)
        if loader_type == "full":
            return self._full(self.train_data, self.SAINT_TRAIN_STEPS)
        return self._neighbor(self.train_data, shuffle=True, seed_offset=1)

    def val_dataloader(self, loader_type: str = "neighbor"):
        assert loader_type in ("neighbor", "saint", "full")
        if loader_type == "saint":
            return self._saint(self.val_data, self.SAINT_EVAL_STEPS, 2)
        if loader_type == "full":
            return self._full(self.val_data, 1)
        return self._neighbor(self.val_data, shuffle=False, seed_offset=2)

    def test_dataloader(self, loader_type: str = "neighbor"):
        assert loader_type in ("neighbor", "saint", "full")
        if loader_type == "saint":
            return self._saint(self.test_data, self.SAINT_EVAL_STEPS, 3)
        if loader_type == "full":
            return self._full(self.test_data, 1)
        return self._neighbor(self.test_data, shuffle=False, seed_offset=3)

    def all_dataloader(self):
        return NeighborBatchLoader(
            self.graph, batch_size=self.batch_size, fanouts=self.FANOUTS,
            shuffle=False, block_size=self.block_size, seed=self.seed,
            with_features=not self.device_features,
            edge_layout=self.edge_layout)

    def subgraph_dataloader(self):
        # export surface — must honor the module's edge_layout like every
        # other loader (a dst-configured encoder fed relation-sorted
        # edges silently aggregates wrong)
        return FullGraphLoader(self.graph, block_size=self.block_size,
                               edge_layout=self.edge_layout)


class PrimeKGModule(_BaseModule):
    """Reference data_module.py:27-145."""

    def __init__(self, data_dir: str, embed_dim: int, node_type: List[str],
                 batch_size: int, val_ratio: float, test_ratio: float,
                 node_init_method: Optional[str] = None,
                 gcl_model: Optional[str] = None,
                 gcl_fuse_method: Optional[str] = None,
                 seed: int = 42, block_size: int = 256,
                 unseen_node_ratio: float = 0.0,
                 unseen_node_types: Optional[List[str]] = None,
                 modality_config_path: str =
                 "configs/lm_modality/primekg_modality.yaml"):
        super().__init__(batch_size, val_ratio, test_ratio, seed, block_size,
                         unseen_node_ratio=unseen_node_ratio,
                         unseen_node_types=unseen_node_types)
        self.data_dir = data_dir
        self.node_type = node_type
        self.node_init_method = node_init_method
        self.encoder = get_node_encode_method(
            node_init_method=node_init_method, embed_dim=embed_dim,
            model_name=gcl_model, fuse_method=gcl_fuse_method,
            modality_config_path=modality_config_path)

    def setup(self, stage: str = "split"):
        self._do_split = stage == "split"
        self.primekg = PrimeKG(data_dir=self.data_dir,
                               node_type=self.node_type,
                               encoder=self.encoder)
        self._post_setup(self.primekg)


class DPIModule(_BaseModule):
    """Reference data_module.py:148-259 (ToUndirected applied before split)."""

    def __init__(self, data_dir: str, embed_dim: int, batch_size: int,
                 val_ratio: float, test_ratio: float,
                 node_init_method: Optional[str] = None,
                 gcl_model: Optional[str] = None,
                 gcl_fuse_method: Optional[str] = None,
                 seed: int = 42, block_size: int = 256,
                 unseen_node_ratio: float = 0.0,
                 unseen_node_types: Optional[List[str]] = None,
                 modality_config_path: str =
                 "configs/lm_modality/dpi_modality.yaml"):
        super().__init__(batch_size, val_ratio, test_ratio, seed, block_size,
                         unseen_node_ratio=unseen_node_ratio,
                         unseen_node_types=unseen_node_types)
        self.data_dir = data_dir
        self.node_init_method = node_init_method
        self.encoder = get_node_encode_method(
            node_init_method=node_init_method, embed_dim=embed_dim,
            model_name=gcl_model, fuse_method=gcl_fuse_method,
            modality_config_path=modality_config_path)

    def setup(self, stage: str = "split"):
        self._do_split = stage == "split"
        self.dpi = DPI(data_dir=self.data_dir, encoder=self.encoder)
        # T.ToUndirected(): append reversed edges with the same type AND
        # coalesce duplicates (PyG's to_undirected dedups — a csv that
        # records an interaction in both directions must not yield four
        # copies of the pair; reference data_module.py:178). NOTE the
        # reference then calls RandomLinkSplit WITHOUT is_undirected=True,
        # so the REVERSE of a test edge can sit in train — an inherited
        # methodological leak kept for parity (PARITY.md), not a port bug.
        g = self.dpi.graph
        ei = np.concatenate([g.edge_index, g.edge_index[::-1]], axis=1)
        et = np.concatenate([g.edge_type, g.edge_type])
        key = (ei[0].astype(np.int64) * g.num_nodes + ei[1]
               ) * max(g.num_relations, 1) + et
        _, keep = np.unique(key, return_index=True)
        keep.sort()
        g.edge_index = ei[:, keep]
        g.edge_type = et[keep]
        g._out = g._in = None
        self._post_setup(self.dpi)
