"""Triplet dataframe → homogeneous multi-relational graph.

Behavioral parity with the reference's TripletBase
(/root/reference/biomedkg/data/dataset/_base.py:12-89):

  * per node type: sorted unique names → contiguous index map; features from
    the node-encoder callable; node-type keys cleaned to letters only
  * per relation: the (x_type, relation, y_type) signature comes from the
    first row of that relation; edges taken from rows matching it
  * heterogeneous graph merged to a homogeneous one with node-type /
    edge-type vectors and per-type index offsets (PyG ``to_homogeneous``
    order: node types sorted by insertion = np.unique order)
  * returns (graph, edge_map_index {edge_id: relation_name}, node_list)

Deliberate fix vs the reference: edge indices stay int64 end-to-end — the
reference round-trips through a float32 torch.Tensor (_base.py:80), unsafe
past 2^24 nodes.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd

from ..common import clean_name
from ..sampling.csr import CSRGraph


class TripletGraph:
    def __init__(self, df: pd.DataFrame, encoder: Optional[Callable] = None):
        self.df = df
        self.encoder = encoder
        (self.graph, self.edge_map_index, self.node_list,
         self.node_type_names, self.node_type_of, self.type_offset,
         self.node_to_global) = self._construct()
        # reference-compatible aliases
        self.data = self.graph

    def _construct(self):
        df = self.df
        node_types = np.unique(
            np.concatenate([df["x_type"].unique(), df["y_type"].unique()]))
        relations = df["relation"].unique()

        all_node_name: List[str] = []
        node_to_index: Dict[str, Dict[str, int]] = {}
        features = []
        type_offset: Dict[str, int] = {}
        node_type_ids = []
        offset = 0

        for type_id, node_type in enumerate(node_types):
            names = set(df.loc[df["x_type"] == node_type, "x_name"]) | set(
                df.loc[df["y_type"] == node_type, "y_name"])
            names = sorted(names)
            all_node_name.extend(names)
            node_to_index[node_type] = {n: i for i, n in enumerate(names)}
            type_offset[node_type] = offset
            node_type_ids.append(np.full(len(names), type_id, np.int32))
            if self.encoder is not None:
                emb = np.asarray(self.encoder(names), dtype=np.float32)
                ratio = getattr(self.encoder, "random_init_ratio", None)
                if ratio is not None:
                    # reference node.py prints this per encoder call; keep
                    # the line but on stderr so driver-captured stdout
                    # (MULTICHIP/bench tails) stays pure signal
                    import sys
                    print(f"Random Init node ratio is {ratio}",
                          file=sys.stderr)
                features.append(emb)
            offset += len(names)

        num_nodes = offset
        edge_map_index: Dict[int, str] = {}
        src_parts, dst_parts, type_parts = [], [], []

        for edge_id, relation in enumerate(relations):
            rel_df = df[df["relation"] == relation]
            # first-row signature (reference first-occurrence semantics);
            # drop_duplicates over the whole relation slice hashed every
            # row just to read row 0
            first = rel_df.iloc[0]
            head_t, tail_t = first["x_type"], first["y_type"]
            pair_df = rel_df[(rel_df["x_type"] == head_t)
                             & (rel_df["y_type"] == tail_t)]
            h_map = node_to_index[head_t]
            t_map = node_to_index[tail_t]
            src = pair_df["x_name"].map(h_map).to_numpy(np.int64) \
                + type_offset[head_t]
            dst = pair_df["y_name"].map(t_map).to_numpy(np.int64) \
                + type_offset[tail_t]
            src_parts.append(src)
            dst_parts.append(dst)
            type_parts.append(np.full(len(src), edge_id, np.int32))
            edge_map_index[edge_id] = relation

        edge_index = np.stack([
            np.concatenate(src_parts) if src_parts else np.zeros(0, np.int64),
            np.concatenate(dst_parts) if dst_parts else np.zeros(0, np.int64),
        ])
        edge_type = (np.concatenate(type_parts) if type_parts
                     else np.zeros(0, np.int32))

        x = np.concatenate(features, axis=0) if features else None

        graph = CSRGraph(
            num_nodes=num_nodes,
            edge_index=edge_index,
            edge_type=edge_type,
            num_relations=len(relations),
            x=x,
        )
        node_type_of = np.concatenate(node_type_ids) if node_type_ids \
            else np.zeros(0, np.int32)
        clean_types = [clean_name(t) for t in node_types]
        node_to_global = {
            t: {n: i + type_offset[t] for n, i in node_to_index[t].items()}
            for t in node_types
        }
        return (graph, edge_map_index, all_node_name, clean_types,
                node_type_of, type_offset, node_to_global)

    @property
    def num_edge_types(self) -> int:
        """PyG homogeneous-data attribute used at reference train_kge.py:25."""
        return self.graph.num_relations
