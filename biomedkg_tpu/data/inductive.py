"""Unseen-node (inductive) split: the BASELINE.json north-star protocol.

The reference never implements this eval, but its enabling mechanism is
central to the paper's claim (arXiv:2501.01644): nodes absent from
training can still be scored because their *attribute-derived* features
(Stage-A LM embeddings, /root/reference/biomedkg/data/embed.py:27-50; or
the xavier fallback, node.py:33-41) feed the encoder's root/self
transform.  This module adds the missing protocol:

  * a node-holdout split: ``unseen_ratio`` of the nodes (optionally
    restricted to given node types, e.g. drugs — the DrugBank DTI
    "new drug" scenario of reference train_dpi.py:24-36) are held out;
  * every edge touching an unseen node is removed from ALL
    message-passing graphs and becomes val/test *supervision only*;
  * the remaining seen-only edges get the standard transductive
    RandomLinkSplit (data/split.py), so training code is unchanged;
  * at eval time the model encodes over the seen-only graph — unseen
    nodes are isolated vertices whose embedding is driven purely by
    their input features through ``W_root`` (models/encoders.py:47) —
    and is scored on the held-out unseen-touching edges
    (eval/inductive.py): binary AUROC/AP/F1 vs sampled negatives plus
    filtered ranking restricted to those edges.

A model with informative attributes (LM features) generalizes to the
held-out nodes; one with per-node random init provably cannot (fresh
xavier rows carry no information) — tests/test_inductive.py
demonstrates exactly this gap, the paper's core claim, offline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from ..sampling.csr import CSRGraph
from .split import SplitGraph, random_link_split


class InductiveSplit(NamedTuple):
    # transductive part over seen-only edges (training path, unchanged)
    train: SplitGraph
    val: SplitGraph
    test: SplitGraph
    # holdout bookkeeping
    unseen_nodes: np.ndarray      # (U,) global node ids
    unseen_mask: np.ndarray       # (N,) bool
    # message-passing graph for cold-start eval: ALL seen-only edges
    # (train ∪ val ∪ test of the transductive part); unseen nodes are
    # isolated — feature-only encoding
    eval_graph: CSRGraph
    # supervision edges touching ≥1 unseen node
    val_edge_index: np.ndarray    # (2, Ev)
    val_edge_type: np.ndarray     # (Ev,)
    test_edge_index: np.ndarray   # (2, Et)
    test_edge_type: np.ndarray    # (Et,)


def unseen_node_split(
    graph: CSRGraph,
    unseen_ratio: float,
    val_ratio: float,
    test_ratio: float,
    seed: int = 0,
    node_pool: Optional[np.ndarray] = None,
) -> InductiveSplit:
    """Node-holdout inductive split.

    Args:
      graph: full homogeneous graph.
      unseen_ratio: fraction of ``node_pool`` (default: all nodes) held
        out as unseen.
      val_ratio/test_ratio: reused twice — (a) transductive split of the
        seen-only edges (identical semantics to random_link_split) and
        (b) the val:test proportion for the unseen-touching supervision
        edges (all-test when both are 0).
      node_pool: optional (P,) array of candidate global node ids for the
        holdout (e.g. only drug nodes — reference DTI transfer scenario).
    """
    rng = np.random.default_rng(seed)
    pool = (np.arange(graph.num_nodes, dtype=np.int64)
            if node_pool is None else np.asarray(node_pool, np.int64))
    if len(pool) < 2:
        raise ValueError(
            f"node_pool needs >= 2 candidates to hold some out and keep "
            f"some seen (got {len(pool)})")
    # hold out at least one, and ALWAYS keep at least one pool node seen
    # (min-of-max, not max-of-min: the other order lets a tiny pool be
    # held out entirely)
    n_unseen = min(max(int(round(unseen_ratio * len(pool))), 1),
                   len(pool) - 1)
    unseen = np.sort(rng.choice(pool, size=n_unseen, replace=False))
    unseen_mask = np.zeros(graph.num_nodes, bool)
    unseen_mask[unseen] = True

    src, dst = graph.edge_index
    touching = unseen_mask[src] | unseen_mask[dst]
    seen_idx = np.nonzero(~touching)[0]
    held_idx = np.nonzero(touching)[0]

    seen_graph = CSRGraph(
        num_nodes=graph.num_nodes,
        edge_index=graph.edge_index[:, seen_idx],
        edge_type=graph.edge_type[seen_idx],
        num_relations=graph.num_relations,
        x=graph.x,
    )
    train, val, test = random_link_split(seen_graph, val_ratio, test_ratio,
                                         seed=seed)

    # unseen-touching edges: supervision only, split val:test
    held_idx = rng.permutation(held_idx)
    denom = val_ratio + test_ratio
    n_val = int(len(held_idx) * (val_ratio / denom)) if denom > 0 else 0
    v_idx, t_idx = held_idx[:n_val], held_idx[n_val:]

    return InductiveSplit(
        train=train, val=val, test=test,
        unseen_nodes=unseen, unseen_mask=unseen_mask,
        eval_graph=seen_graph,
        val_edge_index=graph.edge_index[:, v_idx],
        val_edge_type=graph.edge_type[v_idx],
        test_edge_index=graph.edge_index[:, t_idx],
        test_edge_type=graph.edge_type[t_idx],
    )


def node_pool_for_types(node_type_of: np.ndarray,
                        type_names: Sequence[str],
                        wanted: Sequence[str]) -> np.ndarray:
    """Global node ids whose (cleaned) type name is in ``wanted``."""
    wanted_ids = [i for i, t in enumerate(type_names) if t in set(wanted)]
    if not wanted_ids:
        raise ValueError(
            f"unseen_node_types {list(wanted)!r} match none of "
            f"{list(type_names)!r}")
    mask = np.isin(np.asarray(node_type_of), np.asarray(wanted_ids))
    return np.nonzero(mask)[0].astype(np.int64)
