"""Sharding specs for model parameters over the (dp, tp) mesh.

Tensor-parallel layout (megatron-style, adapted to relational GNNs):

  * per-relation weight stacks ``w_rel`` (R, din, dout) shard the output
    feature dim over ``tp`` — each device computes a slice of every message
    transform; the next layer's input contraction makes XLA insert the psum
  * root/linear weights shard their output dim, biases follow
  * decoder relation-embedding tables shard the hidden dim over ``tp``
    (vocabulary-style sharding of the (R, d) table)
  * everything else (small fusion params) replicates

Annotate-and-let-GSPMD-propagate: only parameters carry explicit shardings;
activation layouts and collectives are XLA's job (scaling-book recipe).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    # only the LAST path entry names the leaf; handle dict keys
    # (DictKey.key), sequence slots (SequenceKey.idx), and attr-style
    # containers (GetAttrKey.name) so e.g. a NamedTuple param node still
    # resolves instead of silently degrading the tp layout to replication
    key = None
    if path:
        p = path[-1]
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", None)
        if key is None:
            key = getattr(p, "idx", None)
    ndim = getattr(leaf, "ndim", 0)
    if key == "w_rel" and ndim == 3:
        return P(None, None, "tp")
    if key == "rel_emb" and ndim == 2:
        return P(None, "tp")
    if key in ("w_root", "w", "table") and ndim == 2:
        return P(None, "tp")
    if key == "b" and ndim == 1:
        return P("tp")
    if key in ("att_src", "att_dst") and ndim == 3:
        return P(None, None, "tp")
    return P()  # replicate


def kge_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching a KGE/GCL parameter pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)),
        params)


def replicated(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params)
