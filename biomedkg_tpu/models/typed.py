"""Hetero-native typed-table mode (round-2 VERDICT #9 / ROADMAP #7).

The reference merges its heterogeneous graph to a homogeneous one before
anything runs (/root/reference/biomedkg/data/dataset/_base.py:23-89);
this module keeps the types: one feature/embedding table per node type
and one edge block per (head_type, relation, tail_type) signature.

Why it's the TPU-first layout:

  * per-type tables are the natural tensor-parallel sharding unit — a
    type's table shards over the mesh without padding other types to a
    common width or interleaving rows;
  * per-signature edge blocks are SINGLE-relation AND single-src/dst
    type, so every block is one dense (E_s, d_in_t) @ (d, d) matmul and
    one segment-sum into a type-local table — no relation one-hots, no
    flat R·N keys;
  * local (per-type) node indices are smaller (int16 at PrimeKG scale)
    and each signature's destination ids can be kept sorted
    independently.

Semantics match the homogeneous RGCN stack exactly (mean-per-(dst, rel)
aggregation, shared W_root/bias, reference encoder.py:24-60):
``typed_encode`` == ``RGCN.apply`` on the merged graph, asserted in
tests/test_typed.py. The KGE decoders consume the concatenated tables in
global (type-offset) order, so the whole scoring/eval stack reuses the
homogeneous machinery.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn


class TypedGraph(NamedTuple):
    """Per-type tables + per-signature edge blocks (host side)."""

    type_names: List[str]                       # insertion order == global
    x: Dict[str, np.ndarray]                    # type → (N_t, D)
    counts: Dict[str, np.ndarray]               # type → (N_t, R) real counts
    # signature (head_type, rel_id, tail_type) → (src_local, dst_local)
    sigs: Dict[Tuple[str, int, str], Tuple[np.ndarray, np.ndarray]]
    type_offset: Dict[str, int]
    num_relations: int

    @property
    def num_nodes(self) -> int:
        return sum(v.shape[0] for v in self.x.values())


def to_typed(tg) -> TypedGraph:
    """Split a TripletGraph back into typed tables + signature blocks."""
    g = tg.graph
    names = [t for t in sorted(tg.type_offset, key=tg.type_offset.get)]
    sizes = {}
    for i, t in enumerate(names):
        nxt = (tg.type_offset[names[i + 1]] if i + 1 < len(names)
               else g.num_nodes)
        sizes[t] = nxt - tg.type_offset[t]
    x = {t: g.x[tg.type_offset[t]:tg.type_offset[t] + sizes[t]]
         for t in names}

    src, dst, et = g.edge_index[0], g.edge_index[1], g.edge_type
    type_of = np.asarray(tg.node_type_of)
    counts = {t: np.zeros((sizes[t], g.num_relations), np.float32)
              for t in names}
    sigs: Dict[Tuple[str, int, str], Tuple[np.ndarray, np.ndarray]] = {}
    # one integer composite key + sort instead of T²·R full-edge string
    # scans (minutes of host work at PrimeKG scale)
    T, R = len(names), g.num_relations
    code = ((type_of[src].astype(np.int64) * T + type_of[dst]) * R
            + et)
    order = np.argsort(code, kind="stable")
    sc = code[order]
    if len(sc):
        bounds = np.concatenate([[0], np.nonzero(np.diff(sc))[0] + 1,
                                 [len(sc)]])
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            c = int(sc[lo])
            r, td, ts = c % R, (c // R) % T, c // (R * T)
            s_name, t_name = names[ts], names[td]
            idx = order[lo:hi]
            sl = (src[idx] - tg.type_offset[s_name]).astype(np.int32)
            dl = (dst[idx] - tg.type_offset[t_name]).astype(np.int32)
            o2 = np.argsort(dl, kind="stable")
            sigs[(s_name, r, t_name)] = (sl[o2], dl[o2])
            np.add.at(counts[t_name], (dl, r), 1.0)
    return TypedGraph(type_names=names, x=x, counts=counts, sigs=sigs,
                      type_offset=dict(tg.type_offset),
                      num_relations=g.num_relations)


def typed_encode(params, typed: TypedGraph, *, rng=None,
                 training=False, drop_out=False):
    """RGCN forward over typed tables (params = RGCN.init format:
    layers of {w_rel (R, din, dout), w_root, b})."""
    xs = {t: jnp.asarray(v) for t, v in typed.x.items()}
    layers = params["layers"]
    for li, lp in enumerate(layers):
        out = {t: jnp.dot(x, lp["w_root"],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype) + lp["b"]
               for t, x in xs.items()}
        for (s_t, r, t_t), (sl, dl) in typed.sigs.items():
            # one dense matmul + one sorted segment-sum per signature —
            # single relation, single src/dst type by construction
            msg = jnp.take(xs[s_t], sl, axis=0, mode="clip")
            msg = jnp.dot(msg, lp["w_rel"][r],
                          preferred_element_type=jnp.float32
                          ).astype(msg.dtype)
            cnt = jnp.asarray(typed.counts[t_t][:, r])
            agg = jax.ops.segment_sum(
                msg, dl, num_segments=xs[t_t].shape[0])
            out[t_t] = out[t_t] + agg / jnp.maximum(cnt, 1.0)[:, None]
        if li < len(layers) - 1:
            out = {t: jax.nn.relu(v) for t, v in out.items()}
            if drop_out:
                for t in out:
                    rng, sub = jax.random.split(rng)
                    out[t] = nn.dropout(sub, out[t], 0.2,
                                        deterministic=not training)
        xs = out
    return xs


def concat_tables(tables: Dict[str, jax.Array],
                  type_names: List[str]) -> jax.Array:
    """Typed tables → homogeneous (N, d) in global type-offset order (the
    contract the decoders/evaluators consume)."""
    return jnp.concatenate([tables[t] for t in type_names], axis=0)


def typed_encode_batch(params, batch, *, rng=None, training=False,
                       drop_out=False):
    """RGCN forward over one padded TypedBatch
    (sampling/typed_batch.py): per-type tables, per-signature masked
    edge blocks, per-batch (dst, rel) mean normalization — the
    sub-batch counterpart of ``typed_encode`` (exact homogeneous-RGCN
    parity on the induced subgraph, tests/test_typed.py)."""
    from ..sampling.typed_batch import parse_sig
    from .. import nn as _nn

    xs = {t: jnp.asarray(v) for t, v in batch.x.items()}
    layers = params["layers"]
    for li, lp in enumerate(layers):
        out = {t: jnp.dot(x, lp["w_root"],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype) + lp["b"]
               for t, x in xs.items()}
        for key, blk in batch.sigs.items():
            s_t, r, t_t = parse_sig(key)
            sl, dl, m = blk[0], blk[1], blk[2]
            msg = jnp.take(xs[s_t], sl, axis=0, mode="clip")
            msg = jnp.dot(msg, lp["w_rel"][r],
                          preferred_element_type=jnp.float32
                          ).astype(msg.dtype)
            msg = msg * m[:, None].astype(msg.dtype)
            agg = jax.ops.segment_sum(msg, dl,
                                      num_segments=xs[t_t].shape[0])
            cnt = jnp.asarray(batch.counts[t_t][:, r])
            out[t_t] = out[t_t] + agg / jnp.maximum(cnt, 1.0)[:, None]
        if li < len(layers) - 1:
            out = {t: jax.nn.relu(v) for t, v in out.items()}
            if drop_out:
                for t in sorted(out):
                    rng, sub = jax.random.split(rng)
                    out[t] = _nn.dropout(sub, out[t], 0.2,
                                         deterministic=not training)
        xs = out
    return xs
