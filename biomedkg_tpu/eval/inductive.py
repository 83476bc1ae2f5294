"""Cold-start evaluation on unseen-node edges (data/inductive.py).

Protocol (BASELINE.json north star; no reference counterpart exists —
the enabling mechanism is reference node.py:33-41 + embed.py:27-50):

  1. encode the FULL graph over the seen-only message-passing edges —
     unseen nodes are isolated and receive feature-only embeddings
     through the encoder's root transform;
  2. binary metrics: score the held-out unseen-touching edges as
     positives against ``neg_ratio`` iid corruptions where the UNSEEN
     endpoint of each edge is replaced by a random unseen node (the
     honest cold-start discrimination task: can the model tell which
     new node an edge belongs to?  Corrupting the seen endpoint or
     sampling from all nodes leaks transductive signal);
  3. filtered ranking restricted to the unseen-touching test triples
     (eval/ranking.py), filter = all known triples.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from ..sampling.loaders import FullGraphLoader
from ..training.metrics import BootstrappedBinaryMetrics
from .ranking import filtered_ranking_metrics


def encode_full_graph(module, params, graph, block_size: int = 256):
    """Full-graph node embeddings via the module's deterministic forward
    (one padded batch; PrimeKG++ fits single-chip HBM)."""
    layout = getattr(module, "edge_layout", "relation")
    batch = FullGraphLoader(graph, block_size=block_size,
                            edge_layout=layout).batch()
    z = module.encode(params, batch)
    return np.asarray(z[:graph.num_nodes])


def unseen_binary_metrics(module, params, z, split, neg_ratio: int = 3,
                          seed: int = 0, prefix: str = "unseen_",
                          which: str = "test") -> Dict[str, float]:
    """AUROC/AP/F1 on unseen-touching edges vs unseen-endpoint corruption."""
    ei = split.test_edge_index if which == "test" else split.val_edge_index
    et = split.test_edge_type if which == "test" else split.val_edge_type
    if ei.shape[1] == 0:
        return {}
    rng = np.random.default_rng(seed)
    src, dst = ei[0].copy(), ei[1].copy()
    unseen = split.unseen_nodes

    dec = module.model.decoder
    dec_params = params["model"]["decoder"]
    score = jax.jit(dec.score)

    def _score(h, t, r):
        return np.asarray(score(dec_params, z, np.asarray(h),
                                np.asarray(t), np.asarray(r)))

    pos = _score(src, dst, et)
    if len(unseen) < 2:
        raise ValueError(
            f"unseen-node eval needs >= 2 held-out nodes to corrupt "
            f"against (got {len(unseen)}): every 'negative' would equal "
            "its positive and AUROC would pin at 0.5")
    negs = []
    src_unseen = split.unseen_mask[src]
    for _ in range(max(1, neg_ratio)):
        repl = rng.choice(unseen, size=len(src))
        # never draw the edge's own endpoint: a corruption equal to the
        # true node is the positive triple relabeled 0 (a guaranteed tie
        # that biases AUROC/AP down by ~1/|unseen| per resample)
        true_end = np.where(src_unseen, src, dst)
        coll = repl == true_end
        while coll.any():
            repl = np.where(coll, rng.choice(unseen, size=len(src)), repl)
            coll = repl == true_end
        # corrupt the unseen endpoint (head if the head is unseen, else
        # tail; both-unseen edges corrupt the head)
        ns = np.where(src_unseen, repl, src)
        nd = np.where(src_unseen, dst, repl)
        negs.append(_score(ns, nd, et))
    neg = np.concatenate(negs)

    m = BootstrappedBinaryMetrics(prefix=prefix, seed=seed)
    m.update(np.concatenate([pos, neg]),
             np.concatenate([np.ones_like(pos), np.zeros_like(neg)]))
    return m.compute()


def unseen_ranking_metrics(module, params, z, split, graph,
                           ks=(1, 3, 10), chunk: int = 1024,
                           max_triples: Optional[int] = None,
                           seed: int = 0) -> Dict[str, float]:
    """Filtered MRR/Hits@K restricted to unseen-touching test triples."""
    ei, et = split.test_edge_index, split.test_edge_type
    if ei.shape[1] == 0:
        return {}
    test_triples = np.stack([ei[0], et.astype(np.int64), ei[1]], axis=1)
    if max_triples is not None and len(test_triples) > max_triples:
        rng = np.random.default_rng(seed)
        test_triples = test_triples[
            rng.choice(len(test_triples), max_triples, replace=False)]
    all_triples = np.stack([graph.edge_index[0],
                            graph.edge_type.astype(np.int64),
                            graph.edge_index[1]], axis=1)
    out = filtered_ranking_metrics(
        module.model.decoder, params["model"]["decoder"], z,
        test_triples, all_triples, ks=ks, chunk=chunk)
    return {f"unseen_{k}": v for k, v in out.items()}


def inductive_eval(module, params, split, graph, neg_ratio: int = 3,
                   seed: int = 0, block_size: int = 256,
                   ranking: bool = True,
                   max_rank_triples: Optional[int] = 2048) -> Dict[str, float]:
    """Full cold-start eval: encode seen-only graph, score unseen edges."""
    g = split.eval_graph
    if g.x is None:
        g = CSRGraph_with_x(g, graph.x)
    z = encode_full_graph(module, params, g, block_size=block_size)
    out = unseen_binary_metrics(module, params, z, split,
                                neg_ratio=neg_ratio, seed=seed)
    if ranking:
        out.update(unseen_ranking_metrics(
            module, params, z, split, graph,
            max_triples=max_rank_triples, seed=seed))
    out["unseen_num_nodes"] = float(len(split.unseen_nodes))
    out["unseen_num_test_edges"] = float(split.test_edge_index.shape[1])
    return out


def run_entrypoint_inductive_eval(model, trainer, data_module, cfg):
    """Shared entry-point hook (train/test_kge, train/test_dpi): when the
    data module was built with ``data.unseen_node_ratio > 0``, run the
    cold-start eval with the just-tested params and print/log metrics."""
    split = getattr(data_module, "inductive", None)
    if split is None:
        return None
    out = inductive_eval(
        model, trainer.tested_params, split, data_module.graph,
        neg_ratio=model.neg_ratio or 3,
        seed=getattr(cfg, "seed", 42),
        block_size=data_module.block_size,
        ranking=bool(cfg.get("unseen_ranking", True)),
        max_rank_triples=int(cfg.get("unseen_rank_max_triples", 2048)))
    print("unseen-node (inductive) metrics:")
    for k in sorted(out):
        print(f"  {k}: {out[k]:.6f}")
    if getattr(trainer, "logger", None):
        trainer.logger.log(out, trainer.global_step)
    return out


def CSRGraph_with_x(g, x):
    from ..sampling.csr import CSRGraph

    return CSRGraph(num_nodes=g.num_nodes, edge_index=g.edge_index,
                    edge_type=g.edge_type, num_relations=g.num_relations,
                    x=x)
