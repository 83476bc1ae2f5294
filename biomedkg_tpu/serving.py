"""Serving: checkpoint → resident embeddings → scoring / top-k queries.

Production-deployment surface the reference lacks: load a trained KGE
checkpoint, run ONE full-graph encode (embeddings stay device-resident),
then answer

  * ``score(head_name, relation_name, tail_name)`` → probability
  * ``topk_tails(head_name, relation_name, k)``    → ranked candidates

Top-k uses the same (1, N) MXU candidate scorers as the filtered-ranking
evaluator (models/decoders.score_all_tails).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KGEScorer:
    def __init__(self, ckpt_path: str, data_module):
        from .sampling.loaders import FullGraphLoader
        from .training.kge_module import load_kge_module

        self.module, self.params = load_kge_module(ckpt_path)
        data_module.setup(stage="split")
        self.dm = data_module
        tg = data_module.data
        self.name_to_id = {}
        for type_map in tg.node_to_global.values():
            self.name_to_id.update(type_map)
        self.id_to_name = {i: n for n, i in self.name_to_id.items()}
        self.rel_to_id = {v: k for k, v in tg.edge_map_index.items()}

        batch = FullGraphLoader(data_module.test_data.graph).batch()
        z = self.module.encode(self.params, batch)
        self.z = jax.device_put(z[: tg.graph.num_nodes])
        self.decoder = self.module.model.decoder
        self.dec_params = self.params["model"]["decoder"]

        self._score_fn = jax.jit(self.decoder.score)
        self._all_tails_fn = jax.jit(self.decoder.score_all_tails)

    def _ids(self, head: str, relation: str):
        if head not in self.name_to_id:
            raise KeyError(f"unknown node: {head!r}")
        if relation not in self.rel_to_id:
            raise KeyError(f"unknown relation: {relation!r}")
        return self.name_to_id[head], self.rel_to_id[relation]

    def score(self, head: str, relation: str, tail: str) -> float:
        h, r = self._ids(head, relation)
        t = self.name_to_id[tail]
        logit = self._score_fn(self.dec_params, self.z,
                               jnp.array([h]), jnp.array([t]),
                               jnp.array([r]))[0]
        return float(jax.nn.sigmoid(logit))

    def topk_tails(self, head: str, relation: str,
                   k: int = 10) -> List[Tuple[str, float]]:
        h, r = self._ids(head, relation)
        scores = self._all_tails_fn(self.dec_params, self.z,
                                    jnp.array([h]), jnp.array([r]))[0]
        probs = jax.nn.sigmoid(scores)
        top = jax.lax.top_k(probs, k)
        vals, idxs = np.asarray(top[0]), np.asarray(top[1])
        return [(self.id_to_name[int(i)], float(v))
                for i, v in zip(idxs, vals)]
