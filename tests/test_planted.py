"""Planted-structure ranking ceiling (VERDICT round-1 item #4).

The power-law synthetic graph gives filtered MRR ~0.06 for any decoder,
broken or not. `planted_triplets` generates edges FROM the DistMult model
class (latent factors u, d; top-m tails per head), so a correct
RGCN+DistMult training stack provably recovers high filtered MRR while a
broken one cannot (~1/N by chance). This is the end-to-end learning
regression the synthetic PrimeKG graph cannot provide.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biomedkg_tpu.data.synthetic import planted_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.eval.ranking import filtered_ranking_metrics
from biomedkg_tpu.sampling.csr import CSRGraph
from biomedkg_tpu.sampling.loaders import FullGraphLoader
from biomedkg_tpu.training.kge_module import KGEModule

N, R, K, M = 256, 4, 8, 4


def _build():
    df, u = planted_triplets(num_nodes=N, num_relations=R, latent_dim=K,
                             edges_per_head=M, seed=0)
    rng = np.random.default_rng(1)
    # features: planted factors + distractor noise dims
    feats = np.concatenate(
        [u, rng.standard_normal((N, 24)).astype(np.float32) * 0.1], axis=1)

    def encoder(names):
        idx = np.array([int(n.split("_")[1]) for n in names])
        return feats[idx]

    tg = TripletGraph(df, encoder=encoder)
    g = tg.graph
    tri = np.stack([g.edge_index[0], g.edge_type, g.edge_index[1]], 1)
    perm = np.random.default_rng(2).permutation(len(tri))
    n_test = len(tri) // 10
    return g, tri, tri[perm[:n_test]], tri[perm[n_test:]]


def test_planted_generator_shapes():
    df, u = planted_triplets(num_nodes=50, num_relations=3, latent_dim=4,
                             edges_per_head=2, seed=7)
    assert u.shape == (50, 4)
    assert len(df) == 50 * 3 * 2
    assert set(df["relation"]) == {"rel_0", "rel_1", "rel_2"}
    # no self loops, edges are unique
    assert (df["x_name"] != df["y_name"]).all()
    assert not df.duplicated(["x_name", "relation", "y_name"]).any()


@pytest.mark.slow
def test_planted_structure_recovery_mrr():
    """Trained RGCN+DistMult reaches tail-side filtered MRR >= 0.5 on the
    planted graph (observed 0.65 with this recipe; chance is ~0.03)."""
    g, tri, test_tri, train_tri = _build()
    gtrain = CSRGraph(num_nodes=g.num_nodes,
                      edge_index=np.stack([train_tri[:, 0],
                                           train_tri[:, 2]]),
                      edge_type=train_tri[:, 1], num_relations=R, x=g.x)
    batch = FullGraphLoader(gtrain).batch()

    mod = KGEModule(encoder_name="rgcn", decoder_name="dismult", in_dim=32,
                    hidden_dim=96, out_dim=24, num_hidden_layers=1,
                    num_relation=R, num_heads=2, scheduler_type="cosine",
                    learning_rate=1.5e-2, warm_up_ratio=0.05,
                    fuse_method="none", neg_ratio=16,
                    node_init_method="random")
    epochs = 800
    mod.configure_optimizers(epochs)
    state = mod.init_state(jax.random.PRNGKey(0))
    dev_batch = jax.device_put(batch)
    # whole training run = one dispatch (fused full-batch scan)
    state, _ = mod.train_fullbatch(state, dev_batch, jax.random.PRNGKey(3),
                                   epochs)

    z = np.asarray(mod.encode(state.params, batch))[:g.num_nodes]
    mets = filtered_ranking_metrics(
        mod.model.decoder, state.params["model"]["decoder"],
        jnp.asarray(z), test_tri, tri, both_sides=False, chunk=128)
    assert mets["mrr"] >= 0.5, mets
    assert mets["hits@10"] >= 0.8, mets
