"""Negative-sampling semantics: counts, type shuffling, and the collision
rate of rejection-free corruption vs PyG's observed-pair exclusion
(SURVEY §7 hard-parts: quantify the distribution difference)."""

import jax
import numpy as np

from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph


def test_collision_rate_is_negligible():
    """Uniform corrupted pairs hitting a true edge: ≈ E/N² on the synthetic
    PrimeKG-schema graph; must stay well under 1%."""
    df = synthetic_triplets(num_gene=2000, num_drug=600, num_disease=400,
                            num_edges=40000, seed=0)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=4))
    g = tg.graph
    true = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    rng = np.random.default_rng(1)
    m = 200_000
    src = rng.integers(0, g.num_nodes, m)
    dst = rng.integers(0, g.num_nodes, m)
    collisions = sum((s, d) in true for s, d in zip(src, dst))
    assert collisions / m < 0.01
    # analytic bound: E / N²
    assert collisions / m < 5 * g.num_edges / g.num_nodes ** 2 + 1e-3


def test_negative_count_and_type_shuffle():
    """neg_ratio=r → r·E negatives whose type multiset equals r repeats of
    the batch types (kge_module.py:86-102 semantics)."""
    from biomedkg_tpu.sampling.batch import pad_graph_batch
    from biomedkg_tpu.training.kge_module import KGEModule

    rng = np.random.default_rng(0)
    n, e, r = 50, 200, 3
    x = rng.standard_normal((n, 8)).astype(np.float32)
    ei = rng.integers(0, n, (2, e))
    et = rng.integers(0, r, e)
    batch = pad_graph_batch(x, ei, et, num_relations=r, node_budget=64,
                            edge_budget=384, block_size=64)
    assert int(batch.edge_mask.sum()) == e  # nothing dropped

    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=8, hidden_dim=8,
        out_dim=8, num_hidden_layers=0, num_relation=r, num_heads=1,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    params = module.init(jax.random.PRNGKey(0))
    _, aux = module._forward_loss(params, batch, jax.random.PRNGKey(1),
                                  training=False)
    e_pad = batch.edge_index.shape[1]
    # predictions: E_pad positives + 2·E_pad negatives
    assert aux["pred"].shape[0] == 3 * e_pad
    w = np.asarray(aux["weights"])
    # real positives + real negatives = E + 2E
    assert int(w.sum()) == 3 * e
    # negative type multiset (over real negatives) = 2 repeats of batch types
    neg_w = w[e_pad:]
    # reconstruct neg types from the loss aux is not exposed; instead check
    # the weighted count matches: each real edge contributes its type twice.
    assert int(neg_w.sum()) == 2 * e
