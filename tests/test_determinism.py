"""Reproducibility: same seed → identical training trajectory
(the reference relies on Lightning's deterministic=True + seed_everything,
train_kge.py:17,47)."""

import numpy as np

from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
from biomedkg_tpu.training.kge_module import KGEModule
from biomedkg_tpu.training.trainer import Trainer

DIM = 16


def _run(seed):
    df = synthetic_triplets(num_gene=80, num_drug=30, num_disease=20,
                            num_edges=1000, seed=3)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=DIM, seed=seed))
    loader = SaintRandomWalkLoader(tg.graph, batch_size=8, walk_length=4,
                                   num_steps=4, block_size=64, seed=seed)
    module = KGEModule(
        encoder_name="rgcn", decoder_name="transe", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=tg.num_edge_types, num_heads=1,
        scheduler_type="linear", learning_rate=1e-3, warm_up_ratio=0.1,
        fuse_method="none", neg_ratio=2, node_init_method="random",
        seed=seed)
    trainer = Trainer(max_epochs=2, enable_progress_bar=False)
    trainer.fit(module, loader, None)
    return [h["train_loss_epoch"] for h in trainer.history]


def test_same_seed_same_trajectory():
    a = _run(7)
    b = _run(7)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_different_seed_differs():
    assert _run(7) != _run(8)
