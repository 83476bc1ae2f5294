"""RGAT encoder training and DPIModule (ToUndirected) semantics."""

import numpy as np

from biomedkg_tpu.data.modules import DPIModule
from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
from biomedkg_tpu.training.kge_module import KGEModule
from biomedkg_tpu.training.trainer import Trainer

DIM = 16


def test_rgat_trains():
    df = synthetic_triplets(num_gene=80, num_drug=30, num_disease=20,
                            num_edges=1000, seed=4)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=DIM))
    loader = SaintRandomWalkLoader(tg.graph, batch_size=8, walk_length=4,
                                   num_steps=4, block_size=64, seed=1)
    model = KGEModule(
        encoder_name="rgat", decoder_name="transe", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    trainer = Trainer(max_epochs=2, enable_progress_bar=False)
    trainer.fit(model, loader, None)
    losses = [h["train_loss_epoch"] for h in trainer.history]
    assert all(np.isfinite(losses))
    assert losses[-1] <= losses[0] + 0.05


def test_dpi_module_undirected(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    dm = DPIModule(data_dir=str(tmp_path / "missing.csv"), embed_dim=DIM,
                   batch_size=8, val_ratio=0.2, test_ratio=0.2,
                   node_init_method="random", block_size=64)
    dm.setup("split")
    g = dm.graph
    # ToUndirected doubled the (deduplicated) DTI edges
    assert g.num_edges == 2 * dm.dpi.df.drop_duplicates(
        subset=["x_name", "relation", "y_name"]).shape[0]
    # every edge has its reverse with the same type
    fwd = set(zip(g.edge_index[0], g.edge_index[1], g.edge_type))
    assert all((d, s, t) in fwd for s, d, t in list(fwd)[:100])
    # loaders work on the undirected graph
    batch = next(iter(dm.train_dataloader("saint")))
    assert batch.edge_mask.any()
