"""End-to-end training smoke tests: KGE + GCL modules through the Trainer,
checkpoint round-trips, DPI transfer path."""

import os

import numpy as np
import pytest

from biomedkg_tpu.config import Config
from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.data.split import random_link_split
from biomedkg_tpu.sampling.loaders import (FullGraphLoader,
                                           SaintRandomWalkLoader)
from biomedkg_tpu.training.checkpoint import ModelCheckpoint
from biomedkg_tpu.training.gcl_module import create_gcl_model, load_gcl_module
from biomedkg_tpu.training.kge_module import KGEModule, load_kge_module
from biomedkg_tpu.training.trainer import Trainer

DIM = 32


@pytest.fixture(scope="module")
def splits():
    df = synthetic_triplets(num_gene=150, num_drug=60, num_disease=40,
                            num_edges=2500, seed=11)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=DIM))
    train, val, test = random_link_split(tg.graph, 0.2, 0.2, seed=0)
    return tg, train, val, test


def _kge_module(num_relation, decoder="dismult", neg_ratio=2):
    return KGEModule(
        encoder_name="rgcn", decoder_name=decoder, in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=num_relation, num_heads=2, scheduler_type="cosine",
        learning_rate=1e-3, warm_up_ratio=0.2, fuse_method="none",
        neg_ratio=neg_ratio, node_init_method="random")


def _loaders(train, val, steps=3):
    mk = lambda s, n, seed: SaintRandomWalkLoader(
        s.graph, batch_size=8, walk_length=5, num_steps=n, block_size=64,
        seed=seed)
    return mk(train, steps, 1), mk(val, 2, 2)


def test_kge_training_decreases_loss(splits, tmp_path):
    tg, train, val, test = splits
    model = _kge_module(tg.num_edge_types)
    model.edge_mapping = tg.edge_map_index
    train_loader, val_loader = _loaders(train, val, steps=10)
    ckpt_cb = ModelCheckpoint(dirpath=str(tmp_path / "ckpt"), save_top_k=1,
                              save_last=True)
    trainer = Trainer(max_epochs=3, check_val_every_n_epoch=1,
                      callbacks=[ckpt_cb], enable_progress_bar=False)
    trainer.fit(model, train_loader, val_loader)

    first = trainer.history[0]["train_loss_epoch"]
    last = trainer.history[-1]["train_loss_epoch"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first  # learning happens

    # val metrics present, bootstrapped, per-relation precision keyed by name
    val_keys = trainer.history[-1]
    assert "val_AUROC" in val_keys and "val_AUROC_std" in val_keys
    assert any(k.endswith("_pre") for k in val_keys)

    # best checkpoint exists and test() restores it
    assert ckpt_cb.best_model_path and os.path.exists(ckpt_cb.best_model_path)
    test_loader = SaintRandomWalkLoader(test.graph, batch_size=8,
                                        walk_length=5, num_steps=2,
                                        block_size=64, seed=3)
    metrics = trainer.test(model, test_loader, ckpt_path="best")
    assert "test_AUROC" in metrics
    assert 0.0 <= metrics["test_AUROC"] <= 1.0


def test_kge_checkpoint_roundtrip(splits, tmp_path):
    tg, train, _, _ = splits
    model = _kge_module(tg.num_edge_types)
    train_loader, val_loader = _loaders(train, train, steps=2)
    trainer = Trainer(max_epochs=1, enable_progress_bar=False)
    trainer.fit(model, train_loader, val_loader)
    path = str(tmp_path / "model.ckpt")
    trainer.save(path)

    module2, params2 = load_kge_module(path)
    assert module2.hparams == model.hparams
    batch = FullGraphLoader(train.graph, block_size=64).batch()
    z1 = np.asarray(model.encode(trainer.state.params, batch))
    z2 = np.asarray(module2.encode(params2, batch))
    np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)


def test_kge_fix_edge_id(splits):
    """DPI transfer path: every relation pinned (train_dpi.py:33-35)."""
    tg, train, val, _ = splits
    model = _kge_module(tg.num_edge_types)
    model.fix_edge_id = 1
    train_loader, val_loader = _loaders(train, val, steps=2)
    trainer = Trainer(max_epochs=1, enable_progress_bar=False)
    trainer.fit(model, train_loader, val_loader)
    assert np.isfinite(trainer.history[0]["train_loss_epoch"])


@pytest.mark.parametrize("decoder", ["transe", "dismult", "complex",
                                     "rotate"])
def test_all_decoders_one_step(splits, decoder):
    tg, train, _, _ = splits
    model = _kge_module(tg.num_edge_types, decoder=decoder)
    train_loader, _ = _loaders(train, train, steps=1)
    trainer = Trainer(max_epochs=1, enable_progress_bar=False)
    trainer.fit(model, train_loader, None)
    assert np.isfinite(trainer.history[0]["train_loss_epoch"])


@pytest.mark.parametrize("name", ["dgi", "grace", "ggd"])
def test_gcl_training(splits, tmp_path, name):
    tg, train, val, _ = splits
    cfg = Config._wrap({
        "model_name": name, "in_dim": DIM, "hidden_dim": 16, "out_dim": 16,
        "num_hidden_layers": 1, "scheduler_type": "cosine",
        "learning_rate": 1e-3, "warm_up_ratio": 0.2, "fuse_method": "none"})
    model = create_gcl_model(cfg)
    train_loader, val_loader = _loaders(train, val, steps=4)
    trainer = Trainer(max_epochs=2, enable_progress_bar=False)
    trainer.fit(model, train_loader, val_loader)
    assert np.isfinite(trainer.history[-1]["train_loss_epoch"])

    path = str(tmp_path / f"{name}.ckpt")
    trainer.save(path)
    module2, params2 = load_gcl_module(path)
    assert module2.model_name == name
    batch = FullGraphLoader(train.graph, block_size=64).batch()
    z = np.asarray(module2.encode(params2, batch))
    assert z.shape == (batch.x.shape[0], 16)
    assert np.isfinite(z).all()
