"""Multimodal fusion paths: (N, M, D) features through KGE and GCL."""

import jax
import numpy as np
import pytest

from biomedkg_tpu.models.fusion import AttentionFusion, PositionalEncoding, ReDAF
from biomedkg_tpu.sampling.batch import pad_graph_batch
from biomedkg_tpu.training.kge_module import KGEModule
from biomedkg_tpu.training.trainer import Trainer

DIM = 16


def _multimodal_batch(rng, n=60, e=300, r=3):
    x = rng.standard_normal((n, 2, DIM)).astype(np.float32)  # (N, M, D)
    ei = rng.integers(0, n, (2, e))
    et = rng.integers(0, r, e)
    return pad_graph_batch(x, ei, et, num_relations=r, node_budget=128,
                           edge_budget=512, block_size=64)


class _OneBatchLoader:
    def __init__(self, batch, n=2):
        self.batch, self.n = batch, n

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch

    def __len__(self):
        return self.n


@pytest.mark.parametrize("fuse", ["attention", "redaf", "none"])
def test_kge_lm_fusion_trains(rng, fuse):
    batch = _multimodal_batch(rng)
    model = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1, num_relation=3,
        num_heads=2, scheduler_type="linear", learning_rate=1e-3,
        warm_up_ratio=0.2, fuse_method=fuse, neg_ratio=2,
        node_init_method="lm")
    if fuse == "none":
        # reference fusion_fn falls back to a modality mean
        # (kge_module.py:77-84)
        assert model.modality_transform is None
    trainer = Trainer(max_epochs=2, enable_progress_bar=False)
    trainer.fit(model, _OneBatchLoader(batch), None)
    assert np.isfinite(trainer.history[-1]["train_loss_epoch"])
    if fuse != "none":
        assert "fusion" in trainer.state.params


def test_attention_fusion_shape(rng):
    fuser = AttentionFusion(embed_dim=DIM)
    params = fuser.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((7, 2, DIM)).astype(np.float32)
    out = fuser.apply(params, x)
    assert out.shape == (7, DIM)


def test_redaf_shape_and_dropout(rng):
    fuser = ReDAF(embed_dim=DIM)
    params = fuser.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((5, 2, DIM)).astype(np.float32)
    out_eval = fuser.apply(params, x, training=False)
    assert out_eval.shape == (5, DIM)
    out_train = fuser.apply(params, x, rng=jax.random.PRNGKey(1),
                            training=True)
    assert out_train.shape == (5, DIM)
    # dropout active only in training
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))


def test_positional_encoding_shape(rng):
    pe = PositionalEncoding(embed_dim=DIM)
    x = rng.standard_normal((2, 9, DIM)).astype(np.float32)
    out = pe.apply(x, training=False)
    assert out.shape == x.shape
