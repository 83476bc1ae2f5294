"""Serving layer + full-batch training mode."""

import numpy as np
import pytest

from biomedkg_tpu.data.modules import PrimeKGModule
from biomedkg_tpu.training.kge_module import KGEModule
from biomedkg_tpu.training.trainer import Trainer

DIM = 16


def _train_tiny(tmp_path, monkeypatch, loader_type="saint"):
    monkeypatch.chdir(tmp_path)
    dm = PrimeKGModule(data_dir="./data/primekg", embed_dim=DIM,
                       node_type=["gene/protein", "drug", "disease"],
                       batch_size=8, val_ratio=0.2, test_ratio=0.2,
                       node_init_method="random", block_size=64)
    dm.setup("split")
    model = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=dm.data.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=1, node_init_method="random")
    trainer = Trainer(max_epochs=1, fast_dev_run=(loader_type != "full"),
                      enable_progress_bar=False)
    if loader_type == "full":

        class _N:  # 3-step full-batch epoch
            pass

        dm.SAINT_TRAIN_STEPS = 3
        trainer.fast_dev_run = False
    trainer.fit(model, dm.train_dataloader(loader_type),
                dm.val_dataloader(loader_type))
    return dm, model, trainer


def test_full_batch_training(tmp_path, monkeypatch):
    dm, model, trainer = _train_tiny(tmp_path, monkeypatch,
                                     loader_type="full")
    assert int(trainer.state.step) == 3
    assert np.isfinite(trainer.history[0]["train_loss_epoch"])


def test_scorer(tmp_path, monkeypatch):
    from biomedkg_tpu.serving import KGEScorer

    dm, model, trainer = _train_tiny(tmp_path, monkeypatch)
    trainer.save(str(tmp_path / "m.ckpt"))

    dm2 = PrimeKGModule(data_dir="./data/primekg", embed_dim=DIM,
                        node_type=["gene/protein", "drug", "disease"],
                        batch_size=8, val_ratio=0.2, test_ratio=0.2,
                        node_init_method="random", block_size=64)
    scorer = KGEScorer(str(tmp_path / "m.ckpt"), dm2)

    # pick a real triple from the graph
    g = dm2.graph
    h_id, t_id = int(g.edge_index[0, 0]), int(g.edge_index[1, 0])
    rel = dm2.edge_map_index[int(g.edge_type[0])]
    h_name = scorer.id_to_name[h_id]
    t_name = scorer.id_to_name[t_id]

    p = scorer.score(h_name, rel, t_name)
    assert 0.0 <= p <= 1.0

    top = scorer.topk_tails(h_name, rel, k=5)
    assert len(top) == 5
    assert all(0.0 <= v <= 1.0 for _, v in top)
    # top-1 probability >= the probability of any specific tail
    assert top[0][1] >= p - 1e-6

    with pytest.raises(KeyError):
        scorer.score("nonexistent_node", rel, t_name)

    # batched path: one dispatch per bucket, same numbers as the
    # single-query path (incl. a size that is not a bucket multiple)
    triples = []
    for e in range(67):
        e = e % g.edge_index.shape[1]
        triples.append((scorer.id_to_name[int(g.edge_index[0, e])],
                        dm2.edge_map_index[int(g.edge_type[e])],
                        scorer.id_to_name[int(g.edge_index[1, e])]))
    batched = scorer.score_many(triples)
    assert len(batched) == 67
    singles = [scorer.score(*t) for t in triples[:5]]
    np.testing.assert_allclose(batched[:5], singles, rtol=1e-5)
    assert scorer.score_many([]) == []
    with pytest.raises(KeyError):
        scorer.score_many([(h_name, rel, "nonexistent_node")])
