"""Stage bridges: LM cache → GCL encode → KGE encode → ml_exp.

Covers the reference's cross-stage pickle-cache plumbing
(node.py:18-330) end-to-end on synthetic data in a temp cwd.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

DIM = 32


@pytest.fixture
def workspace(tmp_path, monkeypatch, repo_root):
    """Temp cwd with configs/ symlinked and an LM pickle cache pre-seeded
    for every synthetic node name (Stage A is offline LM inference — here
    replaced by deterministic vectors)."""
    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(repo_root, "configs"), tmp_path / "configs")

    from biomedkg_tpu.data.primekg import PrimeKG

    kg = PrimeKG(data_dir="./data/primekg",
                 node_type=["gene/protein", "drug", "disease"])
    rng = np.random.default_rng(0)
    cache = {name: rng.standard_normal((2, DIM)).astype(np.float32)
             for name in kg.node_list}
    os.makedirs("data/embed", exist_ok=True)
    with open("data/embed/primekg_modality_lm.pickle", "wb") as f:
        pickle.dump(cache, f)
    return tmp_path, kg


def test_lm_encode_cache_hit(workspace):
    from biomedkg_tpu.data.node_encoders import LMMultiModalsEncode

    _, kg = workspace
    enc = LMMultiModalsEncode(
        config_file="configs/lm_modality/primekg_modality.yaml",
        embed_dim=DIM)
    out = enc(kg.node_list[:10] + ["__definitely_missing__"])
    assert out.shape == (11, 2, DIM)
    assert 0 < enc.random_init_ratio < 0.2


def _train_tiny_gcl(node_type_dir, model_name="ggd", fuse="attention"):
    """Produce a GCL checkpoint in the reference's glob layout
    (ckpt/gcl/{type}/{model}*{fuse}*lm*/*.ckpt, node.py:197)."""
    from biomedkg_tpu.config import Config
    from biomedkg_tpu.data.modules import PrimeKGModule
    from biomedkg_tpu.training.gcl_module import create_gcl_model
    from biomedkg_tpu.training.trainer import Trainer

    full_type = "gene/protein" if node_type_dir == "gene" else node_type_dir
    dm = PrimeKGModule(data_dir="./data/primekg", embed_dim=DIM,
                       node_type=[full_type], batch_size=8, val_ratio=0.2,
                       test_ratio=0.2, node_init_method="lm",
                       block_size=64)
    dm.setup("split")
    cfg = Config._wrap(dict(model_name=model_name, in_dim=DIM,
                            hidden_dim=DIM, out_dim=DIM,
                            num_hidden_layers=1, scheduler_type="cosine",
                            learning_rate=1e-3, warm_up_ratio=0.2,
                            fuse_method=fuse))
    model = create_gcl_model(cfg)
    trainer = Trainer(max_epochs=1, fast_dev_run=True,
                      enable_progress_bar=False)
    trainer.fit(model, dm.train_dataloader("neighbor"),
                dm.val_dataloader("neighbor"))
    ckpt_dir = f"ckpt/gcl/{node_type_dir}/{model_name}_{fuse}_lm_0"
    os.makedirs(ckpt_dir, exist_ok=True)
    trainer.save(os.path.join(ckpt_dir, "best.ckpt"))


def test_gcl_encode_bridge(workspace):
    from biomedkg_tpu.data import node_encoders

    for nt in ["gene", "drug", "disease"]:
        _train_tiny_gcl(nt)
    enc = node_encoders.GCLEncode(model_name="ggd", fuse_method="attention",
                                  embed_dim=DIM)
    assert os.path.exists("data/gcl_embed/ggd_attention.pickle")
    _, kg = workspace
    out = enc(kg.node_list[:5])
    assert out.shape == (5, 1, DIM)
    assert enc.random_init_ratio == 0
    assert np.isfinite(out).all()


def test_kge_from_gcl_init(workspace):
    """Stage B → C: KGE training initialized from GCL embeddings
    (node_init_method='gcl', the reference's flagship multimodal config)."""
    from biomedkg_tpu.data.modules import PrimeKGModule
    from biomedkg_tpu.training.kge_module import KGEModule
    from biomedkg_tpu.training.trainer import Trainer

    for nt in ["gene", "drug", "disease"]:
        _train_tiny_gcl(nt)

    dm = PrimeKGModule(data_dir="./data/primekg", embed_dim=DIM,
                       node_type=["gene/protein", "drug", "disease"],
                       batch_size=8, val_ratio=0.2, test_ratio=0.2,
                       node_init_method="gcl", gcl_model="ggd",
                       gcl_fuse_method="attention", block_size=64)
    dm.setup("split")
    assert dm.graph.x.shape[1:] == (1, DIM)  # GCL cache rows

    model = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=dm.data.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=1, node_init_method="gcl")
    trainer = Trainer(max_epochs=1, fast_dev_run=True,
                      enable_progress_bar=False)
    trainer.fit(model, dm.train_dataloader("saint"),
                dm.val_dataloader("saint"))
    assert np.isfinite(trainer.history[0]["train_loss_epoch"])


def test_kge_encode_and_ml_exp(workspace, repo_root):
    from biomedkg_tpu.data.modules import PrimeKGModule
    from biomedkg_tpu.training.kge_module import KGEModule
    from biomedkg_tpu.training.trainer import Trainer

    _, kg = workspace
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
    trainer = Trainer(max_epochs=1, fast_dev_run=True,
                      enable_progress_bar=False)
    trainer.fit(model, dm.train_dataloader("saint"),
                dm.val_dataloader("saint"))
    os.makedirs("ckpt/kge/exp", exist_ok=True)
    trainer.save("ckpt/kge/exp/best.ckpt")

    from biomedkg_tpu.data.node_encoders import KGEEncode

    # KGEEncode hardcodes in_dim 768 for random init (reference
    # node.py:305-309); our tiny graph uses DIM, so monkey the data args
    # through the module-level class by calling with matching dims.
    enc = KGEEncode.__new__(KGEEncode)
    enc.ckpt_path = "ckpt/kge/exp/best.ckpt"
    enc.node_init_method = "random"
    enc.gcl_model = None
    enc.gcl_fuse_method = None
    enc.out_dim = DIM
    enc.embed_dim = DIM
    enc.miss_shape = (1, DIM)
    os.makedirs("data/kge_embed", exist_ok=True)
    enc.artifact_path = "data/kge_embed/exp_best"

    # build the cache directly via a full-graph forward
    from biomedkg_tpu.sampling.loaders import FullGraphLoader
    from biomedkg_tpu.training.kge_module import load_kge_module

    module, params = load_kge_module(enc.ckpt_path)
    batch = FullGraphLoader(dm.graph, block_size=64).batch()
    z = np.asarray(module.encode(params, batch))
    cache = {name: z[i:i + 1] for i, name in enumerate(kg.node_list)}
    with open(enc.artifact_path, "wb") as f:
        pickle.dump(cache, f)
    enc.node_mapping = enc._load_mapping()
    enc.random_init_ratio = 0

    out = enc(kg.node_list[:4])
    assert out.shape == (4, 1, DIM)

    # downstream ml_exp on the synthetic DTI benchmark
    sys.path.insert(0, repo_root)
    import importlib

    import ml_exp

    importlib.reload(ml_exp)
    orig_init = ml_exp.KGEEncode
    ml_exp.KGEEncode = lambda **kw: enc
    try:
        f1, ap = ml_exp.main(ckpt_path=enc.ckpt_path,
                             node_init_method="random", gcl_model=None,
                             gcl_fuse_method=None)
    finally:
        ml_exp.KGEEncode = orig_init
    assert 0.0 <= f1 <= 1.0 and 0.0 <= ap <= 1.0
