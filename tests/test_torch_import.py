"""Torch/Lightning checkpoint importer (VERDICT round-3 item #5).

Fixtures are reference-format Lightning ``.ckpt`` zip archives with the
exact state_dict key vocabulary of the reference modules (committed
binaries in tests/fixtures/ + the generator that made them). Loading runs
WITHOUT lightning installed — the permissive unpickler substitutes inert
stand-ins for ``AttributeDict`` and the embedded PyGCL contrast-model
object. Numerics: the imported params must produce the same encoder
output / scores as a torch float64 twin of the reference semantics run
from the same torch weights.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
sys.path.insert(0, FIXDIR)

from gen_torch_ckpt import (  # noqa: E402
    make_grace_ckpt, make_kge_ckpt, remove_fake_lightning)


@pytest.fixture(autouse=True)
def _no_fake_lightning():
    """Loads must exercise the lightning-not-installed path."""
    remove_fake_lightning()
    yield
    remove_fake_lightning()


def test_committed_kge_fixture_loads_and_matches_torch_twin():
    import torch

    from biomedkg_tpu.sampling.batch import pad_graph_batch
    from biomedkg_tpu.training.kge_module import load_kge_module
    from test_parity import _torch_rgcn_forward

    path = os.path.join(FIXDIR, "ref_kge_tiny.ckpt")
    module, params = load_kge_module(path)
    assert module.hparams["encoder_name"] == "rgcn"
    assert module.hparams["decoder_name"] == "dismult"
    assert module.hparams["num_relation"] == 3

    # same tiny graph through both stacks
    rng = np.random.default_rng(7)
    n, e, r = 20, 60, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = rng.integers(0, r, e)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    batch = pad_graph_batch(x, np.stack([src, dst]), et, num_relations=r,
                            node_budget=32, edge_budget=128, block_size=32,
                            num_seed=n, rng=rng)
    z = np.asarray(module.encode(params, batch))[:n]

    # torch twin from the RAW torch weights (keys per reference
    # model/encoder.py RGCNConv params)
    from biomedkg_tpu.interop.torch_ckpt import _load_torch_file

    sd = {k: v.double() for k, v in
          _load_torch_file(path)["state_dict"].items()}
    layers = []
    i = 0
    while f"model.encoder.graph_layers.{i}.weight" in sd:
        p = f"model.encoder.graph_layers.{i}"
        layers.append({"w_rel": sd[p + ".weight"], "w_root": sd[p + ".root"],
                       "b": sd[p + ".bias"]})
        i += 1
    emask = torch.tensor(batch.edge_mask.astype(np.float64))
    xt = torch.from_numpy(batch.x.astype(np.float64))
    z_ref = _torch_rgcn_forward(
        layers, xt, torch.from_numpy(batch.edge_index[0].astype(np.int64)),
        torch.from_numpy(batch.edge_index[1].astype(np.int64)),
        torch.from_numpy(batch.edge_type.astype(np.int64)), emask,
        len(batch.node_mask), r)[:n].numpy()
    np.testing.assert_allclose(z, z_ref, rtol=2e-4, atol=2e-4)

    # DistMult scores from imported rel_emb
    rel = np.asarray(params["model"]["decoder"]["rel_emb"])
    want = (z_ref[src] * rel[et].astype(np.float64) * z_ref[dst]).sum(-1)
    got = np.asarray(module.model.decode(
        params["model"], np.asarray(z_ref, np.float32),
        src.astype(np.int32), dst.astype(np.int32), et.astype(np.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_committed_grace_fixture_loads_and_projects():
    import torch

    from biomedkg_tpu.training.gcl_module import load_gcl_module

    path = os.path.join(FIXDIR, "ref_grace_tiny.ckpt")
    module, params = load_gcl_module(path)
    assert module.hparams["in_dim"] == 8

    from biomedkg_tpu.interop.torch_ckpt import _load_torch_file

    sd = _load_torch_file(path)["state_dict"]
    z = np.random.default_rng(3).standard_normal((10, 8)).astype(np.float32)
    got = np.asarray(module.model.project(params["model"], z))
    import torch.nn.functional as F

    h = F.elu(torch.from_numpy(z) @ sd["model.fc1.weight"].T
              + sd["model.fc1.bias"])
    want = (h @ sd["model.fc2.weight"].T + sd["model.fc2.bias"]).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_regenerated_fixture_roundtrip(tmp_path):
    """The generator + importer agree for non-default shapes too."""
    from biomedkg_tpu.training.kge_module import load_kge_module

    p = make_kge_ckpt(str(tmp_path / "k.ckpt"), in_dim=12, hidden_dim=16,
                      out_dim=8, num_hidden_layers=2, num_relation=5,
                      seed=9)
    remove_fake_lightning()
    module, params = load_kge_module(p)
    assert module.hparams["in_dim"] == 12
    assert module.hparams["num_hidden_layers"] == 2
    layers = params["model"]["encoder"]["layers"]
    assert len(layers) == 4
    assert layers[0]["w_rel"].shape == (5, 12, 16)
    assert layers[-1]["w_rel"].shape == (5, 16, 8)
    assert params["model"]["decoder"]["rel_emb"].shape == (5, 8)

    p2 = make_grace_ckpt(str(tmp_path / "g.ckpt"), in_dim=6, hidden_dim=10,
                         out_dim=10, num_hidden_layers=1, seed=4)
    remove_fake_lightning()
    from biomedkg_tpu.training.gcl_module import load_gcl_module

    module2, params2 = load_gcl_module(p2)
    assert module2.hparams["hidden_dim"] == 10
    assert params2["model"]["fc1"]["w"].shape == (10, 10)


def test_native_ckpt_still_loads(tmp_path):
    """zip-detection must not reroute this framework's own pickles."""
    from biomedkg_tpu.training.checkpoint import (load_checkpoint,
                                                  save_checkpoint)

    p = str(tmp_path / "native.ckpt")
    save_checkpoint(p, kind="kge", hparams={"a": 1},
                    params={"w": np.ones(3, np.float32)})
    ck = load_checkpoint(p)
    assert ck["kind"] == "kge" and ck["hparams"] == {"a": 1}


def test_unrecognized_torch_zip_errors(tmp_path):
    import torch

    from biomedkg_tpu.training.checkpoint import load_checkpoint

    p = str(tmp_path / "odd.ckpt")
    torch.save({"weights": torch.ones(2)}, p)
    with pytest.raises(ValueError, match="state_dict"):
        load_checkpoint(p)

    p2 = str(tmp_path / "odd2.ckpt")
    torch.save({"state_dict": {"foo.bar": torch.ones(2)},
                "hyper_parameters": {}}, p2)
    with pytest.raises(ValueError, match="unrecognized"):
        load_checkpoint(p2)


def test_dgi_and_ggd_fixtures_import(tmp_path):
    from gen_torch_ckpt import make_gcl_ckpt

    from biomedkg_tpu.training.gcl_module import load_gcl_module

    p = make_gcl_ckpt(str(tmp_path / "dgi.ckpt"), "dgi", hidden_dim=8)
    remove_fake_lightning()
    module, params = load_gcl_module(p)
    assert module.hparams["hidden_dim"] == 8
    assert params["model"]["project"]["w"].shape == (8, 8)

    p2 = make_gcl_ckpt(str(tmp_path / "ggd.ckpt"), "ggd", n_proj=2)
    remove_fake_lightning()
    module2, params2 = load_gcl_module(p2)
    assert len(params2["model"]["mlp"]) == 2
    # projector output parity with the raw torch weights
    import torch

    from biomedkg_tpu.interop.torch_ckpt import _load_torch_file

    sd = _load_torch_file(p2)["state_dict"]
    z = np.random.default_rng(1).standard_normal((6, 8)).astype(np.float32)
    h = torch.relu(torch.from_numpy(z) @ sd["model.mlp.0.weight"].T
                   + sd["model.mlp.0.bias"])
    want = (h @ sd["model.mlp.1.weight"].T + sd["model.mlp.1.bias"]).numpy()
    import jax.numpy as jnp

    from biomedkg_tpu import nn as bnn

    got = np.asarray(bnn.linear_apply(
        params2["model"]["mlp"][1],
        jax.nn.relu(bnn.linear_apply(params2["model"]["mlp"][0],
                                     jnp.asarray(z)))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kge_fusion_and_complex_import(tmp_path):
    import torch
    import torch.nn.functional as F

    from biomedkg_tpu.interop.torch_ckpt import _load_torch_file
    from biomedkg_tpu.training.kge_module import load_kge_module

    p = make_kge_ckpt(str(tmp_path / "fuse.ckpt"), fuse_method="attention",
                      decoder="complex", out_dim=8, seed=3)
    remove_fake_lightning()
    module, params = load_kge_module(p)
    assert module.hparams["fuse_method"] == "attention"
    assert module.hparams["node_init_method"] == "lm"
    assert module.modality_transform is not None
    assert "fusion" in params

    # AttentionFusion output parity on a (N, M, d) modality stack
    sd = _load_torch_file(p)["state_dict"]
    x = np.random.default_rng(2).standard_normal((5, 2, 8)) \
        .astype(np.float32)
    xt = torch.from_numpy(x)
    q = xt @ sd["modality_transform.q_proj.weight"].T \
        + sd["modality_transform.q_proj.bias"]
    k = xt @ sd["modality_transform.k_proj.weight"].T \
        + sd["modality_transform.k_proj.bias"]
    v = xt @ sd["modality_transform.v_proj.weight"].T \
        + sd["modality_transform.v_proj.bias"]
    want = F.scaled_dot_product_attention(q, k, v).mean(dim=1).numpy()
    got = np.asarray(module.fusion_fn(params, x, training=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # ComplEx half-width repack: [real[:, :h] | imag[:, :h]]
    rel = sd["model.decoder.rel_emb"].numpy()
    imag = sd["model.decoder.rel_emb_imag"].numpy()
    want_rel = np.concatenate([rel[:, :4], imag[:, :4]], axis=1)
    np.testing.assert_allclose(params["model"]["decoder"]["rel_emb"],
                               want_rel)


def test_complex_fullwidth_roundtrip_torch_twin(tmp_path):
    """VERDICT r4 item #7: round-trip a synthetic FULL-WIDTH ComplEx ckpt
    (the reference's as-shipped layout, decoder.py:52-77) through a torch
    twin to pin the repack semantics. The imported half-width packed
    decoder must reproduce EXACTLY (f64 twin, f32 import → 1e-4) the
    scores of the minimal runnable fix of the reference forward
    (rel_real = rel_emb[:, :d/2], rel_imag = rel_emb_imag[:, :d/2]); and
    the dropped second halves must influence nothing — perturbing them in
    the stored checkpoint leaves imported scores bit-identical."""
    import torch

    from biomedkg_tpu.interop.torch_ckpt import _load_torch_file
    from biomedkg_tpu.training.kge_module import load_kge_module

    p = make_kge_ckpt(str(tmp_path / "cx.ckpt"), decoder="complex",
                      out_dim=16, hidden_dim=16, seed=11)
    remove_fake_lightning()
    with pytest.warns(UserWarning, match="FULL-width"):
        module, params = load_kge_module(p)
    ck = __import__("biomedkg_tpu.training.checkpoint",
                    fromlist=["load_checkpoint"]).load_checkpoint(p)
    assert "complex_repack" in ck["extras"]

    rng = np.random.default_rng(5)
    n, e = 12, 40
    z = rng.standard_normal((n, 16)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    sd = _load_torch_file(p)["state_dict"]
    et = rng.integers(0, sd["model.decoder.rel_emb"].shape[0],
                      e).astype(np.int32)

    # torch f64 twin of the minimal-fix reference forward
    zt = torch.from_numpy(z).double()
    rel_r = sd["model.decoder.rel_emb"].double()[:, :8]
    rel_i = sd["model.decoder.rel_emb_imag"].double()[:, :8]
    h, t = zt[src], zt[dst]
    hr, hi = torch.chunk(h, 2, dim=-1)
    tr, ti = torch.chunk(t, 2, dim=-1)
    rr, ri = rel_r[et], rel_i[et]
    want = ((hr * rr - hi * ri) * tr
            + (hr * ri + hi * rr) * ti).sum(-1).numpy()

    got = np.asarray(module.model.decode(params["model"], z, src, dst, et))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # perturb the SECOND halves in the stored ckpt: imported scores must
    # not move — that is precisely what the repack drops
    raw = _load_torch_file(p)
    raw["hyper_parameters"] = dict(raw["hyper_parameters"])  # picklable
    raw["state_dict"]["model.decoder.rel_emb"][:, 8:] += 100.0
    raw["state_dict"]["model.decoder.rel_emb_imag"][:, 8:] -= 100.0
    p2 = str(tmp_path / "cx_perturbed.ckpt")
    torch.save(raw, p2)
    with pytest.warns(UserWarning, match="FULL-width"):
        module2, params2 = load_kge_module(p2)
    got2 = np.asarray(module2.model.decode(params2["model"], z, src,
                                           dst, et))
    np.testing.assert_array_equal(got, got2)


def test_complex_halfwidth_tables_import_losslessly(tmp_path):
    """A sanely-fixed reference variant stores HALF-width rel tables
    (out_dim//2): the importer must detect the width and concatenate the
    whole tables — exact, no warning, no dropped columns."""
    import warnings as _w

    from biomedkg_tpu.interop.torch_ckpt import _load_torch_file
    from biomedkg_tpu.training.kge_module import load_kge_module

    p = make_kge_ckpt(str(tmp_path / "cxh.ckpt"), decoder="complex",
                      out_dim=16, hidden_dim=16, complex_halfwidth=True,
                      seed=13)
    remove_fake_lightning()
    with _w.catch_warnings():
        _w.simplefilter("error")
        module, params = load_kge_module(p)
    sd = _load_torch_file(p)["state_dict"]
    assert sd["model.decoder.rel_emb"].shape[1] == 8
    want = np.concatenate([sd["model.decoder.rel_emb"].numpy(),
                           sd["model.decoder.rel_emb_imag"].numpy()],
                          axis=1)
    np.testing.assert_array_equal(params["model"]["decoder"]["rel_emb"],
                                  want)


def test_missing_hparams_warn_and_land_in_extras(tmp_path):
    """VERDICT r4 weak #5: every hparam the importer derives instead of
    reading from ``hyper_parameters`` must warn on stderr AND be recorded
    in extras["derived_hparams"]; assumed guesses (lr, neg_ratio, …) are
    called out separately from shape-inferred dims."""
    from biomedkg_tpu.training.checkpoint import load_checkpoint

    p = make_kge_ckpt(
        str(tmp_path / "nohp.ckpt"), seed=21,
        drop_hparams=("learning_rate", "neg_ratio", "num_relation",
                      "num_heads", "warm_up_ratio"))
    remove_fake_lightning()
    with pytest.warns(UserWarning, match="ASSUMED defaults") as rec:
        ck = load_checkpoint(p)
    assert any("num_relation=3" in str(w.message) for w in rec)
    derived = ck["extras"]["derived_hparams"]
    assert set(derived) == {"learning_rate", "neg_ratio", "num_relation",
                            "num_heads", "warm_up_ratio"}
    assert derived["num_relation"] == 3      # shape-inferred, correct
    assert ck["hparams"]["num_relation"] == 3
    # read fields are NOT flagged
    assert "in_dim" not in derived

    # a complete hyper_parameters dict imports silently
    import warnings as _w

    p2 = make_kge_ckpt(str(tmp_path / "full.ckpt"), seed=22)
    remove_fake_lightning()
    with _w.catch_warnings():
        _w.simplefilter("error")
        ck2 = load_checkpoint(p2)
    assert "derived_hparams" not in ck2["extras"]


def test_redaf_fusion_import(tmp_path):
    from biomedkg_tpu.training.kge_module import load_kge_module

    p = make_kge_ckpt(str(tmp_path / "redaf.ckpt"), fuse_method="redaf",
                      seed=5)
    remove_fake_lightning()
    module, params = load_kge_module(p)
    assert module.hparams["fuse_method"] == "redaf"
    f = params["fusion"]
    assert f["modal_weights"].shape == (2, 1, 8)
    assert f["sub_type_emb"]["table"].shape == (2, 8)
    assert f["transform"]["w"].shape == (8, 8)
    assert f["rel_context"]["w"].shape == (8, 8)
    # the module applies it without shape errors
    x = np.zeros((4, 2, 8), np.float32)
    out = np.asarray(module.fusion_fn(params, x, training=False))
    assert out.shape == (4, 8) and np.isfinite(out).all()
