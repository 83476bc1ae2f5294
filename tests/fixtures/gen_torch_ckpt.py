"""Generate reference-format Lightning ``.ckpt`` fixtures.

Writes torch zip-archive checkpoints with the exact ``state_dict`` key
vocabulary of the reference modules (reference kge_module.py /
gcl_module.py / model/{encoder,decoder,gcl}.py) WITHOUT needing
lightning/PyG installed: stand-in modules are registered under lightning's
real import paths before pickling, so the pickle stream references
``lightning.pytorch.utilities.parsing.AttributeDict`` etc. byte-for-byte
like a real Lightning save — and loading in an environment without
lightning exercises the importer's permissive-unpickler path.

Usage: ``python tests/fixtures/gen_torch_ckpt.py [outdir]`` (committed
binaries live next to this script; tests also regenerate into tmpdirs).
"""

from __future__ import annotations

import sys
import types

import torch

_FAKE_MODULES = [
    "lightning", "lightning.pytorch", "lightning.pytorch.utilities",
    "lightning.pytorch.utilities.parsing", "GCL", "GCL.models",
]


def install_fake_lightning():
    """Register stand-ins under lightning's import paths; returns the
    module names that were injected (so callers can remove them before
    load to simulate an environment without lightning)."""
    injected = []
    for name in _FAKE_MODULES:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            injected.append(name)
    parsing = sys.modules["lightning.pytorch.utilities.parsing"]
    if not hasattr(parsing, "AttributeDict"):
        AttributeDict = type("AttributeDict", (dict,),
                             {"__module__":
                              "lightning.pytorch.utilities.parsing"})
        parsing.AttributeDict = AttributeDict
    gclm = sys.modules["GCL.models"]
    if not hasattr(gclm, "DualBranchContrast"):
        gclm.DualBranchContrast = type(
            "DualBranchContrast", (),
            {"__module__": "GCL.models",
             "__init__": lambda self, **kw: self.__dict__.update(kw)})
    return injected


def remove_fake_lightning():
    for name in _FAKE_MODULES:
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__file__", None) is None:
            del sys.modules[name]


def _lin(g, dout, din):
    return (torch.randn(dout, din, generator=g) * 0.2,
            torch.randn(dout, generator=g) * 0.05)


def make_kge_ckpt(path, in_dim=8, hidden_dim=8, out_dim=8,
                  num_hidden_layers=0, num_relation=3, seed=0,
                  decoder="dismult", fuse_method=None,
                  complex_halfwidth=False, drop_hparams=()):
    """RGCN + decoder KGEModule checkpoint (reference kge_module.py:19-75,
    PyG RGCNConv params weight/root/bias; optional AttentionFusion/ReDAF
    modality_transform per reference utils/fusion.py)."""
    install_fake_lightning()
    AttributeDict = sys.modules[
        "lightning.pytorch.utilities.parsing"].AttributeDict
    g = torch.Generator().manual_seed(seed)
    dims = [(in_dim, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * num_hidden_layers
    dims += [(hidden_dim, out_dim)]
    sd = {}
    for i, (din, dout) in enumerate(dims):
        p = f"model.encoder.graph_layers.{i}"
        sd[p + ".weight"] = torch.randn(num_relation, din, dout,
                                        generator=g) * 0.2
        sd[p + ".root"] = torch.randn(din, dout, generator=g) * 0.2
        sd[p + ".bias"] = torch.randn(dout, generator=g) * 0.05
    # complex_halfwidth models a sanely-FIXED reference variant whose rel
    # tables are out_dim//2 wide (the as-shipped full-width layout cannot
    # run, reference decoder.py:52-77)
    rel_width = out_dim // 2 if (decoder == "complex"
                                 and complex_halfwidth) else out_dim
    sd["model.decoder.rel_emb"] = torch.randn(num_relation, rel_width,
                                              generator=g) * 0.2
    if decoder == "complex":
        sd["model.decoder.rel_emb_imag"] = torch.randn(
            num_relation, rel_width, generator=g) * 0.2
    if fuse_method == "attention":
        for name in ("q_proj", "k_proj", "v_proj"):
            w, b = _lin(g, in_dim, in_dim)
            sd[f"modality_transform.{name}.weight"] = w
            sd[f"modality_transform.{name}.bias"] = b
    elif fuse_method == "redaf":
        sd["modality_transform.modal_weights"] = torch.ones(2, 1, in_dim)
        sd["modality_transform.sub_type_embeddings.weight"] = \
            torch.randn(2, in_dim, generator=g) * 0.2
        for name in ("transform_layer", "relational_context_layer"):
            w, b = _lin(g, in_dim, in_dim)
            sd[f"modality_transform.{name}.weight"] = w
            sd[f"modality_transform.{name}.bias"] = b
    hp = AttributeDict(
        encoder_name="rgcn", decoder_name=decoder, in_dim=in_dim,
        hidden_dim=hidden_dim, out_dim=out_dim,
        num_hidden_layers=num_hidden_layers, num_relation=num_relation,
        num_heads=1, scheduler_type="cosine", learning_rate=1e-3,
        warm_up_ratio=0.2, fuse_method=fuse_method, neg_ratio=10,
        node_init_method="lm" if fuse_method else "random")
    for k in drop_hparams:
        hp.pop(k, None)
    torch.save({"state_dict": sd, "hyper_parameters": hp,
                "global_step": 123, "epoch": 4,
                "pytorch-lightning_version": "2.2.0"}, path)
    return path


def make_gcl_ckpt(path, model_name, in_dim=8, hidden_dim=8, out_dim=8,
                  num_hidden_layers=0, n_proj=1, seed=2):
    """DGI (``model.project``) or GGD (``model.mlp.{i}``) checkpoint
    (reference model/gcl.py:8-27,55-94)."""
    install_fake_lightning()
    AttributeDict = sys.modules[
        "lightning.pytorch.utilities.parsing"].AttributeDict
    g = torch.Generator().manual_seed(seed)
    dims = [(in_dim, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * num_hidden_layers
    dims += [(hidden_dim, out_dim)]
    sd = {}
    for i, (din, dout) in enumerate(dims):
        p = f"model.encoder.graph_layers.{i}"
        w, b = _lin(g, dout, din)
        sd[p + ".lin.weight"] = w
        sd[p + ".bias"] = b
    if model_name == "dgi":
        # reference DGI: Linear(hidden, hidden), PyG-uniform weight
        w, b = _lin(g, hidden_dim, hidden_dim)
        sd["model.project.weight"] = w
        sd["model.project.bias"] = b
    elif model_name == "ggd":
        for i in range(n_proj):
            w, b = _lin(g, hidden_dim, hidden_dim)
            sd[f"model.mlp.{i}.weight"] = w
            sd[f"model.mlp.{i}.bias"] = b
    else:
        raise ValueError(model_name)
    hp = AttributeDict(
        in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
        num_hidden_layers=num_hidden_layers, scheduler_type="cosine",
        learning_rate=2e-4, warm_up_ratio=0.03, fuse_method=None)
    torch.save({"state_dict": sd, "hyper_parameters": hp,
                "global_step": 9, "epoch": 1,
                "pytorch-lightning_version": "2.2.0"}, path)
    return path


def make_grace_ckpt(path, in_dim=8, hidden_dim=8, out_dim=8,
                    num_hidden_layers=0, seed=1):
    """GRACEModule checkpoint (reference gcl_module.py:146-190, GCNEncoder
    ``lin.weight``/``bias`` + fc1/fc2 projector); hyper_parameters embed an
    unimportable GCL contrast-model object like a real save would."""
    install_fake_lightning()
    AttributeDict = sys.modules[
        "lightning.pytorch.utilities.parsing"].AttributeDict
    DualBranchContrast = sys.modules["GCL.models"].DualBranchContrast
    g = torch.Generator().manual_seed(seed)
    dims = [(in_dim, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * num_hidden_layers
    dims += [(hidden_dim, out_dim)]
    sd = {}
    for i, (din, dout) in enumerate(dims):
        p = f"model.encoder.graph_layers.{i}"
        w, b = _lin(g, dout, din)
        sd[p + ".lin.weight"] = w
        sd[p + ".bias"] = b
    for name, (din, dout) in (("fc1", (out_dim, hidden_dim)),
                              ("fc2", (hidden_dim, out_dim))):
        w, b = _lin(g, dout, din)
        sd[f"model.{name}.weight"] = w
        sd[f"model.{name}.bias"] = b
    hp = AttributeDict(
        in_dim=in_dim, hidden_dim=hidden_dim, out_dim=out_dim,
        num_hidden_layers=num_hidden_layers, scheduler_type="cosine",
        learning_rate=2e-4, warm_up_ratio=0.03, fuse_method=None,
        embed_dim=in_dim, feature_embedding_dim=in_dim,
        contrast_model=DualBranchContrast(mode="L2L", intraview_negs=True))
    torch.save({"state_dict": sd, "hyper_parameters": hp,
                "global_step": 77, "epoch": 2,
                "pytorch-lightning_version": "2.2.0"}, path)
    return path


if __name__ == "__main__":
    import os

    outdir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.dirname(os.path.abspath(__file__))
    print(make_kge_ckpt(os.path.join(outdir, "ref_kge_tiny.ckpt")))
    print(make_grace_ckpt(os.path.join(outdir, "ref_grace_tiny.ckpt")))
