"""Entry-point CLI smoke tests: the reference's scripts/test/*.sh analog,
run as subprocesses on the CPU platform in a temp workspace."""

import os
import subprocess
import sys

import pytest


def _run(repo_root, tmp_path, script, overrides):
    env = dict(os.environ)
    env["BIOMEDKG_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    if not (tmp_path / "configs").exists():
        os.symlink(os.path.join(repo_root, "configs"),
                   tmp_path / "configs")
    cmd = [sys.executable, os.path.join(repo_root, script)] + overrides
    return subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                          text=True, timeout=600)


COMMON = ["devices=[0]", "epochs=1", "debug=true", "data.batch_size=8",
          "data.embed_dim=32"]

KGE_OVERRIDES = COMMON + [
    "neg_ratio=1", "data.node_init_method=random", "model.in_dim=32",
    "model.hidden_dim=32", "model.out_dim=32", "model.encoder_name=rgcn",
    "model.decoder_name=dismult"]


@pytest.mark.slow
def test_train_kge_cli(repo_root, tmp_path):
    r = _run(repo_root, tmp_path, "train_kge.py", KGE_OVERRIDES)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "test_AUROC" in r.stdout


@pytest.mark.slow
def test_train_gcl_cli(repo_root, tmp_path):
    r = _run(repo_root, tmp_path, "train_gcl.py", COMMON + [
        "data.node_type=drug", "data.node_init_method=random",
        "model.model_name=ggd", "model.in_dim=32", "model.hidden_dim=16",
        "model.out_dim=16", "model.fuse_method=none"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "test_loss" in r.stdout


@pytest.mark.slow
def test_train_dpi_cli(repo_root, tmp_path):
    r = _run(repo_root, tmp_path, "train_dpi.py", KGE_OVERRIDES)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "test_AUROC" in r.stdout


@pytest.mark.slow
def test_kge_ckpt_then_test_and_rank_eval(repo_root, tmp_path):
    """Full round-trip: train (non-debug, 1 epoch) → test_kge.py →
    rank_eval.py from the produced checkpoint."""
    import glob

    overrides = [o for o in KGE_OVERRIDES if o != "debug=true"]
    r = _run(repo_root, tmp_path, "train_kge.py",
             overrides + ["epochs=1", "val_every_epoch=1",
                          "data.batch_size=4"])
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = glob.glob(str(tmp_path / "ckpt/kge/*/last.ckpt"))
    assert ckpts, r.stdout[-2000:]

    r2 = _run(repo_root, tmp_path, "test_kge.py",
              overrides + [f"pretrained_path={ckpts[0]}", "neg_ratio=3"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "test_AUROC" in r2.stdout

    r3 = _run(repo_root, tmp_path, "rank_eval.py",
              overrides + [f"pretrained_path={ckpts[0]}"])
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "mrr" in r3.stdout and "hits@10" in r3.stdout


@pytest.mark.slow
def test_kge_eval_from_reference_torch_ckpt(repo_root, tmp_path):
    """test_kge.py + rank_eval.py run directly from a reference-format
    Lightning .ckpt (VERDICT round-3 item #5 'done' criterion): the
    zip-magic detour in load_checkpoint converts the torch state_dict in
    place, so the published pretrained weights are a drop-in."""
    sys.path.insert(0, os.path.join(repo_root, "tests", "fixtures"))
    from gen_torch_ckpt import make_kge_ckpt, remove_fake_lightning

    ckpt = str(tmp_path / "ref_lightning.ckpt")
    # dims matching the CLI synthetic fallback: embed_dim=32 features,
    # 8 relation signatures (data/synthetic.py PRIMEKG_RELATIONS)
    make_kge_ckpt(ckpt, in_dim=32, hidden_dim=32, out_dim=32,
                  num_hidden_layers=1, num_relation=8, seed=11)
    remove_fake_lightning()

    overrides = [o for o in KGE_OVERRIDES if o != "debug=true"]
    r = _run(repo_root, tmp_path, "test_kge.py",
             overrides + [f"pretrained_path={ckpt}", "neg_ratio=3"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "test_AUROC" in r.stdout

    r2 = _run(repo_root, tmp_path, "rank_eval.py",
              overrides + [f"pretrained_path={ckpt}"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "mrr" in r2.stdout and "hits@10" in r2.stdout
