"""The full three-stage pipeline as a regression test (scripts/pipeline_demo.sh)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_pipeline_demo(repo_root, tmp_path):
    env = dict(os.environ)
    env["BIOMEDKG_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    for name in ["configs", "scripts", "train_gcl.py", "train_kge.py",
                 "rank_eval.py"]:
        os.symlink(os.path.join(repo_root, name), tmp_path / name)
    r = subprocess.run(["bash", "scripts/pipeline_demo.sh"], cwd=tmp_path,
                       env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "pipeline demo complete" in r.stdout
    assert "mrr" in r.stdout
