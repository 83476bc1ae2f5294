"""Checkpoint backends: pickle atomicity and orbax round-trip."""

import numpy as np
import pytest

from biomedkg_tpu.training.checkpoint import (load_checkpoint, load_orbax,
                                              save_checkpoint, save_orbax)


def _params():
    return {"layers": [{"w": np.arange(6, dtype=np.float32).reshape(2, 3)}],
            "rel_emb": np.ones((4, 3), np.float32)}


def test_pickle_roundtrip(tmp_path):
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, "kge", {"in_dim": 2}, _params(), step=7,
                    extras={"model_name": "x"})
    ckpt = load_checkpoint(path)
    assert ckpt["kind"] == "kge" and ckpt["step"] == 7
    np.testing.assert_array_equal(ckpt["params"]["rel_emb"],
                                  np.ones((4, 3)))


def test_orbax_roundtrip(tmp_path):
    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, "kge", {"in_dim": 2}, _params(), step=3)
    ckpt = load_orbax(path)
    assert ckpt["kind"] == "kge" and ckpt["step"] == 3
    np.testing.assert_array_equal(
        np.asarray(ckpt["params"]["layers"][0]["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3))
