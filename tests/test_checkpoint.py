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


def test_orbax_interrupted_swap_recovers(tmp_path):
    """A kill between save_orbax's two renames leaves .new/.old — load
    must recover a complete checkpoint either way."""
    import os
    import shutil

    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, "kge", {"in_dim": 2}, _params(), step=1)
    save_orbax(path, "kge", {"in_dim": 2}, _params(), step=2)
    assert load_orbax(path)["step"] == 2

    # simulate: crash AFTER rename(dir -> .old), BEFORE rename(.new -> dir)
    os.rename(path, path + ".old")
    assert load_orbax(path)["step"] == 2  # falls back to .old
    # simulate: .new completed but swap never started
    shutil.copytree(path + ".old", path + ".new")
    assert load_orbax(path)["step"] == 2  # .new preferred over .old

    from biomedkg_tpu.training.checkpoint import load_any

    assert load_any(path)["step"] == 2  # dir itself missing


def test_async_saver_reraises(tmp_path):
    from biomedkg_tpu.training.checkpoint import AsyncSaver

    s = AsyncSaver()

    def boom():
        raise OSError("disk full")

    s.submit(boom)
    with pytest.raises(OSError):
        s.wait()
    s.wait()  # cleared — does not re-raise twice


def test_model_checkpoint_topk_edge_semantics(tmp_path):
    """save_top_k=0 saves nothing (save_last still works); -1 saves all;
    EarlyStopping runs even with checkpointing disabled."""
    from biomedkg_tpu.training.checkpoint import (EarlyStopping,
                                                  ModelCheckpoint)

    class _T:
        current_epoch = 0
        saved = []

        def save(self, path):
            self.saved.append(path)

    t = _T()
    cb0 = ModelCheckpoint(str(tmp_path / "k0"), save_top_k=0,
                          save_last=True)
    cb0.on_validation_end(t, {"val_loss": 1.0})
    assert len(t.saved) == 1 and t.saved[0].endswith("last.ckpt")
    assert cb0.best_model_path is None

    t.saved = []
    cball = ModelCheckpoint(str(tmp_path / "kall"), save_top_k=-1)
    for e, v in enumerate([3.0, 1.0, 2.0]):
        t.current_epoch = e
        cball.on_validation_end(t, {"val_loss": v})
    assert len(t.saved) == 3  # nothing evicted
    assert "1.0000" in cball.best_model_path

    # state round-trips (resume continuity)
    st = cball.state_dict()
    fresh = ModelCheckpoint(str(tmp_path / "kall"), save_top_k=-1)
    fresh.load_state_dict(st)
    assert fresh.best_model_path == cball.best_model_path

    es = EarlyStopping(patience=2)
    es.on_validation_end(t, {"val_loss": 1.0})
    es.on_validation_end(t, {"val_loss": 2.0})
    st = es.state_dict()
    es2 = EarlyStopping(patience=2)
    es2.load_state_dict(st)
    es2.on_validation_end(t, {"val_loss": 2.0})
    assert es2.should_stop


def test_early_stopping_runs_without_checkpointing(tmp_path):
    """Regression: EarlyStopping was silently disabled when
    enable_checkpointing=False (the callback loop was inside the gate)."""
    import jax

    from biomedkg_tpu.training.checkpoint import EarlyStopping
    from biomedkg_tpu.training.trainer import Trainer

    from typing import NamedTuple

    class _DummyBatch(NamedTuple):
        edge_mask: np.ndarray

    class _Loader:
        def __iter__(self):
            return iter([_DummyBatch(np.ones(4, bool))])

        def __len__(self):
            return 1

    class _Module:
        kind = "kge"
        hparams = {}
        seed = 0

        def configure_optimizers(self, *a, **k):
            pass

        def init_state(self, rng):
            from biomedkg_tpu.training.kge_module import TrainState

            return TrainState({}, {}, jax.numpy.zeros((), jax.numpy.int32))

        def train_step(self, state, batch, rng):
            from biomedkg_tpu.training.kge_module import TrainState

            return TrainState(state.params, state.opt_state,
                              state.step + 1), {"train_loss": 1.0}

        def eval_step(self, params, batch, rng):
            return {"loss": 1.0}

        def eval_epoch(self, outputs, split):
            return {f"{split}_loss": 1.0}

    es = EarlyStopping(patience=1)
    tr = Trainer(max_epochs=10, enable_checkpointing=False,
                 callbacks=[es], enable_progress_bar=False)
    tr.fit(_Module(), _Loader(), val_dataloaders=_Loader())
    # val_loss never improves after the first epoch -> patience 1 stops
    assert es.should_stop and tr.current_epoch < 9
