"""Checkpoint management: top-k / last / best, hparams-embedded restore.

Parity targets: Lightning ModelCheckpoint(monitor="val_loss", save_top_k,
save_last) + ``load_from_checkpoint`` with embedded hyperparameters
(/root/reference/train_kge.py:55-61, kge_module.py:37, train_dpi.py:24-36,
test_kge.py:22, node.py:204-211,294).

A checkpoint is a single ``*.ckpt`` file: a pickle of
``{"kind", "hparams", "params", "opt_state", "step", "extras"}`` with all
jax arrays converted to numpy (host-offloaded, preemption-safe write via
tmpfile + atomic rename). This file format is the interchange format
because every stage bridge (GCLEncode/KGEEncode globbing
``ckpt/**/*.ckpt``) expects files; ``save_orbax``/``load_orbax`` provide
an orbax-backed directory variant for sharded/async multi-host saves.
"""

from __future__ import annotations

import os
import pickle
import tempfile
import threading
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, kind: str, hparams: Dict, params: Any,
                    opt_state: Any = None, step: int = 0,
                    extras: Optional[Dict] = None) -> None:
    payload = {
        "kind": kind,
        "hparams": dict(hparams),
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "step": int(step),
        "extras": extras or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)  # atomic: survives preemption mid-save
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class AsyncSaver:
    """Single-worker background checkpoint writer (SURVEY §5 failure row:
    async save off the step path). Submit a fully host-materialized write
    closure; a new submit waits for the previous write first (latest-wins
    ordering, one outstanding write). ``wait()`` flushes — call it before
    reading a just-saved checkpoint or at the end of fit. A hard kill
    (preemption) mid-write is safe because every writer here finishes with
    an atomic rename."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None

    def submit(self, fn):
        self.wait()
        self._thread = threading.Thread(target=fn, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None and self._thread.is_alive():
            self._thread.join()
        self._thread = None


def save_orbax(dirpath: str, kind: str, hparams: Dict, params: Any,
               opt_state: Any = None, step: int = 0,
               extras: Optional[Dict] = None) -> None:
    """Orbax-backed directory checkpoint (sharded, multi-host-safe).

    Parameters go through orbax's PyTree handler; optimizer state is
    stored as FLATTENED leaves (orbax restores plain containers, not
    optax's namedtuple classes — the loader rebuilds the real structure
    from ``tx.init`` and ``tree_unflatten``, see Trainer.fit resume);
    metadata (kind, hparams, step, extras) lands in ``meta.json`` so
    restore can rebuild the module before asking orbax for the matching
    pytree structure.
    """
    import json

    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(dirpath, "params"), _to_numpy(params),
               force=True)
    n_opt = 0
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(_to_numpy(opt_state))
        n_opt = len(leaves)
        ckptr.save(os.path.join(dirpath, "opt_state"),
                   {f"l{i:04d}": leaf for i, leaf in enumerate(leaves)},
                   force=True)
    tmp = os.path.join(dirpath, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"kind": kind, "hparams": dict(hparams),
                   "step": int(step), "extras": extras or {},
                   "n_opt_leaves": n_opt}, f)
    os.replace(tmp, os.path.join(dirpath, "meta.json"))


def load_orbax(dirpath: str) -> Dict:
    import json

    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    with open(os.path.join(dirpath, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(os.path.join(dirpath, "params"))
    opt_leaves = None
    if meta.get("n_opt_leaves"):
        d = ckptr.restore(os.path.join(dirpath, "opt_state"))
        opt_leaves = [d[k] for k in sorted(d)]
    return {**meta, "params": params, "opt_state": None,
            "opt_leaves": opt_leaves}


def load_any(path: str) -> Dict:
    """Dispatch: file → pickle checkpoint, directory → orbax checkpoint."""
    if os.path.isdir(path):
        return load_orbax(path)
    return load_checkpoint(path)


class ModelCheckpoint:
    """Top-k-by-monitor + save_last callback (Lightning surface subset)."""

    def __init__(self, dirpath: str, monitor: str = "val_loss",
                 save_top_k: int = 3, mode: str = "min",
                 save_last: bool = False):
        self.dirpath = dirpath
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.sign = 1.0 if mode == "min" else -1.0
        self.save_last = save_last
        self._kept: List[tuple] = []  # (signed_value, path)
        os.makedirs(dirpath, exist_ok=True)

    @property
    def best_model_path(self) -> Optional[str]:
        if not self._kept:
            return None
        return min(self._kept)[1]

    def on_validation_end(self, trainer, metrics: Dict[str, float]):
        if self.monitor not in metrics:
            return
        value = float(metrics[self.monitor])
        epoch = trainer.current_epoch
        path = os.path.join(
            self.dirpath,
            f"epoch={epoch}-{self.monitor}={value:.4f}.ckpt")
        signed = self.sign * value
        if len(self._kept) < self.save_top_k or \
                signed < max(self._kept)[0]:
            trainer.save(path)
            self._kept.append((signed, path))
            self._kept.sort()
            while len(self._kept) > self.save_top_k:
                _, drop = self._kept.pop()
                if os.path.exists(drop):
                    os.remove(drop)
        if self.save_last:
            trainer.save(os.path.join(self.dirpath, "last.ckpt"))


class EarlyStopping:
    """Patience-based early stop on a monitored metric
    (reference train_gcl.py:85)."""

    def __init__(self, monitor: str = "val_loss", mode: str = "min",
                 patience: int = 5):
        self.monitor = monitor
        self.sign = 1.0 if mode == "min" else -1.0
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0
        self.should_stop = False

    def on_validation_end(self, trainer, metrics: Dict[str, float]):
        if self.monitor not in metrics:
            return
        value = self.sign * float(metrics[self.monitor])
        if value < self.best:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            # Lightning semantics: stop when wait_count >= patience
            if self.bad_epochs >= self.patience:
                self.should_stop = True
