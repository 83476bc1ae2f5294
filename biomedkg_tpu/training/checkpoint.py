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
    """Load a native ``.ckpt`` (plain pickle). A reference Lightning
    ``.ckpt`` (torch zip-archive save — reference test_kge.py:22,
    README.md:111-116 pretrained weights) is detected by its zip magic and
    converted in place, so every loader in the framework accepts
    reference-trained checkpoints as a drop-in."""
    from ..interop.torch_ckpt import from_torch_checkpoint, \
        is_torch_checkpoint

    if is_torch_checkpoint(path):
        return from_torch_checkpoint(path)
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
        self._exc: Optional[BaseException] = None

    def submit(self, fn):
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:  # surfaced on the next wait()
                self._exc = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self):
        """Flush; re-raises a background write failure instead of letting
        callers believe a never-written checkpoint is durable."""
        if self._thread is not None and self._thread.is_alive():
            self._thread.join()
        self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


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
    import shutil

    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    # preemption safety: build the whole checkpoint in a sibling ".new"
    # dir (meta.json written LAST — its presence implies completeness),
    # then swap via two renames. A kill at any point leaves at least one
    # complete checkpoint among {dirpath, .new, .old} for load_orbax.
    # Saving in place (the old force=True overwrite) deleted the only
    # recovery checkpoint before rewriting it.
    new = dirpath + ".new"
    old = dirpath + ".old"
    shutil.rmtree(new, ignore_errors=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(new, "params"), _to_numpy(params), force=True)
    n_opt = 0
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(_to_numpy(opt_state))
        n_opt = len(leaves)
        ckptr.save(os.path.join(new, "opt_state"),
                   {f"l{i:04d}": leaf for i, leaf in enumerate(leaves)},
                   force=True)
    tmp = os.path.join(new, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"kind": kind, "hparams": dict(hparams),
                   "step": int(step), "extras": extras or {},
                   "n_opt_leaves": n_opt}, f)
    os.replace(tmp, os.path.join(new, "meta.json"))

    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(dirpath):
        os.rename(dirpath, old)
    os.rename(new, dirpath)
    shutil.rmtree(old, ignore_errors=True)


def load_orbax(dirpath: str) -> Dict:
    import json

    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    # recover from a save interrupted mid-swap: prefer the primary dir,
    # then a completed ".new" (meta.json is written last), then ".old"
    for cand in (dirpath, dirpath + ".new", dirpath + ".old"):
        if os.path.exists(os.path.join(cand, "meta.json")):
            dirpath = cand
            break
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
    """Dispatch: file → pickle checkpoint, directory → orbax checkpoint
    (including one whose atomic swap was interrupted — see load_orbax)."""
    if os.path.isdir(path) or os.path.isdir(path + ".new") \
            or os.path.isdir(path + ".old"):
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
        # Lightning semantics: save_top_k=0 saves nothing (save_last still
        # applies), -1 saves everything
        should = self.save_top_k != 0 and (
            self.save_top_k == -1
            or len(self._kept) < self.save_top_k
            or signed < max(self._kept)[0])
        if should:
            trainer.save(path)
            self._kept.append((signed, path))
            self._kept.sort()
            while self.save_top_k >= 0 and \
                    len(self._kept) > self.save_top_k:
                _, drop = self._kept.pop()
                if os.path.exists(drop):
                    os.remove(drop)
        if self.save_last:
            trainer.save(os.path.join(self.dirpath, "last.ckpt"))

    # -- resume support (Trainer embeds these in checkpoint extras) -------

    def state_dict(self) -> Dict:
        return {"kept": [[v, p] for v, p in self._kept]}

    def load_state_dict(self, state: Dict) -> None:
        self._kept = [(float(v), str(p)) for v, p in state.get("kept", [])]


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

    def state_dict(self) -> Dict:
        return {"best": self.best, "bad_epochs": self.bad_epochs,
                "should_stop": self.should_stop}

    def load_state_dict(self, state: Dict) -> None:
        self.best = float(state.get("best", float("inf")))
        self.bad_epochs = int(state.get("bad_epochs", 0))
        self.should_stop = bool(state.get("should_stop", False))
