"""Training loop driver (Lightning Trainer surface subset).

Covers everything the reference entry points use
(/root/reference/train_kge.py:44-98, train_gcl.py:65-122):
max_epochs, check_val_every_n_epoch, gradient_clip_val, fast_dev_run
(debug → one train + one val batch), ModelCheckpoint/EarlyStopping
callbacks, metric logging every N steps, ``test(ckpt_path="best")``.

TPU specifics: batches are produced by a background prefetch thread
(host sampling overlaps device compute), the jitted step is compiled once
per batch envelope, and per-epoch throughput (batches/sec and
triplets/sec) is recorded — instrumentation the reference lacks
(SURVEY §5 tracing row).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..sampling.loaders import prefetch
from .checkpoint import (AsyncSaver, ModelCheckpoint, load_any,
                         save_checkpoint, save_orbax)
from .logger import MetricsLogger


class Trainer:
    def __init__(self, max_epochs: int = 1,
                 check_val_every_n_epoch: int = 1,
                 gradient_clip_val: float = 1.0,
                 callbacks: Optional[List] = None,
                 logger: Optional[MetricsLogger] = None,
                 fast_dev_run: bool = False,
                 log_every_n_steps: int = 10,
                 enable_checkpointing: bool = True,
                 accelerator: str = "auto",
                 devices=None,
                 deterministic: bool = True,
                 default_root_dir: Optional[str] = None,
                 enable_progress_bar: bool = True,
                 steps_per_execution: int = 1,
                 checkpoint_every_n_steps: Optional[int] = None,
                 checkpoint_backend: str = "pickle",
                 async_checkpointing: bool = True):
        self.max_epochs = max_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.gradient_clip_val = gradient_clip_val
        self.callbacks = callbacks or []
        self.logger = logger
        self.fast_dev_run = fast_dev_run
        self.log_every_n_steps = log_every_n_steps
        self.enable_checkpointing = enable_checkpointing and not fast_dev_run
        self.enable_progress_bar = enable_progress_bar
        # K train steps fused into one device dispatch (lax.scan) — hides
        # per-step dispatch latency; 1 = classic per-batch stepping.
        self.steps_per_execution = max(1, steps_per_execution)
        # preemption safety (SURVEY §5 failure row): periodic mid-epoch
        # checkpoints written asynchronously off the step path
        self.checkpoint_every_n_steps = checkpoint_every_n_steps
        if checkpoint_every_n_steps and not default_root_dir:
            import warnings

            warnings.warn(
                "checkpoint_every_n_steps is set but default_root_dir is "
                "not — periodic preemption checkpoints will NOT be "
                "written", stacklevel=2)
        assert checkpoint_backend in ("pickle", "orbax")
        self.checkpoint_backend = checkpoint_backend
        self.async_checkpointing = async_checkpointing
        self.default_root_dir = default_root_dir
        # Lightning `devices` semantics (reference train_kge.py passes
        # cfg.devices straight through): int = that many devices, list =
        # those device ids, "auto" = all local devices. >1 engages the
        # shard_map data-parallel step (parallel/dp.py) — one batch per
        # device per optimizer step, pmean'd grads (the DDP analog).
        self.devices = devices
        self._saver = AsyncSaver()
        self._in_fit = False
        self.current_epoch = 0
        self.global_step = 0
        self.module = None
        self.state = None
        self.history: List[Dict[str, float]] = []

    # -- checkpoint hook used by ModelCheckpoint ------------------------------

    def save(self, path: str):
        """Write a resumable checkpoint. The device→host snapshot happens
        here (synchronously — the arrays are donated by the next step);
        the disk write runs on the background saver thread unless
        async_checkpointing=False."""
        extras = {"model_name": getattr(self.module, "model_name", None),
                  # callback state (top-k ledger, early-stop patience)
                  # rides along so resume continues eviction/patience
                  # where the interrupted run left them
                  "callback_states": [
                      cb.state_dict() if hasattr(cb, "state_dict")
                      else None for cb in self.callbacks]}
        kind, hparams = self.module.kind, self.module.hparams
        params = jax.device_get(self.state.params)
        opt_state = jax.device_get(self.state.opt_state)
        step = int(self.state.step)

        if self.checkpoint_backend == "orbax" or os.path.isdir(path):
            def write():
                save_orbax(path, kind, hparams, params, opt_state, step,
                           extras)
        else:
            def write():
                save_checkpoint(path, kind, hparams, params, opt_state,
                                step, extras)

        # async only while fit() is running (keeps writes off the step
        # path); a direct save() call must be durable when it returns
        if self.async_checkpointing and self._in_fit:
            self._saver.submit(write)
        else:
            self._saver.wait()  # keep latest-wins ordering
            write()

    def flush_checkpoints(self):
        """Block until the in-flight async checkpoint write completes."""
        self._saver.wait()

    def _checkpoint_callbacks(self):
        return [c for c in self.callbacks if isinstance(c, ModelCheckpoint)]

    @property
    def best_model_path(self) -> Optional[str]:
        for cb in self._checkpoint_callbacks():
            if cb.best_model_path:
                return cb.best_model_path
        return None

    # -- loops ------------------------------------------------------------------

    def fit(self, model, train_dataloaders, val_dataloaders=None,
            init_params=None, resume_from: Optional[str] = None):
        try:
            self._in_fit = True
            return self._fit(model, train_dataloaders, val_dataloaders,
                             init_params, resume_from)
        finally:
            self._in_fit = False

    def _resolve_dp(self):
        """(count, device list) from the Lightning-style ``devices``
        argument: int = that many devices, -1/"auto" = all, list =
        THOSE device ids; clamped to what the platform offers."""
        d = self.devices
        all_devs = jax.devices()
        if d is None:
            return 1, all_devs[:1]
        if isinstance(d, (list, tuple)):
            return self._resolve_dp_list(d, all_devs)
        if isinstance(d, str):
            if "," in d:   # Lightning "0,1" string → those device ids
                return self._resolve_dp_list(
                    [int(x) for x in d.split(",") if x.strip() != ""],
                    all_devs)
            want = len(all_devs) if d == "auto" else int(d)
        else:
            want = int(d)
        if want < 0:  # Lightning devices=-1: all devices
            want = len(all_devs)
        if want > len(all_devs):
            import warnings

            warnings.warn(f"devices={d!r} requests {want} devices but "
                          f"only {len(all_devs)} exist — clamping",
                          stacklevel=2)
        n = max(1, min(want, len(all_devs)))
        return n, all_devs[:n]

    @staticmethod
    def _resolve_dp_list(d, all_devs):
        """Lightning list/"0,1"-string form: THOSE device ids."""
        bad = [i for i in d if not (0 <= int(i) < len(all_devs))]
        if bad:
            import warnings

            warnings.warn(f"devices={d!r}: ids {bad} don't exist "
                          f"(have {len(all_devs)}) — ignoring them",
                          stacklevel=2)
        ids = [int(i) for i in d if 0 <= int(i) < len(all_devs)]
        devs = [all_devs[i] for i in ids] or all_devs[:1]
        return len(devs), devs

    def _fit(self, model, train_dataloaders, val_dataloaders=None,
             init_params=None, resume_from: Optional[str] = None):
        self.module = model
        epochs = 1 if self.fast_dev_run else self.max_epochs
        dp, dp_devices = (1, None) if self.fast_dev_run \
            else self._resolve_dp()
        dp_scan_k = self.steps_per_execution if dp > 1 else 1
        # one optimizer step consumes dp batches (DDP semantics: grads
        # pmean'd across the group) and dispatches go in dp·k groups with
        # the tail dropped — the scheduler horizon and resume math must
        # count the steps that actually EXECUTE, not len//dp
        if dp > 1:
            n = len(train_dataloaders)
            if n < dp * dp_scan_k:
                raise ValueError(
                    f"devices={dp} x steps_per_execution={dp_scan_k} "
                    f"needs at least {dp * dp_scan_k} batches per epoch, "
                    f"loader has {n} — every epoch would train ZERO "
                    f"steps (drop_last)")
            steps_per_epoch = (n // (dp * dp_scan_k)) * dp_scan_k
        else:
            steps_per_epoch = 1 if self.fast_dev_run \
                else len(train_dataloaders)
        model.configure_optimizers(steps_per_epoch * epochs,
                                   grad_clip=self.gradient_clip_val)
        dp_step = None
        if dp > 1:
            from ..parallel.dp import (make_dp_train_step,
                                       make_dp_train_steps_scan)
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(dp=dp, tp=1, devices=dp_devices)
            if dp_scan_k > 1:
                # DP × fused execution: k optimizer steps per dispatch,
                # each over dp per-device batches
                dp_step = make_dp_train_steps_scan(model, mesh, dp_scan_k)
            else:
                dp_step = make_dp_train_step(model, mesh)
        # All training randomness derives from fold_in(root, counter):
        # train-step rng is keyed by global_step and val rng by epoch, so
        # resuming at any checkpoint reproduces the uninterrupted run's
        # exact rng stream (no replay needed).
        root = jax.random.PRNGKey(getattr(model, "seed", 42))
        init_rng = jax.random.fold_in(root, 0)
        train_root = jax.random.fold_in(root, 1)
        val_root = jax.random.fold_in(root, 2)
        start_epoch = 0
        skip_steps = 0
        if resume_from is not None:
            # preemption recovery: restore params + optimizer state + step,
            # fast-forward to the interrupted position — epoch AND offset
            # within it (loaders are epoch-keyed, so skipping the already-
            # consumed batches replays the exact uninterrupted stream).
            # No init_state here: a fresh init would materialize a full
            # params+moments copy on device only to discard it (~2× peak
            # HBM at production table sizes).
            from .kge_module import TrainState

            ckpt = load_any(resume_from)
            params = jax.tree_util.tree_map(jax.numpy.asarray,
                                            ckpt["params"])
            if ckpt.get("opt_state") is not None:
                opt_state = jax.tree_util.tree_map(jax.numpy.asarray,
                                                   ckpt["opt_state"])
            elif ckpt.get("opt_leaves") is not None:
                # orbax stores flattened leaves; rebuild optax's real
                # container classes from a template (checkpoint.save_orbax)
                template = model.tx.init(params)
                treedef = jax.tree_util.tree_structure(template)
                opt_state = jax.tree_util.tree_unflatten(
                    treedef, [jax.numpy.asarray(x)
                              for x in ckpt["opt_leaves"]])
            else:
                raise AssertionError(
                    "checkpoint lacks optimizer state; cannot resume")
            step = ckpt["step"]
            self.state = TrainState(
                params, opt_state,
                jax.numpy.asarray(step, jax.numpy.int32))
            start_epoch = step // max(steps_per_epoch, 1)
            skip_steps = step - start_epoch * steps_per_epoch
            self.global_step = int(step)
            states = (ckpt.get("extras") or {}).get("callback_states") or []
            for cb, st in zip(self.callbacks, states):
                if st is not None and hasattr(cb, "load_state_dict"):
                    cb.load_state_dict(st)
            if skip_steps % max(self.steps_per_execution, 1):
                import warnings

                warnings.warn(
                    f"resume offset {skip_steps} is not a multiple of "
                    f"steps_per_execution={self.steps_per_execution}: "
                    "every batch is still trained exactly once, but the "
                    "scan-group rng boundaries differ from the "
                    "uninterrupted run (not bit-identical)", stacklevel=2)
        elif init_params is not None:
            # warm start (load_from_checkpoint → fit, train_dpi.py:32)
            from .kge_module import TrainState

            self.state = TrainState(
                jax.tree_util.tree_map(jax.numpy.asarray, init_params),
                model.tx.init(init_params),
                jax.numpy.zeros((), jax.numpy.int32))
        else:
            self.state = model.init_state(init_rng)

        for epoch in range(start_epoch, epochs):
            self.current_epoch = epoch
            # epoch-keyed host sampler stream: resume replays the exact
            # batches the uninterrupted run would have sampled
            if hasattr(train_dataloaders, "set_epoch"):
                train_dataloaders.set_epoch(epoch)
            t0 = time.time()
            n_batches = 0
            n_edges = 0
            last_loss = 0.0
            k = 1 if self.fast_dev_run else \
                (dp * dp_scan_k if dp > 1 else self.steps_per_execution)
            # resume fast-forward: the already-consumed prefix of the
            # epoch-keyed stream is skipped INSIDE the stream, before
            # stacking/device_put (batch-exact for any k; skipping
            # device-resident groups both over-skipped when k changed
            # across the restart and paid H2D for every dropped batch).
            # global_step counts OPTIMIZER steps, so a dp resume skips
            # dp batches per recorded step.
            skip = skip_steps if epoch == start_epoch else 0
            if dp > 1:
                skip *= dp
            for kind, batch, steps, edges in prefetch(
                    self._train_stream(train_dataloaders, k, skip,
                                       drop_last=dp > 1, dp=dp)):
                step_rng = jax.random.fold_in(train_root, self.global_step)
                if dp_step is not None:
                    # pmean'd optimizer step(s) over dp per-device batches
                    rngs = jax.random.split(step_rng, dp * dp_scan_k)
                    if dp_scan_k > 1:
                        rngs = rngs.reshape(dp_scan_k, dp, -1)
                    self.state, dp_loss = dp_step(self.state, batch, rngs)
                    logs = {"train_loss": dp_loss}
                    opt_steps = dp_scan_k
                elif kind == "group":
                    self.state, logs = model.train_steps(self.state, batch,
                                                         step_rng)
                    opt_steps = steps
                else:
                    self.state, logs = model.train_step(self.state, batch,
                                                        step_rng)
                    opt_steps = steps
                last_loss = logs["train_loss"]
                self.global_step += opt_steps
                n_batches += steps
                n_edges += edges
                if self.enable_checkpointing and \
                        self.checkpoint_every_n_steps and \
                        self.default_root_dir and \
                        self.global_step % self.checkpoint_every_n_steps \
                        < opt_steps:
                    # async, latest-wins: the preemption-recovery anchor
                    self.save(os.path.join(self.default_root_dir,
                                           "step_last.ckpt"))
                if self.logger and \
                        self.global_step % self.log_every_n_steps \
                        < opt_steps:
                    self.logger.log({"train_loss": float(last_loss)},
                                    self.global_step)
                if self.fast_dev_run:
                    break
            dt = max(time.time() - t0, 1e-9)
            # single device sync per epoch (losses stay on device in-loop)
            last_loss = float(last_loss)
            epoch_logs = {
                "epoch": epoch,
                "train_loss_epoch": last_loss,
                "batches_per_sec": n_batches / dt,
                "edges_per_sec": n_edges / dt,
            }
            if self.enable_progress_bar:
                print(f"[epoch {epoch}] train_loss={last_loss:.4f} "
                      f"({n_batches / dt:.2f} batch/s, "
                      f"{n_edges / dt:,.0f} edges/s)")

            run_val = val_dataloaders is not None and (
                self.fast_dev_run
                or (epoch + 1) % self.check_val_every_n_epoch == 0)
            if run_val:
                val_rng = jax.random.fold_in(val_root, epoch)
                if hasattr(val_dataloaders, "set_epoch"):
                    val_dataloaders.set_epoch(epoch)
                val_metrics = self._eval_loop(model, self.state.params,
                                              val_dataloaders, "val",
                                              val_rng)
                epoch_logs.update(val_metrics)
                if self.enable_progress_bar:
                    val_loss = val_metrics.get("val_loss", float("nan"))
                    print(f"[epoch {epoch}] val_loss={val_loss:.4f}")
                for cb in self.callbacks:
                    # only CHECKPOINT callbacks are gated by
                    # enable_checkpointing — EarlyStopping etc. must
                    # still run (Lightning semantics)
                    if isinstance(cb, ModelCheckpoint) \
                            and not self.enable_checkpointing:
                        continue
                    if hasattr(cb, "on_validation_end"):
                        cb.on_validation_end(self, val_metrics)
            if self.logger:
                self.logger.log(epoch_logs, self.global_step)
            self.history.append(epoch_logs)

            if any(getattr(cb, "should_stop", False)
                   for cb in self.callbacks):
                if self.enable_progress_bar:
                    print(f"[early stop] epoch {epoch}")
                break
        self.flush_checkpoints()
        return self.state

    @staticmethod
    def _train_stream(loader, k: int, skip: int = 0,
                      drop_last: bool = False, dp: int = 1):
        """Group batches into fused-execution units, stack + device_put in
        the prefetch worker so host packing and H2D transfers overlap the
        device's previous step. ``skip`` consumes that many batches from
        the loader first (resume fast-forward — they never get stacked or
        transferred). ``drop_last`` discards a tail smaller than one group
        (data-parallel mode: every device must hold a batch). With
        ``dp > 1`` and ``k > dp`` the (k,) stack is reshaped to
        (k/dp, dp, ...) for the DP × scan step.
        Yields (kind, device_batch, steps, edges)."""
        import itertools

        import jax as _jax

        from ..parallel.dp import stack_batches
        from ..sampling.batch import GraphBatch

        it = iter(loader)
        if skip:
            next(itertools.islice(it, skip - 1, skip), None)

        pending = []
        for batch in it:
            pending.append(batch)
            if len(pending) == k:
                edges = sum(int(np.sum(b.edge_mask)) for b in pending)
                if k > 1:
                    stacked = stack_batches(pending)
                    if dp > 1 and k > dp:
                        stacked = GraphBatch(*[
                            a.reshape(k // dp, dp, *a.shape[1:])
                            for a in stacked])
                    yield ("group", _jax.device_put(stacked), k, edges)
                else:
                    yield ("single", _jax.device_put(pending[0]), 1, edges)
                pending = []
        if not drop_last:
            for b in pending:  # leftovers smaller than one group
                yield ("single", _jax.device_put(b), 1,
                       int(np.sum(b.edge_mask)))

    def _eval_loop(self, model, params, dataloader, split: str, rng):
        k = 1 if self.fast_dev_run else self.steps_per_execution
        outputs = []
        for kind, batch, steps, _ in prefetch(
                self._train_stream(dataloader, k)):
            rng, step_rng = jax.random.split(rng)
            if kind == "group":
                outputs.extend(model.eval_steps(params, batch, step_rng))
            else:
                outputs.append(model.eval_step(params, batch, step_rng))
            if self.fast_dev_run:
                break
        return model.eval_epoch(outputs, split)

    def validate(self, model, dataloaders, params=None):
        params = params if params is not None else self.state.params
        rng = jax.random.PRNGKey(getattr(model, "seed", 42) + 1)
        return self._eval_loop(model, params, dataloaders, "val", rng)

    def test(self, model, dataloaders, ckpt_path: Optional[str] = None,
             params=None):
        self.module = model
        if ckpt_path == "best":
            ckpt_path = self.best_model_path
            self.flush_checkpoints()  # the best ckpt may still be in flight
        if ckpt_path:
            ckpt = load_any(ckpt_path)
            params = ckpt["params"]
        elif params is None:
            params = self.state.params
        rng = jax.random.PRNGKey(getattr(model, "seed", 42) + 2)
        self.tested_params = params  # entry points reuse (e.g. unseen-node eval)
        metrics = self._eval_loop(model, params, dataloaders, "test", rng)
        if self.enable_progress_bar:
            print("test metrics:")
            for k, v in sorted(metrics.items()):
                print(f"  {k}: {v:.6f}")
        if self.logger:
            self.logger.log(metrics, self.global_step)
        return metrics
