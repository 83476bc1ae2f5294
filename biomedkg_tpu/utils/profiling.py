"""Profiling / tracing hooks — instrumentation the reference lacks
(SURVEY §5: no profiler, no tracing beyond a progress bar).

  * ``trace(logdir)`` — context manager around jax.profiler for TensorBoard
    traces of the jitted train step.
  * ``StepTimer`` — wall-clock + throughput accounting with
    block_until_ready semantics for honest device timing.
  * ``debug_nans(enable)`` — flips jax_debug_nans for fault isolation
    (the race-detection analog for a functional runtime, SURVEY §5).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Accumulates step wall time and item counts; reports rates."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self.steps = 0
        self.items = 0
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None, items: int = 0):
        if result is not None:
            jax.block_until_ready(result)
        self.elapsed += time.perf_counter() - self._t0
        self.steps += 1
        self.items += items

    def rates(self) -> Dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        return {"steps_per_sec": self.steps / dt,
                "items_per_sec": self.items / dt,
                "avg_step_ms": 1e3 * dt / max(self.steps, 1)}
