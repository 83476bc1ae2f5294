"""Device mesh construction for data-parallel × tensor-parallel training.

The reference scales through Lightning DDP over NCCL (configs/kge.yaml:11
``devices: 0,1``; SURVEY §2.9). The TPU-native replacement is a
jax.sharding.Mesh whose collectives ride ICI: the ``dp`` axis shards
subgraph batches (gradient psum), the ``tp`` axis shards weight matrices,
relation-embedding tables and feature tables (activation collectives).
Multi-host extends the same mesh over DCN via jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh; dp defaults to all-devices / tp."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp == len(devices), \
        f"dp({dp}) * tp({tp}) != device count ({len(devices)})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def distributed_init_if_needed():  # pragma: no cover - multi-host only
    """Multi-host bring-up over DCN (no-op in single-process runs)."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
