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


def distributed_init_if_needed():
    """Multi-host bring-up over DCN (no-op in single-process runs).

    Config via env: JAX_COORDINATOR_ADDRESS (required to activate),
    JAX_NUM_PROCESSES + JAX_PROCESS_ID (explicit topology; omitted → jax's
    own cluster auto-detection). Exercised for real by the 2-process CPU
    test (tests/test_multihost.py) — gradients psum over Gloo exactly as
    they would over DCN on a multi-host pod.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if "JAX_NUM_PROCESSES" in os.environ:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:  # pragma: no cover - cluster auto-detect
        jax.distributed.initialize(coordinator_address=addr)


def host_local_batch_seed(seed: int) -> int:
    """Per-host loader seed: seed + process_index, so each host samples a
    DISJOINT batch stream under one global seed (the multi-host data story
    — without this every host would train on identical batches)."""
    return int(seed) + jax.process_index()
