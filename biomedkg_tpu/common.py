"""Cross-cutting helpers.

Parity target: /root/reference/biomedkg/common.py:8-50 (clean_name,
parameters_count, format_time, find_comet_api_key, generator, find_device),
re-homed for a JAX runtime.
"""

from __future__ import annotations

import os
import re
from typing import Any, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_LETTERS = re.compile("[a-zA-Z]+")


def clean_name(input_string: str) -> str:
    """Strip a node-type / relation name down to its letters.

    Mirrors reference common.py:8-11 so node-type keys, relation keys and the
    edge_map_index are string-compatible with the reference pipeline.
    """
    return "".join(_LETTERS.findall(input_string))


def parameters_count(params: Any) -> int:
    """Total number of scalars in a parameter pytree (reference common.py:14-20)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def format_time(duration: float) -> str:
    """hh:mm:ss formatting (reference common.py:23-26)."""
    hours, remainder = divmod(duration, 3600)
    minutes, seconds = divmod(remainder, 60)
    return "{:02}:{:02}:{:02}".format(int(hours), int(minutes), int(seconds))


def find_comet_api_key() -> str | None:
    """Reference common.py:29-33; Comet logging is optional here."""
    return os.environ.get("COMET_API_KEY")


def generator(data: Sequence, batch_size: int) -> Iterator:
    """Plain list batcher (reference common.py:36-42)."""
    total_samples = len(data)
    for i in range(0, total_samples, batch_size):
        yield data[i : i + batch_size]


def find_device() -> str:
    """Report the primary jax backend platform ('tpu', 'cpu', ...).

    The reference picks cuda/mps/cpu (common.py:45-50); under JAX device
    placement is handled by jit/sharding, so this is informational only.
    """
    return jax.devices()[0].platform


def seed_everything(seed: int) -> jax.Array:
    """Seed numpy + python RNGs and return the root jax PRNG key.

    Lightning's seed_everything analog: all host-side sampling (SAINT walks,
    neighbor fan-outs, split shuffles) derives from numpy; all device-side
    randomness (dropout, negative corruption, bootstrap) splits from the
    returned key.
    """
    import random

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def round_up(x: int, multiple: int) -> int:
    """Round ``x`` up to the next multiple (TPU tile alignment helper)."""
    return ((x + multiple - 1) // multiple) * multiple


def tree_cast(tree: Any, dtype) -> Any:
    """Cast every floating leaf of a pytree to ``dtype``."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
