"""Test harness: fake an 8-device CPU mesh before jax initializes.

Multi-chip hardware is unavailable in CI; sharding/pjit paths are validated
on a virtual 8-device CPU mesh (SURVEY §4 test-strategy note).

Note: the environment's sitecustomize registers the axon TPU plugin and
forces ``jax_platforms="axon,cpu"`` at interpreter start — env vars alone
cannot select CPU (JAX_PLATFORMS=cpu is overridden, and the default
backend silently stays the tunneled TPU). ``jax.config.update`` after
import is the only switch that genuinely lands on CPU; the assert guards
against tests quietly running on (and timing against) the remote chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
