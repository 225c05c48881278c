"""Test environment: force CPU backend with 8 virtual devices.

Must run before jax is imported anywhere — pytest imports conftest first.
Multi-device tests (tests/test_sharding.py) use the 8 virtual CPU devices as
a stand-in for a TPU slice, per the standard
``xla_force_host_platform_device_count`` recipe.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. 'axon') via
# sitecustomize before the env var above can take effect; force CPU here.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
