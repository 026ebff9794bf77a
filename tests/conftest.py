"""Test configuration: force an 8-device CPU mesh.

The standard JAX substitute for multi-chip hardware (SURVEY.md section 4):
8 virtual CPU devices so sharding/collective paths compile and run without a
TPU pod.

This environment may have already pinned JAX to a remote TPU backend via
sitecustomize (JAX_PLATFORMS=axon) before conftest runs; ``clear_backends``
drops that client and re-initializes on CPU so tests never contend for the
single real chip.
"""

import os

import jax

os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    from jax.extend.backend import clear_backends
    clear_backends()
except Exception:
    pass
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
