"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env before the first jax import anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# pytest plugins import jax before this conftest runs, so the env var alone is
# too late; jax.config.update still works pre-backend-initialization.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(233)  # the reference's canonical seed
