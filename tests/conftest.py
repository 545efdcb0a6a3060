"""Test config: force an 8-device virtual CPU mesh (no TPU needed).

The environment's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"``; tests must run on host CPU, so we override
the config again before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
    yield


@pytest.fixture
def rng():
    return np.random.RandomState(0)
