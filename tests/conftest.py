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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of XLA:CPU programs in one
    process; past ~150 tests the CPU client segfaulted inside a
    tf_XLAEigen worker (jump to ip 0 — a corrupted function pointer)
    during a LATER compile, deterministically at the same test for a
    given test sequence, while every module passes in isolation.
    Bounding the number of live executables avoids the corruption
    boundary; cross-module jit cache reuse was ~nil anyway (modules
    compile different programs)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
