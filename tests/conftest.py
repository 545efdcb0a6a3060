"""Test config: force an 8-device virtual CPU mesh (no TPU needed).

The environment's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"``; tests must run on host CPU, so we override
the config again before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in xla_flags:
    # XLA:CPU kills the process when a collective rendezvous takes
    # >40 s (rendezvous.cc termination watchdog). On this 1-core host
    # the 8 virtual devices' participant threads time-share one core;
    # any concurrent load (xdist peer, a background suite) can starve
    # a participant past 40 s and SIGABRT an otherwise-correct test.
    # Observed once on the full sharded training step (r5s4).
    xla_flags = (
        xla_flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    ).strip()
os.environ["XLA_FLAGS"] = xla_flags

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
