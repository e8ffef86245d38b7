"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of a fake backend (SURVEY.md §4): multi-chip sharding
logic is validated on host CPU with XLA's virtual device partitioning, so the
suite runs anywhere. Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the axon (TPU tunnel) PJRT plugin registers itself from sitecustomize and
# pins the platform via jax.config, overriding JAX_PLATFORMS — force it back
# to CPU before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test draws from a fresh fixed seed, so its data
    # is identical under ANY subset/order of the suite (a session-scoped rng
    # made each test's draws depend on which tests ran before it — an
    # order-dependent flake factory)
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
