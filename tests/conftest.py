"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count=8).

Note: this machine's sitecustomize registers an experimental 'axon' TPU
backend and overwrites JAX_PLATFORMS, so the env var alone is not enough —
jax.config.update("jax_platforms", "cpu") before backend init is what
actually pins tests to CPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
