"""Test environment: CPU backend with 8 virtual devices, fp64 enabled.

This is the standard JAX recipe for testing pjit/psum/mesh logic without a
pod (SURVEY.md §4d): `xla_force_host_platform_device_count=8` gives eight
fake CPU devices, so every sharding test exercises the real SPMD partitioner
and collectives.  fp64 is enabled globally for parity tests against the C++
oracle (the reference is all-double).

NOTE: this environment's sitecustomize registers an `axon` TPU platform at
interpreter startup and JAX_PLATFORMS from the environment is overridden; the
reliable way to force CPU is jax.config.update after import.
"""
import os

# Must be set before the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
