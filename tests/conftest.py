"""Test environment: force JAX onto CPU with 8 virtual devices so sharding
tests can exercise a multi-chip mesh without TPU hardware.

Note: on this stack the axon TPU plugin ignores the `JAX_PLATFORMS` env var;
`JAX_PLATFORM_NAME` (and jax.config jax_platforms) do work.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
