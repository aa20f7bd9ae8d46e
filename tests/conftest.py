"""Test configuration: force an 8-virtual-device CPU backend BEFORE jax import so
multi-chip sharding paths (segsplat_tpu/parallel) are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This image preimports jax at interpreter start (sitecustomize registers the
# axon TPU backend), so env vars alone are too late — override the live config
# before the first backend query.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
