"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon (the real TPU tunnel), so we
must override via jax.config *before* the backend initializes.  Tests run on
CPU with 8 virtual devices to exercise multi-chip sharding logic without
hardware (the stand-in for the reference's multi-GPU NCCL paths).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
