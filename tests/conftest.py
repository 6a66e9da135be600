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

# Persistent compilation cache for the suite's repeated tiny-model
# compiles (the distill/batched/fused tests re-trace the same programs
# every run; XLA:CPU compiles dominate suite wall-clock).  Safe since
# round 4: enable_persistent_compilation_cache scopes the CPU backend's
# dir per host-CPU fingerprint, so AOT entries never cross machines
# (they are compile-host-specific and SIGILL-unsafe otherwise).
# Opt out with SF_TEST_NO_CACHE=1.
if not os.environ.get("SF_TEST_NO_CACHE"):
    from sparsefusion_tpu.utils.runtime import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
