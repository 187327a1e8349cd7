"""Test harness config: force an 8-device virtual CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
all sharding/collective tests run against 8 virtual CPU devices so
pjit/shard_map/psum paths are exercised exactly as they would be on a v5e-8 slice.
Must run before jax initializes its backends, hence conftest + env vars.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (the tunneled TPU). Tests must run
# on the virtual CPU mesh, so override unconditionally unless a test session opts
# into real hardware with RADVLM_TEST_TPU=1.
if not os.environ.get("RADVLM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("RADVLM_TEST_TPU"):
    # The axon sitecustomize imports jax before conftest runs, so the env var alone
    # is too late — update the live config as well.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
