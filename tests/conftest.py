"""Test environment: CPU backend with 8 virtual devices, x64 enabled.

Must configure the environment before jax initializes a backend. The image's
sitecustomize registers the `axon` TPU platform and pins JAX_PLATFORMS=axon;
tests override back to CPU (clearing PALLAS_AXON_POOL_IPS disables the axon
bootstrap in fresh subprocesses).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon bootstrap (sitecustomize) imports jax before conftest runs, so the
# env var alone is too late — override the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(1234)
