"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's conftest device fixture pattern
(/root/reference/DS_NeRF/torchsearchsorted/test/conftest.py) where the CPU
implementation is the oracle for the accelerator one; here CPU is also the
stand-in for a multi-chip TPU mesh via
--xla_force_host_platform_device_count.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config update is what actually pins tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices for mesh tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
