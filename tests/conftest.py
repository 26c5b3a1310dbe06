"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize (axon TPU tunnel) registers the TPU PJRT
plugin at interpreter boot and pins JAX_PLATFORMS=axon, which would route
tiny test computations through a remote-compile tunnel (very slow) and
defeat the 8-virtual-device CPU mesh the sharding tests need. Overriding
via jax.config before the backend initializes wins over the env var.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
