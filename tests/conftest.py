"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count per the scaling-book recipe. The
environment pins JAX_PLATFORMS=axon (single tunneled TPU chip), so we must
override both the env var and the jax config before first backend use —
tests must never run op-by-op over the TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: do NOT enable the persistent compilation cache here — this
# environment routes compiles through a remote service
# (PALLAS_AXON_REMOTE_COMPILE) whose XLA:CPU AOT artifacts target a
# different microarchitecture and silently compute garbage when reloaded.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
