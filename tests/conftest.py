"""Test harness configuration.

Runs the suite on a virtual 8-device CPU mesh with float64 enabled so the
sharded code paths execute without TPU hardware and numerical oracles hold at
reference (double) precision.  Must set env before jax import.
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which must not be used for the (x64, loop-heavy) unit suite
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
