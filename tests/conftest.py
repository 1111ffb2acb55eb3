"""Test harness: run everything on a virtual 8-device CPU mesh so that the
sharded paths are exercised without TPU hardware.

The image preimports jax via sitecustomize and pins ``jax_platforms`` to
"axon,cpu" (one real TPU through a tunnel), so env vars alone don't switch
platforms — we must update the jax config before the first backend use.
Keeping tests off the TPU also avoids serializing the whole suite through
the single TPU grant.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x10A4)
