"""Test configuration: force an 8-device CPU platform before JAX loads.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), the JAX-native mechanism for
testing pjit/shard_map programs without real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image pins JAX_PLATFORMS to the TPU plugin before pytest starts; the
# env var alone does not win, so force the platform through the config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "data"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference data artifacts not present",
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
