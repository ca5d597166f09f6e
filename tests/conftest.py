"""Test configuration: float64 + an 8-device virtual CPU mesh.

Parity with the reference (float64 Julia) is checked on CPU in x64 mode;
multi-chip sharding tests run on 8 virtual CPU devices
(`xla_force_host_platform_device_count`), the standard JAX pattern for
testing `Mesh`/collective code without real chips.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported (and pointed at the TPU) by the image's
# sitecustomize; jax.config still switches the platform before first use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def simu_data():
    """The reference's bundled 489-point light curve (test/data/simu.txt)."""
    path = os.path.join(os.path.dirname(__file__), "data", "simu.txt")
    A = np.loadtxt(path)
    return A[:, 0], A[:, 1], A[:, 2]


@pytest.fixture(scope="session")
def simu_log_data():
    path = os.path.join(os.path.dirname(__file__), "data", "simu_log.txt")
    A = np.loadtxt(path)
    return A[:, 0], A[:, 1], A[:, 2]
