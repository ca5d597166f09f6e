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

# Persistent compilation cache: the suite is compile-dominated (~190
# jitted programs); a warm cache cuts wall time by an order of magnitude.
_cache_dir = os.environ.get(
    "PIORAN_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Numerics hardening (SURVEY §5 sanitizers row): run the suite with
# PIORAN_TPU_DEBUG_NANS=1 to make every NaN produced inside jit raise
# immediately (jax's debug-nans mode, the JAX analog of -ffpe-trap).
if os.environ.get("PIORAN_TPU_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

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
