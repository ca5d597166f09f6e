"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Each process runs this script with ``process_id num_processes port``.
It joins the process group over localhost (the TPU-native analog of the
reference's `mpirun -n 4 julia script.jl`, reference
examples/ultranest/single_pl.jl:3-14), builds the ("hosts","chains")
2-D mesh of SURVEY §2.6/M4, and runs three cross-process checks:

1. a psum over both mesh axes (collective correctness across DCN),
2. a sharded ChEES-HMC run on a 2-D Gaussian (GSPMD partitioning of the
   cross-chain adaptation statistics across process boundaries),
3. a sharded SMC step (evidence psum + global resampling).

Prints ``MULTIHOST_OK <psum> <chees_mean0> <smc_logz>`` on success;
the parent test asserts both processes print identical values.
"""

import os
import sys

proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pioran_tpu.parallel import (  # noqa: E402
    host_local_to_global,
    initialize_distributed,
    make_mesh_2d,
    run_chees_sharded,
    run_smc_sharded,
)

ok = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)
assert ok, "process group failed to form"
assert jax.process_count() == n_procs, jax.process_count()
assert len(jax.devices()) == 4 * n_procs, len(jax.devices())

mesh = make_mesh_2d(("hosts", "chains"))
assert mesh.shape["hosts"] == n_procs
assert mesh.shape["chains"] == 4

# --- 1. collective correctness: psum over both axes -------------------
local = np.arange(4, dtype=np.float64) + 10.0 * proc_id  # 4 local shards
x = host_local_to_global(mesh, P(("hosts", "chains")), local)


@jax.jit
def global_sum(x):
    return jnp.sum(x)  # GSPMD: all-reduce across hosts + local devices


psum_val = float(global_sum(x))

# --- 2. sharded ChEES across process boundaries -----------------------
C, dim = 8 * n_procs, 2


def logp(z):
    return -0.5 * jnp.sum((z - 1.5) ** 2)


rng = np.random.default_rng(0)
z0_local = rng.normal(size=(C // n_procs, dim))
z0 = host_local_to_global(mesh, P(("hosts", "chains")), z0_local)
key = jax.random.PRNGKey(0)
samples, stats = run_chees_sharded(
    logp, z0, key, mesh, axis_name=("hosts", "chains"),
    num_warmup=40, num_samples=40, max_leapfrogs=16,
)
chees_mean = float(jnp.mean(samples))  # all-reduce across the group

# --- 3. sharded SMC step (evidence psum + global resample) ------------
N = 16 * n_procs
p0_local = rng.normal(size=(N // n_procs, dim)) * 3.0
p0 = host_local_to_global(mesh, P(("hosts", "chains")), p0_local)


def prior_logpdf(z):
    return -0.5 * jnp.sum(z * z) / 9.0 - dim * 0.5 * jnp.log(2 * jnp.pi * 9.0)


res = run_smc_sharded(
    logp, prior_logpdf, p0, jax.random.PRNGKey(1), mesh,
    axis_name=("hosts", "chains"), num_moves=3, max_steps=30,
)
smc_logz = float(res.logZ)

print(f"MULTIHOST_OK {psum_val:.6f} {chees_mean:.6f} {smc_logz:.6f}",
      flush=True)
