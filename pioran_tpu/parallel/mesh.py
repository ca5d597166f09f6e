"""Device-mesh and multi-host process-group helpers.

The reference's distributed story is multi-process on CPU: `julia -p 6`
+ `pmap` over chains (reference examples/turing_distributed/
single_pl.jl:1,80-81) and an MPI worker farm for ultranest likelihood
sweeps (reference examples/ultranest/single_pl.jl:19-21). The TPU-native
replacement is `jax.distributed` process groups + one global device mesh:
a ("hosts", "chains") 2-D mesh whose first axis follows process
boundaries (collectives over it ride DCN) and whose second axis is each
host's local chips (ICI). Single-host runs collapse to a 1-D mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "local_chain_count",
    "initialize_distributed",
    "host_local_to_global",
    "driver_mesh",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> bool:
    """Multi-host process-group init; returns True when part of a group.

    Initialization triggers on any of: explicit arguments, the standard
    JAX coordinator env vars, or a recognized cluster environment
    (SLURM, Open MPI, Cloud TPU pod) — in which case
    ``jax.distributed.initialize``'s own cluster autodetection fills in
    the coordinator/process topology. Failures PROPAGATE — a
    misconfigured multi-host launch must die loudly, not silently fall
    back to one process. With no configuration at all this is a no-op
    returning False (single-process run), so drivers can call it
    unconditionally — the analog of the reference's top-of-script
    ``MPI.Init()`` (examples/ultranest/single_pl.jl:19-21).
    """
    # NB: must not touch jax.process_count()/jax.devices() here — any
    # backend query initializes XLA and jax.distributed.initialize then
    # refuses to run. Check the distributed client state directly.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # already initialized
    explicit = coordinator_address is not None or num_processes is not None
    env = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    # multi-process cluster environments jax's ClusterEnv detectors
    # understand but that set none of the vars above: without this check
    # a no-arg call on a SLURM/OMPI/TPU-pod launch would return False
    # and every host would silently run as its own one-process group
    cluster = _detect_cluster_env()
    if not (explicit or env or cluster):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_count() > 1


def _detect_cluster_env() -> bool:
    """True when a known multi-process cluster launcher is in play.

    Mirrors the environments ``jax.distributed.initialize``'s cluster
    autodetection handles: SLURM srun tasks, Open MPI ranks, and Cloud
    TPU pod workers (metadata-provided worker lists). Single-task
    launches (e.g. ``srun -n 1``, ``mpirun -n 1``) do not count.
    """

    def _int(name):
        try:
            return int(os.environ.get(name, ""))
        except ValueError:
            return 0

    if os.environ.get("SLURM_JOB_ID") and _int("SLURM_NTASKS") > 1:
        return True
    if _int("OMPI_COMM_WORLD_SIZE") > 1:
        return True
    # Cloud TPU pod: the runtime exports the worker roster on every host
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h]) > 1:
        return True
    return False


def make_mesh(
    axis_name: str = "chains",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 1-D mesh over all (or the given) devices.

    One axis is the right shape for single-host workloads:
    chains/particles are embarrassingly parallel, so the mesh axis
    carries them and the only collectives are warmup pooling and
    evidence reductions (SURVEY §2.6).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    axis_names: Tuple[str, str] = ("hosts", "chains"),
) -> Mesh:
    """The ("hosts", "chains") mesh of SURVEY §2.6/M4.

    Rows follow process boundaries: row h holds process h's local
    devices, so collectives over ``axis_names[0]`` cross hosts (DCN)
    and collectives over ``axis_names[1]`` stay on-host (ICI). Works
    single-process too (1 x n_devices). Requires every process to
    contribute the same number of local devices.
    """
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if len(devs) % n_proc != 0:
        raise ValueError(
            f"{len(devs)} devices not divisible by {n_proc} processes")
    grid = np.asarray(devs).reshape(n_proc, len(devs) // n_proc)
    return Mesh(grid, axis_names)


def driver_mesh(
    n_devices: int = 0,
    distributed: bool = False,
    axes: Tuple[str, str] = ("hosts", "chains"),
) -> Optional[Mesh]:
    """Top-of-script mesh setup for CLI drivers.

    The one call an example script makes before ``run_inference(mesh=…)``
    — the analog of the reference drivers' opening ``MPI.Init()``
    (examples/ultranest/single_pl.jl:19-21) / ``julia -p 6``
    (examples/turing_distributed/single_pl.jl:1):

    - ``distributed=True``: join the multi-host process group
      (:func:`initialize_distributed`) and build the global
      ("hosts", "chains") 2-D mesh.
    - ``n_devices > 0``: 1-D mesh over the first ``n_devices`` local
      devices; ``n_devices < 0``: all local devices.
    - default (``n_devices == 0``, single process): all local devices if
      there is more than one, else ``None`` (plain single-chip run).
    """
    if distributed:
        initialize_distributed()
        return make_mesh_2d(axes)
    devs = list(jax.devices())
    if n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"--mesh {n_devices} requested but only {len(devs)} "
                "devices are visible")
        return make_mesh(axes[-1], devs[:n_devices])
    if n_devices < 0 or len(devs) > 1:
        return make_mesh(axes[-1], devs)
    return None


def host_local_to_global(mesh: Mesh, spec: PartitionSpec, local_array):
    """Assemble a global sharded array from per-process local shards.

    Each process passes its own slice of the leading (sharded) axis;
    the result is one global jax.Array laid out per ``spec`` on
    ``mesh`` — the hand-off point between host-side numpy and the
    SPMD program (the analog of scattering work to MPI ranks).
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_array))


def local_chain_count(total_chains: int, mesh: Mesh, axis_name: str = "chains") -> int:
    n_dev = mesh.shape[axis_name]
    if total_chains % n_dev != 0:
        raise ValueError(
            f"total_chains={total_chains} must be divisible by mesh axis size {n_dev}"
        )
    return total_chains // n_dev
