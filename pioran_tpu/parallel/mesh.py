"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_chain_count", "initialize_distributed"]


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group init (no-op on single host).

    Thin wrapper over ``jax.distributed.initialize`` so drivers can call
    it unconditionally (the reference's analog is MPI.Init /
    `julia -p N`, reference examples/ultranest/single_pl.jl:19-21).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # single-process environment without coordinator config
        pass


def make_mesh(
    axis_name: str = "chains",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A 1-D mesh over all (or the given) devices.

    One axis is the right shape for this workload: chains/particles are
    embarrassingly parallel, so the mesh axis carries them and the only
    collectives are warmup pooling and evidence reductions (SURVEY §2.6).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def local_chain_count(total_chains: int, mesh: Mesh, axis_name: str = "chains") -> int:
    n_dev = mesh.shape[axis_name]
    if total_chains % n_dev != 0:
        raise ValueError(
            f"total_chains={total_chains} must be divisible by mesh axis size {n_dev}"
        )
    return total_chains // n_dev
