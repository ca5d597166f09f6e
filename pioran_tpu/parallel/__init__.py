"""Multi-chip parallelism: device meshes + sharded samplers.

The reference's entire distributed story is process-level: Distributed.jl
`pmap` over chains and MPI worker farms for ultranest likelihoods
(reference examples/turing_distributed/single_pl.jl:1,80-81,
examples/ultranest/single_pl.jl:19-21; SURVEY §2.6). The TPU-native
replacement keeps everything on-device:

- a 1-D (or ("hosts","chains")) `jax.sharding.Mesh`
- chains/particles sharded over the mesh via `shard_map`
- cross-chain warmup pooling, SMC evidence reduction and resampling as
  XLA collectives (`pmean`/`psum`/`all_gather`) over ICI/DCN

Use `jax.distributed.initialize()` before building the mesh on real
multi-host pods; everything below is host-count agnostic.
"""

from .mesh import (
    driver_mesh,
    host_local_to_global,
    initialize_distributed,
    local_chain_count,
    make_mesh,
    make_mesh_2d,
)
from .sharded import (
    run_chees_sharded,
    run_nuts_sharded,
    run_smc_sharded,
    run_ns_sharded,
    sharded_batched_fn,
)

__all__ = [
    "driver_mesh",
    "make_mesh",
    "make_mesh_2d",
    "local_chain_count",
    "initialize_distributed",
    "host_local_to_global",
    "run_chees_sharded",
    "run_nuts_sharded",
    "run_smc_sharded",
    "run_ns_sharded",
    "sharded_batched_fn",
]
