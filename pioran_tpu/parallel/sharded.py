"""Samplers sharded over a device mesh via shard_map + XLA collectives."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..samplers.nuts import run_nuts
from ..samplers.smc import SMCResult, _find_dlambda, systematic_resample

__all__ = ["run_nuts_sharded", "run_smc_sharded", "run_ns_sharded",
           "run_chees_sharded", "sharded_batched_fn"]


def _axis_size(mesh: Mesh, axis_name) -> int:
    """Mesh-axis size; accepts a single axis name or a tuple of names
    (a tuple shards over the product of the axes, e.g. ("hosts","chains"))."""
    if isinstance(axis_name, (tuple, list)):
        n = 1
        for a in axis_name:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis_name]


def sharded_batched_fn(batch_fn: Callable, mesh: Mesh, axis_name: str):
    """Shard a (B, ...) -> (B,) batched function's batch axis over the mesh.

    The returned function runs ``batch_fn`` on each device's slice via
    ``shard_map`` — the TPU-native analog of ultranest farming likelihood
    batches over MPI ranks (SURVEY §2.6 "particle axis"): compute stays
    local, the caller's reductions become XLA collectives. B must be
    divisible by the mesh axis size.
    """
    f = shard_map(
        batch_fn, mesh=mesh,
        in_specs=P(axis_name), out_specs=P(axis_name),
        check_vma=False,
    )

    def wrapped(U):
        return f(U)

    return wrapped


def run_ns_sharded(
    loglike_u_batch: Callable,
    key,
    mesh: Mesh,
    axis_name: str = "particles",
    **ns_kwargs,
):
    """Nested sampling with the likelihood sweeps sharded over the mesh.

    Nested sampling's control flow (sorting K scalars, evidence
    bookkeeping) is trivially cheap; ALL the cost is the batched
    likelihood sweeps of width ``n_delete``. So the multi-device design
    shards exactly that: ``run_ns`` runs as one replicated program whose
    sweeps fan out over the ``axis_name`` mesh axis — the direct
    TPU-native replacement for ultranest's MPI worker farm (reference
    examples/ultranest/single_pl.jl:19-21, docs/src/ultranest.md:45-66).
    ``n_delete`` (and ``num_live``) must be divisible by the axis size.
    """
    from ..samplers.ns import run_ns

    n_dev = _axis_size(mesh, axis_name)
    n_delete = ns_kwargs.get("n_delete", 128)
    if n_delete % n_dev != 0:
        raise ValueError(
            f"n_delete={n_delete} not divisible by {n_dev} devices")
    sharded_ll = sharded_batched_fn(loglike_u_batch, mesh, axis_name)
    return run_ns(sharded_ll, key, **ns_kwargs)


def run_chees_sharded(
    logp_fn: Callable,
    z0,
    key,
    mesh: Mesh,
    axis_name: str = "chains",
    **chees_kwargs,
):
    """ChEES-HMC with the chain axis sharded over the mesh (GSPMD style).

    ChEES is batch-first by design (samplers/chees.py:10-14): every
    cross-chain adaptation statistic is a plain mean over the leading
    chains axis. So the idiomatic TPU scale-out is NOT shard_map but
    GSPMD: lay ``z0`` out as ``P(axis_name)`` on the mesh and jit — XLA
    partitions the leapfrog batch and inserts `all-reduce`s for the
    ChEES/step-size/mass statistics over ICI/DCN automatically.

    ``z0``: (C, dim) with C divisible by the mesh axis size. Works with
    a 1-D mesh or the ("hosts","chains") 2-D mesh (pass
    ``axis_name=("hosts", "chains")`` to shard C over both axes).
    Returns (samples, stats) with samples sharded the same way.
    """
    from ..samplers.chees import run_chees
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(axis_name))
    z0 = jax.device_put(z0, sharding)
    key = jax.device_put(key, NamedSharding(mesh, P()))
    return run_chees(logp_fn, z0, key, **chees_kwargs)


def run_nuts_sharded(
    logp_fn: Callable,
    z0,
    keys,
    mesh: Mesh,
    axis_name: str = "chains",
    pool_mass: bool = True,
    **nuts_kwargs,
):
    """NUTS with the chain axis sharded over the mesh.

    ``z0``: (C, dim) initial chains, C divisible by the mesh axis size;
    ``keys``: (C, 2) PRNG keys. Inside each shard, chains are vmapped;
    with ``pool_mass`` the diagonal mass-matrix estimate is pooled across
    ALL chains on all devices with `lax.pmean` at every adaptation-window
    boundary — the collective analog of cross-chain warmup adaptation
    (SURVEY §2.6 "chain axis").
    """
    # pool over BOTH the device axis and the within-device vmap lanes so
    # every chain shares one global mass-matrix estimate
    mass_axis = (axis_name, "_local_chains") if pool_mass else None

    def local(z0_local, keys_local):
        runner = lambda z, k: run_nuts(
            logp_fn, z, k, mass_pool_axis=mass_axis, **nuts_kwargs
        )
        return jax.vmap(runner, axis_name="_local_chains")(z0_local, keys_local)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return fn(z0, keys)


def run_smc_sharded(
    loglike_fn: Callable,
    prior_logpdf_fn: Callable,
    particles0,
    key,
    mesh: Mesh,
    axis_name: str = "particles",
    num_moves: int = 5,
    target_ess: float = 0.8,
    max_steps: int = 200,
):
    """Adaptive-tempering SMC with particles sharded over the mesh.

    Device-parallel version of pioran_tpu.samplers.smc.run_smc: the
    likelihood sweeps (the cost) stay local to each device's particle
    shard; ESS, the temperature search, log Z increments and resampling
    use `psum`/`all_gather` collectives — the TPU-native replacement for
    ultranest's MPI likelihood farm (SURVEY §2.6 "particle axis").
    """
    N, dim = particles0.shape
    dtype = particles0.dtype
    n_dev = _axis_size(mesh, axis_name)
    if N % n_dev != 0:
        raise ValueError(f"N={N} not divisible by {n_dev} devices")
    scale0 = 2.38 / jnp.sqrt(jnp.asarray(dim, dtype))

    batch_loglike = jax.vmap(loglike_fn)
    batch_prior = jax.vmap(prior_logpdf_fn)

    def local(p_local, key):
        # key is replicated; every device computes identical resampling
        # indices and temperatures (collectives give identical values).
        def move_once(k, particles, loglikes, logpriors, lam, chol):
            k_prop, k_acc = jax.random.split(k)
            nloc = particles.shape[0]
            eps = jax.random.normal(k_prop, particles.shape, dtype)
            prop = particles + scale0 * (eps @ chol.T)
            ll_prop = batch_loglike(prop)
            lp_prop = batch_prior(prop)
            log_alpha = lam * (ll_prop - loglikes) + (lp_prop - logpriors)
            accept = jnp.log(jax.random.uniform(k_acc, (nloc,), dtype)) < log_alpha
            particles = jnp.where(accept[:, None], prop, particles)
            loglikes = jnp.where(accept, ll_prop, loglikes)
            logpriors = jnp.where(accept, lp_prop, logpriors)
            return particles, loglikes, logpriors, jnp.mean(accept.astype(dtype))

        def step(state):
            particles, loglikes, logpriors, lam, logZ, i, key = state
            key, k_res, k_move = jax.random.split(key, 3)

            # global temperature search on gathered log-likelihoods
            ll_all = lax.all_gather(loglikes, axis_name, tiled=True)
            dl = _find_dlambda(ll_all, lam, target_ess)
            log_w_all = dl * ll_all
            incr = jax.scipy.special.logsumexp(log_w_all) - jnp.log(N)
            logZ = logZ + incr
            lam = lam + dl

            # global systematic resample; take this device's slice
            idx_all = systematic_resample(k_res, log_w_all)
            my = lax.axis_index(axis_name)
            nloc = particles.shape[0]
            idx_local = lax.dynamic_slice_in_dim(idx_all, my * nloc, nloc)
            p_all = lax.all_gather(particles, axis_name, tiled=True)
            lp_all = lax.all_gather(logpriors, axis_name, tiled=True)
            particles = p_all[idx_local]
            loglikes = ll_all[idx_local]
            logpriors = lp_all[idx_local]

            # cloud covariance from global moments (psum of local sums)
            s1 = lax.psum(jnp.sum(particles, axis=0), axis_name)
            mean = s1 / N
            centered = particles - mean
            s2 = lax.psum(centered.T @ centered, axis_name)
            cov = s2 / (N - 1) + 1e-10 * jnp.eye(dim, dtype=dtype)
            chol = jnp.linalg.cholesky(cov)

            # per-device independent move keys
            k_move = jax.random.fold_in(k_move, my)
            def one_move(carry, k):
                particles, loglikes, logpriors, acc = carry
                particles, loglikes, logpriors, a = move_once(
                    k, particles, loglikes, logpriors, lam, chol
                )
                return (particles, loglikes, logpriors, acc + a), None

            keys = jax.random.split(k_move, num_moves)
            (particles, loglikes, logpriors, acc), _ = lax.scan(
                one_move, (particles, loglikes, logpriors, jnp.zeros((), dtype)), keys
            )
            return particles, loglikes, logpriors, lam, logZ, i + 1, key

        def cond(state):
            lam, i = state[3], state[5]
            return (lam < 1.0) & (i < max_steps)

        loglikes0 = batch_loglike(p_local)
        logpriors0 = batch_prior(p_local)
        state = (p_local, loglikes0, logpriors0,
                 jnp.zeros((), dtype), jnp.zeros((), dtype),
                 jnp.zeros((), jnp.int32), key)
        particles, loglikes, logpriors, lam, logZ, i, _ = lax.while_loop(
            cond, step, state
        )
        return particles, logZ, i

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(axis_name), P(), P()),
        check_vma=False,
    )
    particles, logZ, steps = jax.jit(fn)(particles0, key)
    return SMCResult(
        particles=particles, logZ=logZ, num_steps=steps,
        log_evidence_path=jnp.zeros((0,), dtype),
        lambdas=jnp.zeros((0,), dtype), acceptance=jnp.zeros((0,), dtype),
    )
