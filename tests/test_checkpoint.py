"""Checkpoint/resume of sampler state (reference analog: ultranest
resume=true, examples/ultranest/single_pl.jl:116)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu.checkpoint import (
    CheckpointManager,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from pioran_tpu.samplers.smc import run_smc, run_smc_resumable, smc_init


def _toy_problem():
    # 2-d Gaussian likelihood, standard-normal prior
    def loglike(z):
        return -0.5 * jnp.sum((z - 1.0) ** 2 / 0.5**2) - jnp.log(
            2 * jnp.pi * 0.5**2
        )

    def logprior(z):
        return -0.5 * jnp.sum(z**2) - jnp.log(2 * jnp.pi)

    return loglike, logprior


def test_save_restore_roundtrip(tmp_path):
    state = {
        "particles": jnp.arange(12.0).reshape(3, 4),
        "key": jax.random.PRNGKey(7),
        "logZ": jnp.float64(3.25) if jax.config.jax_enable_x64 else jnp.float32(3.25),
        "step": jnp.int32(5),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, 5)
    assert latest_step(d) == 5
    restored, step = restore_checkpoint(d, abstract_state=state)
    assert step == 5
    for k in state:
        np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(state[k]))


def test_manager_retention(tmp_path):
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d, max_to_keep=2, save_every=1)
    for s in range(1, 5):
        mgr.save({"x": jnp.full((2,), float(s))}, s)
    assert latest_step(d) == 4
    import os

    kept = sorted(n for n in os.listdir(d) if n.startswith("step_"))
    assert kept == ["step_00000003", "step_00000004"]


def test_smc_resumable_matches_and_resumes(tmp_path):
    loglike, logprior = _toy_problem()
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (512, 2))

    ref = run_smc(loglike, logprior, z0, key, num_particles=512, num_moves=3)

    d = str(tmp_path / "smc")
    res = run_smc_resumable(loglike, logprior, z0, key, d, num_moves=3)
    # identical PRNG path => identical result
    np.testing.assert_allclose(float(res.logZ), float(ref.logZ), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.particles), np.asarray(ref.particles), rtol=1e-6
    )

    # simulate an interrupted run: keep only the step-1 checkpoint
    import shutil

    d2 = str(tmp_path / "smc2")
    mgr = CheckpointManager(d2, max_to_keep=10, save_every=1)
    from pioran_tpu.samplers.smc import _make_step

    step = jax.jit(_make_step(loglike, logprior, z0.shape, z0.dtype, 3, 0.8, None))
    st = smc_init(loglike, logprior, z0, key)
    st = step(st)
    mgr.save(st, int(st[5]))

    res2 = run_smc_resumable(loglike, logprior, z0, key, d2, num_moves=3)
    np.testing.assert_allclose(float(res2.logZ), float(ref.logZ), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res2.particles), np.asarray(ref.particles), rtol=1e-6
    )
    # and the analytic evidence is right: logZ = log N(1; 0, 1 + 0.5^2) per dim
    from scipy.stats import norm

    exact = 2 * norm.logpdf(1.0, 0.0, np.sqrt(1 + 0.25)) - 2 * np.log(
        2 * np.pi * 0.25
    ) / 2.0
    # loglike includes its own normalisation: Z = integral L(z) pi(z) dz
    # L = N(z; 1, 0.5 I) up to the -log(2 pi 0.25) written above; compute directly
    zs = np.random.default_rng(0).normal(size=(200_000, 2))
    mc = np.log(
        np.mean(
            np.exp(
                -0.5 * np.sum((zs - 1.0) ** 2 / 0.25, axis=1)
                - np.log(2 * np.pi * 0.25)
            )
        )
    )
    assert abs(float(res2.logZ) - mc) < 0.15
