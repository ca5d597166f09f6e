"""Vectorized nested sampling: analytic-evidence oracle tests.

The reference's inference driver is ultranest nested sampling
(reference examples/ultranest/single_pl.jl:116-119); samplers/ns.py is
its TPU-native replacement. These tests pin the evidence estimator on a
toy with known logZ and the posterior moments it implies — the same
acceptance standard as BASELINE.md's logZ anchors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu.samplers.ns import run_ns, equal_weight_indices


DIM, SIGMA = 4, 0.05


def _loglike(U):
    return -0.5 * jnp.sum((U - 0.5) ** 2, axis=-1) / SIGMA**2


LOGZ_TRUE = DIM * np.log(SIGMA * np.sqrt(2 * np.pi))


@pytest.fixture(scope="module")
def ns_result():
    return run_ns(
        _loglike, jax.random.PRNGKey(0), num_live=512, dim=DIM,
        n_delete=64, num_mcmc=6, max_iters=400, frac_remain=1e-3,
    )


def test_ns_evidence_matches_analytic(ns_result):
    res = ns_result
    err = float(res.logZ_err)
    assert err < 0.2
    assert abs(float(res.logZ) - LOGZ_TRUE) < 3 * err


def test_ns_posterior_moments(ns_result):
    res = ns_result
    idx = equal_weight_indices(
        jax.random.PRNGKey(1), res.dead_logl, res.dead_logw,
        res.num_dead, 4000,
    )
    U = np.asarray(res.dead_u)[np.asarray(idx)]
    assert np.allclose(U.mean(axis=0), 0.5, atol=0.01)
    assert np.allclose(U.std(axis=0), SIGMA, rtol=0.2)


def test_ns_terminates_and_counts(ns_result):
    res = ns_result
    it = int(res.num_iters)
    assert 0 < it < 400
    assert int(res.num_dead) == it * 64 + 512
    # slice move: 2 n_expand + n_shrink = 16 sweeps per update
    assert int(res.ncall) == 512 + it * 64 * 6 * 16
    assert np.isfinite(float(res.H)) and float(res.H) > 0


def test_ns_dead_logl_sorted_within_reason(ns_result):
    # dead likelihoods rise (monotone up to the appended live block)
    res = ns_result
    n = int(res.num_iters) * 64
    ll = np.asarray(res.dead_logl)[:n]
    assert (np.diff(ll) >= 0).mean() > 0.95  # batches sorted, joins can dip


def test_ns_rwm_move_also_converges():
    # the cheaper RWM replacement chain stays available and unbiased on
    # a compact unimodal target
    res = run_ns(
        _loglike, jax.random.PRNGKey(3), num_live=512, dim=DIM,
        n_delete=64, num_mcmc=24, move="rwm", max_iters=400,
        frac_remain=1e-3,
    )
    assert abs(float(res.logZ) - LOGZ_TRUE) < 3 * max(float(res.logZ_err), 0.1)
    assert int(res.ncall) == 512 + int(res.num_iters) * 64 * 24


def test_equal_weight_excludes_padding():
    # indices must never point past num_dead
    res = run_ns(
        _loglike, jax.random.PRNGKey(5), num_live=128, dim=DIM,
        n_delete=16, num_mcmc=12, max_iters=200, frac_remain=1e-2,
    )
    idx = np.asarray(equal_weight_indices(
        jax.random.PRNGKey(2), res.dead_logl, res.dead_logw,
        res.num_dead, 1000,
    ))
    assert idx.max() < int(res.num_dead)
