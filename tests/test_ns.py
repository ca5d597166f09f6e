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


def test_ns_resumable_matches_and_resumes(tmp_path):
    """Same PRNG path => run_ns_resumable reproduces run_ns exactly,
    and restarting from a mid-run checkpoint completes to the same
    result (the ultranest ``resume = true`` analog)."""
    from pioran_tpu.samplers.ns import (
        _make_ns_step, _ns_init_state, run_ns_resumable,
    )
    from pioran_tpu.checkpoint import CheckpointManager

    key = jax.random.PRNGKey(4)
    kwargs = dict(num_live=128, dim=DIM, n_delete=16, num_mcmc=4,
                  max_iters=300, frac_remain=1e-2)
    ref = run_ns(_loglike, key, **kwargs)

    d = str(tmp_path / "ns")
    res = run_ns_resumable(_loglike, key, d, **kwargs)
    np.testing.assert_allclose(float(res.logZ), float(ref.logZ), rtol=1e-10)
    assert int(res.num_iters) == int(ref.num_iters)

    # simulate an interrupted run: save only a step-2 checkpoint
    d2 = str(tmp_path / "ns2")
    mgr = CheckpointManager(d2, max_to_keep=4, save_every=1)
    dtype = jnp.result_type(float)
    k_init, k_rest = jax.random.split(key)
    live_u = jax.random.uniform(k_init, (128, DIM), dtype)
    st = _ns_init_state(live_u, _loglike(live_u), k_rest, 128, 16, DIM,
                        dtype, 300, "slice")
    step = jax.jit(_make_ns_step(_loglike, 128, 16, DIM, dtype, 4,
                                 "slice", 4, 8, 300))
    st = step(step(st))
    mgr.save(st, int(st[4]))

    res2 = run_ns_resumable(_loglike, key, d2, **kwargs)
    np.testing.assert_allclose(float(res2.logZ), float(ref.logZ), rtol=1e-10)
    idx = np.asarray(equal_weight_indices(
        jax.random.PRNGKey(0), res2.dead_logl, res2.dead_logw,
        res2.num_dead, 1000))
    U = np.asarray(res2.dead_u)[idx]
    assert np.allclose(U.mean(axis=0), 0.5, atol=0.02)


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


def test_insertion_order_test_uniform_vs_biased():
    """MWW rank test: uniform ranks pass, piled-up ranks fail
    (the ultranest insertion_order_MWW_test semantics, reference
    examples/ultranest/inference/simu_single/info/results.json)."""
    from pioran_tpu.utils.insertion import insertion_order_test

    rng = np.random.default_rng(0)
    n_slots = 448
    uni = rng.integers(0, n_slots + 1, size=4000)
    res = insertion_order_test(uni, n_slots)
    assert res["converged"]
    assert res["independent_iterations"] == float("inf")
    assert res["pvalue"] > 0.01

    # unmixed replacement chains: ranks skew low (points stay near
    # their low-likelihood start region)
    biased = rng.integers(0, (2 * n_slots) // 3, size=4000)
    res_b = insertion_order_test(biased, n_slots)
    assert not res_b["converged"]
    assert res_b["independent_iterations"] < float("inf")

    # the unused buffer tail (-1 rows) is ignored
    padded = np.concatenate([uni, np.full(1000, -1.0)])
    res_p = insertion_order_test(padded, n_slots)
    assert res_p["n_ranks"] == uni.size


def test_ns_insert_ranks_recorded_and_uniform(ns_result):
    """The NS run records one rank per dead point, in [0, K - D], and
    the slice replacements pass the insertion-order uniformity test."""
    from pioran_tpu.utils.insertion import insertion_order_test

    res = ns_result
    ranks = np.asarray(res.insert_ranks)
    n_recorded = int(res.num_iters) * 64
    assert np.all(ranks[:n_recorded] >= 0)
    assert np.all(ranks[:n_recorded] <= 512 - 64)
    assert np.all(ranks[n_recorded:] < 0)
    mww = insertion_order_test(ranks, n_slots=512 - 64)
    assert mww["n_ranks"] == n_recorded
    assert mww["converged"], mww


def test_z_crit_bisection_matches_scipy():
    """ADVICE r4: the no-scipy critical-value fallback must track the
    actual Bonferroni-corrected alpha (the old fixed 5.8 corresponded
    to alpha ~ 1e-8 and made the rolling window test toothless)."""
    from scipy.special import erfcinv

    from pioran_tpu.utils.insertion import _z_crit_bisect

    for alpha in (0.05, 0.01, 1e-3, 1e-4, 1e-6, 1e-8):
        want = np.sqrt(2.0) * float(erfcinv(alpha))
        got = _z_crit_bisect(alpha)
        assert abs(got - want) < 1e-9, (alpha, got, want)
