"""Celerite O(N) solver vs the dense O(N^3) oracle.

The reference's load-bearing test pattern (test/test_likelihood.jl,
test/test_scalablegp.jl:109-132, test/test_prediction.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu import SingleBendingPowerLaw, approx, celerite_term, exp_term
from pioran_tpu.ops import celerite as cel
from pioran_tpu.ops import direct

ALPHA1 = [0.2, 0.03, 0.1, 0.46, 0.1, 0.21, 0.74, 0.1, 0.03, 0.92]
F1 = [1.3e-2, 1.32e-1, 5.53e-2, 3.3, 0.342, 3.2e1, 1.3, 4.0e1, 1.0e-2, 0.5]
ALPHA2 = [3.2, 3.1, 2.3, 2.57, 3.6, 2.3, 2.1, 2.79, 3.3, 3.8]
VARIANCES = [1.32, 35.3, 242.2, 46.6, 0.3, 0.244, 9.64, 0.75, 0.193, 0.21]
MU = [1.2, 0.3, 0.1, 0.46, 0.1, 0.21, 0.74, 0.1, 0.03, 0.92]


def _small_data():
    t = jnp.array([0.0, 3.0, 3.2, 3.4, 45.5, 101.2])
    y = jnp.array([1.3, 2.2, 4.21, 2.5, 3.3, 5.2])
    yerr = jnp.array([0.1, 0.2, 0.1, 0.1, 0.2, 0.1])
    return t, y, yerr


@pytest.mark.parametrize("i", range(10))
def test_loglike_matches_dense_small(i):
    t, y, yerr = _small_data()
    kern = approx(
        SingleBendingPowerLaw(ALPHA1[i], F1[i], ALPHA2[i]),
        1e-3, 1e2, 20, VARIANCES[i],
    )
    fast = float(cel.log_likelihood(kern, t, y - MU[i], yerr**2))
    dense = -float(direct.log_likelihood_direct(kern, t, y - MU[i], yerr**2))
    np.testing.assert_allclose(fast, dense, rtol=1e-9)


def test_loglike_matches_dense_fixture(simu_log_data):
    """489-point real fixture, parameters as reference test/test_likelihood.jl."""
    t, y, yerr = map(jnp.asarray, simu_log_data)
    f0 = 1.0 / (t[-1] - t[0]) / 100.0
    fM = 1.0 / jnp.min(jnp.diff(t)) / 2.0 * 20.0
    variance = float(jnp.var(y, ddof=1))
    kern = approx(SingleBendingPowerLaw(0.82, 0.01, 3.3), f0, fM, 20, variance)
    s2 = yerr**2
    fast = float(cel.log_likelihood(kern, t, y, s2))
    dense = -float(direct.log_likelihood_direct(kern, t, y, s2))
    np.testing.assert_allclose(fast, dense, rtol=1e-9)


def test_loglike_gradient_finite_and_matches_fd(simu_log_data):
    t, y, yerr = map(jnp.asarray, simu_log_data)
    f0 = 1.0 / (t[-1] - t[0]) / 100.0
    fM = 1.0 / jnp.min(jnp.diff(t)) / 2.0 * 20.0

    def loglike(p):
        kern = approx(SingleBendingPowerLaw(p[0], p[1], p[2]), f0, fM, 20, p[3])
        return cel.log_likelihood(kern, t, y - p[5], p[4] * yerr**2)

    p = jnp.array([0.82, 0.01, 3.3, float(jnp.var(y, ddof=1)), 1.0, 0.0])
    g = jax.grad(loglike)(p)
    assert np.all(np.isfinite(np.asarray(g)))
    # central finite differences
    eps = 1e-6
    for k in range(6):
        dp = jnp.zeros(6).at[k].set(eps * max(1.0, abs(float(p[k]))))
        fd = (loglike(p + dp) - loglike(p - dp)) / (2 * dp[k])
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=2e-4, atol=1e-7)


def test_predict_matches_dense(simu_log_data):
    t, y, yerr = map(jnp.asarray, simu_log_data)
    t, y, yerr = t[:200], y[:200], yerr[:200]
    kern = approx(
        SingleBendingPowerLaw(0.82, 0.01, 3.3),
        1e-3, 1e1, 20, float(jnp.var(y, ddof=1)),
    )
    s2 = yerr**2
    # target grids: observed, dense, shifted, random (reference test_prediction.jl)
    rng = np.random.default_rng(0)
    grids = {
        "observed": np.asarray(t),
        "dense": np.linspace(float(t[0]), float(t[-1]), 333),
        "shifted": np.asarray(t) + 0.37,
        "random": np.sort(rng.uniform(float(t[0]) - 5, float(t[-1]) + 5, 97)),
    }
    for name, tau in grids.items():
        tau = jnp.asarray(tau)
        dense = direct.predict_direct(kern, tau, t, y, s2)
        mm = cel.predict_matmul(kern, tau, t, y, s2)
        sc = cel.predict(kern, tau, t, y, s2)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(dense), rtol=1e-7,
                                   atol=1e-9, err_msg=f"matmul {name}")
        np.testing.assert_allclose(np.asarray(sc), np.asarray(dense), rtol=1e-7,
                                   atol=1e-9, err_msg=f"scan {name}")


def test_simulate_statistics():
    """Prior draws have the kernel's variance and pass a covariance check."""
    t = jnp.linspace(0.0, 100.0, 300)
    kern = exp_term(2.0, 0.5)  # k(0) = 1.0
    s2 = jnp.zeros_like(t)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draws = jax.vmap(lambda k: cel.simulate(k, kern, t, s2))(keys)
    var = float(jnp.mean(jnp.var(draws, axis=0)))
    np.testing.assert_allclose(var, 1.0, rtol=5e-2)
    # empirical lag-1 covariance ~ k(dt)
    dt = float(t[1] - t[0])
    emp = float(jnp.mean(jnp.mean(draws[:, 1:] * draws[:, :-1], axis=0)))
    np.testing.assert_allclose(emp, float(kern(dt)), rtol=7e-2)


def test_simulate_matches_dense_distribution():
    """A single draw transformed by the dense Cholesky^{-1} is ~N(0, I)."""
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (150,)) * 50.0)
    # (a, b, c, d) chosen with ac > bd so the term's PSD is positive
    kern = celerite_term(1.3, 0.1, 0.5, 3.2) + exp_term(2.0, 0.1)
    s2 = 0.01 * jnp.ones_like(t)
    K = direct.covariance_matrix(kern, t, t) + jnp.diag(s2)
    L = jnp.linalg.cholesky(K)
    keys = jax.random.split(jax.random.PRNGKey(2), 500)
    draws = jax.vmap(lambda k: cel.simulate(k, kern, t, s2))(keys)
    whitened = jax.scipy.linalg.solve_triangular(L, draws.T, lower=True)
    m = float(jnp.mean(whitened))
    v = float(jnp.var(whitened))
    assert abs(m) < 0.02
    np.testing.assert_allclose(v, 1.0, rtol=3e-2)


def test_vmapped_loglike_over_chains(simu_log_data):
    """The whole chain params -> loglike is vmappable (the TPU hot path)."""
    t, y, yerr = map(jnp.asarray, simu_log_data)
    f0 = 1.0 / (t[-1] - t[0]) / 100.0
    fM = 1.0 / jnp.min(jnp.diff(t)) / 2.0 * 20.0

    def loglike(p):
        kern = approx(SingleBendingPowerLaw(p[0], p[1], p[2]), f0, fM, 20, p[3])
        return cel.log_likelihood(kern, t, y - p[5], p[4] * yerr**2)

    base = jnp.array([0.82, 0.01, 3.3, float(jnp.var(y, ddof=1)), 1.0, 0.0])
    P = jnp.stack([base * (1.0 + 0.01 * k) for k in range(8)])
    batched = jax.jit(jax.vmap(loglike))(P)
    single = jnp.stack([loglike(P[k]) for k in range(8)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-10)


def test_loglike_minus_inf_on_non_pd(simu_log_data):
    """Extreme parameters that break positive-definiteness must give -inf,
    not a fake likelihood spike (f32 sampler-collapse regression)."""
    import jax.numpy as jnp

    from pioran_tpu.models.kernels import CeleriteKernel
    from pioran_tpu.ops.celerite import log_likelihood

    t, y, yerr = simu_log_data
    t = jnp.asarray(t, jnp.float32)
    yv = jnp.asarray(y, jnp.float32)
    # a celerite term with b >> a is not a valid covariance -> K loses PD
    kern = CeleriteKernel(
        a=jnp.array([1e-3], jnp.float32),
        b=jnp.array([5e3], jnp.float32),
        c=jnp.array([1e-4], jnp.float32),
        d=jnp.array([50.0], jnp.float32),
    )
    ll = log_likelihood(kern, t, yv - jnp.mean(yv), 1e-12 * jnp.ones_like(t))
    assert ll == -jnp.inf

    # valid kernel still finite
    kern_ok = CeleriteKernel(
        a=jnp.array([0.1], jnp.float32),
        b=jnp.array([0.0], jnp.float32),
        c=jnp.array([0.5], jnp.float32),
        d=jnp.array([0.0], jnp.float32),
    )
    ll_ok = log_likelihood(kern_ok, t, yv - jnp.mean(yv), 0.01 * jnp.ones_like(t))
    assert jnp.isfinite(ll_ok)


def test_logl_masked_matches_sliced():
    """Ragged oracle: logl_masked on a padded grid == logl on the slice."""
    import jax
    import jax.numpy as jnp

    from pioran_tpu.ops import celerite as cel

    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    J, N, nv = 4, 55, 37
    t = jnp.sort(jax.random.uniform(ks[6], (N,)) * 100)
    a = jax.random.uniform(ks[0], (J,)) * 0.5 + 0.1
    b = jax.random.uniform(ks[1], (J,)) * 0.2
    c = jax.random.uniform(ks[2], (J,)) * 0.3 + 0.05
    d = jax.random.uniform(ks[3], (J,)) * 0.4
    y = jax.random.normal(ks[4], (N,))
    s2 = jax.random.uniform(ks[5], (N,)) * 0.1 + 0.05
    tp = jnp.concatenate([t[:nv], jnp.full((N - nv,), t[nv - 1])])
    s2p = jnp.concatenate([s2[:nv], jnp.ones((N - nv,))])
    ref = float(cel.logl(a, b, c, d, t[:nv], y[:nv], s2[:nv]))
    out = float(cel.logl_masked(a, b, c, d, tp, y, s2p, nv))
    assert abs(ref - out) < 1e-9


def test_exp_neg_accuracy_and_f64_passthrough():
    """ops.celerite.exp_neg: ~ulp-accurate f32 exp(-u) (TPU's native
    f32 exp is ~30 ulps off near 1, which alone grew the long-N f32
    likelihood error linearly — benchmarks/GRID.md r3 vs r4); exact
    jnp.exp passthrough in f64."""
    from pioran_tpu.ops.celerite import exp_neg

    rng = np.random.default_rng(0)
    u64 = np.concatenate([rng.uniform(0, 0.05, 20000),
                          rng.uniform(0, 2.0, 20000),
                          rng.uniform(2.0, 20.0, 5000)])
    u32 = jnp.asarray(u64, jnp.float32)
    got = np.asarray(exp_neg(u32)).astype(np.float64)
    truth = np.exp(-np.asarray(u32, np.float64))
    rel = np.abs(got - truth) / truth
    u_arr = np.asarray(u32, np.float64)
    # the regime that matters (phi not yet decayed away): ~ulp accuracy
    assert rel[u_arr < 2.0].max() < 2e-7, rel[u_arr < 2.0].max()
    # large u floors at the f32 range-reduction subtraction (~u eps/2)
    assert rel.max() < 2e-6, rel.max()

    uf64 = jnp.asarray(u64, jnp.float64)
    np.testing.assert_array_equal(np.asarray(exp_neg(uf64)),
                                  np.asarray(jnp.exp(-uf64)))


def test_exp_neg_extreme_arguments_no_nan():
    """ADVICE r4: for u ~ 1e13 the unclamped range reduction cancels
    catastrophically (polynomial -> inf while exp2(-k) -> 0, 0*inf=NaN);
    the clamp at 104 (exp(-104) underflows f32 anyway) must return
    exactly 0 like jnp.exp(-u), including through gradients."""
    from pioran_tpu.ops.celerite import exp_neg

    u = jnp.asarray([50.0, 104.0, 200.0, 1e6, 1e13, 3.4e38], jnp.float32)
    out = np.asarray(exp_neg(u))
    assert np.all(np.isfinite(out))
    assert np.all(out >= 0.0)
    np.testing.assert_array_equal(out[2:], 0.0)
    # gradient stays finite (0 in the underflowed region)
    g = np.asarray(jax.grad(lambda x: jnp.sum(exp_neg(x)))(u))
    assert np.all(np.isfinite(g))
