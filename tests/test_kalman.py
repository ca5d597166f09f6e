"""Kalman backends vs the celerite scan and the dense oracle.

The reference has a single fast path (src/celerite_solver.jl) checked
against the O(N^3) dense solver (test/test_likelihood.jl:53-60); here the
same oracle pattern covers three backends: celerite scan, sequential
Kalman filter, and the log-depth associative-scan Kalman filter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu.models.kernels import CeleriteKernel, Exp, SHO
from pioran_tpu.models.psd import SingleBendingPowerLaw
from pioran_tpu.ops.approx import approx
from pioran_tpu.ops.celerite import logl
from pioran_tpu.ops.direct import log_likelihood_direct
from pioran_tpu.ops.kalman import (
    log_likelihood_kalman,
    logl_kalman,
    logl_kalman_sequential,
)


def _random_problem(seed, N=120, J=3):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 50, N))
    y = rng.normal(size=N)
    sigma2 = 0.05 + 0.1 * rng.uniform(size=N)
    # celerite-stable coefficients: a c >= |b d|
    a = rng.uniform(0.5, 2.0, J)
    c = rng.uniform(0.1, 1.0, J)
    d = rng.uniform(0.0, 2.0, J)
    b = rng.uniform(0.0, 1.0, J) * a * c / np.maximum(d, 1e-3)
    b = np.minimum(b, a)
    return (
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
        jnp.asarray(t), jnp.asarray(y), jnp.asarray(sigma2),
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_kalman_sequential_matches_celerite_and_direct(seed):
    a, b, c, d, t, y, s2 = _random_problem(seed)
    ll_cel = float(logl(a, b, c, d, t, y, s2))
    ll_kf = float(logl_kalman_sequential(a, b, c, d, t, y, s2))
    kern = CeleriteKernel(a=a, b=b, c=c, d=d)
    ll_direct = -float(log_likelihood_direct(kern, t, y, s2))
    np.testing.assert_allclose(ll_kf, ll_cel, rtol=1e-9)
    np.testing.assert_allclose(ll_kf, ll_direct, rtol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_kalman_assoc_matches_sequential(seed):
    a, b, c, d, t, y, s2 = _random_problem(seed)
    ll_seq = float(logl_kalman_sequential(a, b, c, d, t, y, s2))
    ll_par = float(logl_kalman(a, b, c, d, t, y, s2))
    np.testing.assert_allclose(ll_par, ll_seq, rtol=1e-8)


def test_kalman_on_approx_kernel(simu_log_data):
    """Full flagship chain (SHO J=20 basis, b=a boundary terms)."""
    t, y, yerr = simu_log_data
    t = jnp.asarray(t)
    yv = jnp.asarray(np.log(np.asarray(y)))
    s2 = jnp.asarray(yerr) ** 2 / jnp.asarray(y) ** 2
    f_min = 1.0 / float(t[-1] - t[0])
    f_max = 0.5 / float(np.min(np.diff(np.asarray(t))))
    kern = approx(SingleBendingPowerLaw(0.76, 0.004, 2.78), f_min, f_max, 20, 0.022)
    yc = yv - jnp.mean(yv)
    from pioran_tpu.ops.celerite import log_likelihood

    ll_cel = float(log_likelihood(kern, t, yc, s2))
    ll_seq = float(log_likelihood_kalman(kern, t, yc, s2, sequential=True))
    ll_par = float(log_likelihood_kalman(kern, t, yc, s2))
    np.testing.assert_allclose(ll_seq, ll_cel, rtol=1e-8)
    np.testing.assert_allclose(ll_par, ll_cel, rtol=1e-6)


def test_kalman_drwcelerite_indefinite_pinf(simu_log_data):
    """DRWCelerite basis has b = sqrt(3) a > a (indefinite per-term Pinf);
    the filter must still match the other backends."""
    t, y, yerr = simu_log_data
    t = jnp.asarray(t)
    yv = jnp.asarray(np.log(np.asarray(y)))
    s2 = jnp.asarray(yerr) ** 2 / jnp.asarray(y) ** 2
    f_min = 1.0 / float(t[-1] - t[0])
    f_max = 0.5 / float(np.min(np.diff(np.asarray(t))))
    kern = approx(
        SingleBendingPowerLaw(0.76, 0.004, 2.78), f_min, f_max, 20, 0.022,
        basis_function="DRWCelerite",
    )
    yc = yv - jnp.mean(yv)
    from pioran_tpu.ops.celerite import log_likelihood

    ll_cel = float(log_likelihood(kern, t, yc, s2))
    ll_par = float(log_likelihood_kalman(kern, t, yc, s2))
    np.testing.assert_allclose(ll_par, ll_cel, rtol=1e-6)


def test_kalman_grad_finite():
    a, b, c, d, t, y, s2 = _random_problem(7, N=60, J=2)

    def f(params):
        aa, bb, cc, dd = params
        return logl_kalman(aa, bb, cc, dd, t, y, s2)

    g = jax.grad(f)((a, b, c, d))
    g_seq = jax.grad(
        lambda p: logl_kalman_sequential(p[0], p[1], p[2], p[3], t, y, s2)
    )((a, b, c, d))
    for ga, gb in zip(g, g_seq):
        assert jnp.all(jnp.isfinite(ga))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5)
