"""GP API tests (mirrors reference test/test_scalablegp.jl, test_mean.jl,
test_prediction.jl posterior pieces)."""

import jax
import jax.numpy as jnp
import numpy as np

from pioran_tpu import SingleBendingPowerLaw, approx, exp_term
from pioran_tpu.models.gp import CustomMean, GaussianProcess, ScalableGP, posterior


def _kernel():
    return approx(SingleBendingPowerLaw(0.2, 0.02, 3.1), 1e-4, 1e1, 30, 2.31)


def test_constructors():
    k = _kernel()
    f = ScalableGP(k)
    fm = ScalableGP(1.2, k)
    assert isinstance(f, GaussianProcess)
    assert float(jnp.asarray(f.mean)) == 0.0
    assert float(jnp.asarray(fm.mean)) == 1.2


def test_logpdf_matches_dense():
    t = jnp.array([0.0, 3.0, 3.2, 3.4, 45.5, 101.2])
    y = jnp.array([1.3, 2.2, 4.21, 2.5, 3.3, 5.2])
    yerr = jnp.array([0.1, 0.2, 0.1, 0.1, 0.2, 0.1])
    fm = ScalableGP(0.46, _kernel())
    fx = fm(t, yerr**2)
    np.testing.assert_allclose(
        float(fx.logpdf(y)), float(fx.logpdf_direct(y)), rtol=1e-10
    )


def test_custom_mean():
    """Sampling and likelihood with a callable mean (reference test_mean.jl)."""

    def m(x):
        return 1.3 * jnp.sin(2 * jnp.pi * x / 53.4) + 0.84

    kern = approx(SingleBendingPowerLaw(0.4, 1e-2, 3.1), 1e-3, 1e3, 20, 0.3)
    fp = ScalableGP(CustomMean(m), kern)
    t = jnp.linspace(0, 1000, 100)
    s2 = jnp.zeros_like(t)
    y = fp(t, s2).sample(jax.random.PRNGKey(12))
    assert np.all(np.isfinite(np.asarray(y)))
    ll = fp(t, s2).logpdf(jax.random.normal(jax.random.PRNGKey(0), (100,)))
    assert np.isfinite(float(ll))
    # mean is actually subtracted: shifting data by m(t) shifts nothing
    y2 = jax.random.normal(jax.random.PRNGKey(1), (100,)) * 0.3
    fx0 = ScalableGP(0.0, kern)(t, s2)
    np.testing.assert_allclose(
        float(fp(t, s2).logpdf(y2 + m(t))), float(fx0.logpdf(y2)), rtol=1e-10
    )


def test_posterior_mean_cov_std():
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (80,)) * 100)
    kern = exp_term(2.0, 0.1)
    fx = ScalableGP(0.5, kern)(t, 0.05 * jnp.ones_like(t))
    y = fx.sample(jax.random.PRNGKey(4))
    fp = posterior(fx, y)
    tau = jnp.linspace(0.0, 100.0, 133)
    mu = fp.mean(tau)
    cov = fp.cov(tau)
    std = fp.std(tau)
    assert np.all(np.isfinite(np.asarray(mu)))
    # cov PSD: eigenvalues >= -tiny (reference test_scalablegp.jl:159-167)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert evals.min() > -1e-8
    np.testing.assert_allclose(np.asarray(std), np.sqrt(np.diag(np.asarray(cov))), rtol=1e-8)
    # posterior sampling shapes + finiteness
    draws = fp.sample(jax.random.PRNGKey(5), tau, num_samples=7)
    assert draws.shape == (7, 133)
    assert np.all(np.isfinite(np.asarray(draws)))


def test_posterior_interpolates_data():
    """With tiny noise the posterior mean passes through the data."""
    t = jnp.linspace(0.0, 10.0, 50)
    kern = exp_term(2.0, 0.3)
    fx = ScalableGP(0.0, kern)(t, 1e-8 * jnp.ones_like(t))
    y = fx.sample(jax.random.PRNGKey(6))
    fp = posterior(fx, y)
    np.testing.assert_allclose(np.asarray(fp.mean(t)), np.asarray(y), atol=1e-5)
