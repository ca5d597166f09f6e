"""Prior distribution tests: quantile/logpdf/sample consistency and the
unconstrained bijection (reference src/priors.jl + the prior_transform of
reference examples/ultranest/single_pl.jl:96-104)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as ss

from pioran_tpu.priors import (
    Gamma,
    LogNormal,
    LogUniform,
    Normal,
    PriorSet,
    ThreeUniformDependent,
    TwoLogUniformDependent,
    TwoUniformDependent,
    Uniform,
)

U = np.linspace(0.01, 0.99, 21)


@pytest.mark.parametrize(
    "dist,ss_dist",
    [
        (Uniform(0.2, 1.7), ss.uniform(0.2, 1.5)),
        (LogUniform(1e-3, 1e1), ss.loguniform(1e-3, 1e1)),
        (Normal(0.3, 2.1), ss.norm(0.3, 2.1)),
        (LogNormal(-1.5, 1.0), ss.lognorm(s=1.0, scale=np.exp(-1.5))),
        (Gamma(2.0, 0.5), ss.gamma(2.0, scale=0.5)),
    ],
)
def test_quantile_and_logpdf_vs_scipy(dist, ss_dist):
    q = np.asarray(jax.vmap(dist.quantile)(jnp.asarray(U)))
    np.testing.assert_allclose(q, ss_dist.ppf(U), rtol=1e-8)
    lp = np.asarray(jax.vmap(dist.logpdf)(jnp.asarray(q)))
    np.testing.assert_allclose(lp, ss_dist.logpdf(q), rtol=1e-8)


@pytest.mark.parametrize(
    "dist",
    [
        Uniform(0.2, 1.7),
        LogUniform(1e-3, 1e1),
        LogNormal(-1.5, 1.0),
        Gamma(2.0, 0.5),
    ],
)
def test_bijection_roundtrip_and_density(dist):
    xs = jax.vmap(dist.quantile)(jnp.asarray(U))
    zs = jax.vmap(dist.to_unconstrained)(xs)
    back = jax.vmap(dist.from_unconstrained)(zs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xs), rtol=1e-9)
    # pushforward density integrates the jacobian: check d/dz matches
    lp = jax.vmap(dist.unconstrained_logpdf)(zs)
    # numerically: logpdf(x) + log|dx/dz| via finite differences
    eps = 1e-6
    dxdz = (jax.vmap(dist.from_unconstrained)(zs + eps) - jax.vmap(dist.from_unconstrained)(zs - eps)) / (2 * eps)
    expected = jax.vmap(dist.logpdf)(xs) + jnp.log(jnp.abs(dxdz))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(expected), rtol=1e-5)


@pytest.mark.parametrize(
    "dist",
    [
        TwoUniformDependent(0.0, 1.25, 4.0),
        ThreeUniformDependent(0.0, 1.25, 4.0),
        TwoLogUniformDependent(1e-3, 1e1),
    ],
)
def test_dependent_priors(dist):
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    draws = jax.vmap(dist.sample)(keys)
    d = np.asarray(draws)
    # ordering holds for every draw
    assert np.all(np.diff(d, axis=-1) >= 0)
    # logpdf finite on draws, -inf on ordering violations
    lps = np.asarray(jax.vmap(dist.logpdf)(draws))
    assert np.all(np.isfinite(lps))
    bad = jnp.asarray(d[:, ::-1].copy())
    lp_bad = np.asarray(jax.vmap(dist.logpdf)(bad))
    assert np.all(np.isinf(lp_bad))
    # bijection round trip
    zs = jax.vmap(dist.to_unconstrained)(draws)
    back = jax.vmap(dist.from_unconstrained)(zs)
    np.testing.assert_allclose(np.asarray(back), d, rtol=1e-8)
    # unconstrained logpdf finite everywhere (including far tails)
    far = 20.0 * jax.random.normal(jax.random.PRNGKey(1), zs.shape)
    assert np.all(np.isfinite(np.asarray(jax.vmap(dist.unconstrained_logpdf)(far))))


def test_prior_set_single_pl():
    """The 6-parameter prior of the reference single-bending driver."""
    ps = PriorSet([
        ("alpha_1", Uniform(0.0, 1.25)),
        ("f_1", LogUniform(1e-3, 1e0)),
        ("alpha_2", Uniform(1.0, 4.0)),
        ("variance", LogNormal(-3.0, jnp.sqrt(2.0))),
        ("nu", Gamma(2.0, 0.5)),
        ("mu", Normal(0.0, 2.0)),
    ])
    assert ps.dim == 6
    u = jnp.full((6,), 0.5)
    theta = ps.transform(u)
    assert theta.shape == (6,)
    assert np.all(np.isfinite(np.asarray(theta)))
    lp = ps.logpdf(theta)
    assert np.isfinite(float(lp))
    # sample -> to_unconstrained -> from_unconstrained round trip
    th = ps.sample(jax.random.PRNGKey(2))
    z = ps.to_unconstrained(th)
    np.testing.assert_allclose(np.asarray(ps.from_unconstrained(z)), np.asarray(th), rtol=1e-8)
    # vmappable
    Z = jax.random.normal(jax.random.PRNGKey(3), (32, 6))
    lps = jax.jit(jax.vmap(ps.unconstrained_logpdf))(Z)
    assert lps.shape == (32,)
    assert np.all(np.isfinite(np.asarray(lps)))


def test_prior_set_with_dependent():
    """Mixing scalar and dependent priors (ordered alpha_1 < alpha_2)."""
    ps = PriorSet([
        ("alphas", TwoUniformDependent(0.0, 1.5, 4.0)),
        ("f_1", LogUniform(1e-3, 1e0)),
    ])
    assert ps.dim == 3
    th = ps.sample(jax.random.PRNGKey(0))
    assert th.shape == (3,)
    assert float(th[0]) <= float(th[1])
    u = jnp.array([0.3, 0.7, 0.5])
    theta = ps.transform(u)
    assert float(theta[0]) <= float(theta[1])
    z = ps.to_unconstrained(th)
    np.testing.assert_allclose(np.asarray(ps.from_unconstrained(z)), np.asarray(th), rtol=1e-8)
