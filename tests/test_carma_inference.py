"""CARMA(p,q) inference model spec: oracle parity + prior geometry.

Mirrors the reference's experimental CARMA inference workflow
(reference docs/src/carma.md:63-200): quadratic-factor parameterization,
root-band constraints, log(y - c) transform. The TPU re-parameterization
(u = c_quad - b^2/4) makes the root constraints hold with prior
probability 1 — asserted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu.inference import carma_model


@pytest.mark.parametrize("p,q,use_c", [(2, 0, False), (3, 1, True), (4, 2, False)])
def test_carma_loglike_matches_dense_oracle(simu_data, p, q, use_c):
    t, y, yerr = simu_data
    xbar, va = float(np.mean(np.log(y))), float(np.var(np.log(y)))
    spec = carma_model(t, y, yerr, xbar, va, p=p, q=q, use_c=use_c)
    assert spec.prior.dim == len(spec.names)
    for seed in range(3):
        th = spec.prior.sample(jax.random.PRNGKey(seed))
        ll = float(jax.jit(spec.loglike)(th))
        fx = spec.gp_model(t, y, yerr, th)
        yv = jnp.log(jnp.asarray(y) - th[-1]) if use_c else jnp.log(jnp.asarray(y))
        lld = float(fx.logpdf_direct(yv))
        assert abs(ll - lld) < 1e-5 * max(1.0, abs(lld))


def test_carma_roots_always_in_band(simu_data):
    """The re-parameterized prior puts roots in the reference's band
    (-f_max < Re r < -f_min, |Im r| < f_max) with probability 1."""
    t, y, yerr = simu_data
    xbar, va = float(np.mean(np.log(y))), float(np.var(np.log(y)))
    spec = carma_model(t, y, yerr, xbar, va, p=4, q=2)
    f_min, f_max = spec.f_min, spec.f_max
    for seed in range(20):
        th = np.asarray(spec.prior.sample(jax.random.PRNGKey(seed)))
        for k in range(2):  # p=4 -> two (u, b) pairs at offsets 0, 2
            u, b = th[2 * k], th[2 * k + 1]
            re, im = -b / 2, np.sqrt(u)
            assert -f_max < re < -f_min
            assert abs(im) < f_max


def test_carma_gradients_finite(simu_data):
    t, y, yerr = simu_data
    xbar, va = float(np.mean(np.log(y))), float(np.var(np.log(y)))
    spec = carma_model(t, y, yerr, xbar, va, p=2, q=1, use_c=True)
    th = spec.prior.sample(jax.random.PRNGKey(0))
    g = jax.grad(spec.loglike)(th)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("p,q", [(2, 0), (2, 1), (3, 1), (4, 2), (5, 2)])
def test_real_arithmetic_matches_complex_oracle(p, q):
    """TPU backends have no complex dtype; the real (re, im)-pair
    partial-fraction path must agree with the complex oracle to f64."""
    from pioran_tpu.models.carma import (
        CARMA, carma_celerite_coefs, carma_celerite_coefs_real, carma_psd,
        carma_psd_real, poly_from_conjugate_pairs, roots2coeffs,
    )

    rng = np.random.default_rng(p * 10 + q)
    re_l, im_l, roots = [], [], []
    for _ in range(p // 2):
        x, yv = -rng.uniform(0.1, 2), rng.uniform(0.01, 3)
        roots += [x + 1j * yv, x - 1j * yv]
        re_l += [x, x]
        im_l += [yv, -yv]
    if p % 2:
        x = -rng.uniform(0.1, 2)
        roots.append(x + 0j)
        re_l.append(x)
        im_l.append(0.0)
    roots = jnp.asarray(np.asarray(roots))
    rre, rim = jnp.asarray(re_l), jnp.asarray(im_l)

    bre, bim, mroots, mreal = [], [], [], []
    for _ in range(q // 2):
        x, yv = -rng.uniform(0.1, 2), rng.uniform(0.01, 3)
        mroots += [x + 1j * yv, x - 1j * yv]
        bre.append(jnp.asarray(x))
        bim.append(jnp.asarray(yv))
    if q % 2:
        x = -rng.uniform(0.1, 2)
        mroots.append(x + 0j)
        mreal.append(jnp.asarray(x))
    beta = (np.real(np.asarray(roots2coeffs(jnp.asarray(np.asarray(mroots)))))
            if q else np.ones(1))
    beta_r = np.asarray(poly_from_conjugate_pairs(bre, bim, mreal))
    np.testing.assert_allclose(beta, beta_r, rtol=1e-12)

    A = carma_celerite_coefs(p, roots, jnp.asarray(beta), norm=1.7)
    B = carma_celerite_coefs_real(p, rre, rim, jnp.asarray(beta), norm=1.7)
    for u, v in zip(A, B):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-9)

    m = CARMA.create(p, q, roots, jnp.asarray(beta), norm=1.7)
    f = jnp.geomspace(1e-3, 10, 64)
    np.testing.assert_allclose(
        np.asarray(carma_psd(f, m)),
        np.asarray(carma_psd_real(f, p, q, rre, rim, jnp.asarray(beta), 1.7)),
        rtol=1e-8,
    )


def test_carma_batched_loglike_matches_scan(simu_data):
    t, y, yerr = simu_data
    xbar, va = float(np.mean(np.log(y))), float(np.var(np.log(y)))
    spec = carma_model(t, y, yerr, xbar, va, p=2, q=0)
    TH = jnp.stack([spec.prior.sample(jax.random.PRNGKey(s)) for s in range(4)])
    batched = np.asarray(spec.loglike_batch(TH))
    single = np.asarray(jax.vmap(spec.loglike)(TH))
    np.testing.assert_allclose(batched, single, rtol=1e-8)
