"""CARMA tests (mirrors reference test/test_carma.jl)."""

import jax
import jax.numpy as jnp
import numpy as np

from pioran_tpu.models.carma import (
    CARMA,
    carma_covariance,
    carma_psd,
    quad2roots,
    roots2coeffs,
    sample_quad,
)
from pioran_tpu.models.kernels import celerite_psd
from pioran_tpu.utils.roots import (
    check_conjugate_pair,
    check_order_imag_roots,
    check_roots_bounds,
)

RA32 = jnp.array([
    -0.042163209825323775 + 1.1115603157767922j,
    -0.042163209825323775 - 1.1115603157767922j,
    -0.7599101571312047 + 0.0j,
])
BETA32 = jnp.array([3.9413022090550216, 11.38193903188344, 1.0])


def test_quad2roots():
    qa = [0.025443151049354032, 0.04252858046335997, 2.5980088198563633]
    expected = np.array([
        -0.021264290231679986 + 0.1580853598860341j,
        -0.021264290231679986 - 0.1580853598860341j,
        -2.5980088198563633 + 0.0j,
    ])
    np.testing.assert_allclose(np.asarray(quad2roots(qa)), expected, rtol=1e-12)


def test_roots2coeffs():
    r = jnp.array([
        -0.012721575524677016 + 0.20583182936448363j,
        -0.012721575524677016 - 0.20583182936448363j,
        -2.5980088198563633 + 0.0j,
    ])
    expected = np.array([
        0.11048962713978024, 0.10863011129451944, 2.6234519709057174, 1.0,
    ])
    np.testing.assert_allclose(np.real(np.asarray(roots2coeffs(r))), expected, rtol=1e-12)
    np.testing.assert_allclose(np.imag(np.asarray(roots2coeffs(r))), 0.0, atol=1e-14)


def test_celerite_coefs_golden():
    """Golden CARMA(3,2) celerite coefficients (reference test_carma.jl:51-69)."""
    model = CARMA.create(3, 2, RA32, BETA32, 1.3)
    a, b, c, d = model.celerite_coefficients()
    np.testing.assert_allclose(np.asarray(a), [1.332733901854476, -0.03273390185447589], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(b), [-0.026820976815752837, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), [0.042163209825323775, 0.7599101571312047], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d), [-1.1115603157767922, 0.0], atol=1e-12)


def test_carma_acvf_matches_celerite_repr():
    """Celerite representation reproduces the analytic ACVF
    (reference test_carma.jl:96-113)."""
    t = np.linspace(0, 150, 1000)
    model = CARMA.create(3, 2, RA32, BETA32, 1.3)
    kern = model.celerite()
    np.testing.assert_allclose(
        np.asarray(kern(t)), np.asarray(carma_covariance(t, model)), rtol=1e-9, atol=1e-12
    )


def test_carma_psd_matches_celerite_psd():
    """CARMA PSD == sum of celerite term PSDs (reference test_carma.jl:115-141)."""
    f = 10.0 ** np.linspace(-3, 3, 1000)
    for is_ip in (False, True):
        model = CARMA.create(3, 2, RA32, BETA32, 1.0, is_integrated_power=is_ip)
        a, b, c, d = model.celerite_coefficients()
        psd_cel = sum(
            np.asarray(celerite_psd(f, float(a[i]), float(b[i]), float(c[i]), float(d[i])))
            for i in range(a.shape[0])
        )
        np.testing.assert_allclose(psd_cel, np.asarray(carma_psd(f, model)), rtol=1e-9)


def test_carma_loglike_matches_dense():
    """CARMA likelihood via celerite == dense oracle across sampled models
    (reference test_scalablegp.jl:56-83)."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.ops import direct

    t = jnp.array([0.0, 3.0, 3.2, 3.4, 45.5, 101.2])
    y = jnp.array([1.3, 2.2, 4.21, 2.5, 3.3, 5.2])
    yerr = jnp.array([0.1, 0.2, 0.1, 0.1, 0.2, 0.1])
    variances = [1.32, 35.3, 242.2, 46.6, 0.3]
    mus = [1.2, 0.3, 0.1, 0.46, 0.1]
    p, q = 5, 2
    for k, seed in enumerate([567, 123, 890, 456, 321]):
        qa, qb = sample_quad(p, q, jax.random.PRNGKey(seed), 1e-3, 1e1)
        ra = quad2roots(qa)
        beta = jnp.real(roots2coeffs(quad2roots(qb)))
        model = CARMA.create(p, q, ra, beta, variances[k])
        kern = model.celerite()
        fast = float(cel.log_likelihood(kern, t, y - mus[k], yerr**2))
        # oracle uses the analytic CARMA covariance, NOT the celerite repr
        dense = -float(direct.log_likelihood_direct(model, t, y - mus[k], yerr**2))
        assert np.isfinite(fast)
        np.testing.assert_allclose(fast, dense, rtol=1e-8)


def test_sample_quad_roots_valid():
    """sample_quad produces conjugate pairs in bounds, ordered
    (reference test_carma.jl:164-191)."""
    for p in range(1, 6):
        for q in range(1, p):
            for i in range(3):
                key = jax.random.PRNGKey(100 * p + 10 * q + i)
                qa, qb = sample_quad(p, q, key, 1e-3, 1e2)
                for roots in (quad2roots(qa), quad2roots(qb)):
                    r = np.asarray(roots)
                    assert check_conjugate_pair(r)
                    assert check_roots_bounds(r, 1e-3, 1e2)
                    assert check_order_imag_roots(r)
