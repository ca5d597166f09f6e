"""Kernel algebra tests (mirrors reference test/test_acvf.jl and
test/test_covariancefunctions.jl)."""

import jax.numpy as jnp
import numpy as np

from pioran_tpu import CeleriteKernel, Exp, SHO, celerite_term, exp_term, sho_term
import pytest


def test_exp_covariance():
    e = Exp(1.0, 2.4)
    t = np.linspace(0, 10, 500)
    np.testing.assert_allclose(e(t), np.exp(-2.4 * t) / 2, rtol=1e-14)


def test_celerite_covariance():
    a, b, c, d = 1.3, 4.0, 0.5, 3.2
    k = celerite_term(a, b, c, d)
    t = np.linspace(0, 25, 500)
    np.testing.assert_allclose(
        k(t), np.exp(-c * t) * (a * np.cos(d * t) + b * np.sin(d * t)), rtol=1e-13,
        atol=1e-15,
    )


def test_sho_covariance_overdamped():
    A, w0, Q = 1.5, 2 * np.pi * 0.23, 1 / np.sqrt(2)
    s = SHO(A, w0, Q)
    t = np.linspace(0, 15, 500)
    eta = np.sqrt(abs(1 - 1 / (4 * Q**2)))
    expected = A * np.exp(-w0 * t / 2 / Q) * (
        np.cos(eta * w0 * t) + np.sin(eta * w0 * t) / (2 * eta * Q)
    )
    np.testing.assert_allclose(s(t), expected, rtol=1e-12, atol=1e-14)


def test_sho_celerite_coefs():
    A, w0 = 1.5, 2 * np.pi * 0.23
    k = sho_term(A, w0)
    np.testing.assert_allclose(np.asarray(k.a), [A])
    np.testing.assert_allclose(np.asarray(k.b), [A])
    np.testing.assert_allclose(np.asarray(k.c), [np.sqrt(2) / 2 * w0])
    np.testing.assert_allclose(np.asarray(k.d), [np.sqrt(2) / 2 * w0])


def test_sho_q_restriction():
    with pytest.raises(NotImplementedError):
        sho_term(1.5, 1.0, Q=0.5)


def test_exp_celerite_coefs():
    k = exp_term(2.3, 0.2)
    np.testing.assert_allclose(np.asarray(k.a), [2.3 / 2])
    np.testing.assert_allclose(np.asarray(k.b), [0.0])
    np.testing.assert_allclose(np.asarray(k.c), [0.2])
    np.testing.assert_allclose(np.asarray(k.d), [0.0])


def test_sum_and_scale():
    t = np.linspace(0, 10, 500)
    e1, e2 = Exp(1.0, 0.34), Exp(2.4, 0.21)
    k = e1.celerite() + e2.celerite()
    np.testing.assert_allclose(k(t), e1(t) + e2(t), rtol=1e-13)
    ks = 12.5 * k
    np.testing.assert_allclose(ks(t), 12.5 * (e1(t) + e2(t)), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(ks.a), [12.5 / 2, 30.0 / 2])
    np.testing.assert_allclose(np.asarray(ks.c), [0.34, 0.21])


def test_large_sum_order():
    k = (
        exp_term(1.0, 0.34)
        + celerite_term(1.3, 4.2, 1.3, 5.2)
        + exp_term(2.4, 0.21)
        + celerite_term(3.3, 1.2, 3.3, 2.13)
    )
    np.testing.assert_allclose(np.asarray(k.a), [0.5, 1.3, 1.2, 3.3])
    np.testing.assert_allclose(np.asarray(k.b), [0.0, 4.2, 0.0, 1.2])
    np.testing.assert_allclose(np.asarray(k.c), [0.34, 1.3, 0.21, 3.3])
    np.testing.assert_allclose(np.asarray(k.d), [0.0, 5.2, 0.0, 2.13])


def test_stacked_kernel_eval():
    rng = np.random.default_rng(1234)
    J = 10
    a, b, c, d = 2 * rng.random(J), rng.random(J), rng.random(J), rng.random(J)
    k = CeleriteKernel(a=jnp.array(a), b=jnp.array(b), c=jnp.array(c), d=jnp.array(d))
    tau = np.linspace(-10, 10, 1000)
    expected = sum(
        np.exp(-c[j] * abs(tau)) * (a[j] * np.cos(d[j] * abs(tau)) + b[j] * np.sin(d[j] * abs(tau)))
        for j in range(J)
    )
    np.testing.assert_allclose(k(tau), expected, rtol=1e-12)
    k2 = 3.4 * k
    np.testing.assert_allclose(k2(tau), 3.4 * expected, rtol=1e-12)


def test_exp_psd():
    e = Exp(1.7, 0.9)
    f = np.logspace(-3, 3, 100)
    np.testing.assert_allclose(
        e.psd(f), 2 * 1.7 * 0.9 / (0.9**2 + 4 * np.pi**2 * f**2), rtol=1e-14
    )
