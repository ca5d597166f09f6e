"""Dense O(N^3) GP solver — the correctness oracle.

Mirrors reference src/direct_solver.jl. Not used on the hot path: it
exists so the O(N) celerite path can be validated against an exact
Cholesky computation (the reference's load-bearing test pattern,
reference test/test_likelihood.jl:53-60).

Note the sign convention: like the reference (direct_solver.jl:19),
:func:`log_likelihood_direct` returns the NEGATIVE log-likelihood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "covariance_matrix",
    "log_likelihood_direct",
    "predict_direct",
    "predict_cov_direct",
]


def covariance_matrix(kernel, x1, x2):
    """Dense K[i, j] = k(|x1_i - x2_j|)."""
    return kernel(jnp.abs(x1[:, None] - x2[None, :]))


def log_likelihood_direct(kernel, t, y, sigma2):
    """Negative log-likelihood via dense Cholesky (reference direct_solver.jl:6-21)."""
    N = t.shape[0]
    K = covariance_matrix(kernel, t, t) + jnp.diag(sigma2)
    L = jnp.linalg.cholesky(K)
    z = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    logdet_L = jnp.sum(jnp.log(jnp.diag(L)))
    return logdet_L + 0.5 * jnp.dot(z, z) + 0.5 * N * jnp.log(2.0 * jnp.pi)


def predict_direct(kernel, tau, t, y, sigma2, with_covariance: bool = False):
    """Posterior mean (and optionally covariance) via dense Cholesky.

    Reference direct_solver.jl:75-119.
    """
    K0 = covariance_matrix(kernel, t, t) + jnp.diag(sigma2)
    Kt0 = covariance_matrix(kernel, tau, t)
    L = jnp.linalg.cholesky(K0)
    w = jax.scipy.linalg.solve_triangular(L, Kt0.T, lower=True)
    alpha = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    mean = w.T @ alpha
    if with_covariance:
        Ktau = covariance_matrix(kernel, tau, tau)
        return mean, Ktau - w.T @ w
    return mean


def predict_cov_direct(kernel, tau, t, sigma2):
    """Posterior covariance at tau via dense Cholesky (reference direct_solver.jl:28-68)."""
    K0 = covariance_matrix(kernel, t, t) + jnp.diag(sigma2)
    Kt0 = covariance_matrix(kernel, tau, t)
    Ktau = covariance_matrix(kernel, tau, tau)
    L = jnp.linalg.cholesky(K0)
    w = jax.scipy.linalg.solve_triangular(L, Kt0.T, lower=True)
    return Ktau - w.T @ w
