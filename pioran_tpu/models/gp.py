"""Scalable Gaussian-process API (the L4 layer).

Functional replacement for the reference's AbstractGPs wrappers
(reference src/scalable_GP.jl): a :class:`GaussianProcess` is a pytree
of {mean, celerite kernel}; conditioning on inputs produces a
:class:`ConditionedGP`; ``posterior`` produces a :class:`PosteriorGP`.
All methods are pure functions usable under jit/vmap/grad.

Means: a scalar/0-d array (constant mean) or any jittable callable
``t -> mean`` (the reference's ``CustomMean``, used e.g. in
reference test/test_mean.jl:21-28).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Union

import jax
import jax.numpy as jnp

from ..ops import celerite as _cel
from ..ops import direct as _direct
from .kernels import CeleriteKernel

__all__ = [
    "CustomMean",
    "GaussianProcess",
    "ScalableGP",
    "ConditionedGP",
    "PosteriorGP",
    "posterior",
]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CustomMean:
    """Wrap an arbitrary jittable mean function m(t) (reference CustomMean,
    re-exported at src/Pioran.jl and used in test/test_mean.jl:21)."""

    fn: Callable[[jax.Array], jax.Array]

    def __call__(self, t):
        return self.fn(t)

    def tree_flatten(self):
        return (), self.fn

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(fn=aux)


def _mean_vector(mean, t):
    if callable(mean):
        return jnp.broadcast_to(mean(t), t.shape)
    return jnp.broadcast_to(jnp.asarray(mean), t.shape)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclass(frozen=True)
class GaussianProcess:
    """GP with a semiseparable (celerite) kernel and scalar/callable mean.

    Mirrors ``ScalableGP`` (reference src/scalable_GP.jl:24-40).
    """

    kernel: CeleriteKernel
    mean: Any = 0.0

    def __call__(self, t, sigma2=None) -> "ConditionedGP":
        """Condition on input locations and per-point noise variances,
        like the reference's ``f(t, sigma^2)`` FiniteGP (scalable_GP.jl:42)."""
        t = jnp.asarray(t)
        if sigma2 is None:
            sigma2 = jnp.zeros_like(t)
        else:
            sigma2 = jnp.broadcast_to(jnp.asarray(sigma2), t.shape)
        return ConditionedGP(gp=self, t=t, sigma2=sigma2)


def ScalableGP(mean_or_kernel, kernel: Union[CeleriteKernel, None] = None) -> GaussianProcess:
    """Constructor-name parity helper: ScalableGP(kernel) / ScalableGP(mean, kernel)."""
    if kernel is None:
        return GaussianProcess(kernel=mean_or_kernel, mean=0.0)
    return GaussianProcess(kernel=kernel, mean=mean_or_kernel)


@_register
@dataclass(frozen=True)
class ConditionedGP:
    """GP fixed at inputs ``t`` with noise ``sigma2`` (a FiniteGP)."""

    gp: GaussianProcess
    t: jax.Array
    sigma2: jax.Array

    def logpdf(self, y):
        """log p(y) via the O(N) celerite solver (reference scalable_GP.jl:162-166)."""
        resid = jnp.asarray(y) - _mean_vector(self.gp.mean, self.t)
        return _cel.log_likelihood(self.gp.kernel, self.t, resid, self.sigma2)

    def logpdf_direct(self, y):
        """Dense-oracle log p(y) (for tests; note reference's direct solver
        returns the negative log-likelihood — this returns the positive)."""
        resid = jnp.asarray(y) - _mean_vector(self.gp.mean, self.t)
        return -_direct.log_likelihood_direct(
            self.gp.kernel, self.t, resid, self.sigma2
        )

    def sample(self, key, t=None):
        """Draw a prior realisation in O(N R) (reference scalable_GP.jl:134-155).

        With ``t`` given, draws at those points with zero noise (like the
        reference's rand(f, t)); otherwise at the conditioning points with
        the conditioning noise.
        """
        if t is None:
            t, s2 = self.t, self.sigma2
        else:
            t = jnp.asarray(t)
            s2 = jnp.zeros_like(t)
        draw = _cel.simulate(key, self.gp.kernel, t, s2)
        return draw + _mean_vector(self.gp.mean, t)


def posterior(fx: ConditionedGP, y) -> "PosteriorGP":
    """Lazy posterior object (reference scalable_GP.jl:44-54)."""
    return PosteriorGP(fx=fx, y=jnp.asarray(y))


@_register
@dataclass(frozen=True)
class PosteriorGP:
    """Posterior GP given (fx, y); mean is O(N+M), covariance dense O(N^3)
    (only for plot-sized target grids, as in the reference:
    docs/src/simulations.md:76-91)."""

    fx: ConditionedGP
    y: jax.Array

    def _resid(self):
        return self.y - _mean_vector(self.fx.gp.mean, self.fx.t)

    def mean(self, tau=None, method: str = "matmul"):
        tau = self.fx.t if tau is None else jnp.asarray(tau)
        fn = _cel.predict_matmul if method == "matmul" else _cel.predict
        mu = fn(self.fx.gp.kernel, tau, self.fx.t, self._resid(), self.fx.sigma2)
        return mu + _mean_vector(self.fx.gp.mean, tau)

    def cov(self, tau=None):
        tau = self.fx.t if tau is None else jnp.asarray(tau)
        return _direct.predict_cov_direct(
            self.fx.gp.kernel, tau, self.fx.t, self.fx.sigma2
        )

    def std(self, tau=None):
        return jnp.sqrt(jnp.diag(self.cov(tau)))

    def sample(self, key, tau=None, num_samples: int = 1):
        """Dense multivariate-normal posterior draws (reference scalable_GP.jl:106-131)."""
        tau = self.fx.t if tau is None else jnp.asarray(tau)
        mu = self.mean(tau)
        cov = self.cov(tau)
        jitter = 1e-12 * jnp.trace(cov) / tau.shape[0]
        L = jnp.linalg.cholesky(cov + jitter * jnp.eye(tau.shape[0], dtype=cov.dtype))
        eps = jax.random.normal(key, (num_samples, tau.shape[0]), dtype=cov.dtype)
        return mu + eps @ L.T
