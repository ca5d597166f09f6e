"""Prior distributions with the three interfaces every sampler needs.

Each distribution provides
  - ``logpdf(x)``          (NUTS / SMC reweighting)
  - ``sample(key)``        (SMC initialisation, prior checks)
  - ``quantile(u)``        (nested-sampling style unit-cube transforms,
                            reference examples/ultranest/single_pl.jl:96-104)
  - ``to_unconstrained(x)`` / ``from_unconstrained(z)`` /
    ``unconstrained_logpdf(z)``  (bijector view for gradient samplers,
    the role of Bijectors.jl in reference src/priors.jl:148-169)

Includes the reference's dependent priors encoding ordered parameters
(TwoUniformDependent / ThreeUniformDependent / TwoLogUniformDependent,
reference src/priors.jl:29-140) and a :class:`PriorSet` that flattens a
named collection into vectorized transforms.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = [
    "Uniform",
    "LogUniform",
    "Normal",
    "LogNormal",
    "Gamma",
    "TwoUniformDependent",
    "ThreeUniformDependent",
    "TwoLogUniformDependent",
    "PriorSet",
]


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def _softplus(z):
    return jnp.logaddexp(z, 0.0)


def _sigmoid(z):
    return jax.nn.sigmoid(z)


def _logit(p):
    return jnp.log(p) - jnp.log1p(-p)


class Distribution:
    dim: int = 1

    def logpdf(self, x):  # pragma: no cover - abstract
        raise NotImplementedError

    def sample(self, key):  # pragma: no cover - abstract
        raise NotImplementedError

    def quantile(self, u):  # pragma: no cover - abstract
        raise NotImplementedError

    # --- bijector view (default: identity for R-supported) ---
    def to_unconstrained(self, x):
        return x

    def from_unconstrained(self, z):
        return z

    def unconstrained_logpdf(self, z):
        """log density of the pushforward in unconstrained space."""
        return self.logpdf(self.from_unconstrained(z))


@_register
@dataclass(frozen=True)
class Uniform(Distribution):
    low: jax.Array
    high: jax.Array

    def logpdf(self, x):
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def sample(self, key):
        return jax.random.uniform(key, (), dtype=jnp.result_type(float),
                                  minval=self.low, maxval=self.high)

    def quantile(self, u):
        return self.low + (self.high - self.low) * u

    def to_unconstrained(self, x):
        return _logit((x - self.low) / (self.high - self.low))

    def from_unconstrained(self, z):
        return self.low + (self.high - self.low) * _sigmoid(z)

    def unconstrained_logpdf(self, z):
        # logpdf(x) + log|dx/dz| with the log(high-low) terms cancelling
        # analytically -> numerically stable in the far tails
        return jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z)


@_register
@dataclass(frozen=True)
class LogUniform(Distribution):
    """Reciprocal distribution on [low, high] (log-uniform)."""

    low: jax.Array
    high: jax.Array

    def _lognorm(self):
        return jnp.log(jnp.log(self.high) - jnp.log(self.low))

    def logpdf(self, x):
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(x) - self._lognorm(), -jnp.inf)

    def sample(self, key):
        u = jax.random.uniform(key, (), dtype=jnp.result_type(float))
        return self.quantile(u)

    def quantile(self, u):
        return jnp.exp(jnp.log(self.low) + u * (jnp.log(self.high) - jnp.log(self.low)))

    def to_unconstrained(self, x):
        return _logit((jnp.log(x) - jnp.log(self.low))
                      / (jnp.log(self.high) - jnp.log(self.low)))

    def from_unconstrained(self, z):
        return self.quantile(_sigmoid(z))

    def unconstrained_logpdf(self, z):
        # -log x - log width + (log x + log width + log sig pair) cancels
        return jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z)


@_register
@dataclass(frozen=True)
class Normal(Distribution):
    loc: jax.Array
    scale: jax.Array

    def logpdf(self, x):
        zz = (x - self.loc) / self.scale
        return -0.5 * zz**2 - jnp.log(self.scale) - 0.5 * jnp.log(2 * jnp.pi)

    def sample(self, key):
        return self.loc + self.scale * jax.random.normal(key, (), dtype=jnp.result_type(float))

    def quantile(self, u):
        return self.loc + self.scale * jsp.ndtri(u)


@_register
@dataclass(frozen=True)
class LogNormal(Distribution):
    mu: jax.Array
    sigma: jax.Array

    def logpdf(self, x):
        lx = jnp.log(x)
        zz = (lx - self.mu) / self.sigma
        valid = x > 0
        lp = -0.5 * zz**2 - lx - jnp.log(self.sigma) - 0.5 * jnp.log(2 * jnp.pi)
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key):
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, (), dtype=jnp.result_type(float)))

    def quantile(self, u):
        return jnp.exp(self.mu + self.sigma * jsp.ndtri(u))

    def to_unconstrained(self, x):
        return jnp.log(x)

    def from_unconstrained(self, z):
        return jnp.exp(z)

    def unconstrained_logpdf(self, z):
        return self.logpdf(jnp.exp(z)) + z


def _gammaincinv(a, p, num_bisect: int = 80):
    """Inverse regularized lower incomplete gamma via bisection (jittable).

    Solves gammainc(a, x) = p on a bracket that always contains the root.
    80 halvings give ~1e-16 relative localisation — plenty for prior
    transforms.
    """
    # bracket: [0, hi] with hi large enough (mean + 40 std + safety for p->1)
    hi0 = a + 40.0 * jnp.sqrt(a) + 40.0
    # expand hi until gammainc(hi) > p (handles extreme p)
    def expand(state):
        hi, _ = state
        return hi * 2.0, jsp.gammainc(a, hi * 2.0)

    def cond(state):
        hi, val = state
        return val < p

    hi, _ = jax.lax.while_loop(cond, expand, (hi0, jsp.gammainc(a, hi0)))
    lo = jnp.zeros_like(hi)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        below = jsp.gammainc(a, mid) < p
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_bisect, body, (lo, hi))
    return 0.5 * (lo + hi)


@_register
@dataclass(frozen=True)
class Gamma(Distribution):
    """Gamma(shape k, scale theta) — the reference's nu prior Gamma(2, 0.5)
    (reference examples/ultranest/single_pl.jl:101)."""

    shape: jax.Array
    scale: jax.Array

    def logpdf(self, x):
        k, th = self.shape, self.scale
        valid = x > 0
        lp = (k - 1.0) * jnp.log(x) - x / th - jsp.gammaln(k) - k * jnp.log(th)
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key):
        return jax.random.gamma(key, self.shape, dtype=jnp.result_type(float)) * self.scale

    def quantile(self, u):
        return _gammaincinv(self.shape, u) * self.scale

    def to_unconstrained(self, x):
        return jnp.log(x)

    def from_unconstrained(self, z):
        return jnp.exp(z)

    def unconstrained_logpdf(self, z):
        return self.logpdf(jnp.exp(z)) + z


# ---------------------------------------------------------------------------
# Dependent (ordered) priors — reference src/priors.jl
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class TwoUniformDependent(Distribution):
    """x1 ~ U[a, b]; x2 ~ U[x1, c]  (reference priors.jl:29-45)."""

    a: jax.Array
    b: jax.Array
    c: jax.Array

    dim = 2

    def logpdf(self, x):
        x1, x2 = x[..., 0], x[..., 1]
        lp1 = Uniform(self.a, self.b).logpdf(x1)
        lp2 = jnp.where(
            (x2 >= x1) & (x2 <= self.c), -jnp.log(self.c - x1), -jnp.inf
        )
        return lp1 + lp2

    def sample(self, key):
        k1, k2 = jax.random.split(key)
        x1 = Uniform(self.a, self.b).sample(k1)
        u = jax.random.uniform(k2, (), dtype=jnp.result_type(float))
        return jnp.stack([x1, x1 + (self.c - x1) * u])

    def quantile(self, u):
        x1 = self.a + (self.b - self.a) * u[..., 0]
        x2 = x1 + (self.c - x1) * u[..., 1]
        return jnp.stack([x1, x2], axis=-1)

    def to_unconstrained(self, x):
        x1, x2 = x[..., 0], x[..., 1]
        z1 = _logit((x1 - self.a) / (self.b - self.a))
        z2 = _logit((x2 - x1) / (self.c - x1))
        return jnp.stack([z1, z2], axis=-1)

    def from_unconstrained(self, z):
        x1 = self.a + (self.b - self.a) * _sigmoid(z[..., 0])
        x2 = x1 + (self.c - x1) * _sigmoid(z[..., 1])
        return jnp.stack([x1, x2], axis=-1)

    def unconstrained_logpdf(self, z):
        # each -log(width) in logpdf cancels the +log(width) jacobian term
        return jnp.sum(jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z), axis=-1)


@_register
@dataclass(frozen=True)
class ThreeUniformDependent(Distribution):
    """x1 ~ U[a,b]; x2 ~ U[x1, c]; x3 ~ U[x2, c] (reference priors.jl:63-78)."""

    a: jax.Array
    b: jax.Array
    c: jax.Array

    dim = 3

    def logpdf(self, x):
        x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
        lp1 = Uniform(self.a, self.b).logpdf(x1)
        lp2 = jnp.where((x2 >= x1) & (x2 <= self.c), -jnp.log(self.c - x1), -jnp.inf)
        lp3 = jnp.where((x3 >= x2) & (x3 <= self.c), -jnp.log(self.c - x2), -jnp.inf)
        return lp1 + lp2 + lp3

    def sample(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        ftype = jnp.result_type(float)
        x1 = Uniform(self.a, self.b).sample(k1)
        x2 = x1 + (self.c - x1) * jax.random.uniform(k2, (), dtype=ftype)
        x3 = x2 + (self.c - x2) * jax.random.uniform(k3, (), dtype=ftype)
        return jnp.stack([x1, x2, x3])

    def quantile(self, u):
        x1 = self.a + (self.b - self.a) * u[..., 0]
        x2 = x1 + (self.c - x1) * u[..., 1]
        x3 = x2 + (self.c - x2) * u[..., 2]
        return jnp.stack([x1, x2, x3], axis=-1)

    def to_unconstrained(self, x):
        x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2]
        z1 = _logit((x1 - self.a) / (self.b - self.a))
        z2 = _logit((x2 - x1) / (self.c - x1))
        z3 = _logit((x3 - x2) / (self.c - x2))
        return jnp.stack([z1, z2, z3], axis=-1)

    def from_unconstrained(self, z):
        x1 = self.a + (self.b - self.a) * _sigmoid(z[..., 0])
        x2 = x1 + (self.c - x1) * _sigmoid(z[..., 1])
        x3 = x2 + (self.c - x2) * _sigmoid(z[..., 2])
        return jnp.stack([x1, x2, x3], axis=-1)

    def unconstrained_logpdf(self, z):
        # widths cancel analytically (see TwoUniformDependent)
        return jnp.sum(jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z), axis=-1)


@_register
@dataclass(frozen=True)
class TwoLogUniformDependent(Distribution):
    """x1 ~ logU[a,b]; x2 ~ logU[x1, b] (reference priors.jl:94-109)."""

    a: jax.Array
    b: jax.Array

    dim = 2

    def logpdf(self, x):
        x1, x2 = x[..., 0], x[..., 1]
        lp1 = LogUniform(self.a, self.b).logpdf(x1)
        inside = (x2 >= x1) & (x2 <= self.b)
        lp2 = jnp.where(
            inside, -jnp.log(x2) - jnp.log(jnp.log(self.b) - jnp.log(x1)), -jnp.inf
        )
        return lp1 + lp2

    def sample(self, key):
        k1, k2 = jax.random.split(key)
        ftype = jnp.result_type(float)
        x1 = LogUniform(self.a, self.b).sample(k1)
        u = jax.random.uniform(k2, (), dtype=ftype)
        x2 = jnp.exp(jnp.log(x1) + u * (jnp.log(self.b) - jnp.log(x1)))
        return jnp.stack([x1, x2])

    def quantile(self, u):
        la, lb = jnp.log(self.a), jnp.log(self.b)
        lx1 = la + u[..., 0] * (lb - la)
        lx2 = lx1 + u[..., 1] * (lb - lx1)
        return jnp.exp(jnp.stack([lx1, lx2], axis=-1))

    def to_unconstrained(self, x):
        la, lb = jnp.log(self.a), jnp.log(self.b)
        lx1, lx2 = jnp.log(x[..., 0]), jnp.log(x[..., 1])
        z1 = _logit((lx1 - la) / (lb - la))
        z2 = _logit((lx2 - lx1) / (lb - lx1))
        return jnp.stack([z1, z2], axis=-1)

    def from_unconstrained(self, z):
        la, lb = jnp.log(self.a), jnp.log(self.b)
        lx1 = la + (lb - la) * _sigmoid(z[..., 0])
        lx2 = lx1 + (lb - lx1) * _sigmoid(z[..., 1])
        return jnp.exp(jnp.stack([lx1, lx2], axis=-1))

    def unconstrained_logpdf(self, z):
        # log x and log(log-width) terms cancel analytically
        return jnp.sum(jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z), axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PriorSet:
    """An ordered, named collection of priors flattened to one vector.

    Provides the three sampler interfaces over the concatenated parameter
    vector: ``logpdf(theta)``, ``sample(key)``, ``transform(u)``
    (unit-cube -> theta, the ultranest ``prior_transform``), and the
    unconstrained bijection for NUTS.
    """

    names: Tuple[str, ...]
    dists: Tuple[Distribution, ...]

    def __init__(self, items: Sequence[Tuple[str, Distribution]]):
        object.__setattr__(self, "names", tuple(n for n, _ in items))
        object.__setattr__(self, "dists", tuple(d for _, d in items))

    def tree_flatten(self):
        return (self.dists,), self.names

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        object.__setattr__(obj, "names", aux)
        object.__setattr__(obj, "dists", tuple(children[0]))
        return obj

    @property
    def dim(self) -> int:
        return sum(getattr(d, "dim", 1) for d in self.dists)

    def _split(self, x):
        out, i = [], 0
        for d in self.dists:
            k = getattr(d, "dim", 1)
            out.append(x[..., i] if k == 1 else x[..., i : i + k])
            i += k
        return out

    def logpdf(self, theta):
        parts = self._split(theta)
        return sum(d.logpdf(p) for d, p in zip(self.dists, parts))

    def sample(self, key):
        keys = jax.random.split(key, len(self.dists))
        vals = [d.sample(k) for d, k in zip(self.dists, keys)]
        return jnp.concatenate([jnp.atleast_1d(v) for v in vals], axis=-1)

    def transform(self, u):
        """Unit-cube -> parameter vector (nested-sampling prior transform)."""
        parts = self._split(u)
        vals = [d.quantile(p) for d, p in zip(self.dists, parts)]
        return jnp.concatenate([jnp.atleast_1d(v) if v.ndim == 0 else v for v in vals], axis=-1)

    def to_unconstrained(self, theta):
        parts = self._split(theta)
        vals = [d.to_unconstrained(p) for d, p in zip(self.dists, parts)]
        return jnp.concatenate([jnp.atleast_1d(v) if v.ndim == 0 else v for v in vals], axis=-1)

    def from_unconstrained(self, z):
        parts = self._split(z)
        vals = [d.from_unconstrained(p) for d, p in zip(self.dists, parts)]
        return jnp.concatenate([jnp.atleast_1d(v) if v.ndim == 0 else v for v in vals], axis=-1)

    def unconstrained_logpdf(self, z):
        parts = self._split(z)
        return sum(d.unconstrained_logpdf(p) for d, p in zip(self.dists, parts))
