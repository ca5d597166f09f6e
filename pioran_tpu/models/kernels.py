"""Semi-separable (celerite) covariance functions as JAX pytrees.

The reference's kernel object hierarchy (SemiSeparable <: SimpleKernel,
StructArray-backed sums, mutation: reference src/acvf.jl, src/SHO.jl,
src/Celerite.jl, src/Exp.jl) collapses here into one pytree —
:class:`CeleriteKernel` — that stores the stacked celerite coefficients
``(a, b, c, d)`` of shape ``(J,)``:

    k(tau) = sum_j exp(-c_j tau) (a_j cos(d_j tau) + b_j sin(d_j tau))

``+`` is coefficient concatenation; scalar ``*`` scales (a, b). All ops
are jittable/vmappable/differentiable and shape-static in J.

Term constructors (SHO / Exp / Celerite) reproduce the reference's
coefficient maps exactly (citations inline).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = [
    "CeleriteKernel",
    "celerite_term",
    "sho_term",
    "exp_term",
    "celerite_psd",
    "celerite_covariance",
    "SHO",
    "Exp",
]


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def celerite_covariance(tau, a, b, c, d):
    """k(tau) for one term; reference src/Celerite.jl:42-44."""
    tau = jnp.abs(jnp.asarray(tau))
    return jnp.exp(-c * tau) * (a * jnp.cos(d * tau) + b * jnp.sin(d * tau))


def celerite_psd(f, a, b, c, d):
    """One-sided absolute-frequency celerite PSD of one term.

    Reference src/Celerite.jl:46-51 including the x4 one-sided /
    absolute-frequency factor.
    """
    w = 2.0 * jnp.pi * jnp.asarray(f)
    num = (a * c + b * d) * (c**2 + d**2) + (a * c - b * d) * w**2
    den = w**4 + 2.0 * (c**2 - d**2) * w**2 + (c**2 + d**2) ** 2
    return num / den * 4.0


@_register
@dataclass(frozen=True)
class CeleriteKernel:
    """Sum of J celerite terms, stored as stacked coefficient vectors.

    Plays the role of the reference's ``SumOfCelerite`` /
    ``SumOfSemiSeparable`` (reference src/acvf.jl:16-49) but as a pure
    pytree of arrays.
    """

    a: jax.Array
    b: jax.Array
    c: jax.Array
    d: jax.Array

    @property
    def num_terms(self) -> int:
        return self.a.shape[-1]

    def __add__(self, other: "CeleriteKernel") -> "CeleriteKernel":
        # Sum of kernels = concatenation of terms (reference src/acvf.jl:60-111).
        return CeleriteKernel(
            a=jnp.concatenate([self.a, other.a], axis=-1),
            b=jnp.concatenate([self.b, other.b], axis=-1),
            c=jnp.concatenate([self.c, other.c], axis=-1),
            d=jnp.concatenate([self.d, other.d], axis=-1),
        )

    def __mul__(self, scale) -> "CeleriteKernel":
        # Scalar rescale touches only the amplitudes (reference src/acvf.jl:143-156).
        return CeleriteKernel(a=self.a * scale, b=self.b * scale, c=self.c, d=self.d)

    __rmul__ = __mul__

    def __call__(self, tau):
        """k(|tau|) summed over terms; broadcast over tau of any shape."""
        tau = jnp.abs(jnp.asarray(tau))[..., None]
        return jnp.sum(
            jnp.exp(-self.c * tau)
            * (self.a * jnp.cos(self.d * tau) + self.b * jnp.sin(self.d * tau)),
            axis=-1,
        )

    def psd(self, f):
        """One-sided PSD of the kernel, summed over terms."""
        f = jnp.asarray(f)[..., None]
        return jnp.sum(celerite_psd(f, self.a, self.b, self.c, self.d), axis=-1)

    def coefficients(self):
        return self.a, self.b, self.c, self.d


def celerite_term(a, b, c, d) -> CeleriteKernel:
    """A single celerite term as a 1-term kernel."""
    as_vec = lambda x: jnp.atleast_1d(jnp.asarray(x))
    return CeleriteKernel(a=as_vec(a), b=as_vec(b), c=as_vec(c), d=as_vec(d))


def exp_term(A, alpha) -> CeleriteKernel:
    """Exponential (damped random walk) kernel k(tau) = A/2 exp(-alpha tau).

    Coefficients (A/2, 0, alpha, 0); the /2 keeps the process variance
    equal to the 0..inf PSD integral (reference src/Exp.jl:29-33).
    """
    A = jnp.asarray(A)
    return celerite_term(A / 2.0, jnp.zeros_like(A), jnp.asarray(alpha), jnp.zeros_like(A))


def sho_term(A, w0, Q=None) -> CeleriteKernel:
    """SHO kernel at the critically-damped point Q = 1/sqrt(2).

    Coefficients (A, A, w0/sqrt(2), w0/sqrt(2)); like the reference, only
    Q = 1/sqrt(2) has a celerite representation
    (reference src/SHO.jl:31-41).
    """
    if Q is not None and not jnp.isclose(Q, 1.0 / jnp.sqrt(2.0)):
        raise NotImplementedError("SHO with Q != 1/sqrt(2) not implemented yet")
    A = jnp.asarray(A)
    c = jnp.asarray(w0) * jnp.sqrt(2.0) / 2.0
    return celerite_term(A, A, c, c)


@_register
@dataclass(frozen=True)
class SHO:
    """Full SHO covariance with the three Q-regimes (reference src/SHO.jl:44-56).

    k(tau) = A exp(-w0 tau / 2Q) * { 2(1 + w0 tau)                     Q = 1/2
                                   { cos(e w0 t) + sin(e w0 t)/(2 e Q)  Q > 1/2
                                   { cosh(e w0 t) + sinh(e w0 t)/(2eQ)  Q < 1/2
    with e = sqrt(|1 - 1/(4 Q^2)|). The Q comparison is static (Python
    float), matching the reference's dispatch-on-value behavior.
    """

    A: jax.Array
    w_0: jax.Array
    Q: jax.Array

    def __call__(self, tau):
        tau = jnp.abs(jnp.asarray(tau))
        A, w0, Q = self.A, self.w_0, self.Q
        term1 = A * jnp.exp(-w0 * tau / Q / 2.0)
        eta = jnp.sqrt(jnp.abs(1.0 - 1.0 / (4.0 * Q**2)))
        qval = float(Q)
        if qval == 0.5:
            return term1 * 2.0 * (1.0 + w0 * tau)
        if qval >= 0.5:
            return term1 * (
                jnp.cos(eta * w0 * tau) + jnp.sin(eta * w0 * tau) / (2.0 * eta * Q)
            )
        return term1 * (
            jnp.cosh(eta * w0 * tau) + jnp.sinh(eta * w0 * tau) / (2.0 * eta * Q)
        )

    def celerite(self) -> CeleriteKernel:
        return sho_term(self.A, self.w_0, float(self.Q))


@_register
@dataclass(frozen=True)
class Exp:
    """Exponential covariance k(tau) = A/2 exp(-alpha tau) (reference src/Exp.jl)."""

    A: jax.Array
    alpha: jax.Array

    def __call__(self, tau):
        return self.A / 2.0 * jnp.exp(-self.alpha * jnp.abs(jnp.asarray(tau)))

    def psd(self, f):
        """P(f) = 2 A alpha / (alpha^2 + 4 pi^2 f^2) (reference src/Exp.jl:41-43)."""
        return 2.0 * self.A * self.alpha / (self.alpha**2 + 4.0 * jnp.pi**2 * jnp.asarray(f) ** 2)

    def celerite(self) -> CeleriteKernel:
        return exp_term(self.A, self.alpha)
