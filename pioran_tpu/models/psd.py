"""Power-spectral-density models (TPU-native).

Parametric PSD shapes as JAX pytrees: every model is a frozen dataclass
whose fields are (traceable) arrays, callable on frequency arrays, and
usable inside ``jit``/``vmap``/``grad``. ``+`` combines models; use
:func:`separate_psd` to split a sum into its broadband *continuum* part
(approximated with basis functions) and narrow *features* (converted to
exact celerite terms).

Functional parity with the reference PSD layer (Tonari.jl re-exported by
Pioran.jl). Formulas pinned by the reference test-suite:
  - SingleBendingPowerLaw: reference test/test_psd.jl:6
  - DoubleBendingPowerLaw: reference test/test_psd.jl:12
  - PowerLaw:              reference test/test_psd.jl:71
  - QPO feature fields (S0, f0, Q) used in reference src/psd.jl:17-21;
    its PSD is the celerite PSD of its converted coefficients
    (reference src/psd.jl:15-27 with src/Celerite.jl:46-51).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "PowerSpectralDensity",
    "ContinuumPSD",
    "FeaturePSD",
    "PowerLaw",
    "SingleBendingPowerLaw",
    "DoubleBendingPowerLaw",
    "Lorentzian",
    "QPO",
    "SumPSD",
    "separate_psd",
]


def _register(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves)."""
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


class PowerSpectralDensity:
    """Base class: callable PSD model. Subclasses implement ``__call__``."""

    def __add__(self, other: "PowerSpectralDensity") -> "SumPSD":
        parts: Tuple[PowerSpectralDensity, ...] = ()
        parts += self.components if isinstance(self, SumPSD) else (self,)
        parts += other.components if isinstance(other, SumPSD) else (other,)
        return SumPSD(parts)

    def __call__(self, f):  # pragma: no cover - abstract
        raise NotImplementedError


class ContinuumPSD(PowerSpectralDensity):
    """Broadband continuum shape — approximated with SHO/DRWCelerite bases."""


class FeaturePSD(PowerSpectralDensity):
    """Narrow feature — converted to an exact celerite term (no basis fit)."""


@_register
@dataclass(frozen=True)
class PowerLaw(ContinuumPSD):
    """P(f) = f^-alpha  (reference test/test_psd.jl:71)."""

    alpha: jax.Array

    def __call__(self, f):
        f = jnp.asarray(f)
        return f ** (-self.alpha)


@_register
@dataclass(frozen=True)
class SingleBendingPowerLaw(ContinuumPSD):
    """P(f) = (f/f_1)^-a1 / (1 + (f/f_1)^(a2-a1))  (reference test/test_psd.jl:6)."""

    alpha_1: jax.Array
    f_1: jax.Array
    alpha_2: jax.Array

    def __call__(self, f):
        x = jnp.asarray(f) / self.f_1
        return x ** (-self.alpha_1) / (1.0 + x ** (self.alpha_2 - self.alpha_1))


@_register
@dataclass(frozen=True)
class DoubleBendingPowerLaw(ContinuumPSD):
    """Two-bend power law (reference test/test_psd.jl:12).

    P(f) = (f/f_1)^-a1 / (1+(f/f_1)^(a2-a1)) / (1+(f/f_2)^(a3-a2))
    """

    alpha_1: jax.Array
    f_1: jax.Array
    alpha_2: jax.Array
    f_2: jax.Array
    alpha_3: jax.Array

    def __call__(self, f):
        f = jnp.asarray(f)
        x1 = f / self.f_1
        x2 = f / self.f_2
        return (
            x1 ** (-self.alpha_1)
            / (1.0 + x1 ** (self.alpha_2 - self.alpha_1))
            / (1.0 + x2 ** (self.alpha_3 - self.alpha_2))
        )


@_register
@dataclass(frozen=True)
class QPO(FeaturePSD):
    """Lorentzian-like quasi-periodic oscillation feature QPO(S0, f0, Q).

    Its PSD is defined as the (one-sided, absolute-frequency) celerite PSD
    of its exact celerite representation, so the model and the GP that
    carries it agree identically:

        P(f) = S0 * w0^4 / ((w^2 - w0^2)^2 + (w0 w / Q)^2),  w = 2 pi f

    which follows from the coefficient map of reference src/psd.jl:15-27
    combined with the celerite PSD of reference src/Celerite.jl:46-51.
    """

    S_0: jax.Array
    f_0: jax.Array
    Q: jax.Array

    def __call__(self, f):
        w = 2.0 * jnp.pi * jnp.asarray(f)
        w0 = 2.0 * jnp.pi * self.f_0
        return (
            self.S_0 * w0**4 / ((w**2 - w0**2) ** 2 + (w0 * w / self.Q) ** 2)
        )

    def celerite_coefficients(self):
        """Exact celerite (a, b, c, d) for this feature.

        Same closed form as reference src/psd.jl:15-27 (``convert_feature``):
        Delta = sqrt(4 Q^2 - 1), w0 = 2 pi f0, a = S0 w0 Q / 4,
        b = a / Delta, c = w0 / (2 Q), d = c * Delta.
        """
        delta = jnp.sqrt(4.0 * self.Q**2 - 1.0)
        w0 = 2.0 * jnp.pi * self.f_0
        a = self.S_0 * w0 * self.Q / 4.0
        b = a / delta
        c = w0 / self.Q / 2.0
        d = c * delta
        return a, b, c, d


@_register
@dataclass(frozen=True)
class Lorentzian(FeaturePSD):
    """Lorentzian feature Lorentzian(A, f0, gamma).

    P(f) = A * (gamma/2)^2 / ((f - f0)^2 + (gamma/2)^2)

    Exported for parity with the reference's re-export list
    (reference src/Pioran.jl:20); like the reference, only QPO features
    participate in the celerite conversion (reference src/psd.jl:24-26).
    """

    A: jax.Array
    f_0: jax.Array
    gamma: jax.Array

    def __call__(self, f):
        hg = self.gamma / 2.0
        return self.A * hg**2 / ((jnp.asarray(f) - self.f_0) ** 2 + hg**2)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SumPSD(PowerSpectralDensity):
    """Sum of PSD components (continuum + features)."""

    components: Tuple[PowerSpectralDensity, ...]

    def __call__(self, f):
        total = self.components[0](f)
        for comp in self.components[1:]:
            total = total + comp(f)
        return total

    def tree_flatten(self):
        return (self.components,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(components=children[0])


def separate_psd(
    psd: PowerSpectralDensity,
) -> Tuple[Union[PowerSpectralDensity, None], Tuple[FeaturePSD, ...]]:
    """Split a PSD model into (continuum, features).

    Mirrors Tonari's ``separate_psd`` used at reference src/psd.jl:221.
    The continuum is a single ContinuumPSD or a SumPSD of them (or None);
    features are returned as a tuple (possibly empty).
    """
    parts = psd.components if isinstance(psd, SumPSD) else (psd,)
    continuum = tuple(p for p in parts if isinstance(p, ContinuumPSD))
    features = tuple(p for p in parts if isinstance(p, FeaturePSD))
    if len(continuum) == 0:
        cont: Union[PowerSpectralDensity, None] = None
    elif len(continuum) == 1:
        cont = continuum[0]
    else:
        cont = SumPSD(continuum)
    return cont, features
