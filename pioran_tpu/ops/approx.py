"""PSD -> celerite-kernel approximation (the L1 layer), TPU-native.

Re-implements the reference's basis-function decomposition
(reference src/psd.jl) as one jittable, end-to-end differentiable
function of the PSD parameters:

  1. log grid  f_j = f0 (fM/f0)^(j/(J-1))                  (psd.jl:81-83)
  2. B[j,k] = 1 / (1 + (f_j/f_k)^p), p=4 (SHO) / 6 (DRWC)  (psd.jl:86-97)
  3. solve B A = P(f_j)/P(f_0)                              (psd.jl:109-112)
  4. normalise by the analytic band integral (or variance)  (psd.jl:375-395)
  5. emit celerite coefficients                             (psd.jl:247-283)

The JxJ solve vmaps trivially over chains; everything is static-shape.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.kernels import CeleriteKernel
from ..models.psd import PowerSpectralDensity, QPO, separate_psd

__all__ = [
    "spectral_grid",
    "spectral_matrix",
    "psd_decomposition",
    "approximated_psd",
    "get_approx_coefficients",
    "approx",
    "integral_sho",
    "integral_drwcelerite",
    "integral_celerite",
    "integrate_basis_function",
    "integrate_psd_feature",
]

_SQRT2 = 1.4142135623730951
_SQRT3 = 1.7320508075688772


def spectral_grid(J: int, f0, fM, dtype=None):
    """Log-spaced grid f_j = f0 (fM/f0)^(j/(J-1)) (reference src/psd.jl:81-83)."""
    f0 = jnp.asarray(f0, dtype=dtype)
    fM = jnp.asarray(fM, dtype=dtype)
    j = jnp.arange(J, dtype=f0.dtype)
    return f0 * (fM / f0) ** (j / (J - 1))


def spectral_matrix(points, basis_function: str = "SHO"):
    """B[j,k] = 1/(1 + (f_j/f_k)^p) with p=4 (SHO) or 6 (DRWCelerite).

    Reference src/psd.jl:86-97.
    """
    p = _basis_power(basis_function)
    ratio = points[:, None] / points[None, :]
    return 1.0 / (1.0 + ratio**p)


def _basis_power(basis_function: str) -> int:
    if basis_function == "SHO":
        return 4
    if basis_function == "DRWCelerite":
        return 6
    raise ValueError(
        f"Basis function {basis_function!r} not implemented; use 'SHO' or 'DRWCelerite'"
    )


def psd_decomposition(psd_normalised, matrix):
    """Amplitudes A solving B A = P_normalised (reference src/psd.jl:109-112)."""
    return jnp.linalg.solve(matrix, psd_normalised)


def get_approx_coefficients(
    psd_model: PowerSpectralDensity,
    f0,
    fM,
    n_components: int = 20,
    basis_function: str = "SHO",
):
    """Basis amplitudes of the approximation (reference src/psd.jl:129-135)."""
    points = spectral_grid(n_components, f0, fM)
    matrix = spectral_matrix(points, basis_function)
    p = psd_model(points)
    return psd_decomposition(p / p[0], matrix)


def approximated_psd(
    f,
    psd_model: PowerSpectralDensity,
    f0,
    fM,
    n_components: int = 20,
    norm=1.0,
    basis_function: str = "SHO",
    individual: bool = False,
):
    """Evaluate the basis-function approximation of ``psd_model`` at ``f``.

    Diagnostic mirror of reference src/psd.jl:152-185.
    """
    points = spectral_grid(n_components, f0, fM)
    amplitudes = get_approx_coefficients(
        psd_model, f0, fM, n_components=n_components, basis_function=basis_function
    )
    p = _basis_power(basis_function)
    f = jnp.asarray(f)
    comps = amplitudes * norm / (1.0 + (f[..., None] / points) ** p)
    if individual:
        return comps
    return jnp.sum(comps, axis=-1)


# --------------------------------------------------------------------------
# Analytic band integrals (reference src/psd.jl:291-395)
# --------------------------------------------------------------------------


def integral_sho(a, c, x):
    """Antiderivative of sum_j a_j / ((x/c_j)^4 + 1) (reference src/psd.jl:301-305)."""
    x = jnp.asarray(x)
    norm = c * a / (4.0 * _SQRT2)
    poly = (x**2 + _SQRT2 * c * x + c**2) / (x**2 - _SQRT2 * c * x + c**2)
    return jnp.sum(
        norm * (jnp.log(poly) + 2.0 * jnp.arctan2(c * _SQRT2 * x, c**2 - x**2)),
        axis=-1,
    )


def integral_drwcelerite(a, c, x):
    """Antiderivative of sum_j a_j / ((x/c_j)^6 + 1) (reference src/psd.jl:318-324)."""
    x = jnp.asarray(x)
    norm = a * c / 3.0
    drw = jnp.arctan(x / c)
    poly = (x**2 + _SQRT3 * c * x + c**2) / (x**2 - _SQRT3 * c * x + c**2)
    cel = 0.5 * jnp.arctan2(x**2 - c**2, c * x) + _SQRT3 / 4.0 * jnp.log(poly)
    return jnp.sum(norm * (drw + cel), axis=-1)


def integral_celerite(a, b, c, d, x):
    """Antiderivative of the celerite PSD (reference src/psd.jl:330-334)."""
    num = c**2 + (d + 2.0 * jnp.pi * x) ** 2
    den = c**2 + (d - 2.0 * jnp.pi * x) ** 2
    return (
        2.0 * a * (jnp.arctan2(c, d - 2.0 * jnp.pi * x) - jnp.arctan2(c, d + 2.0 * jnp.pi * x))
        + b * jnp.log(num / den)
    ) / (2.0 * jnp.pi)


def integrate_basis_function(a, c, x1, x2, basis_function: str = "SHO"):
    """Band integral of the basis sum between x1 and x2 (reference src/psd.jl:341-349)."""
    if basis_function == "SHO":
        return integral_sho(a, c, x2) - integral_sho(a, c, x1)
    if basis_function == "DRWCelerite":
        return integral_drwcelerite(a, c, x2) - integral_drwcelerite(a, c, x1)
    raise ValueError(f"Unknown basis function: {basis_function}")


def integrate_psd_feature(a, b, c, d, x1, x2):
    """Band integral of a celerite feature PSD (reference src/psd.jl:356-358)."""
    return integral_celerite(a, b, c, d, x2) - integral_celerite(a, b, c, d, x1)


def get_norm_psd(
    amplitudes, points, f_min, f_max, basis_function: str,
    is_integrated_power: bool = True, feat_coefs=None,
):
    """Normalisation of a basis-function sum (reference src/psd.jl:375-395):
    the band power on [f_min, f_max], or the total 0..inf variance."""
    if is_integrated_power:
        integ = integrate_basis_function(amplitudes, points, f_min, f_max, basis_function)
        if feat_coefs is not None:
            fa, fb, fc, fd = feat_coefs
            integ = integ + jnp.sum(integrate_psd_feature(fa, fb, fc, fd, f_min, f_max))
        return integ
    if basis_function == "SHO":
        return jnp.sum(amplitudes * points) * jnp.pi / _SQRT2
    return jnp.sum(amplitudes * points) * 2.0 * jnp.pi / 3.0


# --------------------------------------------------------------------------
# approx: PSD model -> CeleriteKernel (reference src/psd.jl:214-289)
# --------------------------------------------------------------------------


def approx(
    psd_model: PowerSpectralDensity,
    f_min,
    f_max,
    n_components: int = 20,
    norm=1.0,
    S_low=20.0,
    S_high=20.0,
    is_integrated_power: bool = True,
    basis_function: str = "SHO",
) -> CeleriteKernel:
    """Approximate a PSD with basis functions, returning a celerite kernel.

    The PSD is approximated on [f_min/S_low, f_max*S_high]; the returned
    kernel is normalised so the PSD band power on [f_min, f_max] equals
    ``norm`` (or, with ``is_integrated_power=False``, so the process
    variance equals ``norm``). Bit-for-bit the same math as reference
    src/psd.jl:214-289, restructured as a pure jittable function.
    """
    f0 = jnp.asarray(f_min) / S_low
    fM = jnp.asarray(f_max) * S_high
    points = spectral_grid(n_components, f0, fM)
    matrix = spectral_matrix(points, basis_function)

    continuum, features = separate_psd(psd_model)
    if continuum is None:
        raise ValueError(
            "The PSD model must contain at least one continuum component to approximate"
        )
    for feat in features:
        if not isinstance(feat, QPO):
            raise NotImplementedError(f"Feature {type(feat).__name__} not implemented")

    p_points = continuum(points)
    psd_norm = p_points[0]
    amplitudes = psd_decomposition(p_points / psd_norm, matrix)

    # Feature terms: exact celerite coefficients, amplitudes normalised the
    # same way as the continuum (reference src/psd.jl:229-234).
    feat_coefs: Optional[Tuple[jax.Array, ...]] = None
    if features:
        fa, fb, fc, fd = zip(*(q.celerite_coefficients() for q in features))
        fa = jnp.stack(fa) / psd_norm
        fb = jnp.stack(fb) / psd_norm
        fc = jnp.stack(fc)
        fd = jnp.stack(fd)
        feat_coefs = (fa, fb, fc, fd)

    # Total band power (or total variance) of the un-normalised approximation
    # (reference src/psd.jl:375-395).
    if is_integrated_power:
        integ = integrate_basis_function(amplitudes, points, f_min, f_max, basis_function)
        if feat_coefs is not None:
            fa, fb, fc, fd = feat_coefs
            integ = integ + jnp.sum(integrate_psd_feature(fa, fb, fc, fd, f_min, f_max))
    else:
        # Variance normalisation uses the continuum only, like the reference
        # (reference src/psd.jl:386-393 adds no feature contribution here).
        if basis_function == "SHO":
            integ = jnp.sum(amplitudes * points) * jnp.pi / _SQRT2
        else:
            integ = jnp.sum(amplitudes * points) * 2.0 * jnp.pi / 3.0

    amplitudes = amplitudes * (norm / integ)
    if feat_coefs is not None:
        fa, fb, fc, fd = feat_coefs
        feat_coefs = (fa * (norm / integ), fb * (norm / integ), fc, fd)

    # Celerite coefficients of the basis terms (reference src/psd.jl:247-283).
    if basis_function == "SHO":
        a = amplitudes * points * jnp.pi / _SQRT2
        c = _SQRT2 * jnp.pi * points
        ka, kb, kc, kd = a, a, c, c
    else:  # DRWCelerite = celerite part + DRW part
        a = amplitudes * points * jnp.pi / 3.0
        b = _SQRT3 * a
        c = jnp.pi * points
        d = _SQRT3 * c
        zeros = jnp.zeros_like(a)
        ka = jnp.concatenate([a, a])
        kb = jnp.concatenate([b, zeros])
        kc = jnp.concatenate([c, 2.0 * c])
        kd = jnp.concatenate([d, zeros])

    if feat_coefs is not None:
        fa, fb, fc, fd = feat_coefs
        ka = jnp.concatenate([ka, 2.0 * fa])
        kb = jnp.concatenate([kb, 2.0 * fb])
        kc = jnp.concatenate([kc, fc])
        kd = jnp.concatenate([kd, fd])

    return CeleriteKernel(a=ka, b=kb, c=kc, d=kd)
