"""High-level inference drivers: model spec -> posterior + evidence + artifacts.

Plays the role of the reference's example scripts (the de-facto CLI,
reference examples/ultranest/single_pl.jl and
examples/turing_distributed/single_pl.jl), but as one jitted program:
the model, approximation, GP and sampler all live on device; results are
written in an ultranest-like layout (``chains/equal_weighted_post.txt``,
``info/results.json``) so downstream tooling carries over.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.psd import SingleBendingPowerLaw, DoubleBendingPowerLaw
from .models.gp import ScalableGP
from .ops import celerite as cel
from .ops.approx import approx
from .priors import (
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

__all__ = ["GPModelSpec", "single_bending_model", "double_bending_model",
           "periodic_rednoise_model", "carma_model", "run_inference",
           "run_inference_many"]


@dataclass
class GPModelSpec:
    """Everything needed to run inference on one light curve.

    ``loglike(theta)`` is the GP log-likelihood of the (transformed) data;
    ``prior`` is a PriorSet over theta; ``names`` label theta's entries;
    ``reorder`` maps theta -> the reference's reporting order.
    """

    prior: PriorSet
    loglike: Callable
    names: List[str]
    gp_model: Callable  # (t, y, yerr, theta) -> ConditionedGP, for PPC
    psd_model: Callable  # class, for PPC
    paramnames_split: Dict
    t: np.ndarray
    y: np.ndarray
    yerr: np.ndarray
    f_min: float
    f_max: float
    loglike_batch: Optional[Callable] = None  # (B, dim) -> (B,), Pallas-backed

    def logpost_unconstrained(self, z):
        return self.prior.unconstrained_logpdf(z) + self.loglike(
            self.prior.from_unconstrained(z)
        )


def _batched_loglike_from_coeffs(coeff_fn, t, seq_mesh=None,
                                 seq_axis="seq", dt=None):
    """(B, dim) -> (B,) likelihood: vmapped parameter->coefficient map
    (small JxJ solves on the MXU) feeding the fused Pallas celerite
    kernel (ops/pallas_celerite.py) on TPU, the scan oracle elsewhere.

    With ``seq_mesh``, the TIME axis is sharded instead: the batch runs
    through the pipelined blockwise scan (parallel/seq_scan.py
    logl_seq_pipelined) — chain micro-batches stagger around the device
    ring so devices stay busy while N scales to n_dev x one chip."""
    if seq_mesh is not None:
        from .parallel.seq_scan import logl_seq_pipelined

        n_dev = int(seq_mesh.shape[seq_axis])

        def loglike_batch_seq(TH):
            # the pipeline needs B divisible by n_micro (= the mesh axis
            # size); callers like the final per-sample likelihood sweep
            # arrive with data-dependent B, so pad with copies of row 0
            # and slice the result (padding rows cost one extra
            # micro-batch round at worst)
            B = TH.shape[0]
            pad = (-B) % n_dev
            if pad:
                TH = jnp.concatenate([TH, jnp.tile(TH[:1], (pad, 1))])
            a, b, c, d, yv, s2 = jax.vmap(coeff_fn)(TH)
            ll = logl_seq_pipelined(a, b, c, d, t, yv, s2, seq_mesh,
                                    axis_name=seq_axis, dt=dt)
            return ll[:B] if pad else ll

        return loglike_batch_seq

    from .ops.pallas_celerite import batched_loglike

    def loglike_batch(TH):
        a, b, c, d, yv, s2 = jax.vmap(coeff_fn)(TH)
        return batched_loglike(a, b, c, d, t, yv, s2, dt)

    return loglike_batch


def _freq_range(t):
    f_min = 1.0 / (t[-1] - t[0])
    f_max = 1.0 / float(np.min(np.diff(np.asarray(t)))) / 2.0
    return float(f_min), float(f_max)


def single_bending_model(
    t, y, yerr, xbar, va,
    n_components: int = 20,
    basis_function: str = "SHO",
    S_low: float = 20.0,
    S_high: float = 20.0,
    use_c: bool = False,
    alpha1_max: float = 1.5,
    is_integrated_power: bool = True,
    seq_mesh=None,
    seq_axis: str = "seq",
) -> GPModelSpec:
    """The reference's single-bending-PL model with its exact priors
    (reference examples/ultranest/single_pl.jl:65-104):

    theta = (alpha_1, alpha_2, f_1, variance, nu, mu[, c]);
    alpha_1 ~ U(0, alpha1_max); alpha_2 ~ U(alpha_1, 4);
    f_1 ~ logU(f0*4, fM/4); variance ~ LogNormal(-3, sqrt(2));
    nu ~ Gamma(2, 0.5); mu ~ N(xbar, 5 sqrt(va)); data log-transformed
    with sigma^2 = nu yerr^2 / y^2.

    With ``use_c`` (the docs workflow, reference
    docs/src/single_pl.jl:63-100: alpha1_max = 1.25 there) a flux
    offset c ~ logU(1e-6, 0.99 min y) joins theta and the transform
    becomes ``log(y - c)`` with ``sigma^2 = nu yerr^2/(y - c)^2``.
    ``is_integrated_power=False`` makes ``variance`` the total process
    variance instead of the band-integrated power (the stored docs run
    used that mode: its ML logl reproduces to 1e-12 with it, and is 71
    off without).

    ``seq_mesh`` (optional): a Mesh whose ``seq_axis`` shards the TIME
    dimension — for series too long for one chip. The scalar likelihood
    runs the blockwise ppermute scan and the sampler's batched sweeps
    run the pipelined variant (chain micro-batches staggered around the
    device ring). Requires N divisible by the axis size and batch
    widths (``num_particles``, ``n_delete``) divisible by it too.
    """
    # consecutive spacings computed in host f64 BEFORE the f32 cast:
    # diff of an f32 grid loses ~log2(N) bits for long dense series
    # (ops/celerite.py build_uv; dominated the f32 error at N >= 2^14)
    dt64 = jnp.asarray(np.diff(np.asarray(t, np.float64)))
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    yerr = jnp.asarray(yerr)
    f_min, f_max = _freq_range(np.asarray(t))
    min_f_b, max_f_b = f_min / 20.0 * 4.0, f_max * 20.0 / 4.0

    items = [
        ("alphas", TwoUniformDependent(0.0, alpha1_max, 4.0)),
        ("f_1", LogUniform(min_f_b, max_f_b)),
        ("variance", LogNormal(2 * -1.5, np.sqrt(2.0) * 1.0)),
        ("nu", Gamma(2.0, 0.5)),
        ("mu", Normal(xbar, 5.0 * np.sqrt(va))),
    ]
    names = ["α₁", "α₂", "f₁", "variance", "ν", "μ"]
    if use_c:
        items.append(("c", LogUniform(1e-6, float(np.min(np.asarray(y))) * 0.99)))
        names.append("c")
    prior = PriorSet(items)
    yn = jnp.log(y)

    def _transform(th):
        if use_c:
            c_off = th[6]
            return jnp.log(y - c_off), th[4] * yerr**2 / (y - c_off) ** 2
        return yn, th[4] * yerr**2 / y**2

    def coeff_fn(th):
        a1, a2, f1, var = th[0], th[1], th[2], th[3]
        mu = th[5]
        kern = approx(
            SingleBendingPowerLaw(a1, f1, a2), f_min, f_max,
            n_components, var, S_low, S_high, basis_function=basis_function,
            is_integrated_power=is_integrated_power,
        )
        a, b, c, d = kern.coefficients()
        yv, s2 = _transform(th)
        return a, b, c, d, yv - mu, s2

    def loglike(th):
        a, b, c, d, yv, s2 = coeff_fn(th)
        return cel.logl(a, b, c, d, t, yv, s2,
                        mesh=seq_mesh, seq_axis=seq_axis, seq_min_n=0,
                        dt=dt64)

    def gp_model(tt, yy, ee, th):
        a1, a2, f1, var = th[0], th[1], th[2], th[3]
        nu, mu = th[4], th[5]
        kern = approx(
            SingleBendingPowerLaw(a1, f1, a2), f_min, f_max,
            n_components, var, S_low, S_high, basis_function=basis_function,
            is_integrated_power=is_integrated_power,
        )
        yy = jnp.asarray(yy)
        ee = jnp.asarray(ee)
        if use_c:
            s2 = nu * ee**2 / (yy - th[6]) ** 2
        else:
            s2 = nu * ee**2 / yy**2
        return ScalableGP(mu, kern)(jnp.asarray(tt), s2)

    return GPModelSpec(
        prior=prior, loglike=loglike,
        names=names,
        gp_model=gp_model, psd_model=SingleBendingPowerLaw,
        paramnames_split={"psd": ["α₁", "f₁", "α₂"], "norm": "variance",
                          "scale_err": "ν", "mean": "μ",
                          **({"log_transform": "c"} if use_c else {})},
        t=np.asarray(t), y=np.asarray(y), yerr=np.asarray(yerr),
        f_min=f_min, f_max=f_max,
        loglike_batch=_batched_loglike_from_coeffs(
            coeff_fn, t, seq_mesh=seq_mesh, seq_axis=seq_axis, dt=dt64),
    )


def double_bending_model(
    t, y, yerr, xbar, va,
    n_components: int = 20,
    basis_function: str = "SHO",
    seq_mesh=None,
    seq_axis: str = "seq",
) -> GPModelSpec:
    """Double-bending-PL model (reference examples/ultranest/double_pl.jl):
    theta = (a1, a2, a3, f1, f2, variance, nu, mu) with ordered alphas
    (a1 ~ U(0, 1.5), a2 ~ U(a1, 4), a3 ~ U(a2, 4), double_pl.jl:96-100)
    and ordered bend frequencies.

    ``seq_mesh`` / ``seq_axis``: shard the TIME dimension over a mesh for
    long series (see :func:`single_bending_model`)."""
    dt64 = jnp.asarray(np.diff(np.asarray(t, np.float64)))
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    yerr = jnp.asarray(yerr)
    f_min, f_max = _freq_range(np.asarray(t))
    min_f_b, max_f_b = f_min / 20.0 * 4.0, f_max * 20.0 / 4.0

    prior = PriorSet([
        ("alphas", ThreeUniformDependent(0.0, 1.5, 4.0)),
        ("f_bends", TwoLogUniformDependent(min_f_b, max_f_b)),
        ("variance", LogNormal(2 * -1.5, np.sqrt(2.0) * 1.0)),
        ("nu", Gamma(2.0, 0.5)),
        ("mu", Normal(xbar, 5.0 * np.sqrt(va))),
    ])
    yn = jnp.log(y)

    def coeff_fn(th):
        a1, a2, a3, f1, f2, var, nu, mu = (th[i] for i in range(8))
        kern = approx(
            DoubleBendingPowerLaw(a1, f1, a2, f2, a3), f_min, f_max,
            n_components, var, basis_function=basis_function,
        )
        a, b, c, d = kern.coefficients()
        return a, b, c, d, yn - mu, nu * yerr**2 / y**2

    def loglike(th):
        a, b, c, d, yv, s2 = coeff_fn(th)
        return cel.logl(a, b, c, d, t, yv, s2,
                        mesh=seq_mesh, seq_axis=seq_axis, seq_min_n=0,
                        dt=dt64)

    def gp_model(tt, yy, ee, th):
        a1, a2, a3, f1, f2, var, nu, mu = (th[i] for i in range(8))
        kern = approx(
            DoubleBendingPowerLaw(a1, f1, a2, f2, a3), f_min, f_max,
            n_components, var, basis_function=basis_function,
        )
        s2 = nu * jnp.asarray(ee) ** 2 / jnp.asarray(yy) ** 2
        return ScalableGP(mu, kern)(jnp.asarray(tt), s2)

    return GPModelSpec(
        prior=prior, loglike=loglike,
        names=["α₁", "α₂", "α₃", "f₁", "f₂", "variance", "ν", "μ"],
        gp_model=gp_model, psd_model=DoubleBendingPowerLaw,
        paramnames_split={"psd": ["α₁", "f₁", "α₂", "f₂", "α₃"],
                          "norm": "variance", "scale_err": "ν", "mean": "μ"},
        t=np.asarray(t), y=np.asarray(y), yerr=np.asarray(yerr),
        f_min=f_min, f_max=f_max,
        loglike_batch=_batched_loglike_from_coeffs(
            coeff_fn, t, seq_mesh=seq_mesh, seq_axis=seq_axis, dt=dt64),
    )


def periodic_rednoise_model(
    t, y, yerr, xbar, va,
    n_components: int = 20,
    basis_function: str = "SHO",
    seq_mesh=None,
    seq_axis: str = "seq",
) -> GPModelSpec:
    """Periodic signal in red noise: single-bending-PL GP with a
    sinusoidal CustomMean (reference
    examples/ultranest/single_pl_periodicity.jl:103-148):

    theta = (alpha_1, alpha_2, f_1, variance, nu, mu, A, phi, T0);
    mean(t) = A sin(2 pi t / T0 + phi) + mu; NO log-transform:
    sigma^2 = nu yerr^2. Priors: A ~ LogNormal(0,1), phi ~ U(0, 2 pi),
    T0 ~ U(0, T_span); the rest as in the single-bending model.
    """
    from .models.gp import CustomMean

    dt64 = jnp.asarray(np.diff(np.asarray(t, np.float64)))
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    yerr = jnp.asarray(yerr)
    f_min, f_max = _freq_range(np.asarray(t))
    min_f_b, max_f_b = f_min / 20.0 * 4.0, f_max * 20.0 / 4.0
    T_span = float(t[-1] - t[0])

    prior = PriorSet([
        ("alphas", TwoUniformDependent(0.0, 1.5, 4.0)),
        ("f_1", LogUniform(min_f_b, max_f_b)),
        ("variance", LogNormal(2 * -1.5, np.sqrt(2.0) * 1.0)),
        ("nu", Gamma(2.0, 0.5)),
        ("mu", Normal(xbar, 5.0 * np.sqrt(va))),
        ("A", LogNormal(0.0, 1.0)),
        ("phi", Uniform(0.0, 2.0 * np.pi)),
        ("T0", Uniform(0.0, T_span)),
    ])

    def mean_fn(x, A, phi, T0, mu):
        return A * jnp.sin(2.0 * jnp.pi * x / T0 + phi) + mu

    def coeff_fn(th):
        a1, a2, f1, var, nu, mu, A, phi, T0 = (th[i] for i in range(9))
        kern = approx(
            SingleBendingPowerLaw(a1, f1, a2), f_min, f_max,
            n_components, var, basis_function=basis_function,
        )
        a, b, c, d = kern.coefficients()
        m = mean_fn(t, A, phi, T0, mu)
        return a, b, c, d, y - m, nu * yerr**2

    def loglike(th):
        a, b, c, d, yv, s2 = coeff_fn(th)
        return cel.logl(a, b, c, d, t, yv, s2,
                        mesh=seq_mesh, seq_axis=seq_axis, seq_min_n=0,
                        dt=dt64)

    def gp_model(tt, yy, ee, th):
        a1, a2, f1, var, nu, mu, A, phi, T0 = (th[i] for i in range(9))
        kern = approx(
            SingleBendingPowerLaw(a1, f1, a2), f_min, f_max,
            n_components, var, basis_function=basis_function,
        )
        mean = CustomMean(lambda x: mean_fn(x, A, phi, T0, mu))
        return ScalableGP(mean, kern)(jnp.asarray(tt), nu * jnp.asarray(ee) ** 2)

    return GPModelSpec(
        prior=prior, loglike=loglike,
        names=["α₁", "α₂", "f₁", "variance", "ν", "μ", "A", "ϕ", "T₀"],
        gp_model=gp_model, psd_model=SingleBendingPowerLaw,
        paramnames_split={"psd": ["α₁", "f₁", "α₂"], "norm": "variance",
                          "scale_err": "ν", "mean": ["A", "ϕ", "T₀", "μ"]},
        t=np.asarray(t), y=np.asarray(y), yerr=np.asarray(yerr),
        f_min=f_min, f_max=f_max,
        loglike_batch=_batched_loglike_from_coeffs(
            coeff_fn, t, seq_mesh=seq_mesh, seq_axis=seq_axis, dt=dt64),
    )


def carma_model(
    t, y, yerr, xbar, va,
    p: int = 2,
    q: int = 0,
    use_c: bool = False,
    mu_n: float = -3.0,
    sigma_n: float = float(np.sqrt(2.0)),
    seq_mesh=None,
    seq_axis: str = "seq",
) -> GPModelSpec:
    """CARMA(p, q) inference model (reference docs/src/carma.md:63-200).

    The reference parameterizes the AR/MA polynomials by quadratic
    factors x^2 + b x + c with the dependent prior
    ``c ~ U(0, f_max^2) + b^2/4`` and ``b ~ logU(2 f_min, 2 f_max)``
    (odd-order trailing factor ``~ logU(f_min, f_max)``), then REJECTS
    parameter sets whose roots leave the band
    ``-f_max < Re r < -f_min``, ``|Im r| < f_max``. Re-parameterized for
    TPU: theta carries ``u = c - b^2/4 ~ U(0, f_max^2)`` directly, so
    every draw is a complex-conjugate pair with
    ``Re r = -b/2 in (-f_max, -f_min)`` and ``|Im r| = sqrt(u) < f_max``
    — the constraint set has prior measure 1 and the posterior is smooth
    (no -Inf cliffs inside jit). The root-ordering rejection is
    commented out in the reference and omitted here too.

    theta = [ (u_k, b_k) x p//2, (r_p if p odd),
              (u_k, b_k) x q//2, (r_q if q odd),
              variance, nu, mu, (c if use_c) ].
    With ``use_c`` the data transform is ``log(y - c)`` with
    ``sigma^2 = nu yerr^2/(y-c)^2`` (reference docs/src/carma.md:118-125);
    otherwise the standard log-transform of the single-bending model.

    ``seq_mesh`` / ``seq_axis``: shard the TIME dimension over a mesh for
    long series (see :func:`single_bending_model`).
    """
    from .models.carma import carma_celerite_coefs_real, poly_from_conjugate_pairs

    dt64 = jnp.asarray(np.diff(np.asarray(t, np.float64)))
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    yerr = jnp.asarray(yerr)
    f_min, f_max = _freq_range(np.asarray(t))

    items: List[Tuple[str, object]] = []
    names: List[str] = []
    for tag, order in (("a", p), ("b", q)):
        for k in range(order // 2):
            items.append((f"q{tag}_u{k}", Uniform(0.0, f_max**2)))
            items.append((f"q{tag}_b{k}", LogUniform(2 * f_min, 2 * f_max)))
            names += [f"q{tag}_u{k}", f"q{tag}_b{k}"]
        if order % 2 == 1:
            items.append((f"q{tag}_r", LogUniform(f_min, f_max)))
            names.append(f"q{tag}_r")
    items += [
        ("variance", LogNormal(mu_n, sigma_n)),
        ("nu", Gamma(2.0, 0.5)),
        ("mu", Normal(xbar, 5.0 * np.sqrt(va))),
    ]
    names += ["variance", "ν", "μ"]
    if use_c:
        items.append(("c", LogUniform(1e-6, float(np.min(np.asarray(y))) * 0.99)))
        names.append("c")
    prior = PriorSet(items)

    n_ar = 2 * (p // 2) + (p % 2)
    n_ma = 2 * (q // 2) + (q % 2)

    def _roots(th, off, order):
        """Conjugate-pair root lists (re, im) from (u, b) params; trailing
        real root. Real arithmetic throughout: TPU backends have no
        complex dtype (models/carma.py real path)."""
        re_l, im_l = [], []
        i = off
        for _ in range(order // 2):
            u, bq = th[i], th[i + 1]
            x, yv = -0.5 * bq, jnp.sqrt(u)
            re_l += [x, x]
            im_l += [yv, -yv]
            i += 2
        if order % 2 == 1:
            re_l.append(-th[i])
            im_l.append(jnp.zeros_like(th[i]))
            i += 1
        return re_l, im_l, i

    def _parts(th):
        ar_re, ar_im, i = _roots(th, 0, p)
        ma_re, ma_im, i = _roots(th, i, q)
        var, nu, mu = th[i], th[i + 1], th[i + 2]
        c = th[i + 3] if use_c else None
        if q > 0:
            pairs_re = [ma_re[2 * k] for k in range(q // 2)]
            pairs_im = [ma_im[2 * k] for k in range(q // 2)]
            reals = [ma_re[q - 1]] if q % 2 == 1 else []
            beta = poly_from_conjugate_pairs(pairs_re, pairs_im, reals)
        else:
            beta = jnp.ones((1,), jnp.result_type(float))
        return ar_re, ar_im, beta, var, nu, mu, c

    def coeff_fn(th):
        ar_re, ar_im, beta, var, nu, mu, c = _parts(th)
        a, b, cc, d = carma_celerite_coefs_real(p, ar_re, ar_im, beta, norm=var)
        if use_c:
            yn = jnp.log(y - c)
            s2 = nu * yerr**2 / (y - c) ** 2
        else:
            yn = jnp.log(y)
            s2 = nu * yerr**2 / y**2
        return a, b, cc, d, yn - mu, s2

    def loglike(th):
        a, b, cc, d, yv, s2 = coeff_fn(th)
        return cel.logl(a, b, cc, d, t, yv, s2,
                        mesh=seq_mesh, seq_axis=seq_axis, seq_min_n=0,
                        dt=dt64)

    def gp_model(tt, yy, ee, th):
        from .models.kernels import CeleriteKernel

        ar_re, ar_im, beta, var, nu, mu, c = _parts(th)
        a, b, cc, d = carma_celerite_coefs_real(p, ar_re, ar_im, beta, norm=var)
        kern = CeleriteKernel(a=a, b=b, c=cc, d=d)
        yy = jnp.asarray(yy)
        ee = jnp.asarray(ee)
        if use_c:
            s2 = nu * ee**2 / (yy - c) ** 2
        else:
            s2 = nu * ee**2 / yy**2
        return ScalableGP(mu, kern)(jnp.asarray(tt), s2)

    spec = GPModelSpec(
        prior=prior, loglike=loglike, names=names,
        gp_model=gp_model, psd_model=None,
        paramnames_split={"psd": names[: n_ar + n_ma], "norm": "variance",
                          "scale_err": "ν", "mean": "μ",
                          **({"log_transform": "c"} if use_c else {})},
        t=np.asarray(t), y=np.asarray(y), yerr=np.asarray(yerr),
        f_min=f_min, f_max=f_max,
        loglike_batch=_batched_loglike_from_coeffs(
            coeff_fn, t, seq_mesh=seq_mesh, seq_axis=seq_axis, dt=dt64),
    )
    spec.carma_pq = (p, q)
    return spec


# final per-sample likelihood sweeps process at most this many samples
# per loglike_batch call (million-draw MCMC posteriors OOM otherwise)
_FINAL_LOGLIKE_CHUNK = 65536


def advi_seeded_inits(
    spec: GPModelSpec,
    key,
    num_chains: int,
    num_steps: int = 1500,
    overdispersion: float = 2.0,
    num_mc: int = 8,
):
    """Principled dispersed inits for gradient samplers (VERDICT r4 #1).

    Raw prior draws leave a fraction of HMC chains stranded on the
    flagship model's f1 degeneracy (flat likelihood tails where
    gradients vanish: rhat ~ 1.6 after 500 warmup steps). The
    reference's Turing workflow dodges this by starting NUTS near the
    posterior it has already stored; the principled TPU-native analog
    is a cheap mean-field ADVI fit (samplers/advi.py, ~seconds — one
    fused program) whose fitted Gaussian, WIDENED by ``overdispersion``
    in unconstrained space, seeds the chains. Overdispersed-from-an-
    approximation is exactly the classical Gelman-Rubin prescription —
    rhat keeps its power (chains must contract through warmup), but no
    chain starts in a zero-gradient wasteland.
    """
    from .samplers.advi import run_advi

    k1, k2, k3 = jax.random.split(key, 3)
    # initialize the ADVI *optimizer* at the best of a few hundred prior
    # draws (one cheap batched sweep): a single raw draw could itself
    # land on the zero-gradient plateau this function exists to escape,
    # stranding the whole ELBO optimization there
    zc = jax.vmap(spec.prior.to_unconstrained)(
        jax.vmap(spec.prior.sample)(jax.random.split(k1, 256)))
    lp = jax.vmap(spec.logpost_unconstrained)(zc)
    z_init = zc[jnp.argmax(jnp.where(jnp.isfinite(lp), lp, -jnp.inf))]
    res = jax.jit(
        lambda z, k: run_advi(
            spec.logpost_unconstrained, z, k,
            num_steps=num_steps, num_mc=num_mc, num_draws=1,
        )
    )(z_init, k2)
    eps = jax.random.normal(k3, (num_chains, spec.prior.dim), z_init.dtype)
    return res.mu[None, :] + overdispersion * jnp.exp(res.log_sigma)[None, :] * eps


def _mesh_axis_names(mesh, mesh_axis):
    """Default sharding axis: all mesh axes (tuple collapses to a name)."""
    if mesh_axis is not None:
        return mesh_axis
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def _mesh_axis_size(mesh, axis) -> int:
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def run_inference(
    spec: GPModelSpec,
    sampler: str = "smc",
    key=None,
    num_particles: int = 2048,
    num_chains: int = 16,
    num_warmup: int = 500,
    num_samples: int = 1000,
    num_moves: int = 8,
    log_dir: Optional[str] = None,
    smc_move: str = "mala",
    resume: bool = False,
    num_ns_mcmc: int = 8,
    ns_move: str = "slice",
    frac_remain: float = 1e-2,
    mesh=None,
    mesh_axis=None,
    init: str = "prior",
    mass: str = "diag",
    hmc_stepped: bool = False,
    hmc_max_leapfrogs: int = 128,
) -> Dict:
    """Run NS / SMC / NUTS / ChEES / ADVI on a model spec, write artifacts.

    ``init``: chain initialization for the gradient samplers
    (nuts/chees): "prior" draws raw prior inits; "advi" seeds chains
    from an overdispersed mean-field ADVI fit
    (:func:`advi_seeded_inits`) — use on posteriors whose prior mass
    sits mostly in zero-gradient plateaus. ``mass``: "diag" or "dense"
    ChEES metric (full cross-chain covariance; samplers/chees.py).
    ``hmc_stepped``: run ChEES/NUTS a short block of jitted transitions
    per HOST iteration (samplers/chees.py run_chees_stepped,
    samplers/nuts.py run_nuts_stepped) — same chain, but no single
    XLA program outlives an RPC layer that kills multi-minute device
    executions (the tunneled-TPU environments the resumable NS/SMC
    drivers already serve).

    ``sampler="ns"`` is the direct ultranest analog (vectorized nested
    sampling, samplers/ns.py): ``num_particles`` live points, evidence
    logZ with an ultranest-style logzerr, and an equal-weighted
    posterior. Returns a results dict with posterior samples (theta
    space), summary moments, and (NS/SMC) the logZ evidence — the analog
    of ultranest's ``results`` (reference
    examples/ultranest/single_pl.jl:117).

    ``mesh`` (optional): a `jax.sharding.Mesh` to scale the sampler over
    devices — the user-surface analog of the reference's driver-level
    parallelism (``mpirun -n 4`` feeding ultranest likelihood workers,
    reference examples/ultranest/single_pl.jl:19-21; ``julia -p 6`` +
    pmap over Turing chains, examples/turing_distributed/single_pl.jl:1).
    NS/SMC shard the particle axis (likelihood sweeps local per device,
    evidence/resampling via collectives, parallel/sharded.py); ChEES and
    NUTS shard the chain axis (ChEES via GSPMD layout + all-reduced
    adaptation statistics, NUTS via shard_map with cross-device pmean
    mass pooling). ``mesh_axis`` selects which mesh axes carry the
    batch (default: all of them, e.g. ("hosts", "chains") on the 2-D
    mesh from ``parallel.make_mesh_2d``). ``num_particles`` /
    ``num_chains`` must be divisible by the selected axes' total size.
    ADVI (a single optimization path) ignores the mesh.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    prior = spec.prior
    t0 = time.time()
    axis = _mesh_axis_names(mesh, mesh_axis) if mesh is not None else None
    n_shard = _mesh_axis_size(mesh, axis) if mesh is not None else 1
    if mesh is not None and sampler in ("ns", "smc") and num_particles % n_shard:
        raise ValueError(
            f"num_particles={num_particles} not divisible by the mesh "
            f"axis size {n_shard}")
    if mesh is not None and sampler in ("nuts", "chees") and num_chains % n_shard:
        raise ValueError(
            f"num_chains={num_chains} not divisible by the mesh "
            f"axis size {n_shard}")

    if sampler == "smc":
        from .samplers.smc import run_smc

        k1, k2 = jax.random.split(key)
        z0 = jax.vmap(prior.to_unconstrained)(
            jax.vmap(prior.sample)(jax.random.split(k1, num_particles))
        )
        loglike_z = lambda z: spec.loglike(prior.from_unconstrained(z))
        loglike_z_batch = None
        if spec.loglike_batch is not None:
            loglike_z_batch = lambda Z: spec.loglike_batch(
                jax.vmap(prior.from_unconstrained)(Z)
            )
        if mesh is not None:
            from .parallel.sharded import run_smc_sharded

            if resume:
                raise NotImplementedError(
                    "resume is not supported for the mesh-sharded SMC; "
                    "drop mesh= or resume=")
            res = run_smc_sharded(
                loglike_z, prior.unconstrained_logpdf, z0, k2,
                mesh, axis_name=axis, num_moves=num_moves,
            )
        elif resume and log_dir:
            from .samplers.smc import run_smc_resumable

            res = run_smc_resumable(
                loglike_z, prior.unconstrained_logpdf, z0, k2,
                checkpoint_dir=os.path.join(log_dir, "checkpoints"),
                num_moves=num_moves, move=smc_move,
                loglike_batch_fn=loglike_z_batch,
            )
        else:
            res = run_smc(
                loglike_z, prior.unconstrained_logpdf, z0, k2,
                num_particles=num_particles, num_moves=num_moves,
                move=smc_move, loglike_batch_fn=loglike_z_batch,
            )
        theta = np.asarray(jax.vmap(prior.from_unconstrained)(res.particles))
        extra = {
            "logz": float(res.logZ),
            "num_temper_steps": int(res.num_steps),
            "ncall": int(res.num_steps) * num_moves * num_particles,
        }
    elif sampler == "ns":
        from .samplers.ns import run_ns, equal_weight_indices

        dim = prior.dim
        if spec.loglike_batch is not None:
            def loglike_u_batch(U):
                return spec.loglike_batch(jax.vmap(prior.transform)(U))
        else:
            def loglike_u_batch(U):
                return jax.vmap(lambda u: spec.loglike(prior.transform(u)))(U)
        k1, k2 = jax.random.split(key)
        n_delete = max(num_particles // 8, 1)
        if mesh is not None:
            from .parallel.sharded import sharded_batched_fn

            # likelihood sweeps fan out over the mesh: each device
            # evaluates its slice of the live/walker batch (the TPU
            # analog of ultranest's MPI likelihood farm)
            n_delete = -(-n_delete // n_shard) * n_shard
            loglike_u_batch = sharded_batched_fn(
                loglike_u_batch, mesh, axis)
        ns_kwargs = dict(
            num_live=num_particles, dim=dim, n_delete=n_delete,
            num_mcmc=num_ns_mcmc, move=ns_move,
            max_iters=max(8 * num_particles // n_delete, 400),
            frac_remain=frac_remain,
        )
        if resume and log_dir:
            from .samplers.ns import run_ns_resumable

            res = run_ns_resumable(
                loglike_u_batch, k1,
                checkpoint_dir=os.path.join(log_dir, "checkpoints"),
                **ns_kwargs,
            )
        else:
            res = run_ns(loglike_u_batch, k1, **ns_kwargs)
        n_eq = max(num_samples * 4, 4000)
        idx = equal_weight_indices(
            k2, res.dead_logl, res.dead_logw, res.num_dead, n_eq
        )
        theta = np.asarray(
            jax.vmap(prior.transform)(res.dead_u[idx])
        )
        # Kish effective sample size of the posterior weights
        logp = np.asarray(res.dead_logl + res.dead_logw)
        valid = np.arange(logp.shape[0]) < int(res.num_dead)
        logp = np.where(valid & np.isfinite(logp), logp, -np.inf)
        logp -= jax.scipy.special.logsumexp(jnp.asarray(logp))
        w = np.exp(logp)
        from .utils.insertion import insertion_order_test

        mww = insertion_order_test(
            np.asarray(res.insert_ranks), n_slots=num_particles - n_delete
        )
        extra = {
            "logz": float(res.logZ),
            "logzerr": float(res.logZ_err),
            "H": float(res.H),
            "ess": float(1.0 / np.sum(w * w)),
            "ncall": int(res.ncall),
            # the run stopped on frac_remain, not the max_iters backstop
            "iteration_budget_ok": bool(res.num_iters < 8 * num_particles // n_delete),
            # real insertion-order rank uniformity test (the ultranest
            # results.json field of the same name)
            "insertion_order_MWW_test": {
                "independent_iterations": mww["independent_iterations"],
                "converged": bool(mww["converged"]),
                "zscore": mww["zscore"],
                "pvalue": mww["pvalue"],
            },
        }
    elif sampler in ("nuts", "chees"):
        from .utils.mcmc_stats import summarize_chains

        if sampler == "nuts":
            from .samplers.nuts import run_nuts

            keys = jax.random.split(key, num_chains + 1)
            if init == "advi":
                z0 = advi_seeded_inits(spec, keys[0], num_chains)
            else:
                z0 = jax.vmap(prior.to_unconstrained)(
                    jax.vmap(prior.sample)(
                        jax.random.split(keys[0], num_chains))
                )
            if mesh is not None and hmc_stepped:
                raise NotImplementedError(
                    "hmc_stepped is not supported together with mesh= "
                    "(the sharded NUTS path runs one fused program); "
                    "drop one of the two")
            if mesh is not None:
                from .parallel.sharded import run_nuts_sharded

                samples_z, stats = run_nuts_sharded(
                    spec.logpost_unconstrained, z0, keys[1:], mesh,
                    axis_name=axis,
                    num_warmup=num_warmup, num_samples=num_samples,
                )
            elif hmc_stepped:
                from .samplers.nuts import run_nuts_stepped

                # one short jitted program per `block` transitions (the
                # tunneled-TPU shape; see run_chees_stepped above)
                samples_s, stats = run_nuts_stepped(
                    spec.logpost_unconstrained, z0, keys[1:],
                    num_warmup=num_warmup, num_samples=num_samples,
                )
                # (S, C, dim) -> (C, S, dim) to match the vmapped layout
                samples_z = jnp.asarray(samples_s).transpose(1, 0, 2)
            else:
                samples_z, stats = jax.vmap(
                    lambda z, k: run_nuts(
                        spec.logpost_unconstrained, z, k,
                        num_warmup=num_warmup, num_samples=num_samples,
                    )
                )(z0, keys[1:])
            # (C, S, dim): per-chain draws for rhat/ess
            chains_z = np.asarray(samples_z)
            samples_z = samples_z.reshape(-1, samples_z.shape[-1])
            if hmc_stepped:
                # exact per-chain leapfrog (= gradient-eval) count
                ncall = int(np.asarray(
                    stats["num_leaves"], np.int64).sum())
            else:
                # a depth-d NUTS tree costs 2^d - 1 new leapfrogs, each
                # one gradient evaluation (warmup + sampling both count)
                ncall = int(
                    (2 ** np.asarray(stats["depth"], np.int64) - 1).sum()
                    + (2 ** np.asarray(
                        stats["warmup_depth"], np.int64) - 1).sum()
                )
        else:
            from .samplers.chees import run_chees

            k1, k2 = jax.random.split(key)
            if init == "advi":
                z0 = advi_seeded_inits(spec, k1, num_chains)
            else:
                z0 = jax.vmap(prior.to_unconstrained)(
                    jax.vmap(prior.sample)(
                        jax.random.split(k1, num_chains))
                )
            logpost_batch = None
            if spec.loglike_batch is not None:
                def logpost_batch(Z):
                    lp = jax.vmap(prior.unconstrained_logpdf)(Z)
                    return lp + spec.loglike_batch(
                        jax.vmap(prior.from_unconstrained)(Z)
                    )
            if mesh is not None and hmc_stepped:
                raise NotImplementedError(
                    "hmc_stepped is not supported together with mesh= "
                    "(the sharded ChEES path runs one fused program); "
                    "drop one of the two")
            if mesh is not None:
                from .parallel.sharded import (
                    run_chees_sharded, sharded_batched_fn)

                # shard_map the batched log-posterior so each device's
                # chain slice runs its own fused likelihood; ChEES's
                # cross-chain adaptation statistics become all-reduces
                if logpost_batch is not None:
                    logpost_batch = sharded_batched_fn(
                        logpost_batch, mesh, axis)
                samples_z, stats = run_chees_sharded(
                    spec.logpost_unconstrained, z0, k2, mesh,
                    axis_name=axis,
                    num_warmup=num_warmup, num_samples=num_samples,
                    logp_batch_fn=logpost_batch, mass=mass,
                    max_leapfrogs=hmc_max_leapfrogs,
                )
            elif hmc_stepped:
                from .samplers.chees import run_chees_stepped

                samples_z, stats = run_chees_stepped(
                    spec.logpost_unconstrained, z0, k2,
                    num_warmup=num_warmup, num_samples=num_samples,
                    logp_batch_fn=logpost_batch, mass=mass,
                    max_leapfrogs=hmc_max_leapfrogs,
                    # ~25 transitions (~100 leapfrogs) per program:
                    # seconds of device time, well under RPC kill
                    # windows, ~2x less host-dispatch than block=1
                    block=25,
                )
                samples_z = jnp.asarray(samples_z)
            else:
                samples_z, stats = run_chees(
                    spec.logpost_unconstrained, z0, k2,
                    num_warmup=num_warmup, num_samples=num_samples,
                    logp_batch_fn=logpost_batch, mass=mass,
                    max_leapfrogs=hmc_max_leapfrogs,
                )
            # (S, C, dim) -> (C, S, dim)
            chains_z = np.asarray(samples_z).transpose(1, 0, 2)
            samples_z = samples_z.reshape(-1, samples_z.shape[-1])
            # every leapfrog evaluates value+gradient for all chains
            ncall = int(np.asarray(stats["n_leapfrogs"], np.int64).sum()
                        * num_chains)
        theta = np.asarray(jax.vmap(prior.from_unconstrained)(samples_z))
        # convergence diagnostics in the reporting (theta) space
        chains_th = np.asarray(
            jax.vmap(jax.vmap(prior.from_unconstrained))(jnp.asarray(chains_z))
        )
        conv = summarize_chains(chains_th)
        ess_b = np.asarray(conv["ess_bulk"], np.float64)
        extra = {
            "ncall": ncall,
            "rhat": conv["rhat"],
            "ess_bulk": conv["ess_bulk"],
            "ess_tail": conv["ess_tail"],
            # all-NaN for tiny smoke runs (ESS undefined below 4 draws)
            "ess": (float(np.nanmin(ess_b))
                    if np.any(np.isfinite(ess_b)) else float("nan")),
        }
    elif sampler == "advi":
        from .samplers.advi import run_advi

        num_steps = num_warmup + num_samples
        num_mc = 8
        k1, k2 = jax.random.split(key)
        z0 = prior.to_unconstrained(prior.sample(k1))
        res = jax.jit(
            lambda z, k: run_advi(
                spec.logpost_unconstrained, z, k,
                num_steps=num_steps, num_mc=num_mc, num_draws=num_samples,
            )
        )(z0, k2)
        theta = np.asarray(jax.vmap(prior.from_unconstrained)(res.samples))
        extra = {
            "logz_lower": float(res.logZ_lower),
            # actual ELBO-gradient likelihood evaluations: num_mc draws
            # per optimizer step, plus the final 64-draw ELBO estimate
            # (samplers/advi.py run_advi)
            "ncall": int(num_steps * num_mc + 64),
        }
    else:
        raise ValueError(
            f"unknown sampler {sampler!r}; use ns, smc, nuts, chees or advi"
        )

    elapsed = time.time() - t0
    # final per-sample likelihoods: prefer the batched path — vmapping
    # the scalar scan materializes (S, N, R)-shaped buffers whose tiny
    # trailing dims TPU layouts pad to (8, 128) tiles, a up-to-64x
    # memory blowup (observed 21 GB for 4000 CARMA samples at R=2).
    # Chunked: a long ChEES run delivers millions of draws (C x S), and
    # one monolithic sweep OOMs at the very end of a 25-minute run.
    if spec.loglike_batch is not None:
        TH_all = jnp.asarray(theta)
        chunk = _FINAL_LOGLIKE_CHUNK
        if TH_all.shape[0] <= chunk:
            loglikes = np.asarray(spec.loglike_batch(TH_all))
        else:
            loglikes = np.concatenate([
                np.asarray(spec.loglike_batch(TH_all[i:i + chunk]))
                for i in range(0, TH_all.shape[0], chunk)])
    else:
        loglikes = np.asarray(
            jax.vmap(jax.jit(spec.loglike))(jnp.asarray(theta)))
    results = {
        "paramnames": spec.names,
        "sampler": sampler,
        "elapsed_s": elapsed,
        "posterior": {
            "mean": theta.mean(axis=0).tolist(),
            "stdev": theta.std(axis=0).tolist(),
            "median": np.median(theta, axis=0).tolist(),
            "errlo": np.quantile(theta, 0.158655, axis=0).tolist(),
            "errup": np.quantile(theta, 0.841345, axis=0).tolist(),
        },
        "maximum_likelihood": {
            "logl": float(np.max(loglikes)),
            "point": theta[int(np.argmax(loglikes))].tolist(),
        },
        **extra,
    }
    if "ess" in results and elapsed > 0:
        results["ess_per_s"] = float(results["ess"]) / elapsed
    if mesh is not None:
        results["mesh"] = {
            "axes": {str(k): int(v) for k, v in mesh.shape.items()},
            "shard_axes": list(axis) if isinstance(axis, tuple) else str(axis),
            "n_devices_sharded": int(n_shard),
        }

    if log_dir:
        os.makedirs(os.path.join(log_dir, "chains"), exist_ok=True)
        os.makedirs(os.path.join(log_dir, "info"), exist_ok=True)
        # cap the written posterior: long MCMC ensembles deliver millions
        # of draws; 20k equal-weighted rows is plenty for any downstream
        # use and keeps committed artifacts at single-digit MB
        theta_out = theta
        if theta.shape[0] > 20000:
            sel = np.random.default_rng(0).choice(
                theta.shape[0], 20000, replace=False)
            theta_out = theta[np.sort(sel)]
        with open(os.path.join(log_dir, "chains", "equal_weighted_post.txt"), "w") as fh:
            fh.write(" ".join(spec.names) + "\n")
            np.savetxt(fh, theta_out)
        with open(os.path.join(log_dir, "info", "results.json"), "w") as fh:
            json.dump(results, fh, indent=2, ensure_ascii=False)
    results["samples"] = theta
    return results


def run_inference_many(
    datasets: Sequence[Tuple],
    sampler: str = "chees",
    key=None,
    num_chains: int = 64,
    num_warmup: int = 500,
    num_samples: int = 500,
    n_components: int = 20,
    basis_function: str = "SHO",
    S_low: float = 20.0,
    S_high: float = 20.0,
    max_leapfrogs: int = 128,
    log_dir: Optional[str] = None,
    mesh=None,
    mesh_axis="chains",
) -> List[Dict]:
    """Fit the single-bending model to MANY light curves in one program.

    The data-parallel axis the reference lacks (one series per script
    run, reference examples/ultranest/single_pl.jl:35): D datasets x
    ``num_chains`` chains run as one ChEES-HMC ensemble of B = D*C
    chains whose likelihood is a single fused Pallas kernel call with
    per-chain (ragged) time grids (ops.pallas_celerite_multi).

    One PriorSet serves every dataset: the bend-frequency bounds use the
    global [min f_min, max f_max] band, and the per-dataset mean prior
    mu ~ N(xbar_d, 5 sqrt(va_d)) is standardized — theta carries
    mu_std ~ N(0, 1) and the likelihood applies
    mu = xbar_d + 5 sqrt(va_d) * mu_std (an exact reparametrization).

    ``datasets``: sequence of (t, y, yerr) arrays, lengths may differ.
    Returns one results dict per dataset (means/stds in the dataset's
    own mu units); artifacts per dataset under ``log_dir/ds{i}/``.

    ``mesh`` (optional): a `jax.sharding.Mesh`; the B = D*C chain batch
    is laid out as ``P(mesh_axis)`` and the ensemble runs GSPMD-sharded
    (the ragged Pallas/masked-scan likelihood partitions over chains,
    ChEES's cross-chain adaptation statistics become all-reduces). B
    must be divisible by the mesh axis size.
    """
    from .ops.pallas_celerite import batched_loglike_multi
    from .samplers.chees import run_chees

    key = jax.random.PRNGKey(0) if key is None else key
    D = len(datasets)
    C = num_chains
    B = D * C
    dtype = jnp.result_type(float)

    Ns = [len(d[0]) for d in datasets]
    Nmax = max(Ns)

    def pad_row(x, fill_mode):
        x = np.asarray(x, dtype)
        if len(x) == Nmax:
            return x
        if fill_mode == "edge":
            return np.concatenate([x, np.full(Nmax - len(x), x[-1], dtype)])
        return np.concatenate([x, np.full(Nmax - len(x), fill_mode, dtype)])

    T = jnp.asarray(np.stack([pad_row(d[0], "edge") for d in datasets]))
    # per-lane spacings in host f64 (edge padding -> trailing zeros),
    # cast after the diff (see ops/celerite.py build_uv)
    def _dt_row(x):
        x = np.asarray(x, np.float64)
        full = np.concatenate([x, np.full(Nmax - len(x), x[-1])])
        return np.diff(full)

    DT = jnp.asarray(np.stack([_dt_row(d[0]) for d in datasets]), dtype)
    Y = jnp.asarray(np.stack([pad_row(d[1], 1.0) for d in datasets]))
    E = jnp.asarray(np.stack([pad_row(d[2], 1.0) for d in datasets]))
    NV = jnp.asarray(Ns, dtype)
    YN = jnp.log(Y)
    xbar = jnp.asarray(
        [float(np.mean(np.log(np.asarray(d[1])))) for d in datasets], dtype)
    sd5 = jnp.asarray(
        [5.0 * float(np.std(np.log(np.asarray(d[1])))) for d in datasets], dtype)

    f_mins = [1.0 / float(d[0][-1] - d[0][0]) for d in datasets]
    f_maxs = [1.0 / float(np.min(np.diff(np.asarray(d[0])))) / 2.0
              for d in datasets]
    f_min, f_max = min(f_mins), max(f_maxs)
    min_f_b, max_f_b = f_min / 20.0 * 4.0, f_max * 20.0 / 4.0

    prior = PriorSet([
        ("alphas", TwoUniformDependent(0.0, 1.5, 4.0)),
        ("f_1", LogUniform(min_f_b, max_f_b)),
        ("variance", LogNormal(2 * -1.5, np.sqrt(2.0) * 1.0)),
        ("nu", Gamma(2.0, 0.5)),
        ("mu_std", Normal(0.0, 1.0)),
    ])
    ds_of_row = jnp.repeat(jnp.arange(D), C)  # (B,)

    def coeffs_one(th):
        a1, a2, f1, var, nu, mu_std = (th[i] for i in range(6))
        kern = approx(
            SingleBendingPowerLaw(a1, f1, a2), f_min, f_max,
            n_components, var, S_low, S_high, basis_function=basis_function,
        )
        return kern.coefficients()

    def loglike_batch(TH):
        a, b, c, d = jax.vmap(coeffs_one)(TH)
        mu = xbar[ds_of_row] + sd5[ds_of_row] * TH[:, 5]
        t_rows = T[ds_of_row]
        yv = YN[ds_of_row] - mu[:, None]
        s2 = TH[:, 4][:, None] * E[ds_of_row] ** 2 / Y[ds_of_row] ** 2
        nv = NV[ds_of_row]
        return batched_loglike_multi(a, b, c, d, t_rows, yv, s2, nv,
                                     DT[ds_of_row])

    def logpost_batch(Z):
        lp = jax.vmap(prior.unconstrained_logpdf)(Z)
        TH = jax.vmap(prior.from_unconstrained)(Z)
        return lp + loglike_batch(TH)

    k1, k2 = jax.random.split(key)
    z0 = jax.vmap(prior.to_unconstrained)(
        jax.vmap(prior.sample)(jax.random.split(k1, B))
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if B % int(np.prod([mesh.shape[a] for a in (
                (mesh_axis,) if isinstance(mesh_axis, str) else mesh_axis)])):
            raise ValueError(
                f"B={B} chains not divisible by mesh axis {mesh_axis}")
        z0 = jax.device_put(z0, NamedSharding(mesh, PartitionSpec(mesh_axis)))
        k2 = jax.device_put(k2, NamedSharding(mesh, PartitionSpec()))
    t0 = time.time()
    samples_z, stats = run_chees(
        lambda z: prior.unconstrained_logpdf(z),  # unused per-chain path
        z0, k2, num_warmup=num_warmup, num_samples=num_samples,
        logp_batch_fn=logpost_batch, max_leapfrogs=max_leapfrogs,
    )
    elapsed = time.time() - t0
    # (S, B, dim) -> (D, C, S, dim) theta with per-dataset mu units
    from .utils.mcmc_stats import summarize_chains

    TH = jax.vmap(jax.vmap(prior.from_unconstrained))(samples_z)
    TH = np.asarray(TH)
    S = TH.shape[0]
    TH = TH.reshape(S, D, C, 6).transpose(1, 2, 0, 3)  # (D, C, S, 6)
    names = ["α₁", "α₂", "f₁", "variance", "ν", "μ"]
    # per-dataset likelihood-call share: every leapfrog evaluates
    # value+gradient for this dataset's C chains (warmup + sampling)
    ncall_per_ds = int(np.asarray(stats["n_leapfrogs"], np.int64).sum()) * C
    results = []
    for i in range(D):
        chains = TH[i].copy()  # (C, S, 6)
        chains[..., 5] = float(xbar[i]) + float(sd5[i]) * chains[..., 5]
        th = chains.reshape(C * S, 6)
        # per-dataset convergence diagnostics (VERDICT r4 #5): a
        # 64-series batch must expose each silently-unconverged fit,
        # like a reference-style per-series run would
        conv = summarize_chains(chains)
        ess_b = np.asarray(conv["ess_bulk"], np.float64)
        ess_min = (float(np.nanmin(ess_b))
                   if np.any(np.isfinite(ess_b)) else float("nan"))
        rhat = np.asarray(conv["rhat"], np.float64)
        res = {
            "paramnames": names,
            "sampler": sampler,
            "elapsed_s": elapsed,
            "posterior": {
                "mean": th.mean(axis=0).tolist(),
                "stdev": th.std(axis=0).tolist(),
                "median": np.median(th, axis=0).tolist(),
                "errlo": np.quantile(th, 0.158655, axis=0).tolist(),
                "errup": np.quantile(th, 0.841345, axis=0).tolist(),
            },
            "rhat": conv["rhat"],
            "ess_bulk": conv["ess_bulk"],
            "ess_tail": conv["ess_tail"],
            "ess": ess_min,
            "ess_per_s": (ess_min / elapsed if elapsed > 0
                          else float("nan")),
            "ncall": ncall_per_ds,
            "converged": (bool(np.nanmax(rhat) < 1.05)
                          if np.any(np.isfinite(rhat)) else False),
        }
        if log_dir:
            dsd = os.path.join(log_dir, f"ds{i}")
            os.makedirs(os.path.join(dsd, "chains"), exist_ok=True)
            os.makedirs(os.path.join(dsd, "info"), exist_ok=True)
            with open(os.path.join(dsd, "chains", "equal_weighted_post.txt"),
                      "w") as fh:
                fh.write(" ".join(names) + "\n")
                np.savetxt(fh, th)
            with open(os.path.join(dsd, "info", "results.json"), "w") as fh:
                json.dump(res, fh, indent=2, ensure_ascii=False)
        res["samples"] = th
        results.append(res)
    return results
