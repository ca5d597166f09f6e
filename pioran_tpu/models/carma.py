"""CARMA(p, q) power-spectrum models (reference src/CARMA.jl), TPU-native.

A CARMA model is stored by the roots of its autoregressive polynomial
(complex-conjugate pairs, last root real when p is odd), moving-average
coefficients beta, and a normalisation. The partial-fraction expansion
converts it into J = ceil(p/2) celerite terms; all arithmetic is complex
jnp and fully jittable (static p, q).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .kernels import CeleriteKernel

__all__ = [
    "CARMA",
    "carma_celerite_coefs",
    "carma_celerite_coefs_real",
    "carma_covariance",
    "carma_psd",
    "carma_psd_real",
    "carma_normalisation",
    "poly_from_conjugate_pairs",
    "quad2roots",
    "roots2coeffs",
    "sample_quad",
]


# ---------------------------------------------------------------------------
# Real-arithmetic path (TPU): complex dtypes are unsupported on TPU
# backends, and the CARMA roots come in conjugate pairs anyway, so the
# whole partial-fraction pipeline decomposes into real (re, im) pairs.
# This is the jitted likelihood path; the complex functions below remain
# as the CPU oracle (tests assert both agree to f64 precision).
# ---------------------------------------------------------------------------


def _c_mul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _c_div(a, b):
    d = b[0] * b[0] + b[1] * b[1]
    return (a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d


def _c_polyval(coeffs, z):
    """Horner evaluation of a real-coefficient polynomial (ascending
    order, static length) at the complex point z = (re, im)."""
    n = coeffs.shape[0]
    re = jnp.zeros_like(z[0]) + coeffs[n - 1]
    im = jnp.zeros_like(z[0])
    for i in range(n - 2, -1, -1):
        re, im = _c_mul((re, im), z)
        re = re + coeffs[i]
    return re, im


def poly_from_conjugate_pairs(pair_re, pair_im, real_roots=()):
    """Real coefficients (ascending, monic) of the polynomial whose roots
    are the conjugate pairs (re_k +- i im_k) plus optional real roots —
    the real-arithmetic analog of :func:`roots2coeffs` for the MA
    polynomial (reference src/CARMA.jl:185-188). Static orders; each
    conjugate pair contributes the real quadratic
    z^2 - 2 re z + (re^2 + im^2)."""
    dtype = jnp.result_type(float)
    c = jnp.ones((1,), dtype)
    for k in range(len(pair_re)):
        x, y = pair_re[k], pair_im[k]
        quad = jnp.stack([x * x + y * y, -2.0 * x, jnp.ones((), dtype)])
        c = jnp.convolve(c, quad)
    for rho in real_roots:
        c = jnp.convolve(c, jnp.stack([-rho, jnp.ones((), dtype)]))
    return c


def carma_celerite_coefs_real(
    p: int, root_re, root_im, beta, norm=1.0, is_integrated_power: bool = True
):
    """CARMA -> celerite (a, b, c, d) partial fractions in real arithmetic.

    Same math as :func:`carma_celerite_coefs` (reference
    src/CARMA.jl:98-143) with every complex number carried as an
    (re, im) pair — TPU backends have no complex dtype, and the
    conjugate-pair structure keeps everything closed under real ops.
    ``root_re``/``root_im``: full length-p root lists with
    root[2k+1] = conj(root[2k]) and a real last root when p is odd.
    """
    beta = jnp.asarray(beta)
    J = p // 2 + (p % 2)

    a_list, b_list, c_list, d_list = [], [], [], []
    for k in range(J):
        x, y = root_re[2 * k], root_im[2 * k]
        num1 = _c_polyval(beta, (x, y))
        num2 = _c_polyval(beta, (-x, -y))
        fr = _c_mul(num1, num2)
        frac = (-fr[0] / x, -fr[1] / x)
        for j in range(p):
            if j == 2 * k:
                continue
            xj, yj = root_re[j], root_im[j]
            t1 = (xj - x, yj - y)           # r_j - r_k
            t2 = (xj + x, y - yj)           # conj(r_j) + r_k
            frac = _c_div(frac, _c_mul(t1, t2))
        last_is_real = (p % 2 == 1) and (k == J - 1)
        if not last_is_real:
            a_list.append(2.0 * frac[0])
            b_list.append(2.0 * frac[1])
            c_list.append(-x)
            d_list.append(-y)
        else:
            a_list.append(frac[0])
            b_list.append(jnp.zeros_like(frac[0]))
            c_list.append(-x)
            d_list.append(jnp.zeros_like(x))

    a = jnp.stack(a_list)
    b = jnp.stack(b_list)
    c = jnp.stack(c_list)
    d = jnp.stack(d_list)
    variance = jnp.sum(a)
    va = jnp.asarray(norm)
    if is_integrated_power:
        va = va / variance
    return a * va, b * va, c, d


def carma_psd_real(f, p: int, q: int, root_re, root_im, beta, norm=1.0,
                   is_integrated_power: bool = True):
    """CARMA PSD in real arithmetic (TPU analog of :func:`carma_psd`).

    |B(2 pi i f)|^2 / |A(2 pi i f)|^2 with A rebuilt from the conjugate
    pairs via :func:`poly_from_conjugate_pairs` — evaluated at purely
    imaginary points, so Horner runs on (re, im) pairs of real arrays.
    """
    f = jnp.asarray(f)
    w = 2.0 * jnp.pi * f
    pairs_re = [root_re[2 * k] for k in range(p // 2)]
    pairs_im = [root_im[2 * k] for k in range(p // 2)]
    reals = [root_re[p - 1]] if p % 2 == 1 else []
    alpha = poly_from_conjugate_pairs(pairs_re, pairs_im, reals)
    zero = jnp.zeros_like(w)
    nre, nim = _c_polyval(beta, (zero, w))
    dre, dim_ = _c_polyval(alpha, (zero, w))
    ratio2 = (nre * nre + nim * nim) / (dre * dre + dim_ * dim_)
    if is_integrated_power:
        a, _, _, _ = carma_celerite_coefs_real(
            p, root_re, root_im, beta, 1.0, False)
        # sum(a) = 2 x the process normalisation integral, so the
        # complex path's 2 ratio2 norm / normalisation becomes 4 / sum(a)
        return 4.0 * ratio2 * jnp.asarray(norm) / jnp.sum(a)
    return 4.0 * ratio2 * jnp.asarray(norm)


def roots2coeffs(r):
    """Coefficients (ascending powers, monic) of prod_k (x - r_k).

    jnp analog of Polynomials.fromroots (reference src/CARMA.jl:185-188);
    built as a scan of convolutions so it jits with static length.
    """
    r = jnp.asarray(r, dtype=jnp.complex128 if r.dtype in (jnp.complex128, jnp.float64) else jnp.complex64)
    n = r.shape[0]
    c = jnp.zeros((n + 1,), dtype=r.dtype).at[0].set(1.0)

    def step(c, rk):
        # multiply polynomial c by (x - rk): new_c = shift(c) - rk * c
        shifted = jnp.concatenate([jnp.zeros((1,), c.dtype), c[:-1]])
        return shifted - rk * c, None

    c, _ = jax.lax.scan(step, c, r)
    return c


def quad2roots(quad):
    """Roots from stacked quadratic coefficients (reference src/CARMA.jl:201-223).

    quad = [c1, b1, c2, b2, ..., (r_last)] — pairs (c, b) of monic
    quadratics x^2 + b x + c, plus a trailing real root -r when the length
    is odd. Note: this helper is shape-dynamic in Python (host-side use,
    like the reference's prior sampling); the jittable hot path stores
    roots directly.
    """
    import numpy as np

    quad = np.asarray(quad)
    n = quad.shape[0]
    r = np.zeros(n, dtype=np.complex128)
    n_ = n - 1 if n % 2 == 1 else n
    if n % 2 == 1:
        r[-1] = -quad[-1]
    for k in range(0, n_, 2):
        c, b = quad[k], quad[k + 1]
        delta = b**2 - 4 * c
        if delta < 0:
            r[k] = (-b + 1j * np.sqrt(-delta)) / 2
            r[k + 1] = np.conj(r[k])
        else:
            r[k] = (-b + np.sqrt(delta)) / 2
            r[k + 1] = (-b - np.sqrt(delta)) / 2
    return jnp.asarray(r)


def carma_celerite_coefs(p: int, roots, beta, norm=1.0, is_integrated_power: bool = True):
    """CARMA -> celerite (a, b, c, d) via partial fractions.

    Exact port of the math in reference src/CARMA.jl:98-143 (static p, q).
    Roots must be complex-conjugate pairs ordered pairwise, with a real
    last root when p is odd.
    """
    roots = jnp.asarray(roots)
    beta = jnp.asarray(beta)
    J = p // 2 + (p % 2)
    powers = jnp.arange(beta.shape[0])

    a_list, b_list, c_list, d_list = [], [], [], []
    for k in range(J):
        rk = roots[2 * k]
        num1 = jnp.sum(beta * rk**powers)
        num2 = jnp.sum(beta * (-rk) ** powers)
        frac = -num1 * num2 / jnp.real(rk)
        for j in range(p):
            if j == 2 * k:
                continue
            rj = roots[j]
            frac = frac / ((rj - rk) * (jnp.conj(rj) + rk))
        last_is_real = (p % 2 == 1) and (k == J - 1)
        if not last_is_real:
            a_list.append(2.0 * jnp.real(frac))
            b_list.append(2.0 * jnp.imag(frac))
            c_list.append(-jnp.real(rk))
            d_list.append(-jnp.imag(rk))
        else:
            a_list.append(jnp.real(frac))
            b_list.append(jnp.zeros_like(jnp.real(frac)))
            c_list.append(-jnp.real(rk))
            d_list.append(jnp.zeros_like(jnp.real(rk)))

    a = jnp.stack(a_list)
    b = jnp.stack(b_list)
    c = jnp.stack(c_list)
    d = jnp.stack(d_list)
    variance = jnp.sum(a)
    va = jnp.asarray(norm)
    if is_integrated_power:
        va = va / variance
    return a * va, b * va, c, d


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in ("p", "q", "is_integrated_power")]
    jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=["p", "q", "is_integrated_power"]
    )
    return cls


@_register
@dataclass(frozen=True)
class CARMA:
    """CARMA(p, q) kernel (reference src/CARMA.jl:19-42).

    ``roots``: AR roots, length p (conjugate pairs; real last root if p odd).
    ``beta``: MA coefficients, length q+1.
    p, q and is_integrated_power are static metadata (shape-determining).
    """

    roots: jax.Array
    beta: jax.Array
    norm: jax.Array = 1.0
    p: int = 0
    q: int = 0
    is_integrated_power: bool = True

    def __post_init__(self):
        p, q = self.p, self.q
        if p < 1 or q < 0:
            raise ValueError("p must be >= 1 and q >= 0")
        if q > p:
            raise ValueError("q must be <= p")

    @staticmethod
    def create(p, q, roots, beta, norm=1.0, is_integrated_power=True) -> "CARMA":
        roots = jnp.asarray(roots)
        beta = jnp.asarray(beta, dtype=jnp.result_type(float))
        if roots.shape[0] != p:
            raise ValueError("length of AR roots must equal p")
        if beta.shape[0] != q + 1:
            raise ValueError("length of beta must equal q + 1")
        return CARMA(roots=roots, beta=beta, norm=jnp.asarray(norm), p=p, q=q,
                     is_integrated_power=is_integrated_power)

    def celerite_coefficients(self):
        return carma_celerite_coefs(
            self.p, self.roots, self.beta, self.norm, self.is_integrated_power
        )

    def celerite(self) -> CeleriteKernel:
        """Celerite representation (reference src/CARMA.jl:56-71)."""
        a, b, c, d = self.celerite_coefficients()
        return CeleriteKernel(a=a, b=b, c=c, d=d)

    def __call__(self, tau):
        return carma_covariance(tau, self)

    def psd(self, f):
        return carma_psd(f, self)


def carma_covariance(tau, model: CARMA):
    """Analytic CARMA autocovariance (reference src/CARMA.jl:230-271)."""
    tau = jnp.abs(jnp.asarray(tau))
    roots = model.roots
    beta = model.beta
    powers = jnp.arange(beta.shape[0])

    R = jnp.zeros(tau.shape, dtype=roots.dtype)
    variance = jnp.zeros((), dtype=roots.dtype)
    for k in range(model.p):
        rk = roots[k]
        num1 = jnp.sum(beta * rk**powers)
        num2 = jnp.sum(beta * (-rk) ** powers)
        num = num1 * num2
        den = -2.0 * jnp.real(rk)
        for j in range(model.p):
            if j == k:
                continue
            rj = roots[j]
            den = den * ((rj - rk) * (jnp.conj(rj) + rk))
        R = R + num * jnp.exp(rk * tau) / den
        variance = variance + num / den
    cov = jnp.real(R) * model.norm
    if model.is_integrated_power:
        cov = cov / (2.0 * jnp.real(variance))
    return 2.0 * cov


def carma_normalisation(model: CARMA):
    """Process variance of the unnormalised CARMA (reference src/CARMA.jl:279-304)."""
    roots = model.roots
    beta = model.beta
    powers = jnp.arange(beta.shape[0])
    variance = jnp.zeros((), dtype=roots.dtype)
    for k in range(model.p):
        rk = roots[k]
        num = jnp.sum(beta * rk**powers) * jnp.sum(beta * (-rk) ** powers)
        den = -2.0 * jnp.real(rk)
        for j in range(model.p):
            if j == k:
                continue
            den = den * ((roots[j] - rk) * (jnp.conj(roots[j]) + rk))
        variance = variance + num / den
    return jnp.real(variance)


def carma_psd(f, model: CARMA):
    """CARMA PSD |B(2 pi i f)|^2 / |A(2 pi i f)|^2 (reference src/CARMA.jl:150-172)."""
    f = jnp.asarray(f)
    wi = 2.0 * jnp.pi * f * 1j
    alpha = roots2coeffs(model.roots)
    beta = model.beta
    num = jnp.zeros(f.shape, dtype=alpha.dtype)
    den = jnp.zeros(f.shape, dtype=alpha.dtype)
    for i in range(model.q + 1):
        num = num + beta[i] * wi**i
    for j in range(model.p + 1):
        den = den + alpha[j] * wi**j
    ratio2 = jnp.abs(num / den) ** 2
    if model.is_integrated_power:
        return 2.0 * ratio2 * model.norm / carma_normalisation(model)
    return 4.0 * ratio2 * model.norm


def sample_quad(p: int, q: int, key, f_min: float, f_max: float):
    """Sample valid quadratic coefficients for CARMA priors.

    Host-side (numpy) analog of reference src/CARMA.jl:328-407, producing
    monic-quadratic coefficients whose roots are conjugate pairs within
    [f_min, f_max] and ordered by imaginary part.
    """
    import numpy as np

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def log_uniform(lo, hi):
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))

    def fill(n):
        qv = np.zeros(n)
        n_ = n - 1 if n % 2 == 1 else n
        if n % 2 == 1:
            qv[-1] = log_uniform(f_min, f_max)
        for i in range(1, n_, 2):
            qv[i] = log_uniform(2 * f_min, 2 * f_max)
        buff = 0.0
        prev = None
        for j, i in enumerate(range(0, n_ - 1, 2)):
            if j == 0:
                buff = qv[i + 1] ** 2 / 4
                qv[i] = log_uniform(f_min, f_max) + buff
            else:
                start_log = qv[i - 2] - buff
                buff = qv[i + 1] ** 2 / 4
                qv[i] = log_uniform(start_log, f_max) + buff
        return qv

    return fill(p), fill(q)
