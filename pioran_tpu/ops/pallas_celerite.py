"""Pallas TPU kernel for the batched celerite log-likelihood — the hot op.

Why a kernel: the sampler hot path evaluates the likelihood for ~10^3
chains at once (reference re-enters its scalar-loop solver per call,
reference src/celerite_solver.jl:12-158; we batch it). The vmapped
`lax.scan` in ops/celerite.py carries a (B, R, R) running state ``S``
through HBM every one of the N steps — at B=1024, R=40 that is ~6.5 MB
re-read and re-written ~500 times (tens of GB of HBM traffic), which is
exactly the measured runtime. This kernel keeps ``S`` resident in VMEM
for the whole time sweep and only streams the O(N R B) U/V/phi tables,
turning the op from HBM-bound to VPU-bound (~10x).

Key algebraic simplification: the likelihood does not need the backward
substitution at all. With K = (I+L) D (I+L)^T from the celerite LDL^T,

    y^T K^-1 y = z'^T D^-1 z',   z' = (I+L)^{-1} y,

so one forward sweep yields logdet D and the quadratic form:

    ll = -1/2 ( sum log D_n + N log 2pi + sum z'_n^2 / D_n ).

Layout: batch on lanes (128 chains per grid block), celerite rows
R = 2J on sublanes, time in VMEM-sized chunks streamed by the Pallas
pipeline. The uniform recurrence (phi_0 = 0 makes step 0 a no-op on S)
runs in a `fori_loop`; padding steps are masked, padded chains sliced
off host-side.

Gradients: `batched_loglike` is a `jax.custom_vjp` whose forward is this
kernel and whose backward re-runs the `lax.scan` implementation under
`jax.vjp` — bit-identical adjoint semantics, no hand-derived kernel
adjoint to maintain. Gradient users pay one scan forward extra; the
no-grad paths (SMC reweighting, nested-sampling style evaluation) get
the full kernel speedup.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched_loglike", "batched_loglike_pallas",
           "batched_loglike_pallas_fused", "batched_loglike_pallas_multi",
           "batched_loglike_multi", "build_tables"]

_LOG2PI = math.log(2.0 * math.pi)


def _exp_neg(u):
    from .celerite import exp_neg

    return exp_neg(u)


def _pad_axis(x, size, axis, fill=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def build_tables(a, b, c, d, t) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """U, V, phi tables in kernel layout (N, R, B), batch on lanes.

    Same interleaved row layout as ops.celerite.build_uv (odd rows
    cos-like, even rows sin-like; reference celerite_solver.jl:33-63)
    but built directly time-major with the batch last so no transpose
    of the ~100 MB tables is ever materialized.
    """
    aT, bT, cT, dT = a.T, b.T, c.T, d.T  # (J, B)
    td = t[:, None, None] * dT[None]  # (N, J, B)
    co = jnp.cos(td)
    si = jnp.sin(td)

    # block row layout [J cos-type rows; J sin-type rows] — a pure row
    # permutation of the reference's interleaved layout (the recurrence
    # is permutation-invariant); contiguous concat instead of a stride-2
    # interleave keeps the table build at HBM bandwidth.
    U = jnp.concatenate([aT * co + bT * si, aT * si - bT * co], axis=1)
    V = jnp.concatenate([co, si], axis=1)
    from .celerite import exp_neg

    dt = jnp.diff(t)
    ec = exp_neg(dt[:, None, None] * cT[None])  # (N-1, J, B)
    phi = jnp.concatenate([ec, ec], axis=1)
    phi = jnp.concatenate([jnp.zeros_like(phi[:1]), phi], axis=0)
    return U, V, phi


def _kernel(n_steps, chunk, u_ref, v_ref, p_ref, y_ref, s2_ref, suma_ref,
            out_ref, S, fW, acc):
    """One (batch-block, time-chunk) grid step.

    Scratch: S (R, R, Bblk) running LDL^T state; fW (2, R, Bblk) rows
    [f, W_prev]; acc (8, Bblk) rows [D_prev, zp_prev, logdet, quad, minD].
    """
    from jax import lax
    from jax.experimental import pallas as pl

    i_n = pl.program_id(1)
    num_n = pl.num_programs(1)

    @pl.when(i_n == 0)
    def _init():
        S[...] = jnp.zeros_like(S)
        fW[...] = jnp.zeros_like(fW)
        acc[...] = jnp.zeros_like(acc)
        acc[4, :] = jnp.full_like(acc[4, :], jnp.inf)  # min D

    suma = suma_ref[0, :]  # (Bblk,)

    def step(k, _):
        g = i_n * chunk + k
        live = (g < n_steps).astype(suma.dtype)  # padding-step mask

        Un = u_ref[k]  # (R, Bblk)
        Vn = v_ref[k]
        pn = p_ref[k]
        yn = y_ref[k, :]  # (Bblk,)
        s2n = s2_ref[k, :]

        W_prev = fW[1]
        D_prev = acc[0, :]
        zp_prev = acc[1, :]

        # S <- (pn pn^T) o (S + D_prev W_prev W_prev^T)   [R, R, Bblk]
        Snew = (pn[:, None, :] * pn[None, :, :]) * (
            S[...] + D_prev[None, None, :] * (W_prev[:, None, :] * W_prev[None, :, :])
        )
        SU = jnp.sum(Snew * Un[None, :, :], axis=1)  # (R, Bblk)
        Dn = suma + s2n - jnp.sum(Un * SU, axis=0)
        Wn = (Vn - SU) / Dn[None, :]

        # forward substitution row
        f = pn * (fW[0] + W_prev * zp_prev[None, :])
        zpn = yn - jnp.sum(Un * f, axis=0)

        # commit state unconditionally: padding steps only occur after
        # every live step (time is padded at the end), so a polluted
        # carry is never read again — only the accumulators need the
        # mask. Padded chains/steps keep D > 0 by construction
        # (sigma2 padded with 1, coefficients with 0).
        S[...] = Snew
        fW[0] = f
        fW[1] = Wn
        acc[0, :] = Dn
        acc[1, :] = zpn
        # Kahan-compensated logdet/quad accumulation (comp in rows 5/6):
        # the strictly sequential adds would otherwise grow O(N eps)
        # f32 error — ~500 nats at N = 2^16 (benchmarks/GRID.md r3)
        x2 = live * jnp.log(jnp.abs(Dn)) - acc[5, :]
        t2 = acc[2, :] + x2
        acc[5, :] = (t2 - acc[2, :]) - x2
        acc[2, :] = t2
        x3 = live * (zpn * zpn) / Dn - acc[6, :]
        t3 = acc[3, :] + x3
        acc[6, :] = (t3 - acc[3, :]) - x3
        acc[3, :] = t3
        acc[4, :] = jnp.minimum(
            acc[4, :], jnp.where(g < n_steps, Dn, jnp.inf)
        )
        return 0

    lax.fori_loop(0, chunk, step, 0)

    @pl.when(i_n == num_n - 1)
    def _finish():
        ll = -0.5 * (acc[2, :] + acc[3, :] + n_steps * _LOG2PI)
        ok = (acc[4, :] > 0) & jnp.isfinite(ll)
        out_ref[0, :] = jnp.where(ok, ll, -jnp.inf)


def batched_loglike_pallas(
    a, b, c, d, t, y, sigma2,
    *, block_b: int = 128, chunk: int = 64, interpret: bool = False,
):
    """Batched celerite GP log-likelihood on TPU via Pallas.

    a, b, c, d: (B, J) per-chain celerite coefficients;
    t: (N,) shared sorted times; y, sigma2: (B, N) per-chain residuals
    and noise variances. Returns (B,) log-likelihoods (-inf where the
    factorization is not positive definite, matching ops.celerite.logl).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, J = a.shape
    N = t.shape[0]
    dtype = t.dtype

    # pad J so R = 2J is a multiple of 8 sublanes (zero terms are inert:
    # a=0 contributes nothing to suma, U=V=0 rows never touch D or zp)
    Jp = -(-J // 4) * 4
    a = _pad_axis(a, Jp, 1)
    b = _pad_axis(b, Jp, 1)
    c = _pad_axis(c, Jp, 1)
    d = _pad_axis(d, Jp, 1)
    R = 2 * Jp

    Bp = -(-B // block_b) * block_b
    a, b, c, d = (_pad_axis(x, Bp, 0) for x in (a, b, c, d))
    y = _pad_axis(y, Bp, 0)
    sigma2 = _pad_axis(sigma2, Bp, 0, fill=1.0)

    U, V, phi = build_tables(a, b, c, d, t)  # (N, R, Bp)
    Np = -(-N // chunk) * chunk
    U = _pad_axis(U, Np, 0)
    V = _pad_axis(V, Np, 0)
    phi = _pad_axis(phi, Np, 0)
    yT = _pad_axis(y.T, Np, 0)  # (Np, Bp)
    s2T = _pad_axis(sigma2.T, Np, 0, fill=1.0)
    suma = jnp.sum(a, axis=1)[None, :]  # (1, Bp)

    grid = (Bp // block_b, Np // chunk)
    tab_spec = pl.BlockSpec((chunk, R, block_b), lambda ib, iN: (iN, 0, ib))
    row_spec = pl.BlockSpec((chunk, block_b), lambda ib, iN: (iN, ib))

    kern = functools.partial(_kernel, N, chunk)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    except Exception:  # older jax: field name differences
        compiler_params = None

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            tab_spec, tab_spec, tab_spec, row_spec, row_spec,
            pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib)),
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib)),
        out_shape=jax.ShapeDtypeStruct((1, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((R, R, block_b), dtype),
            pltpu.VMEM((2, R, block_b), dtype),
            pltpu.VMEM((8, block_b), dtype),
        ],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(U, V, phi, yT, s2T, suma)
    return out[0, :B]


def _fused_kernel(n_steps, chunk, per_lane_t,
                  a_ref, b_ref, c_ref, d_ref, t_ref, dt_ref,
                  y_ref, s2_ref, suma_ref, nv_ref, out_ref, S, fW, acc):
    """Fused variant: U/V/phi computed in-kernel from the (J, Bblk)
    coefficients — no O(N R B) tables ever touch HBM.

    The R = 2J rows are kept as two J-row halves (cos-type, sin-type),
    so the running state is four (J, J, Bblk) blocks S[e, g] — avoids
    misaligned sublane concats while staying a pure row permutation of
    the reference layout. phi needs no n = 0 special case: with
    S = W = D = 0 initial state the first step is algebraically inert.

    Scratch: S (3, J, J, Bblk) blocks [S00, S01, S11] (S10 = S01^T);
    fW (4, J, Bblk) rows [f0, f1, W0, W1];
    acc (8, Bblk) rows [D_prev, zp_prev, logdet, quad, minD].
    """
    from jax import lax
    from jax.experimental import pallas as pl

    i_n = pl.program_id(1)
    num_n = pl.num_programs(1)

    @pl.when(i_n == 0)
    def _init():
        S[...] = jnp.zeros_like(S)
        fW[...] = jnp.zeros_like(fW)
        acc[...] = jnp.zeros_like(acc)
        acc[4, :] = jnp.full_like(acc[4, :], jnp.inf)

    av = a_ref[...]  # (J, Bblk)
    bv = b_ref[...]
    cv = c_ref[...]
    dv = d_ref[...]
    suma = suma_ref[0, :]
    nvalid = nv_ref[0, :]  # per-lane valid length (ragged datasets)

    def step(k, _):
        g = i_n * chunk + k
        live = (g < nvalid).astype(suma.dtype)  # (Bblk,) padding mask
        if per_lane_t:
            tn = t_ref[k, :]    # (Bblk,) — per-dataset time grids
            dtn = dt_ref[k, :]
        else:
            tn = t_ref[i_n, k]  # scalar from SMEM — shared time grid
            dtn = dt_ref[i_n, k]
        yn = y_ref[k, :]
        s2n = s2_ref[k, :]

        co = jnp.cos(dv * tn)
        si = jnp.sin(dv * tn)
        U0 = av * co + bv * si
        U1 = av * si - bv * co
        ec = _exp_neg(cv * dtn)  # (J, Bblk) — accurate f32 exp

        f0, f1, W0p, W1p = fW[0], fW[1], fW[2], fW[3]
        D_prev = acc[0, :]
        zp_prev = acc[1, :]

        # S is symmetric: store only the S00, S01, S11 blocks (S10 = S01^T)
        # — 3 instead of 4 passes over the dominant (J, J, Bblk) tensors.
        # The S10 contraction uses S01 reduced over its *leading* axis:
        # SU1[i] = sum_j S10[i,j] U0[j] = sum_j S01[j,i] U0[j].
        eci = ec[:, None, :]
        ecj = ec[None, :, :]
        ee = eci * ecj
        Wd0 = W0p * D_prev[None, :]
        Wd1 = W1p * D_prev[None, :]
        S00 = ee * (S[0] + Wd0[:, None, :] * W0p[None, :, :])
        S01 = ee * (S[1] + Wd0[:, None, :] * W1p[None, :, :])
        S11 = ee * (S[2] + Wd1[:, None, :] * W1p[None, :, :])
        SU0 = jnp.sum(S00 * U0[None, :, :], axis=1) + jnp.sum(
            S01 * U1[None, :, :], axis=1
        )
        SU1 = jnp.sum(S01 * U0[:, None, :], axis=0) + jnp.sum(
            S11 * U1[None, :, :], axis=1
        )
        Dn = suma + s2n - jnp.sum(U0 * SU0, axis=0) - jnp.sum(U1 * SU1, axis=0)
        W0n = (co - SU0) / Dn[None, :]
        W1n = (si - SU1) / Dn[None, :]

        f0n = ec * (f0 + W0p * zp_prev[None, :])
        f1n = ec * (f1 + W1p * zp_prev[None, :])
        zpn = yn - jnp.sum(U0 * f0n, axis=0) - jnp.sum(U1 * f1n, axis=0)

        S[0] = S00
        S[1] = S01
        S[2] = S11
        fW[0], fW[1], fW[2], fW[3] = f0n, f1n, W0n, W1n
        acc[0, :] = Dn
        acc[1, :] = zpn
        # Kahan-compensated accumulation (comp rows 5/6) — keeps the
        # f32 logdet/quad error O(sqrt N) instead of O(N)
        x2 = live * jnp.log(jnp.abs(Dn)) - acc[5, :]
        t2 = acc[2, :] + x2
        acc[5, :] = (t2 - acc[2, :]) - x2
        acc[2, :] = t2
        x3 = live * (zpn * zpn) / Dn - acc[6, :]
        t3 = acc[3, :] + x3
        acc[6, :] = (t3 - acc[3, :]) - x3
        acc[3, :] = t3
        acc[4, :] = jnp.minimum(acc[4, :], jnp.where(g < nvalid, Dn, jnp.inf))
        return 0

    lax.fori_loop(0, chunk, step, 0)

    @pl.when(i_n == num_n - 1)
    def _finish():
        ll = -0.5 * (acc[2, :] + acc[3, :] + nvalid * _LOG2PI)
        ok = (acc[4, :] > 0) & jnp.isfinite(ll)
        out_ref[0, :] = jnp.where(ok, ll, -jnp.inf)


def batched_loglike_pallas_fused(
    a, b, c, d, t, y, sigma2, dt=None,
    *, block_b: int = 128, chunk: int = 128, interpret: bool = False,
):
    """Fused batched celerite log-likelihood: tables computed in-VMEM.

    Same contract as :func:`batched_loglike_pallas`; HBM traffic is just
    the (B, N) y/sigma2 rows, so it scales to much larger B and N.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, J = a.shape
    N = t.shape[0]
    dtype = t.dtype

    # sublane alignment: the (J, block_b) coefficient blocks and the
    # (..., J, block_b) scratch tiles need J % 8 == 0; zero terms are inert
    J = -(-J // 8) * 8
    a = _pad_axis(a, J, 1)
    b = _pad_axis(b, J, 1)
    c = _pad_axis(c, J, 1)
    d = _pad_axis(d, J, 1)

    Bp = -(-B // block_b) * block_b
    a, b, c, d = (_pad_axis(x, Bp, 0) for x in (a, b, c, d))
    y = _pad_axis(y, Bp, 0)
    sigma2 = _pad_axis(sigma2, Bp, 0, fill=1.0)

    Np = -(-N // chunk) * chunk
    Nc = Np // chunk
    t_pad = jnp.pad(t, (0, Np - N), mode="edge") if Np > N else t
    if dt is None:
        dtv = jnp.concatenate([jnp.zeros((1,), dtype), jnp.diff(t_pad)])
    else:
        # host-supplied (f64-computed) spacings: diff of an f32 grid
        # loses ~log2(N) bits at long N (see ops.celerite.build_uv)
        dtv = jnp.concatenate(
            [jnp.zeros((1,), dtype), jnp.asarray(dt, dtype),
             jnp.zeros((Np - N,), dtype)])
    tsm = t_pad.reshape(Nc, chunk)
    dtsm = dtv.reshape(Nc, chunk)
    yT = _pad_axis(y.T, Np, 0)
    s2T = _pad_axis(sigma2.T, Np, 0, fill=1.0)
    suma = jnp.sum(a, axis=1)[None, :]

    aT, bT, cT, dT = a.T, b.T, c.T, d.T  # (J, Bp)

    grid = (Bp // block_b, Nc)
    coef_spec = pl.BlockSpec((J, block_b), lambda ib, iN: (0, ib))
    # whole t/dt tables live in SMEM (a few KB); indexed by program id
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((chunk, block_b), lambda ib, iN: (iN, ib))

    nv = jnp.full((1, Bp), N, dtype)
    lane_spec = pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib))

    kern = functools.partial(_fused_kernel, N, chunk, False)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    except Exception:
        compiler_params = None

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            coef_spec, coef_spec, coef_spec, coef_spec,
            smem_spec, smem_spec, row_spec, row_spec,
            lane_spec, lane_spec,
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib)),
        out_shape=jax.ShapeDtypeStruct((1, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, J, J, block_b), dtype),
            pltpu.VMEM((4, J, block_b), dtype),
            pltpu.VMEM((8, block_b), dtype),
        ],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(aT, bT, cT, dT, tsm, dtsm, yT, s2T, suma, nv)
    return out[0, :B]


def batched_loglike_pallas_multi(
    a, b, c, d, t, y, sigma2, n_valid=None, dt=None,
    *, block_b: int = 128, chunk: int = 128, interpret: bool = False,
):
    """Fused batched likelihood with PER-CHAIN time grids — the data-
    parallel "many independent light curves" axis (SURVEY §2.6; the
    reference processes one series per script run,
    reference examples/ultranest/single_pl.jl:35).

    a..d: (B, J); t, y, sigma2: (B, N) per-chain (sorted t rows);
    ``n_valid``: optional (B,) int valid lengths for ragged batches
    (rows beyond n_valid[i] are ignored; pad t with its last value,
    y/sigma2 arbitrarily). Returns (B,) log-likelihoods. Stack
    (dataset, chain) axes into B to run many-chains x many-curves.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, J = a.shape
    N = t.shape[-1]
    dtype = y.dtype

    J = -(-J // 8) * 8
    a = _pad_axis(a, J, 1)
    b = _pad_axis(b, J, 1)
    c = _pad_axis(c, J, 1)
    d = _pad_axis(d, J, 1)

    Bp = -(-B // block_b) * block_b
    a, b, c, d = (_pad_axis(x, Bp, 0) for x in (a, b, c, d))
    t = _pad_axis(t, Bp, 0)
    y = _pad_axis(y, Bp, 0)
    sigma2 = _pad_axis(sigma2, Bp, 0, fill=1.0)
    if n_valid is None:
        nv = jnp.full((1, Bp), N, dtype)
    else:
        nv = _pad_axis(jnp.asarray(n_valid, dtype)[None, :], Bp, 1)

    Np = -(-N // chunk) * chunk
    Nc = Np // chunk
    tp = jnp.pad(t, ((0, 0), (0, Np - N)), mode="edge") if Np > N else t
    if dt is None:
        dtv = jnp.concatenate(
            [jnp.zeros((Bp, 1), dtype), jnp.diff(tp, axis=1)], axis=1
        )
    else:
        # host-f64-computed per-lane spacings (ops.celerite.build_uv)
        dtv = jnp.concatenate(
            [jnp.zeros((Bp, 1), dtype),
             _pad_axis(_pad_axis(jnp.asarray(dt, dtype), Bp, 0),
                       Np - 1, 1)], axis=1)
    tT = tp.T  # (Np, Bp)
    dtT = dtv.T
    yT = _pad_axis(y.T, Np, 0)
    s2T = _pad_axis(sigma2.T, Np, 0, fill=1.0)
    suma = jnp.sum(a, axis=1)[None, :]
    aT, bT, cT, dT = a.T, b.T, c.T, d.T

    grid = (Bp // block_b, Nc)
    coef_spec = pl.BlockSpec((J, block_b), lambda ib, iN: (0, ib))
    row_spec = pl.BlockSpec((chunk, block_b), lambda ib, iN: (iN, ib))
    lane_spec = pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib))

    kern = functools.partial(_fused_kernel, N, chunk, True)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    except Exception:
        compiler_params = None

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            coef_spec, coef_spec, coef_spec, coef_spec,
            row_spec, row_spec, row_spec, row_spec,
            lane_spec, lane_spec,
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib)),
        out_shape=jax.ShapeDtypeStruct((1, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, J, J, block_b), dtype),
            pltpu.VMEM((4, J, block_b), dtype),
            pltpu.VMEM((8, block_b), dtype),
        ],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(aT, bT, cT, dT, tT, dtT, yT, s2T, suma, nv)
    return out[0, :B]


def _scan_batched(a, b, c, d, t, y, sigma2, dt=None):
    from . import celerite as cel

    return jax.vmap(
        lambda aa, bb, cc, dd, yy, ss: cel.logl(aa, bb, cc, dd, t, yy, ss,
                                                dt=dt)
    )(a, b, c, d, y, sigma2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def batched_loglike(a, b, c, d, t, y, sigma2, dt=None):
    """Batched log-likelihood: Pallas forward on TPU, scan elsewhere.

    Differentiable: the VJP re-runs the `lax.scan` reference
    implementation (ops.celerite.logl) under `jax.vjp`, so gradients are
    identical to the scan path regardless of which forward ran.

    ``dt`` (optional, (N-1,)): host-f64-computed spacings for long
    dense series (see ops.celerite.build_uv); treated as
    non-differentiable (the t cotangent still assumes dt = diff(t)).
    """
    return _forward_impl(a, b, c, d, t, y, sigma2, dt)


def _on_tpu():
    try:
        return jax.default_backend() == "tpu" or any(
            d.platform == "tpu" for d in jax.devices()
        )
    except Exception:
        return False


def _forward_impl(a, b, c, d, t, y, sigma2, dt=None):
    if _on_tpu():
        return batched_loglike_pallas_fused(a, b, c, d, t, y, sigma2, dt=dt)
    return _scan_batched(a, b, c, d, t, y, sigma2, dt=dt)


def _fwd(a, b, c, d, t, y, sigma2, dt=None):
    from .pallas_celerite_vjp import fits_vmem

    if _on_tpu() and fits_vmem(a.shape[1], n=t.shape[0], batch=a.shape[0]):
        from .pallas_celerite_vjp import fwd_aug_pallas

        ll, tables = fwd_aug_pallas(a, b, c, d, t, y, sigma2, dt=dt)
        return ll, (a, b, c, d, t, y, sigma2, dt, ll, tables)
    return _scan_batched(a, b, c, d, t, y, sigma2, dt=dt), (
        a, b, c, d, t, y, sigma2, dt, None, None)


def _bwd(res, g):
    a, b, c, d, t, y, sigma2, dt, ll, tables = res
    dtbar = None if dt is None else jnp.zeros_like(dt)
    if tables is not None:
        from .pallas_celerite_vjp import bwd_pallas

        # non-PD chains carry ll = -inf; zero their cotangent (the scan
        # VJP would emit NaN there — samplers mask non-finite either way)
        g = jnp.where(jnp.isfinite(ll), g, jnp.zeros_like(g))
        return (*bwd_pallas(a, b, c, d, t, y, sigma2, tables, g, dt=dt),
                dtbar)
    _, vjp = jax.vjp(
        lambda *args: _scan_batched(*args, dt=dt), a, b, c, d, t, y, sigma2)
    return (*vjp(g), dtbar)


batched_loglike.defvjp(_fwd, _bwd)


def _scan_batched_multi(a, b, c, d, T, y, sigma2, n_valid, dt=None):
    from . import celerite as cel

    s2m = jnp.where(
        jnp.arange(T.shape[-1])[None, :] < n_valid[:, None], sigma2, 1.0
    )
    if dt is None:
        return jax.vmap(cel.logl_masked)(a, b, c, d, T, y, s2m, n_valid)
    return jax.vmap(
        lambda aa, bb, cc, dd, tt, yy, ss, nn, dtt: cel.logl_masked(
            aa, bb, cc, dd, tt, yy, ss, nn, dt=dtt)
    )(a, b, c, d, T, y, s2m, n_valid, dt)


@jax.custom_vjp
def batched_loglike_multi(a, b, c, d, T, y, sigma2, n_valid, dt=None):
    """Differentiable multi-dataset batched likelihood.

    Per-chain time grids T (B, N) and float valid lengths ``n_valid``
    (B,). Pallas kernel forward on TPU, masked-scan elsewhere; the VJP
    re-runs the masked scan under jax.vjp (identical adjoint on every
    backend). ``n_valid`` is treated as non-differentiable. ``dt``
    (optional, (B, N-1)): per-lane host-f64-computed spacings,
    non-differentiable.
    """
    if _on_tpu():
        return batched_loglike_pallas_multi(a, b, c, d, T, y, sigma2,
                                            n_valid=n_valid, dt=dt)
    return _scan_batched_multi(a, b, c, d, T, y, sigma2, n_valid, dt=dt)


def _multi_fwd(a, b, c, d, T, y, sigma2, n_valid, dt=None):
    from .pallas_celerite_vjp import fits_vmem

    if _on_tpu() and fits_vmem(a.shape[1], n=T.shape[-1], batch=a.shape[0]):
        from .pallas_celerite_vjp import fwd_aug_pallas

        # match the masked-scan oracle: dead steps see unit variance so
        # the factorization stays benign beyond each lane's n_valid
        s2m = jnp.where(
            jnp.arange(T.shape[-1])[None, :] < n_valid[:, None], sigma2, 1.0
        )
        ll, tables = fwd_aug_pallas(a, b, c, d, T, y, s2m, n_valid=n_valid,
                                    dt=dt)
        return ll, (a, b, c, d, T, y, sigma2, n_valid, dt, ll, tables)
    return batched_loglike_multi(a, b, c, d, T, y, sigma2, n_valid, dt), (
        a, b, c, d, T, y, sigma2, n_valid, dt, None, None)


def _multi_bwd(res, g):
    a, b, c, d, T, y, sigma2, n_valid, dt, ll, tables = res
    dtbar = None if dt is None else jnp.zeros_like(dt)
    if tables is not None:
        from .pallas_celerite_vjp import bwd_pallas

        g = jnp.where(jnp.isfinite(ll), g, jnp.zeros_like(g))
        s2m = jnp.where(
            jnp.arange(T.shape[-1])[None, :] < n_valid[:, None], sigma2, 1.0
        )
        abar, bbar, cbar, dbar, tbar, ybar, s2bar = bwd_pallas(
            a, b, c, d, T, y, s2m, tables, g, n_valid=n_valid, dt=dt)
        live = jnp.arange(T.shape[-1])[None, :] < n_valid[:, None]
        tbar = jnp.where(live, tbar, 0.0)
        ybar = jnp.where(live, ybar, 0.0)
        s2bar = jnp.where(live, s2bar, 0.0)
        return (abar, bbar, cbar, dbar, tbar, ybar, s2bar,
                jnp.zeros_like(n_valid), dtbar)
    _, vjp = jax.vjp(
        lambda *args: _scan_batched_multi(*args, n_valid, dt=dt), a, b, c, d,
        T, y, sigma2,
    )
    return (*vjp(g), jnp.zeros_like(n_valid), dtbar)


batched_loglike_multi.defvjp(_multi_fwd, _multi_bwd)
