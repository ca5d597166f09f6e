"""O(N) celerite solver as pure-functional JAX scans — the compute core.

The reference implements the rank-R semiseparable LDL^T factorization as
mutation-heavy scalar loops (reference src/celerite_solver.jl:12-158).
Its vectorised "matrix form" (celerite_solver.jl:171-215) is already the
natural TPU formulation: per time step, dense R-vector/RxR ops. Here that
form becomes `lax.scan`s over static-shape carries:

  factorization   S_n = (p p^T) o (S_{n-1} + D_{n-1} W W^T)     [RxR]
                  D_n = suma + sigma^2_n - U_n^T S_n U_n
                  W_n = (V_n - S_n U_n) / D_n
  forward solve   f_n = p o (f_{n-1} + W_{n-1} z'_{n-1});  z'_n = y_n - U_n.f_n
  backward solve  g_n = p o (g_{n+1} + U_{n+1} z_{n+1});   z_n = z'_n/D_n - W_n.g_n

When vmapped over ~10^3 chains, each step's outer products become batched
matmuls on the MXU; the big elementwise U/V/phi tables are built outside
the scan on the VPU. Everything is reverse-mode differentiable (the
reference relies on ForwardDiff instead, test/test_likelihood.jl:55).

For log-depth (long N / low latency) see ops/kalman.py, the state-space
associative-scan formulation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "CeleriteUV",
    "build_uv",
    "celerite_factor_solve",
    "log_likelihood",
    "logl",
    "simulate",
    "predict",
    "predict_matmul",
]


class CeleriteUV(NamedTuple):
    """Precomputed per-point tables (built on the VPU, outside the scans).

    U[n] (R,)   : odd rows a cos(d t_n) + b sin(d t_n), even rows
                  a sin(d t_n) - b cos(d t_n)
    V[n] (R,)   : odd rows cos(d t_n), even rows sin(d t_n)
    phi[n] (R,) : exp(-c (t_n - t_{n-1})) per row pair; phi[0] = 0
    (layout matches reference celerite_solver.jl:33-63, interleaved)
    """

    U: jax.Array
    V: jax.Array
    phi: jax.Array


def _interleave(odd, even):
    """Stack (..., J) pairs into (..., 2J) interleaved [o1, e1, o2, e2, ...]."""
    return jnp.stack([odd, even], axis=-1).reshape(*odd.shape[:-1], -1)


# two-part split of ln 2 (hi has 16 trailing zero bits, so k * LN2_HI
# is exact in f32 for |k| < 2^15)
_LN2_HI = 0.693145751953125
_LN2_LO = 1.4286068203094633e-06
_INV_LN2 = 1.4426950408889634


def exp_neg(u):
    """Accurate ``exp(-u)`` for u >= 0 in f32 (falls back to jnp.exp in f64).

    TPU's f32 ``exp`` is ~30 ulps off near 1 (measured max abs error
    3.5e-6 on arguments in (-0.03, 0]); phi = exp(-c dt) enters the
    celerite recursion once per step, so that sloppiness alone grew
    |logl_f32 - logl_f64| linearly to ~500 nats at N = 2^16 — with the
    recursion's own arithmetic verified near-exact (the same scan on
    TPU with CPU-computed tables matches CPU to 2e-3 nats at N = 2^14).
    Standard fix: range-reduce by ln 2 with a two-part constant and
    evaluate a degree-7 Taylor polynomial on the residual (|r| <=
    ln2/2; truncation 5e-9, total ~2 ulps), then scale by the exact
    power of two. ~10 VPU ops instead of one libdevice call — noise in
    the table build, ~3% of the fused kernel's per-step work.
    """
    if u.dtype != jnp.float32:
        return jnp.exp(-u)
    # clamp: exp(-104) already underflows f32 to 0, and for u ~ 1e13 the
    # range reduction would cancel catastrophically (r huge -> polynomial
    # overflows to inf while exp2(-k) underflows to 0 -> 0 * inf = NaN,
    # where jnp.exp(-u) returns exactly 0)
    u = jnp.minimum(u, 104.0)
    k = jnp.round(u * _INV_LN2)
    r = (u - k * _LN2_HI) - k * _LN2_LO  # in [-ln2/2, ln2/2]
    # exp(-r) via Horner (degree 7)
    x = -r
    p = 1.0 / 5040.0
    for coef in (1.0 / 720.0, 1.0 / 120.0, 1.0 / 24.0, 1.0 / 6.0, 0.5,
                 1.0, 1.0):
        p = p * x + coef
    return jnp.exp2(-k) * p


def build_uv(a, b, c, d, t, dt=None) -> CeleriteUV:
    """Vectorised construction of the U, V, phi tables for times ``t``.

    ``dt`` (optional, (N-1,)): the consecutive spacings. Pass spacings
    computed in f64 on the host for long dense series — ``diff`` of an
    f32 time grid loses ~log2(N) bits when the span is ~N times the
    spacing (at N = 2^16 that alone cost ~500 nats of likelihood,
    dwarfing every other f32 effect; benchmarks/GRID.md).
    """
    td = t[:, None] * d[None, :]
    co = jnp.cos(td)
    si = jnp.sin(td)
    U = _interleave(a * co + b * si, a * si - b * co)  # (N, R)
    V = _interleave(co, si)  # (N, R)
    if dt is None:
        dt = jnp.diff(t)
    ec = exp_neg(dt[:, None] * c[None, :])  # (N-1, J)
    phi = _interleave(ec, ec)
    phi = jnp.concatenate([jnp.zeros_like(phi[:1]), phi], axis=0)  # (N, R)
    return CeleriteUV(U=U, V=V, phi=phi)


def _factor(U, V, phi, sigma2, suma) -> Tuple[jax.Array, jax.Array]:
    """The LDL^T factor scan: returns ``(D, W)``.

    The R x R running state ``S`` dominates reverse-mode memory: a plain
    scan saves it at every step, i.e. O(N R^2) residuals *per vmapped
    chain* (20 GB for 2048 particles at N=484, R=40 — exceeds HBM). The
    scan is therefore blocked into ~sqrt(N) chunks with `jax.checkpoint`
    on the inner scan: only block-boundary carries are stored and the
    backward pass recomputes within blocks, O(sqrt(N) R^2) memory at
    ~1 extra forward of FLOPs.
    """
    N, R = U.shape
    dtype = U.dtype
    D1 = suma + sigma2[0]
    W1 = V[0] / D1

    def factor_step(carry, inp):
        S, W_prev, D_prev = carry
        Un, Vn, phin, s2n = inp
        S = (phin[:, None] * phin[None, :]) * (
            S + D_prev * (W_prev[:, None] * W_prev[None, :])
        )
        SU = S @ Un
        Dn = suma + s2n - Un @ SU
        Wn = (Vn - SU) / Dn
        return (S, Wn, Dn), (Dn, Wn)

    S0 = jnp.zeros((R, R), dtype=dtype)
    steps = N - 1
    K = max(int(steps**0.5), 1)
    B = -(-steps // K)
    pad = B * K - steps

    def pad_block(x, fill=0.0):
        padded = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x
        return padded.reshape((B, K) + x.shape[1:])

    # padding rows are benign: phi=0 zeroes S, sigma2=1 keeps D positive;
    # their (D, W) outputs are sliced off below.
    inputs = (
        pad_block(U[1:]), pad_block(V[1:]), pad_block(phi[1:]),
        pad_block(sigma2[1:], 1.0),
    )

    @jax.checkpoint
    def block_scan(carry, blk):
        return lax.scan(factor_step, carry, blk)

    _, (D_blk, W_blk) = lax.scan(block_scan, (S0, W1, D1), inputs)
    D_rest = D_blk.reshape(B * K)[:steps]
    W_rest = W_blk.reshape(B * K, R)[:steps]
    D = jnp.concatenate([D1[None], D_rest])
    W = jnp.concatenate([W1[None], W_rest], axis=0)
    return D, W


def celerite_factor_solve(
    a, b, c, d, t, y, sigma2, dt=None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, CeleriteUV]:
    """LDL^T factorization + K^{-1} y solve in three scans.

    Returns ``(z, D, W, logdetD, uv)`` where ``z = K^{-1} y``,
    ``D`` is the LDL^T diagonal, ``W`` the preconditioned V rows, and
    ``logdetD = sum log |D_n|`` (abs as in reference
    celerite_solver.jl:140).
    """
    uv = build_uv(a, b, c, d, t, dt=dt)
    U, V, phi = uv
    R = U.shape[-1]
    suma = jnp.sum(a)
    dtype = U.dtype

    D, W = _factor(U, V, phi, sigma2, suma)
    logdetD = stable_sum(jnp.log(jnp.abs(D)))

    # forward substitution: z' = (I + tril(U W^T))^{-1} y
    def fwd_step(carry, inp):
        f, zp_prev, W_prev = carry
        Un, Wn, phin, yn = inp
        f = phin * (f + W_prev * zp_prev)
        zp = yn - Un @ f
        return (f, zp, Wn), zp

    f0 = jnp.zeros((R,), dtype=dtype)
    _, zp_rest = lax.scan(
        fwd_step, (f0, y[0], W[0]), (U[1:], W[1:], phi[1:], y[1:])
    )
    zp = jnp.concatenate([y[:1], zp_rest])

    # backward substitution: z = D^{-1} z' then (I + triu(W U^T))^{-1}
    def bwd_step(carry, inp):
        g, z_next, U_next = carry
        Un, Wn, phi_next, zpn, Dn = inp
        g = phi_next * (g + U_next * z_next)
        zn = zpn / Dn - Wn @ g
        return (g, zn, Un), zn

    zN = zp[-1] / D[-1]
    _, z_rest = lax.scan(
        bwd_step,
        (jnp.zeros((R,), dtype=dtype), zN, U[-1]),
        (U[:-1], W[:-1], phi[1:], zp[:-1], D[:-1]),
        reverse=True,
    )
    z = jnp.concatenate([z_rest, zN[None]])
    return z, D, W, logdetD, uv


# series at or above this length dispatch to the sequence-sharded
# blockwise scan when a mesh is supplied (below it, sharding a short
# series is pure ppermute overhead)
SEQ_SHARD_MIN_N = 8192


def stable_sum(x):
    """Blocked (two-level) summation: ~sqrt(N) f32 error growth.

    XLA's plain f32 reduction on TPU accumulates sequentially enough
    that |logl_f32 - logl_f64| grew linearly in N (measured ~500 nats
    at N = 2^16, benchmarks/GRID.md r3) — the same pathology the Pallas
    kernels fix with Kahan accumulators. Splitting into ~sqrt(N) blocks
    whose partial sums are reduced separately cuts the growth to
    ~sqrt(N) eps, matching the recursion's own f32 noise floor.
    """
    n = x.shape[0]
    if n <= 256:
        return jnp.sum(x)
    k = 1 << max((n - 1).bit_length() // 2, 1)  # ~sqrt(n), power of 2
    m = -(-n // k) * k
    xp = jnp.pad(x, (0, m - n)) if m > n else x
    return jnp.sum(jnp.sum(xp.reshape(-1, k), axis=1))


def logl(a, b, c, d, t, y, sigma2, mesh=None, seq_axis: str = "seq",
         seq_min_n: Optional[int] = None, dt=None):
    """Celerite GP log-likelihood (reference celerite_solver.jl:312-334).

    loglike = -logdetD/2 - N log(2 pi)/2 - y^T K^{-1} y / 2

    If the LDL^T diagonal is not strictly positive (K not PD — possible
    for extreme parameters, and in f32 via roundoff) the likelihood is
    ``-inf``: without this, ``log|D|`` of a tiny/negative pivot creates
    arbitrarily large fake likelihood spikes that samplers lock onto.
    (The reference instead takes ``log abs(D)``, celerite_solver.jl:140,
    but runs in f64 where its priors keep D positive.)

    ``mesh`` (optional): a Mesh whose ``seq_axis`` carries the time
    dimension. Series of N >= ``seq_min_n`` (default SEQ_SHARD_MIN_N)
    then run through the blockwise ppermute scan
    (parallel.seq_scan.logl_seq_sharded) — each device holds 1/n_dev of
    the tables, so N scales to n_dev x one chip's memory; shorter series
    ignore the mesh (sharding them is pure overhead). Identical values
    and gradients either way.
    """
    if mesh is not None:
        cap = SEQ_SHARD_MIN_N if seq_min_n is None else seq_min_n
        if t.shape[0] >= cap and t.shape[0] % mesh.shape[seq_axis] == 0:
            from ..parallel.seq_scan import logl_seq_sharded

            return logl_seq_sharded(a, b, c, d, t, y, sigma2, mesh,
                                    axis_name=seq_axis, dt=dt)
    z, D, _, logdetD, _ = celerite_factor_solve(a, b, c, d, t, y, sigma2,
                                                dt=dt)
    N = y.shape[0]
    ll = (-0.5 * logdetD - 0.5 * N * jnp.log(2.0 * jnp.pi)
          - 0.5 * stable_sum(y * z))
    ok = jnp.all(D > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf)


def log_likelihood(kernel, t, y, sigma2, mesh=None, seq_axis: str = "seq",
                   seq_min_n: Optional[int] = None, dt=None):
    """Log-likelihood for a CeleriteKernel (reference celerite_solver.jl:262-294).

    Pass ``mesh=`` to shard long series over the mesh's ``seq_axis``
    (see :func:`logl`); ``dt`` = host-f64 spacings for long dense
    series (see :func:`build_uv`)."""
    a, b, c, d = kernel.coefficients()
    return logl(a, b, c, d, t, y, sigma2, mesh=mesh, seq_axis=seq_axis,
                seq_min_n=seq_min_n, dt=dt)


def simulate(key, kernel, t, sigma2, dt=None):
    """Draw one GP realisation in O(N R) using the LDL^T factors.

    y_1 = sqrt(D_1) q_1;  y_n = U_n . f_n + sqrt(D_n) q_n with
    f_n = phi_{n-1} o (f_{n-1} + W_{n-1} sqrt(D_{n-1}) q_{n-1})
    (reference celerite_solver.jl:515-549). ``dt`` = host-f64 spacings
    (see :func:`build_uv`) so on-chip f32 simulation matches the
    likelihood paths' accuracy at long N.
    """
    a, b, c, d = kernel.coefficients()
    N = t.shape[0]
    q = jax.random.normal(key, (N,), dtype=t.dtype)
    uv = build_uv(a, b, c, d, t, dt=dt)
    U, V, phi = uv
    R = U.shape[-1]
    suma = jnp.sum(a)
    D, W = _factor(U, V, phi, sigma2, suma)
    sqrtD_q = jnp.sqrt(jnp.maximum(D, 0.0)) * q

    def sim_step(f, inp):
        Un, Wn_prev, phin, sdqn, sdq_prev = inp
        f = phin * (f + Wn_prev * sdq_prev)
        yn = Un @ f + sdqn
        return f, yn

    f0 = jnp.zeros((R,), dtype=U.dtype)
    _, y_rest = lax.scan(
        sim_step,
        f0,
        (U[1:], W[:-1], phi[1:], sqrtD_q[1:], sqrtD_q[:-1]),
    )
    return jnp.concatenate([sqrtD_q[:1], y_rest])


def predict_matmul(kernel, tau, t, y, sigma2, dt=None):
    """Posterior mean at ``tau``: O(N) solve + one (M,N)x(N,) MXU matmul.

    TPU-first default: z = K^{-1} y via the celerite scans, then
    mu = K(tau, t) @ z. The cross-covariance matmul is an ideal MXU op for
    the N, M this domain uses (10^2..10^4). For very long series use
    :func:`predict` (O((N+M) R) scan, same result). ``dt`` = host-f64
    spacings for the solve (see :func:`build_uv`).
    """
    a, b, c, d = kernel.coefficients()
    z, *_ = celerite_factor_solve(a, b, c, d, t, y, sigma2, dt=dt)
    Kcross = kernel(jnp.abs(tau[:, None] - t[None, :]))
    return Kcross @ z


def predict(kernel, tau, t, y, sigma2, dt=None):
    """Posterior mean at ``tau`` in O((N+M) R) via gated forward/backward scans.

    Scan analog of the reference's O(N+M) predictor
    (reference celerite_solver.jl:363-483): a forward sweep accumulates the
    decayed sufficient statistic of all data points with t_n < tau_m, a
    backward sweep the one with t_n > tau_m; gating is by precomputed
    `searchsorted` indices instead of data-dependent control flow.

    ``dt`` = host-f64 spacings: the solve AND the sweeps' decay factors
    then use correctly-rounded spacings + :func:`exp_neg`, so on-chip
    f32 prediction carries the same accuracy story as the likelihood.
    """
    a, b, c, d = kernel.coefficients()
    z, *_ = celerite_factor_solve(a, b, c, d, t, y, sigma2, dt=dt)
    dt_arr = jnp.diff(t) if dt is None else jnp.asarray(dt, t.dtype)

    M = tau.shape[0]
    # n0[m] = number of data points with t_n <= tau_m
    n0 = jnp.searchsorted(t, tau, side="right")

    # ---- forward: Qf[k] = sum_{n<=k} z_n [cos(d t_n); sin(d t_n)] decayed to t_k
    def fwd(carry, inp):
        Q = carry
        tn, dtn, zn = inp
        Q = Q * exp_neg(c * dtn)[None, :] + zn * jnp.stack(
            [jnp.cos(d * tn), jnp.sin(d * tn)]
        )
        return Q, Q

    J = a.shape[0]
    Q0 = jnp.zeros((2, J), dtype=t.dtype)
    dt_prev = jnp.concatenate([jnp.zeros((1,), t.dtype), dt_arr])
    _, Qf = lax.scan(fwd, Q0, (t, dt_prev, z))  # (N, 2, J)

    # ---- backward: Qb[k] = sum_{n>=k} z_n [a cos + b sin; a sin - b cos](t_n) decayed to t_k
    def bwd(carry, inp):
        Q = carry
        tn, dtn, zn = inp
        Q = Q * exp_neg(c * dtn)[None, :] + zn * jnp.stack(
            [a * jnp.cos(d * tn) + b * jnp.sin(d * tn),
             a * jnp.sin(d * tn) - b * jnp.cos(d * tn)]
        )
        return Q, Q

    dt_next = jnp.concatenate([dt_arr, jnp.zeros((1,), t.dtype)])
    _, Qb = lax.scan(bwd, Q0, (t, dt_next, z), reverse=True)  # (N, 2, J)

    # ---- combine per target point
    def combine(m):
        n_left = n0[m] - 1  # last data index with t <= tau_m (or -1)
        tm = tau[m]
        has_left = n0[m] > 0
        tl = t[jnp.clip(n_left, 0, t.shape[0] - 1)]
        Ql = Qf[jnp.clip(n_left, 0, t.shape[0] - 1)]
        # clamp: when there is no left point, tm - tl < 0 and the decay
        # would overflow -> inf * 0 = NaN inside the masked branch
        # (harmless for values, but trips jax_debug_nans)
        decay_l = exp_neg(c * jnp.maximum(tm - tl, 0.0))
        mu_left = jnp.sum(
            decay_l
            * (
                Ql[0] * (a * jnp.cos(d * tm) + b * jnp.sin(d * tm))
                + Ql[1] * (a * jnp.sin(d * tm) - b * jnp.cos(d * tm))
            )
        )
        mu_left = jnp.where(has_left, mu_left, 0.0)

        n_right = n0[m]  # first data index with t > tau_m (or N)
        has_right = n0[m] < t.shape[0]
        tr = t[jnp.clip(n_right, 0, t.shape[0] - 1)]
        Qr = Qb[jnp.clip(n_right, 0, t.shape[0] - 1)]
        decay_r = exp_neg(c * jnp.maximum(tr - tm, 0.0))
        mu_right = jnp.sum(
            decay_r * (Qr[0] * jnp.cos(d * tm) + Qr[1] * jnp.sin(d * tm))
        )
        mu_right = jnp.where(has_right, mu_right, 0.0)
        return mu_left + mu_right

    return jax.vmap(combine)(jnp.arange(M))


def logl_masked(a, b, c, d, t, y, sigma2, n_valid, dt=None):
    """Log-likelihood of the first ``n_valid`` points of a padded series.

    Exact ragged handling with static shapes: the recursion runs over the
    full padded grid (pad ``t`` with its last value so dt = 0, ``sigma2``
    with 1 so D stays positive) and only steps < n_valid contribute to
    logdet / the quadratic form / the PD check — the same masking
    semantics as the Pallas multi-dataset kernel
    (ops/pallas_celerite.batched_loglike_pallas_multi), for which this
    is the CPU oracle. Uses the forward-only quadratic form
    y^T K^-1 y = sum zp_n^2 / D_n.
    """
    uv = build_uv(a, b, c, d, t, dt=dt)
    U, V, phi = uv
    R = U.shape[-1]
    suma = jnp.sum(a)
    dtype = U.dtype
    D, W = _factor(U, V, phi, sigma2, suma)

    def fwd_step(carry, inp):
        f, zp_prev, W_prev = carry
        Un, Wn, phin, yn = inp
        f = phin * (f + W_prev * zp_prev)
        zp = yn - Un @ f
        return (f, zp, Wn), zp

    f0 = jnp.zeros((R,), dtype=dtype)
    _, zp_rest = lax.scan(
        fwd_step, (f0, y[0], W[0]), (U[1:], W[1:], phi[1:], y[1:])
    )
    zp = jnp.concatenate([y[:1], zp_rest])

    live = jnp.arange(t.shape[0]) < n_valid
    logdet = stable_sum(jnp.where(live, jnp.log(jnp.abs(D)), 0.0))
    quad = stable_sum(jnp.where(live, zp * zp / D, 0.0))
    ll = -0.5 * (logdet + quad + n_valid * jnp.log(2.0 * jnp.pi))
    ok = jnp.all(jnp.where(live, D, 1.0) > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf)
