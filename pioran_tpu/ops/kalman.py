"""Log-depth celerite likelihood via parallel Kalman filtering.

**STATUS: EXPERIMENTAL.** This backend is a correctness-complete
log-depth formulation, but it is NOT on the production path: the
sequential scan + Pallas kernels (ops/celerite.py, ops/pallas_celerite.py)
beat it on throughput at every benchmarked (N, J) when vmapped over
chains (benchmarks/grid_tpu_f32.json), and the covariance-form filter
requires f64 for wide-dynamic-range kernels (see Precision below) — use
it only on CPU/x64 for long-N single evaluations, or as a second oracle.

Why a square-root (Cholesky-factor) associative filter — the standard
f32-stabilization (Yaghoobi et al. 2021) — does NOT apply here: sqrt
filters require a real factor ``Q_k^{1/2}`` of the per-interval process
noise, but the celerite 2-d embedding's ``Q_k = Pinf - Phi Pinf Phi^T``
is INDEFINITE (for an SHO term ``Pinf = a [[1,1],[1,1]]`` is rank-1, so
``Q_k`` is a difference of two equal-norm rank-1 matrices in rotated
directions — one positive and one negative eigenvalue whenever
``d dt != 0 mod pi``). Only the FULL data covariance is PD; per-term /
per-interval pieces are not, which is exactly why this filter works
with Schur complements of the full covariance and why the reference's
LDL^T recursion (and our scan/Pallas path) is the right f32 algorithm.
Hence: experimental, f64-only, by construction rather than by neglect.

The celerite LDL^T recursion (ops/celerite.py; reference
src/celerite_solver.jl:12-106) is a Riccati-type recursion: each step's
state depends nonlinearly on the previous step, so it cannot be fed to
`lax.associative_scan` directly. The standard way to parallelize exactly
this class of recursions is the associative formulation of the Kalman
filter (Sarkka & Garcia-Fernandez 2021, IEEE TAC 66:299): represent the
celerite GP as a linear-Gaussian state-space model, express per-step
Gaussian conditioning as an associative operator on 5-tuples
``(A, b, C, eta, J)``, and run `jax.lax.associative_scan` — O(log N)
depth at O(N R^3) work (vs O(N) depth, O(N R^2) work for the scan in
ops/celerite.py).

State-space form (exact, not a discretisation): each celerite term
``k_j(tau) = e^{-c tau}(a cos d tau + b sin d tau)`` is the output of a
2-d stationary process with

  transition   Phi_j(dt) = e^{-c dt} [[cos d dt,  sin d dt],
                                      [-sin d dt, cos d dt]]
  stationary   Pinf_j    = [[a, b], [b, a]]
  observation  h_j       = [1, 0]

so that h Phi(tau) Pinf h^T = k_j(tau) exactly. Process noise is the
exact stationary increment ``Q_k = Pinf - Phi_k Pinf Phi_k^T``. Per-term
``Pinf_j`` may be indefinite (DRWCelerite basis has b = sqrt(3) a); the
filter only ever works with Schur complements of the full (PD) data
covariance, so innovation variances stay positive exactly when the
celerite diagonal D does.

Use this backend for long series / low-latency single evaluations; the
sequential scan wins throughput when vmapped over many chains (see
benchmarks/bench_grid.py).

Precision: the covariance-form filter (both variants here) needs f64 for
wide-dynamic-range kernels (the J=20 basis spans ~4 frequency decades);
in f32 the innovation variance can round non-positive, in which case the
guard returns -inf rather than a wrong number. A square-root
(Cholesky-factor) filter — the classical f32-stable fix — does NOT
exist for these state spaces: both the stationary covariance ``Pinf_j``
(DRWCelerite basis has b = sqrt(3) a > a) and the per-interval process
noise ``Q_k = Pinf - Phi_k Pinf Phi_k^T`` are indefinite for celerite
embeddings (verified numerically on the J=20 basis), so there is no
real Cholesky factor to propagate. The f32-stable production path on
TPU is ops/celerite.py, whose LDL^T recursion only ever forms Schur
complements of the full PD data covariance.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "build_ssm",
    "log_likelihood_kalman",
    "logl_kalman",
    "logl_kalman_sequential",
]


def build_ssm(a, b, c, d, t) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(H, Pinf, Phi) for the stacked 2J-dim celerite state space.

    H: (R,) observation row; Pinf: (R, R) stationary covariance;
    Phi: (N-1, R, R) block-diagonal transitions over dt_k = t_k - t_{k-1}.
    """
    J = a.shape[0]
    R = 2 * J
    dtype = t.dtype

    H = jnp.tile(jnp.asarray([1.0, 0.0], dtype), (J,))

    # Pinf = blockdiag([[a, b], [b, a]])
    eye2 = jnp.eye(2, dtype=dtype)
    off2 = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], dtype)
    blocks = a[:, None, None] * eye2 + b[:, None, None] * off2  # (J,2,2)
    Pinf = jax.scipy.linalg.block_diag(*blocks) if J > 1 else blocks[0]
    Pinf = Pinf.reshape(R, R)

    dt = jnp.diff(t)  # (N-1,)
    decay = jnp.exp(-dt[:, None] * c[None, :])  # (N-1, J)
    co = jnp.cos(dt[:, None] * d[None, :])
    si = jnp.sin(dt[:, None] * d[None, :])
    rot = jnp.stack(
        [jnp.stack([co, si], -1), jnp.stack([-si, co], -1)], -2
    )  # (N-1, J, 2, 2)
    blocks_phi = decay[..., None, None] * rot
    # scatter the (J, 2, 2) blocks onto the (R, R) diagonal
    N1 = dt.shape[0]
    Phi = jnp.zeros((N1, R, R), dtype)
    idx = jnp.arange(J)
    Phi = Phi.at[:, 2 * idx[:, None, None] + jnp.arange(2)[None, :, None],
                 2 * idx[:, None, None] + jnp.arange(2)[None, None, :]].set(
        blocks_phi
    )
    return H, Pinf, Phi


def build_process_noise(a, b, c, d, t) -> jax.Array:
    """Exact stationary increments ``Q_k = Pinf - Phi_k Pinf Phi_k^T``,
    computed blockwise in closed form.

    The naive subtraction cancels catastrophically in f32 for small
    ``c dt`` (Q ~ 2 c dt); the closed form uses ``-expm1(-2 c dt)`` for
    the dominant diagonal so every entry is accurate to machine eps.
    Block algebra: with gamma = e^{-c dt}, theta = d dt,
      Q_j = a(1-gamma^2) I + b [[-g2 sin2t, 1-g2 cos2t],
                                [1-g2 cos2t, g2 sin2t]],  g2 = gamma^2.
    """
    J = a.shape[0]
    R = 2 * J
    dtype = t.dtype
    dt = jnp.diff(t)
    g2 = jnp.exp(-2.0 * dt[:, None] * c[None, :])  # (N-1, J)
    one_m_g2 = -jnp.expm1(-2.0 * dt[:, None] * c[None, :])
    s2t = jnp.sin(2.0 * dt[:, None] * d[None, :])
    c2t = jnp.cos(2.0 * dt[:, None] * d[None, :])
    q11 = a * one_m_g2 - b * g2 * s2t
    q22 = a * one_m_g2 + b * g2 * s2t
    q12 = b * (1.0 - g2 * c2t)
    N1 = dt.shape[0]
    Q = jnp.zeros((N1, R, R), dtype)
    idx = jnp.arange(J)
    Q = Q.at[:, 2 * idx, 2 * idx].set(q11)
    Q = Q.at[:, 2 * idx + 1, 2 * idx + 1].set(q22)
    Q = Q.at[:, 2 * idx, 2 * idx + 1].set(q12)
    Q = Q.at[:, 2 * idx + 1, 2 * idx].set(q12)
    return Q


def logl_kalman_sequential(a, b, c, d, t, y, sigma2):
    """Sequential Kalman-filter log-likelihood (cross-check backend).

    Same value as ops.celerite.logl: both are the prediction-error
    decomposition of log N(y; 0, K + diag(sigma2)).
    """
    H, Pinf, Phi = build_ssm(a, b, c, d, t)
    Q = build_process_noise(a, b, c, d, t)
    R = H.shape[0]
    dtype = t.dtype

    def step(carry, inp):
        m, P = carry
        Phik, Qk, yk, s2k = inp
        m_pred = Phik @ m
        P_pred = Phik @ P @ Phik.T + Qk
        v = yk - H @ m_pred
        S = H @ P_pred @ H + s2k
        K = (P_pred @ H) / S
        m = m_pred + K * v
        P = P_pred - jnp.outer(K, H @ P_pred)
        ll = -0.5 * (jnp.log(2.0 * jnp.pi * S) + v * v / S)
        return (m, P), (ll, S)

    # first point: x_1 ~ N(0, Pinf)
    v1 = y[0]
    S1 = H @ Pinf @ H + sigma2[0]
    K1 = (Pinf @ H) / S1
    m1 = K1 * v1
    P1 = Pinf - jnp.outer(K1, H @ Pinf)
    ll1 = -0.5 * (jnp.log(2.0 * jnp.pi * S1) + v1 * v1 / S1)

    (_, _), (lls, Ss) = lax.scan(step, (m1, P1), (Phi, Q, y[1:], sigma2[1:]))
    total = ll1 + jnp.sum(lls)
    ok = (S1 > 0) & jnp.all(Ss > 0) & jnp.isfinite(total)
    return jnp.where(ok, total, -jnp.inf)


class _FilterElement(NamedTuple):
    A: jax.Array
    b: jax.Array
    C: jax.Array
    eta: jax.Array
    J: jax.Array


def _combine(ei: _FilterElement, ej: _FilterElement) -> _FilterElement:
    """Associative combine of filtering elements (Sarkka & G-F 2021, eq. 10).

    Batched over the leading axis by associative_scan; the (R, R) solves
    map onto batched MXU matmuls after LU.
    """
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    R = Ai.shape[-1]
    I = jnp.eye(R, dtype=Ai.dtype)
    # M = (I + Ci Jj)^{-1}; solve once, reuse transpose-solve for the dual
    LU = I + Ci @ Jj
    AjM = jnp.linalg.solve(jnp.swapaxes(LU, -1, -2), jnp.swapaxes(Aj, -1, -2))
    AjM = jnp.swapaxes(AjM, -1, -2)  # Aj (I + Ci Jj)^{-1}
    A = AjM @ Ai
    b = (AjM @ (bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
    C = AjM @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
    # dual: Ai^T (I + Jj Ci)^{-1} = [ (I + Ci Jj)^{-1} Ai ]^T  (C, J symmetric)
    AitM = jnp.swapaxes(jnp.linalg.solve(LU, Ai), -1, -2)
    eta = (AitM @ (etaj[..., None] - Jj @ bi[..., None]))[..., 0] + etai
    Jout = AitM @ Jj @ Ai + Ji
    return _FilterElement(A, b, C, eta, Jout)


def logl_kalman(a, b, c, d, t, y, sigma2):
    """Log-depth celerite log-likelihood via parallel Kalman filtering."""
    H, Pinf, Phi = build_ssm(a, b, c, d, t)
    Q = build_process_noise(a, b, c, d, t)
    N = y.shape[0]
    R = H.shape[0]
    dtype = t.dtype
    I = jnp.eye(R, dtype=dtype)

    # --- per-step elements, k >= 2 (vectorised) ---
    QH = Q @ H  # (N-1, R)
    S = QH @ H + sigma2[1:]  # innovation given exact previous state
    K = QH / S[:, None]  # (N-1, R)
    A = (I[None] - K[:, :, None] * H[None, None, :]) @ Phi
    bvec = K * y[1:, None]
    C = Q - K[:, :, None] * QH[:, None, :]
    HS = H[None, :] / S[:, None]  # (N-1, R)
    PhiT_H = jnp.swapaxes(Phi, -1, -2) @ H  # (N-1, R)
    eta = PhiT_H * (y[1:] / S)[:, None]
    Jmat = (PhiT_H / S[:, None])[:, :, None] * PhiT_H[:, None, :]

    # --- first element: x_1 ~ N(0, Pinf), observe y_1 ---
    S1 = H @ Pinf @ H + sigma2[0]
    K1 = (Pinf @ H) / S1
    A1 = jnp.zeros((R, R), dtype)
    b1 = K1 * y[0]
    C1 = Pinf - jnp.outer(K1, H @ Pinf)
    e1 = _FilterElement(
        A1, b1, C1, jnp.zeros((R,), dtype), jnp.zeros((R, R), dtype)
    )

    elems = _FilterElement(
        A=jnp.concatenate([A1[None], A]),
        b=jnp.concatenate([b1[None], bvec]),
        C=jnp.concatenate([C1[None], C]),
        eta=jnp.concatenate([e1.eta[None], eta]),
        J=jnp.concatenate([e1.J[None], Jmat]),
    )

    filt = lax.associative_scan(_combine, elems)
    m_filt = filt.b  # (N, R): filtered means (A-prefix hits the zero prior)
    P_filt = filt.C  # (N, R, R)

    # prediction-error decomposition from the filtered marginals
    m_pred = (Phi @ m_filt[:-1, :, None])[..., 0]  # (N-1, R)
    P_pred = Phi @ P_filt[:-1] @ jnp.swapaxes(Phi, -1, -2) + Q
    v = y[1:] - m_pred @ H
    Spred = (P_pred @ H) @ H + sigma2[1:]
    ll1 = -0.5 * (jnp.log(2.0 * jnp.pi * S1) + y[0] * y[0] / S1)
    lls = -0.5 * (jnp.log(2.0 * jnp.pi * Spred) + v * v / Spred)
    total = ll1 + jnp.sum(lls)
    ok = (S1 > 0) & jnp.all(Spred > 0) & jnp.isfinite(total)
    return jnp.where(ok, total, -jnp.inf)


def log_likelihood_kalman(kernel, t, y, sigma2, sequential: bool = False):
    """Kernel-level API mirroring ops.celerite.log_likelihood."""
    a, b, c, d = kernel.coefficients()
    fn = logl_kalman_sequential if sequential else logl_kalman
    return fn(a, b, c, d, t, y, sigma2)
