"""Sequence-axis scale-out: blockwise celerite factorization across devices.

The reference processes the time dimension with a strictly sequential
O(N) recursion on one core (reference src/celerite_solver.jl:44-99);
N is bounded by one machine's memory. This module is the domain-correct
analog of context parallelism (SURVEY §2.6 row 4, §5 "long-context"):
time is split into contiguous per-device blocks, each device owns only
its (N/n_dev, R) slice of the U/V/phi tables, and the R x R running
factorization state + forward-solve carry are handed from device k to
k+1 with `lax.ppermute` when block k finishes.

Wall-clock equals the single-chip scan (the recursion is inherently
sequential — device k+1 cannot start before k's carry arrives); what
scales is MEMORY: each chip holds 1/n_dev of the tables, so N can grow
to n_dev x one chip's capacity. When vmapped over a chain batch the
idle devices pipeline naturally (chain micro-batches stagger).

Key structural fact exploited here: with ``phi[0] = 0`` (build_uv,
ops/celerite.py:74) the factorization + forward-solve recursion is a
UNIFORM scan from the neutral carry (S=0, W=0, D=0, f=0, zp=0) — the
first point's special case (D_1 = suma + sigma2_1, zp_1 = y_1) falls
out automatically. Block hand-off is therefore exact: the carry after
block k is precisely the initial carry block k+1 needs, and the
boundary decay is already baked into the first phi row of block k+1
(phi encodes exp(-c dt) against the previous GLOBAL point).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.celerite import build_uv

__all__ = ["logl_seq_sharded", "factor_solve_seq_sharded"]


def _uniform_step(suma):
    """One factorization + forward-substitution step (neutral-init form).

    Matches ops/celerite.py _factor + fwd_step fused into one carry:
      S_n  = (phi phi^T) o (S + D W W^T)       [R x R]
      D_n  = suma + sigma2_n - U_n^T S_n U_n
      W_n  = (V_n - S_n U_n) / D_n
      f_n  = phi_n o (f + W_{n-1} zp_{n-1})
      zp_n = y_n - U_n . f_n
    """

    def step(carry, inp):
        S, W_prev, D_prev, f, zp_prev = carry
        Un, Vn, phin, s2n, yn = inp
        S = (phin[:, None] * phin[None, :]) * (
            S + D_prev * (W_prev[:, None] * W_prev[None, :])
        )
        SU = S @ Un
        Dn = suma + s2n - Un @ SU
        Wn = (Vn - SU) / Dn
        f = phin * (f + W_prev * zp_prev)
        zpn = yn - Un @ f
        return (S, Wn, Dn, f, zpn), (Dn, zpn)

    return step


def factor_solve_seq_sharded(
    a, b, c, d, t, y, sigma2, mesh: Mesh, axis_name: str = "seq"
) -> Tuple[jax.Array, jax.Array]:
    """(D, zp) of the global series, computed blockwise across the mesh.

    ``t, y, sigma2``: global (N,) arrays, N divisible by the mesh axis
    size. Tables are built once (VPU) and sharded along N; the carry
    crosses device boundaries via ppermute. Returns global (N,) ``D``
    (LDL^T diagonal) and ``zp`` (forward-substituted residuals), sharded
    along the same axis — enough for the likelihood:
    y^T K^-1 y = sum zp_n^2 / D_n, logdet K = sum log D_n.
    """
    n_dev = mesh.shape[axis_name]
    N = t.shape[0]
    if N % n_dev != 0:
        raise ValueError(f"N={N} not divisible by mesh axis size {n_dev}")
    uv = build_uv(a, b, c, d, t)
    U, V, phi = uv
    R = U.shape[-1]
    suma = jnp.sum(a)
    dtype = U.dtype
    step = _uniform_step(suma)

    def local(U_l, V_l, phi_l, s2_l, y_l):
        me = lax.axis_index(axis_name)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        K = U_l.shape[0]

        def run_block(carry):
            return lax.scan(step, carry, (U_l, V_l, phi_l, s2_l, y_l))

        neutral = (
            jnp.zeros((R, R), dtype),
            jnp.zeros((R,), dtype),
            jnp.zeros((), dtype),
            jnp.zeros((R,), dtype),
            jnp.zeros((), dtype),
        )
        D0 = jnp.zeros((K,), dtype)
        zp0 = jnp.zeros((K,), dtype)

        def round_body(r, state):
            carry, D_l, zp_l = state

            def active(c):
                new_c, (D, zp) = run_block(c)
                return new_c, D, zp

            def idle(c):
                return c, D_l, zp_l

            carry, D_l, zp_l = lax.cond(r == me, active, idle, carry)
            # hand the finished carry to the next block's device; only
            # the (r -> r+1) edge matters, the rest carry junk that is
            # overwritten before use
            carry = jax.tree.map(
                lambda x: lax.ppermute(x, axis_name, perm), carry
            )
            return carry, D_l, zp_l

        _, D_l, zp_l = lax.fori_loop(
            0, n_dev, round_body, (neutral, D0, zp0)
        )
        return D_l, zp_l

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return fn(U, V, phi, sigma2, y)


def logl_seq_sharded(
    a, b, c, d, t, y, sigma2, mesh: Mesh, axis_name: str = "seq"
):
    """Celerite log-likelihood with the SEQUENCE axis sharded over devices.

    Identical result to ops.celerite.logl (same recursion, same -inf
    non-PD guard), but the N-point tables live distributed: run series
    up to n_dev x one chip's memory. The only cross-device traffic is
    the O(R^2) carry per block boundary — tiny against HBM traffic.
    """
    D, zp = factor_solve_seq_sharded(
        a, b, c, d, t, y, sigma2, mesh, axis_name
    )
    N = y.shape[0]
    logdet = jnp.sum(jnp.log(jnp.abs(D)))
    quad = jnp.sum(zp * zp / D)
    ll = -0.5 * logdet - 0.5 * N * jnp.log(2.0 * jnp.pi) - 0.5 * quad
    ok = jnp.all(D > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf)
