"""Sequence-axis scale-out: blockwise celerite factorization across devices.

The reference processes the time dimension with a strictly sequential
O(N) recursion on one core (reference src/celerite_solver.jl:44-99);
N is bounded by one machine's memory. This module is the domain-correct
analog of context parallelism (SURVEY §2.6 row 4, §5 "long-context"):
time is split into contiguous per-device blocks, each device owns only
its (N/n_dev, R) slice of the U/V/phi tables, and the R x R running
factorization state + forward-solve carry are handed from device k to
k+1 with `lax.ppermute` when block k finishes.

For ONE chain, wall-clock equals the single-chip scan (the recursion is
inherently sequential — device k+1 cannot start before k's carry
arrives); what scales is MEMORY: each chip holds 1/n_dev of the tables,
so N can grow to n_dev x one chip's capacity. For a BATCH of chains,
:func:`logl_seq_pipelined` software-pipelines chain micro-batches
around the device ring: device k runs micro-batch m's block while
device k+1 runs micro-batch m-1's — M micro-batches finish in
M + n_dev - 1 block-times instead of M * n_dev, so device utilization
approaches 1 (not 1/n_dev) as M grows.

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

from ..ops.celerite import build_uv, exp_neg, stable_sum

__all__ = ["logl_seq_sharded", "factor_solve_seq_sharded",
           "logl_seq_pipelined"]


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
    a, b, c, d, t, y, sigma2, mesh: Mesh, axis_name: str = "seq", dt=None
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
    uv = build_uv(a, b, c, d, t, dt=dt)
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
    a, b, c, d, t, y, sigma2, mesh: Mesh, axis_name: str = "seq", dt=None
):
    """Celerite log-likelihood with the SEQUENCE axis sharded over devices.

    Identical result to ops.celerite.logl (same recursion, same -inf
    non-PD guard), but the N-point tables live distributed: run series
    up to n_dev x one chip's memory. The only cross-device traffic is
    the O(R^2) carry per block boundary — tiny against HBM traffic.
    """
    D, zp = factor_solve_seq_sharded(
        a, b, c, d, t, y, sigma2, mesh, axis_name, dt=dt
    )
    N = y.shape[0]
    logdet = stable_sum(jnp.log(jnp.abs(D)))
    quad = stable_sum(zp * zp / D)
    ll = -0.5 * logdet - 0.5 * N * jnp.log(2.0 * jnp.pi) - 0.5 * quad
    ok = jnp.all(D > 0) & jnp.isfinite(ll)
    return jnp.where(ok, ll, -jnp.inf)


def logl_seq_pipelined(
    a, b, c, d, t, Y, S2, mesh: Mesh, axis_name: str = "seq",
    n_micro: int = None, dt=None,
):
    """Batched celerite log-likelihood: sequence axis sharded over the
    mesh, chain micro-batches software-pipelined around the device ring.

    ``a..d``: (B, J) per-chain coefficients; ``t``: (N,) shared sorted
    times; ``Y``, ``S2``: (B, N) per-chain residuals / noise variances.
    N must be divisible by the mesh axis size, B by ``n_micro``
    (default: the axis size). ``dt`` (optional, (N-1,)): consecutive
    spacings computed in f64 on the host — same contract as
    ops.celerite.build_uv; without it ``diff(t)`` on an f32 grid loses
    ~log2(N) bits exactly in the long-N regime this path targets.

    Pipeline: device k owns time block k. At ring round r, device k runs
    micro-batch ``m = r - k`` through its block (if 0 <= m < M) with the
    carry ppermuted in from device k-1; M micro-batches therefore finish
    in ``M + n_dev - 1`` block-times instead of ``M * n_dev`` — the idle
    fraction is (n_dev - 1)/(M + n_dev - 1), approaching zero as the
    chain batch grows. This is the throughput mode of the sequence axis
    (SURVEY §2.6 row 4); :func:`logl_seq_sharded` is the latency mode
    for one chain.

    Returns (B,) log-likelihoods (-inf where the factorization is not
    PD), identical to vmapped ops.celerite.logl.
    """
    n_dev = mesh.shape[axis_name]
    N = t.shape[0]
    B, J = a.shape
    R = 2 * J
    if N % n_dev != 0:
        raise ValueError(f"N={N} not divisible by mesh axis size {n_dev}")
    M = n_micro or n_dev
    if B % M != 0:
        raise ValueError(f"B={B} chains not divisible by n_micro={M}")
    mb = B // M
    dtype = Y.dtype
    # global dt (leading 0) so each block's first phi row decays against
    # the previous block's last point; host-f64 spacings when supplied
    if dt is None:
        dt = jnp.diff(t)
    dt = jnp.concatenate(
        [jnp.zeros((1,), t.dtype), jnp.asarray(dt, t.dtype)])
    suma = jnp.sum(a, axis=1)  # (B,)

    def local(t_l, dt_l, Y_l, S2_l, a_g, b_g, c_g, d_g, suma_g):
        me = lax.axis_index(axis_name)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        K = t_l.shape[0]

        def chain_tables(cm, dm):
            """(K, R) interleaved U, V, phi rows for one chain's block."""
            td = t_l[:, None] * dm[None, :]
            co = jnp.cos(td)
            si = jnp.sin(td)
            ec = exp_neg(dt_l[:, None] * cm[None, :])
            return co, si, ec

        def run_block(carry, am, bm, cm, dm, sm, y_row, s2_row):
            """One chain's block scan from ``carry``; returns partials."""
            co, si, ec = chain_tables(cm, dm)
            U = jnp.stack([am * co + bm * si, am * si - bm * co],
                          axis=-1).reshape(K, R)
            V = jnp.stack([co, si], axis=-1).reshape(K, R)
            phi = jnp.stack([ec, ec], axis=-1).reshape(K, R)
            step = _uniform_step(sm)
            carry, (D_blk, zp_blk) = lax.scan(
                step, carry, (U, V, phi, s2_row, y_row))
            logdet = stable_sum(jnp.log(jnp.abs(D_blk)))
            quad = stable_sum(zp_blk * zp_blk / D_blk)
            minD = jnp.min(D_blk)
            return carry, logdet, quad, minD

        neutral = (
            jnp.zeros((mb, R, R), dtype),
            jnp.zeros((mb, R), dtype),
            jnp.zeros((mb,), dtype),
            jnp.zeros((mb, R), dtype),
            jnp.zeros((mb,), dtype),
        )

        def round_body(r, state):
            carry_recv, ld_acc, qd_acc, md_acc = state
            m = r - me
            active = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1) * mb
            am = lax.dynamic_slice_in_dim(a_g, mc, mb)
            bm = lax.dynamic_slice_in_dim(b_g, mc, mb)
            cm = lax.dynamic_slice_in_dim(c_g, mc, mb)
            dm = lax.dynamic_slice_in_dim(d_g, mc, mb)
            sm = lax.dynamic_slice_in_dim(suma_g, mc, mb)
            y_m = lax.dynamic_slice_in_dim(Y_l, mc, mb)
            s2_m = lax.dynamic_slice_in_dim(S2_l, mc, mb)

            # device 0 opens every micro-batch from the neutral carry;
            # everyone else continues from the upstream block's carry
            carry_in = jax.tree.map(
                lambda nz, rc: jnp.where(me == 0, nz, rc),
                neutral, carry_recv,
            )
            carry_out, ld, qd, md = jax.vmap(run_block)(
                carry_in, am, bm, cm, dm, sm, y_m, s2_m)

            upd = lambda A, v: lax.dynamic_update_slice_in_dim(
                A, jnp.where(active, v,
                             lax.dynamic_slice_in_dim(A, mc, mb)), mc, 0)
            ld_acc = upd(ld_acc, ld)
            qd_acc = upd(qd_acc, qd)
            md_acc = upd(md_acc, md)
            # idle devices forward junk that no active device ever reads
            carry_send = jax.tree.map(
                lambda co_, rc: jnp.where(active, co_, rc),
                carry_out, carry_recv,
            )
            carry_next = jax.tree.map(
                lambda x: lax.ppermute(x, axis_name, perm), carry_send
            )
            return carry_next, ld_acc, qd_acc, md_acc

        zero_b = jnp.zeros((B,), dtype)
        state0 = (neutral, zero_b, zero_b, jnp.full((B,), jnp.inf, dtype))
        _, ld_acc, qd_acc, md_acc = lax.fori_loop(
            0, M + n_dev - 1, round_body, state0)

        logdet = lax.psum(ld_acc, axis_name)
        quad = lax.psum(qd_acc, axis_name)
        minD = lax.pmin(lax.stop_gradient(md_acc), axis_name)
        ll = -0.5 * logdet - 0.5 * N * jnp.log(2.0 * jnp.pi) - 0.5 * quad
        ok = (minD > 0) & jnp.isfinite(ll)
        return jnp.where(ok, ll, -jnp.inf)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name),
                  P(None, axis_name), P(None, axis_name),
                  P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(t, dt, Y, S2, a, b, c, d, suma)
