"""Hand-derived celerite adjoint as Pallas TPU kernels — fast gradients.

Why: reverse-mode through the `lax.scan` solver re-materializes the
(B, R, R) running state through HBM in both directions; measured
value_and_grad of the batched likelihood is ~15x the cost of the fused
Pallas forward (123 ms vs 8 ms at B=1024, N=489, J=20). Gradients
dominate every HMC-family sampler (NUTS / ChEES leapfrogs, MALA SMC
moves), so the adjoint is where the remaining speed lives — the same
conclusion as the reference ecosystem, whose celerite2 implements the
Foreman-Mackey (2018) backprop rules instead of taping the recursion
(reference src/celerite_solver.jl solves with ForwardDiff dual numbers,
test/test_likelihood.jl:55 — a (1+n_params)x forward-cost multiplier).

Scheme (all per lane = per chain, J rows per half, halves 0/1):

forward step m (ops/pallas_celerite._fused_kernel, T made explicit):
    T^{eh}_m = S^{eh}_{m-1} + D_{m-1} W^e_{m-1} (W^h_{m-1})^T
    S^{eh}_m = (ec_m ec_m^T) o T^{eh}_m
    q^e_m    = sum_h S^{eh}_m U^h_m          (S^{10} = (S^{01})^T)
    D_m      = suma + s2_m - sum_e U^e_m . q^e_m
    W^e_m    = (V^e_m - q^e_m) / D_m
    pre^e_m  = f^e_{m-1} + W^e_{m-1} zp_{m-1}
    f^e_m    = ec_m o pre^e_m
    zp_m     = y_m - sum_e U^e_m . f^e_m
    ll      += -1/2 (log D_m + zp_m^2 / D_m)

The augmented forward stores per step: W^e, pre^e, D, zp, plus a T
checkpoint every KC steps. The backward sweeps time in reverse; within
each KC-chunk it first re-runs the T recursion from the checkpoint
(T_start is stored directly, so no cross-chunk row is ever needed),
then applies the exact reverse of every forward statement. Cotangents
that reference step-(m-1) values are *deferred*: the carry holds
Mbar = cotangent of T_{m+1} and cpre = cotangent of pre_{m+1}, both of
which are consumed at step m where W_m, D_m, zp_m are the current row.

Padded coefficient rows (J alignment) and padded lanes (B alignment)
provably carry exactly-zero adjoints by induction (U = 0 on padded rows
kills every seed), so host-side slicing of the outputs is exact.

Non-PD chains: the forward emits ll = -inf; their incoming cotangent is
zeroed in the wrapper, so this path returns ZERO gradients there (the
scan VJP returns NaN; samplers mask non-finite gradients either way).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .pallas_celerite import _exp_neg, _pad_axis

__all__ = ["fwd_aug_pallas", "bwd_pallas", "value_and_grad_tables",
           "auto_tiles", "fits_vmem"]


def auto_tiles(J):
    """(block_b, chunk, kc) sized so the backward fits VMEM.

    The dominant buffers scale with 3 * J8^2 * block_b * 4 bytes per
    stored T step (J8 = J rounded up to 8 sublanes): the backward keeps
    kc of them, the Mbar carry-in block + carry buffer, a
    double-buffered checkpoint block, and several live
    (J8, J8, block_b) temporaries. Empirically J8 <= 24 fits at 128
    lanes with kc = 4 (covers the reference's default n_components =
    20); beyond that gradients use the scan VJP.
    """
    J8 = -(-J // 8) * 8
    # kc trades the backward's Tst recompute store (kc * 3 J8^2 *
    # block_b * 4 bytes of VMEM) against checkpoint HBM (one 3 J8^2
    # row per kc steps): small J affords long kc chunks, J8 = 24 needs
    # kc = 4 now that the segmented kernels' carry-in blocks cost
    # ~0.9 MB of the 16 MB scoped-vmem budget.
    if J8 <= 8:
        return 128, 16, 8
    if J8 <= 16:
        return 128, 8, 8
    if J8 <= 24:
        return 128, 8, 4
    # larger J: the kc T-store + carries + live temporaries exceed the
    # 16 MB VMEM (lane blocks must stay multiples of 128, so narrowing
    # the batch tile is not an option, and shrinking kc multiplies the
    # checkpoint HBM). batched_loglike falls back to the scan VJP.
    return None


def fits_vmem(J, block_b=None, n=None, batch=None) -> bool:
    """False when no tiling fits VMEM/HBM (fall back to the scan VJP).

    Beyond the VMEM tile check (J-dependent), the augmented forward
    saves per-step tables of ~(4 J8 + 2) * B * N floats plus the kc
    checkpoint blocks in HBM; with ``n``/``batch`` given, require that
    footprint under a conservative 6 GB budget (v5e has 16 GB HBM, but
    the backward materializes several table-sized temporaries). Long-N
    or huge-batch gradients use the checkpointed scan VJP instead
    (ops/celerite.py _factor) — same adjoint, O(sqrt(N)) memory.
    """
    tiles = auto_tiles(J)
    if tiles is None:
        return False
    # NOTE r4: there is no N compile limit anymore — the r3 remote-
    # compiler blowup above N~4096 is sidestepped by chaining <=SEG_STEPS
    # launches with carried state (see fwd_aug_pallas). The only gate
    # left is the HBM footprint of the residual tables below.
    if n is not None and batch is not None:
        blk, chunk, kc = tiles
        J8 = -(-J // 8) * 8
        # allocations happen at the PADDED lane width (the kernel tiles
        # the batch to block_b lanes): B=64 still allocates 128 lanes
        bp = -(-batch // blk) * blk
        tables = 4.0 * bp * n * (4 * J8 + 2)
        # one T checkpoint (3 J8^2 floats/lane) every kc steps
        ckpts = 4.0 * bp * (n / kc) * 3 * J8 * J8
        if tables + ckpts > 10e9:
            return False
    return True

_LOG2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# augmented forward
# ---------------------------------------------------------------------------

def _fwd_aug_kernel(n_steps, chunk, kc, per_lane_t,
                    a_ref, b_ref, c_ref, d_ref, t_ref, dt_ref, y_ref, s2_ref,
                    suma_ref, nv_ref, sin_ref, fwin_ref, accin_ref,
                    out_ref, w0_ref, w1_ref, p0_ref, p1_ref, dD_ref, zp_ref,
                    tcp_ref, sout_ref, fwout_ref, accout_ref):
    from jax import lax
    from jax.experimental import pallas as pl

    # the running (S, fW, acc) state lives directly in the carry-out
    # refs (their block is revisited across the whole time grid), so no
    # scratch duplicates exist — VMEM is the binding constraint here
    S, fW, acc = sout_ref, fwout_ref, accout_ref

    i_n = pl.program_id(1)
    num_n = pl.num_programs(1)

    @pl.when(i_n == 0)
    def _init():
        # carry-in: the (S, fW, acc) state at this segment's first step
        # (all-zeros with acc[4] = +inf for a from-scratch run) — lets
        # long series run as a chain of <=SEG-step kernel launches
        S[...] = sin_ref[...]
        fW[...] = fwin_ref[...]
        acc[...] = accin_ref[...]

    av = a_ref[...]
    bv = b_ref[...]
    cv = c_ref[...]
    dv = d_ref[...]
    suma = suma_ref[0, :]
    nvalid = nv_ref[0, :]

    def step(k, _):
        g = i_n * chunk + k
        live = (g < nvalid).astype(suma.dtype)  # (Bblk,)
        if per_lane_t:
            tn = t_ref[0, k, :]
            dtn = dt_ref[0, k, :]
        else:
            tn = t_ref[i_n, k]
            dtn = dt_ref[i_n, k]
        yn = y_ref[0, k, :]
        s2n = s2_ref[0, k, :]

        co = jnp.cos(dv * tn)
        si = jnp.sin(dv * tn)
        U0 = av * co + bv * si
        U1 = av * si - bv * co
        ec = _exp_neg(cv * dtn)

        f0, f1, W0p, W1p = fW[0], fW[1], fW[2], fW[3]
        D_prev = acc[0, :]
        zp_prev = acc[1, :]

        ee = ec[:, None, :] * ec[None, :, :]
        Wd0 = W0p * D_prev[None, :]
        Wd1 = W1p * D_prev[None, :]
        T00 = S[0] + Wd0[:, None, :] * W0p[None, :, :]
        T01 = S[1] + Wd0[:, None, :] * W1p[None, :, :]
        T11 = S[2] + Wd1[:, None, :] * W1p[None, :, :]

        @pl.when(k % kc == 0)
        def _ckpt():
            tcp_ref[k // kc, 0] = T00
            tcp_ref[k // kc, 1] = T01
            tcp_ref[k // kc, 2] = T11

        S00 = ee * T00
        S01 = ee * T01
        S11 = ee * T11
        SU0 = jnp.sum(S00 * U0[None, :, :], axis=1) + jnp.sum(
            S01 * U1[None, :, :], axis=1
        )
        SU1 = jnp.sum(S01 * U0[:, None, :], axis=0) + jnp.sum(
            S11 * U1[None, :, :], axis=1
        )
        Dn = suma + s2n - jnp.sum(U0 * SU0, axis=0) - jnp.sum(U1 * SU1, axis=0)
        W0n = (co - SU0) / Dn[None, :]
        W1n = (si - SU1) / Dn[None, :]

        pre0 = f0 + W0p * zp_prev[None, :]
        pre1 = f1 + W1p * zp_prev[None, :]
        f0n = ec * pre0
        f1n = ec * pre1
        zpn = yn - jnp.sum(U0 * f0n, axis=0) - jnp.sum(U1 * f1n, axis=0)

        w0_ref[k] = W0n
        w1_ref[k] = W1n
        p0_ref[k] = pre0
        p1_ref[k] = pre1
        dD_ref[0, k, :] = Dn
        zp_ref[0, k, :] = zpn

        S[0] = S00
        S[1] = S01
        S[2] = S11
        fW[0], fW[1], fW[2], fW[3] = f0n, f1n, W0n, W1n
        acc[0, :] = Dn
        acc[1, :] = zpn
        # Kahan-compensated accumulation (comp rows 5/6), matching the
        # no-grad forward kernels
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

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(i_n == num_n - 1)
    def _finish():
        # nvalid here is segment-local; ll is only meaningful on the
        # last segment of a chain (the wrapper recomputes it from the
        # carried accumulators in segmented mode)
        ll = -0.5 * (acc[2, :] + acc[3, :] + nvalid * _LOG2PI)
        ok = (acc[4, :] > 0) & jnp.isfinite(ll)
        out_ref[0, :] = jnp.where(ok, ll, -jnp.inf)
        # (S, fW, acc) already live in the carry-out refs


def _prep(a, b, c, d, t, y, sigma2, block_b, chunk, dt_in=None):
    """Shared padding/layout for the fwd-aug and bwd wrappers.

    ``dt_in`` (optional, (N-1,)): externally supplied spacings (see
    ops.celerite.build_uv) — used verbatim instead of diff(t)."""
    B, J = a.shape
    N = t.shape[0]
    J8 = -(-J // 8) * 8
    a = _pad_axis(a, J8, 1)
    b = _pad_axis(b, J8, 1)
    c = _pad_axis(c, J8, 1)
    d = _pad_axis(d, J8, 1)
    Bp = -(-B // block_b) * block_b
    a, b, c, d = (_pad_axis(x, Bp, 0) for x in (a, b, c, d))
    y = _pad_axis(y, Bp, 0)
    sigma2 = _pad_axis(sigma2, Bp, 0, fill=1.0)
    Np = -(-N // chunk) * chunk
    Nc = Np // chunk
    t_pad = jnp.pad(t, (0, Np - N), mode="edge") if Np > N else t
    if dt_in is None:
        dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t_pad)])
    else:
        dt = jnp.concatenate(
            [jnp.zeros((1,), t.dtype), jnp.asarray(dt_in, t.dtype),
             jnp.zeros((Np - N,), t.dtype)])
    tsm = t_pad.reshape(Nc, chunk)
    dtsm = dt.reshape(Nc, chunk)
    yT = _pad_axis(y.T, Np, 0)
    s2T = _pad_axis(sigma2.T, Np, 0, fill=1.0)
    suma = jnp.sum(a, axis=1)[None, :]
    return (a.T, b.T, c.T, d.T, tsm, dtsm, yT, s2T, suma,
            B, J, N, J8, Bp, Np, Nc)


def _prep_multi(a, b, c, d, T, y, sigma2, n_valid, block_b, chunk,
                dt_in=None):
    """Padding/layout when every lane has its own time grid.

    ``dt_in`` (optional, (B, N-1)): per-lane spacings computed in host
    f64 (see ops.celerite.build_uv) — used verbatim instead of
    diff(T)."""
    B, J = a.shape
    N = T.shape[-1]
    dtype = y.dtype
    J8 = -(-J // 8) * 8
    a = _pad_axis(a, J8, 1)
    b = _pad_axis(b, J8, 1)
    c = _pad_axis(c, J8, 1)
    d = _pad_axis(d, J8, 1)
    Bp = -(-B // block_b) * block_b
    a, b, c, d = (_pad_axis(x, Bp, 0) for x in (a, b, c, d))
    T = _pad_axis(T, Bp, 0)
    y = _pad_axis(y, Bp, 0)
    sigma2 = _pad_axis(sigma2, Bp, 0, fill=1.0)
    if n_valid is None:
        nv = jnp.full((1, Bp), N, dtype)
    else:
        nv = _pad_axis(jnp.asarray(n_valid, dtype)[None, :], Bp, 1)
    Np = -(-N // chunk) * chunk
    Nc = Np // chunk
    Tp = jnp.pad(T, ((0, 0), (0, Np - N)), mode="edge") if Np > N else T
    if dt_in is None:
        dt = jnp.concatenate(
            [jnp.zeros((Bp, 1), dtype), jnp.diff(Tp, axis=1)], axis=1)
    else:
        dt = jnp.concatenate(
            [jnp.zeros((Bp, 1), dtype),
             _pad_axis(_pad_axis(jnp.asarray(dt_in, dtype), Bp, 0),
                       Np - 1, 1)], axis=1)
    tT = Tp.T.reshape(Nc, chunk, Bp)
    dtT = dt.T.reshape(Nc, chunk, Bp)
    yT = _pad_axis(y.T, Np, 0).reshape(Nc, chunk, Bp)
    s2T = _pad_axis(sigma2.T, Np, 0, fill=1.0).reshape(Nc, chunk, Bp)
    suma = jnp.sum(a, axis=1)[None, :]
    return (a.T, b.T, c.T, d.T, tT, dtT, yT, s2T, suma, nv,
            B, J, N, J8, Bp, Np, Nc)


def _resolve_tiles(J, block_b, chunk, kc):
    if kc is None or chunk is None or block_b is None:
        tiles = auto_tiles(J)
        if tiles is None:
            raise ValueError(
                f"J={J} exceeds the adjoint kernels' VMEM envelope "
                "(J8 <= 24); use the scan VJP (batched_loglike handles this "
                "automatically via fits_vmem)")
        ab, ac, ak = tiles
        block_b = block_b or ab
        chunk = chunk or ac
        kc = kc or ak
    assert chunk % kc == 0
    return block_b, chunk, kc


# largest per-launch time extent (steps) the remote TPU compiler is
# verified to handle on the table-carrying adjoint kernels; longer
# series run as a chain of launches with the (S, fW, acc) state carried
# between them (exact — the recursion is sequential either way).
# Empirically the compiler limit tracks the number of BACKWARD grid
# steps (Np / kc <= ~512): r3's kc=8 kernels compiled at N=4096 and
# died at 8192; the r4 kc=4 kernels died at 4096 until this cap halved.
SEG_STEPS = 2048


def _segment_layout(Nc: int, chunk: int):
    """(n_seg, seg_chunks): balanced segments of <= SEG_STEPS steps."""
    n_seg = max(-(-(Nc * chunk) // SEG_STEPS), 1)
    seg_chunks = -(-Nc // n_seg)
    return n_seg, seg_chunks


def _pad_chunks(x, Nc2, fill, per_lane_edge=False):
    """Pad a (Nc, chunk[, Bp]) chunked table to Nc2 chunk rows."""
    Nc = x.shape[0]
    if Nc2 <= Nc:
        return x
    if per_lane_edge:
        pad = jnp.broadcast_to(x[-1:], (Nc2 - Nc,) + x.shape[1:])
    else:
        pad = jnp.full((Nc2 - Nc,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _fwd_aug_call(aT, bT, cT, dT, tsm, dtsm, yT, s2T, suma, nv_local,
                  carry, *, per_lane_t, chunk, kc, block_b, J8, Bp,
                  interpret):
    """One <= SEG_STEPS forward-augmented kernel launch with state carry."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = yT.dtype
    Nc = yT.shape[0]
    Np = Nc * chunk
    Ncp = Np // kc
    S_in, fW_in, acc_in = carry

    grid = (Bp // block_b, Nc)
    coef_spec = pl.BlockSpec((J8, block_b), lambda ib, iN: (0, ib))
    # per-step scalar rows travel as (Nc, chunk, Bp) with full-dim blocks
    # so any chunk (even < 8 sublanes) satisfies the tiling rules
    row_spec = pl.BlockSpec((1, chunk, block_b), lambda ib, iN: (iN, 0, ib))
    lane_spec = pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib))
    if per_lane_t:
        t_spec = row_spec
    else:
        t_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tabJ_spec = pl.BlockSpec((chunk, J8, block_b), lambda ib, iN: (iN, 0, ib))
    tcp_spec = pl.BlockSpec(
        (chunk // kc, 3, J8, J8, block_b), lambda ib, iN: (iN, 0, 0, 0, ib)
    )
    scarry_spec = pl.BlockSpec(
        (3, J8, J8, block_b), lambda ib, iN: (0, 0, 0, ib))
    fwcarry_spec = pl.BlockSpec((4, J8, block_b), lambda ib, iN: (0, 0, ib))
    acarry_spec = pl.BlockSpec((8, block_b), lambda ib, iN: (0, ib))

    kern = functools.partial(_fwd_aug_kernel, 0, chunk, kc, per_lane_t)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    except Exception:
        compiler_params = None

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[coef_spec] * 4 + [t_spec, t_spec, row_spec, row_spec,
                                    lane_spec, lane_spec,
                                    scarry_spec, fwcarry_spec, acarry_spec],
        out_specs=[
            pl.BlockSpec((1, block_b), lambda ib, iN: (0, ib)),
            tabJ_spec, tabJ_spec, tabJ_spec, tabJ_spec,
            row_spec, row_spec, tcp_spec,
            scarry_spec, fwcarry_spec, acarry_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((Np, J8, Bp), dtype),
            jax.ShapeDtypeStruct((Np, J8, Bp), dtype),
            jax.ShapeDtypeStruct((Np, J8, Bp), dtype),
            jax.ShapeDtypeStruct((Np, J8, Bp), dtype),
            jax.ShapeDtypeStruct((Nc, chunk, Bp), dtype),
            jax.ShapeDtypeStruct((Nc, chunk, Bp), dtype),
            jax.ShapeDtypeStruct((Ncp, 3, J8, J8, Bp), dtype),
            jax.ShapeDtypeStruct((3, J8, J8, Bp), dtype),
            jax.ShapeDtypeStruct((4, J8, Bp), dtype),
            jax.ShapeDtypeStruct((8, Bp), dtype),
        ],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(aT, bT, cT, dT, tsm, dtsm, yT, s2T, suma, nv_local,
      S_in, fW_in, acc_in)
    ll, W0t, W1t, P0t, P1t, Dt, ZPt, Tcp, S_out, fW_out, acc_out = outs
    residuals = (W0t, W1t, P0t, P1t,
                 Dt.reshape(Np, Bp), ZPt.reshape(Np, Bp), Tcp)
    return ll, residuals, (S_out, fW_out, acc_out)


def _neutral_carry(J8, Bp, dtype):
    acc0 = jnp.zeros((8, Bp), dtype).at[4, :].set(jnp.inf)
    return (jnp.zeros((3, J8, J8, Bp), dtype),
            jnp.zeros((4, J8, Bp), dtype), acc0)


def fwd_aug_pallas(a, b, c, d, t, y, sigma2, n_valid=None, dt=None,
                   *, block_b: int = None, chunk: int = None, kc: int = None,
                   interpret: bool = False):
    """Fused forward that also emits the backward's residual tables.

    ``t`` may be (N,) shared or (B, N) per-lane (with optional float
    ``n_valid`` (B,) ragged lengths). Returns (ll (B,), residuals) in
    padded layout ready for :func:`bwd_pallas`.

    Series longer than ``SEG_STEPS`` run as a chain of kernel launches
    with the running (S, fW, accumulator) state carried between them —
    numerically identical to one launch (the recursion is sequential),
    but each launch stays inside the TPU compiler's verified envelope,
    so the hand adjoint now covers any N the residual tables fit in HBM
    (the O(N)-for-any-N claim, reference docs/src/explanation.md:50-52).
    In that case ``residuals`` is a tuple of per-segment tuples.
    """
    block_b, chunk, kc = _resolve_tiles(a.shape[1], block_b, chunk, kc)
    per_lane_t = t.ndim == 2
    dtype = y.dtype
    if per_lane_t:
        (aT, bT, cT, dT, tsm, dtsm, yT, s2T, suma, nv,
         B, J, N, J8, Bp, Np, Nc) = _prep_multi(
            a, b, c, d, t, y, sigma2, n_valid, block_b, chunk, dt_in=dt)
    else:
        (aT, bT, cT, dT, tsm, dtsm, yT, s2T, suma,
         B, J, N, J8, Bp, Np, Nc) = _prep(
            a, b, c, d, t, y, sigma2, block_b, chunk, dt_in=dt)
        yT = yT.reshape(Nc, chunk, Bp)
        s2T = s2T.reshape(Nc, chunk, Bp)
        nv = jnp.full((1, Bp), N, dtype)

    n_seg, seg_chunks = _segment_layout(Nc, chunk)
    call = functools.partial(
        _fwd_aug_call, per_lane_t=per_lane_t, chunk=chunk, kc=kc,
        block_b=block_b, J8=J8, Bp=Bp, interpret=interpret)

    if n_seg == 1:
        ll, residuals, _ = call(
            aT, bT, cT, dT, tsm, dtsm, yT, s2T, suma, nv,
            _neutral_carry(J8, Bp, dtype))
        return ll[0, :B], residuals

    # ---- segmented: equalize segment lengths, then chain launches as
    # a lax.scan over stacked segments — ONE kernel in the loop body
    # instead of n_seg inlined copies, so the program size (and the
    # remote compiler) stays O(1) in N (32 inlined launches at N=2^16
    # exceeded the compile service)
    Nc2 = n_seg * seg_chunks
    tsm = _pad_chunks(tsm, Nc2, 0.0, per_lane_edge=True)
    dtsm = _pad_chunks(dtsm, Nc2, 0.0)
    yT = _pad_chunks(yT, Nc2, 0.0)
    s2T = _pad_chunks(s2T, Nc2, 1.0)
    Lseg = seg_chunks * chunk

    def stack_seg(x):
        return x.reshape((n_seg, seg_chunks) + x.shape[1:])

    nv_locals = jnp.stack([
        jnp.clip(nv - s * Lseg, 0.0, float(Lseg)) for s in range(n_seg)])

    def seg_body(carry, xs):
        tsm_s, dtsm_s, yT_s, s2T_s, nv_s = xs
        _, res_s, carry = call(
            aT, bT, cT, dT, tsm_s, dtsm_s, yT_s, s2T_s, suma, nv_s,
            carry)
        return carry, res_s

    carry, residuals = jax.lax.scan(
        seg_body, _neutral_carry(J8, Bp, dtype),
        (stack_seg(tsm), stack_seg(dtsm), stack_seg(yT), stack_seg(s2T),
         nv_locals))
    acc_out = carry[2]
    ll = -0.5 * (acc_out[2, :] + acc_out[3, :] + nv[0, :] * _LOG2PI)
    ok = (acc_out[4, :] > 0) & jnp.isfinite(ll)
    ll = jnp.where(ok, ll, -jnp.inf)
    # residuals: tuple of 7 arrays, each with a leading n_seg axis
    return ll[:B], residuals


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(n_steps, kc, per_lane_t,
                a_ref, b_ref, c_ref, d_ref, t_ref, dt_ref, suma_ref, g_ref,
                nv_ref, mbin_ref, cpin_ref,
                w0_ref, w1_ref, p0_ref, p1_ref, dD_ref, zp_ref, tcp_ref,
                ab_ref, bb_ref, cb_ref, db_ref, yb_ref, s2b_ref,
                tb_ref, dtb_ref, mbout_ref, cpout_ref,
                Tst, coef, acc):
    """One (batch-block, reverse-KC-chunk) grid step of the adjoint.

    Scratch: Tst (KC, 3, J, J, B) recomputed T blocks for this chunk;
    Mb (3, J, J, B) carried cotangent of T_{m+1}; cpre (2, J, B) carried
    cotangent of pre_{m+1}; coef (4, J, B) accumulated [abar, bbar,
    cbar, dbar]; acc (8, B) rows [sumabar, ...spare].

    ``mbin``/``cpin`` seed the Mbar/cpre carry (zeros for the last time
    segment; the downstream segment's carry-out otherwise) and
    ``mbout``/``cpout`` emit it after this segment's first time step —
    the backward mirror of the forward's segmented state chain.
    """
    from jax import lax
    from jax.experimental import pallas as pl

    # the (Mbar, cpre) cotangent carry lives directly in the carry-out
    # refs (revisited block across the reverse grid) — no scratch copy
    Mb, cpre = mbout_ref, cpout_ref

    i_r = pl.program_id(1)            # 0 .. Np/kc - 1, reverse order
    num_r = pl.num_programs(1)
    base = (num_r - 1 - i_r) * kc     # global index of this chunk's step 0
    chunk_idx = base // kc            # time index of this chunk (SMEM tables)

    @pl.when(i_r == 0)
    def _init():
        Mb[...] = mbin_ref[...]
        cpre[...] = cpin_ref[...]
        coef[...] = jnp.zeros_like(coef)
        acc[...] = jnp.zeros_like(acc)

    av = a_ref[...]
    bv = b_ref[...]
    cv = c_ref[...]
    dv = d_ref[...]
    suma = suma_ref[0, :]
    gl = g_ref[0, :]
    nvalid = nv_ref[0, :]

    # ---- phase 1: recompute T_m for m in [base, base+kc) from checkpoint
    def fwd_step(k, _):
        @pl.when(k == 0)
        def _first():
            Tst[0, 0] = tcp_ref[0, 0]
            Tst[0, 1] = tcp_ref[0, 1]
            Tst[0, 2] = tcp_ref[0, 2]

        @pl.when(k > 0)
        def _rest():
            km1 = k - 1
            if per_lane_t:
                dtn = dt_ref[0, km1, :]
            else:
                dtn = dt_ref[chunk_idx, km1]
            ec = _exp_neg(cv * dtn)
            ee = ec[:, None, :] * ec[None, :, :]
            S00 = ee * Tst[km1, 0]
            S01 = ee * Tst[km1, 1]
            S11 = ee * Tst[km1, 2]
            W0 = w0_ref[km1]
            W1 = w1_ref[km1]
            Dm = dD_ref[0, km1, :]
            Wd0 = W0 * Dm[None, :]
            Wd1 = W1 * Dm[None, :]
            Tst[k, 0] = S00 + Wd0[:, None, :] * W0[None, :, :]
            Tst[k, 1] = S01 + Wd0[:, None, :] * W1[None, :, :]
            Tst[k, 2] = S11 + Wd1[:, None, :] * W1[None, :, :]
        return 0

    lax.fori_loop(0, kc, fwd_step, 0)

    # ---- phase 2: reverse sweep k = kc-1 .. 0
    def rev_step(j, _):
        k = kc - 1 - j
        g = base + k
        live = (g < nvalid).astype(suma.dtype)  # (Bblk,)
        if per_lane_t:
            tn = t_ref[0, k, :]
            dtn = dt_ref[0, k, :]
        else:
            tn = t_ref[chunk_idx, k]
            dtn = dt_ref[chunk_idx, k]

        co = jnp.cos(dv * tn)
        si = jnp.sin(dv * tn)
        U0 = av * co + bv * si
        U1 = av * si - bv * co
        ec = _exp_neg(cv * dtn)
        ee = ec[:, None, :] * ec[None, :, :]

        W0 = w0_ref[k]
        W1 = w1_ref[k]
        pre0 = p0_ref[k]
        pre1 = p1_ref[k]
        Dm = dD_ref[0, k, :]
        zpm = zp_ref[0, k, :]
        T00 = Tst[k, 0]
        T01 = Tst[k, 1]
        T11 = Tst[k, 2]
        q0 = co - W0 * Dm[None, :]
        q1 = si - W1 * Dm[None, :]
        f0m = ec * pre0
        f1m = ec * pre1

        M00 = Mb[0]
        M01 = Mb[1]
        M11 = Mb[2]
        cp0 = cpre[0]
        cp1 = cpre[1]

        # T_{m+1} = S_m + D_m W_m W_m^T consumption
        M00W0 = jnp.sum(M00 * W0[None, :, :], axis=1)   # M00 @ W0
        M00tW0 = jnp.sum(M00 * W0[:, None, :], axis=0)  # M00^T @ W0
        M01W1 = jnp.sum(M01 * W1[None, :, :], axis=1)
        M01tW0 = jnp.sum(M01 * W0[:, None, :], axis=0)
        M11W1 = jnp.sum(M11 * W1[None, :, :], axis=1)
        M11tW1 = jnp.sum(M11 * W1[:, None, :], axis=0)
        Dbar = (
            jnp.sum(W0 * (M00W0 + M01W1), axis=0)
            + jnp.sum(W1 * M11W1, axis=0)
        )
        W0bar = (M00W0 + M00tW0 + M01W1) * Dm[None, :]
        W1bar = (M11W1 + M11tW1 + M01tW0) * Dm[None, :]

        # pre_{m+1} = f_m + W_m zp_m consumption
        f0bar = cp0
        f1bar = cp1
        W0bar = W0bar + cp0 * zpm[None, :]
        W1bar = W1bar + cp1 * zpm[None, :]
        zpbar = jnp.sum(cp0 * W0, axis=0) + jnp.sum(cp1 * W1, axis=0)

        # loss seeds (scaled by the incoming cotangent g_b)
        Dbar = Dbar - 0.5 * live * gl * (1.0 / Dm - (zpm * zpm) / (Dm * Dm))
        zpbar = zpbar - live * gl * zpm / Dm

        # zp = y - U0.f0 - U1.f1
        ybar = zpbar
        U0bar = -zpbar[None, :] * f0m
        U1bar = -zpbar[None, :] * f1m
        f0bar = f0bar - zpbar[None, :] * U0
        f1bar = f1bar - zpbar[None, :] * U1

        # f = ec o pre
        ecbar = f0bar * pre0 + f1bar * pre1
        cpre[0] = ec * f0bar
        cpre[1] = ec * f1bar

        # W = (V - q) / D
        cobar = W0bar / Dm[None, :]
        sibar = W1bar / Dm[None, :]
        q0bar = -W0bar / Dm[None, :]
        q1bar = -W1bar / Dm[None, :]
        Dbar = Dbar - (
            jnp.sum(W0bar * W0, axis=0) + jnp.sum(W1bar * W1, axis=0)
        ) / Dm

        # D = suma + s2 - U0.q0 - U1.q1
        s2bar = Dbar
        acc[0, :] = acc[0, :] + Dbar
        U0bar = U0bar - Dbar[None, :] * q0
        U1bar = U1bar - Dbar[None, :] * q1
        q0bar = q0bar - Dbar[None, :] * U0
        q1bar = q1bar - Dbar[None, :] * U1

        # q0 = S00 U0 + S01 U1 ; q1 = S01^T U0 + S11 U1
        S00 = ee * T00
        S01 = ee * T01
        S11 = ee * T11
        Sb00 = M00 + q0bar[:, None, :] * U0[None, :, :]
        Sb01 = M01 + q0bar[:, None, :] * U1[None, :, :] \
                   + U0[:, None, :] * q1bar[None, :, :]
        Sb11 = M11 + q1bar[:, None, :] * U1[None, :, :]
        U0bar = U0bar + jnp.sum(S00 * q0bar[:, None, :], axis=0) \
                      + jnp.sum(S01 * q1bar[None, :, :], axis=1)
        U1bar = U1bar + jnp.sum(S01 * q0bar[:, None, :], axis=0) \
                      + jnp.sum(S11 * q1bar[:, None, :], axis=0)

        # S = ee o T : ec cotangent and carry-out Mbar = ee o Sbar
        A00 = Sb00 * T00
        A01 = Sb01 * T01
        A11 = Sb11 * T11
        ecbar = ecbar + (
            jnp.sum(A00 * ec[None, :, :], axis=1)
            + jnp.sum(A00 * ec[:, None, :], axis=0)
            + jnp.sum(A01 * ec[None, :, :], axis=1)
            + jnp.sum(A01 * ec[:, None, :], axis=0)
            + jnp.sum(A11 * ec[None, :, :], axis=1)
            + jnp.sum(A11 * ec[:, None, :], axis=0)
        )
        Mb[0] = ee * Sb00
        Mb[1] = ee * Sb01
        Mb[2] = ee * Sb11

        # coefficient chain rule
        # U0 = a co + b si ; U1 = a si - b co ; V0 = co ; V1 = si
        coef[0] = coef[0] + U0bar * co + U1bar * si
        coef[1] = coef[1] + U0bar * si - U1bar * co
        cobar = cobar + U0bar * av - U1bar * bv
        sibar = sibar + U0bar * bv + U1bar * av
        # co = cos(d t), si = sin(d t) ; ec = exp(-c dt)
        dchain = -cobar * si + sibar * co
        coef[3] = coef[3] + tn * dchain
        coef[2] = coef[2] - dtn * ecbar * ec

        # per-step outputs
        yb_ref[0, k, :] = ybar
        s2b_ref[0, k, :] = s2bar
        tb_ref[0, k, :] = jnp.sum(dv * dchain, axis=0)
        dtb_ref[0, k, :] = -jnp.sum(cv * ecbar * ec, axis=0)
        return 0

    lax.fori_loop(0, kc, rev_step, 0)

    @pl.when(i_r == num_r - 1)
    def _finish():
        # suma = sum_j a_j feeds D at every step
        ab_ref[...] = coef[0] + acc[0, :][None, :]
        bb_ref[...] = coef[1]
        cb_ref[...] = coef[2]
        db_ref[...] = coef[3]
        # (Mbar, cpre) already live in the carry-out refs


def _bwd_call(aT, bT, cT, dT, tsm, dtsm, suma, gp, nv_local, residuals,
              mb_in, cp_in, *, per_lane_t, chunk, kc, block_b, J8, Bp,
              interpret):
    """One <= SEG_STEPS backward kernel launch with cotangent carry.

    ``tsm``/``dtsm`` arrive in the forward's (Nc, chunk[, Bp]) layout
    for this segment. Returns raw padded per-step outputs (the caller
    glues segments, folds the dt chain rule and un-pads).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W0t, W1t, P0t, P1t, Dt, ZPt, Tcp = residuals
    dtype = Dt.dtype
    Np = Dt.shape[0]
    num_r = Np // kc
    # the backward walks time in kc-sized chunks: re-tile the t/dt
    # tables so row chunk_idx == base // kc
    if per_lane_t:
        tsm = tsm.reshape(num_r, kc, Bp)
        dtsm = dtsm.reshape(num_r, kc, Bp)
    else:
        tsm = tsm.reshape(num_r, kc)
        dtsm = dtsm.reshape(num_r, kc)
    grid = (Bp // block_b, num_r)

    def rev(i):  # reverse chunk order
        return num_r - 1 - i

    coef_spec = pl.BlockSpec((J8, block_b), lambda ib, iR: (0, ib))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_spec = pl.BlockSpec((1, block_b), lambda ib, iR: (0, ib))
    rowk_spec = pl.BlockSpec((1, kc, block_b), lambda ib, iR: (rev(iR), 0, ib))
    tabk_spec = pl.BlockSpec((kc, J8, block_b), lambda ib, iR: (rev(iR), 0, ib))
    tcp_spec = pl.BlockSpec(
        (1, 3, J8, J8, block_b), lambda ib, iR: (rev(iR), 0, 0, 0, ib)
    )
    coefout_spec = pl.BlockSpec((J8, block_b), lambda ib, iR: (0, ib))
    t_spec = rowk_spec if per_lane_t else smem_spec
    mb_spec = pl.BlockSpec((3, J8, J8, block_b), lambda ib, iR: (0, 0, 0, ib))
    cp_spec = pl.BlockSpec((2, J8, block_b), lambda ib, iR: (0, 0, ib))

    kern = functools.partial(_bwd_kernel, 0, kc, per_lane_t)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    except Exception:
        compiler_params = None

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[coef_spec] * 4 + [t_spec, t_spec, lane_spec, lane_spec,
                                    lane_spec, mb_spec, cp_spec,
                                    tabk_spec, tabk_spec, tabk_spec, tabk_spec,
                                    rowk_spec, rowk_spec, tcp_spec],
        out_specs=[coefout_spec] * 4 + [rowk_spec, rowk_spec,
                                        rowk_spec, rowk_spec,
                                        mb_spec, cp_spec],
        out_shape=[jax.ShapeDtypeStruct((J8, Bp), dtype)] * 4
        + [jax.ShapeDtypeStruct((num_r, kc, Bp), dtype)] * 4
        + [jax.ShapeDtypeStruct((3, J8, J8, Bp), dtype),
           jax.ShapeDtypeStruct((2, J8, Bp), dtype)],
        scratch_shapes=[
            pltpu.VMEM((kc, 3, J8, J8, block_b), dtype),
            pltpu.VMEM((4, J8, block_b), dtype),
            pltpu.VMEM((8, block_b), dtype),
        ],
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(aT, bT, cT, dT, tsm, dtsm, suma, gp, nv_local, mb_in, cp_in,
      W0t, W1t, P0t, P1t,
      Dt.reshape(num_r, kc, Bp), ZPt.reshape(num_r, kc, Bp), Tcp)
    abar, bbar, cbar, dbar, ybar, s2bar, tbp, dtbp, mb_out, cp_out = outs
    return (abar, bbar, cbar, dbar,
            ybar.reshape(Np, Bp), s2bar.reshape(Np, Bp),
            tbp.reshape(Np, Bp), dtbp.reshape(Np, Bp), mb_out, cp_out)


def bwd_pallas(a, b, c, d, t, y, sigma2, residuals, g, n_valid=None,
               dt=None,
               *, block_b: int = None, chunk: int = None, kc: int = None,
               interpret: bool = False):
    """Adjoint of the batched likelihood: returns cotangents for
    (a, b, c, d, t, y, sigma2) given per-chain output cotangents ``g``.

    ``t`` may be (N,) shared across the batch or (B, N) per-lane with
    optional ragged lengths ``n_valid`` (B,), mirroring
    :func:`fwd_aug_pallas`. With per-lane ``t`` the returned ``tbar``
    is (B, N); with shared ``t`` it is (N,) (summed over lanes).

    Long series: when the forward was segmented (``residuals`` is a
    tuple of per-segment tuples), the backward sweeps the segments in
    reverse, carrying the (Mbar, cpre) cotangent state between kernel
    launches; coefficient gradients sum over segments and the dt chain
    rule is folded once globally.
    """
    block_b, chunk, kc = _resolve_tiles(a.shape[1], block_b, chunk, kc)
    per_lane_t = t.ndim == 2
    dtype = y.dtype
    if per_lane_t:
        (aT, bT, cT, dT, tsm, dtsm, _yT, _s2T, suma, nv,
         B, J, N, J8, Bp, Np, Nc) = _prep_multi(
            a, b, c, d, t, y, sigma2, n_valid, block_b, chunk, dt_in=dt)
    else:
        (aT, bT, cT, dT, tsm, dtsm, _yT, _s2T, suma,
         B, J, N, J8, Bp, Np, Nc) = _prep(
            a, b, c, d, t, y, sigma2, block_b, chunk, dt_in=dt)
        nv = jnp.full((1, Bp), N, dtype)
    gp = _pad_axis(jnp.asarray(g, dtype)[None, :], Bp, 1)
    call = functools.partial(
        _bwd_call, per_lane_t=per_lane_t, chunk=chunk, kc=kc,
        block_b=block_b, J8=J8, Bp=Bp, interpret=interpret)

    segmented = residuals[0].ndim == 4  # leading n_seg axis (fwd scan)
    mb0 = jnp.zeros((3, J8, J8, Bp), dtype)
    cp0 = jnp.zeros((2, J8, Bp), dtype)
    if not segmented:
        (abar, bbar, cbar, dbar, ybar, s2bar, tbp, dtbp, _, _) = call(
            aT, bT, cT, dT, tsm, dtsm, suma, gp, nv, residuals, mb0, cp0)
    else:
        # reverse lax.scan over segments (mirrors the forward's scan):
        # one kernel in the loop body, cotangent carry between launches,
        # coefficient gradients summed in the carry
        n_seg = residuals[0].shape[0]
        _, seg_chunks = _segment_layout(Nc, chunk)
        assert n_seg == -(-Nc // seg_chunks)
        Nc2 = n_seg * seg_chunks
        tsm2 = _pad_chunks(tsm, Nc2, 0.0, per_lane_edge=True)
        dtsm2 = _pad_chunks(dtsm, Nc2, 0.0)
        Lseg = seg_chunks * chunk

        def stack_seg(x):
            return x.reshape((n_seg, seg_chunks) + x.shape[1:])

        nv_locals = jnp.stack([
            jnp.clip(nv - s * Lseg, 0.0, float(Lseg))
            for s in range(n_seg)])
        coef0 = jnp.zeros((J8, Bp), dtype)

        def seg_body(carry, xs):
            mb, cp, ab_acc, bb_acc, cb_acc, db_acc = carry
            tsm_s, dtsm_s, nv_s, res_s = xs
            (ab_s, bb_s, cb_s, db_s, yb_s, s2b_s, tb_s, dtb_s,
             mb, cp) = call(
                aT, bT, cT, dT, tsm_s, dtsm_s, suma, gp, nv_s, res_s,
                mb, cp)
            carry = (mb, cp, ab_acc + ab_s, bb_acc + bb_s,
                     cb_acc + cb_s, db_acc + db_s)
            return carry, (yb_s, s2b_s, tb_s, dtb_s)

        carry, rows = jax.lax.scan(
            seg_body, (mb0, cp0, coef0, coef0, coef0, coef0),
            (stack_seg(tsm2), stack_seg(dtsm2), nv_locals, residuals),
            reverse=True,
        )
        _, _, abar, bbar, cbar, dbar = carry
        yb_s, s2b_s, tb_s, dtb_s = rows  # (n_seg, Np_seg, Bp)
        ybar = yb_s.reshape(-1, Bp)
        s2bar = s2b_s.reshape(-1, Bp)
        tbp = tb_s.reshape(-1, Bp)
        dtbp = dtb_s.reshape(-1, Bp)

    # un-pad and fold the time partials:
    # t appears via co/si at step m and via dt_m = t_m - t_{m-1},
    # dt_{m+1} = t_{m+1} - t_m  =>  tbar_m += dtbar_m - dtbar_{m+1}
    abar = abar.T[:B, :J]
    bbar = bbar.T[:B, :J]
    cbar = cbar.T[:B, :J]
    dbar = dbar.T[:B, :J]
    if per_lane_t:
        # per-lane time grids: tbar is (B, N)
        dtbp = dtbp.at[N:].set(0.0)
        dtb = jnp.concatenate(
            [dtbp, jnp.zeros((1, Bp), dtype)])  # guard m = N-1
        tbar = (tbp[:N] + dtb[:N] - dtb[1:N + 1]).T[:B]
    else:
        tb = jnp.sum(tbp[:N], axis=1)
        dtb = jnp.sum(dtbp, axis=1)
        dtb = dtb.at[N:].set(0.0)
        dtb = jnp.concatenate([dtb, jnp.zeros((1,), dtype)])  # guard m = N-1
        tbar = tb + dtb[:N] - dtb[1:N + 1]
    ybar = ybar.T[:B, :N]
    s2bar = s2bar.T[:B, :N]
    return abar, bbar, cbar, dbar, tbar, ybar, s2bar


def value_and_grad_tables(a, b, c, d, t, y, sigma2, **kw):
    """Convenience: ll and full gradients through the Pallas adjoint."""
    ll, res = fwd_aug_pallas(a, b, c, d, t, y, sigma2, **kw)
    g = jnp.where(jnp.isfinite(ll), jnp.ones_like(ll), jnp.zeros_like(ll))
    grads = bwd_pallas(a, b, c, d, t, y, sigma2, res, g, **kw)
    return ll, grads
