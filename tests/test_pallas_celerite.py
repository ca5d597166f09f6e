"""Pallas batched-likelihood kernel vs the lax.scan oracle.

The kernel (ops/pallas_celerite.py) runs in Pallas interpret mode on the
CPU test platform — same lowering semantics, Python-speed execution —
so these pin its algebra; the real-TPU timing/parity is exercised by
bench.py and the verify drive. Covers the padding edges (J not a
multiple of 8, B not a multiple of the lane block, N not a multiple of
the chunk) and the custom_vjp gradient path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu.ops.pallas_celerite import (
    batched_loglike,
    batched_loglike_pallas,
    batched_loglike_pallas_fused,
    _scan_batched,
)


def _problem(B, J, N, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    t = jnp.sort(jax.random.uniform(ks[6], (N,)) * 100)
    a = jax.random.uniform(ks[0], (B, J)) * 0.5 + 0.1
    b = jax.random.uniform(ks[1], (B, J)) * 0.2
    c = jax.random.uniform(ks[2], (B, J)) * 0.3 + 0.05
    d = jax.random.uniform(ks[3], (B, J)) * 0.4
    y = jax.random.normal(ks[4], (B, N))
    s2 = jax.random.uniform(ks[5], (B, N)) * 0.1 + 0.05
    return a, b, c, d, t, y, s2


@pytest.mark.parametrize("B,J,N,chunk", [
    (5, 3, 70, 16),     # everything unaligned
    (4, 8, 64, 32),     # everything aligned
    (130, 5, 33, 16),   # B just over one lane block
])
def test_fused_kernel_matches_scan(B, J, N, chunk):
    a, b, c, d, t, y, s2 = _problem(B, J, N)
    ref = _scan_batched(a, b, c, d, t, y, s2)
    out = batched_loglike_pallas_fused(
        a, b, c, d, t, y, s2, chunk=chunk, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)


def test_streaming_kernel_matches_scan():
    a, b, c, d, t, y, s2 = _problem(6, 4, 50, seed=3)
    ref = _scan_batched(a, b, c, d, t, y, s2)
    out = batched_loglike_pallas(a, b, c, d, t, y, s2, chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)


def test_batched_loglike_gradient_matches_scan():
    """custom_vjp backward == direct scan gradient (it re-runs the scan)."""
    a, b, c, d, t, y, s2 = _problem(3, 2, 40, seed=1)

    def loss_kernel(a, b, c, d, y, s2):
        return jnp.sum(batched_loglike(a, b, c, d, t, y, s2))

    def loss_scan(a, b, c, d, y, s2):
        return jnp.sum(_scan_batched(a, b, c, d, t, y, s2))

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(a, b, c, d, y, s2)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2, 3, 4, 5))(a, b, c, d, y, s2)
    for x, z in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), rtol=1e-8)


def test_batched_loglike_cpu_dispatch_jittable():
    """On non-TPU backends batched_loglike falls back to the scan and
    stays jittable end-to-end."""
    a, b, c, d, t, y, s2 = _problem(4, 3, 30, seed=2)
    out = jax.jit(lambda *args: batched_loglike(*args))(a, b, c, d, t, y, s2)
    ref = _scan_batched(a, b, c, d, t, y, s2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_fused_kernel_flags_non_pd():
    """A kernel whose LDL^T goes non-positive must yield -inf, matching
    ops.celerite.logl semantics."""
    a, b, c, d, t, y, s2 = _problem(2, 2, 30, seed=4)
    # negative variance-like coefficients drive D negative
    a_bad = a.at[0].set(-a[0] * 50.0)
    out = batched_loglike_pallas_fused(
        a_bad, b, c, d, t, y, s2, chunk=16, interpret=True
    )
    ref = _scan_batched(a_bad, b, c, d, t, y, s2)
    assert np.asarray(out)[0] == -np.inf
    assert np.asarray(ref)[0] == -np.inf
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(ref)[1], rtol=1e-10)


@pytest.mark.parametrize("B,J,N,chunk,kc", [
    (4, 3, 40, 16, 8),    # unaligned J/B, N padded to chunk
    (3, 8, 64, 16, 4),    # aligned J, N multiple of chunk
    (130, 5, 23, 8, 4),   # B over one lane block, tiny N
])
def test_pallas_adjoint_matches_scan_vjp(B, J, N, chunk, kc):
    """Hand-derived Pallas adjoint == jax.vjp of the scan, all 7 inputs."""
    from pioran_tpu.ops.pallas_celerite_vjp import bwd_pallas, fwd_aug_pallas

    a, b, c, d, t, y, s2 = _problem(B, J, N, seed=11)
    g = jax.random.normal(jax.random.PRNGKey(99), (B,))

    ll_ref, vjp = jax.vjp(lambda *ar: _scan_batched(*ar), a, b, c, d, t, y, s2)
    refs = vjp(g)

    ll, res = fwd_aug_pallas(a, b, c, d, t, y, s2, chunk=chunk, kc=kc,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-10)
    outs = bwd_pallas(a, b, c, d, t, y, s2, res, g, chunk=chunk, kc=kc,
                      interpret=True)
    for name, o, r in zip("a b c d t y s2".split(), outs, refs):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=1e-8, atol=1e-10,
            err_msg=f"cotangent mismatch for {name}",
        )


def test_multi_dataset_ragged_matches_per_row_scan():
    """Per-chain time grids + ragged valid lengths (the data-parallel
    many-light-curves axis, SURVEY §2.6) match per-row scan oracles."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.ops.pallas_celerite import batched_loglike_pallas_multi

    B, J, N = 5, 3, 70
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    T = jnp.sort(jax.random.uniform(ks[6], (B, N)) * 100, axis=1)
    a = jax.random.uniform(ks[0], (B, J)) * 0.5 + 0.1
    b = jax.random.uniform(ks[1], (B, J)) * 0.2
    c = jax.random.uniform(ks[2], (B, J)) * 0.3 + 0.05
    d = jax.random.uniform(ks[3], (B, J)) * 0.4
    y = jax.random.normal(ks[4], (B, N))
    s2 = jax.random.uniform(ks[5], (B, N)) * 0.1 + 0.05
    nv = jnp.array([70, 50, 70, 33, 64])

    refs = [
        float(cel.logl(a[i], b[i], c[i], d[i],
                       T[i, :int(nv[i])], y[i, :int(nv[i])],
                       s2[i, :int(nv[i])]))
        for i in range(B)
    ]
    out = batched_loglike_pallas_multi(
        a, b, c, d, T, y, s2, n_valid=nv, chunk=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), refs, rtol=1e-10)


def test_multi_dataset_ragged_adjoint_matches_scan_vjp():
    """Pallas adjoint with per-lane time grids + ragged lengths ==
    jax.vjp of the masked scan, for all differentiable inputs."""
    from pioran_tpu.ops.pallas_celerite import _scan_batched_multi
    from pioran_tpu.ops.pallas_celerite_vjp import bwd_pallas, fwd_aug_pallas

    B, J, N = 5, 3, 70
    ks = jax.random.split(jax.random.PRNGKey(21), 9)
    T = jnp.sort(jax.random.uniform(ks[6], (B, N)) * 100, axis=1)
    a = jax.random.uniform(ks[0], (B, J)) * 0.5 + 0.1
    b = jax.random.uniform(ks[1], (B, J)) * 0.2
    c = jax.random.uniform(ks[2], (B, J)) * 0.3 + 0.05
    d = jax.random.uniform(ks[3], (B, J)) * 0.4
    y = jax.random.normal(ks[4], (B, N))
    s2 = jax.random.uniform(ks[5], (B, N)) * 0.1 + 0.05
    nv = jnp.array([70.0, 50.0, 70.0, 33.0, 64.0])
    g = jax.random.normal(ks[7], (B,))

    live = jnp.arange(N)[None, :] < nv[:, None]
    s2m = jnp.where(live, s2, 1.0)

    ll_ref, vjp = jax.vjp(
        lambda *ar: _scan_batched_multi(*ar, nv), a, b, c, d, T, y, s2m)
    refs = vjp(g)

    ll, res = fwd_aug_pallas(a, b, c, d, T, y, s2m, n_valid=nv,
                             chunk=16, kc=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-10)
    outs = bwd_pallas(a, b, c, d, T, y, s2m, res, g, n_valid=nv,
                      chunk=16, kc=8, interpret=True)
    for name, o, r in zip("a b c d t y s2".split(), outs, refs):
        o = np.asarray(jnp.where(live, o, 0.0) if np.ndim(o) == 2
                       and o.shape == (B, N) else o)
        r = np.asarray(jnp.where(live, r, 0.0) if np.ndim(r) == 2
                       and r.shape == (B, N) else r)
        np.testing.assert_allclose(
            o, r, rtol=1e-8, atol=1e-10,
            err_msg=f"cotangent mismatch for {name}",
        )


def test_batched_loglike_multi_grad_cpu_path():
    """batched_loglike_multi custom_vjp (scan fallback) produces finite,
    oracle-matching gradients on the CPU test platform."""
    from pioran_tpu.ops.pallas_celerite import (
        batched_loglike_multi, _scan_batched_multi)

    B, J, N = 3, 2, 40
    ks = jax.random.split(jax.random.PRNGKey(5), 9)
    T = jnp.sort(jax.random.uniform(ks[6], (B, N)) * 100, axis=1)
    a = jax.random.uniform(ks[0], (B, J)) * 0.5 + 0.1
    b = jax.random.uniform(ks[1], (B, J)) * 0.2
    c = jax.random.uniform(ks[2], (B, J)) * 0.3 + 0.05
    d = jax.random.uniform(ks[3], (B, J)) * 0.4
    y = jax.random.normal(ks[4], (B, N))
    s2 = jax.random.uniform(ks[5], (B, N)) * 0.1 + 0.05
    nv = jnp.array([40.0, 25.0, 33.0])

    f = lambda aa: jnp.sum(batched_loglike_multi(aa, b, c, d, T, y, s2, nv))
    fr = lambda aa: jnp.sum(_scan_batched_multi(aa, b, c, d, T, y, s2, nv))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(a)), np.asarray(jax.grad(fr)(a)), rtol=1e-9)


def test_fused_kernel_f32_long_n_compensated():
    """Long-N f32 accuracy: the Kahan-compensated logdet/quad
    accumulators keep the kernel's f32 error at the level of the f32
    recursion itself (~0.1 nat at N=16384) instead of the O(N eps)
    sequential-add growth (~500 nats at N=2^16, benchmarks/GRID.md r3).
    Matches the scan path's tree-reduced sums."""
    from pioran_tpu.ops import celerite as cel

    rng = np.random.default_rng(0)
    N, J = 16384, 8
    t = np.sort(rng.uniform(0, N / 4, N))
    a = np.abs(rng.normal(0.5, 0.2, J))
    b = np.zeros(J)
    c = np.abs(rng.normal(0.5, 0.2, J))
    d = np.abs(rng.normal(0.3, 0.1, J))
    y = np.sin(t / 10) + rng.normal(0, 0.3, N)
    s2 = 0.05 + 0.01 * np.abs(rng.normal(size=N))

    ll64 = float(cel.logl(*[jnp.asarray(x, jnp.float64)
                            for x in (a, b, c, d, t, y, s2)]))

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    ll32 = float(batched_loglike_pallas_fused(
        f32(a)[None], f32(b)[None], f32(c)[None], f32(d)[None],
        f32(t), f32(y)[None], f32(s2)[None], interpret=True)[0])
    assert abs(ll32 - ll64) < 1.0, (ll32, ll64)


def test_segmented_adjoint_matches_scan_vjp(monkeypatch):
    """Long-N gradients: series longer than SEG_STEPS run as a chain of
    kernel launches with carried (S, fW, acc) forward state and
    (Mbar, cpre) backward cotangent state. Shrink SEG_STEPS so the
    boundary logic is exercised cheaply (3 segments at N=700); values
    and all seven cotangents must match the scan VJP exactly."""
    from pioran_tpu.ops import pallas_celerite_vjp as vjp_mod
    from pioran_tpu.ops.pallas_celerite_vjp import fwd_aug_pallas, bwd_pallas

    monkeypatch.setattr(vjp_mod, "SEG_STEPS", 256)
    rng = np.random.default_rng(1)
    B, J, N = 4, 4, 700
    t = jnp.asarray(np.sort(rng.uniform(0, 60, N)))
    a = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    b = jnp.asarray(0.1 * np.abs(rng.normal(0.2, 0.1, (B, J))))
    c = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    d = jnp.asarray(np.abs(rng.normal(0.3, 0.1, (B, J))))
    y = jnp.asarray(rng.normal(0, 1, (B, N)))
    s2 = jnp.asarray(0.1 + 0.02 * np.abs(rng.normal(size=(B, N))))

    ll, res = fwd_aug_pallas(a, b, c, d, t, y, s2, interpret=True)
    # segmented: residual arrays carry a leading n_seg axis (fwd scan)
    assert res[0].ndim == 4 and res[0].shape[0] == 3
    ll_ref = _scan_batched(a, b, c, d, t, y, s2)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=1e-9, atol=1e-8)

    g = jnp.asarray(rng.normal(0, 1, (B,)))
    grads = bwd_pallas(a, b, c, d, t, y, s2, res, g, interpret=True)
    _, vjp = jax.vjp(lambda *ar: _scan_batched(*ar), a, b, c, d, t, y, s2)
    ref = vjp(g)
    for gp, gr in zip(grads, ref):
        scale = np.max(np.abs(np.asarray(gr))) + 1e-30
        np.testing.assert_allclose(np.asarray(gp) / scale,
                                   np.asarray(gr) / scale, atol=1e-9)


def test_segmented_adjoint_ragged_multi(monkeypatch):
    """Segmented adjoint with per-lane time grids + ragged lengths
    (n_valid crossing a segment boundary)."""
    from pioran_tpu.ops import pallas_celerite_vjp as vjp_mod
    from pioran_tpu.ops.pallas_celerite_vjp import fwd_aug_pallas, bwd_pallas
    from pioran_tpu.ops.pallas_celerite import _scan_batched_multi

    monkeypatch.setattr(vjp_mod, "SEG_STEPS", 256)
    rng = np.random.default_rng(2)
    B, J, N = 4, 4, 600
    T = jnp.asarray(np.sort(rng.uniform(0, 60, (B, N)), axis=1))
    nv = jnp.asarray([600.0, 410.0, 300.0, 599.0])
    a = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    b = jnp.asarray(0.1 * np.abs(rng.normal(0.2, 0.1, (B, J))))
    c = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    d = jnp.asarray(np.abs(rng.normal(0.3, 0.1, (B, J))))
    y = jnp.asarray(rng.normal(0, 1, (B, N)))
    s2 = jnp.asarray(0.1 + 0.02 * np.abs(rng.normal(size=(B, N))))
    s2m = jnp.where(jnp.arange(N)[None, :] < nv[:, None], s2, 1.0)

    ll, res = fwd_aug_pallas(a, b, c, d, T, y, s2m, n_valid=nv,
                             interpret=True)
    assert res[0].ndim == 4  # segmented (leading n_seg axis)
    ll_ref = _scan_batched_multi(a, b, c, d, T, y, s2, nv)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=1e-9, atol=1e-8)

    g = jnp.asarray(rng.normal(0, 1, (B,)))
    grads = bwd_pallas(a, b, c, d, T, y, s2m, res, g, n_valid=nv,
                       interpret=True)
    _, vjp = jax.vjp(
        lambda *ar: _scan_batched_multi(*ar, nv), a, b, c, d, T, y, s2)
    ref = vjp(g)
    live = np.arange(N)[None, :] < np.asarray(nv)[:, None]
    for i, (gp, gr) in enumerate(zip(grads, ref)):
        gp, gr = np.asarray(gp), np.asarray(gr)
        if i >= 4:  # t, y, s2: compare live entries only
            gp = np.where(live, gp, 0.0)
            gr = np.where(live, gr, 0.0)
        scale = np.max(np.abs(gr)) + 1e-30
        np.testing.assert_allclose(gp / scale, gr / scale, atol=1e-9)


def test_host_f64_dt_fixes_time_grid_conditioning():
    """Long dense series: diff() of an f32 time grid loses ~log2(N)
    bits (dt/span ~ f32 eps), which dominated the f32 likelihood error
    at N >= 2^14 (~500 nats at 2^16 in the r4 grid). Passing host-f64
    spacings via dt= restores sqrt(N)-level error in both the scan and
    the fused kernel."""
    from pioran_tpu.ops import celerite as cel

    rng = np.random.default_rng(3)
    N, J = 16384, 4
    t64 = np.sort(rng.uniform(0, 1000.0, N))  # dt/span ~ 6e-5: hostile
    a = np.abs(rng.normal(0.5, 0.2, J))
    b = np.zeros(J)
    c = np.abs(rng.normal(0.5, 0.2, J))
    d = np.abs(rng.normal(0.3, 0.1, J))
    y = rng.normal(0, 1, N)
    s2 = 0.05 + 0.01 * np.abs(rng.normal(size=N))

    ll64 = float(cel.logl(*[jnp.asarray(x, jnp.float64)
                            for x in (a, b, c, d, t64, y, s2)]))
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    dt32 = f32(np.diff(t64))  # f64 diffs, then cast

    ll32_dt = float(cel.logl(f32(a), f32(b), f32(c), f32(d), f32(t64),
                             f32(y), f32(s2), dt=dt32))
    # with f64-derived spacings the f32 error stays at the recursion's
    # own noise floor even on this conditioning-hostile grid
    assert abs(ll32_dt - ll64) < 1.0, (ll32_dt, ll64)

    ll32_pal = float(batched_loglike_pallas_fused(
        f32(a)[None], f32(b)[None], f32(c)[None], f32(d)[None],
        f32(t64), f32(y)[None], f32(s2)[None], dt=dt32,
        interpret=True)[0])
    assert abs(ll32_pal - ll64) < 1.0, (ll32_pal, ll64)

    # the custom_vjp path accepts dt and still matches the scan grads
    gk = jax.grad(lambda aa: jnp.sum(batched_loglike(
        aa[None], f32(b)[None], f32(c)[None], f32(d)[None], f32(t64),
        f32(y)[None], f32(s2)[None], dt32)))(f32(a))
    gs = jax.grad(lambda aa: cel.logl(
        aa, f32(b), f32(c), f32(d), f32(t64), f32(y), f32(s2),
        dt=dt32))(f32(a))
    # f32 op-order differences between the vmapped batch path and the
    # single-chain scan leave ~1e-5 relative noise
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gs), rtol=1e-3)


def test_multi_per_lane_dt_matches_and_differentiates():
    """batched_loglike_multi with per-lane host-f64 spacings: values
    equal the masked scan with the same dt; gradients flow (dt
    non-differentiable)."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.ops.pallas_celerite import (
        _scan_batched_multi, batched_loglike_multi)

    B, J, N = 3, 2, 50
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    T = jnp.sort(jax.random.uniform(ks[6], (B, N)) * 100, axis=1)
    a = jax.random.uniform(ks[0], (B, J)) * 0.5 + 0.1
    b = jax.random.uniform(ks[1], (B, J)) * 0.2
    c = jax.random.uniform(ks[2], (B, J)) * 0.3 + 0.05
    d = jax.random.uniform(ks[3], (B, J)) * 0.4
    y = jax.random.normal(ks[4], (B, N))
    s2 = jax.random.uniform(ks[5], (B, N)) * 0.1 + 0.05
    nv = jnp.array([50.0, 33.0, 44.0])
    dt = jnp.diff(T, axis=1)

    out = batched_loglike_multi(a, b, c, d, T, y, s2, nv, dt)
    ref = _scan_batched_multi(a, b, c, d, T, y, s2, nv, dt=dt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)
    # and identical to the no-dt path when dt == diff(T)
    ref0 = batched_loglike_multi(a, b, c, d, T, y, s2, nv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref0), rtol=1e-12)

    g = jax.grad(lambda aa: jnp.sum(batched_loglike_multi(
        aa, b, c, d, T, y, s2, nv, dt)))(a)
    assert np.all(np.isfinite(np.asarray(g)))
