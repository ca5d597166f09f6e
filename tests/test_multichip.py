"""Multi-device tests on the 8-device virtual CPU mesh.

What the reference never tests (SURVEY §4: 'Multi-node behavior is not
tested at all'): sharded-sampler correctness and collective plumbing.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu.parallel import (
    make_mesh, run_nuts_sharded, run_ns_sharded, run_smc_sharded,
)
from pioran_tpu.samplers.smc import run_smc


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh("chains")


def test_nuts_sharded_gaussian(mesh):
    cov = jnp.array([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    C = 16  # 2 chains per device
    z0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    keys = jax.random.split(jax.random.PRNGKey(1), C)
    samples, stats = run_nuts_sharded(
        logp, z0, keys, mesh, num_warmup=200, num_samples=300
    )
    assert samples.shape == (C, 300, 2)
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.3)
    # pooled mass matrix: identical on every chain (pmean makes it global)
    inv_mass = np.asarray(stats["inv_mass"])
    np.testing.assert_allclose(inv_mass, np.tile(inv_mass[0], (16, 1)), rtol=1e-6)
    # ... and close to the target marginal variances
    np.testing.assert_allclose(inv_mass[0], np.diag(np.asarray(cov)), rtol=0.5)


def test_smc_sharded_matches_single_device(mesh):
    d, s0, s = 3, 2.0, 0.5
    y = jnp.array([0.3, -1.2, 0.8])
    loglike = lambda z: -0.5 * jnp.sum((y - z) ** 2) / s**2 - d / 2 * jnp.log(2 * jnp.pi * s**2)
    logprior = lambda z: -0.5 * jnp.sum(z**2) / s0**2 - d / 2 * jnp.log(2 * jnp.pi * s0**2)
    logZ_true = float(
        -0.5 * np.sum(np.asarray(y) ** 2) / (s0**2 + s**2)
        - d / 2 * np.log(2 * np.pi * (s0**2 + s**2))
    )
    mesh_p = make_mesh("particles")
    p0 = s0 * jax.random.normal(jax.random.PRNGKey(0), (1024, d))
    res = run_smc_sharded(loglike, logprior, p0, jax.random.PRNGKey(1), mesh_p)
    assert abs(float(res.logZ) - logZ_true) < 0.2
    post_mean = np.asarray(y) * s0**2 / (s0**2 + s**2)
    np.testing.assert_allclose(np.asarray(res.particles).mean(0), post_mean, atol=0.12)
    # against the single-device implementation
    res1 = run_smc(loglike, logprior, p0, jax.random.PRNGKey(1))
    assert abs(float(res.logZ) - float(res1.logZ)) < 0.2


def test_ns_sharded_matches_analytic(mesh):
    """Nested sampling with likelihood sweeps sharded over 8 devices:
    same Gaussian-evidence oracle as tests/test_ns.py."""
    from pioran_tpu.samplers.ns import run_ns

    d, s = 4, 0.05
    def loglike_u_batch(U):
        return -0.5 * jnp.sum((U - 0.5) ** 2, axis=-1) / s**2

    logz_true = d * np.log(s * np.sqrt(2 * np.pi))
    mesh_p = make_mesh("particles")
    res = run_ns_sharded(
        loglike_u_batch, jax.random.PRNGKey(0), mesh_p,
        num_live=512, dim=d, n_delete=64, num_mcmc=6,
        max_iters=400, frac_remain=1e-3,
    )
    err = float(res.logZ_err)
    assert abs(float(res.logZ) - logz_true) < 3 * max(err, 0.1)
    # same seed, single device: identical shrinkage schedule, logZ close
    res1 = run_ns(
        loglike_u_batch, jax.random.PRNGKey(0),
        num_live=512, dim=d, n_delete=64, num_mcmc=6,
        max_iters=400, frac_remain=1e-3,
    )
    assert abs(float(res.logZ) - float(res1.logZ)) < 3 * err


def test_ns_sharded_rejects_indivisible(mesh):
    mesh_p = make_mesh("particles")
    with pytest.raises(ValueError):
        run_ns_sharded(
            lambda U: jnp.zeros(U.shape[0]), jax.random.PRNGKey(0),
            mesh_p, num_live=512, dim=2, n_delete=12,
        )


def test_sharded_gp_likelihood_chains(mesh, simu_log_data):
    """The flagship likelihood, vmapped and sharded over 8 devices."""
    import pioran_tpu as pt
    from pioran_tpu.ops import celerite as cel
    from jax.sharding import NamedSharding, PartitionSpec as P

    t, y, yerr = map(jnp.asarray, simu_log_data)
    t, y, yerr = t[:100], y[:100], yerr[:100]
    f0, fM = 1e-3, 1e1

    def loglike(p):
        kern = pt.approx(pt.SingleBendingPowerLaw(p[0], p[1], p[2]), f0, fM, 20, p[3])
        return cel.log_likelihood(kern, t, y - p[5], p[4] * yerr**2)

    base = jnp.array([0.82, 0.01, 3.3, 0.5, 1.0, 0.0])
    P16 = jnp.stack([base * (1 + 0.01 * k) for k in range(16)])
    sharding = NamedSharding(mesh, P("chains"))
    P16_sharded = jax.device_put(P16, sharding)
    out = jax.jit(jax.vmap(loglike))(P16_sharded)
    ref = jax.jit(jax.vmap(loglike))(P16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_seq_axis_blockwise_scan_long_n():
    """Sequence-axis scale-out (SURVEY §2.6 row 4): the blockwise
    celerite factorization with ppermute carry hand-off across 8
    devices must reproduce the single-device scan bit-for-bit-ish at
    N=2^15 — the long-N regime where per-chip memory becomes the cap."""
    from pioran_tpu.parallel.mesh import make_mesh
    from pioran_tpu.parallel.seq_scan import logl_seq_sharded
    from pioran_tpu.ops import celerite as cel

    rng = np.random.default_rng(0)
    N = 2**15
    t = jnp.asarray(np.sort(rng.uniform(0, 1000.0, N)))
    y = jnp.asarray(rng.normal(size=N))
    s2 = jnp.asarray(0.1 + 0.05 * rng.uniform(size=N))
    J = 8
    a = jnp.asarray(0.5 + rng.uniform(size=J))
    b = jnp.asarray(0.1 * rng.uniform(size=J))
    c = jnp.asarray(0.05 + 0.2 * rng.uniform(size=J))
    d = jnp.asarray(0.3 * rng.uniform(size=J))

    mesh = make_mesh("seq")
    ll_sharded = float(
        jax.jit(lambda *args: logl_seq_sharded(*args, mesh=mesh))(
            a, b, c, d, t, y, s2
        )
    )
    ll_ref = float(jax.jit(cel.logl)(a, b, c, d, t, y, s2))
    assert abs(ll_sharded - ll_ref) < 1e-6 * abs(ll_ref)


def test_seq_axis_rejects_indivisible():
    from pioran_tpu.parallel.mesh import make_mesh
    from pioran_tpu.parallel.seq_scan import logl_seq_sharded

    mesh = make_mesh("seq")
    N = 100  # not divisible by 8
    t = jnp.linspace(0.0, 1.0, N)
    one = jnp.ones((2,))
    with pytest.raises(ValueError):
        logl_seq_sharded(one, one, one, one, t, t, t, mesh=mesh)


def test_run_inference_many_sharded(mesh, simu_log_data=None):
    """Multi-dataset driver under a mesh: 2 ragged datasets x 8 chains
    = 16 chains GSPMD-sharded over 8 devices; means must match the
    unsharded run's to MC-noise level (same seed => same program up to
    sharding, so exactly)."""
    import os

    from pioran_tpu.inference import run_inference_many

    A = np.loadtxt(os.path.join(os.path.dirname(__file__), "data", "simu.txt"))
    ds = [
        (A[:160, 0], A[:160, 1], A[:160, 2]),
        (A[100:300, 0], A[100:300, 1], A[100:300, 2]),
    ]
    kwargs = dict(num_chains=8, num_warmup=30, num_samples=30,
                  max_leapfrogs=8, key=jax.random.PRNGKey(5))
    res_sharded = run_inference_many(ds, mesh=mesh, **kwargs)
    res_plain = run_inference_many(ds, **kwargs)
    for rs, rp in zip(res_sharded, res_plain):
        ms = np.asarray(rs["posterior"]["mean"])
        mp = np.asarray(rp["posterior"]["mean"])
        assert np.all(np.isfinite(ms))
        # identical program modulo GSPMD partitioning: tight agreement
        assert np.allclose(ms, mp, rtol=1e-3, atol=1e-3), (ms, mp)


# ---------------------------------------------------------------------------
# mesh= on the user surface (run_inference)
# ---------------------------------------------------------------------------

def _toy_spec(dim=3, sigma=0.35):
    """A cheap GPModelSpec-shaped problem (Gaussian likelihood) so the
    run_inference mesh plumbing is exercised without GP solve cost."""
    from pioran_tpu.inference import GPModelSpec
    from pioran_tpu.priors import PriorSet, Normal

    target = jnp.asarray([0.4, -0.3, 0.1][:dim])

    def loglike(th):
        return -0.5 * jnp.sum((th - target) ** 2) / sigma**2

    prior = PriorSet([(f"p{i}", Normal(0.0, 1.0)) for i in range(dim)])
    z = np.zeros(8)
    return GPModelSpec(
        prior=prior, loglike=loglike, names=[f"p{i}" for i in range(dim)],
        gp_model=None, psd_model=None, paramnames_split={},
        t=z, y=z + 1.0, yerr=z + 0.1, f_min=0.1, f_max=1.0,
    )


def test_run_inference_ns_mesh_matches_unsharded(mesh):
    """run_inference(sampler='ns', mesh=...) on the 8-device mesh:
    identical algorithm with the likelihood sweeps shard_mapped, so the
    posterior must match the unsharded run closely (VERDICT r3 item 1)."""
    from pioran_tpu.inference import run_inference

    spec = _toy_spec()
    kw = dict(sampler="ns", key=jax.random.PRNGKey(3), num_particles=256,
              num_ns_mcmc=4, num_samples=500)
    res_plain = run_inference(spec, **kw)
    res_mesh = run_inference(spec, mesh=mesh, **kw)
    assert res_mesh["mesh"]["n_devices_sharded"] == 8
    assert abs(res_mesh["logz"] - res_plain["logz"]) < 0.2
    np.testing.assert_allclose(
        res_mesh["posterior"]["mean"], res_plain["posterior"]["mean"],
        atol=0.05,
    )
    np.testing.assert_allclose(
        res_mesh["posterior"]["stdev"], res_plain["posterior"]["stdev"],
        atol=0.05,
    )
    # the MWW diagnostic is produced on the sharded path too
    assert "insertion_order_MWW_test" in res_mesh


def test_run_inference_chees_and_smc_mesh(mesh):
    """ChEES chains and SMC particles shard through run_inference(mesh=);
    posterior moments agree with the analytic target."""
    from pioran_tpu.inference import run_inference

    spec = _toy_spec()
    res_c = run_inference(
        spec, sampler="chees", mesh=mesh, key=jax.random.PRNGKey(5),
        num_chains=16, num_warmup=300, num_samples=300,
    )
    # posterior of N(0,1) prior x N(target, 0.35^2) likelihood
    post_var = 1.0 / (1.0 + 1.0 / 0.35**2)
    post_mean = np.asarray([0.4, -0.3, 0.1]) * post_var / 0.35**2
    np.testing.assert_allclose(
        res_c["posterior"]["mean"], post_mean, atol=0.08)
    np.testing.assert_allclose(
        res_c["posterior"]["stdev"], np.sqrt(post_var), atol=0.08)

    res_s = run_inference(
        spec, sampler="smc", mesh=mesh, key=jax.random.PRNGKey(6),
        num_particles=512, num_moves=6,
    )
    np.testing.assert_allclose(
        res_s["posterior"]["mean"], post_mean, atol=0.1)


def test_run_inference_mesh_divisibility_error(mesh):
    from pioran_tpu.inference import run_inference

    spec = _toy_spec()
    with pytest.raises(ValueError, match="divisible"):
        run_inference(spec, sampler="ns", mesh=mesh, num_particles=100)


def test_run_inference_nuts_mesh(mesh):
    from pioran_tpu.inference import run_inference

    spec = _toy_spec()
    res = run_inference(
        spec, sampler="nuts", mesh=mesh, key=jax.random.PRNGKey(7),
        num_chains=8, num_warmup=150, num_samples=200,
    )
    post_var = 1.0 / (1.0 + 1.0 / 0.35**2)
    post_mean = np.asarray([0.4, -0.3, 0.1]) * post_var / 0.35**2
    np.testing.assert_allclose(res["posterior"]["mean"], post_mean, atol=0.1)
    assert res["ncall"] > 0 and np.all(np.asarray(res["rhat"]) < 1.1)


def test_seq_pipelined_batch_matches_vmapped_scan():
    """Pipelined chain-batch sequence sharding (parallel/seq_scan.py
    logl_seq_pipelined): B=16 chains through 8 time blocks in
    M + n_dev - 1 rounds; values must equal vmapped ops.celerite.logl."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.parallel.seq_scan import logl_seq_pipelined
    from pioran_tpu.parallel import make_mesh

    mesh = make_mesh("seq")
    rng = np.random.default_rng(5)
    B, J, N = 16, 3, 1024
    t = jnp.asarray(np.sort(rng.uniform(0, 200, N)))
    a = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    b = jnp.asarray(0.1 * np.abs(rng.normal(0.2, 0.1, (B, J))))
    c = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    d = jnp.asarray(np.abs(rng.normal(0.3, 0.1, (B, J))))
    Y = jnp.asarray(rng.normal(0, 1, (B, N)))
    S2 = jnp.asarray(0.1 + 0.02 * np.abs(rng.normal(size=(B, N))))

    ll = jax.jit(
        lambda *ar: logl_seq_pipelined(*ar, mesh=mesh, n_micro=4)
    )(a, b, c, d, t, Y, S2)
    ref = jax.vmap(lambda aa, bb, cc, dd, yy, ss: cel.logl(
        aa, bb, cc, dd, t, yy, ss))(a, b, c, d, Y, S2)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref), rtol=1e-10)


def test_seq_sharded_gradient_matches_scan():
    """Reverse-mode through the blockwise ppermute scan
    (fori_loop + cond + ppermute) == jax.grad of the single-chip scan —
    the sequence axis is differentiable, so HMC-family samplers can use
    it (VERDICT r3 weak item 1)."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.parallel.seq_scan import logl_seq_sharded
    from pioran_tpu.parallel import make_mesh

    mesh = make_mesh("seq")
    rng = np.random.default_rng(6)
    J, N = 3, 512
    t = jnp.asarray(np.sort(rng.uniform(0, 100, N)))
    a = jnp.asarray(np.abs(rng.normal(0.5, 0.2, J)))
    b = jnp.asarray(0.1 * np.abs(rng.normal(0.2, 0.1, J)))
    c = jnp.asarray(np.abs(rng.normal(0.5, 0.2, J)))
    d = jnp.asarray(np.abs(rng.normal(0.3, 0.1, J)))
    y = jnp.asarray(rng.normal(0, 1, N))
    s2 = jnp.asarray(0.1 + 0.02 * np.abs(rng.normal(size=N)))

    g_seq = jax.jit(jax.grad(
        lambda aa, cc, yy: logl_seq_sharded(aa, b, cc, d, t, yy, s2, mesh),
        argnums=(0, 1, 2)))(a, c, y)
    g_ref = jax.grad(
        lambda aa, cc, yy: cel.logl(aa, b, cc, d, t, yy, s2),
        argnums=(0, 1, 2))(a, c, y)
    for gs, gr in zip(g_seq, g_ref):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=1e-7, atol=1e-9)


def test_long_n_inference_end_to_end_seq_sharded():
    """VERDICT r3 item 4 'done' criterion: an N = 2^17 light curve runs
    through run_inference on the 8-device mesh with the TIME axis
    sharded — the scalar likelihood via the blockwise ppermute scan
    (auto-dispatched by cel.logl(mesh=...)), the sampler sweeps via the
    pipelined chain-micro-batch variant. Small SMC budget: this pins
    reachability and numerical agreement, not posterior quality."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.inference import single_bending_model, run_inference
    from pioran_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    N = 2**17
    t = np.cumsum(0.5 + rng.exponential(0.5, N))
    t -= t[0]
    x = np.empty(N)
    x[0] = 0.0
    phi = 0.995
    for i in range(1, N):
        x[i] = phi * x[i - 1] + 0.05 * rng.normal()
    y = np.exp(0.3 * x)
    yerr = 0.02 * y
    xbar = float(np.mean(np.log(y)))
    va = float(np.var(np.log(y)))

    mesh = make_mesh("seq")
    spec = single_bending_model(t, y, yerr, xbar, va, n_components=4,
                                seq_mesh=mesh)
    th = jnp.asarray([0.5, 2.5, 0.001, 0.05, 1.0, xbar])
    ll_sharded = float(spec.loglike(th))
    # unsharded oracle at the same point
    spec_plain = single_bending_model(t, y, yerr, xbar, va, n_components=4)
    ll_plain = float(spec_plain.loglike(th))
    assert np.isfinite(ll_sharded)
    np.testing.assert_allclose(ll_sharded, ll_plain, rtol=1e-12)

    res = run_inference(spec, sampler="smc", key=jax.random.PRNGKey(0),
                        num_particles=16, num_moves=1, smc_move="rwm")
    assert np.isfinite(res["logz"])
    assert np.all(np.isfinite(res["samples"]))
    assert np.all(np.asarray(res["samples"])[:, 3] > 0)  # variance > 0


def test_seq_pipelined_gradient_matches_vmapped_scan():
    """VERDICT r4 item 3: jax.grad THROUGH logl_seq_pipelined (the
    fori_loop + ppermute + dynamic_slice pipeline) == vmapped
    cel.logl grads. ChEES/MALA-SMC differentiate this path in
    production whenever seq_mesh is set (samplers/chees.py runs
    jax.vjp over the batch fn), so wrong cotangents here would
    silently corrupt every gradient-based long-N fit."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.parallel.seq_scan import logl_seq_pipelined
    from pioran_tpu.parallel import make_mesh

    mesh = make_mesh("seq")
    rng = np.random.default_rng(11)
    B, J, N = 8, 3, 512
    t = jnp.asarray(np.sort(rng.uniform(0, 120, N)))
    a = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    b = jnp.asarray(0.1 * np.abs(rng.normal(0.2, 0.1, (B, J))))
    c = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    d = jnp.asarray(np.abs(rng.normal(0.3, 0.1, (B, J))))
    Y = jnp.asarray(rng.normal(0, 1, (B, N)))
    S2 = jnp.asarray(0.1 + 0.02 * np.abs(rng.normal(size=(B, N))))

    def tot_pipe(aa, cc, YY):
        return jnp.sum(logl_seq_pipelined(aa, b, cc, d, t, YY, S2,
                                          mesh=mesh, n_micro=4))

    # per-chain b, d rows differ; vmap the full set for the oracle
    def tot_ref_full(aa, cc, YY):
        return jnp.sum(jax.vmap(
            lambda a1, b1, c1, d1, y1, s1: cel.logl(a1, b1, c1, d1, t, y1, s1)
        )(aa, b, cc, d, YY, S2))

    g_pipe = jax.jit(jax.grad(tot_pipe, argnums=(0, 1, 2)))(a, c, Y)
    g_ref = jax.grad(tot_ref_full, argnums=(0, 1, 2))(a, c, Y)
    for gp, gr in zip(g_pipe, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-7, atol=1e-9)


def test_seq_pipelined_dt_parameter_and_padding():
    """VERDICT r4 item 2 + ADVICE high/medium: the pipelined batched
    path accepts host-f64 spacings (dt=) and gives bit-identical values
    to the vmapped scalar path WITH the same dt; the spec's batched
    seq likelihood pads an indivisible batch (B=5 on an 8-device mesh)
    instead of raising at the end of a long run."""
    from pioran_tpu.ops import celerite as cel
    from pioran_tpu.parallel.seq_scan import logl_seq_pipelined
    from pioran_tpu.parallel import make_mesh
    from pioran_tpu.inference import single_bending_model

    mesh = make_mesh("seq")
    rng = np.random.default_rng(12)
    B, J, N = 8, 3, 512
    t64 = np.sort(rng.uniform(0, 120, N))
    dt64 = np.diff(t64)
    t = jnp.asarray(t64)
    a = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    b = jnp.asarray(0.1 * np.abs(rng.normal(0.2, 0.1, (B, J))))
    c = jnp.asarray(np.abs(rng.normal(0.5, 0.2, (B, J))))
    d = jnp.asarray(np.abs(rng.normal(0.3, 0.1, (B, J))))
    Y = jnp.asarray(rng.normal(0, 1, (B, N)))
    S2 = jnp.asarray(0.1 + 0.02 * np.abs(rng.normal(size=(B, N))))

    ll = jax.jit(lambda *ar: logl_seq_pipelined(
        *ar, mesh=mesh, n_micro=4, dt=jnp.asarray(dt64)))(
        a, b, c, d, t, Y, S2)
    ref = jax.vmap(lambda a1, b1, c1, d1, y1, s1: cel.logl(
        a1, b1, c1, d1, t, y1, s1, dt=jnp.asarray(dt64)))(a, b, c, d, Y, S2)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref), rtol=1e-12)

    # spec-level consistency: batched seq path (with dt) == scalar path
    # (which always got dt64), and B=5 (not divisible by 8) works
    A = np.loadtxt(os.path.join(os.path.dirname(__file__), "data",
                                "simu.txt"))
    reps = -(-512 // len(A))
    tt = np.concatenate([A[:, 0] + i * (A[-1, 0] + 1.0) for i in range(reps)])[:512]
    yy = np.tile(A[:, 1], reps)[:512]
    ee = np.tile(A[:, 2], reps)[:512]
    xbar = float(np.mean(np.log(yy)))
    va = float(np.var(np.log(yy)))
    spec = single_bending_model(tt, yy, ee, xbar, va, n_components=4,
                                seq_mesh=mesh)
    TH = jnp.asarray(np.stack([
        [0.6, 2.5, 0.004, 0.02, 1.1, xbar],
        [0.8, 3.0, 0.002, 0.05, 0.9, xbar + 0.1],
        [0.4, 2.0, 0.008, 0.01, 1.3, xbar - 0.1],
        [0.7, 2.2, 0.003, 0.03, 1.0, xbar],
        [0.5, 2.8, 0.005, 0.04, 1.2, xbar],
    ]))
    ll_b = np.asarray(spec.loglike_batch(TH))  # B=5: exercises padding
    ll_s = np.asarray(jax.vmap(spec.loglike)(TH))
    assert ll_b.shape == (5,)
    np.testing.assert_allclose(ll_b, ll_s, rtol=1e-10)


def test_seq_mesh_on_carma_builder_long_n():
    """VERDICT r4 item 4 'done' criterion: a non-flagship builder
    (CARMA) runs a long series with the TIME axis sharded — scalar and
    batched seq likelihoods match the unsharded oracle."""
    from pioran_tpu.inference import carma_model
    from pioran_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    N = 4096
    t = np.cumsum(0.5 + rng.exponential(0.5, N))
    t -= t[0]
    y = np.exp(0.2 * rng.normal(size=N) + 1.0)
    yerr = 0.02 * y
    xbar = float(np.mean(np.log(y)))
    va = float(np.var(np.log(y)))

    mesh = make_mesh("seq")
    spec = carma_model(t, y, yerr, xbar, va, p=2, q=1, seq_mesh=mesh)
    spec_plain = carma_model(t, y, yerr, xbar, va, p=2, q=1)
    th = jnp.asarray(spec.prior.sample(jax.random.PRNGKey(0)))
    ll_seq = float(spec.loglike(th))
    ll_ref = float(spec_plain.loglike(th))
    assert np.isfinite(ll_seq)
    np.testing.assert_allclose(ll_seq, ll_ref, rtol=1e-12)

    TH = jnp.stack([th, th * 1.01])
    ll_b = np.asarray(spec.loglike_batch(TH))
    ll_bref = np.asarray(jax.vmap(spec_plain.loglike)(TH))
    np.testing.assert_allclose(ll_b, ll_bref, rtol=1e-10)
