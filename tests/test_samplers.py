"""Sampler correctness on analytically known targets.

The reference has no in-repo sampler (inference via external
Turing/ultranest); these tests pin the statistical correctness of the
built-in TPU-native samplers instead (SURVEY §2.5, §7 M3).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pioran_tpu.samplers.nuts import run_nuts
from pioran_tpu.samplers.smc import run_smc, systematic_resample


def test_nuts_correlated_gaussian():
    cov = jnp.array([[2.0, 1.2, 0.3], [1.2, 1.5, 0.5], [0.3, 0.5, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    nchains = 8
    keys = jax.random.split(jax.random.PRNGKey(0), nchains)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (nchains, 3))
    samples, stats = jax.vmap(
        lambda z, k: run_nuts(logp, z, k, num_warmup=300, num_samples=500)
    )(z0, keys)
    s = np.asarray(samples).reshape(-1, 3)
    assert np.asarray(stats["diverging"]).mean() < 0.01
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.25)


def test_nuts_banana_no_nans():
    """Mildly pathological target: curved banana; all finite, no stuck chains."""

    def logp(z):
        x, y = z[0], z[1]
        return -0.5 * (x**2 / 4.0 + (y - x**2 / 4.0) ** 2)

    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (4, 2))
    samples, stats = jax.vmap(
        lambda z, k: run_nuts(logp, z, k, num_warmup=300, num_samples=400)
    )(z0, keys)
    s = np.asarray(samples)
    assert np.all(np.isfinite(s))
    # each chain moves (not stuck)
    assert np.all(s.std(axis=1)[:, 0] > 0.5)


def test_smc_gaussian_evidence():
    d, s0, s = 4, 2.0, 0.5
    y = jnp.array([0.3, -1.2, 0.8, 2.0])
    loglike = lambda z: -0.5 * jnp.sum((y - z) ** 2) / s**2 - d / 2 * jnp.log(2 * jnp.pi * s**2)
    logprior = lambda z: -0.5 * jnp.sum(z**2) / s0**2 - d / 2 * jnp.log(2 * jnp.pi * s0**2)
    logZ_true = float(
        -0.5 * np.sum(np.asarray(y) ** 2) / (s0**2 + s**2)
        - d / 2 * np.log(2 * np.pi * (s0**2 + s**2))
    )
    p0 = s0 * jax.random.normal(jax.random.PRNGKey(0), (1024, d))
    res = run_smc(loglike, logprior, p0, jax.random.PRNGKey(1))
    assert abs(float(res.logZ) - logZ_true) < 0.15
    post_mean = np.asarray(y) * s0**2 / (s0**2 + s**2)
    np.testing.assert_allclose(np.asarray(res.particles).mean(0), post_mean, atol=0.1)
    post_std = np.sqrt(s0**2 * s**2 / (s0**2 + s**2))
    np.testing.assert_allclose(np.asarray(res.particles).std(0), post_std, rtol=0.15)


def test_systematic_resample_proportions():
    log_w = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    # average counts over keys approximate N * w
    counts = np.zeros(4)
    for i in range(200):
        idx = np.asarray(systematic_resample(jax.random.PRNGKey(i), log_w))
        counts += np.bincount(idx, minlength=4)
    props = counts / counts.sum()
    np.testing.assert_allclose(props, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_nuts_reproducible():
    logp = lambda z: -0.5 * jnp.sum(z**2)
    z0 = jnp.zeros(2)
    s1, _ = run_nuts(logp, z0, jax.random.PRNGKey(7), num_warmup=50, num_samples=50)
    s2, _ = run_nuts(logp, z0, jax.random.PRNGKey(7), num_warmup=50, num_samples=50)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_advi_gaussian_posterior():
    """ADVI on a conjugate Gaussian: mean-field q recovers mean and
    marginal stddevs, and the final ELBO lower-bounds the true logZ."""
    from pioran_tpu.samplers.advi import run_advi

    d, s0, s = 4, 2.0, 0.5
    y = jnp.array([0.3, -1.2, 0.8, 2.0])
    post_var = 1.0 / (1.0 / s0**2 + 1.0 / s**2)
    post_mean = np.asarray(y) * post_var / s**2
    logZ_true = float(
        -0.5 * np.sum(np.asarray(y) ** 2) / (s0**2 + s**2)
        - d / 2 * np.log(2 * np.pi * (s0**2 + s**2))
    )

    def logpost(z):
        ll = -0.5 * jnp.sum((y - z) ** 2) / s**2 - d / 2 * jnp.log(2 * jnp.pi * s**2)
        lp = -0.5 * jnp.sum(z**2) / s0**2 - d / 2 * jnp.log(2 * jnp.pi * s0**2)
        return ll + lp

    res = run_advi(
        logpost, jnp.zeros(d), jax.random.PRNGKey(0),
        num_steps=1500, num_draws=4000,
    )
    np.testing.assert_allclose(np.asarray(res.mu), post_mean, atol=0.05)
    np.testing.assert_allclose(
        np.exp(np.asarray(res.log_sigma)), np.sqrt(post_var), rtol=0.15
    )
    # mean-field q == true posterior here, so ELBO -> logZ
    assert abs(float(res.logZ_lower) - logZ_true) < 0.1
    s_draws = np.asarray(res.samples)
    np.testing.assert_allclose(s_draws.mean(0), post_mean, atol=0.1)


def test_advi_is_jittable_and_vmappable():
    from pioran_tpu.samplers.advi import run_advi

    logpost = lambda z: -0.5 * jnp.sum(z**2)
    fit = jax.jit(
        lambda z0, k: run_advi(logpost, z0, k, num_steps=50, num_draws=8)
    )
    z0s = jnp.zeros((3, 2))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    out = jax.vmap(fit)(z0s, keys)
    assert out.samples.shape == (3, 8, 2)
    assert np.all(np.isfinite(np.asarray(out.elbo_trace)))


def test_chees_correlated_gaussian():
    """ChEES-HMC recovers a correlated Gaussian (regression guard for the
    trajectory-length adaptation: a divergence-poisoned ChEES gradient
    once froze every chain via NaN log_tau -> n_steps = 0)."""
    from pioran_tpu.samplers.chees import run_chees

    cov = jnp.array([[2.0, 1.2, 0.3], [1.2, 1.5, 0.5], [0.3, 0.5, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    C = 64
    z0 = jax.random.normal(jax.random.PRNGKey(1), (C, 3))
    samples, stats = run_chees(
        logp, z0, jax.random.PRNGKey(0), num_warmup=400, num_samples=400,
        max_leapfrogs=64,
    )
    s = np.asarray(samples).reshape(-1, 3)
    # chains actually move every iteration
    assert np.asarray(stats["n_leapfrogs"]).min() >= 1
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.3)


def test_chees_batched_logp_matches_vmapped():
    """logp_batch_fn path is the same markov chain as the vmapped path."""
    from pioran_tpu.samplers.chees import run_chees

    logp = lambda z: -0.5 * jnp.sum(z**2)
    logp_batch = lambda Z: -0.5 * jnp.sum(Z**2, axis=-1)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    s1, _ = run_chees(logp, z0, jax.random.PRNGKey(3), num_warmup=50,
                      num_samples=50, max_leapfrogs=32)
    s2, _ = run_chees(logp, z0, jax.random.PRNGKey(3), num_warmup=50,
                      num_samples=50, max_leapfrogs=32,
                      logp_batch_fn=logp_batch)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5,
                               atol=1e-6)


def test_chees_stepped_matches_scan_version():
    """Host-stepped ChEES (one jitted transition per iteration) produces
    the same draws as the fused-scan version given the same key — it is
    the same kernel (samplers/chees.py make_chees_transition)."""
    from pioran_tpu.samplers.chees import run_chees, run_chees_stepped

    cov = jnp.array([[1.5, 0.7], [0.7, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    C = 8
    z0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    key = jax.random.PRNGKey(1)
    s_scan, st_scan = run_chees(logp, z0, key, num_warmup=60, num_samples=40)
    s_step, st_step = run_chees_stepped(
        logp, z0, key, num_warmup=60, num_samples=40)
    np.testing.assert_allclose(np.asarray(s_scan), s_step, rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(st_scan["n_leapfrogs"]), st_step["n_leapfrogs"])


def test_chees_dense_mass_correlated_gaussian():
    """Dense (full-covariance) metric: on a strongly correlated Gaussian
    the cross-chain covariance metric must recover mean AND covariance,
    and mix dramatically better than unit metric would (the adaptation
    rationale for the flagship model's alpha2/f1 ridge)."""
    from pioran_tpu.samplers.chees import run_chees

    # condition number ~ 250 with strong off-diagonal correlation
    rho = 0.98
    cov = jnp.array([[4.0, rho * 2.0 * 0.5, 0.0],
                     [rho * 2.0 * 0.5, 0.25, 0.0],
                     [0.0, 0.0, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    C = 128
    z0 = jax.random.normal(jax.random.PRNGKey(1), (C, 3))
    samples, stats = run_chees(
        logp, z0, jax.random.PRNGKey(0), num_warmup=400, num_samples=400,
        max_leapfrogs=64, mass="dense",
    )
    s = np.asarray(samples).reshape(-1, 3)
    assert np.asarray(stats["n_leapfrogs"]).min() >= 1
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.25)
    # the learned metric diagonal tracks the target's marginal variances
    np.testing.assert_allclose(np.asarray(stats["inv_mass"]),
                               np.diag(np.asarray(cov)), rtol=0.6)


def test_chees_dense_stepped_matches_scan():
    """Host-stepped == fused-scan for the dense-metric kernel too."""
    from pioran_tpu.samplers.chees import run_chees, run_chees_stepped

    cov = jnp.array([[1.5, 0.7], [0.7, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    z0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    key = jax.random.PRNGKey(1)
    s_scan, _ = run_chees(logp, z0, key, num_warmup=60, num_samples=40,
                          mass="dense")
    s_step, _ = run_chees_stepped(logp, z0, key, num_warmup=60,
                                  num_samples=40, mass="dense")
    np.testing.assert_allclose(np.asarray(s_scan), s_step, rtol=1e-8,
                               atol=1e-10)


def test_advi_seeded_inits_flagship():
    """advi_seeded_inits returns finite, posterior-concentrated,
    overdispersed chain inits on the flagship model (the principled
    replacement for the bench's old best-of-8192 prior-draw crutch)."""
    import os

    from pioran_tpu.inference import advi_seeded_inits, single_bending_model

    A = np.loadtxt(os.path.join(os.path.dirname(__file__), "data",
                                "simu.txt"))
    xbar = float(np.mean(np.log(A[:, 1])))
    va = float(np.var(np.log(A[:, 1])))
    spec = single_bending_model(A[:, 0], A[:, 1], A[:, 2], xbar, va,
                                n_components=10)
    C = 32
    z0 = np.asarray(advi_seeded_inits(
        spec, jax.random.PRNGKey(0), C, num_steps=400))
    assert z0.shape == (C, spec.prior.dim)
    assert np.all(np.isfinite(z0))
    # every seeded chain must start with a usable gradient: logpost
    # finite and far above the stranded-plateau values raw prior draws
    # land on (logl there ~ hundreds of nats below the posterior bulk)
    lp = np.asarray(jax.vmap(spec.logpost_unconstrained)(jnp.asarray(z0)))
    assert np.all(np.isfinite(lp))
    ml = 1533.8  # reference posterior-mean logl on this dataset (f64)
    assert np.all(lp > ml - 300.0), lp.min()


def test_chees_stepped_block_matches_scan():
    """block>1 host-stepping (several transitions per jitted program,
    the tunnel-safe throughput mode) is the same markov chain."""
    from pioran_tpu.samplers.chees import run_chees, run_chees_stepped

    logp = lambda z: -0.5 * jnp.sum(z**2)
    z0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    key = jax.random.PRNGKey(1)
    s_scan, st_scan = run_chees(logp, z0, key, num_warmup=60, num_samples=43)
    s_blk, st_blk = run_chees_stepped(
        logp, z0, key, num_warmup=60, num_samples=43, block=7)
    np.testing.assert_allclose(np.asarray(s_scan), s_blk, rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(st_scan["n_leapfrogs"]), st_blk["n_leapfrogs"])


def test_nuts_stepped_matches_vmapped_monolithic():
    """Host-stepped NUTS (run_nuts_stepped: short jitted blocks from a
    host loop) produces the same draws as jax.vmap(run_nuts) given the
    same per-chain keys — same kernel, same per-chain windowed
    adaptation (samplers/nuts.py make_nuts_transition)."""
    from pioran_tpu.samplers.nuts import run_nuts, run_nuts_stepped

    cov = jnp.array([[1.5, 0.7], [0.7, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda z: -0.5 * z @ prec @ z
    C = 4
    z0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2))
    keys = jax.random.split(jax.random.PRNGKey(1), C)
    s_mono, st_mono = jax.vmap(
        lambda z, k: run_nuts(logp, z, k, num_warmup=60, num_samples=40)
    )(z0, keys)  # (C, S, dim)
    # block=7 does not divide 100: exercises the ragged final block
    s_step, st_step = run_nuts_stepped(
        logp, z0, keys, num_warmup=60, num_samples=40, block=7)
    np.testing.assert_allclose(
        np.asarray(s_mono), s_step.transpose(1, 0, 2),
        rtol=1e-8, atol=1e-10)
    # identical trees: per-transition depths agree in the sampling phase
    np.testing.assert_array_equal(
        np.asarray(st_mono["depth"]).T, st_step["depth"][60:])
    # num_leaves is the exact leapfrog count: bounded by 2^depth
    assert np.all(st_step["num_leaves"] <= 2 ** st_step["depth"])
