#!/usr/bin/env python
"""Importance-sampling referee for the posterior-parity tolerance.

The parity tests (tests/test_inference_parity.py) allow posterior-mean
pulls up to 0.75 sd against the stored ultranest run of simu_single —
a tolerance that brackets the STORED baseline's own sampling bias, not
ours. This script is the evidence: a self-normalized importance-sampling
estimate of the true posterior mean using the exact likelihood (the same
jitted chain the samplers use) under a wide multivariate-t proposal
centered on the stored posterior. With ESS in the thousands, the IS
means carry standard errors ~sd/sqrt(ESS) — an independent referee that
does not share MCMC/NS shrinkage pathologies with either sampler.

    python tests/tools/is_referee.py [--draws 1000000] [--dof 4]
        [--out tests/data/simu_single/is_referee.json]

Writes the IS posterior means/stds, the IS ESS, and the pulls of both
the stored ultranest means and (if present) our committed TPU NS means
against the referee. Run on TPU for speed (f32 likelihood; the referee
averages over 10^6 draws, so f32 eval noise ~1e-4 is negligible).
"""

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

DATA = os.path.join(HERE, "..", "data", "simu_single")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--dof", type=float, default=4.0)
    ap.add_argument("--scale", type=float, default=1.7,
                    help="proposal scale in units of stored posterior sd")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(DATA, "is_referee.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pioran_tpu.inference import single_bending_model

    with open(os.path.join(DATA, "results.json")) as fh:
        stored = json.load(fh)
    path = os.path.join(DATA, "simu_single_subset_time_series.txt")
    A = np.loadtxt(path)
    xbar = va = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#mean: "):
                left, right = line[len("#mean: "):].split(" va: ")
                xbar, va = float(left), float(right)
                break
    spec = single_bending_model(A[:, 0], A[:, 1], A[:, 2], xbar, va)
    prior = spec.prior

    # stored reporting order (a1, f1, a2, var, nu, mu) -> spec order
    perm = [0, 2, 1, 3, 4, 5]
    mu_ref = np.asarray(stored["posterior"]["mean"])[perm]
    sd_ref = np.asarray(stored["posterior"]["stdev"])[perm]

    # proposal in UNCONSTRAINED space: multivariate-t centered on the
    # transformed stored mean, diagonal scale from transformed +-1 sd
    to_u = jax.jit(jax.vmap(prior.to_unconstrained))
    z_mid = np.asarray(to_u(jnp.asarray(mu_ref)[None, :]))[0]
    z_hi = np.asarray(to_u(jnp.asarray(mu_ref + 0.5 * sd_ref)[None, :]))[0]
    z_lo = np.asarray(to_u(jnp.asarray(mu_ref - 0.5 * sd_ref)[None, :]))[0]
    z_scale = args.scale * (z_hi - z_lo)  # ~ args.scale * sd in z-space
    dim = z_mid.size
    dof = args.dof

    def log_t(z):
        u = (z - z_mid) / z_scale
        r2 = jnp.sum(u * u)
        from jax.scipy.special import gammaln

        return (
            gammaln((dof + dim) / 2.0) - gammaln(dof / 2.0)
            - 0.5 * dim * jnp.log(dof * jnp.pi) - jnp.sum(jnp.log(z_scale))
            - 0.5 * (dof + dim) * jnp.log1p(r2 / dof)
        )

    def logpost_batch(Z):
        lp = jax.vmap(prior.unconstrained_logpdf)(Z)
        TH = jax.vmap(prior.from_unconstrained)(Z)
        return lp + spec.loglike_batch(TH), TH

    @jax.jit
    def weigh(key):
        g = jax.random.normal(key, (args.batch, dim))
        chi2 = 2.0 * jax.random.gamma(
            jax.random.fold_in(key, 1), dof / 2.0, (args.batch, 1))
        Z = z_mid + z_scale * g / jnp.sqrt(chi2 / dof)
        lp, TH = logpost_batch(Z)
        lq = jax.vmap(log_t)(Z)
        return lp - lq, TH

    n_batches = args.draws // args.batch
    logw_all, th_all = [], []
    key = jax.random.PRNGKey(args.seed)
    for i in range(n_batches):
        logw, TH = weigh(jax.random.fold_in(key, i))
        logw_all.append(np.asarray(logw, np.float64))
        th_all.append(np.asarray(TH, np.float64))
    logw = np.concatenate(logw_all)
    TH = np.concatenate(th_all)
    good = np.isfinite(logw)
    logw = np.where(good, logw, -np.inf)
    logw -= logw.max()
    w = np.exp(logw)
    w /= w.sum()
    ess = 1.0 / np.sum(w * w)
    mean_is = (w[:, None] * TH).sum(axis=0)
    var_is = (w[:, None] * (TH - mean_is) ** 2).sum(axis=0)
    sd_is = np.sqrt(var_is)
    se_is = sd_is / np.sqrt(ess)

    pull_stored = (mu_ref - mean_is) / sd_is
    out = {
        "draws": int(good.sum()),
        "ess": float(ess),
        "proposal": {"dof": dof, "scale_sd": args.scale},
        "paramnames_spec_order": spec.names,
        "is_mean": mean_is.tolist(),
        "is_std": sd_is.tolist(),
        "is_se": se_is.tolist(),
        "stored_mean_spec_order": mu_ref.tolist(),
        "stored_pull_vs_referee": pull_stored.tolist(),
        "max_stored_pull": float(np.abs(pull_stored).max()),
    }
    tpu_res = os.path.join(
        HERE, "..", "..", "artifacts", "tpu_parity", "single_ns",
        "info", "results.json")
    if os.path.exists(tpu_res):
        with open(tpu_res) as fh:
            ours = json.load(fh)
        m = np.asarray(ours["posterior"]["mean"])
        out["tpu_ns_mean_spec_order"] = m.tolist()
        out["tpu_ns_pull_vs_referee"] = ((m - mean_is) / sd_is).tolist()
        out["max_tpu_ns_pull"] = float(np.abs((m - mean_is) / sd_is).max())

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2, ensure_ascii=False)
    print(json.dumps(out, indent=2)[:2000])
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
