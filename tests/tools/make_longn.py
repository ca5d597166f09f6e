#!/usr/bin/env python
"""Generate the committed long-N (N=2^14) synthetic light curve for the
long-N f32 parity artifact (examples/tpu_parity.py --datasets longn).

Simulated IN THIS FRAMEWORK on CPU f64 from a known single-bending-PL
GP (exact O(N) prior draw, ops/celerite.py simulate), log-normal flux
with nu-scaled errors — the same generative model the reference's
simulated fixtures use (reference test/data/simu.txt provenance).
Deterministic: seed 0.
"""
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import pioran_tpu as pt
from pioran_tpu.ops import celerite as cel

TRUTH = dict(alpha1=0.4, f1=2e-3, alpha2=2.9, variance=0.04, nu=1.2,
             mu=0.25)
N = 2**14
rng = np.random.default_rng(0)
t = np.cumsum(0.3 + rng.exponential(0.7, N))
t -= t[0]
f_min = 1.0 / (t[-1] - t[0])
f_max = 0.5 / np.min(np.diff(t))
kern = pt.approx(
    pt.SingleBendingPowerLaw(TRUTH["alpha1"], TRUTH["f1"], TRUTH["alpha2"]),
    float(f_min), float(f_max), 20, TRUTH["variance"])
g = cel.simulate(jax.random.PRNGKey(0), kern, jnp.asarray(t),
                 jnp.zeros(N))  # noiseless GP draw of ln-flux
lny = np.asarray(g) + TRUTH["mu"]
y = np.exp(lny)
# relative errors; observed flux with nu-consistent noise:
# sigma_lny^2 = nu * yerr^2 / y^2  =>  draw ln-space noise accordingly
yerr = 0.03 * y
lny_obs = lny + np.sqrt(TRUTH["nu"]) * (yerr / y) * rng.standard_normal(N)
y_obs = np.exp(lny_obs)

out = os.path.join(HERE, "..", "data", "simu_longn", "longn_time_series.txt")
xbar = float(np.mean(np.log(y_obs)))
va = float(np.var(np.log(y_obs)))
with open(out, "w") as fh:
    fh.write("#truth: " + " ".join(
        f"{k}={v}" for k, v in TRUTH.items()) + "\n")
    fh.write(f"#mean: {xbar} va: {va}\n")
    np.savetxt(fh, np.column_stack([t, y_obs, yerr]), fmt="%.10g")
print("wrote", out, "N =", N, "xbar", xbar, "va", va)
