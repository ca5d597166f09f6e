"""Rank-normalized split-R̂ / bulk-tail ESS (Vehtari+ 2021) sanity checks.

The reference reports "ess" per inference run
(reference examples/ultranest/inference/simu_single/info/results.json);
these tests pin our MCMC-side implementation on analytically known
chains: IID (tau = 1), AR(1) (tau = (1+rho)/(1-rho)) and shifted chains
(R̂ far above 1)."""

import numpy as np

from pioran_tpu.utils.mcmc_stats import (
    ess_bulk,
    ess_tail,
    split_rhat,
    summarize_chains,
)


def _ar1(rng, C, S, rho):
    z = np.zeros((C, S))
    innov = rng.normal(size=(C, S)) * np.sqrt(1 - rho * rho)
    for i in range(1, S):
        z[:, i] = rho * z[:, i - 1] + innov[:, i]
    return z


def test_iid_chains_full_efficiency():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1000))
    assert abs(split_rhat(x) - 1.0) < 0.01
    assert 0.8 * 4000 < ess_bulk(x) < 1.25 * 4000
    assert 0.7 * 4000 < ess_tail(x) < 1.4 * 4000


def test_ar1_chains_match_analytic_tau():
    rng = np.random.default_rng(1)
    rho = 0.9
    x = _ar1(rng, 8, 2000, rho)
    tau = (1 + rho) / (1 - rho)  # = 19
    ess = ess_bulk(x)
    assert 0.5 * 16000 / tau < ess < 2.0 * 16000 / tau, ess
    assert split_rhat(x) < 1.05


def test_nonconverged_chains_flagged():
    rng = np.random.default_rng(2)
    x = np.stack([rng.normal(size=1000), rng.normal(size=1000) + 5.0])
    assert split_rhat(x) > 1.5
    # heavy disagreement also collapses the bulk ESS
    assert ess_bulk(x) < 100


def test_summarize_multiparam_shapes():
    rng = np.random.default_rng(3)
    s = summarize_chains(rng.normal(size=(4, 500, 3)))
    assert len(s["rhat"]) == 3
    assert len(s["ess_bulk"]) == 3
    assert len(s["ess_tail"]) == 3
    assert all(abs(r - 1) < 0.02 for r in s["rhat"])


def test_rank_normalization_robust_to_heavy_tails():
    """Cauchy chains: moment-based R̂ fails, rank-normalized must not."""
    rng = np.random.default_rng(4)
    x = rng.standard_cauchy(size=(4, 2000))
    r = split_rhat(x)
    assert np.isfinite(r) and r < 1.05
