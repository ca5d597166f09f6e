"""Diagnostics tests: LSP correctness vs scipy/astropy formulas, artifact
structure of the prior/posterior predictive checks (reference
test/test_plots.jl asserts figure structure; here we assert the txt
artifacts + finite numerics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu import SingleBendingPowerLaw, approx
from pioran_tpu.diagnostics import (
    lombscargle,
    run_diagnostics,
    run_posterior_predict_checks,
    sample_approx_model,
)
from pioran_tpu.models.gp import ScalableGP


def test_lombscargle_vs_scipy():
    """GLS reduces to scipy's lombscargle result shape; peak at the true
    frequency of a sinusoid."""
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, 300))
    f_true = 0.43
    y = 1.3 * np.sin(2 * np.pi * f_true * t + 0.4) + 0.2 * rng.normal(size=300)
    yerr = 0.2 * np.ones_like(t)
    freqs = np.linspace(0.01, 1.0, 500)
    p = np.asarray(lombscargle(t, y, yerr, freqs))
    assert p.shape == (500,)
    assert np.all((p >= -1e-9) & (p <= 1 + 1e-9))
    assert abs(freqs[np.argmax(p)] - f_true) < 0.01


def test_lombscargle_matches_astropy_if_available():
    try:
        from astropy.timeseries import LombScargle as AstropyLS
    except ImportError:
        pytest.skip("astropy not installed")
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 50, 200))
    y = np.sin(2 * np.pi * 0.3 * t) + 0.5 * rng.normal(size=200)
    dy = 0.5 * np.ones_like(t)
    freqs = np.linspace(0.02, 1.0, 300)
    ours = np.asarray(lombscargle(t, y, dy, freqs))
    theirs = AstropyLS(t, y, dy, fit_mean=True).power(freqs, normalization="standard")
    np.testing.assert_allclose(ours, np.asarray(theirs), rtol=1e-6, atol=1e-9)


def test_run_diagnostics_artifacts(tmp_path):
    rng = np.random.default_rng(2)
    P = 20
    prior_samples = np.vstack([
        rng.uniform(0.1, 1.0, P),      # alpha_1
        10 ** rng.uniform(-2, -1, P),  # f_1
        rng.uniform(2.0, 3.5, P),      # alpha_2
    ])
    norms = 10 ** rng.uniform(-2, 0, P)
    path = str(tmp_path) + "/"
    figs, psd, psd_approx, f = run_diagnostics(
        prior_samples, norms, 1e-3, 1e1, SingleBendingPowerLaw,
        path=path, make_figures=True,
    )
    for name in ("mean_psd_approx.txt", "quantiles_psd_approx.txt",
                 "boxplot_psd_approx.txt", "diagnostics_psd_approx.png",
                 "quantiles_psd_approx.png", "boxplot_psd_approx.png"):
        assert os.path.exists(os.path.join(path, name)), name
    mean_data = np.loadtxt(os.path.join(path, "mean_psd_approx.txt"))
    assert mean_data.shape == (1000, 3)
    assert np.all(np.isfinite(mean_data))
    # ratios hover around 1 inside the observed band
    q = np.loadtxt(os.path.join(path, "quantiles_psd_approx.txt"))
    inside = (q[:, 0] > 1e-3) & (q[:, 0] < 1e1)
    assert np.all(np.abs(q[inside, 8] - 1.0) < 0.05)  # median ratio column


def test_run_ppc_artifacts(tmp_path, simu_log_data):
    t, y, yerr = simu_log_data
    t, y, yerr = t[:80], np.exp(y[:80]), yerr[:80]
    rng = np.random.default_rng(3)
    P = 12
    samples = np.column_stack([
        rng.uniform(0.3, 1.0, P),
        10 ** rng.uniform(-2.3, -1.7, P),
        rng.uniform(2.5, 3.2, P),
        10 ** rng.uniform(-1.8, -1.2, P),
        rng.uniform(0.8, 1.3, P),
        rng.normal(1.55, 0.05, P),
    ])
    paramnames = ["a1", "f1", "a2", "variance", "nu", "mu"]
    split = {"psd": ["a1", "f1", "a2"], "norm": "variance",
             "scale_err": "nu", "mean": "mu", "log_transform": "c"}

    f_min = 1.0 / (t[-1] - t[0])
    f_max = 1.0 / np.min(np.diff(t)) / 2.0

    def gp_model(tt, yy, ee, params):
        kern = approx(
            SingleBendingPowerLaw(params[0], params[1], params[2]),
            f_min, f_max, 20, params[3],
        )
        s2 = params[4] * jnp.asarray(ee) ** 2 / jnp.asarray(yy) ** 2
        return ScalableGP(params[5], kern)(jnp.asarray(tt), s2)

    path = str(tmp_path) + "/"
    figs = run_posterior_predict_checks(
        samples, paramnames, split, t, y, yerr,
        SingleBendingPowerLaw, gp_model, True,
        n_samples=P, path=path, key=jax.random.PRNGKey(0),
    )
    for name in ("psd_ppc_data.txt", "psd_noise_levels.txt",
                 "lsp_ppc_data.txt", "binned_lsp_data.txt",
                 "ppc_timeseries_quantiles.txt", "ppc_residuals_quantiles.txt",
                 "ppc_residuals_mean.txt", "ppc_t_pred.txt",
                 "ppc_residuals_acvf.txt",
                 "psd_ppc.png", "LSP_ppc.png", "TS_ppc.png",
                 "residuals_diagnostics.png"):
        assert os.path.exists(os.path.join(path, name)), name
    psd_q = np.loadtxt(os.path.join(path, "psd_ppc_data.txt"))
    assert psd_q.shape == (11, 1000)
    assert np.all(np.isfinite(psd_q))
    res_mean = np.loadtxt(os.path.join(path, "ppc_residuals_mean.txt"))
    assert res_mean.shape == (80,)
    # standardized residuals should be O(1)
    assert np.abs(res_mean).mean() < 5.0
