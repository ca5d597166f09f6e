"""Likelihood + evidence parity for the double-bending and
periodic+rednoise models against the reference's stored ultranest runs.

Fixtures (numeric results only, no code):
- tests/data/simu_double/results.json — reference
  examples/ultranest/inference/simu_double/info/results.json:
  logZ = 1014.483 +- 0.215, 8 params (α₁, f₁, α₂, f₂, α₃, variance, ν, μ)
- tests/data/simu_periodic/results.json — reference
  examples/ultranest/inference/simu_periodic_rednoise_123_factor/info/
  results.json: logZ = 914.668 +- 0.238, 9 params (…, A, ϕ, T₀),
  sinusoidal CustomMean, no log-transform.

The fast tests pin the exact likelihood value at the stored
maximum-likelihood point (measured agreement ~1e-12 relative on CPU
f64), which verifies the full model chain — priors aside — bit-for-bit
against what ultranest actually evaluated. The slow tests rerun nested
sampling end-to-end and check logZ/moments.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _load(dirname, fname):
    d = os.path.join(HERE, "data", dirname)
    with open(os.path.join(d, "results.json")) as fh:
        stored = json.load(fh)
    path = os.path.join(d, fname)
    A = np.loadtxt(path)
    xbar = va = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#mean: "):
                left, right = line[len("#mean: "):].split(" va: ")
                xbar, va = float(left), float(right)
                break
    return stored, A[:, 0], A[:, 1], A[:, 2], xbar, va


@pytest.fixture(scope="module")
def double():
    return _load("simu_double", "simu_double_subset_time_series.txt")


@pytest.fixture(scope="module")
def periodic():
    return _load("simu_periodic",
                 "simu_periodic_rednoise_subset_time_series.txt")


# stored order a1 f1 a2 f2 a3 var nu mu -> spec order a1 a2 a3 f1 f2 var nu mu
DOUBLE_PERM = [0, 2, 4, 1, 3, 5, 6, 7]
# stored order a1 f1 a2 var nu mu A phi T0 -> spec order a1 a2 f1 var nu mu A phi T0
PERIODIC_PERM = [0, 2, 1, 3, 4, 5, 6, 7, 8]


def test_double_bending_loglike_matches_stored_ml(double):
    from pioran_tpu.inference import double_bending_model

    stored, t, y, yerr, xbar, va = double
    spec = double_bending_model(t, y, yerr, xbar, va)
    mlp = stored["maximum_likelihood"]["point"]
    theta = jnp.asarray([mlp[i] for i in DOUBLE_PERM])
    ll = float(jax.jit(spec.loglike)(theta))
    assert abs(ll - stored["maximum_likelihood"]["logl"]) < 1e-6, ll
    # posterior mean sits a few units below the MLE in loglike
    m = stored["posterior"]["mean"]
    llm = float(jax.jit(spec.loglike)(jnp.asarray([m[i] for i in DOUBLE_PERM])))
    assert stored["maximum_likelihood"]["logl"] - 30.0 < llm <= \
        stored["maximum_likelihood"]["logl"] + 1e-6


def test_periodic_rednoise_loglike_matches_stored_ml(periodic):
    from pioran_tpu.inference import periodic_rednoise_model

    stored, t, y, yerr, xbar, va = periodic
    spec = periodic_rednoise_model(t, y, yerr, xbar, va)
    mlp = stored["maximum_likelihood"]["point"]
    theta = jnp.asarray([mlp[i] for i in PERIODIC_PERM])
    ll = float(jax.jit(spec.loglike)(theta))
    assert abs(ll - stored["maximum_likelihood"]["logl"]) < 1e-6, ll
    m = stored["posterior"]["mean"]
    llm = float(
        jax.jit(spec.loglike)(jnp.asarray([m[i] for i in PERIODIC_PERM]))
    )
    assert stored["maximum_likelihood"]["logl"] - 30.0 < llm <= \
        stored["maximum_likelihood"]["logl"] + 1e-6


# NOTE r4: the slow double/periodic NS evidence reruns were deleted in
# favor of the committed on-TPU artifact gates (see
# tests/test_tpu_artifacts.py and the note in test_inference_parity.py).


# stored order a1 f1 a2 var nu mu c -> spec order a1 a2 f1 var nu mu c
DOCS_PERM = [0, 2, 1, 3, 4, 5, 6]


@pytest.fixture(scope="module")
def docs_run():
    return _load("simu_docs", "subset_time_series.txt")


def test_docs_use_c_loglike_matches_stored_ml(docs_run):
    """The docs workflow's 7-param model (flux offset c, log(y-c)
    transform, VARIANCE-normalised approximation — reference
    docs/src/single_pl.jl:63-100 and its stored run
    docs/src/data/inference/info/results.json): our likelihood at the
    stored maximum-likelihood point reproduces the stored logl
    (466.3183) to f64 precision only with is_integrated_power=False;
    the integrated-power default is 71 units off, pinning the mode the
    stored artifact used."""
    from pioran_tpu.inference import single_bending_model

    stored, t, y, yerr, xbar, va = docs_run
    spec = single_bending_model(
        t, y, yerr, xbar, va, use_c=True, alpha1_max=1.25,
        is_integrated_power=False,
    )
    mlp = stored["maximum_likelihood"]["point"]
    theta = jnp.asarray([mlp[i] for i in DOCS_PERM])
    ll = float(jax.jit(spec.loglike)(theta))
    assert abs(ll - stored["maximum_likelihood"]["logl"]) < 1e-6, ll
    m = stored["posterior"]["mean"]
    llm = float(jax.jit(spec.loglike)(jnp.asarray([m[i] for i in DOCS_PERM])))
    assert stored["maximum_likelihood"]["logl"] - 30.0 < llm <= \
        stored["maximum_likelihood"]["logl"] + 1e-6
