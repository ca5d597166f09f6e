"""Validate the COMMITTED on-TPU inference artifacts against the
reference's stored ultranest baselines.

The slow end-to-end parity tests (tests/test_inference_parity.py,
tests/test_parity_models.py) rerun nested sampling; this module checks
the committed evidence that those gates PASS on the real chip:
artifacts/tpu_parity/ holds results.json + equal-weighted posteriors
produced by ``python examples/tpu_parity.py`` on a TPU v5e in f32
(regenerate any time with that one command). Gates per dataset:

- logZ within tolerance of the stored ultranest logZ
  (reference examples/ultranest/inference/*/info/results.json)
- every posterior-mean pull < tolerance (see the calibration note in
  tests/test_inference_parity.py; the IS referee lives in
  tests/tools/is_referee.py with its snapshot in
  tests/data/simu_single/is_referee.json)
- the artifact really came from a TPU run (platform recorded)
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "tpu_parity")
DATA = os.path.join(os.path.dirname(__file__), "data")

STORED = {
    "single": "simu_single",
    "double": "simu_double",
    "periodic": "simu_periodic",
    "docs": "simu_docs",
}


@pytest.fixture(scope="module")
def summary():
    path = os.path.join(ART, "summary.json")
    if not os.path.exists(path):
        pytest.skip("no committed TPU artifacts (run examples/tpu_parity.py)")
    with open(path) as fh:
        return json.load(fh)


def test_artifacts_are_from_tpu(summary):
    assert summary["platform"] == "tpu", summary["platform"]
    assert not summary["x64"], "parity must be proven in f32"


@pytest.mark.parametrize("sampler", ["ns", "smc"])
@pytest.mark.parametrize("name", ["single", "double", "periodic", "docs"])
def test_ns_parity_gates(summary, name, sampler):
    runs = {k: v for k, v in summary["runs"].items()
            if v["dataset"] == name and v["sampler"] == sampler}
    if not runs:
        pytest.skip(f"no committed {name} {sampler} run")
    entry = next(iter(runs.values()))
    assert entry["pass"], entry
    assert abs(entry["logz_diff"]) < entry["logz_tol"], entry
    # with a referee the stored-mean tolerance widens by the stored
    # run's own demonstrated bias (see examples/tpu_parity.py)
    assert entry["max_pull"] < entry.get(
        "pull_tol_effective", entry["pull_tol"]), entry
    # Width gates. Ground truth is the committed 10^6-draw IS referee
    # (tests/tools/is_referee.py): gate widths TIGHTLY against it.
    # The stored-ultranest width ratio stays a loose sanity bound only,
    # because the referee showed the stored runs themselves are
    # underdispersed (simu_single f1 width = 0.61x referee, ~30 IS
    # standard errors low — our samplers sit within a few %, which is
    # exactly why the ultranest-relative ratio reads ~1.6 there).
    wr = np.asarray(entry["width_ratio"])
    assert np.all((wr > 0.5) & (wr < 2.0)), wr
    if "width_ratio_referee" in entry:
        wrr = np.asarray(entry["width_ratio_referee"])
        # [0.8, 1.25] +- 3 IS standard errors of the referee's own
        # width estimate (recorded by examples/tpu_parity.py)
        w_lo, w_hi = entry.get("width_gate_referee", (0.75, 1.33))
        assert np.all((wrr > w_lo) & (wrr < w_hi)), (wrr, w_lo, w_hi)
        assert entry["max_pull_referee"] < 0.5, entry["max_pull_referee"]
    if sampler == "ns" and "insertion_order_MWW_test" in entry:
        # the real insertion-rank uniformity diagnostic must pass on
        # the committed runs (ultranest reports the same field)
        assert entry["insertion_order_MWW_test"]["converged"], entry[
            "insertion_order_MWW_test"]


@pytest.mark.parametrize("name", ["single", "double", "periodic", "docs"])
def test_artifact_files_consistent(summary, name):
    """The per-run results.json + posterior text file must exist and
    agree with the summary (no hand-edited summaries)."""
    runs = {k: v for k, v in summary["runs"].items()
            if v["dataset"] == name and v["sampler"] == "ns"}
    if not runs:
        pytest.skip(f"no committed {name} NS run")
    tag, entry = next(iter(runs.items()))
    rpath = os.path.join(ART, tag, "info", "results.json")
    assert os.path.exists(rpath), rpath
    with open(rpath) as fh:
        res = json.load(fh)
    assert abs(res["logz"] - entry["logz"]) < 1e-6
    post = os.path.join(ART, tag, "chains", "equal_weighted_post.txt")
    assert os.path.exists(post), post
    theta = np.loadtxt(post, skiprows=1)
    # summary pulls recompute from the stored baseline + artifact moments
    with open(os.path.join(DATA, STORED[name], "results.json")) as fh:
        stored = json.load(fh)
    mean = theta.mean(axis=0)
    assert np.allclose(mean, res["posterior"]["mean"], atol=1e-5)
    assert len(res["posterior"]["mean"]) == len(stored["posterior"]["mean"])


def test_loglike_matches_artifact_ml_point():
    """Recompute the likelihood at the committed run's ML point on CPU
    f64: the artifact's logl must agree to f32 eval precision — ties the
    committed artifacts to THIS code, not just to plausible numbers."""
    path = os.path.join(ART, "summary.json")
    if not os.path.exists(path):
        pytest.skip("no committed TPU artifacts")
    rpath = os.path.join(ART, "single_ns", "info", "results.json")
    if not os.path.exists(rpath):
        pytest.skip("no committed single_ns run")
    import jax
    import jax.numpy as jnp

    from pioran_tpu.inference import single_bending_model

    with open(rpath) as fh:
        res = json.load(fh)
    sub = np.loadtxt(
        os.path.join(DATA, "simu_single", "simu_single_subset_time_series.txt"))
    xbar = va = None
    with open(os.path.join(
            DATA, "simu_single", "simu_single_subset_time_series.txt")) as fh:
        for line in fh:
            if line.startswith("#mean: "):
                left, right = line[len("#mean: "):].split(" va: ")
                xbar, va = float(left), float(right)
                break
    spec = single_bending_model(sub[:, 0], sub[:, 1], sub[:, 2], xbar, va)
    ll = float(jax.jit(spec.loglike)(jnp.asarray(res["maximum_likelihood"]["point"])))
    # artifact logl is a TPU f32 evaluation: observed f32-vs-f64 deviation
    # at logL ~ 1e3 over ~500 scan steps is ~0.09 absolute (~9e-5
    # relative; same scale as the verify-drive measurement 1533.90 vs
    # 1533.82), so gate at 0.3 absolute.
    assert abs(ll - res["maximum_likelihood"]["logl"]) < 0.3, (
        ll, res["maximum_likelihood"]["logl"])


def test_kernel_check_tolerances():
    """The committed on-TPU (non-interpret) Pallas kernel check
    (examples/tpu_kernel_check.py) must pass its documented f32
    tolerances on every case, on a real chip."""
    path = os.path.join(ART, "..", "tpu_kernel_check.json")
    if not os.path.exists(path):
        pytest.skip("no committed kernel check (run examples/tpu_kernel_check.py)")
    with open(path) as fh:
        rep = json.load(fh)
    assert rep["pass"], rep
    assert rep["interpret"] is False
    assert "TPU" in rep["device"] or "tpu" in rep["device"], rep["device"]
    for name, case in rep["cases"].items():
        assert case["max_rel_err_loglike"] < case["tol_loglike"], (name, case)
        assert case["max_rel_err_grad"] < case["tol_grad"], (name, case)


def test_carma_parity_self_consistency(summary):
    """Committed CARMA(2,1) on-TPU runs: NS and SMC must agree
    (no stored reference posterior exists for CARMA — the reference
    pins only coefficients, test/test_carma.jl:62-69)."""
    runs = {k: v for k, v in summary["runs"].items()
            if v["dataset"] == "carma"}
    if not runs:
        pytest.skip("no committed CARMA parity runs")
    assert set(r["sampler"] for r in runs.values()) == {"ns", "smc"}
    for entry in runs.values():
        assert entry["pass"], entry
        assert abs(entry["logz_diff_cross_sampler"]) < 1.5
        assert entry["cross_sampler_max_pull"] < 0.5
        wr = np.asarray(entry["cross_sampler_width_ratio"])
        assert np.all((wr > 0.75) & (wr < 1.33)), wr


def test_carma_ml_point_recompute():
    """Recompute the committed CARMA run's ML likelihood on CPU f64 —
    ties the artifact to this code's CARMA chain (partial fractions +
    real-arithmetic celerite map, models/carma.py)."""
    path = os.path.join(ART, "summary.json")
    if not os.path.exists(path):
        pytest.skip("no committed TPU artifacts")
    with open(path) as fh:
        summary = json.load(fh)
    entry = summary["runs"].get("carma_ns")
    if entry is None:
        pytest.skip("no committed CARMA NS run")
    import jax
    import jax.numpy as jnp

    from pioran_tpu.inference import carma_model

    sub = np.loadtxt(os.path.join(
        DATA, "simu_single", "simu_single_subset_time_series.txt"))
    xbar = va = None
    with open(os.path.join(
            DATA, "simu_single", "simu_single_subset_time_series.txt")) as fh:
        for line in fh:
            if line.startswith("#mean: "):
                left, right = line[len("#mean: "):].split(" va: ")
                xbar, va = float(left), float(right)
                break
    spec = carma_model(sub[:, 0], sub[:, 1], sub[:, 2], xbar, va, p=2, q=1)
    ll = float(jax.jit(spec.loglike)(jnp.asarray(entry["ml_point"])))
    assert abs(ll - entry["ml_logl"]) < 0.3, (ll, entry["ml_logl"])


def test_longn_f32_parity(summary):
    """Committed long-N (N=2^14) f32 SMC artifact: posterior covers the
    generative truth, and the ML-point likelihood recomputes on CPU f64
    within 1 nat — the long-series f32 accuracy the Kahan-compensated
    accumulators provide (pre-compensation the r3 grid showed ~N eps
    error growth, ~30 nats at this N and logl scale)."""
    entry = summary["runs"].get("longn_smc")
    if entry is None:
        pytest.skip("no committed long-N run")
    assert entry["pass"], entry
    assert entry["max_pull_vs_truth"] < 4.0

    import jax
    import jax.numpy as jnp

    from pioran_tpu.inference import single_bending_model

    path = os.path.join(DATA, "simu_longn", "longn_time_series.txt")
    A = np.loadtxt(path)
    xbar = va = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#mean: "):
                left, right = line[len("#mean: "):].split(" va: ")
                xbar, va = float(left), float(right)
    spec = single_bending_model(A[:, 0], A[:, 1], A[:, 2], xbar, va)
    ll = float(jax.jit(spec.loglike)(jnp.asarray(entry["ml_point"])))
    assert abs(ll - entry["ml_logl"]) < 1.0, (ll, entry["ml_logl"])


def test_chees_gradient_path_parity(summary):
    """The gradient-path flagship proof (VERDICT r4 #1): a committed
    on-TPU ChEES-HMC run on simu_single from DISPERSED (overdispersed-
    ADVI) inits must pass the same referee pull/width gates as the
    NS/SMC runs AND converge (rank-normalized split-rhat <= 1.02 across
    all parameters) — end-to-end evidence for the hand-adjoint kernel
    stack (ops/pallas_celerite_vjp.py)."""
    runs = {k: v for k, v in summary["runs"].items()
            if v["sampler"] in ("chees", "nuts")}
    if not runs:
        pytest.skip("no committed gradient-sampler parity run "
                    "(run examples/tpu_parity.py --samplers chees)")
    # at least the flagship dataset must be covered
    assert any(v["dataset"] == "single" for v in runs.values()), (
        list(runs))
    for tag, entry in runs.items():
        assert entry["pass"], (tag, entry)
        assert entry["rhat_max"] <= 1.02, (tag, entry["rhat_max"])
        assert entry["init"] == "advi-dispersed", tag
        assert entry["max_pull"] < entry.get(
            "pull_tol_effective", entry["pull_tol"]), (tag, entry)
        if "width_ratio_referee" in entry:
            wrr = np.asarray(entry["width_ratio_referee"])
            w_lo, w_hi = entry.get("width_gate_referee", (0.75, 1.33))
            assert np.all((wrr > w_lo) & (wrr < w_hi)), (tag, wrr)
            assert entry["max_pull_referee"] < 0.5, (
                tag, entry["max_pull_referee"])
