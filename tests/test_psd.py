"""PSD model + approximation tests (mirrors reference test/test_psd.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pioran_tpu import (
    DoubleBendingPowerLaw,
    PowerLaw,
    QPO,
    SingleBendingPowerLaw,
    approx,
    approximated_psd,
    get_approx_coefficients,
)
from pioran_tpu.ops import approx as approx_mod

# Golden 20-vector from reference test/test_psd.jl:38
GOLDEN_AMPLITUDES = np.array([
    1.3749158408973243, 0.26031747510091013, 0.06961116778917277,
    0.013679642568525807, 0.0037949128465199307, 0.0008858780578830132,
    0.00023278915565955668, 5.714159750636342e-5, 1.463191298808472e-5,
    3.6532013241322788e-6, 9.262211884550235e-7, 2.3267166983266322e-7,
    5.877072005450016e-8, 1.4801031386988674e-8, 3.728877337268077e-9,
    9.44575715327315e-10, 2.3313738171903584e-10, 6.377629826311069e-11,
    1.119218106083312e-11, 6.962520986945091e-12,
])


def test_single_bending_power_law():
    ps = SingleBendingPowerLaw(0.3, 0.02, 2.93)
    f = 10 ** np.linspace(-3, 2, 1000)
    expected = (f / 0.02) ** (-0.3) / (1 + (f / 0.02) ** (2.93 - 0.3))
    np.testing.assert_allclose(ps(f), expected, rtol=1e-15)


def test_double_bending_power_law():
    ds = DoubleBendingPowerLaw(0.3, 0.02, 1.4, 10.2, 2.93)
    f = 10 ** np.linspace(-3, 3, 1000)
    expected = (
        (f / 0.02) ** (-0.3)
        / (1 + (f / 0.02) ** (1.4 - 0.3))
        / (1 + (f / 10.2) ** (2.93 - 1.4))
    )
    np.testing.assert_allclose(ds(f), expected, rtol=1e-15)


def test_spectral_grid():
    f0, fM, J = 0.02, 1.52e2, 20
    pts = approx_mod.spectral_grid(J, f0, fM)
    assert pts.shape == (J,)
    expected = f0 * ((fM / f0) ** (1 / (J - 1))) ** np.arange(J)
    np.testing.assert_allclose(pts, expected, rtol=1e-14)


def test_golden_coefficients():
    """Exact amplitude vector pinned by reference test/test_psd.jl:38."""
    ps = SingleBendingPowerLaw(0.3, 0.02, 2.93)
    a = get_approx_coefficients(ps, 0.02, 1.52e2, n_components=20)
    np.testing.assert_allclose(np.asarray(a), GOLDEN_AMPLITUDES, rtol=1e-8)


ALPHA1 = [0.2, 0.03, 0.1, 0.46, 0.1, 0.21, 0.74, 0.1, 0.03, 0.92]
F1 = [1.3e-2, 1.32e-1, 5.53e-2, 3.3, 0.342, 3.2e1, 1.3, 4.0e1, 1.0e-2, 0.5]
ALPHA2_SHO = [3.2, 3.1, 2.3, 2.57, 3.6, 2.3, 2.1, 2.79, 3.3, 3.8]
ALPHA2_DRW = [4.2, 3.1, 4.3, 5.57, 4.6, 2.3, 5.1, 2.79, 4.3, 5.8]
VARIANCES = [1.32, 35.3, 242.2, 46.6, 0.3, 0.244, 9.64, 0.75, 0.193, 0.21]


@pytest.mark.parametrize("i", range(10))
def test_approx_psd_sho(i):
    """Approximation accuracy < 1e-2 across shapes (reference test_psd.jl:41-59)."""
    f0, fM, J = 2.0e-3, 3.52e2, 25
    f = 10 ** np.linspace(np.log10(f0), np.log10(fM), 1000)
    ps = SingleBendingPowerLaw(ALPHA1[i], F1[i], ALPHA2_SHO[i])
    papprox = np.asarray(approximated_psd(f, ps, f0, fM, n_components=J))
    model = np.asarray(ps(f))
    np.testing.assert_allclose(model / model[0], papprox / papprox[0], atol=1e-2)


@pytest.mark.parametrize("i", range(10))
def test_approx_psd_drwcelerite(i):
    f0, fM, J = 2.0e-3, 3.52e2, 35
    f = 10 ** np.linspace(np.log10(f0), np.log10(fM), 1000)
    ps = SingleBendingPowerLaw(ALPHA1[i], F1[i], ALPHA2_DRW[i])
    papprox = np.asarray(
        approximated_psd(f, ps, f0, fM, n_components=J, basis_function="DRWCelerite")
    )
    model = np.asarray(ps(f))
    np.testing.assert_allclose(model / model[0], papprox / papprox[0], atol=1e-2)


@pytest.mark.parametrize("i", range(10))
def test_approx_psd_powerlaw(i):
    alphas = [1.8, 1.03, 2.1, 0.46, 1.1, 0.21, 0.74, 0.92, 1.12, 1.25]
    f0, fM, J = 2.0e-3, 3.52e2, 50
    f = 10 ** np.linspace(np.log10(f0), np.log10(fM), 1000)
    ps = PowerLaw(alphas[i])
    papprox = np.asarray(approximated_psd(f, ps, f0, fM, n_components=J))
    model = np.asarray(ps(f))
    np.testing.assert_allclose(model / model[0], papprox / papprox[0], atol=1e-2)


@pytest.mark.parametrize("basis", ["SHO", "DRWCelerite"])
@pytest.mark.parametrize("i", range(10))
def test_variance_normalisation(i, basis):
    """k(0) == requested variance (reference test_psd.jl:100-153)."""
    f_min, f_max, J = 2.0e-3, 3.52e2, 25
    alpha2 = ALPHA2_SHO if basis == "SHO" else ALPHA2_DRW
    ps = SingleBendingPowerLaw(ALPHA1[i], F1[i], alpha2[i])
    kern = approx(ps, f_min, f_max, J, VARIANCES[i],
                  is_integrated_power=False, basis_function=basis)
    np.testing.assert_allclose(float(kern(0.0)), VARIANCES[i], rtol=1e-10)
    expected_terms = J if basis == "SHO" else 2 * J
    assert kern.num_terms == expected_terms


@pytest.mark.parametrize("i", range(10))
def test_integrated_power_normalisation(i):
    """Band power equals norm; analytic integral vs quadrature
    (reference test_psd.jl:155-178)."""
    from scipy.integrate import quad

    f_min, f_max, J = 1.0e-3, 3.52e2, 25
    va = VARIANCES[i]
    ps = SingleBendingPowerLaw(ALPHA1[i], F1[i], ALPHA2_SHO[i])
    kern = approx(ps, f_min, f_max, J, va)
    points = kern.c / (np.sqrt(2) * np.pi)
    amps = kern.a / (points * np.pi / np.sqrt(2))
    integ = approx_mod.integrate_basis_function(amps, points, f_min, f_max, "SHO")
    np.testing.assert_allclose(float(integ), va, rtol=1e-8)

    # analytic band integral ~ quadrature of the (normalised) model PSD
    f0 = f_min / 20.0
    pts = approx_mod.spectral_grid(J, f0, f_max * 20.0)
    amps2 = get_approx_coefficients(ps, f0, f_max * 20.0, n_components=J)
    integ2 = approx_mod.integrate_basis_function(amps2, pts, f_min, f_max, "SHO")
    quad_val, _ = quad(
        lambda x: float(ps(x)) / float(ps(f0)), f_min, f_max, limit=400
    )
    np.testing.assert_allclose(float(integ2), quad_val, rtol=1e-2)


def test_qpo_term_counts():
    """QPO features add exact terms: J+1 / J+2 (SHO), 2J+1 / 2J+2 (DRWCelerite)
    (reference test_psd.jl:206-285)."""
    f_min, f_max, J = 2.0e-3, 3.52e2, 25
    va = 1.32
    base = SingleBendingPowerLaw(0.2, 1.3e-2, 3.2)
    k1 = approx(base + QPO(2.0, 1.0e-2, 14.2), f_min, f_max, J, va,
                is_integrated_power=False)
    assert k1.num_terms == J + 1
    k2 = approx(base + QPO(2.0, 1.0e-2, 14.2) + QPO(4.0, 1.0e-1, 4.2),
                f_min, f_max, J, va, is_integrated_power=False)
    assert k2.num_terms == J + 2
    base_d = SingleBendingPowerLaw(0.2, 1.3e-2, 4.2)
    k3 = approx(base_d + QPO(1.4, 1.0e-2, 10.2), f_min, f_max, J, va,
                is_integrated_power=False, basis_function="DRWCelerite")
    assert k3.num_terms == 2 * J + 1
    k4 = approx(base_d + QPO(1.4, 1.0e-2, 10.2) + QPO(2.4, 5.0e-2, 12.2),
                f_min, f_max, J, va, is_integrated_power=False,
                basis_function="DRWCelerite")
    assert k4.num_terms == 2 * J + 2


def test_integral_celerite_vs_quadrature():
    """Celerite PSD band integral vs quadrature to 1e-10
    (reference test_covariancefunctions.jl:49-55)."""
    from scipy.integrate import quad

    from pioran_tpu import celerite_psd

    a, b, c, d = 3.3, 0.2, 0.3, 2.2
    x1, x2 = 1e-2, 1e1
    num, _ = quad(lambda x: float(celerite_psd(x, a, b, c, d)), x1, x2,
                  limit=800, epsabs=1e-13, epsrel=1e-12)
    ana = float(
        approx_mod.integral_celerite(a, b, c, d, x2)
        - approx_mod.integral_celerite(a, b, c, d, x1)
    )
    np.testing.assert_allclose(num, ana, rtol=1e-9)


def test_approx_is_differentiable():
    """grad of band power w.r.t. PSD params is finite (new capability:
    the reference needs ForwardDiff; here reverse-mode flows through the
    JxJ solve)."""
    import jax

    def bandpower_a1(params):
        ps = SingleBendingPowerLaw(params[0], params[1], params[2])
        kern = approx(ps, 1e-3, 1e2, 20, params[3])
        return jnp.sum(kern.a)

    g = jax.grad(bandpower_a1)(jnp.array([0.5, 0.01, 3.0, 1.3]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_root_namespace_matches_reference_exports():
    """Every name the reference exports from its root module
    (reference src/Pioran.jl:19-25) resolves at the pioran_tpu package
    root too, so a Pioran.jl user finds the full surface in one place.
    (mean/cov/std are PosteriorGP methods; evaluate is the kernel
    __call__; get_covariance_from_psd is approx — idiomatic renames.)"""
    import pioran_tpu as pt

    for name in [
        "SHO", "Exp", "CARMA",  # src/Pioran.jl:19 (Celerite -> celerite_term)
        "SingleBendingPowerLaw", "DoubleBendingPowerLaw", "PowerLaw",
        "Lorentzian", "QPO", "approx",  # :20
        "CustomMean", "ScalableGP", "posterior", "log_likelihood",  # :21-22
        "quad2roots", "roots2coeffs", "run_diagnostics",
        "run_posterior_predict_checks",  # :23
        "extract_subset", "sample_approx_model",  # :24
        "TwoUniformDependent", "TwoLogUniformDependent",
        "ThreeUniformDependent",  # :25
    ]:
        assert hasattr(pt, name), name
    import pioran_tpu.inference  # the sampler driver layer loads too
