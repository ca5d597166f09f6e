"""Generalized (floating-mean) Lomb-Scargle periodogram, on device.

Replaces the reference's LombScargle.jl dependency (used by
reference src/plots_diagnostics.jl:514-633 for the LSP posterior
predictive check). The GLS is a batched least-squares per frequency —
pure elementwise math + reductions, ideal VPU work — and vmaps over the
frequency grid AND over posterior-sample realisations.

Formulation: Zechmeister & Kuerster (2009), weighted, floating mean,
"standard" normalization p in [0, 1] — matching LombScargle.jl defaults
(fit_mean=true, errors as weights, normalization=:standard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["lombscargle", "binned_lsp"]


def lombscargle(t, y, yerr, frequencies):
    """GLS power at the given frequencies. Returns array like frequencies."""
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    w = 1.0 / jnp.asarray(yerr) ** 2
    w = w / jnp.sum(w)

    ybar = jnp.sum(w * y)
    yc = y - ybar
    YY = jnp.sum(w * yc**2)

    def power_one(f):
        omega = 2.0 * jnp.pi * f
        # tau makes the cos/sin basis orthogonal (ZK09 eq. 19 uses full
        # matrices; the tau trick gives the same power)
        two_wt = 2.0 * omega * t
        tau = 0.5 * jnp.arctan2(
            jnp.sum(w * jnp.sin(two_wt)), jnp.sum(w * jnp.cos(two_wt))
        ) / omega
        x = omega * (t - tau)
        cosx = jnp.cos(x)
        sinx = jnp.sin(x)
        C = jnp.sum(w * cosx)
        S = jnp.sum(w * sinx)
        YC = jnp.sum(w * yc * cosx)
        YS = jnp.sum(w * yc * sinx)
        CC = jnp.sum(w * cosx**2) - C * C
        SS = jnp.sum(w * sinx**2) - S * S
        CS = jnp.sum(w * cosx * sinx) - C * S
        D = CC * SS - CS**2
        num = SS * YC**2 + CC * YS**2 - 2.0 * CS * YC * YS
        return num / (YY * D)

    return jax.vmap(power_one)(jnp.asarray(frequencies))


def binned_lsp(freqs, power, bin_fact: int = 10):
    """Log-space binning of a periodogram (host-side numpy), as in
    reference plots_diagnostics.jl:575-589."""
    import numpy as np

    freqs = np.asarray(freqs)
    power = np.asarray(power)
    n = int(round(len(power) / bin_fact))
    bf, bp = [], []
    for i in range(n - 1):
        sl = slice(i * bin_fact, (i + 1) * bin_fact)
        bp.append(np.mean(np.log(power[sl])))
        bf.append(np.mean(np.log(freqs[sl])))
    return np.exp(np.array(bf)), np.exp(np.array(bp))
