"""ADVI — automatic differentiation variational inference, fully on device.

The reference has no VI at all (its inference is external NUTS/ultranest,
reference README.md:27); SURVEY.md §7 M3 adds ADVI as a first-class
sampler of the new framework: a cheap warm-start / fallback when MCMC is
too expensive, and an initializer for NUTS mass matrices.

Design (TPU-first):
- mean-field Gaussian q(z) = N(mu, diag(exp(log_sigma)^2)) over the
  *unconstrained* parameters z (the PriorSet bijectors supply the
  transform + log-det-Jacobian, mirroring how the reference's dependent
  priors ship Bijectors for Turing, reference src/priors.jl:148-169);
- reparameterized ELBO with `num_mc` samples per step, estimated with a
  single vmapped batch — one fused forward+grad of the GP likelihood per
  optimizer step, all on the MXU/VPU;
- optax Adam with cosine decay; the whole optimization is one
  `lax.scan`, so a full fit is a single jitted program (compile once,
  run for any number of steps).

The entropy of q is analytic, so
  ELBO = E_q[logpost(z)] + sum(log_sigma) + D/2 (1 + log 2 pi),
which is also a lower bound on the evidence logZ (comparable to, and
below, the SMC / ultranest logZ).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ADVIResult", "run_advi", "elbo"]


class ADVIResult(NamedTuple):
    """Fit result: variational parameters, ELBO trace, posterior draws."""

    mu: jax.Array          # (D,) variational mean (unconstrained space)
    log_sigma: jax.Array   # (D,) variational log-stddev
    elbo_trace: jax.Array  # (num_steps,) smoothed ELBO per step
    samples: jax.Array     # (num_draws, D) draws from q (unconstrained)
    logZ_lower: jax.Array  # final ELBO = lower bound on log-evidence


def elbo(logpost: Callable, mu, log_sigma, key, num_mc: int = 8):
    """Reparameterized ELBO estimate with analytic Gaussian entropy."""
    D = mu.shape[0]
    eps = jax.random.normal(key, (num_mc, D), dtype=mu.dtype)
    z = mu + jnp.exp(log_sigma) * eps
    lp = jax.vmap(logpost)(z)
    # masked mean: a -inf logpost (prior rejection region) would poison
    # the gradient; treat those draws as contributing the worst finite lp
    lp = jnp.where(jnp.isfinite(lp), lp, jnp.nanmin(jnp.where(jnp.isfinite(lp), lp, jnp.nan)))
    entropy = jnp.sum(log_sigma) + 0.5 * D * (1.0 + jnp.log(2.0 * jnp.pi))
    return jnp.mean(lp) + entropy


def run_advi(
    logpost: Callable,
    z0,
    key,
    num_steps: int = 2000,
    num_mc: int = 8,
    learning_rate: float = 5e-2,
    num_draws: int = 1000,
    init_log_sigma: float = -2.0,
) -> ADVIResult:
    """Fit mean-field ADVI to ``logpost`` (unconstrained log-posterior).

    ``z0`` initializes the variational mean (one point, e.g. a prior
    draw mapped through ``PriorSet.to_unconstrained``). Returns draws
    from the fitted q ready for ``PriorSet.from_unconstrained``.

    The optimizer scan is jit-compatible and vmappable (e.g. over many
    light curves for hierarchical batches).
    """
    import optax

    z0 = jnp.asarray(z0)
    D = z0.shape[0]
    dtype = z0.dtype
    params0 = (z0, jnp.full((D,), init_log_sigma, dtype))

    sched = optax.cosine_decay_schedule(learning_rate, num_steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state0 = opt.init(params0)

    def loss_fn(params, k):
        mu, log_sigma = params
        return -elbo(logpost, mu, log_sigma, k, num_mc)

    def step(carry, k):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        # -inf/nan protection: skip the update on a bad MC batch
        ok = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        ) & jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    key, k_fit, k_draw, k_final = jax.random.split(key, 4)
    (params, _), trace = lax.scan(
        step, (params0, opt_state0), jax.random.split(k_fit, num_steps)
    )
    mu, log_sigma = params

    eps = jax.random.normal(k_draw, (num_draws, D), dtype=dtype)
    samples = mu + jnp.exp(log_sigma) * eps
    logZ_lower = elbo(logpost, mu, log_sigma, k_final, num_mc=64)
    return ADVIResult(
        mu=mu, log_sigma=log_sigma, elbo_trace=trace,
        samples=samples, logZ_lower=logZ_lower,
    )
