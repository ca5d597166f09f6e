"""ChEES-HMC: jittered Hamiltonian Monte Carlo with cross-chain adaptation.

The TPU workhorse sampler. NUTS's per-chain dynamic trees are control-flow
heavy; ChEES-HMC (Hoffman, Radul & Sountsov, AISTATS 2021) replaces them
with a *shared* trajectory length adapted from cross-chain statistics —
the whole sampler is `lax.scan` over iterations of a single
traced-bound `fori_loop` of leapfrog steps: a compiler-friendly, SIMD
program that runs hundreds-to-thousands of chains per chip.

Design is batch-first: state arrays carry a leading chains axis, and all
cross-chain adaptation statistics are plain means over that axis. Shard
the chains axis over a `Mesh` (`NamedSharding(mesh, P("chains"))`) and
jit — XLA inserts the `all-reduce`s over ICI; no hand-written
collectives needed (pjit/GSPMD style).

Adaptation (warmup only):
  - step size: dual averaging on the cross-chain harmonic-mean accept
    probability, target 0.651 (optimal for HMC)
  - trajectory length: Adam on log tau with the ChEES criterion gradient
  - diagonal mass: EMA of cross-chain posterior variance
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["run_chees", "run_chees_stepped", "chees_warmup_and_sample",
           "make_chees_transition"]


def _halton(i, base: int = 2, num_bits: int = 30):
    """Radical-inverse (Halton) sequence element in (0, 1), jittable."""
    i = i.astype(jnp.uint32) + 1
    result = jnp.zeros((), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    f = 1.0 / base
    def body(k, state):
        result, f, i = state
        result = result + f * (i % base)
        return result, f / base, i // base
    result, _, _ = lax.fori_loop(0, num_bits, body, (result, 1.0 / base, i))
    return result


class _AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    t: jax.Array


def _adam_update(state: _AdamState, grad, lr=0.025, b1=0.9, b2=0.999, eps=1e-8):
    t = state.t + 1
    m = b1 * state.m + (1 - b1) * grad
    v = b2 * state.v + (1 - b2) * grad**2
    mhat = m / (1 - b1**t)
    vhat = v / (1 - b2**t)
    return _AdamState(m, v, t), lr * mhat / (jnp.sqrt(vhat) + eps)


def make_chees_transition(
    logp_fn: Callable,
    C: int,
    dim: int,
    dtype,
    num_warmup: int,
    target_accept: float = 0.651,
    max_leapfrogs: int = 1024,
    logp_batch_fn: Callable = None,
):
    """The ChEES-HMC transition kernel as a pure (carry, (it, warm)) ->
    (carry, out) function, plus its initializer.

    Factored out so the same kernel runs either as one fused
    ``lax.scan`` program (:func:`run_chees` — fastest) or one jitted
    call per iteration from a host loop (:func:`run_chees_stepped` —
    survives RPC layers that kill multi-minute XLA programs, and the
    monolithic-scan remote-compile limit)."""
    dtype = jnp.dtype(dtype)
    if logp_batch_fn is None:
        batch_logp_grad = jax.vmap(jax.value_and_grad(logp_fn))
    else:
        def batch_logp_grad(Z):
            logps, vjp = jax.vjp(logp_batch_fn, Z)
            return logps, vjp(jnp.ones_like(logps))[0]

    def leapfrog_traj(z, r, grad, eps, n_steps, inv_mass):
        """n_steps leapfrogs for the whole batch (shared traced bound)."""
        def body(_, state):
            z, r, logp, grad = state
            r_half = r + 0.5 * eps * grad
            z_new = z + eps * (inv_mass * r_half)
            logp_new, grad_new = batch_logp_grad(z_new)
            r_new = r_half + 0.5 * eps * grad_new
            return z_new, r_new, logp_new, grad_new

        logp0 = jnp.zeros((C,), dtype)
        state = (z, r, logp0, grad)
        z, r, logp, grad = lax.fori_loop(0, n_steps, body, state)
        return z, r, logp, grad

    def transition(carry, inp):
        (z, logp, grad, step_size, log_tau, adam, da, inv_mass, var_ema, key) = carry
        it, is_warmup = inp
        key, k_mom, k_acc = jax.random.split(key, 3)

        r0 = jnp.sqrt(1.0 / inv_mass)[None, :] * jax.random.normal(k_mom, (C, dim), dtype)
        # jittered trajectory length, shared across chains (Halton sequence)
        h = _halton(it).astype(dtype)
        tau = jnp.exp(log_tau)
        traj = h * tau
        n_steps = jnp.maximum(1, jnp.ceil(traj / step_size)).astype(jnp.int32)
        n_steps = jnp.minimum(n_steps, max_leapfrogs)

        z_new, r_new, logp_new, grad_new = leapfrog_traj(
            z, r0, grad, step_size, n_steps, inv_mass
        )
        # MH accept per chain
        ke0 = 0.5 * jnp.sum(r0 * (inv_mass[None, :] * r0), axis=1)
        ke1 = 0.5 * jnp.sum(r_new * (inv_mass[None, :] * r_new), axis=1)
        log_alpha = (logp_new - ke1) - (logp - ke0)
        log_alpha = jnp.where(jnp.isfinite(log_alpha), log_alpha, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_alpha))
        accept = jnp.log(jax.random.uniform(k_acc, (C,), dtype)) < log_alpha
        z_next = jnp.where(accept[:, None], z_new, z)
        logp_next = jnp.where(accept, logp_new, logp)
        grad_next = jnp.where(accept[:, None], grad_new, grad)

        # ---- ChEES gradient for trajectory length (cross-chain means) ----
        zbar = jnp.mean(z, axis=0)          # all-reduce over chains
        zbar_new = jnp.mean(z_new, axis=0)
        dsq_old = jnp.sum((z - zbar) ** 2, axis=1)
        dsq_new = jnp.sum((z_new - zbar_new) ** 2, axis=1)
        v_new = inv_mass[None, :] * r_new   # final velocity
        proj = jnp.sum((z_new - zbar_new) * v_new, axis=1)
        per_chain = (dsq_new - dsq_old) * proj
        # divergent trajectories produce non-finite z_new/proj; they must
        # not poison the trajectory-length adaptation (a single NaN here
        # turns log_tau NaN and freezes every chain: n_steps -> 0)
        finite = jnp.isfinite(per_chain)
        per_chain = jnp.where(finite, per_chain, 0.0)
        w = jnp.where(finite, accept_prob, 0.0)
        chees_grad = h * jnp.sum(w * per_chain) / jnp.maximum(jnp.sum(w), 1e-10)
        # normalize scale, gradient ASCENT on log tau
        chees_grad = chees_grad / (jnp.exp(2.0 * log_tau) + 1e-10)
        chees_grad = jnp.where(jnp.isfinite(chees_grad), chees_grad, 0.0)
        adam, delta = _adam_update(adam, -chees_grad)
        log_tau_new = log_tau - delta
        # keep trajectories under the leapfrog cap
        log_tau_new = jnp.minimum(
            log_tau_new, jnp.log(0.9 * max_leapfrogs * step_size)
        )

        # ---- dual averaging on cross-chain mean accept ----
        mean_accept = jnp.mean(accept_prob)
        ls, ls_avg, hsum, mu, cnt = da
        cnt = cnt + 1
        hh = target_accept - mean_accept
        hsum = hsum + hh
        ls = mu - jnp.sqrt(cnt) / 0.05 * hsum / (cnt + 10.0)
        eta = cnt ** (-0.75)
        ls_avg = eta * ls + (1 - eta) * ls_avg
        da = (ls, ls_avg, hsum, mu, cnt)

        # ---- mass matrix: EMA of cross-chain variance ----
        var_now = jnp.var(z_next, axis=0) + 1e-6
        var_ema = 0.9 * var_ema + 0.1 * var_now

        # during warmup follow the DA iterate; on the last warmup step
        # freeze at the DA average for the sampling phase
        step_size_new = jnp.where(
            is_warmup,
            jnp.where(it == num_warmup - 1, jnp.exp(ls_avg), jnp.exp(ls)),
            step_size,
        )
        log_tau = jnp.where(is_warmup, log_tau_new, log_tau)
        inv_mass = jnp.where(is_warmup & (it % 25 == 24), var_ema, inv_mass)

        carry = (z_next, logp_next, grad_next, step_size_new, log_tau, adam,
                 da, inv_mass, var_ema, key)
        out = (z_next, logp_next, mean_accept, n_steps)
        return carry, out

    def init(z0, key, initial_step_size=0.1, initial_traj_length=1.0):
        logp0, grad0 = batch_logp_grad(z0)
        ls0 = jnp.log(jnp.asarray(initial_step_size, dtype))
        da0 = (ls0, ls0, jnp.zeros((), dtype), jnp.log(10.0) + ls0,
               jnp.zeros((), dtype))
        adam0 = _AdamState(jnp.zeros((), dtype), jnp.zeros((), dtype),
                           jnp.zeros((), jnp.int32))
        return (
            z0, logp0, grad0, jnp.asarray(initial_step_size, dtype),
            jnp.log(jnp.asarray(initial_traj_length, dtype)), adam0, da0,
            jnp.ones((dim,), dtype), jnp.ones((dim,), dtype), key,
        )

    return transition, init


@partial(
    jax.jit,
    static_argnames=("logp_fn", "num_warmup", "num_samples", "max_leapfrogs",
                     "logp_batch_fn"),
)
def run_chees(
    logp_fn: Callable,
    z0,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    initial_step_size: float = 0.1,
    initial_traj_length: float = 1.0,
    target_accept: float = 0.651,
    max_leapfrogs: int = 1024,
    logp_batch_fn: Callable = None,
):
    """Run ChEES-HMC on a (C, dim) batch of chains.

    ``z0``: (C, dim) initial positions (shard the C axis for multi-chip).
    ``logp_batch_fn`` (optional): batched (C, dim) -> (C,) log-posterior;
    when given, every leapfrog evaluates values AND per-chain gradients
    through it in one vjp (chains decouple) — pass a Pallas-backed
    likelihood so the forward rides the fused kernel.
    Returns (samples [num_samples, C, dim], stats).
    """
    C, dim = z0.shape
    dtype = z0.dtype
    transition, init = make_chees_transition(
        logp_fn, C, dim, dtype, num_warmup, target_accept, max_leapfrogs,
        logp_batch_fn,
    )
    carry = init(z0, key, initial_step_size, initial_traj_length)
    total = num_warmup + num_samples
    its = jnp.arange(total)
    warm = its < num_warmup
    carry, (zs, logps, accepts, nsteps) = lax.scan(transition, carry, (its, warm))
    # after warmup, freeze step size at the DA average
    samples = zs[num_warmup:]
    stats = {
        "logp": logps[num_warmup:],
        "accept": accepts,
        "n_leapfrogs": nsteps,
        "step_size": carry[3],
        "traj_length": jnp.exp(carry[4]),
        "inv_mass": carry[7],
    }
    return samples, stats


def run_chees_stepped(
    logp_fn: Callable,
    z0,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    initial_step_size: float = 0.1,
    initial_traj_length: float = 1.0,
    target_accept: float = 0.651,
    max_leapfrogs: int = 1024,
    logp_batch_fn: Callable = None,
    thin: int = 1,
):
    """:func:`run_chees`, but one jitted transition per HOST iteration.

    Same kernel, same adaptation, same statistics — only the iteration
    loop moves to the host, so no single XLA program runs longer than
    one transition. Use on environments whose RPC layer kills
    multi-minute device programs (the axon TPU tunnel) or whose remote
    compiler rejects the monolithic scan. ``thin`` keeps every
    ``thin``-th post-warmup draw (host memory control for big C).
    Returns (samples [S, C, dim] numpy, stats) matching run_chees.
    """
    import numpy as np

    C, dim = z0.shape
    dtype = z0.dtype
    transition, init = make_chees_transition(
        logp_fn, C, dim, dtype, num_warmup, target_accept, max_leapfrogs,
        logp_batch_fn,
    )
    trans = jax.jit(transition)
    carry = init(z0, key, initial_step_size, initial_traj_length)
    total = num_warmup + num_samples
    samples, logps, accepts, nsteps = [], [], [], []
    for it in range(total):
        carry, out = trans(
            carry, (jnp.asarray(it), jnp.asarray(it < num_warmup)))
        z_it, logp_it, acc_it, n_it = out
        accepts.append(float(acc_it))
        nsteps.append(int(n_it))
        if it >= num_warmup and (it - num_warmup) % thin == 0:
            samples.append(np.asarray(z_it))
            logps.append(np.asarray(logp_it))
    stats = {
        "logp": np.asarray(logps),
        "accept": np.asarray(accepts),
        "n_leapfrogs": np.asarray(nsteps),
        "step_size": float(carry[3]),
        "traj_length": float(jnp.exp(carry[4])),
        "inv_mass": np.asarray(carry[7]),
    }
    return np.stack(samples), stats


# Alias with a descriptive name
chees_warmup_and_sample = run_chees
