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
    mass: str = "diag",
):
    """The ChEES-HMC transition kernel as a pure (carry, (it, warm)) ->
    (carry, out) function, plus its initializer.

    Factored out so the same kernel runs either as one fused
    ``lax.scan`` program (:func:`run_chees` — fastest) or one jitted
    call per iteration from a host loop (:func:`run_chees_stepped` —
    survives RPC layers that kill multi-minute XLA programs, and the
    monolithic-scan remote-compile limit).

    ``mass="dense"`` adapts a FULL covariance metric from the
    cross-chain sample covariance (hundreds of chains estimate a
    dim~10 covariance essentially exactly) — the preconditioner that
    unlocks the flagship model's alpha2/f1 ridge, where a diagonal
    metric leaves HMC diffusing along the correlated direction. Dense
    costs one extra (C,dim)x(dim,dim) matmul per leapfrog — noise next
    to the GP likelihood. Metric updates happen every 25 warmup
    iterations (frozen over the final windows so dual averaging
    settles against the final metric), and each update RESTARTS dual
    averaging centered on the current step size (Stan's windowed
    scheme): a step size tuned for the old metric is wrong for the new
    one."""
    dtype = jnp.dtype(dtype)
    dense = mass == "dense"
    if mass not in ("diag", "dense"):
        raise ValueError(f"mass must be 'diag' or 'dense', got {mass!r}")
    if logp_batch_fn is None:
        batch_logp_grad = jax.vmap(jax.value_and_grad(logp_fn))
    else:
        def batch_logp_grad(Z):
            logps, vjp = jax.vjp(logp_batch_fn, Z)
            return logps, vjp(jnp.ones_like(logps))[0]

    # metric helpers: `chol` is the Cholesky factor of the estimated
    # posterior covariance Sigma (momenta r ~ N(0, Sigma^{-1}), velocity
    # v = Sigma r, kinetic energy = |chol^T r|^2 / 2). For diag, chol is
    # the (dim,) vector of posterior stddevs — same formulas, O(dim).
    if dense:
        def draw_momentum(key, chol):
            xi = jax.random.normal(key, (C, dim), dtype)
            # r = L^{-T} xi  ->  cov(r) = (L L^T)^{-1} = Sigma^{-1}
            return jax.scipy.linalg.solve_triangular(
                chol.T, xi.T, lower=False).T

        def velocity(r, chol):
            return (r @ chol) @ chol.T

        def kinetic(r, chol):
            return 0.5 * jnp.sum((r @ chol) ** 2, axis=1)
    else:
        def draw_momentum(key, chol):
            xi = jax.random.normal(key, (C, dim), dtype)
            return xi / chol[None, :]

        def velocity(r, chol):
            return r * (chol ** 2)[None, :]

        def kinetic(r, chol):
            return 0.5 * jnp.sum((r * chol[None, :]) ** 2, axis=1)

    # metric frozen over the last windows so the final step size is
    # adapted against the final metric (Stan's terminal fast interval)
    freeze_tail = min(100, max(num_warmup // 4, 1))

    def leapfrog_traj(z, r, grad, eps, n_steps, chol):
        """n_steps leapfrogs for the whole batch (shared traced bound)."""
        def body(_, state):
            z, r, logp, grad = state
            r_half = r + 0.5 * eps * grad
            z_new = z + eps * velocity(r_half, chol)
            logp_new, grad_new = batch_logp_grad(z_new)
            r_new = r_half + 0.5 * eps * grad_new
            return z_new, r_new, logp_new, grad_new

        logp0 = jnp.zeros((C,), dtype)
        state = (z, r, logp0, grad)
        z, r, logp, grad = lax.fori_loop(0, n_steps, body, state)
        return z, r, logp, grad

    def transition(carry, inp):
        (z, logp, grad, step_size, log_tau, adam, da, chol, cov_ema, key,
         lt_avg) = carry
        it, is_warmup = inp
        key, k_mom, k_acc = jax.random.split(key, 3)

        r0 = draw_momentum(k_mom, chol)
        # jittered trajectory length, shared across chains (Halton sequence)
        h = _halton(it).astype(dtype)
        tau = jnp.exp(log_tau)
        traj = h * tau
        n_steps = jnp.maximum(1, jnp.ceil(traj / step_size)).astype(jnp.int32)
        n_steps = jnp.minimum(n_steps, max_leapfrogs)

        z_new, r_new, logp_new, grad_new = leapfrog_traj(
            z, r0, grad, step_size, n_steps, chol
        )
        # MH accept per chain
        ke0 = kinetic(r0, chol)
        ke1 = kinetic(r_new, chol)
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
        v_new = velocity(r_new, chol)       # final velocity
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

        # ---- metric: EMA of the cross-chain (co)variance ----
        if dense:
            zc = z_next - jnp.mean(z_next, axis=0)[None, :]
            cov_now = (zc.T @ zc) / max(C - 1, 1)
            cov_now = cov_now + 1e-6 * jnp.eye(dim, dtype=dtype)
            cov_ema = 0.9 * cov_ema + 0.1 * cov_now
            # ridge keeps the factorization well-posed early on, when
            # chains are still clustered and the sample cov is singular
            ridge = 1e-6 * (jnp.trace(cov_ema) / dim + 1.0)
            chol_cand = jnp.linalg.cholesky(
                cov_ema + ridge * jnp.eye(dim, dtype=dtype))
        else:
            var_now = jnp.var(z_next, axis=0) + 1e-6
            cov_ema = 0.9 * cov_ema + 0.1 * var_now
            chol_cand = jnp.sqrt(cov_ema)

        do_update = is_warmup & (it % 25 == 24) & (
            it < num_warmup - freeze_tail)
        chol = jnp.where(do_update, chol_cand, chol)
        # windowed scheme: a new metric invalidates the tuned step size;
        # restart dual averaging centered on the current iterate
        mu = jnp.where(do_update, jnp.log(10.0) + ls, mu)
        hsum = jnp.where(do_update, 0.0, hsum)
        cnt = jnp.where(do_update, 0.0, cnt)
        da = (ls, ls_avg, hsum, mu, cnt)

        # during warmup follow the DA iterate; on the last warmup step
        # freeze at the DA average for the sampling phase
        step_size_new = jnp.where(
            is_warmup,
            jnp.where(it == num_warmup - 1, jnp.exp(ls_avg), jnp.exp(ls)),
            step_size,
        )
        # trajectory length gets the SAME treatment as the step size:
        # Adam's last iterate is a noisy draw around the ChEES optimum
        # (measured: tau varying ~1.5x between identical-config runs,
        # i.e. up to ~2x ESS/s swing); freeze at an EMA (~50-iteration
        # window) of the warmup trajectory instead of the final iterate
        lt_avg = jnp.where(is_warmup, 0.98 * lt_avg + 0.02 * log_tau_new,
                           lt_avg)
        log_tau = jnp.where(
            is_warmup,
            jnp.where(it == num_warmup - 1, lt_avg, log_tau_new),
            log_tau,
        )

        carry = (z_next, logp_next, grad_next, step_size_new, log_tau, adam,
                 da, chol, cov_ema, key, lt_avg)
        out = (z_next, logp_next, mean_accept, n_steps)
        return carry, out

    def init(z0, key, initial_step_size=0.1, initial_traj_length=1.0):
        logp0, grad0 = batch_logp_grad(z0)
        ls0 = jnp.log(jnp.asarray(initial_step_size, dtype))
        da0 = (ls0, ls0, jnp.zeros((), dtype), jnp.log(10.0) + ls0,
               jnp.zeros((), dtype))
        adam0 = _AdamState(jnp.zeros((), dtype), jnp.zeros((), dtype),
                           jnp.zeros((), jnp.int32))
        chol0 = jnp.eye(dim, dtype=dtype) if dense else jnp.ones((dim,), dtype)
        cov0 = jnp.eye(dim, dtype=dtype) if dense else jnp.ones((dim,), dtype)
        lt0 = jnp.log(jnp.asarray(initial_traj_length, dtype))
        return (
            z0, logp0, grad0, jnp.asarray(initial_step_size, dtype),
            lt0, adam0, da0,
            chol0, cov0, key, lt0,
        )

    return transition, init


def _metric_stats(chol, mass):
    """Posterior-scale diagnostics from the metric factor."""
    if mass == "dense":
        return jnp.sum(chol * chol, axis=1)  # diag(Sigma) = diag(L L^T)
    return chol ** 2


@partial(
    jax.jit,
    static_argnames=("logp_fn", "num_warmup", "num_samples", "max_leapfrogs",
                     "logp_batch_fn", "mass"),
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
    mass: str = "diag",
):
    """Run ChEES-HMC on a (C, dim) batch of chains.

    ``z0``: (C, dim) initial positions (shard the C axis for multi-chip).
    ``logp_batch_fn`` (optional): batched (C, dim) -> (C,) log-posterior;
    when given, every leapfrog evaluates values AND per-chain gradients
    through it in one vjp (chains decouple) — pass a Pallas-backed
    likelihood so the forward rides the fused kernel.
    ``mass``: "diag" or "dense" (full cross-chain covariance metric —
    see :func:`make_chees_transition`).
    Returns (samples [num_samples, C, dim], stats).
    """
    C, dim = z0.shape
    dtype = z0.dtype
    transition, init = make_chees_transition(
        logp_fn, C, dim, dtype, num_warmup, target_accept, max_leapfrogs,
        logp_batch_fn, mass=mass,
    )
    # jitted init: eagerly the batched value_and_grad dispatches the
    # likelihood graph op-by-op (slow; allocator churn under load)
    carry = jax.jit(init)(z0, key, initial_step_size, initial_traj_length)
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
        "inv_mass": _metric_stats(carry[7], mass),
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
    mass: str = "diag",
    block: int = 1,
):
    """:func:`run_chees`, but ``block`` transitions per HOST iteration.

    Same kernel, same adaptation, same statistics — only the iteration
    loop moves to the host, so no single XLA program runs longer than
    ``block`` transitions. Use on environments whose RPC layer kills
    multi-minute device programs (the axon TPU tunnel) or whose remote
    compiler rejects the monolithic scan. ``block`` > 1 scans that many
    iterations inside one jitted program — with ~0.2 s host dispatch
    per call and ~4 leapfrogs per iteration, block=25 cuts wall time
    ~2x while each program stays well under the RPC kill window.
    ``thin`` keeps every ``thin``-th post-warmup draw (host memory
    control for big C).
    Returns (samples [S, C, dim] numpy, stats) matching run_chees.
    """
    import numpy as np

    C, dim = z0.shape
    dtype = z0.dtype
    transition, init = make_chees_transition(
        logp_fn, C, dim, dtype, num_warmup, target_accept, max_leapfrogs,
        logp_batch_fn, mass=mass,
    )

    @partial(jax.jit, static_argnames=("nw",))
    def trans_block(carry, its, nw):
        return lax.scan(transition, carry, (its, its < nw))

    # jitted init: eagerly the batched value_and_grad dispatches the
    # likelihood graph op-by-op (slow; allocator churn under load)
    carry = jax.jit(init)(z0, key, initial_step_size, initial_traj_length)
    total = num_warmup + num_samples
    samples, logps, accepts, nsteps = [], [], [], []
    for start in range(0, total, block):
        its = jnp.arange(start, min(start + block, total))
        carry, out = trans_block(carry, its, num_warmup)
        z_blk, logp_blk, acc_blk, n_blk = out
        accepts.extend(np.asarray(acc_blk).tolist())
        nsteps.extend(np.asarray(n_blk).tolist())
        for j, it in enumerate(range(start, min(start + block, total))):
            if it >= num_warmup and (it - num_warmup) % thin == 0:
                samples.append(np.asarray(z_blk[j]))
                logps.append(np.asarray(logp_blk[j]))
    stats = {
        "logp": np.asarray(logps),
        "accept": np.asarray(accepts),
        "n_leapfrogs": np.asarray(nsteps),
        "step_size": float(carry[3]),
        "traj_length": float(jnp.exp(carry[4])),
        "inv_mass": np.asarray(_metric_stats(carry[7], mass)),
    }
    return np.stack(samples), stats


# Alias with a descriptive name
chees_warmup_and_sample = run_chees
