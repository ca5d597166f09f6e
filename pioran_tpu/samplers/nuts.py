"""No-U-Turn sampler, iterative and fully vmappable (TPU-native NUTS).

The reference drives inference with Turing/AdvancedHMC NUTS out-of-process
(reference examples/turing_distributed/single_pl.jl:73-81, 500 adapt +
1000 draws, target accept 0.8). Here NUTS is first-class: an iterative
fixed-max-depth tree builder (no recursion, no dynamic shapes) so that
thousands of chains run as one vmapped program on a chip, and chains
shard over a device mesh (see pioran_tpu.parallel).

Algorithm: multinomial NUTS (Betancourt 2017) with the checkpoint-based
iterative U-turn scheme: within a subtree being built left-to-right,
leaf k must be checked against the start of every balanced block that
ends at k. Storing momenta at even leaves in slot popcount(k) and
checking odd leaves against slots [popcount(k)-trailing_ones(k),
popcount(k)-1] visits exactly those blocks.

Warmup: Stan-style windowed adaptation — dual-averaging step size
(target accept-stat) + diagonal mass matrix from Welford accumulators in
doubling slow windows. An optional `mass_pool_axis` pools the variance
estimate across a mesh axis with `lax.pmean` (cross-chain warmup
adaptation over ICI, SURVEY §2.6).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "NutsConfig",
    "run_nuts",
    "run_nuts_stepped",
    "make_nuts_transition",
    "nuts_kernel",
    "warmup_schedule",
]


class NutsConfig(NamedTuple):
    step_size: float = 0.1
    max_depth: int = 8
    target_accept: float = 0.8
    max_delta_energy: float = 1000.0


class _TreeState(NamedTuple):
    """Running state of the trajectory being built."""

    z_left: jax.Array
    r_left: jax.Array
    grad_left: jax.Array
    z_right: jax.Array
    r_right: jax.Array
    grad_right: jax.Array
    z_prop: jax.Array  # current proposal
    logp_prop: jax.Array
    grad_prop: jax.Array
    log_weight: jax.Array  # logsumexp of -energy over leaves
    r_sum: jax.Array  # sum of momenta over leaves
    turning: jax.Array
    diverging: jax.Array
    sum_accept: jax.Array  # sum of accept probabilities (for adaptation)
    num_leaves: jax.Array


def _popcount(n):
    n = n.astype(jnp.uint32)
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return ((n * 0x01010101) >> 24).astype(jnp.int32)


def _trailing_ones(n):
    # number of trailing 1-bits = trailing zeros of n+1... = popcount(n & ~(n+1))
    n = n.astype(jnp.uint32)
    return _popcount(n & ~(n + jnp.uint32(1)))


def _is_turning(inv_mass, r_left, r_right, r_sum):
    """Generalized U-turn criterion on a block with momentum sum r_sum."""
    v_left = inv_mass * r_left
    v_right = inv_mass * r_right
    return (jnp.dot(v_left, r_sum) <= 0) | (jnp.dot(v_right, r_sum) <= 0)


def _leapfrog(logp_grad, z, r, grad, eps, inv_mass):
    r_half = r + 0.5 * eps * grad
    z_new = z + eps * inv_mass * r_half
    logp_new, grad_new = logp_grad(z_new)
    r_new = r_half + 0.5 * eps * grad_new
    return z_new, r_new, logp_new, grad_new


def _energy(logp, r, inv_mass):
    return -logp + 0.5 * jnp.dot(r, inv_mass * r)


def nuts_kernel(
    logp_fn: Callable,
    z,
    logp,
    grad,
    key,
    step_size,
    inv_mass,
    max_depth: int = 8,
    max_delta_energy: float = 1000.0,
):
    """One NUTS transition. Returns (z', logp', grad', stats).

    Pure function of its inputs; vmap over chains at the call site.
    """
    logp_grad = lambda q: jax.value_and_grad(logp_fn)(q)
    dim = z.shape[0]
    key_mom, key_dir, key_tree = jax.random.split(key, 3)
    r0 = jnp.sqrt(1.0 / inv_mass) * jax.random.normal(key_mom, (dim,), dtype=z.dtype)
    energy0 = _energy(logp, r0, inv_mass)

    init_tree = _TreeState(
        z_left=z, r_left=r0, grad_left=grad,
        z_right=z, r_right=r0, grad_right=grad,
        z_prop=z, logp_prop=logp, grad_prop=grad,
        log_weight=jnp.zeros((), z.dtype),
        r_sum=r0,
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), z.dtype),
        num_leaves=jnp.zeros((), jnp.int32),
    )

    def build_subtree(tree: _TreeState, depth, going_right, key):
        """Build a balanced subtree of 2^depth leaves on one side."""
        num_leaves = jnp.asarray(1, jnp.int32) << depth
        eps = jnp.where(going_right, step_size, -step_size)

        # checkpoints for the iterative U-turn scheme
        r_ckpts = jnp.zeros((max_depth, dim), z.dtype)
        s_ckpts = jnp.zeros((max_depth, dim), z.dtype)  # cumulative momentum sums

        def leaf_step(state):
            (k, z_c, r_c, grad_c, sub, r_ckpts, s_ckpts, r_cumsum, key) = state
            z_n, r_n, logp_n, grad_n = _leapfrog(logp_grad, z_c, r_c, grad_c, eps, inv_mass)
            energy_n = _energy(logp_n, r_n, inv_mass)
            delta = energy_n - energy0
            diverging = delta > max_delta_energy
            log_w = -energy_n + energy0  # leaf weight relative to initial energy
            accept_prob = jnp.minimum(1.0, jnp.exp(-delta))

            # progressive multinomial proposal within the subtree
            key, key_acc = jax.random.split(key)
            new_log_weight = jnp.logaddexp(sub.log_weight, log_w)
            p_take = jnp.exp(log_w - new_log_weight)
            first = sub.num_leaves == 0
            take = first | (jax.random.uniform(key_acc, (), z.dtype) < p_take)
            z_prop = jnp.where(take, z_n, sub.z_prop)
            logp_prop = jnp.where(take, logp_n, sub.logp_prop)
            grad_prop = jnp.where(take, grad_n, sub.grad_prop)
            log_weight = jnp.where(first, log_w, new_log_weight)

            r_cumsum = r_cumsum + r_n

            # --- checkpoint-based U-turn checks within the subtree ---
            even = (k % 2) == 0
            slot = _popcount(k)
            # store at even leaves: momentum and cumsum *including* this leaf
            r_ckpts = jnp.where(even, r_ckpts.at[jnp.clip(slot, 0, max_depth - 1)].set(r_n), r_ckpts)
            s_ckpts = jnp.where(even, s_ckpts.at[jnp.clip(slot, 0, max_depth - 1)].set(r_cumsum), s_ckpts)

            idx_max = _popcount(k) - 1
            idx_min = idx_max - _trailing_ones(k) + 1

            def check_block(j, turning):
                active = (j >= idx_min) & (j <= idx_max) & (~even)
                jc = jnp.clip(j, 0, max_depth - 1)
                rho = r_cumsum - s_ckpts[jc] + r_ckpts[jc]
                t = _is_turning(inv_mass, r_ckpts[jc], r_n, rho)
                return turning | (active & t)

            turning = lax.fori_loop(0, max_depth, check_block, sub.turning)

            sub = _TreeState(
                z_left=jnp.where(first, z_n, sub.z_left),
                r_left=jnp.where(first, r_n, sub.r_left),
                grad_left=jnp.where(first, grad_n, sub.grad_left),
                z_right=z_n, r_right=r_n, grad_right=grad_n,
                z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop,
                log_weight=log_weight,
                r_sum=jnp.where(first, r_n, sub.r_sum + r_n),
                turning=turning,
                diverging=sub.diverging | diverging,
                sum_accept=sub.sum_accept + accept_prob,
                num_leaves=sub.num_leaves + 1,
            )
            return (k + 1, z_n, r_n, grad_n, sub, r_ckpts, s_ckpts, r_cumsum, key)

        def leaf_cond(state):
            k = state[0]
            sub = state[4]
            return (k < num_leaves) & (~sub.turning) & (~sub.diverging)

        # start from the current edge in the chosen direction
        z_c = jnp.where(going_right, tree.z_right, tree.z_left)
        r_c = jnp.where(going_right, tree.r_right, tree.r_left)
        grad_c = jnp.where(going_right, tree.grad_right, tree.grad_left)

        empty_sub = _TreeState(
            z_left=z_c, r_left=r_c, grad_left=grad_c,
            z_right=z_c, r_right=r_c, grad_right=grad_c,
            z_prop=z_c, logp_prop=jnp.zeros((), z.dtype), grad_prop=grad_c,
            log_weight=jnp.asarray(-jnp.inf, z.dtype),
            r_sum=jnp.zeros((dim,), z.dtype),
            turning=jnp.zeros((), bool),
            diverging=jnp.zeros((), bool),
            sum_accept=jnp.zeros((), z.dtype),
            num_leaves=jnp.zeros((), jnp.int32),
        )
        state = (jnp.zeros((), jnp.uint32), z_c, r_c, grad_c, empty_sub,
                 r_ckpts, s_ckpts, jnp.zeros((dim,), z.dtype), key)
        state = lax.while_loop(leaf_cond, leaf_step, state)
        return state[4]

    def doubling_step(carry):
        tree, depth, key = carry
        key, key_dir, key_sub, key_bias = jax.random.split(key, 4)
        going_right = jax.random.bernoulli(key_dir)
        sub = build_subtree(tree, depth, going_right, key_sub)

        # biased progressive sampling across the doubling
        log_ratio = sub.log_weight - tree.log_weight
        p_new = jnp.minimum(1.0, jnp.exp(log_ratio))
        usable = (~sub.turning) & (~sub.diverging)
        take = usable & (jax.random.uniform(key_bias, (), z.dtype) < p_new)
        z_prop = jnp.where(take, sub.z_prop, tree.z_prop)
        logp_prop = jnp.where(take, sub.logp_prop, tree.logp_prop)
        grad_prop = jnp.where(take, sub.grad_prop, tree.grad_prop)

        # merge edges
        z_left = jnp.where(going_right, tree.z_left, sub.z_right)
        r_left = jnp.where(going_right, tree.r_left, sub.r_right)
        grad_left = jnp.where(going_right, tree.grad_left, sub.grad_right)
        z_right = jnp.where(going_right, sub.z_right, tree.z_right)
        r_right = jnp.where(going_right, sub.r_right, tree.r_right)
        grad_right = jnp.where(going_right, sub.grad_right, tree.grad_right)
        # NOTE: sub edges: when going left, the subtree grew leftwards, and
        # its "right" edge is the far (leftmost) point.
        r_sum = tree.r_sum + sub.r_sum

        turning_merged = _is_turning(inv_mass, r_left, r_right, r_sum)
        done_turning = sub.turning | (usable & turning_merged)

        new_tree = _TreeState(
            z_left=z_left, r_left=r_left, grad_left=grad_left,
            z_right=z_right, r_right=r_right, grad_right=grad_right,
            z_prop=z_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_weight=jnp.logaddexp(tree.log_weight, sub.log_weight),
            r_sum=r_sum,
            turning=done_turning,
            diverging=sub.diverging,
            sum_accept=tree.sum_accept + sub.sum_accept,
            num_leaves=tree.num_leaves + sub.num_leaves,
        )
        return new_tree, depth + 1, key

    def doubling_cond(carry):
        tree, depth, _ = carry
        return (depth < max_depth) & (~tree.turning) & (~tree.diverging)

    tree0 = init_tree._replace(log_weight=jnp.zeros((), z.dtype))
    tree, depth, _ = lax.while_loop(
        doubling_cond, doubling_step, (tree0, jnp.zeros((), jnp.int32), key_tree)
    )

    accept_stat = tree.sum_accept / jnp.maximum(tree.num_leaves, 1)
    stats = {
        "accept_stat": accept_stat,
        "diverging": tree.diverging,
        "depth": depth,
        "num_leaves": tree.num_leaves,
        "energy": energy0,
    }
    return tree.z_prop, tree.logp_prop, tree.grad_prop, stats


# ---------------------------------------------------------------------------
# Warmup adaptation
# ---------------------------------------------------------------------------


def warmup_schedule(num_warmup: int, init_buffer=75, term_buffer=50, base_window=25):
    """Stan-style (fast, slow-doubling, fast) window boundaries.

    Returns a bool array `update_mass[i]` marking the end of each slow
    window (mass-matrix refresh points).
    """
    import numpy as np

    update = np.zeros(num_warmup, dtype=bool)
    if num_warmup < 20:
        return jnp.asarray(update)
    if num_warmup < init_buffer + term_buffer + base_window:
        init_buffer = max(1, int(0.15 * num_warmup))
        term_buffer = max(1, int(0.1 * num_warmup))
    pos = init_buffer
    window = base_window
    while pos + window + term_buffer <= num_warmup:
        nxt = pos + window
        if nxt + 2 * window + term_buffer > num_warmup:
            nxt = num_warmup - term_buffer
        update[nxt - 1] = True
        pos = nxt
        window *= 2
    return jnp.asarray(update)


class _DAState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    h_sum: jax.Array
    mu: jax.Array
    count: jax.Array


def _da_init(step_size):
    ls = jnp.log(step_size)
    return _DAState(ls, ls, jnp.zeros_like(ls), jnp.log(10.0) + ls, jnp.zeros_like(ls))


def _da_update(state: _DAState, accept_stat, target, gamma=0.05, t0=10.0, kappa=0.75):
    count = state.count + 1
    h = target - accept_stat
    h_sum = state.h_sum + h
    log_step = state.mu - jnp.sqrt(count) / gamma * h_sum / (count + t0)
    eta = count ** (-kappa)
    log_step_avg = eta * log_step + (1 - eta) * state.log_step_avg
    return _DAState(log_step, log_step_avg, h_sum, state.mu, count)


@partial(
    jax.jit,
    static_argnames=(
        "logp_fn", "num_warmup", "num_samples", "max_depth", "mass_pool_axis",
    ),
)
def run_nuts(
    logp_fn: Callable,
    z0,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    initial_step_size: float = 0.1,
    max_depth: int = 8,
    target_accept: float = 0.8,
    mass_pool_axis: Optional[str] = None,
):
    """Run one NUTS chain: warmup (step size + diag mass) then sampling.

    vmap over `z0`/`key` for many chains; wrap in shard_map with
    `mass_pool_axis` to pool mass-matrix estimates across devices.
    Returns (samples [num_samples, dim], stats dict).
    """
    dim = z0.shape[0]
    dtype = z0.dtype
    logp0, grad0 = jax.value_and_grad(logp_fn)(z0)

    update_mass = warmup_schedule(num_warmup)

    def warm_step(carry, inp):
        z, logp, grad, key, da, inv_mass, mean, m2, wcount = carry
        do_update = inp
        key, sub = jax.random.split(key)
        step_size = jnp.exp(da.log_step)
        z, logp, grad, stats = nuts_kernel(
            logp_fn, z, logp, grad, sub, step_size, inv_mass,
            max_depth=max_depth,
        )
        da = _da_update(da, stats["accept_stat"], target_accept)
        # Welford accumulation for the diagonal mass matrix
        wcount = wcount + 1
        delta = z - mean
        mean = mean + delta / wcount
        m2 = m2 + delta * (z - mean)

        def refresh(args):
            da, inv_mass, mean, m2, wcount = args
            var = m2 / jnp.maximum(wcount - 1, 1)
            # regularize like Stan: shrink toward unit scale
            var = (wcount / (wcount + 5.0)) * var + 1e-3 * (5.0 / (wcount + 5.0))
            if mass_pool_axis is not None:
                var = lax.pmean(var, mass_pool_axis)
            # restart step-size adaptation around the current value
            da_new = _da_init(jnp.exp(da.log_step))
            zero = jnp.zeros_like(mean)
            return da_new, var, zero, zero, jnp.zeros_like(wcount)

        da, inv_mass, mean, m2, wcount = lax.cond(
            do_update, refresh, lambda a: a, (da, inv_mass, mean, m2, wcount)
        )
        return (z, logp, grad, key, da, inv_mass, mean, m2, wcount), (
            stats["diverging"], stats["depth"])

    da0 = _da_init(jnp.asarray(initial_step_size, dtype))
    inv_mass0 = jnp.ones((dim,), dtype)
    carry = (
        z0, logp0, grad0, key, da0, inv_mass0,
        jnp.zeros((dim,), dtype), jnp.zeros((dim,), dtype), jnp.zeros((), dtype),
    )
    carry, (warm_div, warm_depth) = lax.scan(warm_step, carry, update_mass)
    z, logp, grad, key, da, inv_mass, *_ = carry
    step_size = jnp.exp(da.log_step_avg)

    def sample_step(carry, _):
        z, logp, grad, key = carry
        key, sub = jax.random.split(key)
        z, logp, grad, stats = nuts_kernel(
            logp_fn, z, logp, grad, sub, step_size, inv_mass,
            max_depth=max_depth,
        )
        return (z, logp, grad, key), (z, logp, stats["accept_stat"],
                                      stats["diverging"], stats["depth"])

    (_, _, _, _), (samples, logps, accepts, divs, depths) = lax.scan(
        sample_step, (z, logp, grad, key), None, length=num_samples
    )
    stats = {
        "logp": logps,
        "accept_stat": accepts,
        "diverging": divs,
        "depth": depths,
        "step_size": step_size,
        "inv_mass": inv_mass,
        "warmup_diverging": warm_div,
        "warmup_depth": warm_depth,
    }
    return samples, stats


# ---------------------------------------------------------------------------
# Host-stepped driver (tunneled-TPU-safe, like chees.run_chees_stepped)
# ---------------------------------------------------------------------------


def make_nuts_transition(
    logp_fn: Callable,
    num_warmup: int,
    target_accept: float = 0.8,
    max_depth: int = 8,
    initial_step_size: float = 0.1,
):
    """The batched NUTS transition as a pure ``(carry, (it, is_warmup))
    -> (carry, out)`` function, plus its initializer.

    Same warmup/sampling semantics as :func:`run_nuts` (Stan windowed
    adaptation: per-chain dual-averaging step size + Welford diagonal
    mass with slow-window refreshes; sampling at the frozen
    dual-averaged step size) — but with the iteration index supplied
    from outside, so the loop can live either in a ``lax.scan`` or on
    the host (:func:`run_nuts_stepped`). All adaptation state is
    per-chain, exactly as in ``jax.vmap(run_nuts)``.
    """
    # pad so a post-warmup `it` indexes harmlessly (gated by is_warmup)
    update_pad = jnp.concatenate(
        [jnp.asarray(warmup_schedule(num_warmup), bool),
         jnp.zeros((1,), bool)]
    )

    def chain_step(z, logp, grad, sub, da, inv_mass, mean, m2, wcount,
                   do_update, is_warmup):
        # warmup steps at the current DA iterate; sampling at the
        # frozen dual-averaged value (run_nuts:407)
        step_size = jnp.where(
            is_warmup, jnp.exp(da.log_step), jnp.exp(da.log_step_avg))
        z, logp, grad, stats = nuts_kernel(
            logp_fn, z, logp, grad, sub, step_size, inv_mass,
            max_depth=max_depth,
        )
        # --- warmup-only adaptation (gated; mirrors run_nuts.warm_step)
        da_new = _da_update(da, stats["accept_stat"], target_accept)
        da = jax.tree_util.tree_map(
            lambda n, o: jnp.where(is_warmup, n, o), da_new, da)
        wcount_new = wcount + 1
        delta = z - mean
        mean_new = mean + delta / wcount_new
        m2_new = m2 + delta * (z - mean_new)
        mean = jnp.where(is_warmup, mean_new, mean)
        m2 = jnp.where(is_warmup, m2_new, m2)
        wcount = jnp.where(is_warmup, wcount_new, wcount)

        def refresh(args):
            da, inv_mass, mean, m2, wcount = args
            var = m2 / jnp.maximum(wcount - 1, 1)
            var = (wcount / (wcount + 5.0)) * var \
                + 1e-3 * (5.0 / (wcount + 5.0))
            da_new = _da_init(jnp.exp(da.log_step))
            zero = jnp.zeros_like(mean)
            return da_new, var, zero, zero, jnp.zeros_like(wcount)

        da, inv_mass, mean, m2, wcount = lax.cond(
            do_update & is_warmup, refresh, lambda a: a,
            (da, inv_mass, mean, m2, wcount),
        )
        return (z, logp, grad, da, inv_mass, mean, m2, wcount), stats

    def transition(carry, inp):
        it, is_warmup = inp
        z, logp, grad, keys, da, inv_mass, mean, m2, wcount = carry
        kk = jax.vmap(jax.random.split)(keys)  # (C, 2, 2)
        keys, subs = kk[:, 0], kk[:, 1]
        do_update = update_pad[jnp.minimum(it, num_warmup)]
        (z, logp, grad, da, inv_mass, mean, m2, wcount), stats = jax.vmap(
            chain_step,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
        )(z, logp, grad, subs, da, inv_mass, mean, m2, wcount,
          do_update, is_warmup)
        out = (z, logp, stats["accept_stat"], stats["diverging"],
               stats["depth"], stats["num_leaves"])
        return (z, logp, grad, keys, da, inv_mass, mean, m2, wcount), out

    def init(z0, keys):
        C, dim = z0.shape
        dtype = z0.dtype
        logp0, grad0 = jax.vmap(jax.value_and_grad(logp_fn))(z0)
        eps0 = jnp.asarray(initial_step_size, dtype)
        da0 = jax.vmap(lambda _: _da_init(eps0))(jnp.arange(C))
        return (
            z0, logp0, grad0, keys, da0, jnp.ones((C, dim), dtype),
            jnp.zeros((C, dim), dtype), jnp.zeros((C, dim), dtype),
            jnp.zeros((C,), dtype),
        )

    return transition, init


def run_nuts_stepped(
    logp_fn: Callable,
    z0,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    initial_step_size: float = 0.1,
    max_depth: int = 8,
    target_accept: float = 0.8,
    thin: int = 1,
    block: int = 10,
):
    """``jax.vmap(run_nuts)``, but ``block`` transitions per HOST call.

    Same kernel, same per-chain windowed adaptation, same statistics —
    only the iteration loop moves to the host, so no single XLA program
    runs longer than ``block`` transitions. Use on environments whose
    RPC layer kills multi-minute device executions (the tunneled-TPU
    axon backend), exactly like ``chees.run_chees_stepped``. The
    reference's NUTS workflow this mirrors: AdvancedHMC NUTS(0.8),
    500 adapt + 1000 draws (reference
    examples/turing_distributed/single_pl.jl:73-81).

    ``z0``: (C, dim) chain starts. ``key``: either a single PRNG key
    (split into per-chain keys) or a (C, 2) array of per-chain keys.
    Returns ``(samples [S, C, dim] numpy, stats)`` with per-iteration
    ``depth``/``num_leaves``/``diverging`` of shape (total, C) —
    ``num_leaves`` is the exact per-chain leapfrog (= gradient) count.
    """
    import numpy as np

    C, dim = z0.shape
    keys = jax.random.split(key, C) if key.ndim == 1 else key
    transition, init = make_nuts_transition(
        logp_fn, num_warmup, target_accept, max_depth, initial_step_size)

    @jax.jit
    def trans_block(carry, its):
        return lax.scan(transition, carry, (its, its < num_warmup))

    # jit the initial batched value_and_grad: eagerly it dispatches the
    # whole likelihood graph op-by-op (hundreds of tiny compiles), which
    # is both slow and has hit allocator instability under load; jitted
    # it is one program, exactly like run_nuts's in-scan evaluation
    carry = jax.jit(init)(z0, keys)
    total = num_warmup + num_samples
    samples, logps = [], []
    accepts, divs, depths, leaves = [], [], [], []
    for start in range(0, total, block):
        its = jnp.arange(start, min(start + block, total))
        carry, out = trans_block(carry, its)
        z_blk, logp_blk, acc_blk, div_blk, depth_blk, leaf_blk = out
        accepts.append(np.asarray(acc_blk))
        divs.append(np.asarray(div_blk))
        depths.append(np.asarray(depth_blk))
        leaves.append(np.asarray(leaf_blk))
        for j, it in enumerate(range(start, min(start + block, total))):
            if it >= num_warmup and (it - num_warmup) % thin == 0:
                samples.append(np.asarray(z_blk[j]))
                logps.append(np.asarray(logp_blk[j]))
    da, inv_mass = carry[4], carry[5]
    stats = {
        "logp": np.asarray(logps),
        "accept_stat": np.concatenate(accepts),
        "diverging": np.concatenate(divs),
        "depth": np.concatenate(depths),
        "num_leaves": np.concatenate(leaves),
        "step_size": np.asarray(jnp.exp(da.log_step_avg)),
        "inv_mass": np.asarray(inv_mass),
    }
    return np.stack(samples), stats
