"""Vectorized nested sampling — the direct ultranest replacement.

The reference's primary inference mode is ultranest's
ReactiveNestedSampler fed a scalar likelihood farmed over MPI ranks
(reference examples/ultranest/single_pl.jl:116-119, docs/src/ultranest.md:45-66).
The TPU-native redesign keeps K live points resident on device and
replaces the per-point MPI farm with *batched deletion*: every iteration
the worst ``n_delete`` points die together and their replacements run as
``n_delete`` parallel threshold-constrained MCMC chains whose likelihood
sweeps are single fused batched calls (the Pallas celerite kernel on
TPU). All control flow is a ``lax.while_loop`` — one jitted program, no
host round-trips.

Algorithm notes
---------------
- Works in the unit cube; ``transform`` is the prior quantile map
  (PriorSet.transform, the exact analog of ultranest's prior_transform,
  reference examples/ultranest/single_pl.jl:96-104).
- Shrinkage is the standard deterministic estimate: the i-th dead point
  (global order) has log X_i = -(i+1)/K, so deleting D sorted points per
  step shrinks log X by D/K. Evidence accumulates trapezoid weights
  w_i = X_{i-1} - X_i on the dead sequence; the final live set enters
  with equal weight X_final/K (Skilling 2006).
- Replacement chains: preconditioned random-walk Metropolis on the unit
  cube with the live-cloud covariance, accepting moves that stay in the
  cube AND exceed the current likelihood threshold — Metropolis with a
  uniform target on {u : L(u) > L*}, i.e. exactly the constrained-prior
  draw nested sampling requires. Walk scale adapts toward ~37%
  acceptance between iterations.
- logZ error: sqrt(H/K) with H the information, matching ultranest's
  ``logzerr`` (BASELINE.md anchors logZ = 1014.013 +- 0.30).

Multi-device: live points shard over the mesh's particle axis; the sort
and logsumexp reductions are collective-friendly (see
pioran_tpu.parallel.sharded_ns).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["NSResult", "run_ns", "run_ns_resumable", "ns_init",
           "equal_weight_indices"]


class NSResult(NamedTuple):
    dead_u: jax.Array        # (max_dead, dim) dead points, unit cube, sorted order
    dead_logl: jax.Array     # (max_dead,) their log-likelihoods
    dead_logw: jax.Array     # (max_dead,) log prior-volume weights (no L factor)
    num_dead: jax.Array      # how many entries of the buffers are valid
    logZ: jax.Array
    logZ_err: jax.Array
    H: jax.Array             # information (nats)
    num_iters: jax.Array
    ncall: jax.Array         # likelihood evaluations
    acceptance: jax.Array    # final walker acceptance rate
    logl_max: jax.Array
    insert_ranks: jax.Array  # (max_iters * n_delete,) replacement insertion
    #   ranks among the K - n_delete survivors (uniform on 0..K-n_delete
    #   under correct constrained-prior sampling; -1 beyond num_iters*D).
    #   Feed to utils.insertion.insertion_order_test — the analog of
    #   ultranest's insertion_order_MWW_test (reference
    #   examples/ultranest/inference/simu_single/info/results.json).


def _logsubexp(a, b):
    """log(exp(a) - exp(b)) for a > b, stable."""
    return a + jnp.log1p(-jnp.exp(jnp.minimum(b - a, -1e-12)))


def ns_init(loglike_u_batch, key, num_live: int, dim: int, dtype=None):
    """Draw the initial live set uniformly in the unit cube."""
    dtype = dtype or jnp.result_type(float)
    k_u, key = jax.random.split(key)
    u = jax.random.uniform(k_u, (num_live, dim), dtype)
    logl = loglike_u_batch(u)
    return u, logl, key


@partial(
    jax.jit,
    static_argnames=(
        "loglike_u_batch", "num_live", "dim", "n_delete", "num_mcmc",
        "max_iters", "move", "n_expand", "n_shrink",
    ),
)
def run_ns(
    loglike_u_batch: Callable,
    key,
    num_live: int = 1024,
    dim: int = 1,
    n_delete: int = 128,
    num_mcmc: int = 32,
    max_iters: int = 2000,
    frac_remain: float = 1e-2,
    live_init=None,
    move: str = "slice",
    n_expand: int = 4,
    n_shrink: int = 8,
) -> NSResult:
    """Nested sampling of ``loglike_u_batch`` ((B, dim) unit-cube -> (B,)).

    ``n_delete`` points are replaced per iteration (each by an
    independent constrained walk started from a random survivor).
    Terminates when the live set's remaining evidence is below
    ``frac_remain`` of the accumulated evidence, or at ``max_iters``.

    ``move``:

    - ``"slice"`` (default): ``num_mcmc`` slice-sampling updates along
      random live-cloud-preconditioned directions, Neal step-out +
      shrink (the PolyChord/jaxns approach). Exactly invariant for the
      flat constrained target and reaches the long degenerate tails a
      fixed-scale walk misses — on the reference's single-bending
      posterior (f1 spanning a factor ~20, BASELINE.md) random-walk
      replacements bias the posterior mean by ~0.6 sd while slice
      replacements do not. Each update costs 2 ``n_expand`` + ``n_shrink``
      batched likelihood sweeps of width ``n_delete``.
    - ``"rwm"``: ``num_mcmc`` preconditioned random-walk Metropolis
      steps accepting in-cube proposals above the threshold (one sweep
      each) — cheaper per update, fine for compact unimodal problems.

    Returns an :class:`NSResult`; posterior samples via
    :func:`equal_weight_indices` on (dead_logl + dead_logw).
    """
    dtype = jnp.result_type(float)
    K, D = num_live, n_delete

    if live_init is None:
        k_init, key = jax.random.split(key)
        live_u = jax.random.uniform(k_init, (K, dim), dtype)
        live_logl = loglike_u_batch(live_u)
    else:
        live_u, live_logl = live_init
        live_u = live_u.astype(dtype)
        live_logl = live_logl.astype(dtype)

    step = _make_ns_step(
        loglike_u_batch, K, D, dim, dtype, num_mcmc, move, n_expand,
        n_shrink, max_iters,
    )

    def cond(state):
        live_logl, logX, logZ, it = state[1], state[2], state[3], state[4]
        logZ_live = (
            jax.scipy.special.logsumexp(live_logl) - jnp.log(K) + logX
        )
        not_done = logZ_live - logZ > jnp.log(frac_remain)
        return (it < max_iters) & (not_done | (it == 0))

    state = _ns_init_state(live_u, live_logl, key, K, D, dim, dtype,
                           max_iters, move)
    state = lax.while_loop(cond, step, state)
    return _ns_finalize(state, K, D)


def _ns_init_state(live_u, live_logl, key, K, D, dim, dtype, max_iters,
                   move):
    """Initial NS state tuple (a checkpointable pytree)."""
    max_dead = max_iters * D + K  # dead rows + the final live set
    dead_u0 = jnp.zeros((max_dead, dim), dtype)
    dead_logl0 = jnp.full((max_dead,), -jnp.inf, dtype)
    dead_logw0 = jnp.full((max_dead,), -jnp.inf, dtype)
    ranks0 = jnp.full((max_iters * D,), -1.0, dtype)
    scale0 = jnp.asarray(
        1.0 if move == "slice" else 2.0 / jnp.sqrt(jnp.asarray(dim, dtype)),
        dtype)
    return (
        live_u, live_logl, jnp.zeros((), dtype),
        jnp.asarray(-jnp.inf, dtype),
        jnp.zeros((), jnp.int32), key, dead_u0, dead_logl0, dead_logw0,
        scale0, jnp.zeros((), dtype), jnp.asarray(K, jnp.int64 if
        jnp.result_type(int) == jnp.int64 else jnp.int32),
        ranks0,
    )


def _make_ns_step(loglike_u_batch, K, D, dim, dtype, num_mcmc, move,
                  n_expand, n_shrink, max_iters):
    """One NS iteration as a pure state -> state function."""
    # Exact expected shrinkage for batched deletion: the i-th deletion
    # within a batch removes the worst of K-i+1 uniform points, so
    # E[ln t_i] = -1/(K-i+1); after j deletions ln x_j = -(H_K - H_{K-j}).
    # (The common -j/K approximation under-shrinks by ~D/2K^2 per point
    # and biases logZ high by ~iters*D^2/2K^2 — measurable at D/K = 1/8.)
    import numpy as _np

    Hk = _np.concatenate([[0.0], _np.cumsum(1.0 / _np.arange(1, K + 1))])
    lnx = -(Hk[K] - Hk[K - _np.arange(0, D + 1)])  # after 0..D deletions
    logw_step = jnp.asarray(
        _np.log(_np.exp(lnx[:-1]) - _np.exp(lnx[1:])), dtype)
    dlogX = float(lnx[D])

    def logaddexp(a, b):
        return jnp.logaddexp(a, b)

    def step(state):
        (live_u, live_logl, logX, logZ, it, key,
         dead_u, dead_logl, dead_logw, scale, acc_prev, ncall,
         ranks) = state
        key, k_start, k_walk = jax.random.split(key, 3)

        # ---- delete the D worst, record them in ascending-L order ----
        order = jnp.argsort(live_logl)
        dead_idx = order[:D]
        survivors = order[D:]
        dying_u = live_u[dead_idx]
        dying_logl = live_logl[dead_idx]
        # threshold = highest DEAD likelihood L_(D): replacements are
        # uniform in the volume above L_(D), which is exactly the
        # X e^{-D/K} the shrinkage model assumes. (Thresholding at the
        # lowest survivor L_(D+1) instead loses 1/K of volume per
        # iteration and biases logZ high by ~iters/K.)
        logl_star = dying_logl[-1]

        logw = logX + logw_step                      # (D,)
        row = it * D
        dead_u = lax.dynamic_update_slice(
            dead_u, dying_u, (row, jnp.zeros((), row.dtype)))
        dead_logl = lax.dynamic_update_slice(dead_logl, dying_logl, (row,))
        dead_logw = lax.dynamic_update_slice(dead_logw, logw, (row,))

        contrib = jax.scipy.special.logsumexp(logw + dying_logl)
        logZ = logaddexp(logZ, contrib)
        logX = logX + dlogX

        # ---- replacements: D constrained walkers from random survivors ----
        start = jax.random.choice(k_start, survivors, (D,), replace=True)
        walk_u = live_u[start]
        walk_logl = live_logl[start]

        # precondition with the live-cloud covariance (unit-cube space)
        cov = jnp.cov(live_u[survivors].T) + 1e-12 * jnp.eye(dim, dtype=dtype)
        chol = jnp.linalg.cholesky(cov)

        def eval_constrained(prop):
            """(D, dim) -> (loglike, satisfies L>L* and inside cube)."""
            inside = jnp.all((prop > 0.0) & (prop < 1.0), axis=-1)
            pl = loglike_u_batch(jnp.clip(prop, 1e-9, 1.0 - 1e-9))
            return pl, inside & (pl > logl_star)

        def one_rwm_step(carry, k):
            wu, wl, acc = carry
            eps = jax.random.normal(k, wu.shape, dtype)
            prop = wu + scale * (eps @ chol.T)
            pl, ok = eval_constrained(prop)
            wu = jnp.where(ok[:, None], prop, wu)
            wl = jnp.where(ok, pl, wl)
            return (wu, wl, acc + jnp.mean(ok.astype(dtype))), None

        def one_slice_step(carry, k):
            """One Neal slice update per walker along a random
            cloud-preconditioned direction: step-out then shrink.
            The constrained target is flat, so the 'slice' is simply
            {s : L(u + s v) > L*} intersect the cube."""
            wu, wl, acc = carry
            k_dir, k_pos, k_shr = jax.random.split(k, 3)
            v = jax.random.normal(k_dir, wu.shape, dtype) @ chol.T  # (D, dim)
            r = jax.random.uniform(k_pos, (D,), dtype)
            lo = -scale * r
            hi = scale * (1.0 - r)

            # step-out: expand an end while its endpoint still satisfies
            # the constraint (fixed n_expand rounds, masked)
            def expand(carry2, _):
                lo, hi = carry2
                _, ok_lo = eval_constrained(wu + lo[:, None] * v)
                _, ok_hi = eval_constrained(wu + hi[:, None] * v)
                lo = jnp.where(ok_lo, lo - scale, lo)
                hi = jnp.where(ok_hi, hi + scale, hi)
                return (lo, hi), None

            (lo, hi), _ = lax.scan(expand, (lo, hi), None, length=n_expand)

            # shrink: sample within the bracket, accept above threshold,
            # shrink the failing side toward 0 (fixed n_shrink rounds)
            def shrink(carry2, kk):
                wu_c, wl_c, lo, hi, done = carry2
                s = lo + (hi - lo) * jax.random.uniform(kk, (D,), dtype)
                prop = wu + s[:, None] * v
                pl, ok = eval_constrained(prop)
                take = ok & ~done
                wu_c = jnp.where(take[:, None], prop, wu_c)
                wl_c = jnp.where(take, pl, wl_c)
                done = done | ok
                fail = (~ok) & (~done)
                lo = jnp.where(fail & (s < 0), s, lo)
                hi = jnp.where(fail & (s >= 0), s, hi)
                return (wu_c, wl_c, lo, hi, done), None

            done0 = jnp.zeros((D,), bool)
            (wu, wl, lo, hi, done), _ = lax.scan(
                shrink, (wu, wl, lo, hi, done0),
                jax.random.split(k_shr, n_shrink),
            )
            return (wu, wl, acc + jnp.mean(done.astype(dtype))), None

        one_move = one_slice_step if move == "slice" else one_rwm_step
        evals_per = (2 * n_expand + n_shrink) if move == "slice" else 1
        keys = jax.random.split(k_walk, num_mcmc)
        (walk_u, walk_logl, acc), _ = lax.scan(
            one_move, (walk_u, walk_logl, jnp.zeros((), dtype)), keys
        )
        acc_rate = acc / num_mcmc
        ncall = ncall + D * num_mcmc * evals_per

        # insertion-order diagnostic: each replacement's rank among the
        # K - D survivors' likelihoods — uniform on {0..K-D} iff the
        # constrained-prior walks have converged (the statistic behind
        # ultranest's insertion_order_MWW_test; Buchner 2021)
        surv_logl = live_logl[survivors]
        new_ranks = jnp.sum(
            surv_logl[None, :] < walk_logl[:, None], axis=1
        ).astype(ranks.dtype)
        ranks = lax.dynamic_update_slice(ranks, new_ranks, (it * D,))

        # rebuild the live set: survivors + fresh walkers
        live_u = jnp.concatenate([live_u[survivors], walk_u], axis=0)
        live_logl = jnp.concatenate([live_logl[survivors], walk_logl], axis=0)

        if move == "slice":
            # bracket width stays at ~1 cloud-sigma: step-out covers
            # heavy tails, shrink covers over-wide brackets
            pass
        else:
            # Robbins-Monro toward ~37% acceptance for the walk
            scale = jnp.clip(scale * jnp.exp(acc_rate - 0.37), 1e-4, 1.0)

        return (live_u, live_logl, logX, logZ, it + 1, key,
                dead_u, dead_logl, dead_logw, scale, acc_rate, ncall,
                ranks)

    return step


def _ns_finalize(state, K, D) -> NSResult:
    """Fold the final live set into the evidence and build the result."""
    (live_u, live_logl, logX, logZ, it, key,
     dead_u, dead_logl, dead_logw, scale, acc_rate, ncall,
     ranks) = state
    dtype = live_logl.dtype
    max_dead = dead_logl.shape[0]

    # ---- fold the final live set into the evidence (Skilling 2006) ----
    # each of the K survivors carries weight X_final / K
    order = jnp.argsort(live_logl)
    live_u_s = live_u[order]
    live_logl_s = live_logl[order]
    live_logw = jnp.full((K,), logX - jnp.log(K), dtype)
    logZ_final = jnp.logaddexp(
        logZ, jax.scipy.special.logsumexp(live_logw + live_logl_s)
    )

    # append the final live set to the dead buffers (buffer is sized
    # max_iters * D + K, so this never clobbers dead rows)
    n_dead = it * D
    dead_u = lax.dynamic_update_slice(
        dead_u, live_u_s, (n_dead, jnp.zeros((), n_dead.dtype)))
    dead_logl = lax.dynamic_update_slice(dead_logl, live_logl_s, (n_dead,))
    dead_logw = lax.dynamic_update_slice(dead_logw, live_logw, (n_dead,))

    # information H = sum_i P_i ln L_i - ln Z with P_i the normalized
    # posterior masses — computed post-hoc on the dead buffers so no
    # exp(ln L) ever appears unnormalized (ln L ~ 10^3 overflows f32)
    valid = jnp.arange(max_dead) < n_dead + K
    logP = jnp.where(valid, dead_logl + dead_logw, -jnp.inf) - logZ_final
    P = jnp.exp(logP)
    H = jnp.sum(jnp.where(valid & jnp.isfinite(dead_logl),
                          P * dead_logl, 0.0)) - logZ_final
    logZ_err = jnp.sqrt(jnp.maximum(H, 0.0) / K)

    return NSResult(
        dead_u=dead_u, dead_logl=dead_logl, dead_logw=dead_logw,
        num_dead=n_dead + K,
        logZ=logZ_final, logZ_err=logZ_err, H=H, num_iters=it,
        ncall=ncall, acceptance=acc_rate,
        logl_max=jnp.max(live_logl),
        insert_ranks=ranks,
    )


def run_ns_resumable(
    loglike_u_batch: Callable,
    key,
    checkpoint_dir: str,
    num_live: int = 1024,
    dim: int = 1,
    n_delete: int = 128,
    num_mcmc: int = 8,
    max_iters: int = 2000,
    frac_remain: float = 1e-2,
    move: str = "slice",
    n_expand: int = 4,
    n_shrink: int = 8,
    save_every: int = 5,
    max_to_keep: int = 2,
) -> NSResult:
    """:func:`run_ns` with orbax checkpoint/resume — the analog of
    ultranest's ``resume = true`` (reference
    examples/ultranest/single_pl.jl:116, state in
    inference/*/results/points.hdf5).

    The iteration loop runs on the host, one jitted NS step at a time;
    every ``save_every`` steps the full sampler state (live set, dead
    buffers, evidence, PRNG key) is written atomically to
    ``checkpoint_dir``. Re-running with the same directory resumes from
    the last finalized step. Host-loop overhead is negligible: each step
    costs ``num_mcmc`` constrained-walk updates of ``n_delete`` batched
    likelihood sweeps on device.
    """
    from ..checkpoint import CheckpointManager

    dtype = jnp.result_type(float)
    K, D = num_live, n_delete
    mgr = CheckpointManager(checkpoint_dir, max_to_keep=max_to_keep,
                            save_every=save_every)

    k_init, key = jax.random.split(key)
    live_u = jax.random.uniform(k_init, (K, dim), dtype)
    live_logl = loglike_u_batch(live_u)
    state = _ns_init_state(live_u, live_logl, key, K, D, dim, dtype,
                           max_iters, move)

    restored = mgr.restore(abstract_state=state)
    if restored is not None:
        state = jax.tree.map(
            lambda tpl, cur: jnp.asarray(tpl, getattr(cur, "dtype", None)),
            restored[0], state,
        )

    step = jax.jit(_make_ns_step(
        loglike_u_batch, K, D, dim, dtype, num_mcmc, move, n_expand,
        n_shrink, max_iters,
    ))

    def remaining(state):
        live_logl, logX, logZ = state[1], state[2], state[3]
        logZ_live = float(
            jax.scipy.special.logsumexp(live_logl) - jnp.log(K) + logX
        )
        return logZ_live - float(logZ)

    it = int(state[4])
    while it < max_iters and (it == 0 or remaining(state) > np.log(frac_remain)):
        state = step(state)
        it = int(state[4])
        mgr.save(jax.tree.map(lambda x: x, state), it)

    return _ns_finalize(state, K, D)


def equal_weight_indices(key, dead_logl, dead_logw, num_dead, num_samples):
    """Systematic-resample indices into the dead buffer by posterior mass.

    Rows past ``num_dead`` carry -inf weight and are never selected —
    the analog of ultranest's equal_weighted_post (reference
    test/data/simu_single_123_factor/chains/equal_weighted_post.txt).
    """
    logp = dead_logl + dead_logw
    valid = jnp.arange(logp.shape[0]) < num_dead
    logp = jnp.where(valid & jnp.isfinite(logp), logp, -jnp.inf)
    logp = logp - jax.scipy.special.logsumexp(logp)
    w = jnp.exp(logp)
    w = w / jnp.sum(w)
    positions = (
        jax.random.uniform(key, ()) + jnp.arange(num_samples)
    ) / num_samples
    cumsum = jnp.cumsum(w)
    cumsum = cumsum / cumsum[-1]
    return jnp.searchsorted(cumsum, positions, side="left")
