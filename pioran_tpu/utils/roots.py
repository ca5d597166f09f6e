"""CARMA root-validity predicates (reference src/utils.jl:154-211).

Two flavors: host-side numpy checks (exact, for prior construction and
tests) and jittable predicates returning booleans (for in-likelihood
rejection with -inf logprob, the pattern of reference docs/src/carma.md:29-38).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "check_conjugate_pair",
    "check_roots_bounds",
    "check_order_imag_roots",
    "roots_valid_jit",
]


def check_conjugate_pair(r) -> bool:
    """All real parts negative and roots form conjugate pairs
    (reference utils.jl:160-180)."""
    r = np.asarray(r)
    if np.any(np.real(r) > 0):
        return False
    n = len(r)
    n_ = n if n % 2 == 0 else n - 1
    for i in range(0, n_, 2):
        if r[i] != np.conj(r[i + 1]):
            return False
    return True


def check_roots_bounds(r, f_min: float, f_max: float) -> bool:
    """Roots within the frequency bounds (reference utils.jl:187-192)."""
    r = np.asarray(r)
    return bool(
        np.all((-f_max < np.real(r)) & (np.real(r) < -f_min))
        and np.all((-f_max < np.imag(r)) & (np.imag(r) < f_max))
    )


def check_order_imag_roots(r) -> bool:
    """Imaginary parts of pair leaders ascending (reference utils.jl:199-210)."""
    r = np.asarray(r)
    n = len(r)
    n_ = n if n % 2 == 0 else n - 1
    lead = np.imag(r[0:n_:2])
    return bool(np.all(np.argsort(lead, kind="stable") == np.arange(len(lead))))


def roots_valid_jit(r, f_min, f_max):
    """Jittable combined validity predicate for AR roots.

    Returns a scalar bool usable as `jnp.where(ok, logp, -inf)` inside a
    jitted log-probability.
    """
    r = jnp.asarray(r)
    n = r.shape[0]
    n_ = n - (n % 2)
    neg_real = jnp.all(jnp.real(r) < 0)
    pairs_ok = jnp.all(r[0:n_:2] == jnp.conj(r[1:n_:2]))
    in_bounds = jnp.all(
        (-f_max < jnp.real(r)) & (jnp.real(r) < -f_min)
        & (-f_max < jnp.imag(r)) & (jnp.imag(r) < f_max)
    )
    lead = jnp.imag(r[0:n_:2])
    ordered = jnp.all(jnp.diff(lead) >= 0) if n_ >= 4 else jnp.asarray(True)
    return neg_real & pairs_ok & in_bounds & ordered
