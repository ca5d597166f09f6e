"""Global numeric configuration for pioran_tpu.

The reference implementation (Pioran.jl) is float64 throughout. On TPU,
float64 is emulated and slow, so the framework is dtype-polymorphic:
every op follows the dtype of its inputs. Tests and the correctness
oracle run in float64 on CPU (``jax_enable_x64``); production sampling
on TPU runs float32 (optionally with compensated accumulations in the
solver scans).

Use :func:`use_x64` in drivers/tests that need strict parity with the
reference.
"""

from __future__ import annotations

import jax


def use_x64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit mode globally. Call before tracing."""
    jax.config.update("jax_enable_x64", enable)


def default_float():
    """The current default floating dtype (f64 if x64 is on, else f32)."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
