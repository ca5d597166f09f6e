"""Sampler-state checkpoint / resume (orbax-backed, sharded-safe).

The reference has no in-library checkpointing; its resume story is
ultranest's ``resume = true`` (reference examples/ultranest/single_pl.jl:116,
state in ``inference/*/results/points.hdf5``) and Turing's
``save_state = true`` (examples/turing_distributed/single_pl.jl:80).
Here checkpointing is first-class: any sampler-state pytree (particle
positions, temperatures, step sizes, mass matrices, PRNG keys, SMC
weights) can be saved atomically every few steps and restored to
continue the run, including when the arrays are sharded over a
`jax.sharding.Mesh` — orbax writes each shard from its owning host.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "CheckpointManager"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state: Any, step: int) -> str:
    """Atomically write ``state`` (any pytree of arrays) as step ``step``.

    Returns the checkpoint path. Previous steps are kept; use
    :class:`CheckpointManager` for retention policies.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    """Largest step number with a finalized checkpoint, or None."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and not name.endswith(".orbax-checkpoint-tmp"):
            full = os.path.join(directory, name)
            if os.path.isdir(full):
                try:
                    steps.append(int(name[len("step_"):]))
                except ValueError:
                    pass
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, abstract_state: Any = None
) -> Optional[Tuple[Any, int]]:
    """Restore the latest checkpoint under ``directory``.

    ``abstract_state``: optional pytree of ``jax.ShapeDtypeStruct`` (with
    shardings) or concrete arrays giving the target structure/placement;
    required to restore directly into sharded arrays on a mesh.
    Returns ``(state, step)`` or ``None`` if nothing is saved.
    """
    import orbax.checkpoint as ocp

    step = latest_step(directory)
    if step is None:
        return None
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    ckptr = _checkpointer()
    if abstract_state is not None:
        target = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape")
            else x,
            abstract_state,
        )
        state = ckptr.restore(path, ocp.args.PyTreeRestore(target))
    else:
        state = ckptr.restore(path)
    return state, step


class CheckpointManager:
    """Keep the last ``max_to_keep`` checkpoints of a sampler run."""

    def __init__(self, directory: str, max_to_keep: int = 2, save_every: int = 1):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        self.save_every = save_every

    def should_save(self, step: int) -> bool:
        return step % self.save_every == 0

    def save(self, state: Any, step: int) -> Optional[str]:
        if not self.should_save(step):
            return None
        path = save_checkpoint(self.directory, state, step)
        self._gc()
        return path

    def restore(self, abstract_state: Any = None):
        return restore_checkpoint(self.directory, abstract_state)

    def _gc(self):
        import shutil

        steps = sorted(
            int(n[len("step_"):])
            for n in os.listdir(self.directory)
            if n.startswith("step_") and os.path.isdir(os.path.join(self.directory, n))
        )
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(
                os.path.join(self.directory, f"step_{s:08d}"), ignore_errors=True
            )
