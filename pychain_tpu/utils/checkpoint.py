"""Checkpoint / resume utilities.

The reference has no checkpointing (SURVEY.md §5 — graphs can be
re-serialised via FST write; training state was the host trainer's
problem).  pychain_tpu ships a small orbax-backed helper so the example
training pipeline is restartable end-to-end: model params, optimiser
state, and step counter in one directory, plus graph re-serialisation
through the FST layer.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, step: int, state: Any) -> None:
    """Save a pytree (params/opt_state/...) at ``path/step_N``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, f"step_{step}"), state, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(path, "LATEST"), "w") as f:
        f.write(str(step))


def latest_step(path: str) -> Optional[int]:
    marker = os.path.join(os.path.abspath(path), "LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def restore_checkpoint(path: str, template: Any,
                       step: Optional[int] = None) -> tuple[int, Any]:
    """Restore the given (or latest) step; ``template`` is a pytree of
    like-shaped arrays (e.g. a freshly-initialised state)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(
        os.path.join(os.path.abspath(path), f"step_{step}"),
        jax.tree.map(lambda x: x, template))
    return step, state
