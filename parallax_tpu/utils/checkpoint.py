"""Checkpoint / resume for env fleets and training state.

The reference has no checkpointing (SURVEY §5); since every piece of
parallax state is a flat pytree of arrays, orbax gives it to us directly:
save (env states, PRNG keys, policy/optimizer params, step counter),
restore, re-jit, continue.  Works with sharded arrays — orbax records the
sharding and restores onto the same mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, tree: Any, force: bool = True) -> None:
    """Save a pytree checkpoint to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint; ``target`` (an example pytree) pins structure,

    dtypes and shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        return ckptr.restore(path, target)
