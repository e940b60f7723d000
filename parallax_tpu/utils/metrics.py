"""Per-step metrics pytrees and host-side logging.

The reference's observability surface is an empty metrics struct plus a
pygame draw callback (``CollisionResolutionExtraInfo``,
_collision_resolution.py:18-49,149-151; ``collision_callback``,
_colliders.py:76).  The rebuild target (SURVEY.md §5) is a *structured
per-step info pytree* — contacts count, penetration depths, rewards,
resets — computed in-graph and logged host-side via
``jax.debug.callback`` only when debugging is on.

Everything here is jit-safe and shape-static: summaries are reductions,
so on a sharded batch they cost one psum each at most (XLA inserts it).

Usage::

    state, contacts = world.step(state)
    m = contact_metrics(contacts)          # {'n_active', 'max_depth', ...}
    log_metrics(m, step=i, every=100)      # host print, debug only

    # batched fast path (batch-minor planes):
    soa = _to_soa(batched_state)
    m = contact_metrics_bm(collide_batched(world, soa))
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..geometry.math import safe_norm


def contact_metrics(contacts) -> Dict[str, jnp.ndarray]:
    """Summarize a ``Contact`` pytree (any leading batch dims).

    Returns scalars (reduced over *all* leading axes):
      - ``n_active``   total active contact points
      - ``max_depth``  deepest penetration (0 if none active)
      - ``mean_depth`` mean penetration over active points (0 if none)
      - ``sum_depth``  total penetration volume proxy
    """
    act = contacts.active
    depth = safe_norm(contacts.penetration, axis=-1) * act
    n = jnp.sum(act)
    total = jnp.sum(depth)
    return {
        "n_active": n,
        "max_depth": jnp.max(depth, initial=0.0),
        "mean_depth": total / jnp.maximum(n, 1),
        "sum_depth": total,
    }


def contact_metrics_bm(contacts) -> Dict[str, jnp.ndarray]:
    """Same summary for the batch-minor fast path's ``ContactsBM`` planes

    (``engine/batched.py``: pen_x/pen_y/active of shape [C, B]).  Reduces
    over contact rows, returns per-world [B] vectors plus fleet scalars —
    the per-world vectors are what a vectorized logger/curriculum wants.
    """
    act = contacts.active.astype(contacts.pen_x.dtype)
    depth = jnp.sqrt(contacts.pen_x**2 + contacts.pen_y**2 + 1e-30) * act
    n_w = jnp.sum(act, axis=0)  # [B]
    sum_w = jnp.sum(depth, axis=0)  # [B]
    return {
        "n_active_per_world": n_w,
        "max_depth_per_world": jnp.max(depth, axis=0, initial=0.0),
        "mean_depth_per_world": sum_w / jnp.maximum(n_w, 1),
        "n_active": jnp.sum(n_w),
        "max_depth": jnp.max(depth, initial=0.0),
    }


def timestep_metrics(ts) -> Dict[str, jnp.ndarray]:
    """Reward/reset summary of a (batched or stacked) ``TimeStep``."""
    done = ts.done.astype(jnp.float32)
    return {
        "mean_reward": jnp.mean(ts.reward),
        "n_done": jnp.sum(done),
        "reset_rate": jnp.mean(done),
    }


def merge_metrics(*ms: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Left-to-right merge of metric dicts (later keys win)."""
    out: Dict[str, jnp.ndarray] = {}
    for m in ms:
        out.update(m)
    return out


_DEBUG = [False]


def set_debug_logging(on: bool) -> None:
    """Globally enable the host-side ``log_metrics`` callback.

    Off by default: per SURVEY.md §5 the callback path exists for
    debugging only — it forces a host sync and must never sit in the
    production step."""
    _DEBUG[0] = bool(on)


def log_metrics(metrics: Dict[str, jnp.ndarray], step=0, every: int = 1) -> None:
    """Print scalar metrics from inside jit via ``jax.debug.callback``.

    No-op unless :func:`set_debug_logging` was turned on (checked at
    trace time, so production graphs contain no callback at all).
    Vector entries (per-world planes) are skipped.
    """
    if not _DEBUG[0]:
        return
    scalars = {k: v for k, v in metrics.items() if jnp.ndim(v) == 0}

    def _host(step_, every_, **kw):
        import numpy as np

        s = int(np.asarray(step_))
        if s % int(np.asarray(every_)) == 0:
            line = " ".join(f"{k}={float(np.asarray(v)):.6g}" for k, v in sorted(kw.items()))
            print(f"[metrics step={s}] {line}", flush=True)

    jax.debug.callback(_host, step, every, **scalars)
