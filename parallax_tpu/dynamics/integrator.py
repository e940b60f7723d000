"""Rigid-body integrators.

The reference ships a single explicit-Euler position update with forces
applied externally as velocity kicks (ExplicitEulerPhysics,
/root/reference/cotix/_physics_solvers.py:16-33; gravity kick at
examples/test_viz.py:27-31).  parallax keeps that update rule bit-for-bit
and adds the semi-implicit (symplectic) variant demanded by the benchmark
ladder (BASELINE config 1) plus in-graph force/gravity accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp

from parallax_tpu.dynamics.bodies import BodyParams, BodyState


def integrate_explicit_euler(state: BodyState, dt) -> BodyState:
    """x += v dt; theta += omega dt (reference _physics_solvers.py:26-31)."""
    return state.replace(
        pos=state.pos + state.vel * dt,
        angle=state.angle + state.omega * dt,
    )


def apply_acceleration(state: BodyState, accel, dt, movable=None) -> BodyState:
    """v += a dt, masked to movable (finite-mass) bodies.

    ``accel`` broadcasts against [.., n, 2] — pass e.g. ``[0, -g]``.
    """
    dv = jnp.broadcast_to(jnp.asarray(accel, state.vel.dtype), state.vel.shape) * dt
    if movable is not None:
        dv = dv * movable[..., None]
    return state.replace(vel=state.vel + dv)


def integrate_symplectic_euler(
    state: BodyState, dt, accel=None, movable=None
) -> BodyState:
    """Semi-implicit Euler: velocities first, then positions."""
    if accel is not None:
        state = apply_acceleration(state, accel, dt, movable)
    return integrate_explicit_euler(state, dt)


def movable_mask(params: BodyParams):
    """1.0 for finite-mass bodies, 0.0 for static ones."""
    return jnp.isfinite(params.mass).astype(params.mass.dtype)
