"""Spring–damper positional joints (fixed-point constraints).

Behavioral port of the LunarLander leg joints
(/root/reference/cotix/_lunar_lander.py:145-218): each joint pins a local
anchor on body A to a local anchor on body B with the reference's impulse
law ``J = dp * kp + dv * (|dv| + v0) * kd`` (defaults kp=1.0, v0=0.1,
kd=0.05, _lunar_lander.py:188-189), applied as -J to A and +J to B at the
respective world anchors.

The reference applies its four lander joints *sequentially*, each seeing the
velocities updated by the previous one; ``apply_joints`` reproduces that
with a ``lax.scan`` over the joint table ("gauss_seidel" mode) and also
offers a fully-parallel "jacobi" mode.  World anchor positions are computed
once from the poses at entry (positions don't change inside the solve),
exactly as in the reference.

This module also subsumes the reference's aspirational
``SimpleConstraintSolver`` (_constraint_solvers.py:4-17) whose ``Constraint``
protocol was never implemented: a ``Joints`` table plus ``apply_joints``
with ``iterations > 1`` is that solver, realized.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.dynamics.bodies import BodyParams, BodyState
from parallax_tpu.dynamics.impulses import impulse_deltas
from parallax_tpu.geometry.math import perpendicular_vector, rotate, safe_norm


class Joints(struct.PyTreeNode):
    """Static joint table; anchors are dynamic leaves (differentiable)."""

    anchor_a: jnp.ndarray  # [J, 2] local anchor on body_a
    anchor_b: jnp.ndarray  # [J, 2] local anchor on body_b
    kp: jnp.ndarray  # [J] position gain
    kd: jnp.ndarray  # [J] velocity gain
    v0: jnp.ndarray  # [J] velocity-law offset
    body_a: tuple = struct.field(pytree_node=False)
    body_b: tuple = struct.field(pytree_node=False)

    @property
    def n_joints(self) -> int:
        return len(self.body_a)

    @staticmethod
    def make(body_a, body_b, anchor_a, anchor_b, kp=1.0, kd=0.05, v0=0.1) -> "Joints":
        J = len(body_a)
        return Joints(
            anchor_a=jnp.asarray(anchor_a, jnp.float32).reshape(J, 2),
            anchor_b=jnp.asarray(anchor_b, jnp.float32).reshape(J, 2),
            kp=jnp.broadcast_to(jnp.asarray(kp, jnp.float32), (J,)),
            kd=jnp.broadcast_to(jnp.asarray(kd, jnp.float32), (J,)),
            v0=jnp.broadcast_to(jnp.asarray(v0, jnp.float32), (J,)),
            body_a=tuple(int(b) for b in body_a),
            body_b=tuple(int(b) for b in body_b),
        )

    @staticmethod
    def empty() -> "Joints":
        return Joints.make([], [], np.zeros((0, 2)), np.zeros((0, 2)))


def _world_anchors(state: BodyState, joints: Joints):
    ia = list(joints.body_a)
    ib = list(joints.body_b)
    pa = state.pos[..., ia, :] + rotate(joints.anchor_a, state.angle[..., ia])
    pb = state.pos[..., ib, :] + rotate(joints.anchor_b, state.angle[..., ib])
    return pa, pb


def apply_joints(
    state: BodyState,
    params: BodyParams,
    joints: Joints,
    mode: str = "gauss_seidel",
    iterations: int = 1,
) -> BodyState:
    """Apply all joint impulses; returns state with updated velocities."""
    if joints.n_joints == 0:
        return state

    ia = np.asarray(joints.body_a)
    ib = np.asarray(joints.body_b)
    pa, pb = _world_anchors(state, joints)  # [.., J, 2]
    inv_mass = params.inv_mass
    inv_inertia = params.inv_inertia

    if mode == "jacobi":
        for _ in range(iterations):
            va = state.vel[..., ia, :] + perpendicular_vector(
                pa - state.pos[..., ia, :]
            ) * state.omega[..., ia, None]
            vb = state.vel[..., ib, :] + perpendicular_vector(
                pb - state.pos[..., ib, :]
            ) * state.omega[..., ib, None]
            dp = pa - pb
            dv = va - vb
            dvn = safe_norm(dv, axis=-1, keepdims=True)
            J = dp * joints.kp[..., None] + dv * (dvn + joints.v0[..., None]) * joints.kd[..., None]
            dva, dwa = impulse_deltas(-J, pa, state.pos[..., ia, :], inv_mass[..., ia], inv_inertia[..., ia])
            dvb, dwb = impulse_deltas(J, pb, state.pos[..., ib, :], inv_mass[..., ib], inv_inertia[..., ib])
            vel = state.vel.at[..., ia, :].add(dva).at[..., ib, :].add(dvb)
            omega = state.omega.at[..., ia].add(dwa).at[..., ib].add(dwb)
            state = state.replace(vel=vel, omega=omega)
        return state

    # gauss_seidel: sequential scan, reference semantics
    def body_fn(carry, j):
        vel, omega = carry
        a = jnp.asarray(ia)[j]
        b = jnp.asarray(ib)[j]
        pos_a = jnp.take(state.pos, a, axis=-2)
        pos_b = jnp.take(state.pos, b, axis=-2)
        paj = jnp.take(pa, j, axis=-2)
        pbj = jnp.take(pb, j, axis=-2)
        va = jnp.take(vel, a, axis=-2) + perpendicular_vector(paj - pos_a) * jnp.take(
            omega, a, axis=-1
        )[..., None]
        vb = jnp.take(vel, b, axis=-2) + perpendicular_vector(pbj - pos_b) * jnp.take(
            omega, b, axis=-1
        )[..., None]
        dp = paj - pbj
        dv = va - vb
        dvn = safe_norm(dv, axis=-1, keepdims=True)
        J = dp * joints.kp[j] + dv * (dvn + joints.v0[j]) * joints.kd[j]
        dva, dwa = impulse_deltas(
            -J, paj, pos_a, jnp.take(inv_mass, a, -1), jnp.take(inv_inertia, a, -1)
        )
        dvb, dwb = impulse_deltas(
            J, pbj, pos_b, jnp.take(inv_mass, b, -1), jnp.take(inv_inertia, b, -1)
        )
        vel = vel.at[..., a, :].add(dva).at[..., b, :].add(dvb)
        omega = omega.at[..., a].add(dwa).at[..., b].add(dwb)
        return (vel, omega), None

    vel, omega = state.vel, state.omega
    for _ in range(iterations):
        (vel, omega), _ = jax.lax.scan(
            body_fn, (vel, omega), jnp.arange(joints.n_joints)
        )
    return state.replace(vel=vel, omega=omega)
