"""World: bodies + shapes + pair table + joints as one jittable step.

Replaces the reference's ``SimpleWorld`` (/root/reference/cotix/_worlds.py:48-79,
whose forward path was unexercised dead glue — SURVEY §2.4) with a working,
fully-batched pipeline.  The default step order replicates the reference's
only *working* loop (examples/test_viz.py:24-48):

    1. integrate positions from velocities   (ExplicitEulerPhysics.step)
    2. apply gravity as a velocity kick
    3. detect + resolve contacts             (collider)
    4. apply joint impulses                  (env.step() joints)

``integrator="symplectic"`` flips 1↔2 (velocity kick first), which is the
semi-implicit Euler demanded by BASELINE config 1.

``World`` is a pytree: shape vertices, masses, joint gains are all
differentiable leaves; the static topology (pair table, kinds, joint
wiring) is hashable config, so ``jax.jit(world.step)`` specializes once per
topology.  ``step`` is written for a single world; batch via ``jax.vmap``
(see ``envs.base`` and ``parallel``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.dynamics.bodies import BodyParams, BodyState
from parallax_tpu.dynamics.impulses import ContactSolverConfig, DEFAULT_SOLVER
from parallax_tpu.dynamics.integrator import (
    apply_acceleration,
    integrate_explicit_euler,
    movable_mask,
)
from parallax_tpu.dynamics.joints import Joints, apply_joints
from parallax_tpu.dynamics.block_solver import solve_contacts as solve_contacts_block
from parallax_tpu.dynamics.solver import resolve_contacts
from parallax_tpu.engine.collider import PairTable, build_pair_table, collide
from parallax_tpu.engine.ref_replay import build_replay_plan, resolve_reference_keyed
from parallax_tpu.geometry.contacts import Contact
from parallax_tpu.geometry.shapes import Parts, ShapeSpec


@dataclasses.dataclass(frozen=True)
class WorldConfig:
    """Static world configuration (hashable; participates in jit keys)."""

    dt: float = 0.01
    gravity: tuple = (0.0, 0.0)
    integrator: str = "reference"  # "reference" | "symplectic"
    narrowphase: str = "sat"  # "sat" (fast, exact MTV) | "gjk_epa" (reference path)
    # AABB broad-phase pre-mask on the cp/bp/pp pair groups (the reference's
    # possibly_collides_with, _universal_shape.py:109-110).  Conservative —
    # never culls a truly penetrating pair — but suppresses phantom
    # far-apart activity from narrow-phase float noise; disable for bitwise
    # parity with reference-mode trajectories.
    broadphase: bool = True
    # block | jacobi | gauss_seidel | random_one_per_body |
    # random_one_per_body_keyed (key-for-key replay of the reference
    # RandomizedCollider's PRNG tree — engine.ref_replay)
    solver_mode: str = "block"
    solver_iterations: int = 4
    position_iterations: int = 3  # split-impulse passes (block mode only)
    relaxation: float = 1.0
    joint_mode: str = "gauss_seidel"
    joint_iterations: int = 1
    contact: ContactSolverConfig = DEFAULT_SOLVER
    # run the contact solve as one fused Pallas TPU kernel (batched path
    # only; requires batch % ops.pallas_solver.TILE_B == 0 and a TPU
    # backend — silently falls back otherwise)
    use_pallas_solver: bool = False
    # run the ENTIRE physics step (collide + solve + joints) as one Pallas
    # kernel — pp/cc/cb/bb/area_cb pair groups, batched path; contact
    # geometry is not exported (only per-lane activity), so envs needing
    # penetration data should keep this off
    use_pallas_fused: bool = False


@dataclasses.dataclass
class BodyDef:
    """Host-side body description (the reference's AnyBody constructor

    surface, _bodies.py:156-186)."""

    shapes: Sequence[ShapeSpec]
    mass: float = 1.0
    inertia: float = 1.0
    position: Sequence[float] = (0.0, 0.0)
    velocity: Sequence[float] = (0.0, 0.0)
    angle: float = 0.0
    angular_velocity: float = 0.0
    elasticity: float = 1.0
    friction: float = 1.0
    is_area: bool = False
    name: str = ""


class World(struct.PyTreeNode):
    """Differentiable physics world over a fixed body/shape topology."""

    parts: Parts
    params: BodyParams
    joints: Joints
    config: WorldConfig = struct.field(pytree_node=False)
    table: PairTable = struct.field(pytree_node=False)
    static_bodies: tuple = struct.field(pytree_node=False)
    names: tuple = struct.field(pytree_node=False)

    @property
    def n_bodies(self) -> int:
        return len(self.static_bodies)

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(
        bodies: Sequence[BodyDef],
        config: WorldConfig = WorldConfig(),
        joints: Optional[Joints] = None,
        collision_filter: Sequence[tuple] = (),
        part_collision_filter: Sequence[tuple] = (),
    ) -> tuple["World", BodyState]:
        specs, owner = [], []
        for i, b in enumerate(bodies):
            for s in b.shapes:
                specs.append(s)
                owner.append(i)
        parts = Parts.from_specs(specs, owner)

        static = tuple(not np.isfinite(b.mass) for b in bodies)
        areas = tuple(bool(b.is_area) for b in bodies)
        for i, b in enumerate(bodies):
            if b.angle != 0.0 and any(s.kind == 1 for s in b.shapes) and not static[i]:
                raise ValueError(
                    f"body {i}: box parts on rotating bodies are unsupported "
                    "(use a polygon part)"
                )
        table = build_pair_table(
            parts, static, areas, collision_filter,
            narrowphase=config.narrowphase,
            part_collision_filter=part_collision_filter,
        )

        params = BodyParams(
            mass=jnp.asarray([b.mass for b in bodies], jnp.float32),
            inertia=jnp.asarray([b.inertia for b in bodies], jnp.float32),
            elasticity=jnp.asarray([b.elasticity for b in bodies], jnp.float32),
            friction=jnp.asarray([b.friction for b in bodies], jnp.float32),
        )
        state = BodyState(
            pos=jnp.asarray([b.position for b in bodies], jnp.float32),
            vel=jnp.asarray([b.velocity for b in bodies], jnp.float32),
            angle=jnp.asarray([b.angle for b in bodies], jnp.float32),
            omega=jnp.asarray([b.angular_velocity for b in bodies], jnp.float32),
        )
        world = World(
            parts=parts,
            params=params,
            joints=joints if joints is not None else Joints.empty(),
            config=config,
            table=table,
            static_bodies=static,
            names=tuple(b.name for b in bodies),
        )
        return world, state

    # -- stepping -----------------------------------------------------------

    def world_parts(self, state: BodyState) -> Parts:
        return self.parts.to_world(
            state.pos, jnp.cos(state.angle), jnp.sin(state.angle)
        )

    def detect_contacts(self, state: BodyState) -> Contact:
        return collide(
            self.world_parts(state),
            self.table,
            narrowphase=self.config.narrowphase,
            broadphase=self.config.broadphase,
        )

    def step(
        self,
        state: BodyState,
        key=None,
        dt: Optional[float] = None,
        accel=None,
    ) -> tuple[BodyState, Contact]:
        """One physics step for a single (unbatched) world.

        Returns (new_state, contacts) — the contact buffer doubles as the
        step's metrics/observability payload (SURVEY §5).
        """
        cfg = self.config
        dt = cfg.dt if dt is None else dt
        grav = jnp.asarray(cfg.gravity, state.vel.dtype)
        if accel is not None:
            grav = grav + jnp.asarray(accel, state.vel.dtype)
        mov = movable_mask(self.params)

        if cfg.integrator == "symplectic":
            state = apply_acceleration(state, grav, dt, mov)
            state = integrate_explicit_euler(state, dt)
        else:  # reference order: positions first, then the gravity kick
            state = integrate_explicit_euler(state, dt)
            state = apply_acceleration(state, grav, dt, mov)

        contacts = self.detect_contacts(state)
        if cfg.solver_mode == "random_one_per_body_keyed":
            plan = build_replay_plan(
                self.parts.kind, self.parts.nverts, self.parts.body, self.n_bodies
            )
            state = resolve_reference_keyed(
                self.world_parts(state), state, self.params, plan, key, cfg.contact
            )
        elif cfg.solver_mode == "block":
            state = solve_contacts_block(
                state,
                self.params,
                contacts,
                np.asarray(self.table.body_a),
                np.asarray(self.table.body_b),
                np.asarray(self.table.partner),
                iterations=cfg.solver_iterations,
                position_iterations=cfg.position_iterations,
                dt=dt,
                config=cfg.contact,
            )
        else:
            state = resolve_contacts(
                state,
                self.params,
                contacts,
                np.asarray(self.table.body_a),
                np.asarray(self.table.body_b),
                mode=cfg.solver_mode,
                iterations=cfg.solver_iterations,
                relaxation=cfg.relaxation,
                key=key,
                config=cfg.contact,
            )
        state = apply_joints(
            state,
            self.params,
            self.joints,
            mode=cfg.joint_mode,
            iterations=cfg.joint_iterations,
        )
        return state, contacts
