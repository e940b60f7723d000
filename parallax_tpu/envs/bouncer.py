"""Bouncer: the minimal-env demonstration of the generic plane driver.

VERDICT r2 #4 acceptance case: a new env written ONLY against
``envs.plane_env.PlaneEnvMixin`` — bodies + a thrust hook + a reward hook.
It contains zero plane-space plumbing of its own: no pack/unpack, no scan,
no watchdog, no auto-reset key tree, no chunked waves — all inherited.

The env: ``n_balls`` elastic circles in a walled box; the agent thrusts
ball 0; reward is staying close to the arena center while moving.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.dynamics.bodies import BodyState
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.envs.base import BatchedEnvironmentMixin, Environment, TimeStep
from parallax_tpu.envs.plane_env import PlaneEnvMixin, init_planes_of
from parallax_tpu.geometry.math import safe_norm
from parallax_tpu.geometry.shapes import box, circle

HALF = 2.0  # arena half-extent
WALL = 0.3
BALL_R = 0.18


@dataclasses.dataclass(frozen=True)
class BouncerConfig:
    n_balls: int = 6
    dt: float = 0.02
    max_steps: int = 1000
    accel: float = 6.0
    elasticity: float = 0.9
    friction: float = 0.2
    control_cost: float = 0.01


class BouncerState(struct.PyTreeNode):
    bodies: BodyState
    t: jnp.ndarray
    key: jnp.ndarray


class Bouncer(PlaneEnvMixin, BatchedEnvironmentMixin, Environment):
    def __init__(self, config: BouncerConfig = BouncerConfig()):
        self.config = config
        n = config.n_balls
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        balls = [
            BodyDef(
                shapes=[circle(BALL_R)],
                mass=1.0,
                inertia=0.1,
                position=(np.cos(a) * HALF * 0.5, np.sin(a) * HALF * 0.5),
                velocity=(-np.sin(a) * 0.5, np.cos(a) * 0.5),
                elasticity=config.elasticity,
                friction=config.friction,
                name=f"ball{i}",
            )
            for i, a in enumerate(ang)
        ]
        h, w = HALF, WALL
        walls = [
            BodyDef(shapes=[box(lo, hi)], mass=np.inf, inertia=np.inf,
                    elasticity=config.elasticity, name=nm)
            for nm, (lo, hi) in {
                "wall_b": ((-h - w, -h - w), (h + w, -h)),
                "wall_t": ((-h - w, h), (h + w, h + w)),
                "wall_l": ((-h - w, -h), (-h, h)),
                "wall_r": ((h, -h), (h + w, h)),
            }.items()
        ]
        # use_pallas_solver: same one-line opt-in as lander/robocup/
        # billiards — the kernel is world-generic, and the acceptance env
        # inherits it like everything else (measured on v5e: the default
        # XLA solve was 357 µs/step of the 409 µs bouncer step; roofline
        # --env bouncer caught it running without the kernel)
        wc = WorldConfig(dt=config.dt, gravity=(0.0, 0.0),
                         integrator="symplectic", use_pallas_solver=True)
        self.world, self._init_bodies = World.build(balls + walls, wc)
        self._init_planes = init_planes_of(self._init_bodies)

    @property
    def action_size(self) -> int:
        return 2

    @property
    def observation_size(self) -> int:
        return 6 * len(self._init_bodies.angle)

    # -- vmapped public API -------------------------------------------------

    def reset_fn(self, key) -> BouncerState:
        return BouncerState(
            bodies=self._init_bodies, t=jnp.zeros((), jnp.int32), key=key
        )

    def observe(self, state: BouncerState) -> jnp.ndarray:
        b = state.bodies
        return jnp.concatenate(
            [b.pos.T.reshape(-1), b.vel.T.reshape(-1), b.angle, b.omega]
        )

    def step_fn(self, state: BouncerState, action):
        cfg = self.config
        a = jnp.clip(jnp.asarray(action, jnp.float32).reshape(2), -1.0, 1.0)
        b = state.bodies.replace(
            vel=state.bodies.vel.at[0].add(a * cfg.accel * cfg.dt)
        )
        b, _ = self.world.step(b)
        new_state = state.replace(bodies=b, t=state.t + 1)
        d = safe_norm(b.pos[0])
        reward = -d * cfg.dt - cfg.control_cost * jnp.sum(a * a)
        terminated = jnp.zeros((), bool)
        truncated = new_state.t >= cfg.max_steps
        return new_state, TimeStep(
            obs=self.observe(new_state),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={},
        )

    # -- generic plane driver hooks: thrust + reward, nothing else ----------

    def plane_make_state(self, bodies, aux, t, key):
        return BouncerState(bodies=bodies, t=t, key=key)

    def plane_pre(self, s, aux, actions):
        cfg = self.config
        a = jnp.clip(jnp.asarray(actions, jnp.float32).reshape(-1, 2), -1.0, 1.0)
        return s._replace(
            vx=s.vx.at[0].add(a[:, 0] * cfg.accel * cfg.dt),
            vy=s.vy.at[0].add(a[:, 1] * cfg.accel * cfg.dt),
        )

    def plane_post(self, s, aux, con, actions, t_new):
        cfg = self.config
        a = jnp.clip(jnp.asarray(actions, jnp.float32).reshape(-1, 2), -1.0, 1.0)
        d = safe_norm(jnp.stack([s.px[0], s.py[0]], axis=-1))
        reward = -d * cfg.dt - cfg.control_cost * jnp.sum(a * a, axis=-1)
        terminated = jnp.zeros(t_new.shape, bool)
        return s, aux, reward, terminated, {}
