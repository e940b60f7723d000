"""RoboCup SSL field environment.

Field / goal / ball geometry replicates the reference constant-for-constant
(/root/reference/cotix/_robocup.py:14-122): 10.4x7.4 field, 9x6 play area,
0.2x1 goals built from three 0.01-thick boxes, ball = circle of radius
0.022*3, mass 0.5, restitution 1.0, spawned with velocity (1.0, 0.01) and
spin 10.

The reference ships no robots, no controls and no rewards despite the name
(SURVEY §2.3); parallax adds them:

* N robots per team (SSL-style 0.09 m-radius circular bodies) driven by
  per-robot velocity commands (vx, vy, omega) with acceleration limits —
  the standard SSL control abstraction;
* goal detection with +/-1 reward (blue attacks the yellow goal at -x),
  plus a small ball-progress shaping term;
* termination on goals, truncation on the step limit, in-graph auto-reset.

The field body is an *area* (``is_area=True``): instead of colliding like a
solid, it generates containment contacts that keep ball and robots inside —
the reference's documented intent for area bodies (_robocup.py:88-98).
The play-area body exists for out-of-bounds bookkeeping only and is
excluded from collision entirely (as in the reference, where nothing ever
used it).
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
from parallax_tpu.envs.plane_env import PlaneEnvMixin
from parallax_tpu.geometry.shapes import box, circle

FIELD_DIM = (10.4, 7.4)
PLAY_AREA = (9.0, 6.0)
GOAL_DIM = (0.2, 1.0)
GOAL_WALL = 0.01
BALL_RADIUS = 0.022 * 3


def _goal_boxes(side: int):
    """Three thin boxes forming one goal (reference _robocup.py:36-60).

    side=-1: yellow goal at -x; side=+1: blue goal at +x (y-mirror)."""
    lo = np.array([-PLAY_AREA[0] / 2 - GOAL_DIM[0], -GOAL_DIM[1] / 2])
    hi = np.array([-PLAY_AREA[0] / 2, GOAL_DIM[1] / 2])
    walls = [
        (lo, lo + np.array([GOAL_WALL, GOAL_DIM[1]])),  # back wall
        (lo + np.array([GOAL_WALL, 0.0]), lo + np.array([GOAL_DIM[0], GOAL_WALL])),
        (hi - np.array([GOAL_DIM[0], GOAL_WALL]), hi),  # top wall
    ]
    if side > 0:
        walls = [((-u[0], l[1]), (-l[0], u[1])) for (l, u) in walls]
    return [box(l, u) for (l, u) in walls]


@dataclasses.dataclass(frozen=True)
class RoboCupConfig:
    n_robots_per_team: int = 3
    dt: float = 0.01
    max_steps: int = 2000
    robot_radius: float = 0.09
    robot_mass: float = 2.5
    robot_inertia: float = 0.02
    robot_max_speed: float = 3.0
    robot_max_accel: float = 4.0
    robot_max_omega: float = 10.0
    ball_damping: float = 0.995  # rolling friction per step
    goal_reward: float = 1.0
    shaping_coef: float = 0.01
    solver_mode: str = "block"
    # circle-dominated contact graphs converge fast; (3, 2) matches (4, 3)
    # on ball/robot trajectories
    solver_iterations: int = 3
    position_iterations: int = 2
    randomize_ball: bool = True
    # reference-parity knobs (same surface as LanderConfig):
    # narrowphase="gjk_epa" + solver_mode="random_one_per_body" +
    # contact=ContactSolverConfig.reference() + broadphase=False runs
    # RoboCup through the exact reference pipeline (vmapped path only).
    # Pinned bitwise by tests/test_golden_parity.py config 5.
    narrowphase: str = "sat"
    broadphase: bool = True
    contact: object = None  # Optional[ContactSolverConfig]; None = default
    # run the whole physics step as one fused Pallas kernel (cc/cb/area_cb
    # pair groups — supported since round 3); requires batch % TILE_B == 0
    use_pallas_fused: bool = False


class RoboCupState(struct.PyTreeNode):
    bodies: BodyState
    t: jnp.ndarray
    key: jnp.ndarray


class RoboCup(PlaneEnvMixin, BatchedEnvironmentMixin, Environment):
    """Multi-agent SSL env; blue team (robots 0..N-1) attacks the yellow

    goal at -x, yellow team (robots N..2N-1) attacks +x.  Reward is from
    the blue team's perspective."""

    def __init__(self, config: RoboCupConfig = RoboCupConfig()):
        self.config = config
        N = config.n_robots_per_team

        field = BodyDef(
            shapes=[box(-np.array(FIELD_DIM) / 2, np.array(FIELD_DIM) / 2)],
            mass=np.inf, inertia=np.inf, is_area=True, name="field",
        )
        play_area = BodyDef(
            shapes=[box(-np.array(PLAY_AREA) / 2, np.array(PLAY_AREA) / 2)],
            mass=np.inf, inertia=np.inf, is_area=True, name="play_area",
        )
        yellow_goal = BodyDef(
            shapes=_goal_boxes(-1), mass=np.inf, inertia=np.inf,
            elasticity=0.5, name="yellow_goal",
        )
        blue_goal = BodyDef(
            shapes=_goal_boxes(+1), mass=np.inf, inertia=np.inf,
            elasticity=0.5, name="blue_goal",
        )
        ball = BodyDef(
            shapes=[circle(BALL_RADIUS)], mass=0.5, inertia=1.0,
            velocity=(1.0, 0.01), angular_velocity=10.0, elasticity=1.0,
            friction=0.2, name="ball",
        )

        robots = []
        for team, sign in (("blue", +1), ("yellow", -1)):
            for i in range(N):
                y = (i - (N - 1) / 2) * 1.5
                robots.append(
                    BodyDef(
                        shapes=[circle(config.robot_radius)],
                        mass=config.robot_mass,
                        inertia=config.robot_inertia,
                        position=(sign * (1.0 + i * 0.8), y),
                        elasticity=0.3,
                        friction=0.5,
                        name=f"{team}_{i}",
                    )
                )

        bodies = [field, play_area, yellow_goal, blue_goal, ball] + robots
        self.ball_idx = 4
        self.robot_idx = np.arange(5, 5 + 2 * N)
        n_bodies = len(bodies)
        # play_area never collides with anything
        filt = [(1, j) for j in range(n_bodies) if j != 1]

        wc = WorldConfig(
            dt=config.dt,
            gravity=(0.0, 0.0),
            integrator="reference",
            narrowphase=config.narrowphase,
            broadphase=config.broadphase,
            **({} if config.contact is None else {"contact": config.contact}),
            solver_mode=config.solver_mode,
            solver_iterations=config.solver_iterations,
            position_iterations=config.position_iterations,
            # solver kernel stays on alongside fused: if the fused step
            # silently falls back (batch % TILE_B != 0, non-TPU backend),
            # the split path still gets the Pallas solver instead of the
            # pure-XLA one
            use_pallas_solver=True,
            use_pallas_fused=config.use_pallas_fused,
        )
        self.world, self._init_bodies = World.build(bodies, wc, collision_filter=filt)

        from parallax_tpu.envs.plane_env import init_planes_of

        self._init_planes = init_planes_of(self._init_bodies)

    # ------------------------------------------------------------------

    @property
    def n_robots(self) -> int:
        return 2 * self.config.n_robots_per_team

    @property
    def action_size(self) -> int:
        return self.n_robots * 3

    @property
    def observation_size(self) -> int:
        return 4 + self.n_robots * 4

    def reset_fn(self, key) -> RoboCupState:
        bkey, skey = jax.random.split(key)
        b = self._init_bodies
        if self.config.randomize_ball:
            ang = jax.random.uniform(bkey, (), minval=0.0, maxval=2 * jnp.pi)
            speed = 1.0
            v = jnp.stack([jnp.cos(ang), jnp.sin(ang)]) * speed
            b = b.replace(vel=b.vel.at[self.ball_idx].set(v))
        return RoboCupState(bodies=b, t=jnp.zeros((), jnp.int32), key=skey)

    def observe(self, state: RoboCupState) -> jnp.ndarray:
        b = state.bodies
        ri = self.robot_idx
        return jnp.concatenate(
            [
                b.pos[self.ball_idx],
                b.vel[self.ball_idx],
                b.pos[ri].reshape(-1),
                b.vel[ri].reshape(-1),
            ]
        )

    def step_fn(self, state: RoboCupState, action):
        cfg = self.config
        action = jnp.asarray(action, jnp.float32).reshape(self.n_robots, 3)
        v_cmd = jnp.clip(action[:, :2], -cfg.robot_max_speed, cfg.robot_max_speed)
        w_cmd = jnp.clip(action[:, 2], -cfg.robot_max_omega, cfg.robot_max_omega)

        b = state.bodies
        ri = self.robot_idx
        # velocity tracking with acceleration limit
        dv = jnp.clip(
            v_cmd - b.vel[ri],
            -cfg.robot_max_accel * cfg.dt,
            cfg.robot_max_accel * cfg.dt,
        )
        b = b.replace(
            vel=b.vel.at[ri].add(dv),
            omega=b.omega.at[ri].set(w_cmd),
        )

        # the randomized reference solver draws its lane choice from the
        # episode stream (same fold_in pattern as the lander's step_fn)
        solver_key = (
            jax.random.fold_in(state.key, 0x50CC)
            if self.world.config.solver_mode.startswith("random_one_per_body")
            else None
        )
        b, contacts = self.world.step(b, key=solver_key)
        # ball rolling friction
        b = b.replace(vel=b.vel.at[self.ball_idx].multiply(cfg.ball_damping))

        new_state = state.replace(bodies=b, t=state.t + 1)

        bx, by = b.pos[self.ball_idx, 0], b.pos[self.ball_idx, 1]
        line = PLAY_AREA[0] / 2
        in_mouth = jnp.abs(by) < GOAL_DIM[1] / 2
        blue_scored = (bx < -(line + BALL_RADIUS)) & in_mouth  # into yellow goal
        yellow_scored = (bx > (line + BALL_RADIUS)) & in_mouth

        # shaping: ball progress toward the yellow goal (blue's objective)
        shaping = -cfg.shaping_coef * bx

        reward = (
            jnp.where(blue_scored, cfg.goal_reward, 0.0)
            - jnp.where(yellow_scored, cfg.goal_reward, 0.0)
            + shaping * cfg.dt
        )
        terminated = blue_scored | yellow_scored
        truncated = (new_state.t >= cfg.max_steps) & ~terminated

        ts = TimeStep(
            obs=self.observe(new_state),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={
                "blue_scored": blue_scored,
                "yellow_scored": yellow_scored,
                "ball_speed": jnp.linalg.norm(b.vel[self.ball_idx]),
            },
        )
        return new_state, ts




# ---------------------------------------------------------------------------
# Plane-space fast path: hooks for the generic driver (envs/plane_env.py)
# ---------------------------------------------------------------------------

def _rc_plane_make_state(self, bodies, aux, t, key):
    return RoboCupState(bodies=bodies, t=t, key=key)


def _rc_plane_pre(self, s, aux, actions):
    cfg = self.config
    ri = np.asarray(self.robot_idx)
    actions = jnp.asarray(actions, jnp.float32).reshape(-1, self.n_robots, 3)
    vx_cmd = jnp.clip(actions[..., 0], -cfg.robot_max_speed, cfg.robot_max_speed).T
    vy_cmd = jnp.clip(actions[..., 1], -cfg.robot_max_speed, cfg.robot_max_speed).T
    w_cmd = jnp.clip(actions[..., 2], -cfg.robot_max_omega, cfg.robot_max_omega).T
    lim = cfg.robot_max_accel * cfg.dt
    dvx = jnp.clip(vx_cmd - s.vx[ri], -lim, lim)
    dvy = jnp.clip(vy_cmd - s.vy[ri], -lim, lim)
    return s._replace(
        vx=s.vx.at[ri].add(dvx),
        vy=s.vy.at[ri].add(dvy),
        omega=s.omega.at[ri].set(w_cmd),
    )


def _rc_plane_post(self, s, aux, con, actions, t_new):
    cfg = self.config
    bi = self.ball_idx
    s = s._replace(
        vx=s.vx.at[bi].multiply(cfg.ball_damping),
        vy=s.vy.at[bi].multiply(cfg.ball_damping),
    )
    bx, by = s.px[bi], s.py[bi]
    line = PLAY_AREA[0] / 2
    in_mouth = jnp.abs(by) < GOAL_DIM[1] / 2
    blue_scored = (bx < -(line + BALL_RADIUS)) & in_mouth
    yellow_scored = (bx > (line + BALL_RADIUS)) & in_mouth
    reward = (
        jnp.where(blue_scored, cfg.goal_reward, 0.0)
        - jnp.where(yellow_scored, cfg.goal_reward, 0.0)
        + (-cfg.shaping_coef * bx) * cfg.dt
    )
    terminated = blue_scored | yellow_scored
    info = {
        "blue_scored": blue_scored,
        "yellow_scored": yellow_scored,
        "ball_speed": jnp.sqrt(s.vx[bi] ** 2 + s.vy[bi] ** 2),
    }
    return s, aux, reward, terminated, info


def _rc_plane_obs(self, s, aux):
    bi = self.ball_idx
    ri = np.asarray(self.robot_idx)
    R = len(ri)
    B = s.px.shape[-1]
    # interleaved [r0x, r0y, r1x, r1y, ...] like bodies.pos[:, ri].reshape(B, -1)
    pos_flat = jnp.stack([s.px[ri], s.py[ri]], axis=1).reshape(2 * R, B).T
    vel_flat = jnp.stack([s.vx[ri], s.vy[ri]], axis=1).reshape(2 * R, B).T
    return jnp.concatenate(
        [
            jnp.stack([s.px[bi], s.py[bi], s.vx[bi], s.vy[bi]], axis=-1),
            pos_flat,
            vel_flat,
        ],
        axis=-1,
    )


def _rc_plane_fresh(self, rkeys):
    cfg = self.config
    bi = self.ball_idx
    B = rkeys.shape[0]
    bkeys = jax.vmap(jax.random.split)(rkeys)[:, 0]
    init = self._init_planes
    if cfg.randomize_ball:
        ang = jax.vmap(
            lambda k: jax.random.uniform(k, (), minval=0.0, maxval=2 * jnp.pi)
        )(bkeys)
        bvx, bvy = jnp.cos(ang), jnp.sin(ang)
    else:
        bvx = jnp.full((B,), float(self._init_bodies.vel[bi, 0]))
        bvy = jnp.full((B,), float(self._init_bodies.vel[bi, 1]))
    fvx = jnp.broadcast_to(init.vx, (init.vx.shape[0], B)).at[bi].set(bvx)
    fvy = jnp.broadcast_to(init.vy, (init.vy.shape[0], B)).at[bi].set(bvy)
    return init._replace(vx=fvx, vy=fvy), ()


RoboCup.plane_make_state = _rc_plane_make_state
RoboCup.plane_pre = _rc_plane_pre
RoboCup.plane_post = _rc_plane_post
RoboCup.plane_obs = _rc_plane_obs
RoboCup.plane_fresh = _rc_plane_fresh


# ---------------------------------------------------------------------------
# Continuous-time evaluation (reference AbstractEnvironment.eval semantics,
# /root/reference/cotix/_envs.py:37-132) on RoboCup: velocity-tracking robot
# control as the dense control signal, ball-progress integral reward, goal
# detection as the terminal condition.  Mirrors the LunarLander section in
# envs/lunar_lander.py — together they make the Judge/Control layer
# env-agnostic in practice (the reference shipped no concrete subclass).
# ---------------------------------------------------------------------------

from parallax_tpu.envs.base import Judge as _Judge  # noqa: E402


class RoboCupJudge(_Judge):
    """R = ∫ shaping_coef * (-ball_x) dt ± goal_reward at a goal."""

    def __init__(self, env: "RoboCup"):
        self.env = env

    def _goals(self, bodies):
        cfg = self.env.config
        bx = bodies.pos[self.env.ball_idx, 0]
        by = bodies.pos[self.env.ball_idx, 1]
        line = PLAY_AREA[0] / 2
        in_mouth = jnp.abs(by) < GOAL_DIM[1] / 2
        blue = (bx < -(line + BALL_RADIUS)) & in_mouth
        yellow = (bx > (line + BALL_RADIUS)) & in_mouth
        return blue, yellow

    def reward(self, state, control_signal):
        return -self.env.config.shaping_coef * state.pos[self.env.ball_idx, 0]

    def is_done(self, state, control_signal):
        blue, yellow = self._goals(state)
        return blue | yellow

    def end_reward(self, state, control_signal):
        blue, yellow = self._goals(state)
        g = self.env.config.goal_reward
        return jnp.where(blue, g, 0.0) - jnp.where(yellow, g, 0.0)


def make_world_forward(env: "RoboCup"):
    """``forward(bodies, signal, dt) -> bodies`` — robot velocity tracking +
    physics + ball rolling friction, dt-parametric for the NFE/WFE loop."""
    cfg = env.config
    ri = env.robot_idx

    def forward(bodies, signal, dt):
        a = jnp.asarray(signal, jnp.float32).reshape(env.n_robots, 3)
        v_cmd = jnp.clip(a[:, :2], -cfg.robot_max_speed, cfg.robot_max_speed)
        w_cmd = jnp.clip(a[:, 2], -cfg.robot_max_omega, cfg.robot_max_omega)
        dv = jnp.clip(
            v_cmd - bodies.vel[ri],
            -cfg.robot_max_accel * dt,
            cfg.robot_max_accel * dt,
        )
        bodies = bodies.replace(
            vel=bodies.vel.at[ri].add(dv), omega=bodies.omega.at[ri].set(w_cmd)
        )
        bodies, _ = env.world.step(bodies, dt=dt)
        # per-step damping scaled to the reference cadence (dt_ref = cfg.dt)
        damp = cfg.ball_damping ** (dt / cfg.dt)
        return bodies.replace(vel=bodies.vel.at[env.ball_idx].multiply(damp))

    return forward
