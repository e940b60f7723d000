"""Billiards: a third environment family built on the same engine API.

No counterpart in the reference (which ships LunarLander + a RoboCup field,
_lunar_lander.py / _robocup.py) — this env demonstrates building a new
environment from the public pieces: `World.build` + the
`Environment`/`BatchedEnvironmentMixin` contract, the batch-minor
`step_batched` fast path with pre/post hooks, and in-graph auto-reset.

Physics: a zero-gravity 2 x 1 table with 4 static cushion walls, one cue
ball and ``n_object`` object balls (all circles — exercises the
circle-circle and circle-box kernels at scale).  Rolling friction is a
per-step velocity damping applied in the ``post`` hook.  Corner pockets:
a ball whose center comes within ``pocket_r`` of a corner is *potted* —
teleported to a parking row far above the table with zero velocity (fixed
shapes: bodies are never removed, just parked out of interaction range).

RL surface: action [2] = bounded acceleration steering the cue ball;
reward +1 per newly potted object ball, -1 for potting the cue
(terminates), small living cost; episode ends when all object balls are
potted (+2 bonus) or the cue is lost.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.dynamics.bodies import BodyState
from parallax_tpu.engine.batched import step_batched
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.envs.base import BatchedEnvironmentMixin, Environment, TimeStep
from parallax_tpu.envs.plane_env import PlaneEnvMixin
from parallax_tpu.geometry.shapes import box, circle

# table half-extents and ball size (meters-ish; pool-table 2:1 aspect)
HALF_W, HALF_H = 1.0, 0.5
BALL_R = 0.04
WALL_T = 0.1
POCKET_R = 0.09
PARK_Y = 10.0  # parking row for potted balls, far outside interaction range

_CORNERS = np.asarray(
    [[-HALF_W, -HALF_H], [HALF_W, -HALF_H], [-HALF_W, HALF_H], [HALF_W, HALF_H]],
    np.float32,
)


@dataclasses.dataclass(frozen=True)
class BilliardsConfig:
    n_object: int = 7
    dt: float = 0.01
    damping: float = 0.99  # per-step rolling-friction velocity decay
    accel: float = 3.0  # max cue acceleration per axis
    elasticity: float = 0.92
    wall_elasticity: float = 0.85
    friction: float = 0.1
    max_steps: int = 1000
    pot_reward: float = 1.0
    clear_bonus: float = 2.0
    cue_penalty: float = 1.0
    living_cost: float = 0.001
    solver_iterations: int = 4
    position_iterations: int = 2
    # run the whole physics step as one fused Pallas kernel (cc/cb pair
    # groups — supported since round 3); requires batch % TILE_B == 0
    use_pallas_fused: bool = False
    # offset-rolled all-pairs physics (engine/rolled.py): replaces the
    # [C, n] one-hot lane machinery with static rolls.  Measured NEGATIVE
    # on v5e (DESIGN §4b round-5 closure: 0.53M vs 1.11M at billiards48 —
    # permutation gathers ARE one-hot matmuls on TPU); kept as an
    # independent, value-equivalent cross-check of the solver math
    # (tests/test_rolled.py).
    rolled: bool = False


class BilliardsState(struct.PyTreeNode):
    bodies: BodyState
    potted: jnp.ndarray  # [1 + n_object] bool (index 0 = cue)
    t: jnp.ndarray  # i32
    key: jnp.ndarray


def _rack_positions(n_object: int) -> np.ndarray:
    """Cue on the left, object balls racked in a triangle on the right.

    The rack self-fits to the table: rows are capped at the count that fits
    the table height (triangle becomes a trapezoid for large n), and the
    apex slides left so the back row clears the right cushion.  Small racks
    (n<=15) keep the classic apex at x=0.45.
    """
    # 2.2r spacing: nearest-neighbour distance is ~1.003*gap = 0.088, which
    # leaves 0.008 of clearance over the 0.08 contact distance — enough that
    # the +/-0.002 per-ball reset jitter (worst-case approach 2*0.002*sqrt(2)
    # ~= 0.0057) can never start two balls interpenetrating.
    gap = 2.2 * BALL_R
    margin = 0.01
    # row height budget reserves gap/2 for the anti-align stagger below
    max_per_row = int((2.0 * (HALF_H - BALL_R - margin) - gap) // gap) + 1
    # simulate row fill to learn the row count, then place
    counts = []
    placed = 0
    while placed < n_object:
        c = min(len(counts) + 1, max_per_row, n_object - placed)
        counts.append(c)
        placed += c
    x_apex = min(0.45, HALF_W - BALL_R - margin - (len(counts) - 1) * gap * 0.87)
    if x_apex <= BALL_R - 0.5:  # rack would reach the cue / left half
        raise ValueError(
            f"{n_object} object balls cannot be racked on the "
            f"{2 * HALF_W}x{2 * HALF_H} table"
        )
    pos = [(-0.5, 0.0)]
    for row, c in enumerate(counts):
        x = x_apex + row * gap * 0.87
        # stagger: adjacent rows' y-grids must sit gap/2 apart, else two
        # same-count rows (the capped trapezoid region) align vertically and
        # land only 0.87*gap apart.  A row's natural grid offset is 0 for
        # odd counts, gap/2 for even; shift to alternate 0, gap/2, 0, ...
        natural = 0.0 if c % 2 else 0.5
        shift = (((row % 2) * 0.5 - natural) % 1.0) * gap
        for i in range(c):
            pos.append((x, (i - (c - 1) / 2.0) * gap + shift))
    return np.asarray(pos, np.float32)


class Billiards(PlaneEnvMixin, Environment, BatchedEnvironmentMixin):
    def __init__(self, config: BilliardsConfig = BilliardsConfig()):
        self.config = config
        n = 1 + config.n_object
        rack = _rack_positions(config.n_object)

        balls = [
            BodyDef(
                shapes=[circle(BALL_R)],
                mass=1.0,
                inertia=2.0 / 5.0 * BALL_R**2,
                position=tuple(rack[i]),
                elasticity=config.elasticity,
                friction=config.friction,
                name="cue" if i == 0 else f"ball{i}",
            )
            for i in range(n)
        ]
        w, h, t = HALF_W, HALF_H, WALL_T
        walls = [
            BodyDef(shapes=[box((-w - t, -h - t), (w + t, -h))], mass=np.inf,
                    inertia=np.inf, elasticity=config.wall_elasticity,
                    friction=config.friction, name="wall_b"),
            BodyDef(shapes=[box((-w - t, h), (w + t, h + t))], mass=np.inf,
                    inertia=np.inf, elasticity=config.wall_elasticity,
                    friction=config.friction, name="wall_t"),
            BodyDef(shapes=[box((-w - t, -h), (-w, h))], mass=np.inf,
                    inertia=np.inf, elasticity=config.wall_elasticity,
                    friction=config.friction, name="wall_l"),
            BodyDef(shapes=[box((w, -h), (w + t, h))], mass=np.inf,
                    inertia=np.inf, elasticity=config.wall_elasticity,
                    friction=config.friction, name="wall_r"),
        ]
        wc = WorldConfig(
            dt=config.dt,
            gravity=(0.0, 0.0),
            integrator="symplectic",
            solver_iterations=config.solver_iterations,
            position_iterations=config.position_iterations,
            # keep the solver kernel on even when fused is requested: if the
            # fused step silently falls back (batch % TILE_B != 0, non-TPU
            # backend), the split path then still runs the Pallas solver
            # instead of degrading to the pure-XLA one (7.5x slower on
            # billiards48)
            use_pallas_solver=True,
            use_pallas_fused=config.use_pallas_fused,
        )
        self.world, self._init_bodies = World.build(balls + walls, wc)
        self.n_balls = n
        if config.rolled:
            from parallax_tpu.engine.rolled import RolledCircleWorld

            self._rolled_world = RolledCircleWorld(
                n_balls=n,
                radius=BALL_R,
                inv_mass=1.0,
                inv_inertia=1.0 / (2.0 / 5.0 * BALL_R**2),
                e_ball=config.elasticity,
                mu_ball=config.friction,
                walls_lb=((-w - t, -h - t), (-w - t, h), (-w - t, -h), (w, -h)),
                walls_ub=((w + t, -h), (w + t, h + t), (-w, h), (w + t, h)),
                e_wall=config.wall_elasticity,
                mu_wall=config.friction,
                dt=config.dt,
                gravity=(0.0, 0.0),
                integrator="symplectic",
                iterations=config.solver_iterations,
                position_iterations=config.position_iterations,
                contact=wc.contact,
            )
        # [n_bodies, 1] init planes for the plane-space auto-reset
        ib = self._init_bodies
        self._init_planes_np = tuple(
            np.asarray(x)[:, None]
            for x in (ib.pos[:, 0], ib.pos[:, 1], ib.vel[:, 0], ib.vel[:, 1],
                      ib.angle, ib.omega)
        )
        # per-ball parking slots (row above the table, spaced > 2r apart)
        self._park = np.stack(
            [np.linspace(-n, n, n, dtype=np.float32),
             np.full(n, PARK_Y, np.float32)], -1
        )

    # -- spaces ---------------------------------------------------------

    @property
    def action_size(self) -> int:
        return 2

    @property
    def observation_size(self) -> int:
        # per ball: pos(2) + vel(2) + potted(1)
        return self.n_balls * 5

    # -- core ------------------------------------------------------------

    def reset_fn(self, key) -> BilliardsState:
        jkey, skey = jax.random.split(key)
        n = self.n_balls
        jitter = jax.random.uniform(jkey, (n, 2), minval=-0.002, maxval=0.002)
        b = self._init_bodies
        b = b.replace(pos=b.pos.at[:n].add(jitter))
        return BilliardsState(
            bodies=b,
            potted=jnp.zeros((n,), bool),
            t=jnp.zeros((), jnp.int32),
            key=skey,
        )

    def observe(self, state: BilliardsState) -> jnp.ndarray:
        n = self.n_balls
        b = state.bodies
        per_ball = jnp.concatenate(
            [b.pos[:n], b.vel[:n], state.potted[:, None].astype(b.pos.dtype)], -1
        )
        return per_ball.reshape(-1)

    def _pot_hits(self, pos_balls):
        """[n] bool — ball center within POCKET_R of any corner."""
        d2 = jnp.sum(
            (pos_balls[:, None, :] - jnp.asarray(_CORNERS)[None, :, :]) ** 2, -1
        )
        return jnp.any(d2 <= POCKET_R**2, axis=-1)

    def step_fn(self, state: BilliardsState, action):
        cfg = self.config
        n = self.n_balls
        a = jnp.clip(jnp.asarray(action, jnp.float32).reshape(2), -1.0, 1.0)
        b = state.bodies

        # cue acceleration (only while the cue is live)
        live_cue = ~state.potted[0]
        kick = a * cfg.accel * cfg.dt * live_cue
        b = b.replace(vel=b.vel.at[0].add(kick))

        b, _ = self.world.step(b)
        # rolling friction + park-freeze potted balls
        damp = jnp.where(state.potted[:, None], 0.0, cfg.damping)
        pad = jnp.ones((b.vel.shape[0] - n, 1))
        b = b.replace(vel=b.vel * jnp.concatenate([damp, pad], 0))

        new_pot = self._pot_hits(b.pos[:n]) & ~state.potted
        potted = state.potted | new_pot
        # teleport newly potted balls to their parking slots
        park = jnp.asarray(self._park)
        pos_balls = jnp.where(new_pot[:, None], park, b.pos[:n])
        vel_balls = jnp.where(new_pot[:, None], 0.0, b.vel[:n])
        b = b.replace(
            pos=b.pos.at[:n].set(pos_balls), vel=b.vel.at[:n].set(vel_balls)
        )

        cue_lost = potted[0]
        cleared = jnp.all(potted[1:])
        reward = (
            cfg.pot_reward * jnp.sum(new_pot[1:])
            - cfg.cue_penalty * new_pot[0]
            + jnp.where(cleared & jnp.any(new_pot[1:]), cfg.clear_bonus, 0.0)
            - cfg.living_cost
        )
        new_state = state.replace(bodies=b, potted=potted, t=state.t + 1)
        terminated = cue_lost | cleared
        truncated = (new_state.t >= cfg.max_steps) & ~terminated
        ts = TimeStep(
            obs=self.observe(new_state),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={"potted": potted, "cue_lost": cue_lost, "cleared": cleared},
        )
        return new_state, ts

    # batch-minor fast path: step_fn_batch / rollout_batch come from
    # PlaneEnvMixin via the plane hooks below


# ---------------------------------------------------------------------------
# Plane-space fast path: hooks for the generic driver (envs/plane_env.py).
# aux = potted [n_balls, B] f32 0/1 planes.
# ---------------------------------------------------------------------------

from parallax_tpu.engine.batched import _SoA  # noqa: E402  (fresh planes)


def _bl_plane_pack(self, states: BilliardsState):
    return jnp.swapaxes(states.potted, 0, 1).astype(jnp.float32)


def _bl_plane_make_state(self, bodies, aux, t, key):
    return BilliardsState(
        bodies=bodies, potted=jnp.swapaxes(aux, 0, 1) > 0.5, t=t, key=key
    )


def _bl_plane_physics(self, s, potted):
    if self.config.rolled:
        from parallax_tpu.engine.rolled import physics_rolled

        return physics_rolled(self._rolled_world, s)
    from parallax_tpu.engine.batched import physics_core

    return physics_core(self.world, s)


def _bl_plane_pre(self, s, potted, actions):
    cfg = self.config
    B = s.px.shape[-1]
    a = jnp.clip(jnp.asarray(actions, jnp.float32).reshape(B, 2), -1.0, 1.0)
    live_cue = 1.0 - potted[0]
    return s._replace(
        vx=s.vx.at[0].add(a[:, 0] * cfg.accel * cfg.dt * live_cue),
        vy=s.vy.at[0].add(a[:, 1] * cfg.accel * cfg.dt * live_cue),
    )


def _bl_plane_post(self, s, potted, con, actions, t_new):
    cfg = self.config
    n = self.n_balls
    damp = jnp.where(potted > 0.5, 0.0, cfg.damping)  # [n, B]
    s = s._replace(vx=s.vx.at[:n].mul(damp), vy=s.vy.at[:n].mul(damp))

    # pot detection on [n, B] planes
    cx = jnp.asarray(_CORNERS[:, 0])[None, :, None]  # [1, 4, 1]
    cy = jnp.asarray(_CORNERS[:, 1])[None, :, None]
    d2 = (s.px[:n, None, :] - cx) ** 2 + (s.py[:n, None, :] - cy) ** 2
    hit = jnp.min(d2, axis=1) <= POCKET_R**2  # [n, B]
    new_pot = hit & (potted < 0.5)
    potted = jnp.where(new_pot, 1.0, potted)
    park = jnp.asarray(self._park)  # [n, 2]
    s = s._replace(
        px=s.px.at[:n].set(jnp.where(new_pot, park[:, 0:1], s.px[:n])),
        py=s.py.at[:n].set(jnp.where(new_pot, park[:, 1:2], s.py[:n])),
        vx=s.vx.at[:n].set(jnp.where(new_pot, 0.0, s.vx[:n])),
        vy=s.vy.at[:n].set(jnp.where(new_pot, 0.0, s.vy[:n])),
    )

    cue_lost = potted[0] > 0.5
    cleared = jnp.all(potted[1:] > 0.5, axis=0)
    reward = (
        cfg.pot_reward * jnp.sum(new_pot[1:], axis=0)
        - cfg.cue_penalty * new_pot[0]
        + jnp.where(cleared & jnp.any(new_pot[1:], axis=0), cfg.clear_bonus, 0.0)
        - cfg.living_cost
    )
    terminated = cue_lost | cleared
    # no per-ball "potted" here: a [B, n] bool per scanned TimeStep would
    # materialize [T, B, n] (~190 MB/wave at billiards48 B=8192 T=500) in
    # any caller that keeps the trajectory; potted is already in obs and
    # in the carried state
    info = {
        "cue_lost": cue_lost,
        "cleared": cleared,
    }
    return s, potted, reward, terminated, info


def _bl_plane_obs(self, s, potted):
    n = self.n_balls
    rows = []
    for i in range(n):
        rows.extend([s.px[i], s.py[i], s.vx[i], s.vy[i], potted[i]])
    return jnp.stack(rows, axis=-1)  # [B, 5n]


def _bl_plane_fresh(self, rkeys):
    """Fresh rack + jitter; reset_fn's key tree: split -> (jitter, state)."""
    n = self.n_balls
    B = rkeys.shape[0]
    jkeys = jax.vmap(jax.random.split)(rkeys)[:, 0]
    jit2 = jax.vmap(
        lambda k: jax.random.uniform(k, (n, 2), minval=-0.002, maxval=0.002)
    )(jkeys)  # [B, n, 2]
    ipx, ipy, _ivx, _ivy, iang, _iom = (
        jnp.asarray(x) for x in self._init_planes_np
    )  # [n_bodies, 1] init planes
    nb = ipx.shape[0]
    fresh_px = ipx + jnp.zeros((nb, B), ipx.dtype)
    fresh_py = ipy + jnp.zeros((nb, B), ipy.dtype)
    fresh_px = fresh_px.at[:n].add(jnp.swapaxes(jit2[..., 0], 0, 1))
    fresh_py = fresh_py.at[:n].add(jnp.swapaxes(jit2[..., 1], 0, 1))
    fresh_s = _SoA(
        px=fresh_px, py=fresh_py, vx=0.0, vy=0.0, angle=iang, omega=0.0
    )
    return fresh_s, 0.0


Billiards.plane_physics = _bl_plane_physics
Billiards.plane_pack = _bl_plane_pack
Billiards.plane_make_state = _bl_plane_make_state
Billiards.plane_pre = _bl_plane_pre
Billiards.plane_post = _bl_plane_post
Billiards.plane_obs = _bl_plane_obs
Billiards.plane_fresh = _bl_plane_fresh
