"""LunarLander: 4-body jointed lander over randomized terrain.

Geometry, masses, joints and terrain generation replicate the reference
(/root/reference/cotix/_lunar_lander.py) constant-for-constant and
key-for-key: the same PRNG key produces the same terrain (same
``jr.split(key, 5)`` layout and uniform draws, _lunar_lander.py:108-125).

What the reference left unimplemented (SURVEY §2.4) and parallax adds:

* thrust controls (main + side engines, gym-LunarLander-style continuous
  actions),
* in-graph reward shaping / termination / auto-reset,
* fully batched stepping — terrain vertices live in the env state, so every
  world in a batch has its own terrain and resets regenerate it on-device.

Bodies (reference order, _lunar_lander.py:143): 0 lander (Polygon6),
1 right leg, 2 left leg (Polygon4), 3 ground (7 Polygon4 terrain segments).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parallax_tpu.dynamics.bodies import BodyState
from parallax_tpu.dynamics.joints import Joints
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.envs.base import BatchedEnvironmentMixin, Environment, TimeStep
from parallax_tpu.envs.plane_env import PlaneEnvMixin
from parallax_tpu.geometry.math import rotate, safe_norm
from parallax_tpu.geometry.shapes import MAX_VERTS, polygon

# ---- reference constants (_lunar_lander.py:11-23) -------------------------

LANDER_POLY = np.array(
    [(-14, 17), (-17, 0), (-17, -10), (17, -10), (17, 0), (14, 17)], np.float32
)
LEG_AWAY = 24
LEG_DOWN = 8
LEG_W, LEG_H = 2, 8
LEG_ANGLE = -0.3
SCALE = 0.05

N_TERRAIN = 7
PAD_X = (-2.0, 2.0)
PAD_Y = -2.0


def _leg_vertices(side: int) -> np.ndarray:
    """Leg quad, rotated the reference way (v @ R, i.e. by -LEG_ANGLE) and

    scaled; side=+1 left leg, -1 right leg (_lunar_lander.py:32-72)."""
    v = np.array(
        [(-LEG_W, -LEG_H), (LEG_W, -LEG_H), (LEG_W, LEG_H), (-LEG_W, LEG_H)],
        np.float32,
    )
    a = LEG_ANGLE
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    v = v @ R
    v = v * SCALE
    if side < 0:
        v = v * np.array([-1.0, 1.0], np.float32)
    return v


@dataclasses.dataclass(frozen=True)
class LanderConfig:
    dt: float = 0.01
    gravity: float = 0.2  # reference demo: v += (0, -0.002) per 0.01s step
    main_power: float = 0.5  # peak main-engine acceleration [u/s^2]
    side_power: float = 0.1  # lateral acceleration at full side throttle
    side_torque: float = 0.6  # angular acceleration at full side throttle
    fuel_cost_main: float = 0.03
    fuel_cost_side: float = 0.003
    max_steps: int = 1000
    solver_mode: str = "block"
    # reference-parity knobs: narrowphase="gjk_epa" +
    # solver_mode="random_one_per_body" + contact=ContactSolverConfig
    # .reference() + broadphase=False runs the lander through the exact
    # reference pipeline (vmapped path only — the batched fast path
    # rejects non-sat/non-block configs).  Pinned by the golden-trajectory
    # fixtures (tests/test_golden_parity.py).
    narrowphase: str = "sat"
    broadphase: bool = True
    contact: object = None  # Optional[ContactSolverConfig]; None = default
    # run the whole physics step as one Pallas kernel (ops/pallas_step.py).
    # Requires broadphase=False (the fused kernel has no AABB pre-mask
    # stage); measured FASTER than collide-in-XLA + solve-in-Pallas on raw
    # physics_core (19.1M vs 16.8M world-steps/s at B=8192, v5e) — see
    # tools/bench_fused.py.  Default off: broadphase=True is the safer
    # default for arbitrary worlds.
    use_pallas_fused: bool = False
    # batched fast path only: pair each dynamic body with a conservative
    # per-world window of K consecutive terrain segments instead of all 7
    # (K from the body's circumradius vs the sampler's provable minimum
    # inner-segment width) — same physics, ~40% fewer contact lanes
    # (tests/test_batched_engine.py::test_terrain_candidates_match_full_table).
    # Default OFF: measured a net LOSS on v5e at batch 8192 — the solver
    # shrinks 87->62 us/step but gathering 11 per-world [V, B] candidate
    # planes costs ~100 us (select chains; a take_along_axis gather was
    # 100x worse — serialized dynamic slices).  At 7 segments the static
    # all-pairs table reads the terrain once and stays cheaper; revisit
    # only for terrains with many more segments.
    terrain_candidates: bool = False
    # lander contact graphs are shallow (legs + lander vs ground); (3, 2)
    # is empirically indistinguishable from (4, 3) on landing/drop
    # trajectories and ~15% faster end-to-end
    solver_iterations: int = 3
    position_iterations: int = 2
    leg_omega_damping: float = 0.95  # reference _lunar_lander.py:206-212
    landed_speed: float = 0.08
    landed_omega: float = 0.2
    crash_tilt: float = 1.4
    out_x: float = 15.0
    out_y: float = -9.5
    landed_bonus: float = 10.0
    crash_penalty: float = -10.0


class LanderState(struct.PyTreeNode):
    bodies: BodyState
    # ground segment vertices (world frame), stored FLAT [7 * MAX_VERTS * 2]
    # so the batched state tiles efficiently on TPU (last dim 112 ~ 128);
    # view via ``terrain_view``.
    terrain: jnp.ndarray
    t: jnp.ndarray  # i32 step counter
    key: jnp.ndarray
    prev_shaping: jnp.ndarray  # f32, potential-based reward memory
    # [2] f32 — previous step's (left, right) leg-ground contact flags.
    # Stored in the state so ``observe`` (what a policy sees during
    # rollouts) matches ``TimeStep.obs`` (what it sees acting on env
    # outputs): features 7:9 are the *last* step's touchdown state.
    leg_contacts: jnp.ndarray

    @property
    def terrain_view(self):
        return self.terrain.reshape(self.terrain.shape[:-1] + (N_TERRAIN, MAX_VERTS, 2))


def _pseudo_angle(dx, dy):
    """Diamond pseudo-angle: strictly monotone in ``atan2(dy, dx)``.

    Maps the right half-plane to [-1, 1], upper-left to (1, 2], lower-left
    to (-2, -1) — the same total order over directions as atan2 at ~1/10th
    the VPU ops (the terrain sampler runs per step in the auto-reset fresh
    path).  Ordering by this key differs from ordering by float32 atan2
    only when two directions are so close that atan2 rounds them EQUAL
    (measured: corners within ~2e-6) — there the reference's stable
    argsort keeps input order while this key still orders strictly.  That
    tie case is a physically degenerate quad (two near-coincident
    vertices); both paths below share this key, so batched == vmapped
    terrain stays bitwise BY CONSTRUCTION, and the divergence vs the
    reference's atan2 convention (_geometry_utils.py:60-67) is confined
    to exact-float-tie seeds (golden configs pin the shipped seeds)."""
    p = dy / (jnp.abs(dx) + jnp.abs(dy))
    return jnp.where(dx >= 0.0, p, jnp.where(dy >= 0.0, 2.0 - p, -2.0 - p))


def terrain_vertices(key) -> jnp.ndarray:
    """Reference terrain sampler (_lunar_lander.py:108-132), in-graph.

    Same key-split layout and uniform ranges as the reference; returns
    [7, MAX_VERTS, 2] clockwise-ordered, repeat-padded world-frame quads.
    Clockwise ordering uses the :func:`_pseudo_angle` key (see its
    docstring for the tie-case divergence vs the reference's atan2 sort).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    heights = jax.random.uniform(k1, (8,), minval=-5.0, maxval=5.0)
    heights = heights.at[0].set(heights[0] * 10)
    heights = heights.at[3].set(-2.0)
    heights = heights.at[-4].set(-2.0)
    heights = heights.at[-1].set(heights[-1] * 10)

    positions = jnp.stack(
        [
            jnp.asarray(-100.0),
            jax.random.uniform(k2, (), minval=-12.0, maxval=-9.0),
            jax.random.uniform(k3, (), minval=-8.0, maxval=-4.0),
            jnp.asarray(-2.0),
            jnp.asarray(2.0),
            jax.random.uniform(k4, (), minval=4.0, maxval=8.0),
            jax.random.uniform(k5, (), minval=9.0, maxval=12.0),
            jnp.asarray(100.0),
        ]
    )
    x0 = positions[:-1]
    x1 = positions[1:]
    h0 = heights[:-1]
    h1 = heights[1:]
    quads = jnp.stack(
        [
            jnp.stack([x0, h0], axis=-1),
            jnp.stack([x0, jnp.full_like(x0, -10.0)], axis=-1),
            jnp.stack([x1, h1], axis=-1),
            jnp.stack([x1, jnp.full_like(x1, -10.0)], axis=-1),
        ],
        axis=-2,
    )  # [7, 4, 2]
    rel = quads - jnp.mean(quads, axis=-2, keepdims=True)
    idx = jnp.argsort(_pseudo_angle(rel[..., 0], rel[..., 1]), axis=-1)
    quads = jnp.take_along_axis(quads, idx[..., None], axis=-2)
    pad_idx = [0, 1, 2, 3] + [3] * (MAX_VERTS - 4)
    return quads[:, pad_idx, :]


class LunarLander(PlaneEnvMixin, BatchedEnvironmentMixin, Environment):
    def __init__(self, config: LanderConfig = LanderConfig()):
        self.config = config
        if config.use_pallas_fused and config.broadphase:
            # same loud-rejection policy as parallel.rollout's checkpoint
            # guard: a silent fallback to the split path would make users
            # believe they are measuring the fused kernel
            raise ValueError(
                "use_pallas_fused requires broadphase=False (the fused "
                "kernel has no AABB pre-mask stage): "
                "LanderConfig(use_pallas_fused=True, broadphase=False)"
            )

        lander = BodyDef(
            shapes=[polygon(LANDER_POLY * SCALE)],
            mass=30.0,
            inertia=30.0,
            position=(0.0, 5.0),
            angle=0.01,
            friction=0.1,
            name="lander",
        )
        right_leg = BodyDef(
            shapes=[polygon(_leg_vertices(-1))],
            mass=1.0,
            inertia=1.0,
            position=(-LEG_AWAY * SCALE, -LEG_DOWN * SCALE + 5.0),
            friction=0.1,
            name="right_leg",
        )
        left_leg = BodyDef(
            shapes=[polygon(_leg_vertices(+1))],
            mass=1.0,
            inertia=1.0,
            position=(LEG_AWAY * SCALE, -LEG_DOWN * SCALE + 5.0),
            friction=0.1,
            name="left_leg",
        )
        # terrain placeholder quads; real vertices come from the state
        ground = BodyDef(
            shapes=[
                polygon([(i, -9.0), (i + 1.0, -9.0), (i + 1.0, -10.0), (i, -10.0)])
                for i in range(N_TERRAIN)
            ],
            mass=np.inf,
            inertia=np.inf,
            elasticity=0.1,
            friction=0.1,
            name="ground",
        )

        # joints (reference _lunar_lander.py:145-204): two per leg; order
        # matters for the sequential solve: left1, left2, right1, right2.
        joints = Joints.make(
            body_a=[0, 0, 0, 0],
            body_b=[2, 2, 1, 1],
            anchor_a=np.array(
                [
                    [LEG_AWAY * SCALE, -LEG_DOWN * SCALE],
                    [LEG_AWAY * SCALE, (-LEG_DOWN + 8) * SCALE],
                    [-LEG_AWAY * SCALE, -LEG_DOWN * SCALE],
                    [-LEG_AWAY * SCALE, (-LEG_DOWN + 8) * SCALE],
                ],
                np.float32,
            ),
            anchor_b=np.array(
                [[0.0, 0.0], [0.0, 0.4], [0.0, 0.0], [0.0, 0.4]], np.float32
            ),
            kp=1.0,
            kd=0.05,
            v0=0.1,
        )

        wc = WorldConfig(
            dt=config.dt,
            gravity=(0.0, -config.gravity),
            integrator="reference",
            narrowphase=config.narrowphase,
            broadphase=config.broadphase,
            **({} if config.contact is None else {"contact": config.contact}),
            solver_mode=config.solver_mode,
            solver_iterations=config.solver_iterations,
            position_iterations=config.position_iterations,
            joint_mode="gauss_seidel",
            use_pallas_solver=True,
            use_pallas_fused=config.use_pallas_fused,
        )
        self.world, self._init_bodies = World.build(
            [lander, right_leg, left_leg, ground], wc, joints=joints
        )

        # -- batched fast-path world: per-body terrain-candidate windows --
        # A dynamic body of circumradius R centred inside segment i can only
        # overlap segments i-m..i+m with m = floor(R / MIN_SEG_W) + 1:
        # reaching segment i±(m+1) would require R > m * MIN_SEG_W.
        # MIN_SEG_W = 1.0 is the provable minimum INNER segment width of the
        # terrain sampler (terrain_vertices: adjacent position draws are
        # separated by >= 1.0; the two edge segments run to +-100).  The
        # candidate world pairs each dynamic body with its own K = 2m+1
        # part slots whose vertex planes are gathered per world per step —
        # identical physics (every possibly-active contact is inside the
        # window; extra lanes are inactive in both worlds) with ~40% fewer
        # contact lanes (lander K=5, legs K=3: 14 pairs vs 24).
        self._use_candidates = bool(config.terrain_candidates)
        if self._use_candidates:
            MIN_SEG_W = 1.0
            pv = np.asarray(self.world.parts.verts)
            ms, Ks = [], []
            for part in (0, 1, 2):
                nv = self.world.parts.nverts[part]
                r = float(np.linalg.norm(pv[part, :nv], axis=1).max())
                m = int(np.floor(r / MIN_SEG_W)) + 1
                ms.append(m)
                Ks.append(min(2 * m + 1, N_TERRAIN))
            ground_cand = BodyDef(
                shapes=[
                    polygon([(i, -9.0), (i + 1.0, -9.0), (i + 1.0, -10.0), (i, -10.0)])
                    for i in range(sum(Ks))
                ],
                mass=np.inf,
                inertia=np.inf,
                elasticity=0.1,
                friction=0.1,
                name="ground",
            )
            starts = [3 + int(s) for s in np.cumsum([0] + Ks[:-1])]
            part_filter = []
            for b_i in range(3):
                own = set(range(starts[b_i], starts[b_i] + Ks[b_i]))
                for gp in range(3, 3 + sum(Ks)):
                    if gp not in own:
                        part_filter.append((b_i, gp))
            self._cand_world, _ = World.build(
                [lander, right_leg, left_leg, ground_cand],
                wc,
                joints=joints,
                part_collision_filter=part_filter,
            )
            self._cand_parts = [
                (starts[i], Ks[i], ms[i]) for i in range(3)
            ]
            self._bm_world = self._cand_world
        else:
            self._bm_world = self.world

        # static contact-lane masks: which buffer lanes touch which bodies.
        # The vmapped path (step_fn) reads the FULL world's buffer; the
        # batched path reads _bm_world's (candidate) buffer.
        ba = np.asarray(self.world.table.body_a)
        bb = np.asarray(self.world.table.body_b)
        self._left_leg_lanes = np.nonzero(
            ((ba == 2) & (bb == 3)) | ((ba == 3) & (bb == 2))
        )[0]
        self._right_leg_lanes = np.nonzero(
            ((ba == 1) & (bb == 3)) | ((ba == 3) & (bb == 1))
        )[0]
        self._lander_ground_lanes = np.nonzero(
            ((ba == 0) & (bb == 3)) | ((ba == 3) & (bb == 0))
        )[0]
        bba = np.asarray(self._bm_world.table.body_a)
        bbb = np.asarray(self._bm_world.table.body_b)
        self._bm_left_leg_lanes = np.nonzero(
            ((bba == 2) & (bbb == 3)) | ((bba == 3) & (bbb == 2))
        )[0]
        self._bm_right_leg_lanes = np.nonzero(
            ((bba == 1) & (bbb == 3)) | ((bba == 3) & (bbb == 1))
        )[0]
        self._bm_lander_ground_lanes = np.nonzero(
            ((bba == 0) & (bbb == 3)) | ((bba == 3) & (bbb == 0))
        )[0]
        self._ground_parts = [
            i for i, b in enumerate(self.world.parts.body) if b == 3
        ]
        # leg omega damping vector (bodies 1 and 2)
        self._omega_damp = jnp.asarray(
            [1.0, config.leg_omega_damping, config.leg_omega_damping, 1.0]
        )

        # initial-state planes for in-graph resets (broadcast [n, 1] consts)
        ib = self._init_bodies
        from parallax_tpu.envs.plane_env import init_planes_of

        self._init_planes = init_planes_of(ib)
        px0, py0 = float(ib.pos[0, 0]), float(ib.pos[0, 1])
        self._init_shaping = (
            -float(np.sqrt(px0 * px0 + (py0 - (PAD_Y + 1.0)) ** 2))
            - 0.0
            - abs(float(ib.angle[0]))
        )

    # ------------------------------------------------------------------

    @property
    def action_size(self) -> int:
        return 2  # [main in [0,1] (negatives = off), side in [-1,1]]

    @property
    def observation_size(self) -> int:
        return 9

    def _world_with_terrain(self, terrain_flat) -> World:
        terrain = terrain_flat.reshape(N_TERRAIN, MAX_VERTS, 2)
        verts = self.world.parts.verts.at[np.asarray(self._ground_parts)].set(terrain)
        return self.world.replace(parts=self.world.parts.replace(verts=verts))

    def reset_fn(self, key) -> LanderState:
        tkey, skey = jax.random.split(key)
        terrain = terrain_vertices(tkey).reshape(-1)
        state = LanderState(
            bodies=self._init_bodies,
            terrain=terrain,
            t=jnp.zeros((), jnp.int32),
            key=skey,
            prev_shaping=jnp.zeros(()),
            leg_contacts=jnp.zeros((2,)),
        )
        return state.replace(prev_shaping=self._shaping(state, jnp.zeros(2, bool)))

    def observe(self, state: LanderState) -> jnp.ndarray:
        b = state.bodies
        return jnp.concatenate(
            [
                b.pos[0] - jnp.asarray([0.0, PAD_Y]),
                b.vel[0],
                jnp.stack([jnp.sin(b.angle[0]), jnp.cos(b.angle[0])]),
                b.omega[0][None],
                state.leg_contacts.astype(b.pos.dtype),
            ]
        )

    def _observe_with_contacts(self, state, leg_contacts):
        obs = self.observe(state)
        return obs.at[7:9].set(leg_contacts.astype(obs.dtype))

    def _shaping(self, state: LanderState, leg_contacts) -> jnp.ndarray:
        b = state.bodies
        dist = safe_norm(b.pos[0] - jnp.asarray([0.0, PAD_Y + 1.0]))
        speed = safe_norm(b.vel[0])
        return (
            -1.0 * dist
            - 1.0 * speed
            - 1.0 * jnp.abs(b.angle[0])
            + 0.3 * jnp.sum(leg_contacts)
        )

    def step_fn(self, state: LanderState, action):
        cfg = self.config
        action = jnp.asarray(action, jnp.float32).reshape(2)  # [main, side]
        main = jnp.clip(action[0], 0.0, 1.0)
        side = jnp.clip(action[1], -1.0, 1.0)

        b = state.bodies
        # thrust as velocity kicks on the lander (body 0)
        up = rotate(jnp.asarray([0.0, 1.0]), b.angle[0])
        right = rotate(jnp.asarray([1.0, 0.0]), b.angle[0])
        dv = up * (cfg.main_power * main * cfg.dt) + right * (
            cfg.side_power * side * cfg.dt
        )
        b = b.replace(
            vel=b.vel.at[0].add(dv),
            omega=b.omega.at[0].add(-cfg.side_torque * side * cfg.dt),
        )

        world = self._world_with_terrain(state.terrain)
        # the randomized reference solver draws its lane choice from the
        # episode stream (fold_in: no extra key in the state tree; state.key
        # is re-split by Environment.step each step so this stays fresh)
        solver_key = (
            jax.random.fold_in(state.key, 0x501E)
            if world.config.solver_mode.startswith("random_one_per_body")
            else None
        )
        b, contacts = world.step(b, key=solver_key)
        b = b.replace(omega=b.omega * self._omega_damp)

        act = contacts.active
        leg_contacts = jnp.stack(
            [
                jnp.any(act[self._left_leg_lanes]) if len(self._left_leg_lanes) else jnp.array(False),
                jnp.any(act[self._right_leg_lanes]) if len(self._right_leg_lanes) else jnp.array(False),
            ]
        )
        lander_contact = (
            jnp.any(act[self._lander_ground_lanes])
            if len(self._lander_ground_lanes)
            else jnp.array(False)
        )

        new_state = state.replace(
            bodies=b,
            t=state.t + 1,
            leg_contacts=leg_contacts.astype(jnp.float32),
        )

        # termination
        speed = safe_norm(b.vel[0])
        landed = (
            jnp.all(leg_contacts)
            & (speed < cfg.landed_speed)
            & (jnp.abs(b.omega[0]) < cfg.landed_omega)
            & (jnp.abs(b.angle[0]) < 0.3)
        )
        crashed = (
            lander_contact
            | (jnp.abs(b.pos[0, 0]) > cfg.out_x)
            | (b.pos[0, 1] < cfg.out_y)
            | (jnp.abs(b.angle[0]) > cfg.crash_tilt)
        )
        truncated = new_state.t >= cfg.max_steps

        shaping = self._shaping(new_state, leg_contacts)
        reward = (
            shaping
            - state.prev_shaping
            - cfg.fuel_cost_main * main
            - cfg.fuel_cost_side * jnp.abs(side)
        )
        reward = reward + jnp.where(landed, cfg.landed_bonus, 0.0)
        reward = reward + jnp.where(crashed, cfg.crash_penalty, 0.0)
        new_state = new_state.replace(prev_shaping=shaping)

        ts = TimeStep(
            obs=self.observe(new_state),
            reward=reward,
            terminated=landed | crashed,
            truncated=truncated & ~(landed | crashed),
            info={
                "landed": landed,
                "crashed": crashed,
                "leg_contacts": leg_contacts,
                "fuel": main + jnp.abs(side),
            },
        )
        return new_state, ts


# ---------------------------------------------------------------------------
# Batched (batch-minor) fast path — see parallax_tpu.engine.batched
# ---------------------------------------------------------------------------


def terrain_planes_batch(keys):
    """Batch-minor terrain sampler: ``keys`` [B, 2] -> (qx, qy) [7, V, B]

    world-frame planes, bit-identical to ``jax.vmap(terrain_vertices)``
    (same per-world key splits and draws) with the clockwise ordering as a
    stable 4-element sorting network."""
    B = keys.shape[0]
    ks = jax.vmap(lambda k: jax.random.split(k, 5))(keys)  # [B, 5, 2]
    heights = jax.vmap(
        lambda k: jax.random.uniform(k, (8,), minval=-5.0, maxval=5.0)
    )(ks[:, 0]).T  # [8, B]
    heights = heights.at[0].mul(10.0)
    heights = heights.at[3].set(-2.0)
    heights = heights.at[4].set(-2.0)
    heights = heights.at[7].mul(10.0)

    def u(i, lo, hi):
        return jax.vmap(
            lambda k: jax.random.uniform(k, (), minval=lo, maxval=hi)
        )(ks[:, i])

    ones = jnp.ones((B,))
    positions = jnp.stack(
        [
            -100.0 * ones,
            u(1, -12.0, -9.0),
            u(2, -8.0, -4.0),
            -2.0 * ones,
            2.0 * ones,
            u(3, 4.0, 8.0),
            u(4, 9.0, 12.0),
            100.0 * ones,
        ]
    )  # [8, B]
    x0, x1 = positions[:-1], positions[1:]  # [7, B]
    h0, h1 = heights[:-1], heights[1:]
    bottom = jnp.full_like(x0, -10.0)
    qx = jnp.stack([x0, x0, x1, x1], axis=1)  # [7, 4, B]
    qy = jnp.stack([h0, bottom, h1, bottom], axis=1)

    # clockwise ordering: stable ascending sort on the SAME _pseudo_angle
    # key as the vmapped terrain_vertices — identical key formula + stable
    # tie rule (the network's idx tie-break == argsort stability) keeps
    # batched == vmapped terrain bitwise by construction.
    cx = qx.mean(axis=1, keepdims=True)
    cy = qy.mean(axis=1, keepdims=True)
    ang = _pseudo_angle(qx - cx, qy - cy)
    idx = jnp.broadcast_to(jnp.arange(4.0)[None, :, None], ang.shape)

    def cswap(i, j, ang, idx, qx, qy):
        ai, aj = ang[:, i], ang[:, j]
        swap = (ai > aj) | ((ai == aj) & (idx[:, i] > idx[:, j]))

        def sw(arr):
            vi, vj = arr[:, i], arr[:, j]
            arr = arr.at[:, i].set(jnp.where(swap, vj, vi))
            arr = arr.at[:, j].set(jnp.where(swap, vi, vj))
            return arr

        return sw(ang), sw(idx), sw(qx), sw(qy)

    for (i, j) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        ang, idx, qx, qy = cswap(i, j, ang, idx, qx, qy)

    pad_idx = np.asarray([0, 1, 2, 3] + [3] * (MAX_VERTS - 4))
    return qx[:, pad_idx], qy[:, pad_idx]  # [7, V, B]


def terrain_vertices_batch(keys) -> jnp.ndarray:
    """``keys`` [B, 2] -> flat [B, 7*MAX_VERTS*2] terrain (see

    :func:`terrain_planes_batch`)."""
    qx, qy = terrain_planes_batch(keys)
    terrain = jnp.stack([qx, qy], axis=2)  # [7, V, 2, B]
    return jnp.transpose(terrain, (3, 0, 1, 2)).reshape(keys.shape[0], -1)


def _lander_reset_fn_batch(self, keys):
    B = keys.shape[0]
    split = jax.vmap(jax.random.split)(keys)  # [B, 2, 2]
    tkeys, skeys = split[:, 0], split[:, 1]
    terrain = terrain_vertices_batch(tkeys)
    bodies = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), self._init_bodies
    )
    states = LanderState(
        bodies=bodies,
        terrain=terrain,
        t=jnp.zeros((B,), jnp.int32),
        key=skeys,
        prev_shaping=jnp.zeros((B,)),
        leg_contacts=jnp.zeros((B, 2)),
    )
    # initial shaping with no leg contacts
    px, py = bodies.pos[:, 0, 0], bodies.pos[:, 0, 1]
    vx, vy = bodies.vel[:, 0, 0], bodies.vel[:, 0, 1]
    dist = jnp.sqrt(px * px + (py - (PAD_Y + 1.0)) ** 2)
    speed = jnp.sqrt(vx * vx + vy * vy)
    shaping = -dist - speed - jnp.abs(bodies.angle[:, 0])
    return states.replace(prev_shaping=shaping)


LunarLander.reset_fn_batch = _lander_reset_fn_batch


# ---------------------------------------------------------------------------
# Plane-space rollouts: the state never leaves the batch-minor frame across
# the whole scan — boundary transposes happen once per rollout, not per step.
# ---------------------------------------------------------------------------

from typing import NamedTuple as _NamedTuple  # noqa: E402

from parallax_tpu.engine.batched import _SoA, physics_core  # noqa: E402


class LanderAux(_NamedTuple):
    """Env-specific plane aux for the generic driver (envs/plane_env.py)."""

    tox: jnp.ndarray  # [7, V, B] terrain x
    toy: jnp.ndarray  # [7, V, B] terrain y
    prev_shaping: jnp.ndarray  # [B]
    lc: jnp.ndarray  # [2, B] previous-step leg contact flags (f32)


def _lander_plane_pack(self, states: LanderState) -> LanderAux:
    B = states.t.shape[0]
    tflat = jnp.swapaxes(states.terrain, 0, 1)
    tp = tflat.reshape(N_TERRAIN, MAX_VERTS, 2, B)
    return LanderAux(
        tox=tp[:, :, 0, :],
        toy=tp[:, :, 1, :],
        prev_shaping=states.prev_shaping,
        lc=jnp.swapaxes(states.leg_contacts, 0, 1),
    )


def _lander_plane_make_state(self, bodies, aux: LanderAux, t, key) -> LanderState:
    B = t.shape[0]
    terrain = jnp.stack([aux.tox, aux.toy], axis=2)  # [7, V, 2, B]
    return LanderState(
        bodies=bodies,
        terrain=jnp.transpose(terrain, (3, 0, 1, 2)).reshape(B, -1),
        t=t,
        key=key,
        prev_shaping=aux.prev_shaping,
        leg_contacts=jnp.swapaxes(aux.lc, 0, 1),
    )


def _lander_plane_obs(self, s: _SoA, aux: LanderAux):
    return jnp.stack(
        [
            s.px[0],
            s.py[0] - PAD_Y,
            s.vx[0],
            s.vy[0],
            jnp.sin(s.angle[0]),
            jnp.cos(s.angle[0]),
            s.omega[0],
            aux.lc[0].astype(s.px.dtype),
            aux.lc[1].astype(s.px.dtype),
        ],
        axis=-1,
    )


def _lander_candidate_override(self, px_pred, tox, toy):
    """Gather each dynamic body's terrain-candidate window.

    ``px_pred`` [3, B]: predicted collide-time x of bodies 0..2 (positions
    integrate by exactly vx*dt before the narrow phase).  ``tox``/``toy``
    [7, V, B] per-world terrain planes.  Returns the ``terrain_override``
    dict for ``_cand_world``: K consecutive segments per body, the window
    clamped inside [0, 7-K] (a sliding window, never duplicated segments —
    a duplicate would double-resolve its contact)."""
    x0 = tox.min(axis=1)  # [7, B] left edge of each segment
    override = {}
    for bi, (p0, K, m) in enumerate(self._cand_parts):
        px = px_pred[bi]
        seg = jnp.zeros(px.shape, jnp.int32)
        for k in range(1, N_TERRAIN):
            seg = seg + (px >= x0[k]).astype(jnp.int32)
        start = jnp.clip(seg - m, 0, N_TERRAIN - K)
        for j in range(K):
            sel = start + j  # [B]
            cx, cy = tox[0], toy[0]
            for sgm in range(1, N_TERRAIN):
                take = (sel == sgm)[None, :]
                cx = jnp.where(take, tox[sgm], cx)
                cy = jnp.where(take, toy[sgm], cy)
            override[p0 + j] = (cx, cy)
    return override


def _lander_plane_pre(self, s: _SoA, aux: LanderAux, actions) -> _SoA:
    cfg = self.config
    B = s.px.shape[-1]
    actions = jnp.asarray(actions, jnp.float32).reshape(B, 2)
    main = jnp.clip(actions[:, 0], 0.0, 1.0)
    side = jnp.clip(actions[:, 1], -1.0, 1.0)
    c0, s0 = jnp.cos(s.angle[0]), jnp.sin(s.angle[0])
    dvx = -s0 * (cfg.main_power * main * cfg.dt) + c0 * (cfg.side_power * side * cfg.dt)
    dvy = c0 * (cfg.main_power * main * cfg.dt) + s0 * (cfg.side_power * side * cfg.dt)
    return s._replace(
        vx=s.vx.at[0].add(dvx),
        vy=s.vy.at[0].add(dvy),
        omega=s.omega.at[0].add(-cfg.side_torque * side * cfg.dt),
    )


def _lander_plane_physics(self, s: _SoA, aux: LanderAux):
    cfg = self.config
    if self._use_candidates:
        # predicted collide-time x: positions integrate by exactly vx*dt
        # (reference integrator order) before the narrow phase
        px_pred = s.px[:3] + s.vx[:3] * cfg.dt
        override = self._candidate_override(px_pred, aux.tox, aux.toy)
    else:
        override = {
            p: (aux.tox[i], aux.toy[i]) for i, p in enumerate(self._ground_parts)
        }
    return physics_core(self._bm_world, s, terrain_override=override)


def _lander_plane_post(self, s: _SoA, aux: LanderAux, con, actions, t_new):
    cfg = self.config
    B = s.px.shape[-1]
    actions = jnp.asarray(actions, jnp.float32).reshape(B, 2)
    main = jnp.clip(actions[:, 0], 0.0, 1.0)
    side = jnp.clip(actions[:, 1], -1.0, 1.0)

    s = s._replace(omega=s.omega * self._omega_damp[:, None])

    act = con.active
    left = act[self._bm_left_leg_lanes].any(0) if len(self._bm_left_leg_lanes) else jnp.zeros(B, bool)
    right = act[self._bm_right_leg_lanes].any(0) if len(self._bm_right_leg_lanes) else jnp.zeros(B, bool)
    lander_contact = (
        act[self._bm_lander_ground_lanes].any(0)
        if len(self._bm_lander_ground_lanes)
        else jnp.zeros(B, bool)
    )

    px, py = s.px[0], s.py[0]
    vx, vy = s.vx[0], s.vy[0]
    ang, om = s.angle[0], s.omega[0]
    speed = jnp.sqrt(vx * vx + vy * vy)
    dist = jnp.sqrt(px * px + (py - (PAD_Y + 1.0)) ** 2)
    nlegs = left.astype(px.dtype) + right.astype(px.dtype)
    shaping = -dist - speed - jnp.abs(ang) + 0.3 * nlegs

    landed = (
        left & right
        & (speed < cfg.landed_speed)
        & (jnp.abs(om) < cfg.landed_omega)
        & (jnp.abs(ang) < 0.3)
    )
    crashed = (
        lander_contact
        | (jnp.abs(px) > cfg.out_x)
        | (py < cfg.out_y)
        | (jnp.abs(ang) > cfg.crash_tilt)
    )
    reward = (
        shaping
        - aux.prev_shaping
        - cfg.fuel_cost_main * main
        - cfg.fuel_cost_side * jnp.abs(side)
        + jnp.where(landed, cfg.landed_bonus, 0.0)
        + jnp.where(crashed, cfg.crash_penalty, 0.0)
    )
    terminated = landed | crashed
    lc_new = jnp.stack([left, right]).astype(s.px.dtype)  # [2, B]
    aux = LanderAux(tox=aux.tox, toy=aux.toy, prev_shaping=shaping, lc=lc_new)
    info = {
        "landed": landed,
        "crashed": crashed,
        "leg_contacts": jnp.stack([left, right], axis=-1),  # [B, 2]
        "fuel": main + jnp.abs(side),
    }
    return s, aux, reward, terminated, info


def _lander_plane_fresh(self, rkeys):
    tkeys = jax.vmap(jax.random.split)(rkeys)[:, 0]
    ftox, ftoy = terrain_planes_batch(tkeys)
    # fresh prev_shaping for reset worlds (no leg contact at spawn)
    return self._init_planes, LanderAux(
        tox=ftox, toy=ftoy, prev_shaping=self._init_shaping, lc=0.0
    )


LunarLander._candidate_override = _lander_candidate_override
LunarLander.plane_pack = _lander_plane_pack
LunarLander.plane_make_state = _lander_plane_make_state
LunarLander.plane_obs = _lander_plane_obs
LunarLander.plane_pre = _lander_plane_pre
LunarLander.plane_physics = _lander_plane_physics
LunarLander.plane_post = _lander_plane_post
LunarLander.plane_fresh = _lander_plane_fresh


# ---------------------------------------------------------------------------
# Continuous-time evaluation (reference AbstractEnvironment.eval semantics,
# /root/reference/cotix/_envs.py:37-132) on the real LunarLander: World
# forward dynamics + a dense-in-time Control + an integral-reward Judge.
# The reference's abstract classes had zero concrete subclasses; these are
# the concrete ones.
# ---------------------------------------------------------------------------

from parallax_tpu.envs.base import Judge as _Judge  # noqa: E402


class LanderJudge(_Judge):
    """Integral reward: R = ∫ -(dist + speed + |angle|) dt + terminal bonus."""

    def __init__(self, env: "LunarLander", terrain_flat):
        self.env = env
        self.world = env._world_with_terrain(terrain_flat)

    def _signals(self, bodies):
        px, py = bodies.pos[0]
        speed = safe_norm(bodies.vel[0])
        contacts = self.world.detect_contacts(bodies)
        act = contacts.active
        left = act[self.env._left_leg_lanes].any()
        right = act[self.env._right_leg_lanes].any()
        lander_c = act[self.env._lander_ground_lanes].any()
        landed = (
            left
            & right
            & (speed < self.env.config.landed_speed)
            & (jnp.abs(bodies.omega[0]) < self.env.config.landed_omega)
            & (jnp.abs(bodies.angle[0]) < 0.3)
        )
        crashed = (
            lander_c
            | (jnp.abs(px) > self.env.config.out_x)
            | (py < self.env.config.out_y)
            | (jnp.abs(bodies.angle[0]) > self.env.config.crash_tilt)
        )
        return landed, crashed

    def reward(self, state, control_signal):
        b = state
        dist = safe_norm(b.pos[0] - jnp.asarray([0.0, PAD_Y + 1.0]))
        speed = safe_norm(b.vel[0])
        fuel = jnp.clip(control_signal[0], 0.0, 1.0) + jnp.abs(control_signal[1])
        return -(dist + speed + jnp.abs(b.angle[0])) - 0.3 * fuel

    def is_done(self, state, control_signal):
        landed, crashed = self._signals(state)
        return landed | crashed

    def end_reward(self, state, control_signal):
        landed, crashed = self._signals(state)
        return jnp.where(landed, 100.0, 0.0) + jnp.where(crashed, -100.0, 0.0)


def make_world_forward(env: "LunarLander", terrain_flat):
    """``forward(bodies, control_signal, dt) -> bodies`` — the continuous

    -time world dynamics (thrust + physics) for :func:`envs.base.evaluate`."""
    world = env._world_with_terrain(terrain_flat)
    cfg = env.config

    def forward(bodies, signal, dt):
        main = jnp.clip(signal[0], 0.0, 1.0)
        side = jnp.clip(signal[1], -1.0, 1.0)
        up = rotate(jnp.asarray([0.0, 1.0]), bodies.angle[0])
        right = rotate(jnp.asarray([1.0, 0.0]), bodies.angle[0])
        dv = up * (cfg.main_power * main * dt) + right * (cfg.side_power * side * dt)
        bodies = bodies.replace(
            vel=bodies.vel.at[0].add(dv),
            omega=bodies.omega.at[0].add(-cfg.side_torque * side * dt),
        )
        bodies, _ = world.step(bodies, dt=dt)
        return bodies.replace(omega=bodies.omega * env._omega_damp)

    return forward
