"""Reference-parity pipeline modes: gjk_epa narrow phase, reference impulse
formulas, randomized one-contact-per-body solver."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.dynamics.impulses import ContactSolverConfig
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import box, circle, polygon

SQUARE = polygon([(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)])
GROUND = BodyDef(
    shapes=[polygon([(-20.0, -2.0), (20.0, -2.0), (20.0, 0.0), (-20.0, 0.0)])],
    mass=np.inf, inertia=np.inf, elasticity=0.1, friction=0.1,
)


def test_full_reference_pipeline_square_settles():
    """gjk_epa narrow phase + reference impulse formulas + randomized
    one-contact-per-body policy (the complete reference pipeline) keeps a
    dropped square on the ground (reference gravity scale)."""
    body = BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 2.0),
                   elasticity=1.0, friction=0.1)
    world, state = World.build(
        [body, GROUND],
        WorldConfig(dt=0.01, gravity=(0.0, -0.2), integrator="reference",
                    narrowphase="gjk_epa", solver_mode="random_one_per_body",
                    contact=ContactSolverConfig.reference()),
    )
    step = jax.jit(world.step)
    key = jax.random.PRNGKey(0)
    s = state
    for _ in range(1500):
        key, k = jax.random.split(key)
        s, _c = step(s, key=k)
    assert np.isfinite(np.asarray(s.pos)).all()
    # resting on the ground with the reference's Baumgarte-only correction
    assert 0.3 < float(s.pos[0, 1]) < 0.8


def test_gjk_epa_narrowphase_matches_sat_activity():
    """Both narrow phases must agree on which pairs collide."""
    tri = polygon([(-0.4, -0.3), (0.5, -0.2), (0.0, 0.5)])
    bodies = [
        BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 0.4),
                angle=0.2),
        BodyDef(shapes=[tri], mass=1.0, inertia=0.2, position=(0.3, 1.1)),
        GROUND,
    ]
    w_sat, st = World.build(bodies, WorldConfig(narrowphase="sat"))
    w_ref, _ = World.build(bodies, WorldConfig(narrowphase="gjk_epa"))

    # collapse SAT's 2-lane manifolds to per-pair activity
    c_sat = jax.jit(w_sat.detect_contacts)(st)
    c_ref = jax.jit(w_ref.detect_contacts)(st)
    ba_s = np.asarray(w_sat.table.body_a)
    bb_s = np.asarray(w_sat.table.body_b)
    ba_r = np.asarray(w_ref.table.body_a)
    bb_r = np.asarray(w_ref.table.body_b)

    def pair_active(act, ba, bb):
        d = {}
        for lane in range(len(ba)):
            k = (ba[lane], bb[lane])
            d[k] = d.get(k, False) | bool(act[lane])
        return d

    assert pair_active(np.asarray(c_sat.active), ba_s, bb_s) == pair_active(
        np.asarray(c_ref.active), ba_r, bb_r
    )


def test_gjk_epa_penetration_close_to_sat():
    bodies = [
        BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 0.42)),
        GROUND,
    ]
    w_sat, st = World.build(bodies, WorldConfig(narrowphase="sat"))
    w_ref, _ = World.build(bodies, WorldConfig(narrowphase="gjk_epa"))
    c_sat = jax.jit(w_sat.detect_contacts)(st)
    c_ref = jax.jit(w_ref.detect_contacts)(st)
    d_sat = float(jnp.linalg.norm(c_sat.penetration, axis=-1).max())
    d_ref = float(jnp.linalg.norm(c_ref.penetration, axis=-1).max())
    assert abs(d_sat - 0.08) < 1e-3  # 0.5 - 0.42
    assert abs(d_ref - d_sat) < 0.01  # EPA converges to the same MTV


def test_reference_impulse_config_formulas():
    """ContactSolverConfig.reference() reproduces the reference lever-arm
    behavior: a head-on elastic circle pair does NOT cleanly exchange
    velocities (|r|^2/I over-damps), unlike the textbook default."""
    a = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(-0.55, 0.0), velocity=(1.0, 0.0), elasticity=1.0,
                friction=0.0)
    b = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(0.55, 0.0), velocity=(-1.0, 0.0), elasticity=1.0,
                friction=0.0)

    def exchange(cc):
        world, st = World.build(
            [a, b],
            WorldConfig(dt=0.01, solver_mode="gauss_seidel",
                        solver_iterations=1, contact=cc),
        )
        s = st
        step = jax.jit(world.step)
        for _ in range(40):
            s, _c = step(s)
        return float(s.vel[0, 0])

    v_ref = exchange(ContactSolverConfig.reference())
    # reference lever arm bleeds impulse into the angular term: incomplete
    # exchange, the pair separates slowly
    assert -0.8 < v_ref < 0.0
