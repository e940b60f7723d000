"""Contact-solver quality tests: BASELINE config 3 (polygon stack) and
solver-mode coverage."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import box, circle, polygon

SQUARE = polygon([(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)])
GROUND = BodyDef(
    shapes=[polygon([(-20.0, -2.0), (20.0, -2.0), (20.0, 0.0), (-20.0, 0.0)])],
    mass=np.inf, inertia=np.inf, elasticity=0.0, friction=0.5,
)


def _roll(world, state, n):
    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            s, _c = world.step(s)
            return s, None

        return jax.lax.scan(f, state, None, length=n)[0]

    return roll(state, n)


def test_config3_three_box_stack_stable():
    """A 3-high box stack must settle upright (block solver)."""
    bodies = [
        BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2,
                position=(0.0, 0.6 + 1.05 * i), elasticity=0.0, friction=0.8)
        for i in range(3)
    ]
    bodies.append(GROUND)
    world, state = World.build(
        bodies,
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                    solver_mode="block", solver_iterations=8),
    )
    out = _roll(world, state, 3000)
    x = np.asarray(out.pos[:3, 0])
    y = np.asarray(out.pos[:3, 1])
    ang = np.asarray(out.angle[:3])
    assert np.abs(x).max() < 0.1, f"stack drifted: x={x}"
    assert np.allclose(y, [0.49, 1.48, 2.47], atol=0.05), f"stack collapsed: y={y}"
    assert np.abs(ang).max() < 0.05, f"stack tilted: ang={ang}"


def test_flat_box_rest_no_drift():
    body = BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 2.0),
                   elasticity=0.0, friction=0.5)
    world, state = World.build(
        [body, GROUND],
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                    solver_iterations=8),
    )
    out = _roll(world, state, 1500)
    assert abs(float(out.pos[0, 0])) < 0.01
    assert 0.45 < float(out.pos[0, 1]) < 0.52
    assert abs(float(out.angle[0])) < 0.01


def test_tilted_box_falls_flat():
    body = BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 2.0),
                   angle=0.35, elasticity=0.0, friction=0.5)
    world, state = World.build(
        [body, GROUND],
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                    solver_iterations=8),
    )
    out = _roll(world, state, 2000)
    # settles on a face: angle ~ multiple of pi/2
    ang = float(out.angle[0])
    assert min(abs(ang % (np.pi / 2)), np.pi / 2 - abs(ang % (np.pi / 2))) < 0.05
    assert 0.45 < float(out.pos[0, 1]) < 0.55


def test_block_solver_exact_restitution():
    """Split-impulse position correction must not pollute restitution:
    head-on elastic equal-mass circles exchange velocities exactly."""
    a = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(-2.0, 0.0), velocity=(1.0, 0.0), elasticity=1.0,
                friction=0.0)
    b = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(2.0, 0.0), velocity=(-1.0, 0.0), elasticity=1.0,
                friction=0.0)
    world, state = World.build([a, b], WorldConfig(dt=0.01, solver_iterations=4))
    out = _roll(world, state, 300)
    v = np.asarray(out.vel)
    assert abs(v[0, 0] + 1.0) < 0.02
    assert abs(v[1, 0] - 1.0) < 0.02


def test_restitution_coefficient_bounce():
    """Exit speed == e * impact speed at the bounce step."""
    ball = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                   position=(0.0, 3.0), elasticity=0.7, friction=0.0)
    gnd = BodyDef(shapes=[box((-50.0, -2.0), (50.0, 0.0))], mass=np.inf,
                  inertia=np.inf, elasticity=1.0, friction=0.0)
    world, state = World.build(
        [ball, gnd],
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic"),
    )

    @jax.jit
    def step(s):
        return world.step(s)

    s = state
    prev_vy = 0.0
    for _ in range(400):
        prev_vy = float(s.vel[0, 1])
        s, c = step(s)
        vy = float(s.vel[0, 1])
        if vy > 0 and prev_vy < -1:
            # impact step: gravity applied before the solve in symplectic mode
            impact = -(prev_vy - 9.8 * 0.01)
            assert abs(vy - 0.7 * impact) / impact < 0.02
            return
    pytest.fail("no bounce observed")


def test_friction_stops_sliding_box():
    body = BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 0.495),
                   velocity=(3.0, 0.0), elasticity=0.0, friction=0.5)
    world, state = World.build(
        [body, GROUND],
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                    solver_iterations=8),
    )
    out = _roll(world, state, 1500)
    assert abs(float(out.vel[0, 0])) < 0.05, "friction failed to stop the box"
    assert float(out.pos[0, 0]) > 0.3, "box should have slid some distance"


def test_frictionless_box_keeps_sliding():
    body = BodyDef(shapes=[SQUARE], mass=1.0, inertia=0.2, position=(0.0, 0.495),
                   velocity=(3.0, 0.0), elasticity=0.0, friction=0.0)
    gnd0 = BodyDef(
        shapes=[polygon([(-200.0, -2.0), (200.0, -2.0), (200.0, 0.0), (-200.0, 0.0)])],
        mass=np.inf, inertia=np.inf, elasticity=0.0, friction=0.0,
    )
    world, state = World.build(
        [body, gnd0],
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                    solver_iterations=8),
    )
    out = _roll(world, state, 500)
    assert float(out.vel[0, 0]) > 2.9
