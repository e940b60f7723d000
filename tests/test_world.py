"""End-to-end world-step tests, following the BASELINE config ladder.

Config 1: single ball free-fall + ground bounce (symplectic Euler, batch 1)
Config 2: two-circle elastic collision (impulse resolution), batched
Config 3 precursor: polygon resting on ground with iterative solver
Plus: integrator unit semantics (reference formulas), joint attachment,
vmap batching, jit + grad through the step.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.dynamics.bodies import BodyParams, BodyState
from parallax_tpu.dynamics.integrator import integrate_explicit_euler
from parallax_tpu.dynamics.joints import Joints
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import box, circle, polygon


def test_explicit_euler_reference_formula():
    # reference ExplicitEulerPhysics.step: x += v dt, theta += omega dt
    s = BodyState(
        pos=jnp.array([[1.0, 2.0]]),
        vel=jnp.array([[0.5, -1.0]]),
        angle=jnp.array([0.3]),
        omega=jnp.array([2.0]),
    )
    out = integrate_explicit_euler(s, 0.1)
    assert np.allclose(out.pos, [[1.05, 1.9]])
    assert np.allclose(out.angle, [0.5])
    assert np.allclose(out.vel, s.vel) and np.allclose(out.omega, s.omega)


def _ball_and_ground(e_ball=0.9):
    ball = BodyDef(
        shapes=[circle(0.5)],
        mass=1.0,
        inertia=0.1,
        position=(0.0, 5.0),
        elasticity=e_ball,
        friction=0.0,
    )
    ground = BodyDef(
        shapes=[box((-50.0, -2.0), (50.0, 0.0))],
        mass=np.inf,
        inertia=np.inf,
        elasticity=1.0,
        friction=0.0,
    )
    return ball, ground


def test_config1_ball_bounce():
    """Ball dropped from 5m bounces off the ground and keeps bouncing."""
    ball, ground = _ball_and_ground(e_ball=0.9)
    cfg = WorldConfig(
        dt=0.01,
        gravity=(0.0, -9.8),
        integrator="symplectic",
        solver_mode="jacobi",
        solver_iterations=1,
    )
    world, state = World.build([ball, ground], cfg)

    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            s, _c = world.step(s)
            return s, s.pos[0, 1]

        return jax.lax.scan(f, state, None, length=n)

    state2, heights = roll(state, 1000)
    h = np.asarray(heights)
    # fell, bounced (must have turned around at least twice), never sank
    # deeply through the floor
    assert h.min() > 0.3  # radius 0.5, some penetration allowed
    rebounds = np.sum((h[1:-1] < h[2:]) & (h[1:-1] < h[:-2]))
    assert rebounds >= 2
    # apex after first bounce is below the drop height (restitution < 1)
    first_min = np.argmin(h[:400])
    apex_after = h[first_min:].max()
    assert apex_after < 5.0
    assert np.isfinite(np.asarray(state2.pos)).all()


def test_config2_two_circle_elastic_collision():
    """Head-on equal-mass elastic collision approximately exchanges
    velocities (the Baumgarte term adds a small positional-correction
    impulse, so the exchange is approximate at shallow overlap)."""
    a = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(-2.0, 0.0), velocity=(1.0, 0.0), elasticity=1.0,
                friction=0.0)
    b = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(2.0, 0.0), velocity=(-1.0, 0.0), elasticity=1.0,
                friction=0.0)
    cfg = WorldConfig(dt=0.01, solver_mode="jacobi", solver_iterations=1)
    world, state = World.build([a, b], cfg)

    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            s, _c = world.step(s)
            return s, None

        return jax.lax.scan(f, state, None, length=n)[0]

    out = roll(state, 300)
    v = np.asarray(out.vel)
    # separated and moving apart with ~swapped velocities
    assert v[0, 0] < -0.8 and v[1, 0] > 0.8
    p = np.asarray(out.pos)
    assert p[0, 0] < p[1, 0]
    # momentum conserved exactly (impulses are equal and opposite)
    assert abs(v[0, 0] + v[1, 0]) < 1e-4


def test_config2_batched_vmap():
    """Batch of 64 two-circle worlds with varying approach speeds."""
    a = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(-2.0, 0.0), velocity=(1.0, 0.0), elasticity=1.0,
                friction=0.0)
    b = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(2.0, 0.0), velocity=(-1.0, 0.0), elasticity=1.0,
                friction=0.0)
    world, state0 = World.build([a, b], WorldConfig(dt=0.01))
    B = 64
    speeds = jnp.linspace(0.5, 2.0, B)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state0
    )
    batched = batched.replace(
        vel=batched.vel.at[:, 0, 0].set(speeds).at[:, 1, 0].set(-speeds)
    )

    step1 = lambda s: world.step(s)[0]

    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            return jax.vmap(step1)(s), None

        return jax.lax.scan(f, state, None, length=n)[0]

    out = roll(batched, 400)
    v = np.asarray(out.vel)
    assert (v[:, 0, 0] < 0).all() and (v[:, 1, 0] > 0).all()
    assert np.abs(v[:, 0, 0] + v[:, 1, 0]).max() < 1e-3


def test_polygon_rest_on_ground():
    """A box-shaped polygon dropped on the ground settles (config 3 core)."""
    square = polygon([(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)])
    body = BodyDef(shapes=[square], mass=1.0, inertia=0.2, position=(0.0, 2.0),
                   elasticity=0.0, friction=0.5)
    ground = BodyDef(shapes=[polygon([(-20.0, -2.0), (20.0, -2.0),
                                      (20.0, 0.0), (-20.0, 0.0)])],
                     mass=np.inf, inertia=np.inf, elasticity=0.0, friction=0.5)
    cfg = WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                      solver_mode="jacobi", solver_iterations=4)
    world, state = World.build([body, ground], cfg)

    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            s, _c = world.step(s)
            return s, None

        return jax.lax.scan(f, state, None, length=n)[0]

    out = roll(state, 800)
    p = np.asarray(out.pos)
    v = np.asarray(out.vel)
    # settled on the surface: center ~0.5 above ground, tiny velocity
    assert 0.3 < p[0, 1] < 0.8
    assert np.abs(v[0]).max() < 0.2
    assert np.isfinite(p).all()


def test_joint_keeps_bodies_attached():
    a = BodyDef(shapes=[circle(0.2)], mass=1.0, inertia=0.05,
                position=(0.0, 0.0), friction=0.0)
    b = BodyDef(shapes=[circle(0.2)], mass=1.0, inertia=0.05,
                position=(0.0, -1.0), friction=0.0)
    joints = Joints.make(
        body_a=[0], body_b=[1],
        anchor_a=np.array([[0.0, -0.5]]), anchor_b=np.array([[0.0, 0.5]]),
    )
    cfg = WorldConfig(dt=0.01, gravity=(0.0, -1.0))
    world, state = World.build([a, b], cfg, joints=joints,
                               collision_filter=[(0, 1)])
    # give body a an upward kick; joint should drag b along
    state = state.replace(vel=state.vel.at[0].set(jnp.array([0.0, 2.0])))

    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            s, _c = world.step(s)
            return s, None

        return jax.lax.scan(f, state, None, length=n)[0]

    out = roll(state, 500)
    p = np.asarray(out.pos)
    gap = np.linalg.norm(p[0] - p[1])
    assert gap < 2.0  # spring keeps them within reach (rest length 1)
    # the joint shares the kick: the pair's center of mass follows
    # y_cm(t) = v_cm t - t^2/2 with v_cm = 1 -> -7.5 at t=5; body b rides
    # well above its free-fall-from-rest height (-13.5)
    assert p[1, 1] > -10.0


def test_grad_through_step():
    """Differentiability: d(final height)/d(initial velocity) exists and is
    finite through contact events (BASELINE config 5 requirement)."""
    ball, ground = _ball_and_ground(e_ball=0.8)
    cfg = WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic")
    world, state0 = World.build([ball, ground], cfg)

    def final_height(v0):
        s = state0.replace(vel=state0.vel.at[0, 1].set(v0))

        def f(s, _):
            s, _c = world.step(s)
            return s, None

        out = jax.lax.scan(f, s, None, length=200)[0]
        return out.pos[0, 1]

    g = jax.grad(final_height)(jnp.array(-2.0))
    assert np.isfinite(np.asarray(g))
    assert abs(np.asarray(g)) > 1e-4


def test_random_one_per_body_mode_runs():
    a = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(-0.4, 0.0), velocity=(1.0, 0.0), elasticity=1.0)
    b = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                position=(0.4, 0.0), velocity=(-1.0, 0.0), elasticity=1.0)
    cfg = WorldConfig(dt=0.01, solver_mode="random_one_per_body")
    world, state = World.build([a, b], cfg)
    out, contacts = jax.jit(world.step)(state, key=jax.random.PRNGKey(0))
    assert bool(contacts.active.any())
    v = np.asarray(out.vel)
    assert np.isfinite(v).all()
    # overlapping and approaching -> velocities must change
    assert not np.allclose(v, np.asarray(state.vel))
