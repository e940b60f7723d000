"""Batch-minor fast path vs vmapped reference path equivalence."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.engine.batched import collide_batched, step_batched, _to_soa
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.envs.lunar_lander import (
    LunarLander,
    terrain_vertices,
    terrain_vertices_batch,
)
from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig
from parallax_tpu.geometry.shapes import box, circle, polygon


def _mixed_world():
    square = polygon([(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)])
    tri = polygon([(-0.4, -0.3), (0.5, -0.2), (0.0, 0.5)])
    bodies = [
        BodyDef(shapes=[square], mass=1.0, inertia=0.2, position=(0.0, 2.0),
                angle=0.2, elasticity=0.3, friction=0.5),
        BodyDef(shapes=[tri], mass=1.5, inertia=0.3, position=(0.4, 3.0),
                angle=-0.4, elasticity=0.2, friction=0.4),
        BodyDef(shapes=[circle(0.3)], mass=0.8, inertia=0.05,
                position=(-0.5, 4.0), elasticity=0.6, friction=0.3),
        BodyDef(shapes=[circle(0.25)], mass=0.5, inertia=0.04,
                position=(0.6, 4.5), elasticity=0.9, friction=0.2),
        BodyDef(shapes=[box((-6.0, -2.0), (6.0, 0.0))], mass=np.inf,
                inertia=np.inf, elasticity=0.1, friction=0.6),
        BodyDef(shapes=[polygon([(-6.0, 0.0), (-5.0, 0.0), (-5.0, 4.0),
                                 (-6.0, 4.0)])], mass=np.inf, inertia=np.inf,
                elasticity=0.1, friction=0.6),
    ]
    return World.build(
        bodies,
        WorldConfig(dt=0.01, gravity=(0.0, -9.8), integrator="symplectic",
                    solver_iterations=8),
    )


def _random_batch(world, st0, B=32, seed=0):
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), st0
    )
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    mv = jnp.isfinite(world.params.mass)
    return batched.replace(
        pos=batched.pos + jax.random.normal(k1, (B, world.n_bodies, 2)) * 0.3 * mv[:, None],
        vel=batched.vel + jax.random.normal(k2, (B, world.n_bodies, 2)) * 1.0 * mv[:, None],
        angle=batched.angle + jax.random.normal(k3, (B, world.n_bodies)) * 0.3 * mv,
        omega=batched.omega + jax.random.normal(k4, (B, world.n_bodies)) * 1.0 * mv,
    )


def test_contacts_match_vmapped():
    world, st0 = _mixed_world()
    batched = _random_batch(world, st0)
    cv = jax.jit(jax.vmap(world.detect_contacts))(batched)
    cb = jax.jit(lambda st: collide_batched(world, _to_soa(st)))(batched)
    act_v = np.asarray(cv.active)
    act_b = np.asarray(cb.active).T
    assert (act_v == act_b).all()
    both = act_v & act_b
    pen_b = np.stack([np.asarray(cb.pen_x).T, np.asarray(cb.pen_y).T], -1)
    pt_b = np.stack([np.asarray(cb.pt_x).T, np.asarray(cb.pt_y).T], -1)
    assert np.abs(np.asarray(cv.penetration) - pen_b)[both].max() < 1e-5
    assert np.abs(np.asarray(cv.point) - pt_b)[both].max() < 1e-5
    assert np.abs(np.asarray(cv.weight) - np.asarray(cb.weight).T)[both].max() < 1e-6


def test_step_matches_vmapped():
    world, st0 = _mixed_world()
    batched = _random_batch(world, st0)
    a = jax.jit(jax.vmap(lambda s: world.step(s)[0]))(batched)
    b = jax.jit(lambda st: step_batched(world, st)[0])(batched)
    assert np.abs(np.asarray(a.pos) - np.asarray(b.pos)).max() < 1e-5
    assert np.abs(np.asarray(a.vel) - np.asarray(b.vel)).max() < 1e-4
    assert np.abs(np.asarray(a.omega) - np.asarray(b.omega)).max() < 1e-3


def test_lander_env_batched_matches():
    env = LunarLander()
    B = 12
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(env.reset)(keys)
    acts = jnp.tile(jnp.array([0.4, 0.05]), (B, 1))
    x1, t1 = jax.jit(jax.vmap(env.step))(states, acts)
    x2, t2 = jax.jit(env.step_batch)(states, acts)
    assert np.abs(np.asarray(t1.obs) - np.asarray(t2.obs)).max() < 1e-5
    assert np.abs(np.asarray(x1.bodies.pos) - np.asarray(x2.bodies.pos)).max() < 1e-5
    assert (np.asarray(t1.done) == np.asarray(t2.done)).all()


def test_lander_terrain_batch_bit_identical():
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    ref = jax.vmap(lambda k: terrain_vertices(k).reshape(-1))(keys)
    got = terrain_vertices_batch(keys)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_lander_batched_reset_matches_vmap():
    env = LunarLander()
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    a = jax.vmap(env.reset_fn)(keys)
    b = env.reset_fn_batch(keys)
    np.testing.assert_array_equal(np.asarray(a.terrain), np.asarray(b.terrain))
    np.testing.assert_array_equal(np.asarray(a.key), np.asarray(b.key))
    np.testing.assert_allclose(
        np.asarray(a.prev_shaping), np.asarray(b.prev_shaping), atol=1e-6
    )


def test_robocup_env_batched_matches():
    env = RoboCup(RoboCupConfig(n_robots_per_team=2))
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.vmap(env.reset)(keys)
    acts = jnp.zeros((B, env.action_size)).at[:, 0].set(1.0)
    x1, t1 = jax.jit(jax.vmap(env.step))(states, acts)
    x2, t2 = jax.jit(env.step_batch)(states, acts)
    assert np.abs(np.asarray(t1.obs) - np.asarray(t2.obs)).max() < 1e-5
    assert np.abs(np.asarray(x1.bodies.pos) - np.asarray(x2.bodies.pos)).max() < 1e-5


def test_grad_through_batched_step():
    env = LunarLander()
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = env.reset_fn_batch(keys)

    def mean_height(throttle):
        acts = jnp.tile(jnp.stack([throttle, jnp.zeros(())]), (B, 1))

        def f(c, _):
            c, ts = env.step_batch(c, acts)
            return c, None

        out = jax.lax.scan(f, states, None, length=20)[0]
        return out.bodies.pos[:, 0, 1].mean()

    g = jax.grad(mean_height)(jnp.asarray(0.5))
    assert np.isfinite(np.asarray(g))
    assert float(g) > 0  # more thrust -> higher


def test_grad_through_rollout_batch():
    """Differentiability of the plane-space fast path (policy-gradient
    through the physics over the rollout scan)."""
    env = LunarLander()
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def mean_return(theta):
        def policy(_, obs):
            return jnp.tile(jnp.stack([theta, jnp.zeros(())]), (obs.shape[0], 1))

        _, traj = env.rollout_batch(states, policy, 20)
        return traj.reward.mean()

    g = jax.grad(mean_return)(jnp.asarray(0.4))
    assert np.isfinite(np.asarray(g))
    assert abs(float(g)) > 1e-6


def test_chunked_rollout_matches_unchunked():
    """Large batches run as sequential lax.map waves (parallel.rollout.
    chunked_rollout); worlds are independent so per-world results must be
    bitwise identical to the single-wave rollout, in the same order."""
    env = LunarLander()
    B = 8
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(3), B))

    def policy(_, obs):
        a = jnp.stack([obs[:, 1] * 0.1 + 0.4, obs[:, 0] * 0.05], axis=-1)
        return a

    fin_a, traj_a = jax.jit(
        lambda s: env.rollout_batch(s, policy, 25, max_chunk=0)
    )(states)
    fin_b, traj_b = jax.jit(
        lambda s: env.rollout_batch(s, policy, 25, max_chunk=4)
    )(states)
    for xa, xb in zip(jax.tree_util.tree_leaves(fin_a),
                      jax.tree_util.tree_leaves(fin_b)):
        assert xa.shape == xb.shape
        assert (np.asarray(xa) == np.asarray(xb)).all()
    # reward/termination are bitwise; obs alone may differ ~1 ULP (XLA
    # duplicates state math into the obs path and fuses it differently
    # per program shape, e.g. fma vs mul+add on the damped omega)
    assert (np.asarray(traj_a.reward) == np.asarray(traj_b.reward)).all()
    assert (np.asarray(traj_a.terminated) == np.asarray(traj_b.terminated)).all()
    assert (np.asarray(traj_a.truncated) == np.asarray(traj_b.truncated)).all()
    np.testing.assert_allclose(
        np.asarray(traj_a.obs), np.asarray(traj_b.obs), atol=1e-8
    )

    # non-divisible batches run full waves plus a REMAINDER wave (never one
    # giant wave): B=8, chunk=3 -> waves [3,3] + tail [2], still bitwise on
    # final state and reward per world, original order preserved
    fin_c, traj_c = jax.jit(
        lambda s: env.rollout_batch(s, policy, 25, max_chunk=3)
    )(states)
    for xa, xc in zip(jax.tree_util.tree_leaves(fin_a),
                      jax.tree_util.tree_leaves(fin_c)):
        assert xa.shape == xc.shape
        assert (np.asarray(xa) == np.asarray(xc)).all()
    assert (np.asarray(traj_a.reward) == np.asarray(traj_c.reward)).all()


def test_grad_through_chunked_rollout():
    env = LunarLander()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), 8))

    def mean_return(theta):
        def policy(_, obs):
            return jnp.tile(jnp.stack([theta, jnp.zeros(())]), (obs.shape[0], 1))

        _, traj = env.rollout_batch(states, policy, 15, max_chunk=4)
        return traj.reward.mean()

    g = jax.grad(mean_return)(jnp.asarray(0.4))
    assert np.isfinite(np.asarray(g))
    assert abs(float(g)) > 1e-6


def test_terrain_candidates_match_full_table():
    """The candidate world (per-body K-segment windows, LanderConfig.
    terrain_candidates) must produce the same physics as colliding against
    all 7 segments: every possibly-active contact is inside its body's
    window by the circumradius/segment-width argument, so only inactive
    lanes differ.  Paired steps from identical states, resynced each step,
    with the fleet scattered across the full terrain (incl. deep ground
    penetration) would expose any fall-through."""
    from parallax_tpu.envs.lunar_lander import LanderConfig

    env_c = LunarLander(LanderConfig(terrain_candidates=True))
    env_f = LunarLander()
    assert env_c._use_candidates and not env_f._use_candidates
    assert env_c._bm_world.table.n_contacts < env_f._bm_world.table.n_contacts

    B = 64
    states = env_c.reset_fn_batch(jax.random.split(jax.random.PRNGKey(11), B))
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    # shift each whole lander assembly (keep joints intact) across the
    # terrain: x in [-11.5, 11.5] sweeps every segment incl. boundaries,
    # y down to below ground level for deep-penetration lanes
    off = jnp.stack(
        [jax.random.uniform(k1, (B,), minval=-11.5, maxval=11.5),
         jax.random.uniform(k2, (B,), minval=-8.0, maxval=2.0)],
        axis=-1,
    )
    bodies = states.bodies.replace(
        pos=states.bodies.pos + off[:, None, :],
        vel=states.bodies.vel + jnp.asarray([0.0, -2.0]),
    )
    states = states.replace(bodies=bodies)

    acts = jnp.zeros((B, 2))
    step_c = jax.jit(env_c.step_batch)
    step_f = jax.jit(env_f.step_batch)
    any_contact = False
    for _ in range(60):
        sc, tc = step_c(states, acts)
        sf, tf = step_f(states, acts)
        np.testing.assert_allclose(
            np.asarray(sc.bodies.pos), np.asarray(sf.bodies.pos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sc.bodies.vel), np.asarray(sf.bodies.vel), atol=1e-4
        )
        assert (
            np.asarray(sc.leg_contacts) == np.asarray(sf.leg_contacts)
        ).all()
        any_contact = any_contact or bool(np.asarray(sc.leg_contacts).any())
        states = sc  # resync both paths on the candidate trajectory
    assert any_contact, "the fleet must actually touch the terrain"


def test_override_side_keeps_movable_parts_world_frame():
    """Round-4 bug fix: when a terrain override is active for a side, the
    side's NON-override parts (the lander's hull/legs in the hull-leg
    pairs) must still be world-frame transformed.  They used to get their
    LOCAL vertices broadcast — no rotation, no body position — so a leg
    shoved into the hull produced no contact on the override path while
    the static-table path (correct frames) found one."""
    from parallax_tpu.engine.batched import collide_batched
    from parallax_tpu.envs.lunar_lander import LunarLander

    env = LunarLander()
    B = 2
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    ps = env._to_planes(states)
    s, aux = ps.s, ps.aux
    w = env._bm_world

    # force leg (body 1) into the hull (body 0)
    s2 = s._replace(px=s.px.at[1].set(s.px[0]), py=s.py.at[1].set(s.py[0]))
    override = {
        p: (aux.tox[i], aux.toy[i]) for i, p in enumerate(env._ground_parts)
    }
    con_o = collide_batched(w, s2, override)
    con_n = collide_batched(w, s2, None)
    act_o = np.asarray(con_o.active)
    act_n = np.asarray(con_n.active)
    # hull-leg pair (0,1) owns lanes 0-1; both paths must agree it is active
    assert act_n[:2].any(axis=0).all()
    np.testing.assert_array_equal(act_o[:2], act_n[:2])
    # and the hull-leg contact geometry must be identical (same frames)
    np.testing.assert_array_equal(
        np.asarray(con_o.pen_x[:2]), np.asarray(con_n.pen_x[:2])
    )
    np.testing.assert_array_equal(
        np.asarray(con_o.pt_x[:2]), np.asarray(con_n.pt_x[:2])
    )
