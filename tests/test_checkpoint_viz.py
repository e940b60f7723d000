"""Checkpoint/restore round-trip and renderer smoke tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.utils import checkpoint as ckpt
from parallax_tpu.viz import Renderer


def test_checkpoint_round_trip():
    env = LunarLander()
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(env.reset)(keys)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt1")
        ckpt.save(path, states)
        restored = ckpt.restore(path, states)

    for a, b in zip(
        jax.tree_util.tree_leaves(states), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_identically():
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    action = jnp.array([0.3, 0.0])
    for _ in range(3):
        state, _ = step(state, action)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt2")
        ckpt.save(path, state)
        restored = ckpt.restore(path, state)

    s1, _ = step(state, action)
    s2, _ = step(restored, action)
    np.testing.assert_array_equal(
        np.asarray(s1.bodies.pos), np.asarray(s2.bodies.pos)
    )


def test_renderer_draws_lander():
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(0))
    r = Renderer(width=160, height=120)
    frame = r.render_env(env, state)
    assert frame.shape == (120, 160, 3)
    assert frame.max() > 0  # something was drawn


def test_renderer_bbox_and_offscreen():
    """Primitives rasterize only their pixel bbox and clamp off-screen
    cleanly (Renderer used to touch O(W*H) pixels per primitive)."""
    import numpy as np

    r = Renderer(width=100, height=80, extent=(-1.0, 1.0, -0.8, 0.8))
    f = r.blank()
    r.draw_circle(f, (0.0, 0.0), 0.1, color=(255, 0, 0))
    painted = (f[..., 0] > 0).sum()
    # a 0.1-radius circle covers ~pi*(rpx)^2 ~ 77 px, nowhere near the frame
    assert 0 < painted < 200
    # partially off-screen circle / polygon: no crash, clamped
    r.draw_circle(f, (1.05, 0.0), 0.2, color=(0, 255, 0))
    r.draw_polygon(f, [(-1.3, -0.2), (-0.9, -0.2), (-0.9, 0.2), (-1.3, 0.2)],
                   color=(0, 0, 255))
    assert (f[..., 1] > 0).any() and (f[..., 2] > 0).any()
    # fully off-screen: silently nothing
    g = r.blank()
    r.draw_circle(g, (5.0, 5.0), 0.2)
    r.draw_polygon(g, [(3.0, 3.0), (4.0, 3.0), (3.5, 4.0)])
    assert g.max() == 0
    # winding-independent fill: CW and CCW vertex orders paint identically
    a, b = r.blank(), r.blank()
    quad = [(-0.2, -0.2), (0.2, -0.2), (0.2, 0.2), (-0.2, 0.2)]
    r.draw_polygon(a, quad)
    r.draw_polygon(b, quad[::-1])
    assert (a == b).all() and a.max() > 0


def test_checkpoint_sharded_fleet_resume():
    """Checkpoint/resume x the worlds mesh (the fleet deployment): a
    SHARDED batch saves, restores onto the mesh with its sharding pinned by
    the target, and the resumed rollout is bitwise identical to the
    uninterrupted one."""
    from parallax_tpu.parallel.mesh import make_world_mesh, shard_batch

    env = LunarLander()
    mesh = make_world_mesh()
    B = 8 * 3
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(2), B))
    states = shard_batch(states, mesh)

    def policy(_, obs):
        return jnp.tile(jnp.array([0.4, 0.0]), (obs.shape[0], 1))

    roll = jax.jit(lambda s: env.rollout_batch(s, policy, 5))
    mid, _ = roll(states)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ckpt3")
        ckpt.save(path, mid)
        restored = ckpt.restore(path, mid)

    # the restore came back sharded over the mesh (target pins shardings)
    assert len(restored.bodies.pos.sharding.device_set) == 8

    cont, traj_a = roll(mid)
    resu, traj_b = roll(restored)
    np.testing.assert_array_equal(
        np.asarray(cont.bodies.pos), np.asarray(resu.bodies.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(traj_a.reward), np.asarray(traj_b.reward)
    )
