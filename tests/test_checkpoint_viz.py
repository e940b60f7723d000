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
