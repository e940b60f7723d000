"""Generic plane-space driver (envs/plane_env.py) + the Bouncer toy env.

The three shipping envs' bitwise equivalence to their pre-refactor bespoke
rollouts was verified at refactor time; their behavior is permanently
pinned by tests/test_batched_engine.py (batched ≡ vmapped) and
tests/test_golden_parity.py.  This file covers the driver's generic
machinery through an env that defines ONLY World + thrust + reward hooks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.envs.bouncer import Bouncer, BouncerConfig


def _policy(_, obs):
    t = jnp.sum(obs, axis=-1, keepdims=True)
    return 0.8 * jnp.sin(t + jnp.arange(2, dtype=jnp.float32)[None])


def test_bouncer_generic_rollout():
    env = Bouncer()
    B = 16
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    fin, traj = jax.jit(lambda s: env.rollout_batch(s, _policy, 50))(states)
    assert traj.obs.shape == (50, B, env.observation_size)
    assert np.isfinite(np.asarray(traj.obs)).all()
    assert np.isfinite(np.asarray(traj.reward)).all()
    # balls stay inside the walls (containment through the generic physics)
    n = env.config.n_balls
    px = np.asarray(traj.obs)[..., :n]
    assert (np.abs(px) < 2.5).all()
    # ball 0 actually moves (thrust hook wired)
    assert np.abs(np.asarray(fin.bodies.vel[:, 0])).max() > 1e-3


def test_bouncer_default_watchdog_and_reset():
    """max_steps truncation + auto-reset come from the generic driver."""
    env = Bouncer(BouncerConfig(max_steps=7))
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(1), B))
    _, traj = jax.jit(lambda s: env.rollout_batch(s, _policy, 20))(states)
    trunc = np.asarray(traj.truncated)
    assert trunc[6].all() and not trunc[:6].any()  # t hits 7 on step index 6
    assert trunc[13].all()  # reset counters: next truncation 7 steps later


def test_bouncer_chunked_waves_match():
    env = Bouncer()
    B = 10  # 3 full waves of 3 + remainder wave of 1
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(2), B))
    f1, t1 = jax.jit(lambda s: env.rollout_batch(s, _policy, 12))(states)
    f2, t2 = jax.jit(lambda s: env.rollout_batch(s, _policy, 12, max_chunk=3))(states)
    # the physics state is bitwise across wave shapes; derived scalars that
    # XLA fuses differently per program shape (sqrt in the reward) may move
    # ~1 ULP (same caveat as test_batched_engine's chunk test for obs)
    for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(f2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(t1.reward), np.asarray(t2.reward), rtol=0, atol=1e-6
    )


def test_bouncer_vmapped_path_agrees_physically():
    """The vmapped public API and the plane driver see the same physics:
    identical single-step velocity update for the same action."""
    env = Bouncer()
    s0 = env.reset_fn(jax.random.PRNGKey(3))
    act = jnp.array([0.5, -0.25])
    s1, _ = jax.jit(env.step_fn)(s0, act)

    B = 2
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(3), B))
    ps = env._to_planes(states)
    ps2, _ = env._step_planes(ps, jnp.tile(act[None], (B, 1)))
    st2 = env._from_planes(ps2)
    np.testing.assert_allclose(
        np.asarray(st2.bodies.vel[0]), np.asarray(s1.bodies.vel), rtol=0, atol=0
    )


def test_bouncer_reward_grad_finite_at_origin():
    """The reward -|pos| attracts ball 0 to the origin — the singular
    point of jnp.linalg.norm's reverse-mode gradient.  Both the vmapped
    and plane-space reward paths must use safe_norm so differentiating a
    rollout with the ball exactly at (0, 0) stays finite."""
    env = Bouncer()
    s0 = env.reset_fn(jax.random.PRNGKey(0))
    s0 = s0.replace(bodies=s0.bodies.replace(pos=s0.bodies.pos.at[0].set(jnp.zeros(2))))

    def rew(pos0):
        s = s0.replace(bodies=s0.bodies.replace(pos=s0.bodies.pos.at[0].set(pos0)))
        _, ts = env.step_fn(s, jnp.zeros(2))
        return ts.reward

    g = jax.grad(rew)(jnp.zeros(2))
    assert np.isfinite(np.asarray(g)).all()

    # plane-space path: grad of one scanned step w.r.t. batched positions
    B = 2
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    states = states.replace(
        bodies=states.bodies.replace(pos=states.bodies.pos.at[:, 0].set(0.0))
    )

    def batch_rew(pos):
        s = states.replace(bodies=states.bodies.replace(pos=pos))
        ps = env._to_planes(s)
        _, ts = env._step_planes(ps, jnp.zeros((B, 2)))
        return ts.reward.sum()

    gb = jax.grad(batch_rew)(states.bodies.pos)
    assert np.isfinite(np.asarray(gb)).all()


def test_aux_nan_watchdog_truncates_same_step():
    """A NaN born in an AUX plane — not a body plane — must truncate that
    world the same step and auto-reset it (round-3 VERDICT weak #5: the
    watchdog used to scan body planes only, so a poisoned aux leaked NaN
    observations/rewards until it reached a body plane — prev_shaping never
    does, it only contaminates the reward, forever)."""
    from parallax_tpu.envs.lunar_lander import LunarLander

    env = LunarLander()
    B = 4
    w = 2  # the poisoned world
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    states = states.replace(
        prev_shaping=states.prev_shaping.at[w].set(jnp.nan)
    )

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    final, traj = jax.jit(lambda s: env.rollout_batch(s, policy, 3))(states)
    trunc = np.asarray(traj.truncated)
    # same-step truncation, only for the poisoned world
    assert trunc[0, w]
    assert not trunc[0, [i for i in range(B) if i != w]].any()
    # the poisoned emission is sanitized (zeroed), never a NaN on the wire
    r = np.asarray(traj.reward)
    assert np.isfinite(r).all() and r[0, w] == 0.0
    assert np.isfinite(np.asarray(traj.obs)).all()
    # the auto-reset wiped the poison: later steps are clean
    assert not trunc[1:].any()
    assert np.isfinite(np.asarray(final.prev_shaping)).all()
    assert np.isfinite(np.asarray(final.bodies.pos)).all()


def test_terrain_nan_watchdog_truncates_same_step():
    """A NaN in a PERSISTENT aux plane (the lander's terrain vertices) is
    caught by the aux scan the same step — before any contact propagates it
    into a body plane — and the reset regenerates finite terrain."""
    from parallax_tpu.envs.lunar_lander import LunarLander

    env = LunarLander()
    B = 4
    w = 1
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    states = states.replace(terrain=states.terrain.at[w, 0].set(jnp.nan))

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    final, traj = jax.jit(lambda s: env.rollout_batch(s, policy, 3))(states)
    trunc = np.asarray(traj.truncated)
    assert trunc[0, w]
    assert not trunc[0, [i for i in range(B) if i != w]].any()
    assert not trunc[1:].any()
    assert np.isfinite(np.asarray(traj.reward)).all()
    assert np.isfinite(np.asarray(traj.obs)).all()
    assert np.isfinite(np.asarray(final.terrain)).all()


def test_info_channel_sanitized_for_poisoned_world():
    """A state NaN must not leak into traj.info either: info leaves feed
    fleet metrics reductions (mean ball_speed/fuel), so one poisoned world
    would NaN the aggregate through the info channel even with reward/obs
    zeroed.  Poison a ball velocity in RoboCup: info["ball_speed"] is a
    sqrt of it and goes NaN the same step unless the watchdog zeroes it."""
    from parallax_tpu.envs.robocup import RoboCup

    env = RoboCup()
    B = 4
    w = 3
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    bi = env.ball_idx
    states = states.replace(
        bodies=states.bodies.replace(
            vel=states.bodies.vel.at[w, bi, 0].set(jnp.nan)
        )
    )

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], env.action_size), jnp.float32)

    final, traj = jax.jit(lambda s: env.rollout_batch(s, policy, 3))(states)
    trunc = np.asarray(traj.truncated)
    assert trunc[0, w]
    assert not trunc[0, [i for i in range(B) if i != w]].any()
    # every float info leaf is finite on the wire, and the flagged world's
    # entries are exactly zero
    for name, leaf in traj.info.items():
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        assert np.isfinite(arr).all(), name
        assert (arr[0, w] == 0.0).all(), name
    # the reset wiped the poison
    assert not trunc[1:].any()
    assert np.isfinite(np.asarray(final.bodies.vel)).all()
