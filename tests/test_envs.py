"""Environment-level tests: LunarLander and RoboCup end-to-end."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.envs.base import ConstantControl, Judge, evaluate
from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander, terrain_vertices
from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig


# ---------------------------------------------------------------------------
# LunarLander
# ---------------------------------------------------------------------------


def test_terrain_reference_structure():
    """Terrain parity with the reference sampler (_lunar_lander.py:108-132):
    fixed pad segment between x=-2..2 at height -2, 7 segments spanning
    x=-100..100, deterministic per key."""
    t1 = np.asarray(terrain_vertices(jax.random.PRNGKey(0)))
    t2 = np.asarray(terrain_vertices(jax.random.PRNGKey(0)))
    t3 = np.asarray(terrain_vertices(jax.random.PRNGKey(1)))
    assert np.array_equal(t1, t2)
    assert not np.array_equal(t1, t3)
    assert t1.shape[0] == 7
    xs = t1[..., 0]
    assert xs.min() == -100.0 and xs.max() == 100.0
    # the pad segment has top corners (±2, -2)
    pad = t1[3]
    tops = pad[pad[:, 1] > -9.0]  # top vertices of the quad
    assert np.allclose(sorted(tops[:, 0].tolist())[0], -2.0)
    assert np.allclose(np.unique(np.round(tops[:, 1], 5)), [-2.0])


def test_lander_reset_step_finite():
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(5):
        action = jnp.array([0.5, 0.1])
        state, ts = step(state, action)
        assert np.isfinite(np.asarray(ts.obs)).all()
        assert np.isfinite(float(ts.reward))


def test_lander_free_fall_terminates_and_autoresets():
    """With engines off the lander falls to the terrain and the episode
    ends (landed or crashed) well before the step limit; auto-reset then
    restores altitude."""
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(3))

    @partial(jax.jit, static_argnums=2)
    def roll(state, action, n):
        def f(carry, _):
            s, done_seen, t_at_done = carry
            s, ts = env.step(s, action)
            first = ts.done & ~done_seen
            t_at_done = jnp.where(first, s.t, t_at_done)
            return (s, done_seen | ts.done, t_at_done), ts.done

        return jax.lax.scan(f, (state, jnp.array(False), jnp.zeros((), jnp.int32)), None, length=n)

    (state2, done_seen, _), dones = roll(state, jnp.zeros(2), 900)
    assert bool(done_seen), "episode never terminated under free fall"
    # after auto-reset the lander is back near the spawn height
    assert float(state2.bodies.pos[0, 1]) > 0.0 or bool(dones[-1])


def test_lander_batched():
    env = LunarLander()
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.tile(jnp.array([0.6, 0.0]), (B, 1))
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        states, ts = step(states, actions)
    assert ts.obs.shape == (B, env.observation_size)
    assert np.isfinite(np.asarray(ts.obs)).all()
    # different keys -> different terrains
    assert not np.allclose(np.asarray(states.terrain[0]), np.asarray(states.terrain[1]))


def test_lander_hover_thrust_counteracts_gravity():
    """Full main throttle (accel 0.5) exceeds gravity (0.2): the lander
    must gain upward velocity."""
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(50):
        state, ts = step(state, jnp.array([1.0, 0.0]))
    assert float(state.bodies.vel[0, 1]) > 0.0


# ---------------------------------------------------------------------------
# RoboCup
# ---------------------------------------------------------------------------


def test_robocup_ball_stays_in_field():
    env = RoboCup(RoboCupConfig(n_robots_per_team=2, randomize_ball=False))
    state = env.reset(jax.random.PRNGKey(0))
    # fire the ball toward a corner, no robot action
    state = state.replace(
        bodies=state.bodies.replace(
            vel=state.bodies.vel.at[env.ball_idx].set(jnp.array([3.0, 2.7]))
        )
    )
    zero = jnp.zeros(env.action_size)

    @partial(jax.jit, static_argnums=1)
    def roll(state, n):
        def f(s, _):
            s, ts = env.step(s, zero)
            return s, s.bodies.pos[env.ball_idx]

        return jax.lax.scan(f, state, None, length=n)

    state2, traj = roll(state, 1500)
    p = np.asarray(traj)
    assert np.isfinite(p).all()
    assert np.abs(p[:, 0]).max() < 5.4  # stayed within the field (x half = 5.2)
    assert np.abs(p[:, 1]).max() < 3.9  # y half = 3.7
    # it actually bounced (x velocity changed sign at least once)
    assert (np.diff(np.sign(np.diff(p[:, 0]))) != 0).any()


def test_robocup_goal_detection():
    env = RoboCup(RoboCupConfig(n_robots_per_team=1, randomize_ball=False))
    state = env.reset(jax.random.PRNGKey(0))
    # ball sprinting straight into the yellow goal mouth (-x)
    state = state.replace(
        bodies=state.bodies.replace(
            pos=state.bodies.pos.at[env.ball_idx].set(jnp.array([-4.0, 0.0])),
            vel=state.bodies.vel.at[env.ball_idx].set(jnp.array([-2.0, 0.0])),
        )
    )
    zero = jnp.zeros(env.action_size)
    step = jax.jit(env.step)
    got_reward = 0.0
    terminated = False
    for _ in range(200):
        state, ts = step(state, zero)
        got_reward += float(ts.reward)
        if bool(ts.terminated):
            terminated = True
            break
    assert terminated, "ball into the goal mouth must terminate the episode"
    assert got_reward > 0.5  # blue scored on yellow goal


def test_robocup_robots_track_velocity_commands():
    env = RoboCup(RoboCupConfig(n_robots_per_team=1, randomize_ball=False))
    state = env.reset(jax.random.PRNGKey(0))
    action = jnp.zeros((env.n_robots, 3)).at[0, 0].set(-1.0)  # blue robot: go -x
    step = jax.jit(env.step)
    x0 = float(state.bodies.pos[env.robot_idx[0], 0])
    for _ in range(100):
        state, ts = step(state, action.reshape(-1))
    x1 = float(state.bodies.pos[env.robot_idx[0], 0])
    assert x1 < x0 - 0.3
    vx = float(state.bodies.vel[env.robot_idx[0], 0])
    assert abs(vx - (-1.0)) < 0.1  # tracked the command


def test_robocup_batched():
    env = RoboCup(RoboCupConfig(n_robots_per_team=2))
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.zeros((B, env.action_size))
    step = jax.jit(jax.vmap(env.step))
    states, ts = step(states, actions)
    assert ts.obs.shape == (B, env.observation_size)
    assert np.isfinite(np.asarray(ts.obs)).all()


# ---------------------------------------------------------------------------
# Continuous-time evaluation (reference semantics)
# ---------------------------------------------------------------------------


def test_continuous_time_evaluate():
    """The reference's NFE/WFE loop (_envs.py:37-132) over a trivial world:
    integrate x' = u with u = 1; reward = x; done when x >= 1."""

    class XJudge(Judge):
        def reward(self, state, u):
            return state

        def is_done(self, state, u):
            return state >= 1.0

        def end_reward(self, state, u):
            return jnp.where(state >= 1.0, 10.0, 0.0)

    def forward(state, u, dt):
        return state + u * dt

    final, reward = evaluate(
        forward,
        jnp.array(0.0),
        ConstantControl(jnp.array(1.0)),
        XJudge(),
        eval_period=2.0,
        num_nfes=20,
        wfe_scale=10,
    )
    # x hits 1.0 at t=1.0 and freezes there with the +10 end reward;
    # integral of x dt from 0..1 = 0.5
    assert abs(float(final) - 1.0) < 0.05
    assert 10.0 < float(reward) < 11.0


def test_continuous_time_evaluate_lander():
    """The reference NFE/WFE loop over the real LunarLander with a concrete
    Control and Judge (reference classes had no concrete subclasses)."""
    from parallax_tpu.envs.lunar_lander import LanderJudge, make_world_forward

    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(0))
    judge = LanderJudge(env, state.terrain)
    forward = make_world_forward(env, state.terrain)
    control = ConstantControl(jnp.array([0.0, 0.0]))  # engines off
    # drift out of bounds: deterministic terminal (|x| > out_x crashes)
    bodies = state.bodies.replace(
        vel=state.bodies.vel + jnp.asarray([[4.0, 0.0]] * 4)
    )

    final, reward = jax.jit(
        lambda b: evaluate(forward, b, control, judge, eval_period=8.0,
                           num_nfes=40, wfe_scale=10)
    )(bodies)
    assert np.isfinite(float(reward))
    assert np.isfinite(np.asarray(final.pos)).all()
    done = bool(jax.jit(judge.is_done)(final, jnp.zeros(2)))
    assert done, "continuous-time eval should reach a terminal state"
    # terminal penalty included and state frozen at the boundary
    assert float(reward) < -50.0
    assert abs(float(final.pos[0, 0])) >= env.config.out_x - 1.0


def test_leg_contact_obs_consistency():
    """Leg-contact flags live in the state: ``observe(state)`` == the
    TimeStep.obs a policy would act on, and the rollout fast path feeds the
    policy the previous step's contacts (no train/deploy obs mismatch)."""
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(1))
    # teleport just above the pad so the legs touch within a few steps
    shift = jnp.asarray([[0.0, 6.0]] * 3 + [[0.0, 0.0]])
    state = state.replace(bodies=state.bodies.replace(pos=state.bodies.pos - shift))
    step = jax.jit(env.step)
    touched = False
    for _ in range(300):
        state, ts = step(state, jnp.zeros(2))
        if bool(ts.done):
            break
        if float(np.asarray(ts.obs)[7]) or float(np.asarray(ts.obs)[8]):
            touched = True
            # state-held flags == TimeStep.obs flags
            np.testing.assert_array_equal(
                np.asarray(env.observe(state))[7:9], np.asarray(ts.obs)[7:9]
            )
            break
    assert touched, "lander never touched down in 300 steps"

    # fast path: obs seen by the policy at step t+1 == traj.obs[t] leg flags
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    shift_b = jnp.asarray([[0.0, 6.2]] * 3 + [[0.0, 0.0]])[None]
    fall = jnp.asarray([[0.0, -1.5]] * 3 + [[0.0, 0.0]])[None]
    states = states.replace(
        bodies=states.bodies.replace(
            pos=states.bodies.pos - shift_b,
            vel=states.bodies.vel + fall,
        )
    )
    seen = []

    def spy_policy(_, obs):
        seen.append(obs)
        return jnp.zeros((obs.shape[0], 2))

    with jax.disable_jit():
        _, traj = env.rollout_batch(states, spy_policy, 30)
    seen_legs = np.stack([np.asarray(o)[:, 7:9] for o in seen])  # [T, B, 2]
    traj_legs = np.asarray(traj.obs)[:, :, 7:9]
    done = np.asarray(traj.done)
    # wherever step t didn't reset, policy obs at t+1 must equal ts.obs at t
    for t in range(29):
        live = ~done[t]
        np.testing.assert_array_equal(seen_legs[t + 1][live], traj_legs[t][live])
    assert traj_legs.any(), "no leg contact seen in the batched drop"


def test_robocup_continuous_eval_goal():
    """Continuous-time NFE/WFE evaluation on RoboCup: a shot into the +x
    goal terminates with the yellow-scored end reward (judge mirrors
    step_fn's sign convention)."""
    from parallax_tpu.envs.base import ConstantControl, evaluate
    from parallax_tpu.envs.robocup import (
        RoboCup,
        RoboCupConfig,
        RoboCupJudge,
        make_world_forward,
    )

    env = RoboCup(RoboCupConfig(n_robots_per_team=1, randomize_ball=False))
    s = env.reset(jax.random.PRNGKey(0))
    # off-axis so the shot clears the robot spawns at (±1, 0)
    b = s.bodies.replace(
        pos=s.bodies.pos.at[env.ball_idx].set(jnp.asarray([0.0, 0.3])),
        vel=s.bodies.vel.at[env.ball_idx].set(jnp.asarray([4.0, 0.0])),
    )
    judge = RoboCupJudge(env)
    fwd = make_world_forward(env)
    ctrl = ConstantControl(jnp.zeros(env.action_size))
    final, r = jax.jit(lambda bb: evaluate(fwd, bb, ctrl, judge, 4.0, 40, 10))(b)
    assert bool(jax.jit(judge.is_done)(final, jnp.zeros(env.action_size)))
    # end reward -goal_reward (yellow goal) dominates the small shaping term
    assert -1.2 < float(r) < -0.8
    # blocked shot: straight at the yellow robot -> no goal
    b2 = s.bodies.replace(
        vel=s.bodies.vel.at[env.ball_idx].set(jnp.asarray([3.0, 0.0]))
    )
    final2, r2 = jax.jit(lambda bb: evaluate(fwd, bb, ctrl, judge, 3.0, 30, 10))(b2)
    assert not bool(jax.jit(judge.is_done)(final2, jnp.zeros(env.action_size)))


def test_continuous_eval_vmaps_over_worlds():
    """The NFE/WFE loop is an ordinary JAX program: vmap it over a fleet
    with per-world terrain (the judge/forward close over traced terrain)."""
    from parallax_tpu.envs.base import ConstantControl, evaluate
    from parallax_tpu.envs.lunar_lander import (
        LanderJudge,
        LunarLander,
        make_world_forward,
    )

    env = LunarLander()
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def eval_one(bodies, terrain, throttle):
        judge = LanderJudge(env, terrain)
        fwd = make_world_forward(env, terrain)
        ctrl = ConstantControl(jnp.stack([throttle, jnp.zeros(())]))
        _, r = evaluate(fwd, bodies, ctrl, judge, 2.0, 20, 5)
        return r

    throttles = jnp.linspace(0.0, 0.6, B)
    rs = jax.jit(jax.vmap(eval_one))(states.bodies, states.terrain, throttles)
    assert rs.shape == (B,)
    assert np.isfinite(np.asarray(rs)).all()
    # distinct terrains/throttles -> distinct returns
    assert len(np.unique(np.round(np.asarray(rs), 6))) > 1
    # and the batched loop is differentiable
    g = jax.grad(lambda th: jax.vmap(eval_one)(states.bodies, states.terrain,
                                               jnp.full((B,), th)).mean())(jnp.asarray(0.3))
    assert np.isfinite(np.asarray(g))
