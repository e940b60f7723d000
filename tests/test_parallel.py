"""Mesh / sharding / multi-device tests on the 8-device virtual CPU platform.

Validates the multi-chip design (SURVEY §2.2): world batch sharded over a
1-D "worlds" mesh, per-device stepping with zero per-step collectives, and
the differentiable train step whose gradient reduction psums across the
mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.parallel.mesh import (
    batch_sharding,
    make_world_mesh,
    replicated,
    shard_batch,
)
from parallax_tpu.parallel.rollout import batched_rollout, make_train_step, rollout


def test_mesh_has_8_devices():
    mesh = make_world_mesh()
    assert mesh.devices.size == 8


def test_sharded_env_step_matches_single_device():
    env = LunarLander()
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.tile(jnp.array([0.5, 0.1]), (B, 1))

    step = jax.jit(jax.vmap(env.step))
    ref_states, ref_ts = step(states, actions)

    mesh = make_world_mesh()
    sharded_states = shard_batch(states, mesh)
    sharded_actions = jax.device_put(actions, batch_sharding(mesh))
    out_states, out_ts = step(sharded_states, sharded_actions)

    np.testing.assert_allclose(
        np.asarray(ref_ts.obs), np.asarray(out_ts.obs), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref_states.bodies.pos),
        np.asarray(out_states.bodies.pos),
        rtol=1e-6,
        atol=1e-6,
    )
    # the output batch axis stays sharded over the mesh
    assert len(out_ts.obs.sharding.device_set) == 8


def test_sharded_rollout_and_train_step():
    import optax

    env = LunarLander()
    mesh = make_world_mesh()
    B = 8
    n_steps = 3

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "w": jax.random.normal(k1, (env.observation_size, env.action_size)) * 0.1,
        "b": jnp.zeros(env.action_size),
    }

    def policy(p, obs):
        return jnp.tanh(obs @ p["w"] + p["b"])

    optimizer = optax.sgd(1e-3)
    opt_state = optimizer.init(params)
    train_step = make_train_step(env, policy, optimizer, n_steps)

    keys = jax.random.split(k2, B)
    states = jax.vmap(env.reset)(keys)
    states = shard_batch(states, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    jitted = jax.jit(train_step)
    new_params, opt_state, final_states, metrics = jitted(params, opt_state, states)
    assert np.isfinite(float(metrics["loss"]))
    # gradients actually flowed: params changed
    assert not np.allclose(np.asarray(new_params["w"]), np.asarray(params["w"]))
    # params stay replicated on every device
    assert len(new_params["w"].sharding.device_set) == 8


def test_rollout_checkpointing_matches():
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(0))

    def policy(p, obs):
        return jnp.zeros(2)

    f_plain = jax.jit(lambda s: rollout(env, s, policy, None, 8)[1].reward)
    f_ckpt = jax.jit(
        lambda s: rollout(env, s, policy, None, 8, checkpoint_segments=2)[1].reward
    )
    np.testing.assert_allclose(
        np.asarray(f_plain(state)), np.asarray(f_ckpt(state)), rtol=1e-6
    )


def test_graft_entry_points():
    """The driver's entry() and dryrun_multichip() contracts."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    states, reward = out
    assert np.isfinite(np.asarray(reward)).all()

    ge.dryrun_multichip(8)


def test_sharded_rollout_has_zero_per_step_collectives():
    """The worlds axis is embarrassingly parallel: the compiled sharded
    rollout must contain NO cross-device collectives — which is what makes
    multi-host scaling linear by construction (BASELINE north star)."""
    import re

    from parallax_tpu.parallel.mesh import make_world_mesh, shard_batch

    mesh = make_world_mesh()
    env = LunarLander()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), 32))
    states = shard_batch(states, mesh)

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    @jax.jit
    def run(states):
        states, _ = env.rollout_batch(states, policy, 4)
        return states

    hlo = run.lower(states).compile().as_text()
    colls = re.findall(
        r"(all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all)",
        hlo,
    )
    assert not colls, f"unexpected collectives in env rollout: {set(colls)}"


def test_train_step_gradient_psum_crosses_devices():
    """The learner side DOES reduce across the mesh: the train step's HLO
    must contain an all-reduce for the gradient mean."""
    import optax
    import re

    from parallax_tpu.parallel.mesh import (
        batch_sharding,
        make_world_mesh,
        replicated,
        shard_batch,
    )
    from parallax_tpu.parallel.rollout import make_train_step

    env = LunarLander()
    mesh = make_world_mesh()
    params = {"w": jnp.zeros((env.observation_size, env.action_size)),
              "b": jnp.zeros(env.action_size)}

    def policy(p, obs):
        return jnp.tanh(obs @ p["w"] + p["b"])

    optimizer = optax.sgd(1e-3)
    opt_state = optimizer.init(params)
    train_step = make_train_step(env, policy, optimizer, 2)

    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), 16))
    states = shard_batch(states, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    hlo = jax.jit(train_step).lower(params, opt_state, states).compile().as_text()
    assert re.search(r"all-reduce", hlo), "gradient reduction must psum over the mesh"


def test_config5_robocup_sharded_with_grad():
    """BASELINE config 5: RoboCup multi-agent env, batch sharded over the
    mesh (4+ devices), with a gradient-through-step check."""
    from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig
    from parallax_tpu.parallel.mesh import make_world_mesh, shard_batch

    env = RoboCup(RoboCupConfig(n_robots_per_team=2))
    mesh = make_world_mesh()
    assert mesh.devices.size >= 4
    B = 16
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    states = shard_batch(states, mesh)

    def mean_ball_progress(push):
        def policy(_, obs):
            a = jnp.zeros((obs.shape[0], env.action_size))
            return a.at[:, 0].set(push)  # blue robot 0: vx command

        final, traj = env.rollout_batch(states, policy, 10)
        return traj.reward.mean()

    val, g = jax.jit(jax.value_and_grad(mean_ball_progress))(jnp.asarray(-0.5))
    assert np.isfinite(float(val))
    assert np.isfinite(float(g))


def test_checkpointed_rollout_stays_on_fast_path():
    """checkpoint_segments wraps the plane-space fast path (batch-minor remat
    residuals) — value and gradient match the unsegmented rollout."""
    from parallax_tpu.envs.lunar_lander import LunarLander
    from parallax_tpu.parallel.rollout import batched_rollout

    env = LunarLander()
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def pol(p, obs):
        return jnp.tile(jnp.stack([p, jnp.zeros(())]), (obs.shape[0], 1))

    def ret(theta, segs):
        _, traj = batched_rollout(env, states, pol, theta, 24,
                                  checkpoint_segments=segs)
        return traj.reward.mean()

    v0 = float(jax.jit(lambda t: ret(t, 0))(jnp.asarray(0.4)))
    v3 = float(jax.jit(lambda t: ret(t, 3))(jnp.asarray(0.4)))
    assert abs(v0 - v3) < 1e-6
    g0 = float(jax.jit(jax.grad(lambda t: ret(t, 0)))(jnp.asarray(0.4)))
    g3 = float(jax.jit(jax.grad(lambda t: ret(t, 3)))(jnp.asarray(0.4)))
    assert abs(g0 - g3) < 1e-6 and np.isfinite(g3)


def test_non_divisible_checkpoint_segments_raise():
    """A silent fallback off the segmented/fast path once cost a 4.3x
    padded-residual OOM (horizon-100 lander backward pass); non-divisible
    checkpoint_segments must be rejected loudly on both rollout entries."""
    env = LunarLander()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), 4))

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], env.action_size))

    with pytest.raises(ValueError, match="must divide"):
        batched_rollout(env, states, policy, None, 10, checkpoint_segments=3)
    with pytest.raises(ValueError, match="must divide"):
        rollout(env, jax.tree_util.tree_map(lambda x: x[0], states), policy,
                None, 10, checkpoint_segments=3)
