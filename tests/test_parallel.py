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


def test_mesh_chunked_rollout_zero_collectives():
    """Fleet above one chunk per chip (round-3 VERDICT #1): waves are sliced
    per-device (chunk worlds per chip per wave) so the compiled chunked +
    sharded rollout contains NO collectives — including a remainder wave."""
    import re

    mesh = make_world_mesh()
    env = LunarLander()
    # per_dev = 11 worlds/device at chunk=4 -> 2 full waves + remainder 3
    B = 8 * 11
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    states = shard_batch(states, mesh)

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    @jax.jit
    def run(states):
        return env.rollout_batch(states, policy, 4, max_chunk=4, mesh=mesh)

    final, traj = run(states)
    # outputs stay sharded over all 8 devices
    assert len(final.bodies.pos.sharding.device_set) == 8
    assert len(traj.reward.sharding.device_set) == 8

    hlo = run.lower(states).compile().as_text()
    colls = re.findall(
        r"(all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all)",
        hlo,
    )
    assert not colls, f"unexpected collectives in mesh-chunked rollout: {set(colls)}"


def test_mesh_chunked_relayout_exact():
    """The mesh wave transform is a pure relayout: with a rollout_fn whose
    math is exactly shape-invariant (elementwise, no reductions), the
    mesh-chunked result must be BITWISE equal to calling the fn on the whole
    batch — for divisible and remainder per-device batches.  This pins the
    [D, k, chunk] slicing + inverse permutation exactly: a world sent to the
    wrong wave slot or reassembled out of order changes the answer by whole
    worlds, not ULPs."""
    from parallax_tpu.parallel.rollout import _mesh_chunked_rollout

    mesh = make_world_mesh()
    n_steps = 3

    def rollout_fn(states):
        # per-world math built ONLY from exactly-rounded ops (multiply by a
        # power of two, one multiply per value) so fma-contraction choices
        # cannot move the result across program shapes; traj is time-major
        # [T, Bc, 2]
        final = jax.tree_util.tree_map(lambda x: x * 2.0 + 1.0, states)
        traj = jnp.stack(
            [states["a"] * float(2 ** t) for t in range(n_steps)]
        )
        return final, traj

    for per_dev in (8, 11):  # divisible (k=2) and remainder (k=2, rem=3)
        B = 8 * per_dev
        states = {"a": jnp.arange(B * 2, dtype=jnp.float32).reshape(B, 2)
                  * 0.3333333333 + 7.0}
        want_f, want_t = rollout_fn(states)
        sharded = shard_batch(states, mesh)
        got_f, got_t = jax.jit(
            lambda s: _mesh_chunked_rollout(
                rollout_fn, s, n_steps, B, 4, mesh, "worlds"
            )
        )(sharded)
        np.testing.assert_array_equal(np.asarray(want_f["a"]),
                                      np.asarray(got_f["a"]))
        np.testing.assert_array_equal(np.asarray(want_t),
                                      np.asarray(got_t))
        assert len(got_f["a"].sharding.device_set) == 8


def test_mesh_chunked_rollout_matches_baselines():
    """Per-world lander results of the mesh-aware chunked rollout match the
    sharded unchunked run and the single-device chunked run within ~1 ULP.
    Bitwiseness across PROGRAM SHAPES is not an XLA guarantee: the SPMD
    partitioner fuses fma differently per local shape (measured on this
    backend: sharded-unchunked vs unsharded-unchunked differs 1.18e-9 in
    pos with NO chunking involved; wave body at local batch 4 vs unchunked
    local batch 8 differs 2.5e-7 in vel over 12 steps).  World-ORDER exactness — the thing
    the relayout could actually get wrong — is pinned bitwise by
    test_mesh_chunked_relayout_exact; here a couple-ULP atol still catches
    any permutation bug (different worlds differ at O(1), not 1e-8)."""
    mesh = make_world_mesh()
    env = LunarLander()
    n_steps = 12

    def policy(_, obs):
        return jnp.tile(jnp.array([0.4, 0.05]), (obs.shape[0], 1))

    for B in (8 * 8, 8 * 11):  # divisible and remainder (per_dev 8 / 11)
        states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(1), B))
        f_1dev, t_1dev = jax.jit(
            lambda s: env.rollout_batch(s, policy, n_steps, max_chunk=4)
        )(states)
        sharded = shard_batch(states, mesh)
        f_base, t_base = jax.jit(
            lambda s: env.rollout_batch(s, policy, n_steps, max_chunk=0)
        )(sharded)
        f_mesh, t_mesh = jax.jit(
            lambda s: env.rollout_batch(s, policy, n_steps, max_chunk=4,
                                        mesh=mesh)
        )(sharded)
        for ref_f, ref_t in ((f_base, t_base), (f_1dev, t_1dev)):
            np.testing.assert_allclose(
                np.asarray(ref_f.bodies.pos), np.asarray(f_mesh.bodies.pos),
                rtol=0, atol=5e-7,
            )
            np.testing.assert_allclose(
                np.asarray(ref_f.bodies.vel), np.asarray(f_mesh.bodies.vel),
                rtol=0, atol=5e-7,
            )
            np.testing.assert_allclose(
                np.asarray(ref_t.reward), np.asarray(t_mesh.reward),
                rtol=0, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(ref_t.obs), np.asarray(t_mesh.obs),
                rtol=0, atol=1e-6,
            )
        # flags quantize hard; they must agree exactly
        np.testing.assert_array_equal(
            np.asarray(t_base.terminated), np.asarray(t_mesh.terminated)
        )
        np.testing.assert_array_equal(
            np.asarray(t_base.truncated), np.asarray(t_mesh.truncated)
        )


def test_mesh_chunked_train_step_grad():
    """Gradients flow through the mesh-aware chunked rollout (lax.map waves
    are differentiable) and match the unchunked sharded train step."""
    import optax

    env = LunarLander()
    mesh = make_world_mesh()
    B = 8 * 6  # per_dev=6, chunk=4 -> 1 full wave + remainder 2
    n_steps = 4

    params = {"w": jnp.zeros((env.observation_size, env.action_size)),
              "b": jnp.zeros(env.action_size)}

    def policy(p, obs):
        return jnp.tanh(obs @ p["w"] + p["b"])

    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(2), B))
    sharded = shard_batch(states, mesh)
    params_r = jax.device_put(params, replicated(mesh))
    opt_r = jax.device_put(opt_state, replicated(mesh))

    ts_plain = make_train_step(env, policy, optimizer, n_steps)
    ts_chunk = make_train_step(env, policy, optimizer, n_steps,
                               max_chunk=4, mesh=mesh)
    p0, _, _, m0 = jax.jit(ts_plain)(params_r, opt_r, sharded)
    p1, _, _, m1 = jax.jit(ts_chunk)(params_r, opt_r, sharded)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p0["w"]), np.asarray(p1["w"]),
                               rtol=1e-6, atol=1e-7)


def test_mesh_chunked_requires_divisible_batch():
    mesh = make_world_mesh()
    env = LunarLander()
    B = 8 * 4 + 4  # not divisible by 8, above one chunk per chip
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    with pytest.raises(ValueError, match="divisible"):
        env.rollout_batch(states, policy, 2, max_chunk=4, mesh=mesh)


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
        # obs keeps the robot-state -> command dependence visible even
        # before any robot reaches the ball
        return traj.reward.mean() + 1e-3 * traj.obs.mean()

    # stay inside the acceleration-limit band (|push| < max_accel*dt): the
    # accel clip saturates for larger commands from rest, and a saturated
    # clip's gradient is legitimately 0 — which would mask a dead chain
    push0 = 0.25 * env.config.robot_max_accel * env.config.dt
    val, g = jax.jit(jax.value_and_grad(mean_ball_progress))(jnp.asarray(push0))
    assert np.isfinite(float(val))
    assert np.isfinite(float(g))
    assert float(g) != 0.0, "gradient through the sharded rollout died"


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


def test_mesh_custom_axis_name_resolves():
    """A 1-D mesh built with a non-default axis name resolves automatically
    in the chunked rollout (axis derived from the mesh, round-4 review)."""
    env = LunarLander()
    mesh = make_world_mesh(axis="data")
    B = 8 * 6
    states = shard_batch(
        env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B)),
        mesh, axis="data",
    )

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    final, traj = jax.jit(
        lambda s: env.rollout_batch(s, policy, 2, max_chunk=4, mesh=mesh)
    )(states)
    assert len(final.bodies.pos.sharding.device_set) == 8


def test_vmap_fallback_rejects_chunking():
    """An env without the plane fast path must reject max_chunk/mesh loudly
    instead of silently running one giant unchunked wave (round-4 review)."""

    class NoFastPath:
        rollout_batch = None

    with pytest.raises(ValueError, match="fast path"):
        batched_rollout(NoFastPath(), None, lambda p, o: o, None, 2,
                        max_chunk=4)


def test_vmap_fallback_allows_disabled_chunking():
    """``max_chunk=0`` means "chunking explicitly disabled" (chunked_rollout's
    contract) — the vmap fallback trivially satisfies that and must not be
    rejected by the loud guard (round-4 review: the guard tested
    ``is not None`` and crashed on 0)."""
    from parallax_tpu.envs.bouncer import Bouncer

    class VmappedOnly(Bouncer):
        rollout_batch = None  # force the fallback

    env = VmappedOnly()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), 2))
    final, traj = batched_rollout(
        env, states, lambda p, o: jnp.zeros((env.action_size,), jnp.float32),
        None, 2, max_chunk=0,
    )
    assert traj.reward.shape[0] == 2  # time-major [T, B]
    assert np.isfinite(np.asarray(traj.reward)).all()


def test_remat_steps_matches_default_train_step():
    """remat_steps=True is a MEMORY knob (per-step jax.checkpoint inside the
    scan: on v5e it fits B=16384/h=100 training where the default OOMs the
    compiler, at ~17% lower throughput — DESIGN §7d): loss, grads and the
    rolled-out states must match the default path."""
    import optax

    from parallax_tpu.envs.lunar_lander import LunarLander

    env = LunarLander()
    B, H = 8, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    params = {
        "w1": jax.random.normal(k1, (env.observation_size, 8)) * 0.3,
        "b1": jnp.zeros(8),
        "w2": jax.random.normal(k2, (8, env.action_size)) * 0.1,
        "b2": jnp.zeros(env.action_size),
    }

    def policy(p, obs):
        return jnp.tanh(jnp.tanh(obs @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"])

    opt = optax.adam(1e-3)

    def one(remat):
        ts = jax.jit(make_train_step(env, policy, opt, H,
                                     checkpoint_segments=2,
                                     remat_steps=remat))
        states = env.reset_fn_batch(jax.random.split(k3, B))
        return ts(params, opt.init(params), states)

    p0, _, s0, m0 = one(False)
    p1, _, s1, m1 = one(True)
    assert float(m0["loss"]) == float(m1["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vmap_fallback_rejects_remat_steps():
    class NoFastPath:
        rollout_batch = None

    with pytest.raises(ValueError, match="fast path"):
        batched_rollout(NoFastPath(), None, lambda p, o: o, None, 2,
                        remat_steps=True)
