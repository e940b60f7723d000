"""Per-step metrics pytree + debug logging (SURVEY.md §5 observability)."""

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.engine.batched import _to_soa, collide_batched
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.geometry.shapes import box, circle
from parallax_tpu.utils.metrics import (
    contact_metrics,
    contact_metrics_bm,
    log_metrics,
    merge_metrics,
    set_debug_logging,
    timestep_metrics,
)


def _overlap_world():
    ball = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                   position=(0.0, 0.3), elasticity=0.0, friction=0.5)
    ground = BodyDef(shapes=[box((-5.0, -2.0), (5.0, 0.0))], mass=np.inf,
                     inertia=np.inf, elasticity=0.0, friction=0.5)
    return World.build([ball, ground], WorldConfig(dt=0.01))


def test_contact_metrics_counts_overlap():
    world, state = _overlap_world()
    m = jax.jit(lambda s: contact_metrics(world.detect_contacts(s)))(state)
    # ball center at 0.3 with radius 0.5 → 0.2 penetration into the ground
    assert int(m["n_active"]) >= 1
    assert 0.15 < float(m["max_depth"]) < 0.25
    assert float(m["sum_depth"]) >= float(m["max_depth"]) - 1e-6
    assert float(m["mean_depth"]) <= float(m["max_depth"]) + 1e-6


def test_contact_metrics_zero_when_separated():
    world, state = _overlap_world()
    state = state.replace(pos=state.pos + jnp.asarray([[0.0, 5.0], [0.0, 0.0]]))
    m = contact_metrics(world.detect_contacts(state))
    assert int(m["n_active"]) == 0
    assert float(m["max_depth"]) == 0.0
    assert float(m["mean_depth"]) == 0.0


def test_contact_metrics_bm_matches_vmapped():
    world, st0 = _overlap_world()
    B = 8
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), st0
    )
    # vary overlap per world
    dy = jnp.linspace(0.0, 1.0, B)
    batched = batched.replace(
        pos=batched.pos.at[:, 0, 1].add(dy)
    )
    mv = jax.vmap(lambda s: contact_metrics(world.detect_contacts(s)))(batched)
    mb = contact_metrics_bm(collide_batched(world, _to_soa(batched)))
    np.testing.assert_allclose(
        np.asarray(mb["n_active_per_world"]), np.asarray(mv["n_active"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(mb["max_depth_per_world"]),
        np.asarray(mv["max_depth"]),
        atol=1e-5,
    )
    assert float(mb["n_active"]) == float(np.sum(np.asarray(mv["n_active"])))


def test_timestep_and_merge():
    env = LunarLander()
    B = 4
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    states, ts = jax.jit(env.step_batch)(states, jnp.zeros((B, 2)))
    m = merge_metrics(timestep_metrics(ts), {"extra": jnp.asarray(1.0)})
    assert set(m) >= {"mean_reward", "n_done", "reset_rate", "extra"}
    assert 0.0 <= float(m["reset_rate"]) <= 1.0


def test_log_metrics_debug_gated(capfd):
    world, state = _overlap_world()

    @jax.jit
    def step_logged(s):
        s, contacts = world.step(s)
        log_metrics(contact_metrics(contacts), step=0, every=1)
        return s

    # off (default): no callback traced, nothing printed
    set_debug_logging(False)
    step_logged(state)
    jax.effects_barrier()
    assert "[metrics" not in capfd.readouterr().out

    # on: host line appears
    set_debug_logging(True)
    try:
        jax.jit(
            lambda s: (world.step(s)[0],
                       log_metrics(contact_metrics(world.step(s)[1]),
                                   step=0, every=1))[0]
        )(state)
        jax.effects_barrier()
        out = capfd.readouterr().out
        assert "[metrics step=0]" in out and "n_active=" in out
    finally:
        set_debug_logging(False)
