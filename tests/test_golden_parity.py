"""Golden-trajectory regression pins on the reference-parity pipeline.

BASELINE.json's north star is exact-trajectory parity with the reference
CPU implementation under fixed seed.  The reference itself cannot execute
here (equinox is not installed — see PARITY.md), so these fixtures pin
*this repo's* reference-mode pipeline — ``narrowphase="gjk_epa"`` +
``ContactSolverConfig.reference()`` (impulse formulas of
/root/reference/cotix/_collision_resolution.py:76-151) +
``solver_mode="random_one_per_body"`` (/root/reference/cotix/_colliders.py:274-336)
— on BASELINE.json's config ladder 1-4.  Any refactor that drifts the
parity path bitwise fails here instead of slipping through the loose
behavioral checks in test_reference_modes.py.

The fixtures are generated on the 8-device virtual-CPU platform (what
conftest.py forces) and compared **bitwise**.  If a jax/XLA upgrade ever
changes CPU numerics legitimately, regenerate with:

    PYTHONPATH=. PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tests/test_golden_parity.py --regen

and commit the new ``tests/golden/golden_parity.npz`` in the same change.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.dynamics.impulses import ContactSolverConfig
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import circle, polygon

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "golden_parity.npz")

GROUND = BodyDef(
    shapes=[polygon([(-20.0, -2.0), (20.0, -2.0), (20.0, 0.0), (-20.0, 0.0)])],
    mass=np.inf,
    inertia=np.inf,
    elasticity=0.5,
    friction=0.3,
)


def _reference_wc(**kw) -> WorldConfig:
    """The full reference pipeline (VERDICT 'Missing #1')."""
    base = dict(
        dt=0.01,
        gravity=(0.0, -0.2),
        integrator="reference",
        narrowphase="gjk_epa",
        solver_mode="random_one_per_body",
        contact=ContactSolverConfig.reference(),
        broadphase=False,  # bit-parity: the reference has no pre-mask
    )
    base.update(kw)
    return WorldConfig(**base)


def _rollout(world, state, n_steps, record_every, seed):
    """jit-scan a keyed rollout; returns [T, n_bodies, 6] float32."""

    def f(carry, key):
        s, _ = carry
        s, _c = world.step(s, key=key)
        return (s, _c), None

    def snap(s):
        return jnp.concatenate(
            [s.pos, s.vel, s.angle[:, None], s.omega[:, None]], axis=-1
        )

    keys = jax.random.split(jax.random.PRNGKey(seed), n_steps)
    frames = []
    c0 = world.detect_contacts(state)
    carry = (state, c0)
    step_block = jax.jit(
        lambda carry, ks: jax.lax.scan(f, carry, ks), static_argnums=()
    )
    for i in range(0, n_steps, record_every):
        carry, _ = step_block(carry, keys[i : i + record_every])
        frames.append(snap(carry[0]))
    return np.asarray(jnp.stack(frames))


# -- the four BASELINE configs, reference-mode -------------------------------


def gen_config1():
    """BASELINE config 1: single ball free-fall + ground bounce, batch 1.

    Round 5 (VERDICT #6): start lowered 3.0 -> 1.2 so the ball actually
    LANDS inside the 400-step horizon (at g=-0.2 the old start fell only
    3.0 -> 1.4 and the pinned trajectory contained zero contacts — found
    by the numpy oracle's bounce guard).  The pinned trajectory now
    includes the impact and rebound; test_golden_sanity asserts both."""
    ball = BodyDef(
        shapes=[circle(0.5)], mass=1.0, inertia=0.1, position=(0.0, 1.2),
        elasticity=0.8, friction=0.1,
    )
    world, state = World.build([ball, GROUND], _reference_wc())
    return _rollout(world, state, n_steps=400, record_every=20, seed=101)


def gen_config2():
    """BASELINE config 2: two-circle elastic collision (GJK contact +
    impulse resolution).  8 vmapped worlds with per-world approach speeds
    stand in for the batch axis — vmap is lane-wise, so per-world numbers
    are batch-size independent."""
    world = None
    outs = []
    for w_idx in range(8):
        v = 0.5 + 0.1 * w_idx
        a = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                    position=(-1.2, 0.0), velocity=(v, 0.0), elasticity=1.0,
                    friction=0.0)
        b = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                    position=(1.2, 0.0), velocity=(-v, 0.0), elasticity=1.0,
                    friction=0.0)
        world, state = World.build([a, b], _reference_wc(gravity=(0.0, 0.0)))
        outs.append(_rollout(world, state, 200, 10, seed=200 + w_idx))
    return np.stack(outs)  # [8, T, 2, 6]


def gen_config3():
    """BASELINE config 3: convex-polygon stack through the iterative
    (randomized one-per-body) constraint solver."""
    sq = polygon([(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)])
    boxes = [
        BodyDef(shapes=[sq], mass=1.0, inertia=0.2,
                position=(0.02 * i, 0.55 + 1.05 * i), elasticity=0.1,
                friction=0.6)
        for i in range(3)
    ]
    world, state = World.build(boxes + [GROUND], _reference_wc())
    return _rollout(world, state, n_steps=300, record_every=20, seed=303)


def gen_config4():
    """BASELINE config 4: LunarLander, full env loop (thrust + reward +
    auto-reset in-graph) with the physics in reference mode."""
    from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander

    env = LunarLander(
        LanderConfig(
            narrowphase="gjk_epa",
            solver_mode="random_one_per_body",
            contact=ContactSolverConfig.reference(),
            broadphase=False,
        )
    )
    B = 4
    states = jax.vmap(env.reset_fn)(jax.random.split(jax.random.PRNGKey(7), B))

    # scripted throttle: main engine ramps down, slight side pulses
    def action_at(t):
        main = jnp.clip(1.0 - t / 80.0, 0.0, 1.0)
        side = 0.3 * jnp.sin(t / 7.0)
        return jnp.tile(jnp.stack([main, side])[None], (B, 1))

    @jax.jit
    def run(states):
        def f(carry, t):
            s = carry
            s, ts = jax.vmap(env.step)(s, action_at(t))
            return s, (jnp.concatenate(
                [s.bodies.pos, s.bodies.vel,
                 s.bodies.angle[..., None], s.bodies.omega[..., None]],
                axis=-1,
            ), ts.reward)
        return jax.lax.scan(f, states, jnp.arange(60))

    _, (traj, rewards) = run(states)
    return np.asarray(traj[::10]), np.asarray(rewards)  # [6, B, n, 6], [60, B]


def gen_config5():
    """BASELINE config 5: RoboCup multi-agent (2x3 robots + ball + field +
    goals, /root/reference/cotix/_robocup.py:9-150 geometry) with the
    physics in reference mode and per-robot scripted velocity commands."""
    from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig

    env = RoboCup(
        RoboCupConfig(
            narrowphase="gjk_epa",
            solver_mode="random_one_per_body",
            contact=ContactSolverConfig.reference(),
            broadphase=False,
        )
    )
    B = 4
    R = env.n_robots
    states = jax.vmap(env.reset_fn)(jax.random.split(jax.random.PRNGKey(11), B))

    # phase-shifted per-robot velocity commands: every robot moves, teams
    # cross paths, the ball gets hit
    ph = jnp.arange(R, dtype=jnp.float32) * 0.7

    def action_at(t):
        vx = 1.2 * jnp.sin(t / 9.0 + ph)
        vy = 0.8 * jnp.cos(t / 11.0 + ph)
        w = 0.5 * jnp.sin(t / 5.0 + ph)
        a = jnp.stack([vx, vy, w], axis=-1).reshape(-1)
        return jnp.tile(a[None], (B, 1))

    @jax.jit
    def run(states):
        def f(s, t):
            s, ts = jax.vmap(env.step)(s, action_at(t))
            return s, (jnp.concatenate(
                [s.bodies.pos, s.bodies.vel,
                 s.bodies.angle[..., None], s.bodies.omega[..., None]],
                axis=-1,
            ), ts.reward)
        return jax.lax.scan(f, states, jnp.arange(80))

    _, (traj, rewards) = run(states)
    return np.asarray(traj[::10]), np.asarray(rewards)  # [8, B, n, 6], [80, B]


def gen_config4_keyed():
    """Config 4 variant through the key-for-key reference-replay collider
    (solver_mode='random_one_per_body_keyed', engine/ref_replay.py): pins
    the replayed key tree + scatter + choice + sequential resolve against
    drift."""
    from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander

    env = LunarLander(
        LanderConfig(
            narrowphase="gjk_epa",
            solver_mode="random_one_per_body_keyed",
            contact=ContactSolverConfig.reference(),
            broadphase=False,
        )
    )
    B = 2
    states = jax.vmap(env.reset_fn)(jax.random.split(jax.random.PRNGKey(7), B))

    def action_at(t):
        main = jnp.clip(1.0 - t / 80.0, 0.0, 1.0)
        side = 0.3 * jnp.sin(t / 7.0)
        return jnp.tile(jnp.stack([main, side])[None], (B, 1))

    @jax.jit
    def run(states):
        def f(s, t):
            s, ts = jax.vmap(env.step)(s, action_at(t))
            return s, (jnp.concatenate(
                [s.bodies.pos, s.bodies.vel,
                 s.bodies.angle[..., None], s.bodies.omega[..., None]],
                axis=-1,
            ), ts.reward)
        return jax.lax.scan(f, states, jnp.arange(40))

    _, (traj, rewards) = run(states)
    return np.asarray(traj[::10]), np.asarray(rewards)  # [4, B, n, 6], [40, B]


GENERATORS = {
    "config1": gen_config1,
    "config2": gen_config2,
    "config3": gen_config3,
}


def generate_all() -> dict:
    out = {name: gen() for name, gen in GENERATORS.items()}
    traj4, rew4 = gen_config4()
    out["config4_traj"] = traj4
    out["config4_reward"] = rew4
    traj5, rew5 = gen_config5()
    out["config5_traj"] = traj5
    out["config5_reward"] = rew5
    traj4k, rew4k = gen_config4_keyed()
    out["config4k_traj"] = traj4k
    out["config4k_reward"] = rew4k
    return out


# -- tests -------------------------------------------------------------------


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden fixtures not generated (tests/golden/*.npz missing)")
    return np.load(GOLDEN_PATH)


@pytest.mark.parametrize("name", ["config1", "config2", "config3"])
def test_reference_mode_bitwise(golden, name):
    got = GENERATORS[name]()
    want = golden[name]
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"{name}: reference-mode trajectory drifted from the pinned "
        "golden fixture. If the change is an intentional numerics change, "
        "regenerate with `python tests/test_golden_parity.py --regen`.",
    )


def test_lander_reference_mode_bitwise(golden):
    traj, rew = gen_config4()
    np.testing.assert_array_equal(traj, golden["config4_traj"])
    np.testing.assert_array_equal(rew, golden["config4_reward"])


def test_robocup_reference_mode_bitwise(golden):
    """Config 5 pin (round-2 VERDICT missing #3): any drift in RoboCup's
    reference-mode parity path fails here."""
    if "config5_traj" not in golden:
        pytest.skip("config5 fixture missing — regenerate golden_parity.npz")
    traj, rew = gen_config5()
    np.testing.assert_array_equal(traj, golden["config5_traj"])
    np.testing.assert_array_equal(rew, golden["config5_reward"])


def test_lander_keyed_replay_bitwise(golden):
    """Keyed-replay pin (round-3 VERDICT #2): any drift in the
    reference-key-tree replay path fails here."""
    if "config4k_traj" not in golden:
        pytest.skip("config4k fixture missing — regenerate golden_parity.npz")
    traj, rew = gen_config4_keyed()
    np.testing.assert_array_equal(traj, golden["config4k_traj"])
    np.testing.assert_array_equal(rew, golden["config4k_reward"])


def test_golden_sanity(golden):
    """The pinned trajectories are physically sane (guards against pinning
    a broken run): finite, ball bounces, stack stays up."""
    c1 = golden["config1"]
    assert np.isfinite(c1).all()
    ball_y = c1[:, 0, 1]
    assert ball_y.min() > 0.3  # never tunnels through the ground
    assert ball_y[0] > ball_y.min()  # it fell
    # round 5 (VERDICT #6): the pinned trajectory must contain the IMPACT,
    # not just the fall.  Reference-mode restitution on this impact
    # (vy=-0.53) is a micro-bounce — post-impact vy flips to +0.033 and the
    # ball settles around y=0.497 (oracle-pinned; the reference's folded-in
    # Baumgarte absorbs the arc, see test_bounce_matches_numpy_oracle) —
    # so the rebound evidence is the recorded VELOCITY plane, not an apex.
    ball_vy = c1[:, 0, 3]
    i_min = int(ball_y.argmin())
    assert ball_y.min() < 0.52, "ball never reached the ground"
    assert i_min < len(ball_y) - 1, "impact must happen inside the horizon"
    assert abs(ball_y[-1] - 0.5) < 0.02, "ball must settle supported on ground"
    assert (ball_vy[i_min:] > 1e-3).any(), "no upward (rebound) velocity after impact"
    # restitution-consistent: the micro-rebound must stay far below the
    # elastic-arc bound for the e<=0.5 pairing
    assert ball_y[i_min:].max() - ball_y.min() < 0.5 * (ball_y[0] - ball_y.min())
    c3 = golden["config3"]
    assert np.isfinite(c3).all()
    assert c3[-1, 2, 1] > 1.8  # top box still stacked (reference solver)
    if "config5_traj" in golden:
        c5 = golden["config5_traj"]
        assert np.isfinite(c5).all()
        # ball (body 4) stays inside the field and actually moves
        ball = c5[:, :, 4, :2]
        assert (np.abs(ball[..., 0]) < 5.3).all()
        assert (np.abs(ball[..., 1]) < 3.8).all()
        assert np.abs(ball[-1] - ball[0]).max() > 0.05
        # robots moved too (scripted commands are non-trivial)
        robots = c5[:, :, 5:, :2]
        assert np.abs(robots[-1] - robots[0]).max() > 0.1


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        arrays = generate_all()
        np.savez_compressed(GOLDEN_PATH, **arrays)
        for k, v in arrays.items():
            print(f"{k}: shape={v.shape} dtype={v.dtype}")
        print(f"wrote {GOLDEN_PATH}")
    else:
        print("usage: python tests/test_golden_parity.py --regen")
