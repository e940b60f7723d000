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
    """BASELINE config 1: single ball free-fall + ground bounce, batch 1."""
    ball = BodyDef(
        shapes=[circle(0.5)], mass=1.0, inertia=0.1, position=(0.0, 3.0),
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


def test_golden_sanity(golden):
    """The pinned trajectories are physically sane (guards against pinning
    a broken run): finite, ball bounces, stack stays up."""
    c1 = golden["config1"]
    assert np.isfinite(c1).all()
    ball_y = c1[:, 0, 1]
    assert ball_y.min() > 0.3  # never tunnels through the ground
    assert ball_y[0] > ball_y.min()  # it fell
    c3 = golden["config3"]
    assert np.isfinite(c3).all()
    assert c3[-1, 2, 1] > 1.8  # top box still stacked (reference solver)


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
