"""WorldConfig x execution-path matrix.

Every (narrowphase, solver_mode) combination must either run consistently
on every public execution path (single-world step, vmapped step, batched
step) or be rejected LOUDLY at the batched-path entry — never silently
mis-size contact lanes (the round-1 trap: a gjk_epa pair table sizes one
lane per pp/bp pair while the batch-minor collide kernels emit 2-lane SAT
manifolds).

The reference serves all its paths from one dispatch table
(/root/reference/cotix/_colliders.py:21-35); parallax splits perf-mode
(sat+block, batchable) from parity-mode (everything else, vmapped) and this
suite pins the boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.engine.batched import (
    check_batched_support,
    collide_batched,
    step_batched,
    _to_soa,
)
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import box, circle, polygon

NARROWPHASES = ("sat", "gjk_epa")
SOLVER_MODES = ("block", "jacobi", "gauss_seidel", "random_one_per_body")


def _world(narrowphase, solver_mode):
    """Small mixed world covering the cc/cb/cp/bp/pp kernel families."""
    square = polygon([(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)])
    tri = polygon([(-0.4, -0.3), (0.5, -0.2), (0.0, 0.5)])
    bodies = [
        BodyDef(shapes=[square], mass=1.0, inertia=0.2, position=(0.0, 0.4),
                angle=0.15, elasticity=0.3, friction=0.5),
        BodyDef(shapes=[tri], mass=1.5, inertia=0.3, position=(0.3, 1.1),
                angle=-0.2, elasticity=0.2, friction=0.4),
        BodyDef(shapes=[circle(0.3)], mass=0.8, inertia=0.05,
                position=(-0.45, 0.9), elasticity=0.6, friction=0.3),
        BodyDef(shapes=[circle(0.25)], mass=0.5, inertia=0.04,
                position=(-0.35, 1.4), elasticity=0.9, friction=0.2),
        BodyDef(shapes=[box((-6.0, -2.0), (6.0, 0.0))], mass=np.inf,
                inertia=np.inf, elasticity=0.1, friction=0.6),
    ]
    return World.build(
        bodies,
        WorldConfig(
            dt=0.01,
            gravity=(0.0, -9.8),
            integrator="symplectic",
            narrowphase=narrowphase,
            solver_mode=solver_mode,
            solver_iterations=4,
            position_iterations=2 if solver_mode == "block" else 0,
        ),
    )


def _batch(state, B, seed=0):
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state
    )
    k = jax.random.split(jax.random.PRNGKey(seed), 2)
    return batched.replace(
        pos=batched.pos + jax.random.normal(k[0], batched.pos.shape) * 0.05,
        vel=batched.vel + jax.random.normal(k[1], batched.vel.shape) * 0.2,
    )


@pytest.mark.parametrize("narrowphase", NARROWPHASES)
@pytest.mark.parametrize("solver_mode", SOLVER_MODES)
def test_single_and_vmapped_paths_agree(narrowphase, solver_mode):
    """Every config combination must run on step AND vmap(step), and the two
    must agree world-by-world."""
    world, st0 = _world(narrowphase, solver_mode)
    B = 3
    batched = _batch(st0, B)
    keys = jax.random.split(jax.random.PRNGKey(42), B)

    step = lambda s, k: world.step(s, key=k)[0]
    out_v = jax.jit(jax.vmap(step))(batched, keys)
    for i in range(B):
        one = jax.tree_util.tree_map(lambda x: x[i], batched)
        out_1 = jax.jit(step)(one, keys[i])
        np.testing.assert_allclose(
            np.asarray(out_1.pos), np.asarray(out_v.pos[i]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_1.vel), np.asarray(out_v.vel[i]), atol=1e-4
        )
    assert np.isfinite(np.asarray(out_v.pos)).all()
    assert np.isfinite(np.asarray(out_v.vel)).all()


@pytest.mark.parametrize("narrowphase", NARROWPHASES)
@pytest.mark.parametrize("solver_mode", SOLVER_MODES)
def test_batched_path_supports_or_rejects(narrowphase, solver_mode):
    """sat+block runs batched and matches vmap(step); every other combo is
    rejected with a clear ValueError — no silent lane-size mismatch."""
    world, st0 = _world(narrowphase, solver_mode)
    B = 4
    batched = _batch(st0, B)

    if narrowphase == "sat" and solver_mode == "block":
        ref = jax.jit(jax.vmap(lambda s: world.step(s)[0]))(batched)
        got = jax.jit(lambda st: step_batched(world, st)[0])(batched)
        assert np.abs(np.asarray(ref.pos) - np.asarray(got.pos)).max() < 1e-5
        assert np.abs(np.asarray(ref.vel) - np.asarray(got.vel)).max() < 1e-4
    else:
        with pytest.raises(ValueError, match="sat|block"):
            step_batched(world, batched)


def test_collide_batched_rejects_gjk_epa_table():
    world, st0 = _world("gjk_epa", "block")
    batched = _batch(st0, 4)
    with pytest.raises(ValueError, match="narrowphase"):
        collide_batched(world, _to_soa(batched))


def test_check_batched_support_messages():
    ok = WorldConfig()
    check_batched_support(ok)  # must not raise
    bad_np = WorldConfig(narrowphase="gjk_epa")
    with pytest.raises(ValueError, match="vmap"):
        check_batched_support(bad_np)
    bad_sm = WorldConfig(solver_mode="jacobi")
    with pytest.raises(ValueError, match="vmap"):
        check_batched_support(bad_sm)


def test_shipped_envs_request_pallas_solver():
    """Every shipped env must opt into the Pallas contact solver: the
    kernel opt-in is per-WorldConfig and a missing one silently runs the
    XLA fallback on TPU (round 4 caught Bouncer at 357 of 409 us/step in
    the fallback — a 3.2x throughput loss nothing asserted).  Off-TPU the
    flag is inert (the solver falls back), so this pins configuration,
    not numerics."""
    from parallax_tpu.envs.billiards import Billiards
    from parallax_tpu.envs.bouncer import Bouncer
    from parallax_tpu.envs.lunar_lander import LunarLander
    from parallax_tpu.envs.robocup import RoboCup

    for env in (LunarLander(), RoboCup(), Billiards(), Bouncer()):
        assert env.world.config.use_pallas_solver, type(env).__name__
