"""Pallas solver kernel: interpreter-mode equivalence with the JAX path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.engine.batched import collide_batched, solve_contacts_bm, _to_soa
from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.ops.pallas_solver import TILE_B, solve_contacts_pallas


@pytest.fixture(scope="module")
def contact_state():
    env = LunarLander()
    B = TILE_B
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    bodies = states.bodies.replace(
        pos=states.bodies.pos - jnp.asarray([0.0, 6.2])[None, None, :],
        vel=states.bodies.vel - jnp.asarray([0.0, 0.6])[None, None, :],
    )
    states = states.replace(bodies=bodies)
    acts = jnp.zeros((B, 2))
    step = jax.jit(env.step_batch)
    for _ in range(40):
        states, _ = step(states, acts)
    s = _to_soa(states.bodies)
    tflat = jnp.swapaxes(states.terrain, 0, 1)
    tp = tflat.reshape(7, 8, 2, B)
    override = {
        p: (tp[i, :, 0, :], tp[i, :, 1, :])
        for i, p in enumerate(env._ground_parts)
    }
    con = jax.jit(lambda s: collide_batched(env.world, s, override))(s)
    assert int(con.active.sum()) > 100, "scenario must have real contacts"
    return env.world, s, con


def test_pallas_solver_matches_jax_path(contact_state):
    world, s, con = contact_state
    ref = jax.jit(
        lambda s, c: solve_contacts_bm(world, s, c, 3, 2, 0.01, world.config.contact)
    )(s, con)
    got = jax.jit(
        lambda s, c: solve_contacts_pallas(
            world, s, c, 3, 2, 0.01, world.config.contact, interpret=True
        )
    )(s, con)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), atol=1e-5
        )


def test_pallas_solver_custom_vjp(contact_state):
    """Gradients flow through the Pallas path (bwd = JAX path's VJP)."""
    world, s, con = contact_state

    def loss(vy0):
        s2 = s._replace(vy=s.vy + vy0)
        out = solve_contacts_pallas(
            world, s2, con, 3, 2, 0.01, world.config.contact, interpret=True
        )
        return (out.vy**2).mean()

    g = jax.grad(loss)(jnp.zeros(()))
    assert np.isfinite(np.asarray(g))


def test_fused_step_kernel_matches_physics_core(contact_state):
    """The fully-fused step kernel (ops.pallas_step) in interpreter mode."""
    from parallax_tpu.engine.batched import physics_core, _to_soa
    from parallax_tpu.ops.pallas_step import (
        physics_core_pallas,
        supports_fused_step,
    )

    import dataclasses

    env = LunarLander()
    # the fused kernel has no broad-phase stage; it only engages (and is
    # only bit-exact against) broadphase-off worlds
    world = env.world.replace(
        config=dataclasses.replace(env.world.config, broadphase=False)
    )
    assert supports_fused_step(world)
    B = TILE_B
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(1), B))
    bodies = states.bodies.replace(
        pos=states.bodies.pos - jnp.asarray([0.0, 6.2])[None, None, :],
    )
    states = states.replace(bodies=bodies)
    step = jax.jit(env.step_batch)
    for _ in range(30):
        states, _ = step(states, jnp.zeros((B, 2)))
    s = _to_soa(states.bodies)
    tflat = jnp.swapaxes(states.terrain, 0, 1)
    tp = tflat.reshape(7, 8, 2, B)
    override = {
        p: (tp[i, :, 0, :], tp[i, :, 1, :])
        for i, p in enumerate(env._ground_parts)
    }
    ref_s, ref_c = jax.jit(
        lambda s: physics_core(world, s, terrain_override=override)
    )(s)
    got_s, got_c = jax.jit(
        lambda s: physics_core_pallas(
            world, s, terrain_override=override, interpret=True
        )
    )(s)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref_s, f)), np.asarray(getattr(got_s, f)),
            atol=1e-5,
        )
    np.testing.assert_array_equal(
        np.asarray(ref_c.active), np.asarray(got_c.active)
    )


def test_fused_step_bwd_kernel_matches_xla_vjp(monkeypatch):
    """Round 5: the fused-step BACKWARD kernel (_step_bwd_kernel —
    recompute + jax.vjp of the whole collide+solve+joints trace in VMEM)
    agrees with the XLA path's vjp on every state plane AND the terrain
    planes."""
    import dataclasses

    from parallax_tpu.engine.batched import _to_soa, physics_core
    from parallax_tpu.ops.pallas_step import (
        fused_tile_for,
        physics_core_pallas,
        supports_fused_step,
    )

    env = LunarLander()
    world = env.world.replace(
        config=dataclasses.replace(env.world.config, broadphase=False)
    )
    assert supports_fused_step(world)
    B = 128
    assert fused_tile_for(world.table.n_contacts, B, bwd=True) is not None
    # guard against a vacuous pass: the bwd kernel gate also requires a
    # sublane-aligned contact table (Mosaic concat-transpose limitation)
    assert world.table.n_contacts % 8 == 0
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(5), B))
    bodies = states.bodies.replace(
        pos=states.bodies.pos - jnp.asarray([0.0, 6.2])[None, None, :],
    )
    states = states.replace(bodies=bodies)
    step = jax.jit(env.step_batch)
    for _ in range(35):
        states, _ = step(states, jnp.zeros((B, 2)))
    s = _to_soa(states.bodies)
    tflat = jnp.swapaxes(states.terrain, 0, 1)
    tp = tflat.reshape(7, 8, 2, B)
    tox = tp[:, :, 0, :]
    toy = tp[:, :, 1, :]
    parts = list(env._ground_parts)

    def loss_pallas(s_in, tox, toy):
        override = {p: (tox[i], toy[i]) for i, p in enumerate(parts)}
        out, _ = physics_core_pallas(
            world, s_in, terrain_override=override, interpret=True
        )
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    def loss_xla(s_in, tox, toy):
        override = {p: (tox[i], toy[i]) for i, p in enumerate(parts)}
        out, _ = physics_core(world, s_in, terrain_override=override)
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    monkeypatch.setenv("PARALLAX_PALLAS_BWD", "1")
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(s, tox, toy)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(s, tox, toy)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        a = np.asarray(getattr(gp[0], f))
        b = np.asarray(getattr(gx[0], f))
        assert np.abs(b).max() > 0  # gradient alive
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=f"d{f}")
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gx[1]), rtol=2e-4, atol=1e-5,
        err_msg="d_terrain_x",
    )
    np.testing.assert_allclose(
        np.asarray(gp[2]), np.asarray(gx[2]), rtol=2e-4, atol=1e-5,
        err_msg="d_terrain_y",
    )


def test_pallas_solver_with_joints_matches_jax_path(contact_state):
    """with_joints=True == solve_contacts_bm + apply_joints_bm."""
    from parallax_tpu.engine.batched import apply_joints_bm

    world, s, con = contact_state
    assert world.joints.n_joints > 0
    ref = jax.jit(
        lambda s, c: apply_joints_bm(
            world,
            solve_contacts_bm(world, s, c, 3, 2, 0.01, world.config.contact),
        )
    )(s, con)
    got = jax.jit(
        lambda s, c: solve_contacts_pallas(
            world, s, c, 3, 2, 0.01, world.config.contact,
            interpret=True, with_joints=True,
        )
    )(s, con)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), atol=1e-5
        )


def test_pallas_solver_with_joints_grad(contact_state):
    world, s, con = contact_state

    def loss(vy0):
        s2 = s._replace(vy=s.vy + vy0)
        out = solve_contacts_pallas(
            world, s2, con, 3, 2, 0.01, world.config.contact,
            interpret=True, with_joints=True,
        )
        return (out.vy**2).mean()

    g = jax.grad(loss)(jnp.zeros(()))
    assert np.isfinite(np.asarray(g))


@pytest.mark.parametrize("with_joints", [False, True])
def test_pallas_bwd_kernel_matches_xla_vjp(contact_state, with_joints):
    """The Pallas BACKWARD kernel (recompute + jax.vjp of solve_arrays in
    VMEM) agrees with the XLA twin's vjp on every state plane AND the
    contact penetration/point planes.  Both differentiate value-identical
    forwards, so the two VJPs may differ only at reassociation-ULP level."""
    from parallax_tpu.engine.batched import apply_joints_bm
    from parallax_tpu.ops.pallas_solver import tile_for

    world, s, con = contact_state
    # guard against vacuous pass: if the bwd tile model ever rejects this
    # fixture the pallas path would silently fall back to the XLA vjp and
    # this test would compare XLA against itself (ADVICE r4)
    assert tile_for(
        world.table.n_contacts, s.vx.shape[-1], bwd=True, total_iterations=5
    ) is not None

    def loss_pallas(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = solve_contacts_pallas(
            world, s_in, c2, 3, 2, 0.01, world.config.contact,
            interpret=True, with_joints=with_joints, pallas_bwd=True,
        )
        return sum(
            (getattr(out, f) ** 2).sum()
            for f in ("px", "py", "vx", "vy", "angle", "omega")
        )

    def loss_xla(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = solve_contacts_bm(world, s_in, c2, 3, 2, 0.01, world.config.contact)
        if with_joints:
            out = apply_joints_bm(world, out)
        return sum(
            (getattr(out, f) ** 2).sum()
            for f in ("px", "py", "vx", "vy", "angle", "omega")
        )

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(s, con.pen_x, con.pt_x)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(s, con.pen_x, con.pt_x)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        a = np.asarray(getattr(gp[0], f))
        b = np.asarray(getattr(gx[0], f))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=f"d{f}")
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gx[1]), rtol=2e-4, atol=1e-5,
        err_msg="dpen_x",
    )
    np.testing.assert_allclose(
        np.asarray(gp[2]), np.asarray(gx[2]), rtol=2e-4, atol=1e-5,
        err_msg="dpt_x",
    )


def test_pallas_bwd_cotangent_structure(contact_state):
    """The kernel-path bwd returns the same cotangent STRUCTURE as jax.vjp
    of the XLA twin: float0 for the bool ``active`` plane, dense zeros for
    the unused ``weight`` plane (solve_contacts_bm never reads weight)."""
    world, s, con = contact_state

    def run(pb):
        def f(ss, cc):
            return solve_contacts_pallas(
                world, ss, cc, 3, 2, 0.01, world.config.contact,
                interpret=True, pallas_bwd=pb,
            )

        out, vjp = jax.vjp(f, s, con)
        return vjp(jax.tree.map(jnp.ones_like, out))

    ds_p, dcon_p = run(True)
    ds_x, dcon_x = run(False)
    assert dcon_p.active.dtype == dcon_x.active.dtype  # float0
    np.testing.assert_array_equal(
        np.asarray(dcon_p.weight), np.zeros_like(np.asarray(dcon_p.weight))
    )
    np.testing.assert_allclose(
        np.asarray(dcon_p.pen_y), np.asarray(dcon_x.pen_y), rtol=2e-4,
        atol=1e-5,
    )


def test_pallas_solver_big_contact_table(contact_state):
    """C > 256 takes the unbundled (per-component matmul) branch — the
    bundled [C, 3*TB] concats blew VMEM on the 48-ball world (C=1320,
    208MB register spills).  Interpret-mode equivalence on a 24-ball
    billiards world keeps that branch covered."""
    from parallax_tpu.envs.billiards import Billiards, BilliardsConfig

    env = Billiards(BilliardsConfig(n_object=23))
    world = env.world
    C = world.table.n_contacts
    assert C > 256, f"need the big-C branch, got C={C}"
    B = TILE_B
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(2), B))
    # squeeze the rack gently so ball pairs overlap shallowly (deep
    # interpenetrations make the 2x2 block-case branches flip on ULP
    # differences, which is not what this test is about)
    mv = jnp.isfinite(world.params.mass)[None, :, None]
    bodies = states.bodies.replace(
        pos=jnp.where(mv, states.bodies.pos * 0.9, states.bodies.pos),
        vel=states.bodies.vel
        + jax.random.normal(jax.random.PRNGKey(3), states.bodies.vel.shape)
        * 0.5 * mv,
    )
    s = _to_soa(bodies)
    con = jax.jit(lambda s: collide_batched(world, s))(s)
    assert int(con.active.sum()) > 0
    ref = jax.jit(
        lambda s, c: solve_contacts_bm(
            world, s, c, world.config.solver_iterations,
            world.config.position_iterations, world.config.dt,
            world.config.contact,
        )
    )(s, con)
    got = jax.jit(
        lambda s, c: solve_contacts_pallas(
            world, s, c, world.config.solver_iterations,
            world.config.position_iterations, world.config.dt,
            world.config.contact, interpret=True,
        )
    )(s, con)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), atol=3e-5
        )


def test_tile_for_budgets():
    """Host-side tile selection: shrinks with the contact-table size,
    honors batch divisibility, returns None when nothing fits."""
    import os

    if os.environ.get("PARALLAX_TILE_B"):
        pytest.skip("expectations assume the default TILE_B cap")
    from parallax_tpu.ops.pallas_solver import TILE_B, tile_for

    assert tile_for(52, 8192) == TILE_B  # lander: full tile
    assert tile_for(1320, 8192, any_partner=True) == 256  # 48-ball world
    # leaner kernel; 256 not 512 under the default split3 dots (the split
    # live multiplier — billiards48 VMEM-failed at 512 on hardware, r5)
    assert tile_for(1320, 8192, any_partner=False) == 256
    assert tile_for(52, 8192 + 128) == 128  # odd batch: only 128 divides
    assert tile_for(10**6, 8192) is None  # nothing fits -> XLA fallback
    assert tile_for(52, 100) is None  # batch not tileable
    # bwd live set scales with solver iterations (ADVICE r4): a world with
    # many iterations must get a smaller tile, not a VMEM compile failure
    t_default = tile_for(300, 8192, bwd=True)  # live=150 -> tile 512
    t_heavy = tile_for(300, 8192, bwd=True, total_iterations=21)  # live=360
    assert t_default is not None and t_heavy is not None
    assert t_heavy < t_default
    assert tile_for(300, 8192, bwd=True, total_iterations=500) is None


def test_fused_tile_for_budgets():
    """The FUSED step keeps more live per contact lane (collide temps +
    state/terrain planes) — measured 16.97MB scoped at RoboCup's C=70,
    tile 1024 — so its tile model is separate from the solver's."""
    import os

    if os.environ.get("PARALLAX_TILE_B"):
        pytest.skip("expectations assume the default TILE_B cap")
    from parallax_tpu.ops.pallas_step import fused_tile_for

    assert fused_tile_for(52, 8192) == 1024  # lander
    assert fused_tile_for(70, 8192) == 1024  # robocup (needs raised limit)
    # 48-ball world: 128 under the split3 live multiplier (round 5)
    assert fused_tile_for(1320, 8192) == 128
    assert fused_tile_for(10**6, 8192) is None  # nothing fits -> split path
    assert fused_tile_for(52, 100) is None  # batch not tileable
    # fused BACKWARD kernel live model (round 5, hardware-calibrated:
    # 145.5MB at tile 1024 on the lander -> tile 512)
    assert fused_tile_for(52, 8192, bwd=True) == 512
    t_heavy = fused_tile_for(52, 8192, bwd=True, total_iterations=40)
    assert t_heavy is not None and t_heavy < 512


def test_split_dot_exactness_and_cotangents():
    """The split3 one-hot dot (DESIGN §7e) is exactly a @ b for 0/1 a —
    forward AND backward (the custom_vjp must not round cotangents to
    bf16; that bug broke hardware gradient parity at 2e-2 before the fix)."""
    from parallax_tpu.ops.pallas_solver import _make_split_dot

    rng = np.random.RandomState(0)
    a = (rng.rand(24, 16) < 0.2).astype(np.float32)
    b = (rng.randn(16, 64) * np.exp(rng.randn(16, 64) * 3)).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    dot3 = _make_split_dot(3)
    got = np.asarray(dot3(aj, bj))
    want = a.astype(np.float64) @ b.astype(np.float64)
    # each product term is EXACT (the three components reconstruct b
    # losslessly); rows with several ones accumulate exact terms in f32,
    # so agreement with the f64 reference is summation-ULP, and rows with
    # a single one are bitwise
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)
    single = a.sum(1) == 1
    np.testing.assert_array_equal(
        got[single], want.astype(np.float32)[single]
    )

    g = (rng.randn(24, 64)).astype(np.float32)

    def loss(b_):
        return jnp.vdot(dot3(aj, b_), jnp.asarray(g))

    db = np.asarray(jax.grad(loss)(bj))
    want_db = (a.T.astype(np.float64) @ g.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(db, want_db, rtol=1e-5)
    single_t = a.sum(0) == 1
    np.testing.assert_array_equal(db[single_t], want_db[single_t])
    # split2 keeps ~16 mantissa bits per TERM; cancellation can inflate
    # plain relative error, so measure against the term-magnitude scale
    dot2 = _make_split_dot(2)
    got2 = np.asarray(dot2(aj, bj))
    scale = np.abs(a).astype(np.float64) @ np.abs(b).astype(np.float64)
    err = np.abs(got2 - want) / np.maximum(scale, 1e-30)
    assert err.max() < 3e-5, err.max()


def test_build_operands_any_partner_flag():
    from parallax_tpu.envs.billiards import Billiards
    from parallax_tpu.ops.pallas_solver import _build_operands

    assert _build_operands(LunarLander().world)["any_partner"] is True
    assert _build_operands(Billiards().world)["any_partner"] is False


def _overlap_state(env, B, key, edge_x, spacing, y_step):
    """Reset states jittered into guaranteed overlaps: pile the dynamic
    bodies on top of each other near the +x arena edge so circle-circle,
    circle-wall and area-containment lanes all fire."""
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(key), B))
    s = _to_soa(states.bodies)
    n = s.px.shape[0]
    jit_x = 0.01 * jnp.sin(jnp.arange(B, dtype=jnp.float32))[None]
    jit_y = 0.01 * jnp.cos(jnp.arange(B, dtype=jnp.float32))[None]
    rows = jnp.arange(n, dtype=jnp.float32)[:, None]
    static = jnp.asarray([1.0 if b else 0.0 for b in env.world.static_bodies])[:, None]
    px = edge_x - spacing * rows + jit_x
    py = y_step * rows - y_step * n / 2 + jit_y
    vx = 0.5 - 0.1 * rows
    vy = 0.3 - 0.05 * rows
    return s._replace(
        px=jnp.where(static > 0, s.px, px),
        py=jnp.where(static > 0, s.py, py),
        vx=jnp.where(static > 0, s.vx, vx),
        vy=jnp.where(static > 0, s.vy, vy),
    )


def test_fused_step_kernel_circle_box_worlds():
    """Round-3 extension: the fused kernel on cc/cb/bb/area_cb pair groups
    (RoboCup: circles + goal boxes + box area; billiards: circles + wall
    boxes) matches physics_core bit-for-bit in interpreter mode."""
    from parallax_tpu.engine.batched import physics_core
    from parallax_tpu.ops.pallas_step import (
        physics_core_pallas,
        supports_fused_step,
    )
    from parallax_tpu.envs.billiards import Billiards
    from parallax_tpu.envs.robocup import RoboCup

    B = TILE_B
    # edge_x at the arena's +x boundary so wall/area lanes fire too
    for env, key, edge_x, spacing, y_step in (
        (RoboCup(), 2, 5.15, 0.07, 0.05),
        (Billiards(), 3, 1.0, 0.03, 0.02),
    ):
        world = env.world
        kernels = {g.kernel for g in world.table.groups}
        assert kernels & {"cc", "cb"}, kernels  # the new fused family
        assert supports_fused_step(world), kernels
        s = _overlap_state(env, B, key, edge_x, spacing, y_step)
        ref_s, ref_c = jax.jit(lambda s, w=world: physics_core(w, s))(s)
        got_s, got_c = jax.jit(
            lambda s, w=world: physics_core_pallas(w, s, interpret=True)
        )(s)
        for f in ("px", "py", "vx", "vy", "angle", "omega"):
            np.testing.assert_allclose(
                np.asarray(getattr(ref_s, f)), np.asarray(getattr(got_s, f)),
                atol=1e-5, err_msg=f"{type(env).__name__}.{f}",
            )
        np.testing.assert_array_equal(
            np.asarray(ref_c.active), np.asarray(got_c.active)
        )
        assert int(np.asarray(ref_c.active).sum()) > 0


def test_fused_step_kernel_bb_group():
    """Synthetic world with a dynamic box-box pair group (no shipping env
    has one): two overlapping AABB crates + a circle on top."""
    from parallax_tpu.engine.batched import physics_core
    from parallax_tpu.engine.world import BodyDef, World, WorldConfig
    from parallax_tpu.geometry.shapes import box, circle
    from parallax_tpu.ops.pallas_step import (
        physics_core_pallas,
        supports_fused_step,
    )

    bodies = [
        BodyDef(shapes=[box((-0.6, -0.4), (0.6, 0.4))], mass=2.0, inertia=1.0,
                position=(0.0, 0.0), velocity=(0.2, 0.0)),
        BodyDef(shapes=[box((-0.5, -0.5), (0.5, 0.5))], mass=1.5, inertia=0.8,
                position=(0.7, 0.2), velocity=(-0.3, 0.1)),
        BodyDef(shapes=[circle(0.3)], mass=1.0, inertia=0.2,
                position=(0.3, 0.8), velocity=(0.0, -0.5)),
        BodyDef(shapes=[box((-3.0, -0.3), (3.0, 0.0))], mass=np.inf,
                inertia=np.inf, position=(0.0, -0.6)),
    ]
    world, st = World.build(bodies, WorldConfig(gravity=(0.0, -1.0)))
    kernels = {g.kernel for g in world.table.groups}
    assert "bb" in kernels and "cb" in kernels, kernels
    assert supports_fused_step(world)

    B = TILE_B
    s = _to_soa(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    )
    # per-world jitter so lanes differ across the batch
    s = s._replace(px=s.px + 0.02 * jnp.sin(jnp.arange(B, dtype=jnp.float32))[None])
    ref_s, ref_c = jax.jit(lambda s: physics_core(world, s))(s)
    got_s, got_c = jax.jit(
        lambda s: physics_core_pallas(world, s, interpret=True)
    )(s)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref_s, f)), np.asarray(getattr(got_s, f)),
            atol=1e-5, err_msg=f,
        )
    np.testing.assert_array_equal(
        np.asarray(ref_c.active), np.asarray(got_c.active)
    )
    assert int(np.asarray(ref_c.active).sum()) > 0
