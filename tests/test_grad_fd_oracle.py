"""Finite-difference gradient oracle (round-5 VERDICT #2).

Every earlier gradient test asserted finite / right-sign / nonzero, or
Pallas-vs-XLA vjp agreement — internal consistency that a shared formula
error passes.  This file validates gradient VALUES:

* against closed-form derivatives where they exist (free fall);
* against central differences of the SAME pipeline (catches a wrong
  backward rule wherever autodiff is structurally involved: custom_vjp
  boundaries, scan transposes, the Pallas bwd kernel);
* against central differences of ``tests/ref_oracle_numpy.py`` — the
  no-jax reference transcription — so the backward finally has an
  expected value this repo's JAX code did NOT produce (the analogue of
  what round 4 built for the forward numerics).

Tolerance methodology (mirrors test_numpy_oracle's ULP-envelope
derivations): all pipelines are float32, losses are O(1).  A central
difference with step ``h`` carries truncation error O(h^2 f''') and
roundoff error O(ulp/h) ~ 1e-7/h.  h=1e-2 balances both at ~1e-4
absolute on O(1) gradients -> FD-vs-grad rtol 1e-2 where the trajectory
is smooth.  Across a bounce the oracle and the pipeline additionally
carry the documented ~2e-3 bounded value divergence (EPA edge-split
flips, test_numpy_oracle.py), which differentiates into a few-percent
gradient envelope -> oracle-FD rtol 0.1.  Each contact test asserts the
perturbed trajectories keep the SAME first-contact step so the FD stencil
never straddles the (legitimately nondifferentiable) contact-timing
discontinuity.

Reference intent: /root/reference/cotix/_collisions.py:99-102 keeps its
while-loops checkpointed precisely so gradients flow through contacts;
BASELINE config 5's "grad-through-step check" is the contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallax_tpu.dynamics.impulses import ContactSolverConfig
from parallax_tpu.engine.world import BodyDef, World, WorldConfig
from parallax_tpu.geometry.shapes import circle, polygon

from tests.ref_oracle_numpy import Body, circle_vs_polygon, f32, order_clockwise, step_world
from tests.test_numpy_oracle import GROUND_VERTS_RAW, _gjk_seed_direction

DT = 0.01
GRAV_BOUNCE = (0.0, -2.0)
BALL0 = dict(pos=(0.0, 0.8), vel=(0.3, -1.0), elasticity=0.8, friction=0.1)


def _bounce_world(**wc_kw):
    ball = BodyDef(shapes=[circle(0.5)], mass=1.0, inertia=0.1,
                   position=BALL0["pos"], velocity=BALL0["vel"],
                   elasticity=BALL0["elasticity"], friction=BALL0["friction"])
    ground = BodyDef(shapes=[polygon(GROUND_VERTS_RAW)], mass=np.inf,
                     inertia=np.inf, elasticity=0.5, friction=0.3)
    return World.build([ball, ground], WorldConfig(
        dt=DT, gravity=GRAV_BOUNCE, **wc_kw))


def _rollout_final(world, state, vy0, n_steps, seed=42):
    """Final ball (py, vy) after ``n_steps`` with the ball's initial vy
    shifted by ``vy0`` (the differentiation variable)."""
    state = state.replace(
        vel=state.vel.at[0, 1].add(vy0)
    )

    def f(carry, key):
        s, _ = carry
        s, c = world.step(s, key=key)
        return (s, c), None

    keys = jax.random.split(jax.random.PRNGKey(seed), n_steps)
    (s, _), _ = jax.lax.scan(f, (state, world.detect_contacts(state)), keys)
    return s.pos[0, 1], s.vel[0, 1]


def _central_fd(fn, x0, h):
    return (fn(x0 + h) - fn(x0 - h)) / (2.0 * h)


# ---------------------------------------------------------------------------
# (a) smooth no-contact segment: closed form + FD
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["default", "reference"])
def test_freefall_grad_closed_form(mode):
    """No contact: py_T = py0 + sum_k vy_k dt with vy_k = vy0 + k g dt
    (integrate-then-gravity order, PARITY.md), so d py_T / d vy0 = T*dt
    EXACTLY — a closed-form external expectation for jax.grad."""
    if mode == "reference":
        kw = dict(integrator="reference", narrowphase="gjk_epa",
                  solver_mode="random_one_per_body",
                  contact=ContactSolverConfig.reference(), broadphase=False)
    else:
        kw = {}
    world, state = _bounce_world(**kw)
    # lift the ball so 20 steps stay contact-free
    state = state.replace(pos=state.pos.at[0, 1].set(5.0))
    T = 20

    def loss(vy0):
        py, _ = _rollout_final(world, state, vy0, T)
        return py

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    np.testing.assert_allclose(g, T * DT, rtol=1e-5)
    fd = float(_central_fd(lambda v: loss(jnp.float32(v)), 0.0, 1e-2))
    np.testing.assert_allclose(fd, T * DT, rtol=1e-3)


# ---------------------------------------------------------------------------
# (b) across a single bounce: pipeline grad vs pipeline FD vs ORACLE FD
# ---------------------------------------------------------------------------


def _oracle_final(vy0, n_steps):
    """The numpy transcription run end-to-end: final ball (py, vy)."""
    dir0 = _gjk_seed_direction()
    ground_verts = order_clockwise(f32(GROUND_VERTS_RAW))
    ball = Body(pos=BALL0["pos"], vel=(BALL0["vel"][0], BALL0["vel"][1] + vy0),
                angle=0.0, omega=0.0, mass=1.0, inertia=0.1,
                elasticity=BALL0["elasticity"], friction=BALL0["friction"])
    ground = Body(pos=(0.0, 0.0), vel=(0.0, 0.0), angle=0.0, omega=0.0,
                  mass=np.inf, inertia=np.inf, elasticity=0.5, friction=0.3)
    bodies = [ball, ground]

    first_contact = None

    def detect(bodies):
        info = circle_vs_polygon(bodies[0].pos, 0.5, ground_verts, dir0)
        if info.isnan():
            return {}
        return {0: (1, info), 1: (0, info.invert())}

    for step in range(n_steps):
        had = len(detect(bodies)) > 0
        bodies = step_world(bodies, detect, dt=DT, gravity=GRAV_BOUNCE)
        if had and first_contact is None:
            first_contact = step
    return bodies[0].pos[1], bodies[0].vel[1], first_contact


def test_bounce_grad_matches_oracle_fd():
    """Gradient through ONE ground bounce, reference mode: jax.grad of the
    pipeline vs central differences of (i) the pipeline itself and
    (ii) the external numpy oracle.

    Constants from the round-5 smoothness probe (first contact at step
    25): T=26 closes the loss two steps after the impact, inside a single
    smooth piece.  The function HAS a genuine jump at vy0 ~ +0.0075 (the
    impact shifts a step), so H=3e-3 — the probe showed FD(h<=3e-3)
    agreeing with jax.grad to 3e-4 relative while FD(1e-2) straddles the
    jump and reads +0.55 where the true slope is -4.20.  At T>=28 the ball
    re-enters resting contact (micro-bounces) and per-step contact flips
    make ANY stencil invalid — grad stays the correct piecewise
    derivative but FD measures jump averages; do not "fix" a failure here
    by raising T.  Measured agreement at these constants: grad_py
    0.207379 vs oracle-FD 0.207355 (1.2e-4 rel); grad_vy -4.20426 vs
    oracle-FD -4.20138 (6.9e-4 rel)."""
    world, state = _bounce_world(
        integrator="reference", narrowphase="gjk_epa",
        solver_mode="random_one_per_body",
        contact=ContactSolverConfig.reference(), broadphase=False)
    T, H = 26, 3e-3

    @jax.jit
    def loss_py(vy0):
        return _rollout_final(world, state, vy0, T)[0]

    @jax.jit
    def loss_vy(vy0):
        return _rollout_final(world, state, vy0, T)[1]

    g_py = float(jax.grad(loss_py)(jnp.float32(0.0)))
    g_vy = float(jax.grad(loss_vy)(jnp.float32(0.0)))

    fd_py = float(_central_fd(lambda v: loss_py(jnp.float32(v)), 0.0, H))
    fd_vy = float(_central_fd(lambda v: loss_vy(jnp.float32(v)), 0.0, H))

    # oracle FD (plus stencil-validity guard: same first-contact step)
    py_p, vy_p, c_p = _oracle_final(+H, T)
    py_m, vy_m, c_m = _oracle_final(-H, T)
    assert c_p == c_m and c_p is not None, (
        f"FD stencil straddles a contact-timing flip: {c_p} vs {c_m}"
    )
    ofd_py = (py_p - py_m) / (2 * H)
    ofd_vy = (vy_p - vy_m) / (2 * H)

    # the bounce really is inside the loss: the py slope differs from the
    # free-fall closed form T*dt and the vy slope is far from gravity's -0
    assert abs(g_py - T * DT) > 0.05
    assert abs(g_vy) > 1.0

    # pipeline grad vs its own FD: smooth-region envelope
    np.testing.assert_allclose(g_py, fd_py, rtol=1e-2, atol=2e-4)
    np.testing.assert_allclose(g_vy, fd_vy, rtol=1e-2, atol=2e-4)
    # pipeline grad vs EXTERNAL oracle FD: adds the documented ~2e-3
    # bounded value divergence across contact steps (largely common-mode
    # in a central stencil)
    np.testing.assert_allclose(g_py, ofd_py, rtol=2e-2, atol=5e-4)
    np.testing.assert_allclose(g_vy, ofd_vy, rtol=2e-2, atol=5e-4)


def test_bounce_grad_default_solver_fd():
    """Same single-bounce scenario on the DEFAULT pipeline (SAT narrowphase
    + accumulated-impulse block solver): jax.grad vs central FD of the
    same function."""
    world, state = _bounce_world()
    T, H = 40, 1e-2

    @jax.jit
    def loss(vy0):
        py, vy = _rollout_final(world, state, vy0, T)
        return py + 0.5 * vy

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    fd = float(_central_fd(lambda v: loss(jnp.float32(v)), 0.0, H))
    assert abs(g) > 1e-3
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=2e-4)


# ---------------------------------------------------------------------------
# Pallas fwd+bwd kernels under FD (interpret mode; hardware parity of the
# same kernels is tools/tpu_smoke_bwd.py, run on the real chip in round 5)
# ---------------------------------------------------------------------------


def test_bounce_grad_pallas_kernel_fd():
    """30-step bounce rollout where EVERY step solves contacts with the
    Pallas kernel pair (fwd kernel + bwd kernel via custom_vjp,
    interpret=True): jax.grad vs central FD, plus agreement with the XLA
    batched path's gradient."""
    from parallax_tpu.engine.batched import (
        _from_soa, _to_soa, collide_batched, solve_contacts_bm,
    )
    from parallax_tpu.ops.pallas_solver import solve_contacts_pallas, tile_for

    world, state0 = _bounce_world()
    B = 128  # smallest pallas tile
    cfg = world.config
    assert tile_for(world.table.n_contacts, B, bwd=True) is not None

    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), state0)
    s0 = _to_soa(sb)
    T, H = 30, 1e-2
    mov = jnp.isfinite(world.params.mass).astype(jnp.float32)[:, None]

    def make_loss(use_pallas):
        def step(s):
            s = s._replace(px=s.px + s.vx * DT, py=s.py + s.vy * DT,
                           angle=s.angle + s.omega * DT)
            s = s._replace(vy=s.vy + GRAV_BOUNCE[1] * DT * mov)
            con = collide_batched(world, s)
            if use_pallas:
                return solve_contacts_pallas(
                    world, s, con, cfg.solver_iterations,
                    cfg.position_iterations, DT, cfg.contact,
                    interpret=True, pallas_bwd=True,
                )
            return solve_contacts_bm(
                world, s, con, cfg.solver_iterations,
                cfg.position_iterations, DT, cfg.contact,
            )

        def loss(vy0):
            s = s0._replace(vy=s0.vy.at[0].add(vy0))
            for _ in range(T):
                s = step(s)
            return s.py[0, 0] + 0.5 * s.vy[0, 0]

        return loss

    loss_p = jax.jit(make_loss(True))
    loss_x = jax.jit(make_loss(False))
    g_p = float(jax.grad(loss_p)(jnp.float32(0.0)))
    g_x = float(jax.grad(loss_x)(jnp.float32(0.0)))
    fd = float(_central_fd(lambda v: loss_x(jnp.float32(v)), 0.0, H))
    assert abs(g_p) > 1e-3
    # kernel-pair gradient vs the XLA twin's: value-identical forwards
    np.testing.assert_allclose(g_p, g_x, rtol=1e-3, atol=1e-5)
    # and both must match reality (central FD)
    np.testing.assert_allclose(g_p, fd, rtol=2e-2, atol=2e-4)


# ---------------------------------------------------------------------------
# (c) thrust parameter through a 20-step lander rollout
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pipeline", ["default", "reference"])
def test_lander_thrust_grad_fd(pipeline):
    """d(final hull height)/d(thrust scale) through 20 full env steps
    (thrust kick + physics + joints + reward plumbing): jax.grad vs
    central FD on the same pipeline.  Covers the env-layer backward
    (plane hooks, joint vjp) that the bounce tests don't."""
    from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander

    if pipeline == "reference":
        env = LunarLander(LanderConfig(
            narrowphase="gjk_epa", solver_mode="random_one_per_body",
            contact=ContactSolverConfig.reference(), broadphase=False))
    else:
        env = LunarLander()
    B, T, H = 2, 20, 1e-2
    states = jax.vmap(env.reset_fn)(jax.random.split(jax.random.PRNGKey(3), B))

    @jax.jit
    def loss(theta):
        def f(s, t):
            act = jnp.tile(jnp.stack([theta, 0.0 * theta])[None], (B, 1))
            s, _ = jax.vmap(env.step)(s, act)
            return s, None

        s, _ = jax.lax.scan(f, states, jnp.arange(T))
        return s.bodies.pos[:, 0, 1].mean()

    theta0 = jnp.float32(0.6)  # inside the accel-limit band (CLAUDE.md #5)
    g = float(jax.grad(loss)(theta0))
    fd = float(_central_fd(lambda v: loss(jnp.float32(v)), 0.6, H))
    assert abs(g) > 1e-4, "thrust gradient must be alive (not a clipped zero)"
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=2e-4)
