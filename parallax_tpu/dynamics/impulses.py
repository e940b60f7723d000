"""Impulse-based contact resolution — the reference's exact math, batched.

Formula-level port of resolve_collision_notnan / apply_impulse
(/root/reference/cotix/_collision_resolution.py:68-151):

* restitution ``e = min(e1, e2)``;
* Baumgarte positional stabilization folded into the normal impulse with
  coefficient 0.3 and the reference's hardcoded ``dt = 0.01`` (here a
  parameter, defaulting to the reference value);
* effective-mass denominator ``1/m1 + 1/m2 + |r1|^2/I1 + |r2|^2/I2``
  (note: the reference uses the full lever-arm norm, not the textbook
  ``(r x n)^2`` — replicated for parity; a textbook mode is provided);
* friction impulse along the reference's ``v_rel + v_n n`` drag direction
  clamped by ``mu = (mu1+mu2)/2`` (again replicated; textbook tangential
  mode available);
* the whole update is skipped when ``dot(pen, v_rel) < 0`` (bodies already
  separating).

Everything returns velocity *deltas* so contacts can be accumulated
Jacobi-style or applied sequentially (Gauss-Seidel) by the solver.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from parallax_tpu.geometry.math import cross2, perpendicular_vector, safe_norm


@dataclasses.dataclass(frozen=True)
class ContactSolverConfig:
    """Static solver configuration (participates in jit specialization)."""

    baumgarte: float = 0.3
    baumgarte_dt: float = 0.01  # reference hardcodes /0.01 (_collision_resolution.py:115)
    # Positional-correction hygiene the reference lacks: without a slop and
    # a bias-velocity clamp the folded-in Baumgarte term acts as a
    # trampoline on deep impacts (it converts penetration depth directly
    # into exit velocity).  reference() zeroes both.
    baumgarte_slop: float = 0.005
    baumgarte_max_bias: float = 0.5
    # Defaults are the *textbook* formulas; set "reference" for parity with
    # the reference's variants (|r|^2 lever arm over-damps head-on
    # collisions — an elastic pair can never cleanly exchange velocities —
    # and its drag direction includes the normal component,
    # _collision_resolution.py:109-127).
    friction_mode: str = "tangent"  # "tangent" | "reference"
    restitution_mode: str = "min"  # "min" (reference) | "mean"
    lever_mode: str = "textbook"  # "textbook" ((r x n)^2) | "reference" (|r|^2)

    @classmethod
    def reference(cls) -> "ContactSolverConfig":
        """Bit-for-bit the reference's resolve_collision_notnan formulas

        (_collision_resolution.py:76-151)."""
        return cls(
            baumgarte_slop=0.0,
            baumgarte_max_bias=None,
            friction_mode="reference",
            restitution_mode="min",
            lever_mode="reference",
        )


DEFAULT_SOLVER = ContactSolverConfig()


def impulse_deltas(
    impulse,
    point,
    pos,
    inv_mass,
    inv_inertia,
):
    """(dvel, domega) from applying ``impulse`` at world ``point``.

    Reference apply_impulse (_collision_resolution.py:68-73):
    ``v += J/m``, ``omega += (r x J)/I``.  All args broadcast.
    """
    arm = point - pos
    torque = cross2(arm, impulse)
    return impulse * inv_mass[..., None], torque * inv_inertia


def contact_impulse(
    pen,
    point,
    active,
    pos_a,
    vel_a,
    omega_a,
    pos_b,
    vel_b,
    omega_b,
    inv_mass_a,
    inv_inertia_a,
    elasticity_a,
    friction_a,
    inv_mass_b,
    inv_inertia_b,
    elasticity_b,
    friction_b,
    config: ContactSolverConfig = DEFAULT_SOLVER,
):
    """Total impulse J applied to body B at ``point`` (body A receives -J).

    Sign conventions follow the reference exactly: ``pen`` points from B
    toward A (see geometry.contacts), the normal impulse scalar comes out
    negative for approaching bodies, and body1(A)/body2(B) receive -J/+J
    (_collision_resolution.py:141-147).  Returns (J [.., 2], applied [..]
    bool).
    """
    dtype = pen.dtype
    depth = safe_norm(pen, axis=-1)
    safe_depth = jnp.where(depth == 0, 1.0, depth)
    normal = pen / safe_depth[..., None]

    v_ca = vel_a + perpendicular_vector(point - pos_a) * omega_a[..., None]
    v_cb = vel_b + perpendicular_vector(point - pos_b) * omega_b[..., None]
    v_rel = v_cb - v_ca
    v_n = jnp.sum(v_rel * normal, axis=-1)

    if config.restitution_mode == "min":
        e = jnp.minimum(elasticity_a, elasticity_b)
    else:
        e = (elasticity_a + elasticity_b) / 2

    r1 = point - pos_a
    r2 = point - pos_b
    if config.lever_mode == "reference":
        ang = jnp.sum(r1**2, axis=-1) * inv_inertia_a + jnp.sum(
            r2**2, axis=-1
        ) * inv_inertia_b
    else:
        ang = cross2(r1, normal) ** 2 * inv_inertia_a + cross2(r2, normal) ** 2 * inv_inertia_b

    k = inv_mass_a + inv_mass_b + ang
    safe_k = jnp.where(k == 0, 1.0, k)

    bias = (
        config.baumgarte
        * jnp.maximum(depth - config.baumgarte_slop, 0.0)
        / config.baumgarte_dt
    )
    if config.baumgarte_max_bias is not None:
        bias = jnp.minimum(bias, config.baumgarte_max_bias)
    j_n = (-(1.0 + e) * v_n - bias) / safe_k
    impulse = j_n[..., None] * normal

    mu = (friction_a + friction_b) / 2
    if config.friction_mode == "reference":
        # reference drag direction: v_rel + v_n * n (_collision_resolution.py:124-127)
        vel_drag = v_rel + v_n[..., None] * normal
    else:
        vel_drag = v_rel - v_n[..., None] * normal
    vd_norm = safe_norm(vel_drag, axis=-1)
    vd_unit = vel_drag / jnp.where(vd_norm == 0, 1.0, vd_norm)[..., None]
    if config.friction_mode == "reference":
        # literal reference clamp (_collision_resolution.py:129-132).  Note
        # j_n < 0 in the apply branch, so clip(x<=0, 0, j_n*mu) returns
        # j_n*mu — the reference always applies the full mu*|j_n| along the
        # drag direction.
        j_d = jnp.clip(-vd_norm / safe_k, 0.0, j_n * mu)
    else:
        # proper Coulomb clamp: |j_t| <= mu*|j_n|, opposing sliding only as
        # hard as the sliding velocity warrants.
        j_d = jnp.maximum(-vd_norm / safe_k, -mu * jnp.abs(j_n))
    impulse = impulse + j_d[..., None] * vd_unit

    separating = jnp.sum(pen * v_rel, axis=-1) < 0
    applied = active & ~separating & (k > 0)
    impulse = jnp.where(applied[..., None], impulse, jnp.zeros_like(impulse))
    return impulse.astype(dtype), applied


def resolve_contact_deltas(
    pen,
    point,
    active,
    pos_a,
    vel_a,
    omega_a,
    pos_b,
    vel_b,
    omega_b,
    params_a,
    params_b,
    config: ContactSolverConfig = DEFAULT_SOLVER,
):
    """Velocity/angular deltas for both bodies from one contact.

    ``params_*`` are tuples (inv_mass, inv_inertia, elasticity, friction).
    Returns ((dvel_a, domega_a), (dvel_b, domega_b), applied).
    """
    im_a, ii_a, e_a, f_a = params_a
    im_b, ii_b, e_b, f_b = params_b
    J, applied = contact_impulse(
        pen, point, active,
        pos_a, vel_a, omega_a, pos_b, vel_b, omega_b,
        im_a, ii_a, e_a, f_a, im_b, ii_b, e_b, f_b,
        config,
    )
    dva, dwa = impulse_deltas(-J, point, pos_a, im_a, ii_a)
    dvb, dwb = impulse_deltas(J, point, pos_b, im_b, ii_b)
    return (dva, dwa), (dvb, dwb), applied
