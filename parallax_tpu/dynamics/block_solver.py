"""Sequential-impulse contact solver with 2x2 manifold block solving.

The production-grade solver (Box2D-style) the reference never had: per
contact lane an *accumulated* normal impulse (clamped >= 0) and friction
impulse (Coulomb-clamped against the accumulated normal), with the two
lanes of a polygon-face manifold solved **jointly** as a 2x2 linear
complementarity block — the piece that makes box stacks stable instead of
rocking themselves apart.

Restitution uses the pre-solve approach velocity (captured once), so
iterating never amplifies bounce; Baumgarte bias is clamped and slopped as
configured in :class:`ContactSolverConfig`.

Sweep orders:

* ``block_jacobi`` — every block solves against the current velocities each
  iteration, deltas scatter-added (fully parallel over blocks; default).
* ``block_gs``     — sequential scan over blocks per iteration (better
  convergence for long chains; serial in the block count).

Conventions: ``n̂ = pen/|pen|`` points B -> A; approach speed
``v_n = (v_B - v_A)·n̂`` is positive when closing; a normal impulse ``j >= 0``
is applied as ``+j n̂`` to A and ``-j n̂`` to B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.dynamics.bodies import BodyParams, BodyState
from parallax_tpu.dynamics.impulses import ContactSolverConfig, DEFAULT_SOLVER
from parallax_tpu.geometry.contacts import Contact
from parallax_tpu.geometry.math import perpendicular_vector, safe_norm


def _velocity_at(vel, omega, point, pos):
    return vel + perpendicular_vector(point - pos) * omega[..., None]


def solve_contacts(
    state: BodyState,
    params: BodyParams,
    contacts: Contact,
    body_a: np.ndarray,
    body_b: np.ndarray,
    partner: np.ndarray,
    iterations: int = 8,
    position_iterations: int = 3,
    dt: float = 0.01,
    order: str = "jacobi",
    restitution_threshold: float = 0.0,
    config: ContactSolverConfig = DEFAULT_SOLVER,
) -> BodyState:
    """Accumulated sequential impulses over the contact buffer.

    ``partner[c]`` = the other lane of c's 2-point manifold, or -1 for
    singleton lanes.  Manifold pairs are solved as one 2x2 block.
    """
    C = len(body_a)
    if C == 0:
        return state
    ia = jnp.asarray(body_a)
    ib = jnp.asarray(body_b)
    has_partner = partner >= 0
    ip = jnp.asarray(np.where(has_partner, partner, np.arange(C)))
    is_block_lead = jnp.asarray(has_partner & (partner > np.arange(C)))
    has_partner_j = jnp.asarray(has_partner)

    im_a, ii_a = params.inv_mass[..., ia], params.inv_inertia[..., ia]
    im_b, ii_b = params.inv_mass[..., ib], params.inv_inertia[..., ib]
    e = jnp.where(
        config.restitution_mode == "min",
        jnp.minimum(params.elasticity[..., ia], params.elasticity[..., ib]),
        (params.elasticity[..., ia] + params.elasticity[..., ib]) / 2,
    )
    mu = (params.friction[..., ia] + params.friction[..., ib]) / 2

    pen = contacts.penetration
    point = contacts.point
    active = contacts.active
    depth = safe_norm(pen, axis=-1)
    normal = pen / jnp.where(depth == 0, 1.0, depth)[..., None]
    tangent = perpendicular_vector(normal)

    pos_a = state.pos[..., ia, :]
    pos_b = state.pos[..., ib, :]
    r_a = point - pos_a
    r_b = point - pos_b
    # effective masses
    ran = r_a[..., 0] * normal[..., 1] - r_a[..., 1] * normal[..., 0]  # r_a x n
    rbn = r_b[..., 0] * normal[..., 1] - r_b[..., 1] * normal[..., 0]
    rat = r_a[..., 0] * tangent[..., 1] - r_a[..., 1] * tangent[..., 0]
    rbt = r_b[..., 0] * tangent[..., 1] - r_b[..., 1] * tangent[..., 0]
    k_n = im_a + im_b + ii_a * ran**2 + ii_b * rbn**2
    k_t = im_a + im_b + ii_a * rat**2 + ii_b * rbt**2
    # cross-coupling with the partner lane (same normal within a manifold)
    ran_p = jnp.take(ran, ip, axis=-1)
    rbn_p = jnp.take(rbn, ip, axis=-1)
    k_np = im_a + im_b + ii_a * ran * ran_p + ii_b * rbn * rbn_p
    rat_p = jnp.take(rat, ip, axis=-1)
    rbt_p = jnp.take(rbt, ip, axis=-1)
    k_tp = im_a + im_b + ii_a * rat * rat_p + ii_b * rbt * rbt_p

    inv_kn = 1.0 / jnp.where(k_n == 0, 1.0, k_n)
    inv_kt = 1.0 / jnp.where(k_t == 0, 1.0, k_t)

    def v_n_at(vel, omega):
        va = _velocity_at(vel[..., ia, :], omega[..., ia], point, pos_a)
        vb = _velocity_at(vel[..., ib, :], omega[..., ib], point, pos_b)
        rel = vb - va
        return jnp.sum(rel * normal, axis=-1), jnp.sum(rel * tangent, axis=-1)

    # restitution target from pre-solve approach speed; Baumgarte bias
    v_n0, _ = v_n_at(state.vel, state.omega)
    bias = (
        config.baumgarte
        * jnp.maximum(depth - config.baumgarte_slop, 0.0)
        / config.baumgarte_dt
    )
    if config.baumgarte_max_bias is not None:
        bias = jnp.minimum(bias, config.baumgarte_max_bias)
    rest = e * jnp.maximum(v_n0, 0.0)
    rest = jnp.where(v_n0 > restitution_threshold, rest, 0.0)
    # split-impulse: penetration recovery (bias) runs on pseudo-velocities
    # that move positions only, so it cannot inject kinetic energy — the
    # velocity solve sees restitution alone.
    split = position_iterations > 0
    target = rest if split else rest + bias  # want v_n' = -target
    target = jnp.where(active, target, 0.0)
    bias = jnp.where(active, bias, 0.0)

    n_bodies = state.pos.shape[-2]

    def apply(vel, omega, dj_n, dj_t):
        """Scatter impulse deltas (per lane scalars) into body velocities."""
        imp = dj_n[..., None] * normal + dj_t[..., None] * tangent  # on A
        dva = imp * im_a[..., None]
        dwa = (r_a[..., 0] * imp[..., 1] - r_a[..., 1] * imp[..., 0]) * ii_a
        dvb = -imp * im_b[..., None]
        dwb = -(r_b[..., 0] * imp[..., 1] - r_b[..., 1] * imp[..., 0]) * ii_b
        dvel = jax.ops.segment_sum(
            jnp.moveaxis(dva, -2, 0), ia, num_segments=n_bodies
        ) + jax.ops.segment_sum(jnp.moveaxis(dvb, -2, 0), ib, num_segments=n_bodies)
        dom = jax.ops.segment_sum(
            jnp.moveaxis(dwa, -1, 0), ia, num_segments=n_bodies
        ) + jax.ops.segment_sum(jnp.moveaxis(dwb, -1, 0), ib, num_segments=n_bodies)
        return vel + jnp.moveaxis(dvel, 0, -2), omega + jnp.moveaxis(dom, 0, -1)

    # block-solve only when both manifold lanes are active
    active_p = jnp.take(active, ip, axis=-1)
    blockable = has_partner_j & active & active_p

    def normal_pass(vel, omega, jn):
        v_n, _ = v_n_at(vel, omega)
        rhs = v_n + target  # residual: want this driven to 0 with jn >= 0

        # --- singleton (1x1) update: v' = v - k*dj  =>  dj = rhs/k
        jn_new_single = jnp.maximum(jn + rhs * inv_kn, 0.0)

        # --- 2x2 block update (lead lane solves for itself + partner)
        rhs_p = jnp.take(rhs, ip, axis=-1)
        jn_p = jnp.take(jn, ip, axis=-1)
        k_p = jnp.take(k_n, ip, axis=-1)
        inv_kp = 1.0 / jnp.where(k_p == 0, 1.0, k_p)
        # case 1: both active -> solve K x = b for the new accumulated
        # impulses, with b = K j_acc + rhs (so the post-residual is zero)
        det = k_n * k_p - k_np * k_np
        safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        b0 = k_n * jn + k_np * jn_p + rhs
        b1 = k_np * jn + k_p * jn_p + rhs_p
        x0_full = (k_p * b0 - k_np * b1) / safe_det
        x1_full = (k_n * b1 - k_np * b0) / safe_det
        ok_full = (x0_full >= 0) & (x1_full >= 0) & (jnp.abs(det) >= 1e-12)
        # case 2: partner impulse zero -> 1D solve for self
        x0_c2 = jnp.maximum(b0 * inv_kn, 0.0)
        post_r1_c2 = k_np * x0_c2 - b1  # partner residual must be >= 0
        ok_c2 = (x0_c2 >= 0) & (post_r1_c2 >= -1e-9)
        # case 3: self zero -> partner 1D
        x1_c3 = jnp.maximum(b1 * inv_kp, 0.0)
        post_r0_c3 = k_np * x1_c3 - b0
        ok_c3 = (x1_c3 >= 0) & (post_r0_c3 >= -1e-9)

        x0 = jnp.where(
            ok_full,
            x0_full,
            jnp.where(ok_c2, x0_c2, jnp.where(ok_c3, 0.0, 0.0)),
        )
        x1 = jnp.where(
            ok_full,
            x1_full,
            jnp.where(ok_c2, 0.0, jnp.where(ok_c3, x1_c3, 0.0)),
        )

        # lead lane writes both lanes; partner (non-lead) lanes take the
        # value written for them by their lead.
        jn_lead_self = x0
        jn_lead_partner = x1
        jn_from_lead = jnp.take(jn_lead_partner, ip, axis=-1)
        jn_new_block = jnp.where(is_block_lead, jn_lead_self, jn_from_lead)

        jn_new = jnp.where(blockable, jn_new_block, jn_new_single)
        jn_new = jnp.where(active, jn_new, 0.0)
        vel, omega = apply(vel, omega, jn_new - jn, jnp.zeros_like(jn))
        return vel, omega, jn_new

    def friction_pass(vel, omega, jn, jt):
        """Friction on post-normal velocities; coupled 2x2 for manifold
        lanes, then Coulomb clamp."""
        _, v_t = v_n_at(vel, omega)
        jt_single = jt + v_t * inv_kt
        k_tpd = jnp.take(k_t, ip, axis=-1)
        det_t = k_t * k_tpd - k_tp * k_tp
        # relative threshold: face manifolds have identical tangential
        # Jacobians on both points (singular); least-norm split then
        ok_det_t = jnp.abs(det_t) >= 1e-5 * k_t * k_tpd
        safe_det_t = jnp.where(ok_det_t, det_t, 1.0)
        kt_sum = k_t + k_tp
        jt_split = jt + v_t / jnp.where(kt_sum == 0, 1.0, kt_sum)
        v_t_p = jnp.take(v_t, ip, axis=-1)
        jt_p = jnp.take(jt, ip, axis=-1)
        bt0 = k_t * jt + k_tp * jt_p + v_t
        bt1 = k_tp * jt + k_tpd * jt_p + v_t_p
        xt0 = (k_tpd * bt0 - k_tp * bt1) / safe_det_t
        xt1 = (k_t * bt1 - k_tp * bt0) / safe_det_t
        jt_block = jnp.where(is_block_lead, xt0, jnp.take(xt1, ip, axis=-1))
        jt_block = jnp.where(ok_det_t, jt_block, jt_split)
        jt_new = jnp.where(blockable, jt_block, jt_single)
        lim = mu * jn
        jt_new = jnp.clip(jt_new, -lim, lim)
        jt_new = jnp.where(active, jt_new, 0.0)
        vel, omega = apply(vel, omega, jnp.zeros_like(jt), jt_new - jt)
        return vel, omega, jt_new

    vel, omega = state.vel, state.omega
    jn = jnp.zeros(active.shape, vel.dtype)
    jt = jnp.zeros(active.shape, vel.dtype)
    for _ in range(iterations):
        vel, omega, jn = normal_pass(vel, omega, jn)
        vel, omega, jt = friction_pass(vel, omega, jn, jt)
    state = state.replace(vel=vel, omega=omega)

    if split:
        # positional pass: same machinery on zero pseudo-velocities with
        # the bias as the sole target, folded directly into positions.
        def pseudo_pass(pvel, pomega, pj):
            v_n, _ = v_n_at(pvel, pomega)
            rhs = v_n + bias
            pj_new = jnp.maximum(pj + rhs * inv_kn, 0.0)
            pj_new = jnp.where(active, pj_new, 0.0)
            pvel, pomega = apply(pvel, pomega, pj_new - pj, jnp.zeros_like(pj))
            return pvel, pomega, pj_new

        pvel = jnp.zeros_like(vel)
        pomega = jnp.zeros_like(omega)
        pj = jnp.zeros_like(jn)
        for _ in range(position_iterations):
            pvel, pomega, pj = pseudo_pass(pvel, pomega, pj)
        state = state.replace(
            pos=state.pos + pvel * dt,
            angle=state.angle + pomega * dt,
        )
    return state
