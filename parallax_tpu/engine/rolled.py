"""Offset-rolled all-pairs physics for uniform-circle worlds (billiards).

Round-5 VERDICT #8: billiards48 (C=1320 lanes) ran at 1.1M env-steps/s
device-side, 61% of the step in the contact solver and 36% in collide —
both scale with the lane count C, and at C=1320 the solver's [C, n]
one-hot MXU matmuls (O(C*n*B) work for C useful terms) dominate.  DESIGN
§4b's crossover note asks for lane compaction without per-world dynamic
indices; this module gets the same effect STATICALLY for the special
case that actually ships (uniform circles in a box arena):

* wrapped-roll pairing: lane (d, i) pairs ball i with ball (i+d) mod nb
  for d = 1..nb//2.  Every unordered pair appears exactly once (for even
  nb, offset nb/2 is half-masked), so the lane count is n(n-1)/2 == C —
  but the partner "gather" is ``jnp.roll(plane, -d)`` and the impulse
  "scatter" is ``jnp.roll(delta, +d)``: static sublane shifts on
  [nb, B] planes, no one-hot matmuls, no [C, B] contact materialization.
  Orientation per lane is (A=i, B=(i+d) mod nb); for equal radii the
  circle-circle formulas are sign-symmetric, so wrapped lanes (where A
  has the higher ball index) produce identical impulses.
* wall lanes ride per-ball planes too: W static boxes x [nb, B].

The solver math transcribes ``ops.pallas_solver.solve_arrays``'s
no-partner path (circle worlds have no 2-point manifolds) and the
contact formulas are ``engine.batched._cc_bm`` / ``_cb_bm`` — equivalence
vs `physics_core` on the same world is pinned by
tests/test_rolled.py.  Reference formula lineage is the same as those
modules' (cotix _contacts.py / _collision_resolution.py citations
there).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.dynamics.impulses import ContactSolverConfig
from parallax_tpu.engine.batched import ContactsBM, _SoA, _cb_bm, _cc_bm


@dataclasses.dataclass(frozen=True)
class RolledCircleWorld:
    """Static description of a uniform-circle world (jit key)."""

    n_balls: int
    radius: float
    inv_mass: float
    inv_inertia: float
    e_ball: float  # pairwise restitution (min-combine of equal values)
    mu_ball: float
    walls_lb: Tuple[Tuple[float, float], ...]  # W axis-aligned boxes
    walls_ub: Tuple[Tuple[float, float], ...]
    e_wall: float  # min(e_ball, e_wall) applied at build
    mu_wall: float  # (mu_ball + mu_wall)/2 applied at build
    dt: float
    gravity: Tuple[float, float]
    integrator: str
    iterations: int
    position_iterations: int
    contact: ContactSolverConfig

    @property
    def offsets(self):
        return range(1, self.n_balls // 2 + 1)

    def lane_valid(self, d: int) -> np.ndarray:
        """[nb] static validity for offset d (even nb: half of d = nb/2)."""
        nb = self.n_balls
        if 2 * d == nb:
            return (np.arange(nb) < nb // 2)
        return np.ones(nb, bool)


def _roll(x, d):
    return jnp.roll(x, d, axis=0)


def physics_rolled(world: RolledCircleWorld, s: _SoA) -> tuple[_SoA, ContactsBM]:
    """Full physics step (integrate + gravity + contacts + solve) on
    [n_bodies, B] planes; only the first ``n_balls`` rows move (trailing
    rows are the static walls, carried through untouched).  Returns an
    empty ContactsBM (no lane table exists; billiards' post hook derives
    everything from positions)."""
    cfg = world.contact
    dt = world.dt
    nb = world.n_balls
    r = world.radius
    im = world.inv_mass
    ii = world.inv_inertia

    balls = jax.tree.map(lambda p: p[:nb], s)
    rest_rows = jax.tree.map(lambda p: p[nb:], s)

    px, py = balls.px, balls.py
    vx, vy = balls.vx, balls.vy
    ang, om = balls.angle, balls.omega

    gx, gy = world.gravity

    def integrate(px, py, ang, vx, vy, om):
        return px + vx * dt, py + vy * dt, ang + om * dt

    if world.integrator == "symplectic":
        vx = vx + gx * dt
        vy = vy + gy * dt
        px, py, ang = integrate(px, py, ang, vx, vy, om)
    else:
        px, py, ang = integrate(px, py, ang, vx, vy, om)
        vx = vx + gx * dt
        vy = vy + gy * dt

    # -- contact lanes ------------------------------------------------------
    # ball-ball: per offset d, lane i pairs (i, (i+d) mod nb)
    cc = []
    for d in world.offsets:
        pbx, pby = _roll(px, -d), _roll(py, -d)
        pen_x, pen_y, pt_x, pt_y, active = _cc_bm(px, py, r, pbx, pby, r)
        valid = jnp.asarray(world.lane_valid(d))[:, None]
        active = active & valid
        cc.append((pen_x, pen_y, pt_x, pt_y, active))

    # ball-wall: W lanes of [nb, B] (A = ball, B = static box)
    cw = []
    for (lbx, lby), (ubx, uby) in zip(world.walls_lb, world.walls_ub):
        pen_x, pen_y, pt_x, pt_y, active = _cb_bm(px, py, r, lbx, lby, ubx, uby)
        cw.append((pen_x, pen_y, pt_x, pt_y, active))

    # -- per-lane solver constants (solve_arrays no-partner transcription) --
    e_bb = world.e_ball
    mu_bb = world.mu_ball
    e_bw = min(world.e_ball, world.e_wall)
    mu_bw = (world.mu_ball + world.mu_wall) / 2.0

    def lane_setup(pen_x, pen_y, pt_x, pt_y, active, pax, pay, pbx, pby,
                   im_b, ii_b):
        d2 = pen_x * pen_x + pen_y * pen_y
        inv_d = jax.lax.rsqrt(jnp.where(d2 <= 0, 1.0, d2))
        depth = d2 * inv_d
        nx = jnp.where(d2 == 0, 0.0, pen_x * inv_d)
        ny = jnp.where(d2 == 0, 0.0, pen_y * inv_d)
        tx, ty = -ny, nx
        rax = pt_x - pax
        ray = pt_y - pay
        rbx = pt_x - pbx
        rby = pt_y - pby
        ran = rax * ny - ray * nx
        rbn = rbx * ny - rby * nx
        rat = rax * ty - ray * tx
        rbt = rbx * ty - rby * tx
        k_n = im + im_b + ii * ran * ran + ii_b * rbn * rbn
        k_t = im + im_b + ii * rat * rat + ii_b * rbt * rbt
        inv_kn = 1.0 / jnp.where(k_n == 0, 1.0, k_n)
        inv_kt = 1.0 / jnp.where(k_t == 0, 1.0, k_t)
        bias = (
            cfg.baumgarte
            * jnp.maximum(depth - cfg.baumgarte_slop, 0.0)
            / cfg.baumgarte_dt
        )
        if cfg.baumgarte_max_bias is not None:
            bias = jnp.minimum(bias, cfg.baumgarte_max_bias)
        bias = jnp.where(active, bias, 0.0)
        return dict(nx=nx, ny=ny, tx=tx, ty=ty, rax=rax, ray=ray, rbx=rbx,
                    rby=rby, inv_kn=inv_kn, inv_kt=inv_kt, bias=bias,
                    active=active, im_b=im_b, ii_b=ii_b)

    lanes = []
    for d, (pen_x, pen_y, pt_x, pt_y, active) in zip(world.offsets, cc):
        L = lane_setup(pen_x, pen_y, pt_x, pt_y, active,
                       px, py, _roll(px, -d), _roll(py, -d), im, ii)
        L.update(d=d, e=e_bb, mu=mu_bb)
        lanes.append(L)
    for (pen_x, pen_y, pt_x, pt_y, active) in cw:
        L = lane_setup(pen_x, pen_y, pt_x, pt_y, active,
                       px, py, 0.0, 0.0, 0.0, 0.0)
        L.update(d=0, e=e_bw, mu=mu_bw)
        lanes.append(L)

    def lane_rel_vel(L, vx, vy, om):
        """(v_n, v_t) of lane vs CURRENT ball velocity planes."""
        d = L["d"]
        vax = vx - L["ray"] * om
        vay = vy + L["rax"] * om
        if L["im_b"] == 0.0:
            vbx = jnp.zeros_like(vax)
            vby = jnp.zeros_like(vay)
        else:
            vxp, vyp, omp = _roll(vx, -d), _roll(vy, -d), _roll(om, -d)
            vbx = vxp - L["rby"] * omp
            vby = vyp + L["rbx"] * omp
        rx = vbx - vax
        ry = vby - vay
        return (rx * L["nx"] + ry * L["ny"], rx * L["tx"] + ry * L["ty"])

    # restitution targets from pre-solve velocities
    split = world.position_iterations > 0
    for L in lanes:
        v_n0, _ = lane_rel_vel(L, vx, vy, om)
        rest = jnp.where(v_n0 > 0, L["e"] * jnp.maximum(v_n0, 0.0), 0.0)
        L["v_n0"] = v_n0
        L["target"] = jnp.where(
            L["active"], rest if split else rest + L["bias"], 0.0
        )

    def lane_deltas(L, dj_n, dj_t):
        """Velocity deltas from lane impulse deltas: A-side arrays at lane
        index i, B-side contribution rolled onto ball (i+d)."""
        jx = dj_n * L["nx"] + dj_t * L["tx"]
        jy = dj_n * L["ny"] + dj_t * L["ty"]
        dvax = jx * im
        dvay = jy * im
        dwa = (L["rax"] * jy - L["ray"] * jx) * ii
        if L["im_b"] == 0.0:
            return dvax, dvay, dwa
        dvbx = _roll(-jx * L["im_b"], L["d"])
        dvby = _roll(-jy * L["im_b"], L["d"])
        dwb = _roll(-(L["rbx"] * jy - L["rby"] * jx) * L["ii_b"], L["d"])
        return dvax + dvbx, dvay + dvby, dwa + dwb

    jn = [jnp.zeros_like(px) for _ in lanes]
    jt = [jnp.zeros_like(px) for _ in lanes]
    for it in range(world.iterations):
        # normal pass (Jacobi within the iteration, as solve_arrays)
        dvx = jnp.zeros_like(px)
        dvy = jnp.zeros_like(px)
        dom = jnp.zeros_like(px)
        for k, L in enumerate(lanes):
            v_n = L["v_n0"] if it == 0 else lane_rel_vel(L, vx, vy, om)[0]
            rhs = v_n + L["target"]
            if it == 0:
                jn_new = jnp.maximum(rhs * L["inv_kn"], 0.0)
            else:
                jn_new = jnp.maximum(jn[k] + rhs * L["inv_kn"], 0.0)
            jn_new = jnp.where(L["active"], jn_new, 0.0)
            ax, ay, aw = lane_deltas(L, jn_new - jn[k], jnp.zeros_like(px))
            dvx += ax
            dvy += ay
            dom += aw
            jn[k] = jn_new
        vx = vx + dvx
        vy = vy + dvy
        om = om + dom

        # friction pass on post-normal velocities
        dvx = jnp.zeros_like(px)
        dvy = jnp.zeros_like(px)
        dom = jnp.zeros_like(px)
        for k, L in enumerate(lanes):
            _, v_t = lane_rel_vel(L, vx, vy, om)
            jt_new = v_t * L["inv_kt"] if it == 0 else jt[k] + v_t * L["inv_kt"]
            lim = L["mu"] * jn[k]
            jt_new = jnp.clip(jt_new, -lim, lim)
            jt_new = jnp.where(L["active"], jt_new, 0.0)
            ax, ay, aw = lane_deltas(L, jnp.zeros_like(px), jt_new - jt[k])
            dvx += ax
            dvy += ay
            dom += aw
            jt[k] = jt_new
        vx = vx + dvx
        vy = vy + dvy
        om = om + dom

    if split:
        pvx = jnp.zeros_like(px)
        pvy = jnp.zeros_like(px)
        pom = jnp.zeros_like(px)
        pj = [jnp.zeros_like(px) for _ in lanes]
        for it in range(world.position_iterations):
            dvx = jnp.zeros_like(px)
            dvy = jnp.zeros_like(px)
            dom = jnp.zeros_like(px)
            for k, L in enumerate(lanes):
                if it == 0:
                    rhs = L["bias"]
                else:
                    v_n, _ = lane_rel_vel(L, pvx, pvy, pom)
                    rhs = v_n + L["bias"]
                pj_new = jnp.where(
                    L["active"],
                    jnp.maximum((0.0 if it == 0 else pj[k]) + rhs * L["inv_kn"], 0.0),
                    0.0,
                )
                ax, ay, aw = lane_deltas(L, pj_new - pj[k], jnp.zeros_like(px))
                dvx += ax
                dvy += ay
                dom += aw
                pj[k] = pj_new
            pvx = pvx + dvx
            pvy = pvy + dvy
            pom = pom + dom
        px = px + pvx * dt
        py = py + pvy * dt
        ang = ang + pom * dt

    out = _SoA(
        px=jnp.concatenate([px, rest_rows.px], 0),
        py=jnp.concatenate([py, rest_rows.py], 0),
        vx=jnp.concatenate([vx, rest_rows.vx], 0),
        vy=jnp.concatenate([vy, rest_rows.vy], 0),
        angle=jnp.concatenate([ang, rest_rows.angle], 0),
        omega=jnp.concatenate([om, rest_rows.omega], 0),
    )
    B = px.shape[-1]
    z = jnp.zeros((0, B), px.dtype)
    con = ContactsBM(pen_x=z, pen_y=z, pt_x=z, pt_y=z,
                     active=jnp.zeros((0, B), bool), weight=z)
    return out, con
