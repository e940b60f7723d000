"""Fused Pallas TPU step kernel.

One kernel launch per world-tile runs the ENTIRE physics step in VMEM:

    integrate + gravity -> world vertices -> narrow phase (SAT manifolds
    for pp groups; analytic circle/box lane kernels for cc/cb/bb/area_cb)
    -> sequential-impulse solve (via ops.pallas_solver.solve_arrays) ->
    spring-damper joints

Applicable when every pair group is in ``FUSED_KERNELS`` (LunarLander:
all-polygon; RoboCup: circles + goal boxes + field area; billiards:
circles + wall boxes); ``physics_core`` falls back to the split path
otherwise.  Static parts may carry per-world vertex overrides (terrain
planes) supplied as inputs.

Like the solver kernel, all lane<->body indexing is static (unrolled loops
and one-hot MXU matmuls) and the backward pass routes through the JAX
implementation via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallax_tpu.geometry.shapes import POLYGON, edge_mask_for
from parallax_tpu.ops.pallas_solver import (
    MXU_PRECISION,
    TILE_B,
    _VMEM_BUDGET,
    _build_operands,
    solve_arrays,
)

INF = float("inf")

# The fused kernel keeps more live than the solver alone: the collide
# temporaries, state/terrain planes and the contact buffer all ride in
# VMEM alongside the ~48 solver rows.  Measured anchor: RoboCup (C=70,
# n=11) at tile 1024 allocates 16.97 MB scoped, i.e. ~61 f32 [*, tile]
# rows per contact lane; 64 is the conservative model.  The backward
# kernel recomputes the whole step AND holds per-iteration vjp snapshots
# — same scaling policy as pallas_solver's bwd model.
_FUSED_LIVE_FACTOR = 64
# bwd calibration (round 5, v5e): lander (C=52, 4+3 iters, split3) used
# 145.54 MB at tile 1024 = 683 effective rows/lane; 150 + 40*iters with
# the 1.6x split multiplier reproduces that (688) and fits at tile 512.
_FUSED_LIVE_BWD_BASE = 150
_FUSED_LIVE_BWD_PER_ITER = 40


def fused_tile_for(n_contacts: int, batch: int, bwd: bool = False,
                   total_iterations: int = 7):
    """Largest viable world-batch tile for the FUSED step on this contact
    table, or None when even the smallest tile spills VMEM (callers then
    take the split collide-in-XLA path).  Same ladder/contract as
    ``pallas_solver.tile_for`` with the fused live-row model."""
    if bwd:
        live = _FUSED_LIVE_BWD_BASE + _FUSED_LIVE_BWD_PER_ITER * total_iterations
    else:
        live = _FUSED_LIVE_FACTOR
    if MXU_PRECISION in ("split2", "split3"):
        live = int(live * (1.6 if MXU_PRECISION == "split3" else 1.35))
    rows = live * max(n_contacts, 1)
    for t in sorted({TILE_B, 1024, 512, 256, 128}, reverse=True):
        if t > TILE_B:
            continue
        if batch % t == 0 and rows * t * 4 <= _VMEM_BUDGET:
            return t
    return None


# pair-group kernels the fused step implements (round 3 added the
# circle/box family so static-geometry worlds — RoboCup, billiards — can
# fuse; cp/bp and the remaining area kernels still fall back)
FUSED_KERNELS = ("pp", "cc", "cb", "bb", "area_cb")


def supports_fused_step(world) -> bool:
    kernels = {g.kernel for g in world.table.groups}
    if not kernels <= set(FUSED_KERNELS):
        return False
    if world.config.solver_mode != "block":
        return False
    # the fused kernel has no AABB pre-mask stage.  The split path applies
    # broadphase only to cp/bp/pp groups (circle/box kernels self-mask), so
    # bit-exactness requires broadphase off only when a pp group exists.
    return "pp" not in kernels or not world.config.broadphase


def _static_step_info(world, override_parts):
    """Host-side static description for the kernel."""
    parts = world.parts
    V = parts.max_verts
    lv = np.asarray(parts.verts)  # [P, V, 2]
    body_of = np.asarray(parts.body)
    movable = [not b for b in world.static_bodies]

    groups = []
    for g in world.table.groups:
        ia, ib = list(g.part_a), list(g.part_b)
        Va = max(parts.nverts[i] for i in ia)
        Vb = max(parts.nverts[i] for i in ib)
        if g.kernel in ("cc", "cb", "bb", "area_cb"):
            # circle center row / box (lb, ub) rows only (split path trims
            # the same way, engine.batched.collide_batched)
            Va = min(Va, 2)
            Vb = min(Vb, 2)
        ema = np.stack([edge_mask_for(parts.nverts[i], Va) for i in ia]).astype(
            np.float32
        )
        emb = np.stack([edge_mask_for(parts.nverts[i], Vb) for i in ib]).astype(
            np.float32
        )
        groups.append(dict(
            kernel=g.kernel, ia=ia, ib=ib, Va=Va, Vb=Vb, ema=ema, emb=emb,
            ra=tuple(float(np.asarray(parts.radius)[i]) for i in ia),
            rb=tuple(float(np.asarray(parts.radius)[i]) for i in ib),
        ))

    from parallax_tpu.ops.pallas_solver import _joint_rows

    jrows = _joint_rows(world)
    params = world.params
    return dict(
        V=V,
        lv=lv,
        body_of=body_of,
        kind=tuple(parts.kind),
        movable=movable,
        groups=groups,
        joints=jrows,
        override=set(override_parts),
        im=(1.0 / np.asarray(params.mass)).astype(np.float32),
        ii=(1.0 / np.asarray(params.inertia)).astype(np.float32),
        n=world.n_bodies,
    )


def _world_verts_rows(
    st, cos_rows, sin_rows, px, py, terrain_x, terrain_y, idx_list, vmax=None
):
    """World-frame vertex planes for the parts in idx_list -> ([G,V,TB] x, y).

    Static unroll per part; override parts read terrain input rows.  Boxes
    translate without rotating (axis-aligned invariant, same as
    engine.batched._side_verts); circles/polygons rotate."""
    from parallax_tpu.geometry.shapes import BOX

    lv = st["lv"]
    body_of = st["body_of"]
    override = st["override"]
    order = sorted(override)
    vmax = st["V"] if vmax is None else vmax
    rows_x, rows_y = [], []
    for p in idx_list:
        bo = int(body_of[p])
        if p in override:
            k = order.index(p)
            wx = terrain_x[k]  # [V, TB]
            wy = terrain_y[k]
            rows_x.append(wx[:vmax])
            rows_y.append(wy[:vmax])
            continue
        c = cos_rows[bo]  # [TB]
        sn = sin_rows[bo]
        is_box = st["kind"][p] == BOX
        vx_rows, vy_rows = [], []
        for v in range(vmax):
            lx = float(lv[p, v, 0])
            ly = float(lv[p, v, 1])
            if is_box:
                vx_rows.append(lx + px[bo])
                vy_rows.append(ly + py[bo])
            else:
                vx_rows.append(c * lx - sn * ly + px[bo])
                vy_rows.append(sn * lx + c * ly + py[bo])
        rows_x.append(jnp.stack(vx_rows))
        rows_y.append(jnp.stack(vy_rows))
    return jnp.stack(rows_x), jnp.stack(rows_y)


def _shift1(x):
    """roll(x, -1, axis=1) via slicing (pallas-safe)."""
    return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)


BIG = 1e30


def _pp_manifold_arrays(ax, ay, ema, bx, by, emb):
    """SAT + clip manifold on arrays (pallas-safe port of

    engine.batched._pp_manifold_bm).  Masks are f32 [G, V] arrays applied
    arithmetically — Mosaic's TPU lowering is touchy about 3-D booleans, so
    the 3-D mask algebra uses 0/1 floats and +/-BIG offsets instead of
    jnp.where on bool tensors."""
    G, Va, TB = ax.shape
    Vb = bx.shape[1]

    def edge_axes(wx, wy, em):
        ex = _shift1(wx) - wx
        ey = _shift1(wy) - wy
        nx, ny = ey, -ex
        ln2 = nx * nx + ny * ny
        safe = jnp.maximum(ln2, 1e-24)
        inv = jax.lax.rsqrt(safe)
        # 0/1 float validity: static edge mask AND non-degenerate length
        okf = em[:, :, None] * jnp.minimum(ln2 * 1e24, 1.0)
        okf = jnp.minimum(okf, 1.0)
        return nx * inv, ny * inv, okf

    nax, nay, aokf = edge_axes(ax, ay, ema)
    nbx, nby, bokf = edge_axes(bx, by, emb)
    NX = jnp.concatenate([nax, nbx], axis=1)
    NY = jnp.concatenate([nay, nby], axis=1)
    OKF = jnp.concatenate([aokf, bokf], axis=1)

    def minmax(wx, wy):
        mn = mx = None
        for v in range(wx.shape[1]):
            p = NX * wx[:, v : v + 1, :] + NY * wy[:, v : v + 1, :]
            mn = p if mn is None else jnp.minimum(mn, p)
            mx = p if mx is None else jnp.maximum(mx, p)
        return mn, mx

    mna, mxa = minmax(ax, ay)
    mnb, mxb = minmax(bx, by)
    o_pos = mxb - mna
    o_neg = mxa - mnb
    ovl = jnp.minimum(o_pos, o_neg) + (1.0 - OKF) * BIG

    best = jnp.full((G, TB), BIG)
    bx_ax = jnp.zeros((G, TB))
    by_ax = jnp.zeros((G, TB))
    bsign = jnp.ones((G, TB))
    for a in range(Va + Vb):
        o = ovl[:, a, :]
        take = o < best
        best = jnp.where(take, o, best)
        bx_ax = jnp.where(take, NX[:, a, :], bx_ax)
        by_ax = jnp.where(take, NY[:, a, :], by_ax)
        bsign = jnp.where(
            take, jnp.where(o_pos[:, a, :] <= o_neg[:, a, :], 1.0, -1.0), bsign
        )
    active = (best >= 0) & (best < BIG * 0.5)
    depth = jnp.maximum(jnp.minimum(best, BIG), 0.0)
    n_x = bx_ax * bsign
    n_y = by_ax * bsign

    def best_edge(nx_, ny_, ok_, wx_, wy_, dx, dy):
        bestv = jnp.full((G, TB), -BIG)
        r0x = r0y = r1x = r1y = jnp.zeros((G, TB))
        wnx = _shift1(wx_)
        wny = _shift1(wy_)
        for v in range(wx_.shape[1]):
            okv = ok_[:, v, :]
            al = (nx_[:, v, :] * dx + ny_[:, v, :] * dy) * okv - (1.0 - okv) * BIG
            take = al > bestv
            bestv = jnp.where(take, al, bestv)
            r0x = jnp.where(take, wx_[:, v, :], r0x)
            r0y = jnp.where(take, wy_[:, v, :], r0y)
            r1x = jnp.where(take, wnx[:, v, :], r1x)
            r1y = jnp.where(take, wny[:, v, :], r1y)
        return bestv, r0x, r0y, r1x, r1y

    al_a, ar0x, ar0y, ar1x, ar1y = best_edge(nax, nay, aokf, ax, ay, -n_x, -n_y)
    al_b, br0x, br0y, br1x, br1y = best_edge(nbx, nby, bokf, bx, by, n_x, n_y)
    ref_is_a = al_a >= al_b
    r0x = jnp.where(ref_is_a, ar0x, br0x)
    r0y = jnp.where(ref_is_a, ar0y, br0y)
    r1x = jnp.where(ref_is_a, ar1x, br1x)
    r1y = jnp.where(ref_is_a, ar1y, br1y)
    nrefx = jnp.where(ref_is_a, -n_x, n_x)
    nrefy = jnp.where(ref_is_a, -n_y, n_y)

    # incident edge = the other polygon's best-aligned edge along its own
    # outward direction — exactly the candidate reference edges computed
    # above, selected the opposite way
    i0x = jnp.where(ref_is_a, br0x, ar0x)
    i0y = jnp.where(ref_is_a, br0y, ar0y)
    i1x = jnp.where(ref_is_a, br1x, ar1x)
    i1y = jnp.where(ref_is_a, br1y, ar1y)

    tx0 = r1x - r0x
    ty0 = r1y - r0y
    tl = jax.lax.rsqrt(jnp.maximum(tx0 * tx0 + ty0 * ty0, 1e-24))
    tx0, ty0 = tx0 * tl, ty0 * tl

    def clip(p0x, p0y, p1x, p1y, anx, any_, dx, dy):
        d0 = (p0x - anx) * dx + (p0y - any_) * dy
        d1 = (p1x - anx) * dx + (p1y - any_) * dy
        denom = d0 - d1
        frac = d0 / jnp.where(denom == 0, 1.0, denom)
        inx = p0x + frac * (p1x - p0x)
        iny = p0y + frac * (p1y - p0y)
        c01 = (d0 < 0) & (d1 >= 0)
        c10 = (d1 < 0) & (d0 >= 0)
        q0x = jnp.where(c01, inx, p0x)
        q0y = jnp.where(c01, iny, p0y)
        q1x = jnp.where(c10, inx, p1x)
        q1y = jnp.where(c10, iny, p1y)
        return q0x, q0y, q1x, q1y

    c0x, c0y, c1x, c1y = clip(i0x, i0y, i1x, i1y, r0x, r0y, tx0, ty0)
    c0x, c0y, c1x, c1y = clip(c0x, c0y, c1x, c1y, r1x, r1y, -tx0, -ty0)

    d0 = -((c0x - r0x) * nrefx + (c0y - r0y) * nrefy)
    d1 = -((c1x - r0x) * nrefx + (c1y - r0y) * nrefy)

    keep_tol = jnp.maximum(depth, 1e-4)
    k0 = d0 >= -keep_tol
    k1 = d1 >= -keep_tol
    none_kept = (~k0) & (~k1)
    # pure boolean algebra — jnp.where(bool_mask, True, bool_array) lowers
    # through an i8->i1 truncation Mosaic rejects
    a0 = active & (k0 | none_kept)
    a1 = active & k1
    ld0 = jnp.where(none_kept, depth, jnp.maximum(d0, 1e-6))
    ld1 = jnp.where(none_kept, depth, jnp.maximum(d1, 1e-6))

    pen_x0 = n_x * ld0 * a0
    pen_y0 = n_y * ld0 * a0
    pen_x1 = n_x * ld1 * a1
    pen_y1 = n_y * ld1 * a1

    # interleave lanes (pair0-pt0, pair0-pt1, ...) to match the pair table
    def interleave(x0, x1):
        return jnp.stack([x0, x1], axis=1).reshape(2 * G, TB)

    return (
        interleave(pen_x0, pen_x1),
        interleave(pen_y0, pen_y1),
        interleave(c0x, c1x),
        interleave(c0y, c1y),
        interleave(a0.astype(ax.dtype), a1.astype(ax.dtype)),
    )


# ---------------------------------------------------------------------------
# kernel assembly
# ---------------------------------------------------------------------------


def step_arrays(
    lane_const, oh_a, oh_b, oh_p, acc_a, acc_b, masks, tx_in, ty_in,
    px, py, vx, vy, ang, om,
    *, st, mask_slices, iterations, position_iterations, dt, gx, gy,
    symplectic, config, n_terrain,
):
    """The ENTIRE fused step on plain arrays — shared by the forward
    kernel (writes refs) and the backward kernel (jax.vjp of this trace
    in VMEM, mirroring ops.pallas_solver's fwd/bwd pairing)."""
    n = st["n"]
    V = st["V"]

    def grav(vx, vy):
        # .at[].add lowers to scatter-add (unsupported in Pallas TPU):
        # rebuild via per-row stacking instead
        rx = [vx[b] for b in range(n)]
        ry = [vy[b] for b in range(n)]
        for b in range(n):
            if st["movable"][b]:
                if gx:
                    rx[b] = rx[b] + gx * dt
                if gy:
                    ry[b] = ry[b] + gy * dt
        return jnp.stack(rx), jnp.stack(ry)

    def integrate(px, py, ang):
        return px + vx * dt, py + vy * dt, ang + om * dt

    if symplectic:
        vx, vy = grav(vx, vy)
        px, py, ang = integrate(px, py, ang)
    else:
        px, py, ang = integrate(px, py, ang)
        vx, vy = grav(vx, vy)

    cos_rows = [jnp.cos(ang[b]) for b in range(n)]
    sin_rows = [jnp.sin(ang[b]) for b in range(n)]

    TB = px.shape[-1]
    terrain_x = tx_in.reshape(n_terrain, V, TB) if n_terrain else None
    terrain_y = ty_in.reshape(n_terrain, V, TB) if n_terrain else None

    # circle/box analytic lane kernels: the engine's batch-minor planes
    # implementations are pure 2-D elementwise jnp and lower through Mosaic
    # as-is — importing them guarantees bitwise parity with the split path
    from parallax_tpu.engine.batched import _area_cb_bm, _bb_bm, _cb_bm, _cc_bm

    def _radius_planes(rs):
        return jnp.stack([jnp.full((TB,), r, px.dtype) for r in rs])

    pen_x_parts, pen_y_parts, pt_x_parts, pt_y_parts, act_parts = [], [], [], [], []
    for gi, g in enumerate(st["groups"]):
        ax, ay = _world_verts_rows(
            st, cos_rows, sin_rows, px, py, terrain_x, terrain_y, g["ia"],
            vmax=g["Va"],
        )
        bx, by = _world_verts_rows(
            st, cos_rows, sin_rows, px, py, terrain_x, terrain_y, g["ib"],
            vmax=g["Vb"],
        )
        kern = g["kernel"]
        if kern == "pp":
            (sa, ea), (sb, eb) = mask_slices[gi]
            ema = masks[sa:ea, : g["Va"]]
            emb = masks[sb:eb, : g["Vb"]]
            penx, peny, ptx, pty, act = _pp_manifold_arrays(ax, ay, ema, bx, by, emb)
        else:
            ra = _radius_planes(g["ra"])
            rb = _radius_planes(g["rb"])
            if kern == "cc":
                penx, peny, ptx, pty, act = _cc_bm(
                    ax[:, 0, :], ay[:, 0, :], ra, bx[:, 0, :], by[:, 0, :], rb
                )
            elif kern == "cb":
                penx, peny, ptx, pty, act = _cb_bm(
                    ax[:, 0, :], ay[:, 0, :], ra,
                    bx[:, 0, :], by[:, 0, :], bx[:, 1, :], by[:, 1, :],
                )
            elif kern == "bb":
                penx, peny, ptx, pty, act = _bb_bm(
                    ax[:, 0, :], ay[:, 0, :], ax[:, 1, :], ay[:, 1, :],
                    bx[:, 0, :], by[:, 0, :], bx[:, 1, :], by[:, 1, :],
                )
            elif kern == "area_cb":
                penx, peny, ptx, pty, act = _area_cb_bm(
                    ax[:, 0, :], ay[:, 0, :], ra,
                    bx[:, 0, :], by[:, 0, :], bx[:, 1, :], by[:, 1, :],
                )
            else:  # pragma: no cover — supports_fused_step gates this
                raise ValueError(kern)
            act = act.astype(ax.dtype)
        pen_x_parts.append(penx)
        pen_y_parts.append(peny)
        pt_x_parts.append(ptx)
        pt_y_parts.append(pty)
        act_parts.append(act)

    pen_x = jnp.concatenate(pen_x_parts, axis=0)
    pen_y = jnp.concatenate(pen_y_parts, axis=0)
    pt_x = jnp.concatenate(pt_x_parts, axis=0)
    pt_y = jnp.concatenate(pt_y_parts, axis=0)
    act = jnp.concatenate(act_parts, axis=0)

    px, py, vx, vy, ang, om = solve_arrays(
        lane_const, oh_a, oh_b, oh_p, acc_a, acc_b,
        pen_x, pen_y, pt_x, pt_y, act,
        px, py, vx, vy, ang, om,
        iterations=iterations, position_iterations=position_iterations,
        dt=dt, config=config,
    )

    # spring-damper joints: shared row-rebuild helper (no scatter support
    # in Pallas TPU) — same code as solve_contacts_pallas(with_joints=True)
    from parallax_tpu.ops.pallas_solver import apply_joint_rows

    if st["joints"]:
        vx, vy, om = apply_joint_rows(
            st["joints"], st["im"], st["ii"], px, py, vx, vy, ang, om
        )

    return px, py, vx, vy, ang, om, act


def _step_kernel(
    const_ref, oh_a_ref, oh_b_ref, oh_p_ref, acc_a_ref, acc_b_ref,
    masks_ref, tx_ref, ty_ref,
    px_ref, py_ref, vx_ref, vy_ref, ang_ref, om_ref,
    opx_ref, opy_ref, ovx_ref, ovy_ref, oang_ref, oom_ref, oact_ref,
    **kw,
):
    px, py, vx, vy, ang, om, act = step_arrays(
        const_ref[:], oh_a_ref[:], oh_b_ref[:], oh_p_ref[:],
        acc_a_ref[:], acc_b_ref[:], masks_ref[:], tx_ref[:], ty_ref[:],
        px_ref[:], py_ref[:], vx_ref[:], vy_ref[:], ang_ref[:], om_ref[:],
        **kw,
    )
    opx_ref[:] = px
    opy_ref[:] = py
    ovx_ref[:] = vx
    ovy_ref[:] = vy
    oang_ref[:] = ang
    oom_ref[:] = om
    oact_ref[:] = act


def _step_bwd_kernel(
    const_ref, oh_a_ref, oh_b_ref, oh_p_ref, acc_a_ref, acc_b_ref,
    masks_ref, tx_ref, ty_ref,
    px_ref, py_ref, vx_ref, vy_ref, ang_ref, om_ref,
    gpx_ref, gpy_ref, gvx_ref, gvy_ref, gang_ref, gom_ref,
    dtx_ref, dty_ref,
    dpx_ref, dpy_ref, dvx_ref, dvy_ref, dang_ref, dom_ref,
    **kw,
):
    """Reverse pass of the fused step as ONE kernel: recompute the whole
    step (collide + solve + joints) in VMEM and transpose it there
    (same recompute-from-inputs residual policy as the solver bwd kernel).
    The ``act`` output is comparison-derived (zero vjp), so only the six
    state cotangents come in."""
    lane = const_ref[:]
    oh_a = oh_a_ref[:]
    oh_b = oh_b_ref[:]
    oh_p = oh_p_ref[:]
    acc_a = acc_a_ref[:]
    acc_b = acc_b_ref[:]
    masks = masks_ref[:]

    def f(tx_in, ty_in, px, py, vx, vy, ang, om):
        out = step_arrays(
            lane, oh_a, oh_b, oh_p, acc_a, acc_b, masks, tx_in, ty_in,
            px, py, vx, vy, ang, om, **kw,
        )
        return out[:6]

    _, vjp = jax.vjp(
        f,
        tx_ref[:], ty_ref[:],
        px_ref[:], py_ref[:], vx_ref[:], vy_ref[:], ang_ref[:], om_ref[:],
    )
    grads = vjp(
        (gpx_ref[:], gpy_ref[:], gvx_ref[:], gvy_ref[:], gang_ref[:],
         gom_ref[:])
    )
    dtx_ref[:], dty_ref[:] = grads[0], grads[1]
    dpx_ref[:], dpy_ref[:], dvx_ref[:], dvy_ref[:], dang_ref[:], dom_ref[:] = (
        grads[2:]
    )


def _assemble(world, terrain_parts, dt, accel, interpret):
    """Build the pallas_call for this world (cached per world table id)."""
    from parallax_tpu.engine.batched import ContactsBM  # noqa: F401

    cfg = world.config
    dt = cfg.dt if dt is None else dt
    gx, gy = cfg.gravity
    if accel is not None:
        gx = gx + accel[0]
        gy = gy + accel[1]

    st = _static_step_info(world, terrain_parts)
    ops = _build_operands(world)
    C, n = ops["C"], ops["n"]
    V = st["V"]
    n_terrain = len(terrain_parts)

    # pack the per-group edge masks row-wise into one [rows, Vmax] f32 input
    Vmax = max(max(g["Va"], g["Vb"]) for g in st["groups"])
    rows = []
    mask_slices = []
    for g in st["groups"]:
        sa = len(rows)
        for r in g["ema"]:
            rows.append(np.pad(r, (0, Vmax - len(r))))
        ea = len(rows)
        sb = len(rows)
        for r in g["emb"]:
            rows.append(np.pad(r, (0, Vmax - len(r))))
        eb = len(rows)
        mask_slices.append(((sa, ea), (sb, eb)))
    # keep masks as NUMPY: jnp constants created here leak as tracers when
    # the custom_vjp backward (traced later, e.g. under jax.checkpoint)
    # closes over them — each call site converts within its own trace
    masks = np.stack(rows).astype(np.float32)

    kernel = functools.partial(
        _step_kernel,
        st=st,
        mask_slices=tuple(mask_slices),
        iterations=cfg.solver_iterations,
        position_iterations=cfg.position_iterations,
        dt=float(dt),
        gx=float(gx),
        gy=float(gy),
        symplectic=cfg.integrator == "symplectic",
        config=cfg.contact,
        n_terrain=n_terrain,
    )
    return kernel, st, ops, masks, n_terrain


def physics_core_pallas(world, s, terrain_override=None, dt=None, accel=None,
                        interpret=False):
    """Fused-step twin of ``engine.batched.physics_core`` (state only; the

    contact buffer is internal).  Returns the stepped ``_SoA``."""
    tparts = tuple(sorted(terrain_override)) if terrain_override else ()
    kernel, st, ops, masks, n_terrain = _assemble(world, tparts, dt, accel, interpret)
    n = st["n"]
    V = st["V"]
    B = s.vx.shape[-1]
    tb = fused_tile_for(ops["C"], B)
    if tb is None:
        raise ValueError(
            f"fused step: no viable world-batch tile for C={ops['C']} at "
            f"batch {B} (batch must be a multiple of 128 and the contact "
            "table must fit the VMEM budget); use the split path"
        )

    if n_terrain:
        tx = jnp.concatenate([terrain_override[p][0] for p in tparts], axis=0)
        ty = jnp.concatenate([terrain_override[p][1] for p in tparts], axis=0)
    else:
        tx = jnp.zeros((1, B), s.vx.dtype)
        ty = jnp.zeros((1, B), s.vx.dtype)

    def tile(rows):
        return pl.BlockSpec((rows, tb), lambda i: (0, i), memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    grid = (B // tb,)
    C = ops["C"]
    out_shapes = [jax.ShapeDtypeStruct((n, B), s.vx.dtype) for _ in range(6)] + [
        jax.ShapeDtypeStruct((C, B), s.vx.dtype)
    ]

    @jax.custom_vjp
    def _step(args):
        tx_, ty_, px, py, vx, vy, ang, om = args
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=(
                [whole(ops["lane_const"]), whole(ops["oh_a"]), whole(ops["oh_b"]),
                 whole(ops["oh_p"]), whole(ops["acc_a"]), whole(ops["acc_b"]),
                 whole(masks)]
                + [tile(tx_.shape[0]), tile(ty_.shape[0])]
                + [tile(n)] * 6
            ),
            out_specs=[tile(n)] * 6 + [tile(C)],
            out_shape=out_shapes,
            # Mosaic's default scoped-vmem limit is 16 MB; the fused step
            # legitimately keeps more live (RoboCup: 16.97 MB at tile
            # 1024) — fused_tile_for bounds it to _VMEM_BUDGET instead
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
            interpret=interpret,
        )(
            ops["lane_const"], ops["oh_a"], ops["oh_b"], ops["oh_p"],
            ops["acc_a"], ops["acc_b"], masks,
            tx_, ty_, px, py, vx, vy, ang, om,
        )
        return outs

    def _fwd(args):
        return _step(args), args

    import os as _os

    use_pallas_bwd = (
        _os.environ.get("PARALLAX_PALLAS_BWD", "1") != "0"
        # Mosaic limitation (v5e, round 5): the transpose of the kernel's
        # bundled concats hits "result/input offset mismatch on non-concat
        # dimension" when the contact-lane count is not sublane-aligned
        # (C=70 RoboCup fails, C=48 lander compiles) — fall back to the
        # XLA vjp for unaligned tables
        and C % 8 == 0
        and fused_tile_for(
            C, B, bwd=True,
            total_iterations=(world.config.solver_iterations
                              + world.config.position_iterations),
        ) is not None
    )

    def _bwd_pallas(res, g):
        """One-launch reverse pass: recompute the fused step in VMEM and
        transpose it there (_step_bwd_kernel) — the backward twin that
        collapses the collide transpose + residual stacking the same way
        the solver bwd kernel collapsed the solver vjp (DESIGN §7d)."""
        tx_, ty_, px, py, vx, vy, ang, om = res
        tbb = fused_tile_for(
            C, B, bwd=True,
            total_iterations=(world.config.solver_iterations
                              + world.config.position_iterations),
        )
        # rebuild device operands INSIDE the backward trace: reusing the
        # forward trace's jnp constants leaks tracers when fwd and bwd are
        # traced separately (jax.checkpoint segments, scan transposes)
        ops_b = _build_operands(world)

        def btile(rows):
            return pl.BlockSpec((rows, tbb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        bwd_kernel = functools.partial(_step_bwd_kernel, **kernel.keywords)
        bwd_outs = pl.pallas_call(
            bwd_kernel,
            grid=(B // tbb,),
            in_specs=(
                [whole(ops_b["lane_const"]), whole(ops_b["oh_a"]),
                 whole(ops_b["oh_b"]), whole(ops_b["oh_p"]),
                 whole(ops_b["acc_a"]), whole(ops_b["acc_b"]), whole(masks)]
                + [btile(tx_.shape[0]), btile(ty_.shape[0])]
                + [btile(n)] * 12
            ),
            out_specs=[btile(tx_.shape[0]), btile(ty_.shape[0])]
            + [btile(n)] * 6,
            out_shape=[
                jax.ShapeDtypeStruct(tx_.shape, tx_.dtype),
                jax.ShapeDtypeStruct(ty_.shape, ty_.dtype),
            ]
            + [jax.ShapeDtypeStruct((n, B), px.dtype) for _ in range(6)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
            interpret=interpret,
        )(
            ops_b["lane_const"], ops_b["oh_a"], ops_b["oh_b"], ops_b["oh_p"],
            ops_b["acc_a"], ops_b["acc_b"], jnp.asarray(masks),
            tx_, ty_, px, py, vx, vy, ang, om,
            g[0], g[1], g[2], g[3], g[4], g[5],
        )
        return (tuple(bwd_outs),)

    def _bwd(res, g):
        if use_pallas_bwd:
            return _bwd_pallas(res, g)
        from parallax_tpu.engine.batched import _SoA, physics_core

        tx_, ty_, px, py, vx, vy, ang, om = res

        def jax_path(tx_, ty_, px, py, vx, vy, ang, om):
            override = None
            if n_terrain:
                override = {}
                off = 0
                for p in tparts:
                    override[p] = (tx_[off : off + V], ty_[off : off + V])
                    off += V
            out, con = physics_core(
                world,
                _SoA(px=px, py=py, vx=vx, vy=vy, angle=ang, omega=om),
                dt=dt,
                accel=accel,
                terrain_override=override,
            )
            return (
                out.px, out.py, out.vx, out.vy, out.angle, out.omega,
                con.active.astype(out.px.dtype),
            )

        _, vjp = jax.vjp(jax_path, tx_, ty_, px, py, vx, vy, ang, om)
        return (tuple(vjp(tuple(g))),)

    _step.defvjp(_fwd, _bwd)

    from parallax_tpu.engine.batched import ContactsBM, _SoA

    px, py, vx, vy, ang, om, act = _step(
        (tx, ty, s.px, s.py, s.vx, s.vy, s.angle, s.omega)
    )
    zero = jnp.zeros_like(act)
    # contact geometry stays inside the kernel; only activity is exported
    con = ContactsBM(
        pen_x=zero, pen_y=zero, pt_x=zero, pt_y=zero,
        active=act > 0, weight=jnp.ones_like(act),
    )
    return _SoA(px=px, py=py, vx=vx, vy=vy, angle=ang, omega=om), con
