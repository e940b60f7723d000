"""Pallas TPU kernel: the sequential-impulse contact solver.

The solver is ~half the physics step and its JAX form launches dozens of
small kernels per velocity iteration (gathers, elementwise chains, row-sum
scatters), each paying dispatch + HBM round-trips.  This kernel runs ALL
iterations for a tile of worlds entirely in VMEM: one launch, one read of
the contact/body planes, one write of the results.

Indexing strategy: Pallas kernels cannot capture array constants and TPU
gathers are weak, so every lane<->body mapping is expressed as a tiny
one-hot matmul on the MXU:

* gather body rows per lane:      ``OH_a [C, n] @ x [n, TB] -> [C, TB]``
* scatter-add lane deltas:        ``OH_a^T [n, C] @ d [C, TB] -> [n, TB]``
  (rows of static bodies zeroed)
* partner-lane swap:              ``OH_p [C, C] @ x [C, TB]``

Per-lane constant parameters ride in as a packed ``[R, C]`` input.
Semantics are identical to ``engine.batched.solve_contacts_bm``; equivalence
is asserted by tests/test_pallas_solver.py in interpreter mode and on
hardware by the bench path.  The impulse math itself mirrors the reference
``resolve_collision`` formulas (/root/reference/cotix/_collision_resolution.py:76-151)
via ``dynamics.impulses``, generalized to accumulated-impulse sequential
solving — see dynamics/block_solver.py for the formula-level citations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallax_tpu.dynamics.impulses import ContactSolverConfig

import os as _os

# World-batch tile per kernel instance.  1024 is the measured sweet spot;
# round-4 re-sweep with the raised scoped-VMEM limit: 2048 is
# statistically FLAT on the lander (3-pair alternating A/B: means
# 29.78M vs 29.88M, run-to-run std ~0.25M — inside noise) and 4096 LOSES
# ~10% (working set past the VMEM sweet spot), so the cap stays at the
# long-validated 1024.  PARALLAX_TILE_B overrides for sweeps on new
# hardware; tile_for still caps by the live-row VMEM budget per table.
TILE_B = int(_os.environ.get("PARALLAX_TILE_B", "1024"))

# The kernel keeps ~LIVE_FACTOR [C, tile] f32 temporaries live (inputs,
# Jacobian rows, partner swaps, impulse accumulators); at C=1320 (48-ball
# world) a 1024-tile wants ~260MB of VMEM against the chip's 128MB and the
# register allocator spills.  Shrink the tile with the contact-table size.
_VMEM_BUDGET = 100 * 1024 * 1024
_LIVE_FACTOR = 48
_LIVE_FACTOR_NO_PARTNER = 30  # block-solve path compiled out -> fewer temps
# The backward kernel recomputes the forward AND keeps the vjp residuals of
# the unrolled iteration loop live (one linearization snapshot per velocity/
# position iteration), so its live set SCALES with the iteration count
# (ADVICE r4): live = BASE + PER_ITER * (iterations + position_iterations).
# At the default 4+3 iterations this reproduces the round-4 totals
# (150 partner / 95 no-partner); worlds configured with more iterations now
# get proportionally smaller tiles instead of a VMEM compile failure.
_LIVE_BWD_BASE = 45
_LIVE_BWD_PER_ITER = 15
_LIVE_BWD_BASE_NO_PARTNER = 32
_LIVE_BWD_PER_ITER_NO_PARTNER = 9
_DEFAULT_TOTAL_ITERS = 7  # WorldConfig defaults: 4 velocity + 3 position

# Precision of the kernel's one-hot gather/scatter/swap matmuls.  The TPU
# default f32 matmul is SINGLE-PASS bf16 — measured on v5e (round 5):
# one-hot selection errs 3.9e-3 relative at 'default', 0.0 at 'highest'.
# bf16-level gathers compound over the 4+3 iteration loop and broke
# hardware gradient parity with the XLA twin (tools/tpu_smoke_bwd.py), so
# the kernel must run the dots exactly.  'highest' costs 6 MXU passes and
# splits BOTH operands on the VPU (solver fwd 219 -> 409 us at B=8192);
# the one-hot operand is already exact in bf16, so 'split3' decomposes
# only the VALUE operand into 3 bf16 components (24 mantissa bits = exact
# f32 selection) at 3 native-bf16 passes — same exactness, half the MXU
# work.  'split2' (16 bits, ~1e-5 relative) is the cheaper knob for perf
# sweeps.  Mosaic rejects 'high' and per-operand precision tuples.
# Read at import (same policy as PARALLAX_TILE_B): consulted at trace
# time, so flipping it mid-process has no effect on jit caches.
MXU_PRECISION = _os.environ.get("PARALLAX_MXU_PRECISION", "split3")


def _make_split_dot(nsplit):
    def _raw(a, b):
        a16 = a.astype(jnp.bfloat16)  # 0/1 entries: exact
        parts = []
        r = b
        for i in range(nsplit):
            h = r.astype(jnp.bfloat16)
            if i + 1 < nsplit:
                r = r - h.astype(jnp.float32)
            parts.append(h)
        # Stack the components along K instead of running nsplit separate
        # matmuls: [M, K]x nsplit -> [M, nsplit*K] @ [nsplit*K, N].  The
        # MXU's K dim is 128-deep, and every one-hot table in the solver
        # has K = n_bodies (~9) or K = C; for small K the stacked exact dot
        # costs the SAME MXU passes as the single bf16 pass (27 < 128).
        # Measured (round 5, lander B=8192): K-stacked 258.7 us/solve vs
        # 322.3 sequential-3 and 302.8 for a hybrid that K-stacks only
        # K<=16 — the stack wins at every K this kernel has.  Exactness
        # survives any accumulation order: the components occupy disjoint
        # mantissa ranges, so every partial sum is representable.
        a_s = jnp.concatenate([a16] * nsplit, axis=1)
        b_s = jnp.concatenate(parts, axis=0)
        return jnp.dot(a_s, b_s, preferred_element_type=jnp.float32)

    # custom_vjp is mandatory, not an optimization: autodiff through the
    # bf16 casts would round every branch's COTANGENT to bf16 (the vjp of
    # convert_element_type casts the cotangent to the branch dtype), which
    # re-broke gradient exactness at 2e-2.  The true vjp of b -> a@b is
    # a.T@g — itself a one-hot matmul, so the same split dot computes it
    # exactly.  ``a`` is always a static selection matrix (never
    # differentiated); its cotangent is returned as zeros.
    @jax.custom_vjp
    def dot(a, b):
        return _raw(a, b)

    def _fwd(a, b):
        return _raw(a, b), a

    def _bwd(a, g):
        return jnp.zeros_like(a), _raw(a.T, g)

    dot.defvjp(_fwd, _bwd)
    return dot


def _make_dot(precision):
    """One-hot matmul at the requested exactness mode (see MXU_PRECISION)."""
    if precision in ("split2", "split3"):
        return _make_split_dot(2 if precision == "split2" else 3)
    return functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )


def tile_for(n_contacts: int, batch: int, any_partner: bool = True,
             bwd: bool = False, total_iterations: int = _DEFAULT_TOTAL_ITERS):
    """Largest viable world-batch tile for this contact table, or None when
    even the smallest tile cannot fit (callers then run the XLA solver).
    TILE_B is a cap: raising it via PARALLAX_TILE_B still tries the whole
    ladder below it.  ``bwd=True`` models the backward kernel's larger live
    set, which scales with ``total_iterations`` (= velocity + position
    iterations: one vjp linearization snapshot stays live per pass)."""
    if bwd:
        if any_partner:
            live = _LIVE_BWD_BASE + _LIVE_BWD_PER_ITER * total_iterations
        else:
            live = (_LIVE_BWD_BASE_NO_PARTNER
                    + _LIVE_BWD_PER_ITER_NO_PARTNER * total_iterations)
    else:
        live = _LIVE_FACTOR if any_partner else _LIVE_FACTOR_NO_PARTNER
    # split modes keep extra per-dot operand copies live (bf16 components
    # + K-stack concats).  Empirical boundary (round 5, v5e): billiards48
    # (C=1320, no-partner) compiled at tile 512 with raw-bf16 dots but
    # VMEM-fails under split3 and fits at 256 -> effective live is >37 and
    # <=74 of the modeled 30; 1.6x reproduces the observed ladder.
    if MXU_PRECISION in ("split2", "split3"):
        live = int(live * (1.6 if MXU_PRECISION == "split3" else 1.35))
    for t in sorted({TILE_B, 1024, 512, 256, 128}, reverse=True):
        if t > TILE_B:
            continue
        if batch % t == 0 and live * n_contacts * t * 4 <= _VMEM_BUDGET:
            return t
    return None

# rows of the packed lane-constant input
_R_IM_A, _R_IM_B, _R_II_A, _R_II_B, _R_E, _R_MU, _R_IS_LEAD, _R_HAS_P = range(8)
_NUM_CONST_ROWS = 8


def _joint_rows(world):
    """Static host-side joint table -> list of plain-python dicts (the
    kernel unrolls them; shared with ops.pallas_step)."""
    joints = world.joints
    anc_a = np.asarray(joints.anchor_a)
    anc_b = np.asarray(joints.anchor_b)
    kp_np = np.asarray(joints.kp)
    kd_np = np.asarray(joints.kd)
    v0_np = np.asarray(joints.v0)
    rows = []
    for j in range(joints.n_joints):
        rows.append(
            dict(
                a=joints.body_a[j], b=joints.body_b[j],
                ax=float(anc_a[j, 0]), ay=float(anc_a[j, 1]),
                bx=float(anc_b[j, 0]), by=float(anc_b[j, 1]),
                kp=float(kp_np[j]), kd=float(kd_np[j]), v0=float(v0_np[j]),
            )
        )
    return rows


def apply_joint_rows(jrows, im, ii, px, py, vx, vy, ang, om):
    """Sequential spring-damper joints on [n, TB] planes via per-body row
    variables (no scatter; Pallas-safe and the fast XLA shape).  THE joint
    implementation: the Pallas kernels pass static float rows, and
    ``engine.batched.apply_joints_bm`` passes traced leaves (differentiable
    w.r.t. anchors/gains/masses).  Same reference impulse law
    (/root/reference/cotix/_lunar_lander.py:188-189)."""
    n = px.shape[0]
    vx_r = [vx[b] for b in range(n)]
    vy_r = [vy[b] for b in range(n)]
    om_r = [om[b] for b in range(n)]
    for j in jrows:
        a, b = j["a"], j["b"]
        ca, sa_ = jnp.cos(ang[a]), jnp.sin(ang[a])
        cb, sb_ = jnp.cos(ang[b]), jnp.sin(ang[b])
        pax = px[a] + ca * j["ax"] - sa_ * j["ay"]
        pay = py[a] + sa_ * j["ax"] + ca * j["ay"]
        pbx = px[b] + cb * j["bx"] - sb_ * j["by"]
        pby = py[b] + sb_ * j["bx"] + cb * j["by"]
        rax, ray = pax - px[a], pay - py[a]
        rbx, rby = pbx - px[b], pby - py[b]
        vax = vx_r[a] - ray * om_r[a]
        vay = vy_r[a] + rax * om_r[a]
        vbx = vx_r[b] - rby * om_r[b]
        vby = vy_r[b] + rbx * om_r[b]
        dpx, dpy = pax - pbx, pay - pby
        dvx_, dvy_ = vax - vbx, vay - vby
        dvn = jnp.sqrt(jnp.maximum(dvx_ * dvx_ + dvy_ * dvy_, 1e-30))
        Jx = dpx * j["kp"] + dvx_ * (dvn + j["v0"]) * j["kd"]
        Jy = dpy * j["kp"] + dvy_ * (dvn + j["v0"]) * j["kd"]
        # im/ii may be float tuples (kernel) or traced arrays (XLA path)
        im_a, im_b = im[a], im[b]
        ii_a, ii_b = ii[a], ii[b]
        vx_r[a] = vx_r[a] - Jx * im_a
        vx_r[b] = vx_r[b] + Jx * im_b
        vy_r[a] = vy_r[a] - Jy * im_a
        vy_r[b] = vy_r[b] + Jy * im_b
        om_r[a] = om_r[a] - (rax * Jy - ray * Jx) * ii_a
        om_r[b] = om_r[b] + (rbx * Jy - rby * Jx) * ii_b
    return jnp.stack(vx_r), jnp.stack(vy_r), jnp.stack(om_r)


def _build_operands(world):
    """Static (host-side) constants -> kernel input arrays."""
    table = world.table
    C = table.n_contacts
    ia = np.asarray(table.body_a)
    ib = np.asarray(table.body_b)
    partner = np.asarray(table.partner)
    has_p = partner >= 0
    ip = np.where(has_p, partner, np.arange(C))
    n = world.n_bodies
    is_lead = has_p & (partner > np.arange(C))

    params = world.params
    mass = np.asarray(params.mass)
    inertia = np.asarray(params.inertia)
    e_np = np.asarray(params.elasticity)
    mu_np = np.asarray(params.friction)
    im = (1.0 / mass).astype(np.float32)  # inf mass -> 0 (static bodies)
    ii = (1.0 / inertia).astype(np.float32)

    lane_const = np.zeros((_NUM_CONST_ROWS, C), np.float32)
    lane_const[_R_IM_A] = im[ia]
    lane_const[_R_IM_B] = im[ib]
    lane_const[_R_II_A] = ii[ia]
    lane_const[_R_II_B] = ii[ib]
    lane_const[_R_E] = np.minimum(e_np[ia], e_np[ib])
    lane_const[_R_MU] = (mu_np[ia] + mu_np[ib]) / 2
    lane_const[_R_IS_LEAD] = is_lead
    lane_const[_R_HAS_P] = has_p

    oh_a = np.zeros((C, n), np.float32)
    oh_a[np.arange(C), ia] = 1.0
    oh_b = np.zeros((C, n), np.float32)
    oh_b[np.arange(C), ib] = 1.0
    oh_p = np.zeros((C, C), np.float32)
    oh_p[np.arange(C), ip] = 1.0
    movable = np.asarray([0.0 if world.static_bodies[b] else 1.0 for b in range(n)],
                         np.float32)
    acc_a = oh_a.T * movable[:, None]  # [n, C]
    acc_b = oh_b.T * movable[:, None]
    # NUMPY on purpose: jnp constants created inside a traced region (a
    # scan body, a checkpoint segment) become trace-owned tracers, and a
    # custom_vjp closure that captures them leaks them into the transpose
    # trace (hit by the fused-step backward, round 5).  pallas_call
    # converts numpy operands within whichever trace invokes it.
    return dict(
        C=C, n=n,
        lane_const=lane_const,
        oh_a=oh_a, oh_b=oh_b,
        oh_p=oh_p,
        acc_a=acc_a, acc_b=acc_b,
        # static: any 2-point-manifold lanes at all?  circle/box-only
        # worlds (billiards, robocup) have none — the whole 2x2 block-solve
        # path and every pswap (oh_p == identity there) drop out of the
        # kernel statically.
        any_partner=bool(has_p.any()),
        im=tuple(im.tolist()), ii=tuple(ii.tolist()),
    )


def _zero_cotangent(x):
    """Zero cotangent matching what jax.vjp itself emits: float0 for
    non-inexact primals (bool ``active``), dense zeros otherwise."""
    if not jnp.issubdtype(x.dtype, jnp.inexact):
        return np.zeros(x.shape, jax.dtypes.float0)
    return jnp.zeros_like(x)


def solve_contacts_pallas(
    world,
    s,
    con,
    iterations: int,
    position_iterations: int,
    dt: float,
    config: ContactSolverConfig,
    interpret: bool = False,
    with_joints: bool = False,
    pallas_bwd: bool | None = None,
):
    """Drop-in twin of ``solve_contacts_bm`` running as one Pallas kernel.

    ``with_joints=True`` additionally applies the world's spring-damper
    joints inside the kernel (twin of ``apply_joints_bm``) — the body
    planes then make one fewer HBM round-trip and the joints' sequential
    row updates run in VMEM instead of as [1, B] XLA fusions.

    Differentiable via custom_vjp.  The backward is a SECOND Pallas kernel
    (``_solver_bwd_kernel``) that recomputes the forward in VMEM and runs
    ``jax.vjp`` of the same ``solve_arrays`` trace — one-hot MXU matmuls
    transpose to one-hot MXU matmuls, so the whole reverse pass is one
    launch instead of the dozens of small XLA fusions the re-linearized
    twin pays (DESIGN §7d: the solver vjp was 46%% of the train step).
    Falls back to the XLA twin's vjp when the backward's larger live set
    has no viable tile (``tile_for(..., bwd=True)`` is None) or when
    ``pallas_bwd=False`` / env ``PARALLAX_PALLAS_BWD=0``.  Both backwards
    differentiate value-identical forwards, so either is a consistent VJP.

    NOTE (ADVICE r4): the env var is consulted at TRACE time, so the
    chosen backward is baked into jit caches — set it before launching
    the process; flipping it mid-process has no effect on already-compiled
    steps.  Hardware status: the backward kernel is Mosaic-compiled and
    ULP-pinned against the XLA vjp on v5e (tools/tpu_smoke_bwd.py), and
    measured 1.57x/3.04x train throughput (DESIGN §7d)."""
    if pallas_bwd is None:
        pallas_bwd = _os.environ.get("PARALLAX_PALLAS_BWD", "1") != "0"
    C = world.table.n_contacts
    B = s.vx.shape[-1]
    any_partner = any(p >= 0 for p in np.asarray(world.table.partner))
    use_pallas_bwd = (
        pallas_bwd and C > 0
        and tile_for(C, B, any_partner, bwd=True,
                     total_iterations=iterations + position_iterations)
        is not None
    )

    @jax.custom_vjp
    def _solve(s, con):
        return _solve_fwd_only(world, s, con, iterations, position_iterations,
                               dt, config, interpret, with_joints)

    def _fwd(s, con):
        return _solve(s, con), (s, con)

    def _bwd(res, g):
        s0, con0 = res
        if use_pallas_bwd:
            ds, dpen_x, dpen_y, dpt_x, dpt_y = _solve_bwd_pallas(
                world, s0, con0, g, iterations, position_iterations, dt,
                config, interpret, with_joints,
            )
            dcon = con0._replace(
                pen_x=dpen_x, pen_y=dpen_y, pt_x=dpt_x, pt_y=dpt_y,
                active=_zero_cotangent(con0.active),
                weight=_zero_cotangent(con0.weight),
            )
            return ds, dcon

        from parallax_tpu.engine.batched import apply_joints_bm, solve_contacts_bm

        def jax_path(ss, cc):
            out = solve_contacts_bm(
                world, ss, cc, iterations, position_iterations, dt, config
            )
            if with_joints:
                out = apply_joints_bm(world, out)
            return out

        _, vjp = jax.vjp(jax_path, s0, con0)
        return vjp(g)

    _solve.defvjp(_fwd, _bwd)
    return _solve(s, con)


def _solve_fwd_only(
    world, s, con, iterations, position_iterations, dt, config, interpret,
    with_joints=False,
):
    ops = _build_operands(world)
    C, n = ops["C"], ops["n"]
    if C == 0:
        # no contact lanes, but the with_joints contract must still hold:
        # a contact-free world with joints gets them via the XLA path
        # (there is no kernel to fuse them into)
        if with_joints:
            from parallax_tpu.engine.batched import apply_joints_bm

            return apply_joints_bm(world, s)
        return s
    B = s.vx.shape[-1]
    tile_b = tile_for(C, B, ops["any_partner"])
    assert tile_b is not None, (
        f"no viable tile for C={C}, B={B} (callers must gate on tile_for)"
    )

    jrows = _joint_rows(world) if with_joints else []
    kernel = functools.partial(
        _solver_kernel,
        iterations=iterations,
        position_iterations=position_iterations,
        dt=float(dt),
        config=config,
        any_partner=ops["any_partner"],
        jrows=tuple(jrows),
        im_np=ops["im"],
        ii_np=ops["ii"],
    )

    grid = (B // tile_b,)

    def tile(rows):
        return pl.BlockSpec((rows, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((n, B), s.vx.dtype) for _ in range(6)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [whole(ops["lane_const"]), whole(ops["oh_a"]), whole(ops["oh_b"]),
             whole(ops["oh_p"]), whole(ops["acc_a"]), whole(ops["acc_b"])]
            + [tile(C)] * 6
            + [tile(n)] * 6
        ),
        out_specs=[tile(n)] * 6,
        out_shape=out_shapes,
        # Mosaic's default scoped-vmem limit is 16MB; big contact tables
        # legitimately keep more live (tile_for bounds it to _VMEM_BUDGET)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(
        ops["lane_const"], ops["oh_a"], ops["oh_b"], ops["oh_p"],
        ops["acc_a"], ops["acc_b"],
        con.pen_x, con.pen_y, con.pt_x, con.pt_y,
        con.active.astype(s.vx.dtype), con.weight,
        s.px, s.py, s.vx, s.vy, s.angle, s.omega,
    )
    px, py, vx, vy, angle, omega = outs
    return s._replace(px=px, py=py, vx=vx, vy=vy, angle=angle, omega=omega)


def _solve_bwd_pallas(
    world, s0, con0, g, iterations, position_iterations, dt, config,
    interpret, with_joints,
):
    """Reverse pass as ONE Pallas kernel: recompute the forward in VMEM and
    transpose it there too.  Residuals from custom_vjp are the primal
    inputs only (same recompute-from-inputs policy as the XLA fallback);
    the per-iteration linearization snapshots never touch HBM.  Returns
    (ds: _SoA-shaped state grads, d_pen_x, d_pen_y, d_pt_x, d_pt_y)."""
    ops = _build_operands(world)
    C, n = ops["C"], ops["n"]
    B = s0.vx.shape[-1]
    tile_b = tile_for(C, B, ops["any_partner"], bwd=True,
                      total_iterations=iterations + position_iterations)
    assert tile_b is not None, (
        f"no viable bwd tile for C={C}, B={B} (callers gate on tile_for(bwd=True))"
    )

    jrows = _joint_rows(world) if with_joints else []
    kernel = functools.partial(
        _solver_bwd_kernel,
        iterations=iterations,
        position_iterations=position_iterations,
        dt=float(dt),
        config=config,
        any_partner=ops["any_partner"],
        jrows=tuple(jrows),
        im_np=ops["im"],
        ii_np=ops["ii"],
    )

    grid = (B // tile_b,)

    def tile(rows):
        return pl.BlockSpec((rows, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    dtype = s0.vx.dtype
    out_shapes = (
        [jax.ShapeDtypeStruct((n, B), dtype) for _ in range(6)]
        + [jax.ShapeDtypeStruct((C, B), dtype) for _ in range(4)]
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [whole(ops["lane_const"]), whole(ops["oh_a"]), whole(ops["oh_b"]),
             whole(ops["oh_p"]), whole(ops["acc_a"]), whole(ops["acc_b"])]
            + [tile(C)] * 5
            + [tile(n)] * 12
        ),
        out_specs=[tile(n)] * 6 + [tile(C)] * 4,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(
        ops["lane_const"], ops["oh_a"], ops["oh_b"], ops["oh_p"],
        ops["acc_a"], ops["acc_b"],
        con0.pen_x, con0.pen_y, con0.pt_x, con0.pt_y,
        con0.active.astype(dtype),
        s0.px, s0.py, s0.vx, s0.vy, s0.angle, s0.omega,
        g.px, g.py, g.vx, g.vy, g.angle, g.omega,
    )
    ds = s0._replace(px=outs[0], py=outs[1], vx=outs[2], vy=outs[3],
                     angle=outs[4], omega=outs[5])
    return ds, outs[6], outs[7], outs[8], outs[9]


def _solver_bwd_kernel(
    const_ref, oh_a_ref, oh_b_ref, oh_p_ref, acc_a_ref, acc_b_ref,
    pen_x_ref, pen_y_ref, pt_x_ref, pt_y_ref, act_ref,
    px_ref, py_ref, vx_ref, vy_ref, ang_ref, om_ref,
    gpx_ref, gpy_ref, gvx_ref, gvy_ref, gang_ref, gom_ref,
    dpx_ref, dpy_ref, dvx_ref, dvy_ref, dang_ref, dom_ref,
    dpenx_ref, dpeny_ref, dptx_ref, dpty_ref,
    *, iterations, position_iterations, dt, config,
    any_partner=True, jrows=(), im_np=(), ii_np=(),
):
    lane = const_ref[:]
    oh_a = oh_a_ref[:]
    oh_b = oh_b_ref[:]
    oh_p = oh_p_ref[:]
    acc_a = acc_a_ref[:]
    acc_b = acc_b_ref[:]
    act = act_ref[:]

    def f(px, py, vx, vy, ang, om, pen_x, pen_y, pt_x, pt_y):
        opx, opy, ovx, ovy, oang, oom = solve_arrays(
            lane, oh_a, oh_b, oh_p, acc_a, acc_b,
            pen_x, pen_y, pt_x, pt_y, act,
            px, py, vx, vy, ang, om,
            iterations=iterations, position_iterations=position_iterations,
            dt=dt, config=config, any_partner=any_partner,
        )
        if jrows:
            ovx, ovy, oom = apply_joint_rows(
                jrows, im_np, ii_np, opx, opy, ovx, ovy, oang, oom
            )
        return opx, opy, ovx, ovy, oang, oom

    _, vjp = jax.vjp(
        f,
        px_ref[:], py_ref[:], vx_ref[:], vy_ref[:], ang_ref[:], om_ref[:],
        pen_x_ref[:], pen_y_ref[:], pt_x_ref[:], pt_y_ref[:],
    )
    grads = vjp(
        (gpx_ref[:], gpy_ref[:], gvx_ref[:], gvy_ref[:], gang_ref[:],
         gom_ref[:])
    )
    dpx_ref[:], dpy_ref[:], dvx_ref[:], dvy_ref[:], dang_ref[:], dom_ref[:] = (
        grads[:6]
    )
    dpenx_ref[:], dpeny_ref[:], dptx_ref[:], dpty_ref[:] = grads[6:]


def _solver_kernel(
    const_ref, oh_a_ref, oh_b_ref, oh_p_ref, acc_a_ref, acc_b_ref,
    pen_x_ref, pen_y_ref, pt_x_ref, pt_y_ref, act_ref, wgt_ref,
    px_ref, py_ref, vx_ref, vy_ref, ang_ref, om_ref,
    opx_ref, opy_ref, ovx_ref, ovy_ref, oang_ref, oom_ref,
    *, iterations, position_iterations, dt, config,
    any_partner=True, jrows=(), im_np=(), ii_np=(),
):
    opx, opy, ovx, ovy, oang, oom = solve_arrays(
        const_ref[:], oh_a_ref[:], oh_b_ref[:], oh_p_ref[:],
        acc_a_ref[:], acc_b_ref[:],
        pen_x_ref[:], pen_y_ref[:], pt_x_ref[:], pt_y_ref[:], act_ref[:],
        px_ref[:], py_ref[:], vx_ref[:], vy_ref[:], ang_ref[:], om_ref[:],
        iterations=iterations, position_iterations=position_iterations,
        dt=dt, config=config, any_partner=any_partner,
    )
    if jrows:
        ovx, ovy, oom = apply_joint_rows(
            jrows, im_np, ii_np, opx, opy, ovx, ovy, oang, oom
        )
    opx_ref[:] = opx
    opy_ref[:] = opy
    ovx_ref[:] = ovx
    ovy_ref[:] = ovy
    oang_ref[:] = oang
    oom_ref[:] = oom


def solve_arrays(
    lane, oh_a, oh_b, oh_p, acc_a, acc_b,
    pen_x, pen_y, pt_x, pt_y, act,
    px, py, vx, vy, ang, om,
    *, iterations, position_iterations, dt, config, any_partner=True,
):
    """The solver on plain arrays — shared by the standalone kernel and the
    fused step kernel (ops.pallas_step).  ``any_partner=False`` (no 2-point
    manifolds anywhere in the table, a static property) removes every
    pswap and the whole 2x2 block-solve path from the compiled kernel —
    for circle/box-only worlds those were pure identity work."""
    f32 = jnp.float32
    dot = _make_dot(MXU_PRECISION)
    C = pen_x.shape[0]

    # Round-5 M/K stacking: both gather sides ride ONE matmul ([2C, n] @
    # [n, TB] — 2C=96 for the lander still fits a single 128-row MXU tile,
    # so the B-side gather is free), and both scatter sides ride one
    # K-stacked matmul ([n, 2C] @ [2C, TB]).  Gathers are value-identical
    # to the separate dots (M-stacking never mixes accumulation lanes);
    # the scatter's K-concat reassociates the A+B sum (ULP-level, covered
    # by the existing atol-1e-5 equivalence tests).
    oh_ab = jnp.concatenate([oh_a, oh_b], axis=0)      # [2C, n]
    acc_ab = jnp.concatenate([acc_a, acc_b], axis=1)   # [n, 2C]
    if MXU_PRECISION in ("split2", "split3"):
        # pre-cast the static 0/1 matrices once (exact); the per-call
        # a.astype(bfloat16) inside the split dot is then a no-op
        oh_ab = oh_ab.astype(jnp.bfloat16)
        oh_p = oh_p.astype(jnp.bfloat16)
        acc_a = acc_a.astype(jnp.bfloat16)
        acc_b = acc_b.astype(jnp.bfloat16)
        acc_ab = acc_ab.astype(jnp.bfloat16)

    def gab(x):  # gather body rows for BOTH lane sides: ([C, TB], [C, TB])
        m = dot(oh_ab, x)
        return m[:C], m[C:]

    # Bundling x/y/omega into one 3x-wide matmul cuts MXU launches 3x, but
    # the [C, 3*TB] concats it needs blow the VMEM budget for big contact
    # tables (C=1320 in the 48-ball world spilled 208MB of registers);
    # bundle only when the wide intermediates stay small.
    bundle = C <= 256

    def gab3(x, y, z):
        """x/y/omega gathers for both sides; when bundled, ONE
        [2C, n] @ [n, 3*TB] matmul (each output column's K-dim accumulation
        is unchanged, so values are bitwise-identical either way)."""
        if not bundle:
            mx_a, mx_b = gab(x)
            my_a, my_b = gab(y)
            mz_a, mz_b = gab(z)
            return mx_a, my_a, mz_a, mx_b, my_b, mz_b
        tb = x.shape[-1]
        m = dot(oh_ab, jnp.concatenate([x, y, z], axis=1))
        ma, mb = m[:C], m[C:]
        return (ma[:, :tb], ma[:, tb:2 * tb], ma[:, 2 * tb:],
                mb[:, :tb], mb[:, tb:2 * tb], mb[:, 2 * tb:])

    def pswap(x):  # partner lane: [C, TB]
        return dot(oh_p, x)

    def pswap2(x, y):
        if not bundle:
            return pswap(x), pswap(y)
        tb = x.shape[-1]
        m = dot(oh_p, jnp.concatenate([x, y], axis=1))
        return m[:, :tb], m[:, tb:]

    im_a = lane[_R_IM_A][:, None]
    im_b = lane[_R_IM_B][:, None]
    ii_a = lane[_R_II_A][:, None]
    ii_b = lane[_R_II_B][:, None]
    e = lane[_R_E][:, None]
    mu = lane[_R_MU][:, None]
    is_lead = lane[_R_IS_LEAD][:, None] > 0
    has_p = lane[_R_HAS_P][:, None] > 0

    active = act > 0

    d2 = pen_x * pen_x + pen_y * pen_y
    inv_d = jax.lax.rsqrt(jnp.where(d2 <= 0, 1.0, d2))
    depth = d2 * inv_d
    nx = jnp.where(d2 == 0, 0.0, pen_x * inv_d)
    ny = jnp.where(d2 == 0, 0.0, pen_y * inv_d)
    tx, ty = -ny, nx

    gpx_a, gpx_b = gab(px)
    gpy_a, gpy_b = gab(py)
    rax = pt_x - gpx_a
    ray = pt_y - gpy_a
    rbx = pt_x - gpx_b
    rby = pt_y - gpy_b
    ran = rax * ny - ray * nx
    rbn = rbx * ny - rby * nx
    rat = rax * ty - ray * tx
    rbt = rbx * ty - rby * tx
    k_n = im_a + im_b + ii_a * ran * ran + ii_b * rbn * rbn
    k_t = im_a + im_b + ii_a * rat * rat + ii_b * rbt * rbt
    inv_kn = 1.0 / jnp.where(k_n == 0, 1.0, k_n)
    inv_kt = 1.0 / jnp.where(k_t == 0, 1.0, k_t)

    if any_partner:
        ran_p, rbn_p = pswap2(ran, rbn)
        k_np = im_a + im_b + ii_a * ran * ran_p + ii_b * rbn * rbn_p
        rat_p, rbt_p = pswap2(rat, rbt)
        k_tp = im_a + im_b + ii_a * rat * rat_p + ii_b * rbt * rbt_p
        k_p, k_tpd = pswap2(k_n, k_t)
        inv_kp = 1.0 / jnp.where(k_p == 0, 1.0, k_p)
        det = k_n * k_p - k_np * k_np
        ok_det = jnp.abs(det) >= 1e-12
        safe_det = jnp.where(ok_det, det, 1.0)
        det_t = k_t * k_tpd - k_tp * k_tp
        ok_det_t = jnp.abs(det_t) >= 1e-5 * k_t * k_tpd
        safe_det_t = jnp.where(ok_det_t, det_t, 1.0)
        inv_kt_coupled = 1.0 / jnp.where(k_t + k_tp == 0, 1.0, k_t + k_tp)
        active_f = active.astype(f32)
        blockable = has_p & active & (pswap(active_f) > 0)

    def rel_vel(vx, vy, om):
        gax, gay, om_a, gbx, gby, om_b = gab3(vx, vy, om)
        vax = gax - ray * om_a
        vay = gay + rax * om_a
        vbx = gbx - rby * om_b
        vby = gby + rbx * om_b
        rx = vbx - vax
        ry = vby - vay
        return rx * nx + ry * ny, rx * tx + ry * ty

    v_n0, _ = rel_vel(vx, vy, om)
    bias = (
        config.baumgarte
        * jnp.maximum(depth - config.baumgarte_slop, 0.0)
        / config.baumgarte_dt
    )
    if config.baumgarte_max_bias is not None:
        bias = jnp.minimum(bias, config.baumgarte_max_bias)
    rest = jnp.where(v_n0 > 0, e * jnp.maximum(v_n0, 0.0), 0.0)
    split = position_iterations > 0
    target = jnp.where(active, rest if split else rest + bias, 0.0)
    bias = jnp.where(active, bias, 0.0)

    def scatter(dj_n, dj_t, vx, vy, om):
        jx = dj_n * nx + dj_t * tx
        jy = dj_n * ny + dj_t * ty
        dvax = jx * im_a
        dvay = jy * im_a
        dwa = (rax * jy - ray * jx) * ii_a
        dvbx = -jx * im_b
        dvby = -jy * im_b
        dwb = -(rbx * jy - rby * jx) * ii_b
        if not bundle:
            vx = vx + dot(acc_a, dvax) + dot(acc_b, dvbx)
            vy = vy + dot(acc_a, dvay) + dot(acc_b, dvby)
            om = om + dot(acc_a, dwa) + dot(acc_b, dwb)
            return vx, vy, om
        tb = vx.shape[-1]
        # one [n, C] @ [C, 3*TB] matmul per side (3x fewer MXU launches)
        acc = dot(
            acc_a, jnp.concatenate([dvax, dvay, dwa], axis=1)
        ) + dot(
            acc_b, jnp.concatenate([dvbx, dvby, dwb], axis=1)
        )
        return (
            vx + acc[:, :tb],
            vy + acc[:, tb:2 * tb],
            om + acc[:, 2 * tb:],
        )

    jn = jnp.zeros_like(pen_x)
    jt = jnp.zeros_like(pen_x)
    for it in range(iterations):
        # iteration 0's velocities are the untouched inputs — the normal
        # relative velocity is exactly the restitution snapshot v_n0
        v_n = v_n0 if it == 0 else rel_vel(vx, vy, om)[0]
        rhs = v_n + target
        if it == 0:
            # jn == 0 exactly: drop the pswap(jn) and the k*0 terms
            # (0 + x == x and k*0 == 0 in f32 for finite k — bitwise-same)
            jn_single = jnp.maximum(rhs * inv_kn, 0.0)
        else:
            jn_single = jnp.maximum(jn + rhs * inv_kn, 0.0)
        if not any_partner:
            jn_new = jnp.where(active, jn_single, 0.0)
        else:
            if it == 0:
                rhs_p = pswap(rhs)
                b0 = rhs
                b1 = rhs_p
            else:
                rhs_p, jn_p = pswap2(rhs, jn)
                b0 = k_n * jn + k_np * jn_p + rhs
                b1 = k_np * jn + k_p * jn_p + rhs_p
            x0_full = (k_p * b0 - k_np * b1) / safe_det
            x1_full = (k_n * b1 - k_np * b0) / safe_det
            ok_full = (x0_full >= 0) & (x1_full >= 0) & ok_det
            x0_c2 = jnp.maximum(b0 * inv_kn, 0.0)
            ok_c2 = k_np * x0_c2 - b1 >= -1e-9
            x1_c3 = jnp.maximum(b1 * inv_kp, 0.0)
            ok_c3 = k_np * x1_c3 - b0 >= -1e-9
            x0 = jnp.where(ok_full, x0_full, jnp.where(ok_c2, x0_c2, 0.0))
            x1 = jnp.where(ok_full, x1_full, jnp.where(ok_c2, 0.0, jnp.where(ok_c3, x1_c3, 0.0)))
            jn_block = jnp.where(is_lead, x0, pswap(x1))
            jn_new = jnp.where(blockable, jn_block, jn_single)
            jn_new = jnp.where(active, jn_new, 0.0)
        vx, vy, om = scatter(jn_new - jn, jnp.zeros_like(jn), vx, vy, om)
        jn = jn_new

        _, v_t = rel_vel(vx, vy, om)
        if it == 0:  # jt == 0 exactly (same algebra as the normal pass)
            jt_single = v_t * inv_kt
        else:
            jt_single = jt + v_t * inv_kt
        if not any_partner:
            jt_new = jt_single
        else:
            if it == 0:
                jt_split = v_t * inv_kt_coupled
                v_t_p = pswap(v_t)
                bt0 = v_t
                bt1 = v_t_p
            else:
                jt_split = jt + v_t * inv_kt_coupled
                v_t_p, jt_p = pswap2(v_t, jt)
                bt0 = k_t * jt + k_tp * jt_p + v_t
                bt1 = k_tp * jt + k_tpd * jt_p + v_t_p
            xt0 = (k_tpd * bt0 - k_tp * bt1) / safe_det_t
            xt1 = (k_t * bt1 - k_tp * bt0) / safe_det_t
            jt_block = jnp.where(is_lead, xt0, pswap(xt1))
            jt_block = jnp.where(ok_det_t, jt_block, jt_split)
            jt_new = jnp.where(blockable, jt_block, jt_single)
        lim = mu * jn
        jt_new = jnp.clip(jt_new, -lim, lim)
        jt_new = jnp.where(active, jt_new, 0.0)
        vx, vy, om = scatter(jnp.zeros_like(jt), jt_new - jt, vx, vy, om)
        jt = jt_new

    opx = px
    opy = py
    oang = ang
    if split:
        pvx = jnp.zeros_like(vx)
        pvy = jnp.zeros_like(vy)
        pom = jnp.zeros_like(om)
        pj = jnp.zeros_like(jn)
        for it in range(position_iterations):
            if it == 0:
                # pseudo-velocities start at zero: rel_vel == 0 exactly,
                # so the first gather round is pure algebra
                rhs = bias
                pj_new = jnp.where(active, jnp.maximum(rhs * inv_kn, 0.0), 0.0)
                pvx, pvy, pom = scatter(pj_new, jnp.zeros_like(pj), pvx, pvy, pom)
            else:
                v_n, _ = rel_vel(pvx, pvy, pom)
                rhs = v_n + bias
                pj_new = jnp.where(active, jnp.maximum(pj + rhs * inv_kn, 0.0), 0.0)
                pvx, pvy, pom = scatter(pj_new - pj, jnp.zeros_like(pj), pvx, pvy, pom)
            pj = pj_new
        opx = opx + pvx * dt
        opy = opy + pvy * dt
        oang = oang + pom * dt

    return opx, opy, vx, vy, oang, om
