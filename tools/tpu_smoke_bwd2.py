"""Diagnose the hardware Pallas-bwd vs XLA-vjp deltas: relative error
distribution + forward-value agreement on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_smoke_bwd import build_contact_state


def rel_report(name, a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    ad = np.abs(a - b)
    scale = np.maximum(np.abs(a), np.abs(b))
    rel = ad / np.maximum(scale, 1e-12)
    # relative error only where the value is non-tiny
    mask = scale > 1e-3 * scale.max() if scale.max() > 0 else scale > 0
    relm = rel[mask].max() if mask.any() else 0.0
    print(
        f"{name:8s} |g|max={np.abs(b).max():.3e} absd={ad.max():.3e} "
        f"reld(masked)={relm:.3e} reld(all)={rel.max():.3e}",
        flush=True,
    )


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")
    from parallax_tpu.engine.batched import apply_joints_bm, solve_contacts_bm
    from parallax_tpu.ops.pallas_solver import solve_contacts_pallas

    B = 1024
    world, s, con = build_contact_state(B)

    # forward agreement on hardware first
    fwd_p = jax.jit(lambda s, c: solve_contacts_pallas(
        world, s, c, 3, 2, 0.01, world.config.contact,
        interpret=False, with_joints=True,
    ))(s, con)
    fwd_x = jax.jit(lambda s, c: apply_joints_bm(
        world, solve_contacts_bm(world, s, c, 3, 2, 0.01, world.config.contact)
    ))(s, con)
    fwd_p, fwd_x = jax.device_get((fwd_p, fwd_x))
    print("== forward (hardware, pallas fwd kernel vs XLA) ==", flush=True)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        rel_report(f, getattr(fwd_p, f), getattr(fwd_x, f))

    def loss_pallas(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = solve_contacts_pallas(
            world, s_in, c2, 3, 2, 0.01, world.config.contact,
            interpret=False, with_joints=True, pallas_bwd=True,
        )
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    def loss_pallas_xlabwd(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = solve_contacts_pallas(
            world, s_in, c2, 3, 2, 0.01, world.config.contact,
            interpret=False, with_joints=True, pallas_bwd=False,
        )
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    def loss_xla(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = apply_joints_bm(
            world,
            solve_contacts_bm(world, s_in, c2, 3, 2, 0.01, world.config.contact),
        )
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    gp = jax.device_get(jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(
        s, con.pen_x, con.pt_x))
    gpx = jax.device_get(jax.jit(jax.grad(loss_pallas_xlabwd, argnums=(0, 1, 2)))(
        s, con.pen_x, con.pt_x))
    gx = jax.device_get(jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(
        s, con.pen_x, con.pt_x))

    print("== pallas-bwd-kernel vs XLA twin vjp ==", flush=True)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        rel_report("d" + f, getattr(gp[0], f), getattr(gx[0], f))
    rel_report("dpen_x", gp[1], gx[1])
    rel_report("dpt_x", gp[2], gx[2])

    print("== pallas-fwd + XLA-twin-bwd vs pure-XLA vjp (fwd value diff only) ==",
          flush=True)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        rel_report("d" + f, getattr(gpx[0], f), getattr(gx[0], f))
    rel_report("dpen_x", gpx[1], gx[1])
    rel_report("dpt_x", gpx[2], gx[2])

    print("== pallas-bwd-kernel vs pallas-fwd+XLA-bwd (same primal values) ==",
          flush=True)
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        rel_report("d" + f, getattr(gp[0], f), getattr(gpx[0], f))
    rel_report("dpen_x", gp[1], gpx[1])
    rel_report("dpt_x", gp[2], gpx[2])


if __name__ == "__main__":
    main()
