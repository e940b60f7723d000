"""Hardware smoke for the Pallas BACKWARD solver kernel (round-5 item #1).

Runs the real Mosaic compile (interpret=False) of `_solver_bwd_kernel` on
the attached TPU and cross-checks the gradients against the XLA twin's vjp
— the same assertion as tests/test_pallas_solver.py::
test_pallas_bwd_kernel_matches_xla_vjp, but on hardware, where interpret
mode cannot prove the transposed one-hot-matmul trace lowers.

Usage:  timeout 900 python tools/tpu_smoke_bwd.py [--batch 1024]
Prints PASS/FAIL lines per plane; exits nonzero on any mismatch.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_contact_state(batch):
    from parallax_tpu.engine.batched import _to_soa, collide_batched
    from parallax_tpu.envs.lunar_lander import LunarLander

    env = LunarLander()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), batch))
    bodies = states.bodies.replace(
        pos=states.bodies.pos - jnp.asarray([0.0, 6.2])[None, None, :],
        vel=states.bodies.vel - jnp.asarray([0.0, 0.6])[None, None, :],
    )
    states = states.replace(bodies=bodies)
    acts = jnp.zeros((batch, 2))
    step = jax.jit(env.step_batch)
    for _ in range(40):
        states, _ = step(states, acts)
    s = _to_soa(states.bodies)
    tflat = jnp.swapaxes(states.terrain, 0, 1)
    tp = tflat.reshape(7, 8, 2, batch)
    override = {
        p: (tp[i, :, 0, :], tp[i, :, 1, :])
        for i, p in enumerate(env._ground_parts)
    }
    con = jax.jit(lambda s: collide_batched(env.world, s, override))(s)
    n_active = int(jax.device_get(con.active.sum()))
    print(f"# contact lanes active: {n_active}", flush=True)
    assert n_active > 50, "scenario must have real contacts"
    return env.world, s, con


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--with-joints", action="store_true", default=True)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")
    print(f"# devices: {jax.devices()}", flush=True)

    from parallax_tpu.engine.batched import apply_joints_bm, solve_contacts_bm
    from parallax_tpu.ops.pallas_solver import solve_contacts_pallas, tile_for

    world, s, con = build_contact_state(args.batch)
    C = world.table.n_contacts
    tb = tile_for(C, args.batch, bwd=True)
    print(f"# C={C} B={args.batch} bwd tile={tb}", flush=True)
    assert tb is not None

    def loss_pallas(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = solve_contacts_pallas(
            world, s_in, c2, 3, 2, 0.01, world.config.contact,
            interpret=False, with_joints=True, pallas_bwd=True,
        )
        return sum(
            (getattr(out, f) ** 2).sum()
            for f in ("px", "py", "vx", "vy", "angle", "omega")
        )

    def loss_xla(s_in, pen_x, pt_x):
        c2 = con._replace(pen_x=pen_x, pt_x=pt_x)
        out = solve_contacts_bm(world, s_in, c2, 3, 2, 0.01, world.config.contact)
        out = apply_joints_bm(world, out)
        return sum(
            (getattr(out, f) ** 2).sum()
            for f in ("px", "py", "vx", "vy", "angle", "omega")
        )

    t0 = time.perf_counter()
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(s, con.pen_x, con.pt_x)
    gp = jax.device_get(gp)
    print(f"# pallas-bwd compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(s, con.pen_x, con.pt_x)
    gx = jax.device_get(gx)
    print(f"# xla-vjp compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    ok = True
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        a = np.asarray(getattr(gp[0], f))
        b = np.asarray(getattr(gx[0], f))
        try:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
            print(f"PASS d{f}  max|d|={np.abs(a - b).max():.3e}", flush=True)
        except AssertionError:
            ok = False
            print(f"FAIL d{f}  max|d|={np.abs(a - b).max():.3e}", flush=True)
    for name, a, b in (("dpen_x", gp[1], gx[1]), ("dpt_x", gp[2], gx[2])):
        a, b = np.asarray(a), np.asarray(b)
        try:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
            print(f"PASS {name}  max|d|={np.abs(a - b).max():.3e}", flush=True)
        except AssertionError:
            ok = False
            print(f"FAIL {name}  max|d|={np.abs(a - b).max():.3e}", flush=True)
    print("SMOKE_OK" if ok else "SMOKE_FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
