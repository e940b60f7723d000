"""Hardware smoke + train bench for the FUSED-step backward kernel.

1. Mosaic-compiles _step_bwd_kernel on the real chip and cross-checks
   gradients (state + terrain planes) against the XLA path's vjp.
2. Benches the train step with the fused config
   (LanderConfig(use_pallas_fused=True, broadphase=False)).

Usage: timeout 3000 python tools/tpu_smoke_fused_bwd.py [--bench-only]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def smoke():
    import dataclasses

    from parallax_tpu.engine.batched import _to_soa, physics_core
    from parallax_tpu.envs.lunar_lander import LunarLander
    from parallax_tpu.ops.pallas_step import (
        fused_tile_for, physics_core_pallas, supports_fused_step,
    )

    env = LunarLander()
    world = env.world.replace(
        config=dataclasses.replace(env.world.config, broadphase=False)
    )
    assert supports_fused_step(world)
    B = 1024
    print("# bwd tile:", fused_tile_for(world.table.n_contacts, B, bwd=True),
          flush=True)
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
    tox, toy = tp[:, :, 0, :], tp[:, :, 1, :]
    parts = list(env._ground_parts)

    def loss_pallas(s_in, tox, toy):
        override = {p: (tox[i], toy[i]) for i, p in enumerate(parts)}
        out, _ = physics_core_pallas(world, s_in, terrain_override=override)
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    def loss_xla(s_in, tox, toy):
        override = {p: (tox[i], toy[i]) for i, p in enumerate(parts)}
        out, _ = physics_core(world, s_in, terrain_override=override)
        return sum((getattr(out, f) ** 2).sum()
                   for f in ("px", "py", "vx", "vy", "angle", "omega"))

    t0 = time.perf_counter()
    gp = jax.device_get(
        jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(s, tox, toy))
    print(f"# fused-bwd compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    gx = jax.device_get(
        jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(s, tox, toy))
    print(f"# xla-vjp compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    ok = True
    for f in ("px", "py", "vx", "vy", "angle", "omega"):
        a, b = np.asarray(getattr(gp[0], f)), np.asarray(getattr(gx[0], f))
        good = np.allclose(a, b, rtol=2e-4, atol=1e-5)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} d{f}  max|d|={np.abs(a-b).max():.3e}",
              flush=True)
    for name, a, b in (("dtox", gp[1], gx[1]), ("dtoy", gp[2], gx[2])):
        a, b = np.asarray(a), np.asarray(b)
        good = np.allclose(a, b, rtol=2e-4, atol=1e-5)
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} {name}  max|d|={np.abs(a-b).max():.3e}",
              flush=True)
    print("SMOKE_OK" if ok else "SMOKE_FAIL", flush=True)
    return ok


def bench():
    sys.argv = ["bench.py", "--child"]
    import json

    import bench as benchmod
    from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander

    env = LunarLander(LanderConfig(use_pallas_fused=True, broadphase=False))
    print(json.dumps(benchmod.bench_train(env, "lander_fused", batch=8192)),
          flush=True)
    env2 = LunarLander(LanderConfig(broadphase=False))
    print(json.dumps(benchmod.bench_train(env2, "lander_nofused_nobroad",
                                          batch=8192)), flush=True)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")
    if "--bench-only" not in sys.argv:
        if not smoke():
            sys.exit(1)
    bench()
