"""Measure the fused Pallas step kernel vs the split path (VERDICT #8).

Times raw ``physics_core`` (no env wrapper) on the lander world at batch
8192, broadphase off (the only config the fused kernel serves), with
``use_pallas_fused`` on vs off.  Run on the real TPU:

    timeout 1800 python tools/bench_fused.py
"""

import dataclasses
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

from parallax_tpu.engine.batched import _to_soa, physics_core  # noqa: E402
from parallax_tpu.envs.lunar_lander import LunarLander  # noqa: E402

B = 8192
INNER = 500
CHAIN = 3


def bench(world, states):
    s0 = _to_soa(states.bodies)

    @jax.jit
    def run(s):
        def f(s, _):
            s, _c = physics_core(world, s)
            return s, None

        s, _ = jax.lax.scan(f, s, None, length=INNER)
        return s

    s = run(s0)
    jax.block_until_ready(s)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            s = run(s)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        best = max(best, B * INNER * CHAIN / dt)
    return best


def main():
    env = LunarLander()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    for fused in (False, True):
        cfg = dataclasses.replace(
            env.world.config, broadphase=False, use_pallas_fused=fused
        )
        world = env.world.replace(config=cfg)
        rate = bench(world, states)
        print(f"fused={fused}: {rate / 1e6:.2f}M world-steps/s, "
              f"{1e6 * B / rate:.1f} us per batched step")


if __name__ == "__main__":
    main()
