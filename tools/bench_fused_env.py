"""Env-level fused-kernel comparison (VERDICT #8 follow-through).

Times the full LunarLander ``rollout_batch`` (thrust + physics + reward +
auto-reset) at batch 8192 in three configurations:

* split+bp:   broadphase on,  collide-in-XLA + solver-in-Pallas (default)
* split:      broadphase off, collide-in-XLA + solver-in-Pallas
* fused:      broadphase off, whole step as one Pallas kernel

Run on the real TPU:  timeout 3000 python tools/bench_fused_env.py
"""

import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

from parallax_tpu.envs.lunar_lander import LanderConfig, LunarLander  # noqa: E402

B = 8192
INNER = 500
CHAIN = 3


def bench(env):
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], env.action_size), jnp.float32)

    @jax.jit
    def run(states):
        states, traj = env.rollout_batch(states, policy, INNER)
        return states, traj.reward.sum() + traj.obs.sum() + traj.done.sum()

    states, w = run(states)
    jax.block_until_ready(w)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            states, w = run(states)
        jax.block_until_ready(w)
        best = max(best, B * INNER * CHAIN / (time.perf_counter() - t0))
    return best


def main():
    from parallax_tpu.envs.billiards import Billiards, BilliardsConfig
    from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig

    cases = [
        ("lander    split+bp", LunarLander(LanderConfig())),
        ("lander    split   ", LunarLander(LanderConfig(broadphase=False))),
        ("lander    fused   ",
         LunarLander(LanderConfig(broadphase=False, use_pallas_fused=True))),
        # circle/box worlds (round-3 fused family): broadphase never touches
        # their kernels, so the default config is the fair split baseline
        ("robocup   split   ", RoboCup(RoboCupConfig())),
        ("robocup   fused   ", RoboCup(RoboCupConfig(use_pallas_fused=True))),
        ("billiards split   ", Billiards(BilliardsConfig())),
        ("billiards fused   ",
         Billiards(BilliardsConfig(use_pallas_fused=True))),
    ]
    for name, env in cases:
        rate = bench(env)
        print(f"{name}: {rate / 1e6:6.2f}M env-steps/s, "
              f"{1e6 * B / rate:6.1f} us per batched step", flush=True)


if __name__ == "__main__":
    main()
