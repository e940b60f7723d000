"""Headline benchmark: LunarLander env-steps/s/chip at batch 8192.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the operative
target is 10M env-steps/s/chip on TPU v5e at batch 8192.  vs_baseline is
value / 1e7 (>1.0 beats the target).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 8192
TARGET = 10_000_000.0


def main():
    from parallax_tpu.envs.lunar_lander import LunarLander

    env = LunarLander()

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.zeros((BATCH, 2), jnp.float32)

    inner = 100  # env steps per timed call

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    @jax.jit
    def run(states, actions):
        states, _traj = env.rollout_batch(states, policy, inner)
        return states

    # compile + warmup
    states = run(states, actions)
    jax.block_until_ready(states)

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        states = run(states, actions)
        jax.block_until_ready(states)
        dt = time.perf_counter() - t0
        best = max(best, BATCH * inner / dt)

    print(
        json.dumps(
            {
                "metric": "lunarlander_env_steps_per_sec_per_chip_batch8192",
                "value": round(best, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(best / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
