"""Headline benchmark: LunarLander env-steps/s/chip at batch 8192.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the operative
target is 10M env-steps/s/chip on TPU v5e at batch 8192.  vs_baseline is
value / 1e7 (>1.0 beats the target).

Flags: ``--all`` benches RoboCup + the 48-ball billiards stress world too;
``--sweep`` runs the batch-size ladder 2k..32k (scaling-curve diagnosis);
``--batch N`` overrides the batch for the headline line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

try:  # persistent compile cache: repeat driver runs skip the ~1 min compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")
except Exception:
    pass

BATCH = 8192
TARGET = 10_000_000.0


def bench_env(env, name, inner=500, chain=3, batch=BATCH):
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = env.reset_fn_batch(keys)
    act_dim = env.action_size

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], act_dim), jnp.float32)

    @jax.jit
    def run(states):
        states, traj = env.rollout_batch(states, policy, inner)
        # scalar witness keeps per-step obs/reward/done computation live
        # (not DCE'd) without materializing [T, B] buffers in HBM
        return states, traj.reward.sum() + traj.obs.sum() + traj.done.sum()

    states, w = run(states)
    jax.block_until_ready(w)

    # Chain several dispatches per timed region with ONE device sync at the
    # end: a per-call block measures host<->device round-trip latency (large
    # under a tunneled TPU), not step throughput.
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chain):
            states, w = run(states)
        jax.block_until_ready(w)
        dt = time.perf_counter() - t0
        best = max(best, batch * inner * chain / dt)

    return {
        "metric": f"{name}_env_steps_per_sec_per_chip_batch{batch}",
        "value": round(best, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(best / TARGET, 4),
    }


def main():
    from parallax_tpu.envs.lunar_lander import LunarLander
    from parallax_tpu.envs.robocup import RoboCup

    batch = BATCH
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    if "--sweep" in sys.argv:
        for b in (2048, 4096, 8192, 16384, 32768):
            print(json.dumps(bench_env(LunarLander(), "lunarlander", batch=b)))
        return

    # headline line (the driver records exactly one JSON line)
    print(json.dumps(bench_env(LunarLander(), "lunarlander", batch=batch)))

    if "--all" in sys.argv:
        from parallax_tpu.envs.billiards import Billiards, BilliardsConfig

        print(json.dumps(bench_env(RoboCup(), "robocup", batch=batch)))
        # 48-body stress world: 1128 circle-circle + 192 circle-box lanes
        print(json.dumps(bench_env(
            Billiards(BilliardsConfig(n_object=47)), "billiards48", batch=batch
        )))


if __name__ == "__main__":
    main()
