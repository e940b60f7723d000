"""Per-phase TPU timings across batch sizes (VERDICT #3 diagnosis).

Times three nested slices of the lander step at each batch size —
collide-only, full physics (collide + solve + joints), and the full env
rollout (physics + terrain override + obs/reward/reset).

CAVEAT (measured): the three loops are SEPARATE XLA programs with
different DCE surfaces and layouts, so their times are NOT decomposable
into phases — the physics-only scan even compiles ~40% slower than the
full env scan at the same batch.  For real attribution use device-side
profiling instead (jax.profiler.start_trace works through the axon
tunnel; per-op rows appear under the /device:TPU:0 pid — see CLAUDE.md).
This tool remains useful only for the per-program batch-scaling SHAPE.

    timeout 3500 python tools/bench_phases.py [B ...]
"""

import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

from parallax_tpu.engine.batched import (  # noqa: E402
    _to_soa,
    collide_batched,
    physics_core,
)
from parallax_tpu.envs.lunar_lander import LunarLander  # noqa: E402

INNER = 200
CHAIN = 3


def timeit(run, s0):
    s = run(s0)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            s = run(s)
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
        best = min(best, (time.perf_counter() - t0) / (INNER * CHAIN))
    return best  # seconds per batched step


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8192, 16384, 32768]
    env = LunarLander()
    world = env.world

    for B in batches:
        states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
        s0 = _to_soa(states.bodies)

        @jax.jit
        def collide_loop(s):
            def f(s, _):
                con = collide_batched(world, s)
                # fold the contact buffer back into the carry so the scan
                # doesn't DCE or hoist the collide
                return s._replace(vx=s.vx + 0.0 * con.pen_x.sum(0)), None

            return jax.lax.scan(f, s, None, length=INNER)[0]

        @jax.jit
        def physics_loop(s):
            def f(s, _):
                s, _c = physics_core(world, s)
                return s, None

            return jax.lax.scan(f, s, None, length=INNER)[0]

        def policy(_, obs):
            return jnp.zeros((obs.shape[0], env.action_size), jnp.float32)

        @jax.jit
        def env_loop(states):
            states, traj = env.rollout_batch(states, policy, INNER)
            return states, traj.reward.sum() + traj.obs.sum() + traj.done.sum()

        t_col = timeit(collide_loop, s0)
        t_phy = timeit(physics_loop, s0)
        t_env = timeit(lambda st: env_loop(st)[0], states)
        print(
            f"B={B:6d}: collide {t_col * 1e6:7.1f} us | physics {t_phy * 1e6:7.1f} us "
            f"| env {t_env * 1e6:7.1f} us | env-steps/s {B / t_env / 1e6:6.2f}M "
            f"(solver+joints ~{(t_phy - t_col) * 1e6:6.1f} us, "
            f"wrapper ~{(t_env - t_phy) * 1e6:6.1f} us)",
            flush=True,
        )


if __name__ == "__main__":
    main()
