"""Differentiable-physics policy training on LunarLander.

Analytic policy gradients THROUGH the contact dynamics — the capability the
reference was built for but never wired up (its checkpointed GJK while-loops
existed 'just in case', /root/reference/cotix/_collisions.py:99-102).

Run:  python examples/train_lander.py [--steps 50] [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.parallel.mesh import make_world_mesh, replicated, shard_batch
from parallax_tpu.parallel.rollout import make_train_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--chunk", type=int, default=None,
                   help="per-chip wave size for fleets above one chunk per "
                        "chip (mesh-aware chunked rollout; default: "
                        "parallel.rollout.ROLLOUT_CHUNK)")
    p.add_argument("--remat-steps", action="store_true",
                   help="per-step jax.checkpoint in the rollout scan: "
                        "~17%% slower but fits ~2x the per-chip train "
                        "batch (DESIGN 7d)")
    args = p.parse_args()

    env = LunarLander()
    mesh = make_world_mesh()

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "w1": jax.random.normal(k1, (env.observation_size, 32)) * 0.3,
        "b1": jnp.zeros(32),
        "w2": jax.random.normal(k2, (32, env.action_size)) * 0.1,
        "b2": jnp.zeros(env.action_size),
    }

    def policy(p, obs):
        h = jnp.tanh(obs @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["w2"] + p["b2"])

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)
    train_step = jax.jit(
        make_train_step(env, policy, optimizer, args.horizon,
                        checkpoint_segments=4,
                        max_chunk=args.chunk, mesh=mesh,
                        remat_steps=args.remat_steps)
    )

    states = jax.vmap(env.reset)(jax.random.split(k3, args.batch))
    states = shard_batch(states, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    print(f"devices={len(jax.devices())} batch={args.batch} horizon={args.horizon}")
    for i in range(args.steps):
        t0 = time.perf_counter()
        params, opt_state, states, metrics = train_step(params, opt_state, states)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
        print(
            f"step {i:3d}  return={float(metrics['mean_return']):8.3f}  "
            f"loss={float(metrics['loss']):8.3f}  {dt*1000:6.1f} ms"
        )


if __name__ == "__main__":
    main()
