"""Differentiable-physics multi-agent training on RoboCup SSL.

One shared policy drives every blue robot toward scoring (the yellow team
idles); gradients of the discounted goal/progress reward flow through robot–
ball–wall contact dynamics over the whole rollout.  Same train-step program
as examples/train_lander.py — swap the env, keep the mesh/sharding.

Run:  python examples/train_robocup.py [--steps 30] [--batch 128] [--robots 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from parallax_tpu.envs.robocup import RoboCup, RoboCupConfig
from parallax_tpu.parallel.mesh import make_world_mesh, replicated, shard_batch
from parallax_tpu.parallel.rollout import make_train_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--horizon", type=int, default=60)
    p.add_argument("--robots", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-3)
    args = p.parse_args()

    env = RoboCup(RoboCupConfig(n_robots_per_team=args.robots))
    mesh = make_world_mesh()

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "w1": jax.random.normal(k1, (env.observation_size, 64)) * 0.2,
        "b1": jnp.zeros(64),
        "w2": jax.random.normal(k2, (64, env.action_size)) * 0.1,
        "b2": jnp.zeros(env.action_size),
    }

    def policy(p, obs):
        h = jnp.tanh(obs @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["w2"] + p["b2"])

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)
    train_step = jax.jit(
        make_train_step(env, policy, optimizer, args.horizon,
                        checkpoint_segments=0)
    )

    states = env.reset_fn_batch(jax.random.split(k3, args.batch))
    states = shard_batch(states, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    print(
        f"devices={len(jax.devices())} batch={args.batch} "
        f"horizon={args.horizon} robots={args.robots}v{args.robots}"
    )
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
