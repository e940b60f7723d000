"""Checkpoint / resume a training run mid-flight (SURVEY §5 aux subsystem).

Trains the LunarLander differentiable-physics policy for a few steps,
checkpoints (policy params + optimizer state + env-state fleet + step
counter) with orbax, kills the in-memory state, restores, and continues —
the resumed trajectory picks up exactly where the saved one left off
(bitwise-identical first post-restore metrics, printed for inspection).

Run:  python examples/checkpoint_resume.py [--dir /tmp/parallax_ckpt]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from parallax_tpu.envs import LunarLander
from parallax_tpu.parallel.rollout import make_train_step
from parallax_tpu.utils import checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/parallax_ckpt")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--horizon", type=int, default=40)
    args = p.parse_args()

    env = LunarLander()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "w": jax.random.normal(k1, (env.observation_size, env.action_size)) * 0.1,
        "b": jnp.zeros(env.action_size),
    }

    def policy(p_, obs):
        return jnp.tanh(obs @ p_["w"] + p_["b"])

    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    train_step = jax.jit(make_train_step(env, policy, optimizer, args.horizon))
    states = env.reset_fn_batch(jax.random.split(k3, args.batch))

    for i in range(3):
        params, opt_state, states, m = train_step(params, opt_state, states)
        print(f"step {i}  return={float(m['mean_return']):.6f}")

    ckpt = {"params": params, "opt_state": opt_state, "states": states,
            "step": jnp.asarray(3)}
    if os.path.exists(args.dir):
        shutil.rmtree(args.dir)
    checkpoint.save(args.dir, ckpt)
    print("saved checkpoint to", args.dir)

    # "continue" branch A: keep training in-memory
    pa, oa, sa, ma = train_step(params, opt_state, states)

    # branch B: restore from disk and take the same step
    restored = checkpoint.restore(args.dir, ckpt)
    pb, ob, sb, mb = train_step(
        restored["params"], restored["opt_state"], restored["states"]
    )
    print(f"resumed at step {int(restored['step'])}")
    print(f"in-memory  next return: {float(ma['mean_return']):.9f}")
    print(f"restored   next return: {float(mb['mean_return']):.9f}")
    same = abs(float(ma["mean_return"]) - float(mb["mean_return"])) == 0.0
    print("bitwise-identical resume:", same)


if __name__ == "__main__":
    main()
