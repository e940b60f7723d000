"""Render a LunarLander rollout to PNG frames (and a GIF when pillow is
available).  Run:  python examples/render_rollout.py [--steps 300]"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.viz import Renderer, save_gif


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--out", default="/tmp/lander_frames")
    args = p.parse_args()

    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    r = Renderer(width=400, height=300)

    os.makedirs(args.out, exist_ok=True)
    frames = []
    for i in range(args.steps):
        throttle = 0.45 if float(state.bodies.vel[0, 1]) < -0.3 else 0.1
        state, ts = step(state, jnp.array([throttle, 0.0]))
        if i % args.every == 0:
            frames.append(r.render_env(env, state))
    print(f"rendered {len(frames)} frames")

    try:
        save_gif(frames, os.path.join(args.out, "rollout.gif"), fps=20)
        print("wrote", os.path.join(args.out, "rollout.gif"))
    except ImportError:
        for i, f in enumerate(frames):
            np.save(os.path.join(args.out, f"frame_{i:04d}.npy"), f)
        print("pillow unavailable; wrote .npy frames to", args.out)


if __name__ == "__main__":
    main()
