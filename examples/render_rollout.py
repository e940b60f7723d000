"""Render a rollout of any bundled env to PNG frames (and a GIF when
pillow is available).

Run:  python examples/render_rollout.py [--env lander|robocup|billiards|bouncer]
      [--steps 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from parallax_tpu.envs import Billiards, Bouncer, LunarLander, RoboCup
from parallax_tpu.viz import Renderer, save_gif

ENVS = {
    "lander": (LunarLander, (-8.0, 8.0, -6.0, 6.0)),
    "robocup": (RoboCup, (-5.5, 5.5, -4.0, 4.0)),
    "billiards": (Billiards, (-1.3, 1.3, -0.8, 0.8)),
    "bouncer": (Bouncer, (-2.5, 2.5, -2.5, 2.5)),
}


def scripted_action(name, env, state, i):
    if name == "lander":
        throttle = 0.45 if float(state.bodies.vel[0, 1]) < -0.3 else 0.1
        return jnp.array([throttle, 0.0])
    if name in ("billiards", "bouncer"):
        return jnp.array([1.0, 0.1]) if i < 60 else jnp.zeros(2)
    # robocup: all robots drive forward
    return jnp.zeros(env.action_size).at[0::2].set(0.6)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", choices=sorted(ENVS), default="lander")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--every", type=int, default=5)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    cls, extent = ENVS[args.env]
    env = cls()
    out_dir = args.out or f"/tmp/{args.env}_frames"
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    r = Renderer(width=400, height=300, extent=extent)

    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i in range(args.steps):
        state, ts = step(state, scripted_action(args.env, env, state, i))
        if i % args.every == 0:
            frames.append(r.render_env(env, state))
    print(f"rendered {len(frames)} frames")

    try:
        save_gif(frames, os.path.join(out_dir, "rollout.gif"), fps=20)
        print("wrote", os.path.join(out_dir, "rollout.gif"))
    except ImportError:
        for i, f in enumerate(frames):
            np.save(os.path.join(out_dir, f"frame_{i:04d}.npy"), f)
        print("pillow unavailable; wrote .npy frames to", out_dir)


if __name__ == "__main__":
    main()
