"""Continuous-time evaluation of LunarLander: the reference's NFE/WFE API.

The reference defines this loop (AbstractEnvironment.eval, _envs.py:37-132)
but ships zero concrete judges/controls, so it never ran.  Here it runs:
a Judge with integral reward R = ∫ r(s,u) dt + terminal bonus, a Control
queried once per NFE returning a dense-in-time signal, premature-out on
landing/crash — and, because the whole loop is one differentiable XLA
program, the gradient of the continuous-time return w.r.t. the control.

Run:  python examples/evaluate_lander.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from parallax_tpu.envs.base import ConstantControl, evaluate
from parallax_tpu.envs.lunar_lander import LanderJudge, LunarLander, make_world_forward


def main():
    env = LunarLander()
    state = env.reset(jax.random.PRNGKey(1))
    bodies, terrain = state.bodies, state.terrain

    judge = LanderJudge(env, terrain)
    forward = make_world_forward(env, terrain)

    @jax.jit
    def run(throttle):
        control = ConstantControl(jnp.stack([throttle, jnp.zeros(())]))
        _, reward = evaluate(
            forward, bodies, control, judge,
            eval_period=3.0, num_nfes=30, wfe_scale=10,
        )
        return reward

    for throttle in (0.0, 0.25, 0.5):
        r = float(run(jnp.asarray(throttle)))
        print(f"throttle={throttle:4.2f}  continuous-time return = {r:8.3f}")

    g = jax.jit(jax.grad(run))(jnp.asarray(0.25))
    print(f"d(return)/d(throttle) at 0.25 = {float(g):.4f}  (finite: {bool(jnp.isfinite(g))})")

    # resolution refinement: more NFEs -> finer control sampling, same physics dt
    @jax.jit
    def run_nfe(throttle, period=3.0):
        control = ConstantControl(jnp.stack([throttle, jnp.zeros(())]))
        _, r = evaluate(forward, bodies, control, judge, period, 60, 5)
        return r

    r60 = float(run_nfe(jnp.asarray(0.25)))
    print(f"same period at 60 NFE x 5 WFE: return = {r60:8.3f} (should be close)")


if __name__ == "__main__":
    main()
