"""Hardware equivalence check: Pallas solver kernel vs the XLA path on TPU.

CI asserts the kernel in interpreter mode only (tests/test_pallas_solver.py,
CPU); this script drives the REAL Mosaic-compiled kernel against the XLA
solver with paired steps from identical states on a landed lander fleet.

Expected result (v5e, measured): positions within ~3e-5 and identical
termination flags, but per-step velocity differences up to ~4e-2 on a
constant set of resting worlds.  That is NOT a miscompile: at a converged
resting contact the LCP complementarity residual sits exactly on the
solver's case-selection boundaries (ok_c2/ok_c3/ok_det_t in
ops/pallas_solver.py), and Mosaic's FMA contraction differs from XLA's by
ULPs there, so the two pick different — equally valid — impulse splits
between the two manifold lanes.  The difference is re-created (not
accumulated) each step: total impulse, positions, and outcomes agree.

    timeout 2400 python tools/check_hw_equiv.py
"""

import dataclasses

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

from parallax_tpu.envs.lunar_lander import LunarLander  # noqa: E402

B = 1024
STEPS = 80


def main():
    env = LunarLander()
    states = env.reset_fn_batch(jax.random.split(jax.random.PRNGKey(0), B))
    bodies = states.bodies.replace(
        pos=states.bodies.pos - jnp.asarray([0.0, 6.0]),
        vel=states.bodies.vel - jnp.asarray([0.0, 0.5]),
    )
    states = states.replace(bodies=bodies)
    acts = jnp.zeros((B, 2))

    env_xla = LunarLander()
    cfg = dataclasses.replace(env_xla.world.config, use_pallas_solver=False)
    env_xla.world = env_xla.world.replace(config=cfg)
    env_xla._bm_world = env_xla.world

    step_p = jax.jit(env.step_batch)
    step_x = jax.jit(env_xla.step_batch)
    sp = states
    max_pos = max_vel = 0.0
    contacts = 0
    for t in range(STEPS):
        sp2, tp = step_p(sp, acts)
        sx2, tx = step_x(sp, acts)  # paired from the same state
        max_pos = max(max_pos, float(jnp.abs(sp2.bodies.pos - sx2.bodies.pos).max()))
        max_vel = max(max_vel, float(jnp.abs(sp2.bodies.vel - sx2.bodies.vel).max()))
        assert (np.asarray(tp.done) == np.asarray(tx.done)).all(), t
        contacts += int(np.asarray(sp2.leg_contacts).sum())
        sp = sp2
    print(
        f"paired {STEPS} steps x {B} worlds: max|dpos|={max_pos:.3e} "
        f"max|dvel|={max_vel:.3e} leg_contact_events={contacts}"
    )
    assert contacts > 1000, "scenario must actually land"
    assert max_pos < 1e-4, "positions must agree (physical outcome)"
    # velocity lane-splits may differ at resting-contact case boundaries
    assert max_vel < 0.1, "velocity divergence beyond case-boundary scale"
    print("HW EQUIV OK (positions + outcomes agree; resting-contact "
          "impulse splits may differ at LCP case boundaries)")


if __name__ == "__main__":
    main()
