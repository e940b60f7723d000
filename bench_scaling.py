"""Mesh-scaling benchmark: world batch sharded over N devices.

Envs are embarrassingly parallel along the batch axis, so per-step
communication is zero and scaling should be ~linear.  On a multi-host TPU
fleet this runs over the global mesh; here it demonstrates the same sharded
program on however many devices are visible (use
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 for the virtual-CPU
mesh).  Prints one JSON line per device count with the scaling efficiency
relative to 1 device.

NOTE: on the virtual-CPU mesh the "devices" share the host's physical
cores, so measured efficiency is bounded by core count, not by the sharded
program (which contains zero per-step collectives — asserted by
tests/test_parallel.py::test_sharded_rollout_has_zero_per_step_collectives).
"""

import json
import time

import jax
import jax.numpy as jnp

from parallax_tpu.envs.lunar_lander import LunarLander
from parallax_tpu.parallel.mesh import make_world_mesh, shard_batch

PER_DEVICE_BATCH = 1024
INNER = 50


def bench(n_devices):
    devices = jax.devices()[:n_devices]
    mesh = make_world_mesh(devices)
    env = LunarLander()
    B = PER_DEVICE_BATCH * n_devices
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = env.reset_fn_batch(keys)
    states = shard_batch(states, mesh)

    def policy(_, obs):
        return jnp.zeros((obs.shape[0], 2), jnp.float32)

    @jax.jit
    def run(states):
        states, _ = env.rollout_batch(states, policy, INNER)
        return states

    states = run(states)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(3):
        states = run(states)
    jax.block_until_ready(states)
    dt = (time.perf_counter() - t0) / 3
    return B * INNER / dt


def main():
    counts = [1]
    n = len(jax.devices())
    if n >= 2:
        counts.append(2)
    if n >= 4:
        counts.append(4)
    if n >= 8:
        counts.append(8)
    base = None
    for c in counts:
        sps = bench(c)
        if base is None:
            base = sps
        print(
            json.dumps(
                {
                    "devices": c,
                    "env_steps_per_sec": round(sps, 1),
                    "scaling_efficiency": round(sps / (base * c), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
