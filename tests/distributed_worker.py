"""Worker process for the multi-host smoke test (not a pytest module).

Launched N times by tests/test_distributed.py with distinct process ids.
Each worker is one "host": it initializes the jax.distributed process
group through ``parallel.mesh.distributed_init``, builds the global
"worlds" mesh spanning every process's devices, feeds its *host-local*
shard of the world batch (``host_local_batch`` +
``jax.make_array_from_process_local_data``), and runs one full sharded
training step (rollout + grad-through-physics + optimizer).  It prints a
``CHECKSUM`` line; the parent asserts all workers exit 0 and agree —
proving the cross-host collectives produced a consistent replicated
result.  This is the multi-process CPU emulation of the multi-host path
SURVEY §4 calls for.
"""

import sys


def main(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")

    from parallax_tpu.parallel.mesh import (
        batch_sharding,
        distributed_init,
        host_local_batch,
        make_world_mesh,
        replicated,
    )

    distributed_init(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == num_processes * n_local, (n_global, n_local)
    print(f"proc {process_id}: global={n_global} local={n_local}", flush=True)

    import numpy as np
    import jax.numpy as jnp
    import optax

    from parallax_tpu.envs.lunar_lander import LunarLander
    from parallax_tpu.parallel.rollout import make_train_step

    env = LunarLander()
    GLOBAL_B = 2 * n_global  # 2 worlds per device
    B_loc = host_local_batch(GLOBAL_B)

    mesh = make_world_mesh()
    sh = batch_sharding(mesh)

    # host-local shard of a globally-consistent key batch
    keys = jax.random.split(jax.random.PRNGKey(1), GLOBAL_B)
    local_keys = np.asarray(keys)[process_id * B_loc : (process_id + 1) * B_loc]
    gkeys = jax.make_array_from_process_local_data(sh, local_keys)

    obs_dim, act_dim = env.observation_size, env.action_size

    def policy_fn(p, obs):
        h = jnp.tanh(obs @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["w2"] + p["b2"])

    optimizer = optax.adam(1e-3)
    train_step = make_train_step(env, policy_fn, optimizer, n_steps=3)

    @jax.jit
    def run(keys):
        # params/opt derive from a replicated constant key -> replicated;
        # states derive from the sharded keys -> batch-sharded; the loss
        # reduction forces a cross-host psum.
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {
            "w1": jax.random.normal(k1, (obs_dim, 16)) * 0.1,
            "b1": jnp.zeros(16),
            "w2": jax.random.normal(k2, (16, act_dim)) * 0.1,
            "b2": jnp.zeros(act_dim),
        }
        opt_state = optimizer.init(params)
        states = jax.vmap(env.reset)(keys)
        params, opt_state, states, metrics = train_step(params, opt_state, states)
        return metrics

    metrics = run(jax.device_put(gkeys, sh))
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])
    ret = float(metrics["mean_return"])
    assert np.isfinite(loss) and np.isfinite(ret)
    print(f"proc {process_id}: CHECKSUM {loss!r} {ret!r}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
