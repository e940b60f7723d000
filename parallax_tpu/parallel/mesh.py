"""Device mesh + batch sharding for env fleets.

The scaling model (SURVEY §2.2, §5): environments are embarrassingly
parallel along the world-batch axis, so the mesh is one flat ``"worlds"``
axis spanning every chip (ICI within a slice, DCN across slices).  Each
device steps its shard of the batch with **zero per-step collectives**;
reductions (learner gradients, metrics) happen at the trajectory boundary
where XLA inserts psums over ICI automatically from the shardings.

Multi-host: call ``distributed_init(auto=True)`` (TPU pod slices:
auto-detected coordinator) or ``distributed_init(coordinator_address=...,
num_processes=..., process_id=...)`` once per process BEFORE any other jax
call, build the mesh over ``jax.devices()`` (global), and feed per-host
shards via ``host_local_batch`` — standard jax.distributed SPMD.  A bare
``distributed_init()`` is an explicit no-op (single-process mode).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORLD_AXIS = "worlds"


def distributed_init(
    coordinator_address: Optional[str] = None, auto: bool = False, **kwargs
) -> None:
    """Initialize multi-host JAX.

    Must run before anything touches the XLA backend, so the
    single-process decision is made from the arguments alone — probing
    ``jax.process_count()`` here would itself initialize the backend and
    make ``jax.distributed.initialize`` impossible (caught by
    tests/test_distributed.py).

    Called bare, this is a NO-OP (single-process).  TPU pod slices whose
    environment auto-detects the coordinator (the documented no-arg
    ``jax.distributed.initialize()`` path) must opt in with ``auto=True``;
    multiprocess CPU/GPU launches pass ``coordinator_address`` (+
    ``num_processes``/``process_id``) explicitly."""
    if coordinator_address is None and not kwargs and not auto:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


def make_world_mesh(devices=None, axis: str = WORLD_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; axis name = "worlds"."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = WORLD_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = WORLD_AXIS):
    """Place a batched pytree so its leading axis is sharded over the mesh.

    Every leaf must have the batch axis leading and divisible by the mesh
    size.  Constraint propagation inside jit keeps the layout end-to-end.
    """
    sh = batch_sharding(mesh, axis)
    n = mesh.devices.size
    fell_back = []

    def _put(x):
        if x.ndim == 0 or x.shape[0] % n != 0:
            if x.ndim > 0:
                fell_back.append(x.shape)
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, sh)

    out = jax.tree_util.tree_map(_put, tree)
    if fell_back:
        import warnings

        warnings.warn(
            f"shard_batch: {len(fell_back)} leaves with leading dim not "
            f"divisible by mesh size {n} (e.g. {fell_back[0]}) were "
            f"REPLICATED — every device will step the full batch. Pad the "
            f"batch to a multiple of {n} for actual parallelism.",
            stacklevel=2,
        )
    return out


def host_local_batch(global_batch: int) -> int:
    """Batch size this host should produce (global_batch / process_count)."""
    pc = jax.process_count()
    if global_batch % pc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} hosts")
    return global_batch // pc
