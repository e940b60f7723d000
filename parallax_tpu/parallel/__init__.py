from parallax_tpu.parallel import mesh, rollout  # noqa: F401
from parallax_tpu.parallel.mesh import (  # noqa: F401
    WORLD_AXIS,
    batch_sharding,
    distributed_init,
    host_local_batch,
    make_world_mesh,
    replicated,
    shard_batch,
)
from parallax_tpu.parallel.rollout import (  # noqa: F401
    batched_rollout,
    make_train_step,
    rollout,
)
