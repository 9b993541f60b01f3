from avmnist_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_batch_local,
    replicate_state,
    DATA_AXIS,
    MODEL_AXIS,
)
