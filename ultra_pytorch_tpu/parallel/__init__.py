from ultra_pytorch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_dataset,
    shard_queries_for_host,
    make_dp_train_step,
)
