from ultra_pytorch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_dataset,
    shard_queries_for_host,
    host_stacked_dataset,
    device_sharded_dataset,
    make_dp_train_step,
)
