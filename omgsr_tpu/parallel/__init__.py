from omgsr_tpu.parallel.sharding import (
    create_mesh,
    batch_sharding,
    replicated,
    shard_params_fsdp,
    device_put_params,
)
