from omgsr_tpu.parallel.sharding import (
    create_mesh,
    batch_sharding,
    replicated,
    shard_params_fsdp,
    shard_params_flux_tp,
    device_put_params,
)
