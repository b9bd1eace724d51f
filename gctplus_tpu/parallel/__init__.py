from gctplus_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_params,
)
