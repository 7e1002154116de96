from tpugan.parallel.mesh import (  # noqa: F401
    auto_sharding,
    replicate_for,
    batch_sharding,
    data_mesh,
    replicated_sharding,
    shard_state,
)
