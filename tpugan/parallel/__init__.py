from tpugan.parallel.mesh import (  # noqa: F401
    data_mesh,
    batch_sharding,
    replicated_sharding,
    shard_state,
)
