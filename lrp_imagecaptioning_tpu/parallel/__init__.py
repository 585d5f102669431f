from .mesh import (
    batch_sharding,
    build_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
