from .mesh import (
    batch_sharding,
    build_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_mapped_data_parallel,
)
from .distributed import (
    global_batch_from_local,
    host_shard,
    initialize,
    replicate_global,
)
