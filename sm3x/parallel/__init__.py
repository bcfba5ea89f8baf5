from sm3x.core.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    DATA_AXIS,
    MODEL_AXIS,
)
from sm3x.parallel.collectives import (  # noqa: F401
    all_gather_varlen,
    broadcast_string,
    cross_replica_mean,
    distributed_initialize,
    host_gather,
    host_gather_tree,
    is_main_process,
    process_info,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "DATA_AXIS",
    "MODEL_AXIS",
    "all_gather_varlen",
    "broadcast_string",
    "cross_replica_mean",
    "distributed_initialize",
    "host_gather",
    "host_gather_tree",
    "is_main_process",
    "process_info",
]
