from .map import parallelise, shard_across_hosts
from .mesh import (
    global_batch_from_local,
    maybe_initialize_distributed,
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    'parallelise',
    'shard_across_hosts',
    'maybe_initialize_distributed',
    'global_batch_from_local',
    'DATA_AXIS',
    'MODEL_AXIS',
    'make_mesh',
    'batch_sharding',
    'replicated',
    'shard_batch',
    'replicate',
    'local_batch_size',
]
