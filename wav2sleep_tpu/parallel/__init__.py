from .mesh import (
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
    'DATA_AXIS',
    'MODEL_AXIS',
    'make_mesh',
    'batch_sharding',
    'replicated',
    'shard_batch',
    'replicate',
    'local_batch_size',
]
