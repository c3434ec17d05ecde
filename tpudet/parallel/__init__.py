from .mesh import (make_mesh, shard_batch, replicate, jit_train_step,
                   data_sharding, replicated_sharding)

__all__ = [
    'make_mesh', 'shard_batch', 'replicate', 'jit_train_step',
    'data_sharding', 'replicated_sharding'
]
