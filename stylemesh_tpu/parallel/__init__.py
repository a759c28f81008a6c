from stylemesh_tpu.parallel.mesh import (
    make_mesh,
    replicate_sharding,
    view_batch_sharding,
)
from stylemesh_tpu.parallel.train import ShardedTexturePipeline

__all__ = [
    "make_mesh",
    "replicate_sharding",
    "view_batch_sharding",
    "ShardedTexturePipeline",
]
