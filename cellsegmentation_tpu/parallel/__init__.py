from cellsegmentation_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    local_mesh_shape,
)
from cellsegmentation_tpu.parallel.sharding import (
    infer_param_shardings,
    shard_batch,
    replicate_tree,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "local_mesh_shape",
    "infer_param_shardings",
    "shard_batch",
    "replicate_tree",
]
