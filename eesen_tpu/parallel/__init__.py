from eesen_tpu.parallel.mesh import MeshConfig, make_mesh
from eesen_tpu.parallel.sharding import (
    leaf_pspec,
    tree_pspecs,
    batch_pspec,
    shard_params,
    shard_state,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "leaf_pspec",
    "tree_pspecs",
    "batch_pspec",
    "shard_params",
    "shard_state",
    "shard_batch",
]
