"""Device-mesh parallelism: mesh construction + TP/DP sharding rules."""

from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, replicated
from .sharding import param_specs, shard_params

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_specs",
    "replicated",
    "shard_params",
]
