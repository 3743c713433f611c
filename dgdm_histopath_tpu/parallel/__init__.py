"""SPMD parallelism: mesh construction, shardings, distributed train-step."""

from .mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, data_sharding, replicated,
    shard_batch, replicate_tree, pad_batch_to_devices,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "data_sharding", "replicated",
    "shard_batch", "replicate_tree", "pad_batch_to_devices",
]
