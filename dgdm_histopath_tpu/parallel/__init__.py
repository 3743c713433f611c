"""SPMD parallelism: mesh construction, shardings, distributed train-step."""

from .mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, data_sharding, replicated,
    shard_batch, replicate_tree, pad_batch_to_devices,
)
from .tp import (
    tp_size, tp_param_specs, shard_tree_like, place_state_tp,
    describe_sharding,
)
from .sp import node_sharding, shard_graph_nodes, constrain_nodes
from .halo import (
    HaloPlan, build_halo_plan, halo_gather, halo_fraction, spatial_sort,
    spatial_permutation, permute_graph, sp_graph_conv,
)
from .pp import (
    PIPE_AXIS, pipe_size, stack_layer_params, unstack_layer_params,
    make_pp_layers_fn, pp_graph_encoder_apply, pp_bubble_fraction,
)
from .ep import EXPERT_AXIS, ep_size, ep_param_specs, count_expert_sharded

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "data_sharding", "replicated",
    "shard_batch", "replicate_tree", "pad_batch_to_devices",
    "tp_size", "tp_param_specs", "shard_tree_like", "place_state_tp",
    "describe_sharding",
    "node_sharding", "shard_graph_nodes", "constrain_nodes",
    "HaloPlan", "build_halo_plan", "halo_gather", "halo_fraction",
    "spatial_sort", "spatial_permutation", "permute_graph", "sp_graph_conv",
    "PIPE_AXIS", "pipe_size", "stack_layer_params", "unstack_layer_params",
    "make_pp_layers_fn", "pp_graph_encoder_apply", "pp_bubble_fraction",
    "EXPERT_AXIS", "ep_size", "ep_param_specs", "count_expert_sharded",
]
