"""Pure functional ops: padded graphs, kNN, diffusion schedules, kernels."""

from .graph import (
    PaddedGraph, gather_neighbors, gather_scalar, masked_neighbor_sum,
    masked_neighbor_mean, masked_global_mean, masked_global_max,
    masked_softmax, symmetric_norm, degrees, build_padded_graph,
    from_edge_index, batch_graphs, pick_bucket,
)
from .knn import knn_euclidean, knn_cosine, build_dual_knn, spatial_edge_weights
from .diffusion import (
    DiffusionSchedule, make_schedule, add_noise, ddpm_sample, ddpm_sample_step,
    sinusoidal_time_embedding,
)

__all__ = [
    "PaddedGraph", "gather_neighbors", "gather_scalar", "masked_neighbor_sum",
    "masked_neighbor_mean", "masked_global_mean", "masked_global_max",
    "masked_softmax", "symmetric_norm", "degrees", "build_padded_graph",
    "from_edge_index", "batch_graphs", "pick_bucket",
    "knn_euclidean", "knn_cosine", "build_dual_knn", "spatial_edge_weights",
    "DiffusionSchedule", "make_schedule", "add_noise", "ddpm_sample",
    "ddpm_sample_step", "sinusoidal_time_embedding",
]
