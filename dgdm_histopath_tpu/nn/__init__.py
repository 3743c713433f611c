"""Core NN building blocks (reference layer L2, ``dgdm_histopath/core/``)."""

from .attention import (
    MultiHeadAttention, SpatialAttention, CrossModalAttention,
    scaled_dot_product_attention, sinusoidal_position_encoding_2d,
)
from .graph_layers import (
    GraphConvolution, DynamicGraphLayer, AdaptiveGraphPooling, GraphUNet,
)
from .diffusion import DiffusionLayer, DenoiserMLP
from .moe import MoEFFN

__all__ = [
    "MoEFFN",
    "MultiHeadAttention", "SpatialAttention", "CrossModalAttention",
    "scaled_dot_product_attention", "sinusoidal_position_encoding_2d",
    "GraphConvolution", "DynamicGraphLayer", "AdaptiveGraphPooling", "GraphUNet",
    "DiffusionLayer", "DenoiserMLP",
]
