"""Pallas TPU kernels for the hot ops."""

from .flash_spatial import flash_spatial_attention

__all__ = ["flash_spatial_attention"]
