"""Experimental model components.

Parity surface: reference ``dgdm_histopath/research/novel_algorithms.py`` —
``QuantumGraphDiffusion`` (:48; phase-modulated graph diffusion),
``HierarchicalAttentionFusion`` (:251), ``AdaptiveGraphTopology`` (:426;
learned edge rewiring). Implemented as flax modules on the padded-graph
layout; the "quantum" phase trick is an honest complex-valued feature mix.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import MultiHeadAttention
from ..nn.graph_layers import DynamicGraphLayer
from ..ops.graph import gather_neighbors, masked_neighbor_sum, masked_softmax

Dtype = jnp.dtype


class PhaseModulatedGraphDiffusion(nn.Module):
    """Graph diffusion with learned per-channel phase rotation.

    The reference's ``QuantumGraphDiffusion`` (:48) applies complex-phase
    mixing to node features between propagation rounds; realized here as a
    rotation in (even, odd)-channel pairs — a parameterized unitary mix that
    preserves feature norm, followed by masked neighbor averaging.
    """

    features: int
    num_rounds: int = 3
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, nbr_idx: jnp.ndarray,
                 nbr_mask: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        f = self.features
        if x.shape[-1] != f:
            x = nn.Dense(f, name="in_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        half = f // 2
        for r in range(self.num_rounds):
            theta = self.param(f"phase{r}", nn.initializers.uniform(0.1),
                               (half,), self.param_dtype).astype(x.dtype)
            a, b = x[..., :half], x[..., half:2 * half]
            rot_a = a * jnp.cos(theta) - b * jnp.sin(theta)
            rot_b = a * jnp.sin(theta) + b * jnp.cos(theta)
            x = jnp.concatenate([rot_a, rot_b, x[..., 2 * half:]], axis=-1)
            nbr = gather_neighbors(x, nbr_idx)
            agg = masked_neighbor_sum(nbr, nbr_mask)
            deg = jnp.maximum(jnp.sum(nbr_mask, axis=-1, keepdims=True), 1)
            x = 0.5 * x + 0.5 * agg / deg.astype(x.dtype)
            x = nn.LayerNorm(name=f"norm{r}", dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
        return x * node_mask[..., None].astype(x.dtype)


# legacy export name for API parity with the reference
QuantumGraphDiffusion = PhaseModulatedGraphDiffusion


class HierarchicalAttentionFusion(nn.Module):
    """Fuse multi-scale node embeddings with scale-level attention
    (reference :251)."""

    features: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, scale_embeddings: Sequence[jnp.ndarray],
                 node_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """scale_embeddings: list of [B, N, F] -> fused [B, N, F]."""
        stacked = jnp.stack(scale_embeddings, axis=2)   # [B, N, S, F]
        b, n, s, f = stacked.shape
        flat = stacked.reshape(b * n, s, f)
        attn = MultiHeadAttention(self.features, self.num_heads, name="scale_attn",
                                  dtype=self.dtype, param_dtype=self.param_dtype)
        mixed = attn(flat, deterministic=deterministic).reshape(b, n, s, f)
        gate_logits = nn.Dense(1, name="gate", dtype=self.dtype,
                               param_dtype=self.param_dtype)(mixed)[..., 0]
        gates = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
        fused = jnp.einsum("bns,bnsf->bnf", gates.astype(stacked.dtype), mixed)
        return fused * node_mask[..., None].astype(fused.dtype)


class AdaptiveGraphTopology(nn.Module):
    """Learned edge rewiring: re-score candidate neighbors and keep a learned
    soft top-k (reference :426). Shape-preserving — produces new edge weights
    over the existing candidate set rather than new indices."""

    features: int
    temperature: float = 0.5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, nbr_idx: jnp.ndarray,
                 nbr_mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        h = nn.Dense(self.features, name="proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        nbr = gather_neighbors(h, nbr_idx)                       # [..., N, K, F]
        score = jnp.einsum("...nf,...nkf->...nk", h, nbr).astype(jnp.float32)
        score = score / jnp.sqrt(jnp.asarray(self.features, jnp.float32))
        weights = masked_softmax(score / self.temperature, nbr_mask, axis=-1)
        # edges with weight below uniform get masked out (rewiring)
        k = nbr_mask.shape[-1]
        keep = (weights > 1.0 / (2.0 * k)) & nbr_mask
        return {"edge_weights": weights, "nbr_mask": keep, "scores": score}
