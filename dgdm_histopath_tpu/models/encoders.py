"""Feature / graph / positional / hierarchical encoders.

Parity surface: reference ``dgdm_histopath/models/encoders.py`` —
``FeatureEncoder`` (:19-124), ``GraphEncoder`` (:127-280),
``PositionalEncoder`` (:283-360), ``HierarchicalEncoder`` (:363-481).

Bug-fix vs reference (SURVEY §8.6): edge features are projected from their
native dim at ingestion instead of hard-coding ``edge_dim=32`` and
substituting zeros.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import MultiHeadAttention, sinusoidal_position_encoding_2d
from ..nn.graph_layers import DynamicGraphLayer

Dtype = jnp.dtype

_ACTIVATIONS = {
    "gelu": nn.gelu,
    "relu": nn.relu,
    "silu": nn.silu,
    "tanh": jnp.tanh,
}


def get_activation(name: str):
    if name not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {name!r}; options: {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[name]


class FeatureEncoder(nn.Module):
    """MLP stack (Dense + Norm + Act + Dropout) x N with residual projection.

    Mirrors reference ``models/encoders.py:19-124``.
    """

    hidden_dims: Sequence[int]
    activation: str = "gelu"
    normalization: str = "layer"  # layer | none
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = get_activation(self.activation)
        h = x
        for i, dim in enumerate(self.hidden_dims):
            residual = h
            h = nn.Dense(dim, name=f"dense{i}", dtype=self.dtype,
                         param_dtype=self.param_dtype)(h)
            if self.normalization == "layer":
                h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"norm{i}")(h)
            h = act(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            if residual.shape[-1] == dim:
                h = h + residual
            else:
                h = h + nn.Dense(dim, use_bias=False, name=f"res_proj{i}",
                                 dtype=self.dtype, param_dtype=self.param_dtype)(residual)
        return h


class GraphEncoder(nn.Module):
    """Stack of ``DynamicGraphLayer``s with edge-feature projection.

    Mirrors reference ``models/encoders.py:127-280``: ``num_layers`` dynamic
    graph layers, per-layer norm/activation/dropout, output projection.
    Returns ``{"embeddings", "layer_outputs"}`` like the reference.
    """

    hidden_dim: int
    num_layers: int = 4
    num_heads: int = 8
    edge_dim: int = 3
    dropout: float = 0.1
    activation: str = "gelu"
    remat: bool = False   # jax.checkpoint each layer: FLOPs for HBM
    gather_impl: str = "auto"  # auto | onehot | xla(take) | pallas
    band_window: Optional[int] = None  # banded message passing (ops.graph)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # [..., N, F]
        nbr_idx: jnp.ndarray,
        nbr_mask: jnp.ndarray,
        node_mask: jnp.ndarray,
        edge_attr: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attention: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        act = get_activation(self.activation)
        h = nn.Dense(self.hidden_dim, name="input_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        e = None
        if edge_attr is not None:
            e = nn.Dense(self.hidden_dim // self.num_heads, name="edge_proj",
                         dtype=self.dtype, param_dtype=self.param_dtype)(
                edge_attr.astype(h.dtype))
        masked_nbr = nbr_mask & node_mask[..., None]
        layer_outputs = []
        attentions = []
        layer_cls = (nn.remat(DynamicGraphLayer, static_argnums=(5, 6))
                     if self.remat and not return_attention
                     else DynamicGraphLayer)
        for i in range(self.num_layers):
            result = layer_cls(
                self.hidden_dim, self.num_heads, self.dropout, name=f"layer{i}",
                gather_impl=self.gather_impl, band_window=self.band_window,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(h, nbr_idx, masked_nbr, e, deterministic, return_attention)
            if return_attention:
                h, attn = result
                attentions.append(attn)
            else:
                h = result
            h = act(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            layer_outputs.append(h)
        out = nn.Dense(self.hidden_dim, name="output_proj", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        out = out * node_mask[..., None].astype(out.dtype)
        result = {"embeddings": out, "layer_outputs": layer_outputs}
        if return_attention:
            result["attentions"] = attentions
        return result


class PositionalEncoder(nn.Module):
    """Sinusoidal encoding of normalized 2-D coordinates with a projection.

    Mirrors reference ``models/encoders.py:283-360`` (table-lookup sinusoids)
    as a direct computation.
    """

    embed_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pos: jnp.ndarray) -> jnp.ndarray:
        enc = sinusoidal_position_encoding_2d(pos, self.embed_dim)
        return nn.Dense(self.embed_dim, name="proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(enc.astype(self.dtype))


class HierarchicalEncoder(nn.Module):
    """Multi-resolution encoder: per-level GraphEncoders + cross-level attention.

    Mirrors reference ``models/encoders.py:363-481``. Levels share the node
    set here (padded layout); level granularity comes from pooling masks.
    """

    hidden_dim: int
    num_levels: int = 2
    num_layers_per_level: int = 2
    num_heads: int = 8
    edge_dim: int = 3
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        nbr_idx: jnp.ndarray,
        nbr_mask: jnp.ndarray,
        node_mask: jnp.ndarray,
        edge_attr: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        level_embs = []
        cur_mask = node_mask
        for lvl in range(self.num_levels):
            enc = GraphEncoder(
                self.hidden_dim, self.num_layers_per_level, self.num_heads,
                self.edge_dim, self.dropout, name=f"level{lvl}",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x, nbr_idx, nbr_mask, cur_mask, edge_attr, deterministic=deterministic)
            level_embs.append(enc["embeddings"])
            # coarsen: keep every other real node for the next level
            if lvl + 1 < self.num_levels:
                n = cur_mask.shape[-1]
                stride_keep = (jnp.arange(n) % 2 == 0)
                cur_mask = cur_mask & stride_keep
        # cross-level attention: finest level queries coarser levels
        fused = level_embs[0]
        for lvl in range(1, self.num_levels):
            fused = fused + MultiHeadAttention(
                self.hidden_dim, self.num_heads, self.dropout, name=f"cross{lvl}",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(fused, level_embs[lvl], level_embs[lvl], key_mask=node_mask,
              deterministic=deterministic)
        fused = nn.Dense(self.hidden_dim, name="fusion", dtype=self.dtype,
                         param_dtype=self.param_dtype)(
            jnp.concatenate([level_embs[0], fused], axis=-1))
        return fused * node_mask[..., None].astype(fused.dtype)
