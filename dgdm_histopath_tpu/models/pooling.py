"""Global graph pooling (masked, batched).

Parity surface: reference ``dgdm_histopath/models/dgdm_model.py:552-642`` —
``GlobalMeanPool``, ``GlobalMaxPool``, ``GlobalAttentionPool`` (learned global
token cross-attending the nodes), ``GlobalSet2SetPool``. The reference's
Set2Set silently degenerated to a mean (``:627-642``); here it is a real
set2set: an LSTM-driven iterative attention readout.

All pools map [..., N, F] + node_mask [..., N] -> [..., F] with no per-graph
Python loops (reference bug §8.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.graph import masked_global_max, masked_global_mean, masked_softmax

Dtype = jnp.dtype


class GlobalMeanPool(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        return masked_global_mean(x, node_mask)


class GlobalMaxPool(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        return masked_global_max(x, node_mask)


class GlobalAttentionPool(nn.Module):
    """Learned global query attends over nodes (reference :588-615)."""

    embed_dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray,
                 return_weights: bool = False):
        heads = self.num_heads
        head_dim = self.embed_dim // heads
        query = self.param("global_query", nn.initializers.normal(0.02),
                           (heads, head_dim), self.param_dtype)
        k = nn.DenseGeneral((heads, head_dim), name="k_proj", dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)        # [..., N, H, D]
        v = nn.DenseGeneral((heads, head_dim), name="v_proj", dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        logits = jnp.einsum("hd,...nhd->...nh", query.astype(k.dtype), k)
        logits = logits.astype(jnp.float32) * scale
        weights = masked_softmax(logits, node_mask[..., None], axis=-2)  # over N
        pooled = jnp.einsum("...nh,...nhd->...hd", weights.astype(v.dtype), v)
        pooled = pooled.reshape(*pooled.shape[:-2], self.embed_dim)
        out = nn.Dense(self.embed_dim, name="out_proj", dtype=self.dtype,
                       param_dtype=self.param_dtype)(pooled)
        if return_weights:
            return out, jnp.mean(weights, axis=-1)  # [..., N] head-avg node attention
        return out


class GlobalSet2SetPool(nn.Module):
    """Set2Set readout: LSTM query refinement over ``num_steps`` attention
    rounds (Vinyals et al.); output is projected from the final [q, r]."""

    embed_dim: int
    num_steps: int = 3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        d = self.embed_dim
        batch_shape = x.shape[:-2]
        lstm = nn.OptimizedLSTMCell(features=d, name="lstm",
                                    param_dtype=self.param_dtype)
        carry = lstm.initialize_carry(jax.random.PRNGKey(0), (*batch_shape, 2 * d))
        q_star = jnp.zeros((*batch_shape, 2 * d), x.dtype)
        x32 = x.astype(jnp.float32)
        for _ in range(self.num_steps):
            carry, q = lstm(carry, q_star.astype(jnp.float32))
            logits = jnp.einsum("...f,...nf->...n", q, x32)
            alpha = masked_softmax(logits, node_mask, axis=-1)
            r = jnp.einsum("...n,...nf->...f", alpha, x32)
            q_star = jnp.concatenate([q, r], axis=-1).astype(x.dtype)
        return nn.Dense(d, name="out_proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(q_star)


def make_pool(kind: str, embed_dim: int, num_heads: int = 8,
              dtype=jnp.bfloat16, param_dtype=jnp.float32) -> nn.Module:
    if kind == "mean":
        return GlobalMeanPool(name="pool")
    if kind == "max":
        return GlobalMaxPool(name="pool")
    if kind == "attention":
        return GlobalAttentionPool(embed_dim, num_heads, name="pool",
                                   dtype=dtype, param_dtype=param_dtype)
    if kind == "set2set":
        return GlobalSet2SetPool(embed_dim, name="pool",
                                 dtype=dtype, param_dtype=param_dtype)
    raise ValueError(f"unknown pooling {kind!r}")
