"""Multimodal fusion: histopathology + clinical/genomic modalities.

Parity surface: reference ``dgdm_histopath/research/multimodal_fusion.py`` —
``AdaptiveModalityEncoder`` (:63), ``CrossModalAttentionFusion`` (:179),
``UncertaintyAwareFusion`` (:301), ``HierarchicalModalityFusion`` (:431),
and the fusion benchmark (:557).

All modules are flax.linen over fixed-size modality embeddings; missing
modalities are handled with masks (static shapes, XLA-friendly).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import CrossModalAttention, MultiHeadAttention

Dtype = jnp.dtype


class AdaptiveModalityEncoder(nn.Module):
    """Per-modality MLP encoders projecting into a shared space, with a
    learned null embedding substituted for missing modalities."""

    modality_dims: Dict[str, int]        # e.g. {"histology": 128, "genomic": 200}
    embed_dim: int = 128
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray],
                 present: Optional[Dict[str, jnp.ndarray]] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """inputs[name] [B, D_name]; present[name] [B] bool. -> [B, M, E]."""
        tokens = []
        for name in sorted(self.modality_dims):
            x = inputs[name].astype(self.dtype)
            h = nn.Dense(self.embed_dim * 2, name=f"{name}_in",
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
            h = nn.gelu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.embed_dim, name=f"{name}_out",
                         dtype=self.dtype, param_dtype=self.param_dtype)(h)
            h = nn.LayerNorm(name=f"{name}_norm", dtype=self.dtype,
                             param_dtype=self.param_dtype)(h)
            null = self.param(f"{name}_null", nn.initializers.normal(0.02),
                              (self.embed_dim,), self.param_dtype)
            if present is not None and name in present:
                m = present[name][..., None].astype(h.dtype)
                h = m * h + (1 - m) * null.astype(h.dtype)
            tokens.append(h)
        return jnp.stack(tokens, axis=1)          # [B, M, E]


class CrossModalAttentionFusion(nn.Module):
    """Histology tokens cross-attend auxiliary modality tokens
    (reference :179)."""

    embed_dim: int = 128
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, primary: jnp.ndarray, modality_tokens: jnp.ndarray,
                 modality_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """primary [B, E]; modality_tokens [B, M, E] -> fused [B, E]."""
        h = primary[:, None, :]                    # [B, 1, E]
        for i in range(self.num_layers):
            h = CrossModalAttention(
                self.embed_dim, self.num_heads, dropout=self.dropout,
                name=f"xmodal{i}", dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(h, modality_tokens, context_mask=modality_mask,
              deterministic=deterministic)
        fused = nn.Dense(self.embed_dim, name="fuse", dtype=self.dtype,
                         param_dtype=self.param_dtype)(
            jnp.concatenate([primary, h[:, 0]], axis=-1))
        return fused


class UncertaintyAwareFusion(nn.Module):
    """Precision-weighted modality averaging: each modality predicts a
    log-variance; fusion weights are the normalized precisions
    (reference :301)."""

    embed_dim: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, modality_tokens: jnp.ndarray,
                 modality_mask: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        """modality_tokens [B, M, E] -> {"fused" [B, E], "weights" [B, M]}."""
        log_var = nn.Dense(1, name="log_var", dtype=self.dtype,
                           param_dtype=self.param_dtype)(modality_tokens)[..., 0]
        precision = jnp.exp(-log_var.astype(jnp.float32))        # [B, M]
        if modality_mask is not None:
            precision = precision * modality_mask.astype(precision.dtype)
        weights = precision / jnp.maximum(
            jnp.sum(precision, axis=-1, keepdims=True), 1e-8)
        fused = jnp.einsum("bm,bme->be", weights.astype(modality_tokens.dtype),
                           modality_tokens)
        return {"fused": fused, "weights": weights, "log_var": log_var}


class HierarchicalModalityFusion(nn.Module):
    """Grouped two-stage fusion: within-group attention, then across groups
    (reference :431)."""

    groups: Dict[str, Sequence[int]]     # group name -> token indices
    embed_dim: int = 128
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, modality_tokens: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        group_embs = []
        for gname, idxs in sorted(self.groups.items()):
            toks = modality_tokens[:, jnp.asarray(list(idxs))]
            attn = MultiHeadAttention(self.embed_dim, self.num_heads,
                                      name=f"group_{gname}", dtype=self.dtype,
                                      param_dtype=self.param_dtype)
            pooled = jnp.mean(attn(toks, deterministic=deterministic), axis=1)
            group_embs.append(pooled)
        stacked = jnp.stack(group_embs, axis=1)    # [B, G, E]
        top = MultiHeadAttention(self.embed_dim, self.num_heads, name="across",
                                 dtype=self.dtype, param_dtype=self.param_dtype)
        fused = jnp.mean(top(stacked, deterministic=deterministic), axis=1)
        return nn.Dense(self.embed_dim, name="out", dtype=self.dtype,
                        param_dtype=self.param_dtype)(fused)


def benchmark_fusion_strategies(rng: jax.Array, batch: int = 8,
                                embed_dim: int = 64) -> Dict[str, Dict[str, float]]:
    """Compare fusion strategies on synthetic correlated modalities
    (reference's fusion benchmark :557). Returns per-strategy loss after a
    few gradient steps — a smoke-level comparison, not a paper result."""
    import optax

    r1, r2, r3 = jax.random.split(rng, 3)
    latent = jax.random.normal(r1, (batch * 16, embed_dim))
    inputs = {
        "histology": latent + 0.1 * jax.random.normal(r2, latent.shape),
        "genomic": latent @ jax.random.normal(r3, (embed_dim, embed_dim)) * 0.1,
    }
    y = (jnp.sum(latent, axis=-1) > 0).astype(jnp.int32)

    encoder = AdaptiveModalityEncoder(
        {"histology": embed_dim, "genomic": embed_dim}, embed_dim=embed_dim)

    results = {}
    for name, fuser in [
        ("cross_attention", CrossModalAttentionFusion(embed_dim, num_heads=4,
                                                      num_layers=1)),
        ("uncertainty", UncertaintyAwareFusion(embed_dim)),
    ]:
        def forward(params, inputs, y):
            toks = encoder.apply(params["enc"], inputs)
            if name == "cross_attention":
                fused = fuser.apply(params["fuse"], toks[:, 0], toks)
            else:
                fused = fuser.apply(params["fuse"], toks)["fused"]
            logits = fused @ params["head"]
            onehot = jax.nn.one_hot(y, 2)
            return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        toks0 = encoder.init(k1, inputs)
        if name == "cross_attention":
            dummy = encoder.apply(toks0, inputs)
            fp = fuser.init(k2, dummy[:, 0], dummy)
        else:
            dummy = encoder.apply(toks0, inputs)
            fp = fuser.init(k2, dummy)
        params = {"enc": toks0, "fuse": fp,
                  "head": jax.random.normal(k3, (embed_dim, 2)) * 0.1}
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        loss0 = float(forward(params, inputs, y))
        step = jax.jit(lambda p, o: _opt_step(forward, tx, p, o, inputs, y))
        for _ in range(20):
            params, opt_state = step(params, opt_state)
        results[name] = {"initial_loss": loss0,
                         "final_loss": float(forward(params, inputs, y))}
    return results


def _opt_step(forward, tx, params, opt_state, inputs, y):
    import optax
    grads = jax.grad(lambda p: forward(p, inputs, y))(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state
