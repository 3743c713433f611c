"""DGDMModel — the flagship Dynamic Graph Diffusion Model.

Parity surface: reference ``dgdm_histopath/models/dgdm_model.py:37-548`` —
constructor config (:45-190), config validation (:192-242), forward pipeline
(:271-403): FeatureEncoder → GraphEncoder → SpatialAttention → GraphUNet →
diffusion SSL (pretrain) → global pooling → classification/regression heads;
``pretrain_step`` with entity masking (:447-506); ``generate_embeddings``
(:527-548).

Deliberate bug-fixes vs the reference (SURVEY §8):
  1. the diffusion loss regresses the *actual* added noise (§8.1);
  2. the entity-mask token is a persistent learned parameter (§8.2);
  3. reconstruction uses a projection head back to input-feature dim (§8.3);
  4. spatial attention / pooling / diffusion are fully batched — no per-graph
     Python loops (§8.7).

Everything here is jit-compatible: static shapes from the PaddedGraph bucket
layout, PRNG via flax rng collections ("diffusion", "masking", "dropout").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import SpatialAttention
from ..nn.diffusion import DiffusionLayer
from ..nn.graph_layers import GraphUNet
from ..ops.graph import PaddedGraph
from ..utils.exceptions import ConfigurationError
from .decoders import ClassificationHead, RegressionHead, SurvivalHead
from .encoders import FeatureEncoder, GraphEncoder
from .pooling import make_pool

Dtype = jnp.dtype


def _as_dtype(name: str) -> Dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


class DGDMModel(nn.Module):
    """Dynamic Graph Diffusion Model for whole-slide tissue graphs."""

    node_features: int = 768
    hidden_dims: Sequence[int] = (512, 256, 128)
    num_diffusion_steps: int = 10
    attention_heads: int = 8
    dropout: float = 0.1
    graph_layers: int = 4
    use_spatial_attention: bool = True
    use_hierarchical: bool = True
    diffusion_schedule: str = "cosine"
    activation: str = "gelu"
    normalization: str = "layer"
    pooling: str = "attention"
    num_classes: Optional[int] = None
    regression_targets: int = 0
    survival_mode: Optional[str] = None   # None | "cox" | "discrete"
    survival_intervals: int = 10
    edge_features: int = 3
    use_remat: bool = False   # rematerialize graph layers (memory for FLOPs)
    gather_impl: str = "auto"  # auto | onehot | xla(take) | pallas
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # storage dtype of spatial attention's [B,H,N,N] logits/weights HBM
    # buffers; softmax math stays f32 (see nn.attention). Default None =
    # f32 buffers: the whole-program A/B (ADR-0004 add.5) measured bf16
    # SLIGHTLY SLOWER (65.8 vs 63.1 ms/step) — XLA keeps the softmax chain
    # fused so the buffers never pay full f32 traffic, and the converts
    # add work. Knob kept for direct-attached-HBM revalidation.
    attention_traffic_dtype: Optional[str] = None
    # block-local spatial attention along the (Morton-sorted) node order:
    # each W-block attends to 3W keys instead of all N — an opt-in scaling
    # lever for 2048+-node buckets (see nn.attention.SpatialAttention);
    # requires TissueGraphBuilder(spatial_sort=True) to be meaningful
    spatial_window: Optional[int] = None
    # Mixture-of-Experts residual FFN after the message-passing stack
    # (beyond parity — the reference has no MoE): 0 disables; E > 0 adds a
    # pre-norm top-k routed expert block whose params can shard over an
    # 'expert' mesh axis (parallel/ep.py). Adds "moe_aux_loss" to outputs;
    # the trainer weights it by TrainerConfig.moe_aux_weight.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity: float = 1.5
    moe_hidden: Optional[int] = None   # default 2× hidden
    # banded (Morton-window) message passing in the GraphEncoder: key
    # gather + conv aggregation run over the ±1-block band (3W keys)
    # instead of all N, dropping out-of-band edges from messages and
    # degree norm. EXACT on graphs built with
    # ``TissueGraphBuilder(spatial_sort=True, knn_window=W)``; an
    # approximation otherwise. The U-Net keeps dense aggregation (pooled
    # levels break Morton contiguity). Default off, like spatial_window.
    graph_window: Optional[int] = None

    def _validate(self) -> None:
        # mirrors reference _validate_configuration (:192-242)
        if self.node_features <= 0:
            raise ConfigurationError("node_features must be positive")
        if not self.hidden_dims or any(h <= 0 for h in self.hidden_dims):
            raise ConfigurationError("hidden_dims must be positive")
        if self.hidden_dims[-1] % self.attention_heads != 0:
            raise ConfigurationError("attention_heads must divide hidden_dims[-1]")
        if not 0.0 <= self.dropout < 1.0:
            raise ConfigurationError("dropout must be in [0, 1)")
        if self.diffusion_schedule not in ("linear", "cosine", "sigmoid"):
            raise ConfigurationError("invalid diffusion_schedule")
        if self.attention_traffic_dtype not in (None, "bfloat16", "float32",
                                                "float16"):
            raise ConfigurationError(
                "attention_traffic_dtype must be None|bfloat16|float16|float32")
        if self.spatial_window is not None and self.spatial_window <= 0:
            raise ConfigurationError("spatial_window must be positive")
        if self.graph_window is not None and self.graph_window <= 0:
            raise ConfigurationError("graph_window must be positive")
        if self.moe_experts < 0:
            raise ConfigurationError("moe_experts must be >= 0")
        if self.moe_experts and self.moe_top_k not in (1, 2):
            raise ConfigurationError("moe_top_k must be 1 or 2")

    def setup(self):
        self._validate()
        dtype = _as_dtype(self.compute_dtype)
        pdtype = _as_dtype(self.param_dtype)
        hidden = self.hidden_dims[-1]

        self.feature_encoder = FeatureEncoder(
            hidden_dims=tuple(self.hidden_dims), activation=self.activation,
            normalization=self.normalization, dropout=self.dropout,
            dtype=dtype, param_dtype=pdtype)
        self.graph_encoder = GraphEncoder(
            hidden_dim=hidden, num_layers=self.graph_layers,
            num_heads=self.attention_heads, edge_dim=self.edge_features,
            dropout=self.dropout, activation=self.activation,
            remat=self.use_remat, gather_impl=self.gather_impl,
            band_window=self.graph_window,
            dtype=dtype, param_dtype=pdtype)
        if self.moe_experts > 0:
            from ..nn.moe import MoEFFN
            self.moe_norm = nn.LayerNorm(dtype=dtype, param_dtype=pdtype,
                                         name="moe_norm")
            self.moe_ffn = MoEFFN(
                features=hidden,
                hidden_dim=self.moe_hidden or 2 * hidden,
                num_experts=self.moe_experts, top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity,
                activation=self.activation, dropout=self.dropout,
                dtype=dtype, param_dtype=pdtype)
        if self.use_spatial_attention:
            self.spatial_attention = SpatialAttention(
                embed_dim=hidden, num_heads=self.attention_heads,
                dropout=self.dropout, dtype=dtype, param_dtype=pdtype,
                window_size=self.spatial_window,
                traffic_dtype=(None if self.attention_traffic_dtype is None
                               else _as_dtype(self.attention_traffic_dtype)))
        if self.use_hierarchical:
            self.graph_unet = GraphUNet(
                features=hidden, depth=2, num_heads=self.attention_heads,
                dropout=self.dropout, gather_impl=self.gather_impl,
                band_window=self.graph_window,
                dtype=dtype, param_dtype=pdtype)
        self.diffusion = DiffusionLayer(
            features=hidden, num_steps=self.num_diffusion_steps,
            schedule=self.diffusion_schedule, dtype=dtype, param_dtype=pdtype)
        self.pool = make_pool(self.pooling, hidden, self.attention_heads,
                              dtype=dtype, param_dtype=pdtype)
        if self.num_classes is not None:
            self.classification_head = ClassificationHead(
                num_classes=self.num_classes, hidden_dims=(hidden,),
                dropout=self.dropout, dtype=dtype, param_dtype=pdtype)
        if self.regression_targets > 0:
            self.regression_head = RegressionHead(
                num_targets=self.regression_targets, hidden_dims=(hidden,),
                dropout=self.dropout, dtype=dtype, param_dtype=pdtype)
        if self.survival_mode is not None:
            if self.survival_mode not in ("cox", "discrete"):
                raise ConfigurationError("survival_mode must be cox|discrete")
            self.survival_head = SurvivalHead(
                mode=self.survival_mode, num_intervals=self.survival_intervals,
                hidden_dims=(hidden,), dropout=self.dropout,
                dtype=dtype, param_dtype=pdtype)
        # persistent learned mask token (bug-fix §8.2; reference created a
        # fresh unregistered parameter per call at dgdm_model.py:499)
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02),
            (self.node_features,), _as_dtype(self.param_dtype))
        # reconstruction projection back to input features (bug-fix §8.3)
        self.recon_head = nn.Dense(self.node_features, name="recon_head",
                                   dtype=dtype, param_dtype=pdtype)

    def __call__(
        self,
        graph: PaddedGraph,
        mode: str = "inference",   # inference | pretrain | finetune
        deterministic: bool = True,
        return_attention: bool = False,
    ) -> Dict[str, Any]:
        """Forward pass over a batched PaddedGraph (leading B axis expected)."""
        dtype = _as_dtype(self.compute_dtype)
        x = graph.x.astype(dtype)
        node_mask = graph.node_mask
        outputs: Dict[str, Any] = {}

        # 1. patch-feature encoding (MLP)
        h = self.feature_encoder(x, deterministic=deterministic)

        # 2. graph message passing
        enc = self.graph_encoder(
            h, graph.nbr_idx, graph.nbr_mask, node_mask,
            edge_attr=graph.edge_attr, deterministic=deterministic,
            return_attention=return_attention)
        h = enc["embeddings"]
        if return_attention:
            outputs["edge_attentions"] = enc["attentions"]

        # 2b. optional MoE residual FFN (beyond parity; mask-correct —
        # padded nodes claim no expert capacity and receive zeros)
        if self.moe_experts > 0:
            moe_out, moe_aux = self.moe_ffn(
                self.moe_norm(h), node_mask, deterministic=deterministic)
            h = h + moe_out
            outputs["moe_aux_loss"] = moe_aux

        # 3. spatial attention with distance bias — batched, masked
        if self.use_spatial_attention:
            res = self.spatial_attention(
                h, graph.pos.astype(jnp.float32), node_mask,
                deterministic=deterministic, return_weights=return_attention)
            if return_attention:
                h, spatial_w = res
                outputs["spatial_attention"] = spatial_w
            else:
                h = res

        # 4. hierarchical U-Net refinement
        if self.use_hierarchical:
            h = self.graph_unet(h, graph.nbr_idx, graph.nbr_mask, node_mask,
                                edge_attr=graph.edge_attr,
                                deterministic=deterministic)

        outputs["node_embeddings"] = h

        # 5. diffusion SSL objective (pretrain only)
        if mode == "pretrain":
            rng = self.make_rng("diffusion")
            predicted, true_noise, t = self.diffusion(h, rng)
            mask_f = node_mask[..., None].astype(jnp.float32)
            sq = (predicted.astype(jnp.float32) - true_noise.astype(jnp.float32)) ** 2
            outputs["diffusion_loss"] = (
                jnp.sum(sq * mask_f) / jnp.maximum(jnp.sum(mask_f) * sq.shape[-1], 1.0))
            outputs["diffusion_t"] = t
            # reconstruction of input features from final embeddings
            outputs["reconstruction"] = self.recon_head(h)

        # 6. global pooling → slide embedding
        if self.pooling == "attention" and return_attention:
            pooled, pool_w = self.pool(h, node_mask, return_weights=True)
            outputs["attention_weights"] = pool_w
        else:
            pooled = self.pool(h, node_mask)
        outputs["graph_embedding"] = pooled

        # 7. heads
        if self.num_classes is not None:
            outputs["classification_logits"] = self.classification_head(
                pooled, deterministic=deterministic)
        if self.regression_targets > 0:
            outputs["regression"] = self.regression_head(
                pooled, deterministic=deterministic)
        if self.survival_mode is not None:
            outputs["survival"] = self.survival_head(
                pooled, deterministic=deterministic)
        return outputs

    def apply_entity_masking(self, graph: PaddedGraph,
                             mask_ratio: float = 0.15) -> PaddedGraph:
        """Replace a random ``mask_ratio`` of real nodes with the learned
        mask token (reference ``_apply_entity_masking`` :482-506)."""
        rng = self.make_rng("masking")
        u = jax.random.uniform(rng, graph.node_mask.shape)
        masked = (u < mask_ratio) & graph.node_mask
        token = self.mask_token.astype(graph.x.dtype)
        x = jnp.where(masked[..., None], token, graph.x)
        return graph.replace(x=x)

    def pretrain_step(self, graph: PaddedGraph, mask_ratio: float = 0.15,
                      deterministic: bool = False) -> Dict[str, Any]:
        """Entity masking + pretrain forward. Adds the masked-node
        reconstruction loss to the outputs (reference :447-480)."""
        rng = self.make_rng("masking")
        u = jax.random.uniform(rng, graph.node_mask.shape)
        masked = (u < mask_ratio) & graph.node_mask
        token = self.mask_token.astype(graph.x.dtype)
        corrupted = graph.replace(x=jnp.where(masked[..., None], token, graph.x))

        outputs = self(corrupted, mode="pretrain", deterministic=deterministic)
        recon = outputs["reconstruction"].astype(jnp.float32)
        target = graph.x.astype(jnp.float32)
        m = masked[..., None].astype(jnp.float32)
        outputs["reconstruction_loss"] = (
            jnp.sum((recon - target) ** 2 * m)
            / jnp.maximum(jnp.sum(m) * target.shape[-1], 1.0))
        outputs["masked_nodes"] = masked
        return outputs

    def generate_embeddings(self, graph: PaddedGraph) -> jnp.ndarray:
        """Slide-level embeddings without heads (reference :527-548)."""
        return self(graph, mode="inference", deterministic=True)["graph_embedding"]
