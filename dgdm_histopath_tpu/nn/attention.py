"""Attention building blocks (flax.linen), mask-aware and batch-first.

Parity surface: reference ``dgdm_histopath/core/attention.py`` —
``MultiHeadAttention`` (:16-181), ``SpatialAttention`` with 2-D sinusoidal
positional encoding and pairwise-distance bias (:184-327),
``CrossModalAttention`` (:330-415), ``ScaledDotProductAttention`` (:418-461).

TPU-native differences: everything is batched dense attention with additive
bias + key masks (no per-graph Python loops — SURVEY §8.7); matmuls run in
``dtype`` (bf16 by default) with f32 softmax accumulation.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    traffic_dtype: Optional[Dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked SDPA. q [..., Lq, H, D], k/v [..., Lk, H, D].

    Returns (out [..., Lq, H, D], weights [..., H, Lq, Lk]).
    Softmax MATH always runs in float32 (max-subtraction, exp, sum inside
    one XLA fusion). ``traffic_dtype`` controls the STORAGE dtype of the two
    [.., H, Lq, Lk] HBM materializations (QK^T logits and softmax weights):

      * ``None`` (default) — f32 buffers, the strictest numerics;
      * ``jnp.bfloat16`` — halves the dominant HBM traffic of dense
        attention (the buffers are ~HxNxN; at DGDM geometry the pass is
        bandwidth-bound, not FLOP-bound). The only precision change is one
        bf16 rounding of the logits and of the weights — softmax internals
        stay f32 — the same envelope as the reference's Lightning
        "16-mixed" autocast attention.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    raw = jnp.einsum("...qhd,...khd->...hqk", q, k)
    if traffic_dtype is not None:
        raw = raw.astype(traffic_dtype)   # materialized logits buffer dtype
    # everything below fuses: the upcast rides the consumer fusion's read
    logits = raw.astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if key_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(key_mask[..., None, None, :], logits, neg)
    weights = jax.nn.softmax(logits, axis=-1)
    if key_mask is not None:
        # fully-masked query rows: zero out instead of uniform garbage
        any_key = jnp.any(key_mask, axis=-1)[..., None, None, None]
        weights = jnp.where(any_key, weights, 0.0)
    if dropout_rate > 0.0 and not deterministic and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    if traffic_dtype is not None:
        # the convert is the fusion root -> the weights buffer itself is
        # stored compressed, and it is also the (smaller) residual the
        # backward pass saves
        weights = weights.astype(traffic_dtype)
    out = jnp.einsum("...hqk,...khd->...qhd", weights.astype(v.dtype), v)
    return out, weights


class MultiHeadAttention(nn.Module):
    """Dense multi-head attention with key masking and optional bias.

    Mirrors the reference's from-scratch MHA (``core/attention.py:16-181``):
    separate QKV projections, batch-first layout, returns attention weights.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                    # [B, Lq, D]
        key: Optional[jnp.ndarray] = None,     # [B, Lk, D]
        value: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,  # [B, Lk] bool
        bias: Optional[jnp.ndarray] = None,      # [B, H, Lq, Lk] or [B, 1, Lq, Lk]
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        key = query if key is None else key
        value = key if value is None else value
        head_dim = self.embed_dim // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            features=(self.num_heads, head_dim), name=name,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        out, weights = scaled_dot_product_attention(
            q, k, v, bias=bias, key_mask=key_mask,
            dropout_rng=dropout_rng, dropout_rate=self.dropout,
            deterministic=deterministic,
        )
        out = nn.DenseGeneral(
            features=self.embed_dim, axis=(-2, -1), name="out_proj",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(out)
        if return_weights:
            return out, weights
        return out


def sinusoidal_position_encoding_2d(pos: jnp.ndarray, dim: int,
                                    temperature: float = 10000.0) -> jnp.ndarray:
    """2-D sinusoidal encoding from normalized (x, y) coords.

    pos [..., N, 2] in [0, 1] -> [..., N, dim]. Half the channels encode x,
    half encode y (reference ``core/attention.py:225-259``).
    """
    half = dim // 2
    quarter = half // 2
    freqs = jnp.exp(-math.log(temperature) * jnp.arange(quarter, dtype=jnp.float32) / max(quarter, 1))
    def enc(coord):  # [..., N] -> [..., N, 2*quarter]
        args = coord[..., None] * freqs * (2.0 * math.pi)
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    out = jnp.concatenate([enc(pos[..., 0]), enc(pos[..., 1])], axis=-1)
    pad = dim - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
    return out


class SpatialAttention(nn.Module):
    """Self-attention over nodes with positional encoding and distance bias.

    Mirrors reference ``core/attention.py:184-327``: adds a 2-D sinusoidal
    positional encoding to node features and biases attention logits by
    ``-pairwise_distance / tau``. Batched over graphs — the reference's
    per-graph Python loop (``models/dgdm_model.py:340-368``) becomes a single
    masked [B, N, N] attention.

    When ``use_flash`` and the bucket tiles cleanly (N % 128 == 0,
    head_dim % 128 == 0), the score/weight matrices are never materialized:
    the fused Pallas kernel (``ops.pallas.flash_spatial``) computes the
    distance bias on the fly with online softmax. ``return_weights`` always
    takes the dense path (heatmaps need the [N, N] weights).

    Hardware measurements (TPU v5e, bf16): with large head dims (128) the
    kernel beats dense above the 1024-node bucket (1.6 vs 2.0 ms/iter). At
    DGDM's actual geometry (hidden 128 / 8 heads → head_dim 16) the lane
    padding to the 128 tile inflates DMA 8× and the fine grid starves the
    MXU — dense wins by >20× (3.2 vs 71 ms at N=2048) — so the kernel is
    OFF by default and XLA's fused dense attention is the production path.
    ``use_flash=True`` (or lowering ``flash_auto_min_nodes``) opts in for
    wide-head workloads.

    ``window_size=W`` (opt-in) replaces the dense N×N pass with block-local
    attention along the node ORDER: each W-block of queries attends to its
    own and the two adjacent key blocks (3W keys), cutting attention
    FLOPs/traffic to 3W/N of dense. Spatially meaningful only when nodes are
    Morton-sorted (``TissueGraphBuilder(spatial_sort=True)`` /
    ``parallel.halo.spatial_sort``), where curve-adjacent blocks are spatial
    neighborhoods and the −dist/τ bias suppresses the wrapped far-end
    blocks. This is an approximation of the reference's all-pairs semantics —
    default off; an explicit scaling lever for 2048+-node buckets. Falls
    back to dense when N % W != 0, N/W < 3, or weights are requested.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    distance_tau: float = 0.1
    use_flash: bool = False
    flash_auto_min_nodes: int = 1 << 30   # auto-flash disabled by default
    window_size: Optional[int] = None     # block-local attention (see above)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # storage dtype of the [B,H,N,N] logits/weights HBM buffers (softmax
    # math stays f32); None = f32 buffers. The dense pass is HBM-bound at
    # DGDM geometry, so bf16 halves its cost — whole-program A/B in
    # ADR-0004. ``return_weights`` callers (heatmaps) get this dtype.
    traffic_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # [B, N, D]
        pos: jnp.ndarray,        # [B, N, 2] normalized coords
        node_mask: jnp.ndarray,  # [B, N] bool
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        pos_enc = sinusoidal_position_encoding_2d(pos, self.embed_dim).astype(x.dtype)
        h = x + nn.Dense(self.embed_dim, name="pos_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype)(pos_enc)

        n = x.shape[-2]
        head_dim = self.embed_dim // self.num_heads
        # the kernel zero-pads head dims up to the 128-lane tile, so only the
        # node count constrains eligibility
        tiles = n % 128 == 0
        want_flash = self.use_flash or (deterministic
                                        and n >= self.flash_auto_min_nodes)
        # the Pallas kernel has no attention-weight dropout: taking it while
        # training with dropout>0 would silently change regularization vs the
        # dense path (ADVICE r1), so flash requires deterministic or dropout=0
        no_dropout = deterministic or self.dropout == 0.0
        flash_ok = want_flash and not return_weights and tiles and no_dropout

        # shared projections for both paths (identical param structure)
        dg = lambda name: nn.DenseGeneral(
            features=(self.num_heads, head_dim), name=name,
            dtype=self.dtype, param_dtype=self.param_dtype)
        q, k_, v_ = dg("q_proj")(h), dg("k_proj")(h), dg("v_proj")(h)

        window_ok = (self.window_size is not None and not return_weights
                     and n % (self.window_size or 1) == 0
                     and n // self.window_size >= 3)

        weights = None
        if flash_ok:
            from ..ops.pallas.flash_spatial import flash_spatial_attention
            ctx = flash_spatial_attention(
                q, k_, v_, pos.astype(jnp.float32), node_mask,
                tau=self.distance_tau)
        elif window_ok:
            w = self.window_size
            nb = n // w
            lead = x.shape[:-2]
            posf = pos.astype(jnp.float32)
            qb = q.reshape(*lead, nb, w, self.num_heads, head_dim)
            kb = k_.reshape(*lead, nb, w, self.num_heads, head_dim)
            vb = v_.reshape(*lead, nb, w, self.num_heads, head_dim)
            blk_ax = len(lead)           # the nb axis
            item_ax = blk_ax + 1         # the within-block axis

            def widen(t):
                # own + previous + next block along the node order
                return jnp.concatenate(
                    [jnp.roll(t, 1, blk_ax), t, jnp.roll(t, -1, blk_ax)],
                    axis=item_ax)

            kw_, vw_ = widen(kb), widen(vb)          # [.., nb, 3w, H, hd]
            kpos = widen(posf.reshape(*lead, nb, w, 2))
            kmask = widen(node_mask.reshape(*lead, nb, w))
            qpos = posf.reshape(*lead, nb, w, 2)
            dx = qpos[..., :, None, 0] - kpos[..., None, :, 0]
            dy = qpos[..., :, None, 1] - kpos[..., None, :, 1]
            dist = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12))
            bias = (-dist / self.distance_tau)[..., None, :, :]
            dropout_rng = None
            if self.dropout > 0.0 and not deterministic:
                dropout_rng = self.make_rng("dropout")
            ctx, _ = scaled_dot_product_attention(
                qb, kw_, vw_, bias=bias, key_mask=kmask,
                dropout_rng=dropout_rng, dropout_rate=self.dropout,
                deterministic=deterministic,
                traffic_dtype=self.traffic_dtype)
            ctx = ctx.reshape(*lead, n, self.num_heads, head_dim)
        else:
            # dense path: explicit [B, 1, N, N] distance bias. Per-component
            # broadcast differences, NOT |a|²+|b|²−2ab: the matmul form
            # cancels catastrophically for nearby points (~3e-4 dist error in
            # f32, amplified by exp(-dist/τ)) and broke flash/dense parity
            # (ADR-0004). Two [B,N,N] elementwise intermediates fuse into the
            # bias consumer — no [B,N,N,2] array is materialized.
            posf = pos.astype(jnp.float32)
            dx = posf[..., :, None, 0] - posf[..., None, :, 0]
            dy = posf[..., :, None, 1] - posf[..., None, :, 1]
            dist = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12))
            bias = (-dist / self.distance_tau)[..., None, :, :]
            dropout_rng = None
            if self.dropout > 0.0 and not deterministic:
                dropout_rng = self.make_rng("dropout")
            ctx, weights = scaled_dot_product_attention(
                q, k_, v_, bias=bias, key_mask=node_mask,
                dropout_rng=dropout_rng, dropout_rate=self.dropout,
                deterministic=deterministic,
                traffic_dtype=self.traffic_dtype)
        out = nn.DenseGeneral(
            features=self.embed_dim, axis=(-2, -1), name="out_proj",
            dtype=self.dtype, param_dtype=self.param_dtype)(ctx.astype(self.dtype))
        out = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm")(x + out)
        out = out * node_mask[..., None].astype(out.dtype)
        if return_weights:
            return out, weights
        return out


class CrossModalAttention(nn.Module):
    """cross-attention + self-attention + FFN block (reference :330-415)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # [B, Lx, D] target modality
        context: jnp.ndarray,      # [B, Lc, D] source modality
        context_mask: Optional[jnp.ndarray] = None,
        x_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        mha = lambda name: MultiHeadAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        h = ln("norm_cross")(x + mha("cross_attn")(x, context, context, key_mask=context_mask,
                                                   deterministic=deterministic))
        h = ln("norm_self")(h + mha("self_attn")(h, key_mask=x_mask, deterministic=deterministic))
        hidden = int(self.embed_dim * self.mlp_ratio)
        ff = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="ff1")(h)
        ff = nn.gelu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="ff2")(ff)
        out = ln("norm_ff")(h + ff)
        if x_mask is not None:
            out = out * x_mask[..., None].astype(out.dtype)
        return out
