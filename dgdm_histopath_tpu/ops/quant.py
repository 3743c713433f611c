"""Int8 (w8a8) quantized matmul primitives for TPU inference.

TPU v5e's MXU runs int8×int8→int32 at 2× its bf16 FLOP rate (394 vs 197
TOPS) in principle; MEASURED through the current XLA toolchain the int8
path is speed-neutral-to-negative (0.995× DGDM inference, 0.775× ViT
featurize — paired hardware A/Bs, ADR-0004 add.13): ``dot_general`` with
int8 operands does not reach the native int8 rate here and the dynamic
activation-quant VPU work nets negative. The path is accuracy-safe
(feature/logit cosine ≥0.9998; pooled hard-gate AUC deltas +0.0001 ±
0.0014 binary at 10 seeds / +0.0000 ± 0.0016 TCGA 4-subtype at 20 —
``docs/results/*/report_pooled.json``) and shipped as
an opt-in memory/storage tier; the A/Bs re-run unchanged if a future
toolchain maps the fast path. The reference's
edge-deployment path quantizes weights for *storage* only and dequantizes
back to float before compute (reference ``deployment/edge.py`` int8 export);
here the matmul itself runs on the int8 MXU path:

  * weights: symmetric per-output-channel int8 (`quantize_weight`), computed
    once at model load;
  * activations: symmetric per-row (per-token) dynamic int8, computed inside
    the fused program right before each matmul (`int8_dense`) — a VPU
    max-reduce + scale + round, negligible next to the matmul it feeds;
  * accumulation in int32 (`preferred_element_type`), dequantized by the
    rank-1 outer product of the two scale vectors, bias added in f32.

Numerics: worst-case per-element relative error of a symmetric int8 quant is
1/254; across a K-length dot the errors are independent and the observed
end-to-end feature error for a 12-block ViT is <1% (cosine >0.999, pinned in
tests/test_quant.py). No zero-points (histology activations are GELU-centred;
symmetric keeps the MXU path pure int8 and the dequant a single multiply).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_weight(w: jnp.ndarray, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel int8 quantization of a weight matrix.

    ``axis`` is the OUTPUT-channel axis (kept un-reduced so each output
    column gets its own scale). Returns ``(w_q int8, scale f32)`` with
    ``w ≈ w_q * scale`` (scale broadcast over the reduced axes).
    """
    w = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    w_q = jnp.clip(jnp.round(w / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def quantize_activations(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row int8 quantization over the last axis.

    Returns ``(x_q int8 [..., K], s_x f32 [..., 1])`` with ``x ≈ x_q * s_x``.
    Per-row (per-token) scales cost one extra VPU reduce vs per-tensor but
    remove the outlier-token accuracy cliff LLM-style w8a8 is known for.
    """
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s_x = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    x_q = jnp.clip(jnp.round(x / s_x), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return x_q, s_x.astype(jnp.float32)


def int8_matmul(x_q: jnp.ndarray, w_q: jnp.ndarray) -> jnp.ndarray:
    """``[..., K] int8 @ [K, N] int8 -> [..., N] int32`` on the MXU int8 path."""
    return jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def int8_dense(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantized dense layer: dynamic-int8 activations × int8 weights.

    ``x [..., K]`` float; ``w_q [K, N] int8``; ``w_scale`` broadcastable to
    ``[1, N]`` (from :func:`quantize_weight` with ``axis=-1``). Returns f32
    ``[..., N]`` ≈ ``x @ (w_q*w_scale) + bias``.
    """
    x_q, s_x = quantize_activations(x)
    acc = int8_matmul(x_q, w_q)                       # [..., N] int32
    out = acc.astype(jnp.float32) * (s_x * w_scale.reshape(1, -1).astype(jnp.float32))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
