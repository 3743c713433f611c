"""Int8 (w8a8) inference engine for the ViT patch featurizer.

A pure-function quantized forward over the *existing*
:class:`~dgdm_histopath_tpu.models.vit.VisionTransformer` parameter tree —
converted DINOv2 checkpoints (scripts/convert_timm_vit.py) and trained
params plug in unchanged. Weights are pre-quantized ONCE at load
(:func:`quantize_vit_params`); activations are dynamically quantized per
token inside the fused program. The six big matmuls per transformer block
(q/k/v/out projections + the two MLP layers, ~90% of ViT FLOPs) run on the
MXU's int8 path; LayerNorm/softmax/GELU and the attention score/value
contractions stay in float. MEASURED on hardware the path is 0.775× —
XLA's int8 dot_general does not reach the native 2× rate on this
toolchain, so this ships as an accuracy-safe memory tier (feature cosine
0.9998), not a speed tier (ADR-0004 add.13; paired A/B
``bench_featurize --ab-int8`` re-runs unchanged on future toolchains).

The reference quantizes int8 for *storage* and computes in float
(reference ``deployment/edge.py``); this is the compute-path counterpart,
aimed at the slide-featurization serving bound (SURVEY §3.3: patch
featurization dominates reference inference).

Accuracy: end-to-end feature cosine vs the f32 path >0.999 on random-init
and >0.999 on structured inputs (tests/test_quant.py); the downstream AUC
gate runs in scripts/eval_camelyon16.py ``--featurizer-quant int8``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.quant import int8_dense, quantize_weight

Params = Dict[str, Any]


def _q(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Quantize a kernel of any shape as a 2-D [K_in, N_out] matrix."""
    mat = w.reshape(-1, w.shape[-1]) if w.ndim != 2 else w
    w_q, scale = quantize_weight(mat, axis=-1)
    return {"q": w_q, "s": scale}


def quantize_vit_params(params: Params) -> Params:
    """Pre-quantize a VisionTransformer param tree's block matmul kernels.

    Returns a new tree holding int8 kernels + f32 scales for every
    q/k/v/out/mlp kernel; everything else (patch embed conv, LayerNorms,
    biases, cls/pos embeddings, LayerScale gammas) is passed through in f32.
    The ``out`` projection kernel [H, Dh, D] is flattened to [H*Dh, D]; the
    q/k/v kernels [D, H, Dh] to [D, H*Dh] (shape metadata kept alongside).
    """
    p = params["params"] if "params" in params else params
    out: Dict[str, Any] = {}
    for name, sub in p.items():
        if not name.startswith("block"):
            out[name] = sub
            continue
        blk: Dict[str, Any] = {}
        for lname, lsub in sub.items():
            if lname == "attn":
                attn: Dict[str, Any] = {}
                for proj in ("query", "key", "value"):
                    k = lsub[proj]["kernel"]            # [D, H, Dh]
                    # head count/dim are recovered statically from the
                    # [H, Dh] bias shape at forward time (ints in the tree
                    # would trace as leaves under jit)
                    attn[proj] = {**_q(k.reshape(k.shape[0], -1)),
                                  "bias": lsub[proj]["bias"]}
                ko = lsub["out"]["kernel"]              # [H, Dh, D]
                attn["out"] = {**_q(ko.reshape(-1, ko.shape[-1])),
                               "bias": lsub["out"]["bias"]}
                blk["attn"] = attn
            elif lname in ("mlp1", "mlp2"):
                blk[lname] = {**_q(lsub["kernel"]), "bias": lsub["bias"]}
            else:
                blk[lname] = lsub                       # norms, LayerScale
        out[name] = blk
    return {"params": out}


def _layer_norm(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    return y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _attn_int8(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Multi-head attention with int8 q/k/v/out projections.

    Matches flax ``MultiHeadDotProductAttention`` semantics (q scaled by
    1/sqrt(head_dim); softmax over keys) with f32 softmax.
    """
    b, t, _ = x.shape
    h, dh = p["query"]["bias"].shape                   # [H, Dh] — static

    def proj(name: str) -> jnp.ndarray:
        pp = p[name]
        y = int8_dense(x, pp["q"], pp["s"], pp["bias"].reshape(-1))
        return y.reshape(b, t, h, dh)

    q, k, v = proj("query"), proj("key"), proj("value")
    q = q / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(jnp.bfloat16),
                   v.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    o = o.reshape(b, t, h * dh)
    po = p["out"]
    return int8_dense(o, po["q"], po["s"], po["bias"])


def vit_int8_forward(qparams: Params, images: jnp.ndarray) -> jnp.ndarray:
    """Quantized VisionTransformer forward: ``[B,H,W,3]`` floats → CLS ``[B,D]``.

    ``qparams`` from :func:`quantize_vit_params`. The patch-embed conv runs
    in bf16 (≤3% of FLOPs at patch 14/16); all block matmuls run int8.
    """
    p = qparams["params"]
    pe = p["patch_embed"]
    kernel = pe["kernel"]                              # [P, P, 3, D]
    ps, d = kernel.shape[0], kernel.shape[-1]
    b = images.shape[0]
    x = jax.lax.conv_general_dilated(
        images.astype(jnp.bfloat16),
        kernel.astype(jnp.bfloat16),
        window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = x + pe["bias"].astype(jnp.float32)
    gh, gw = x.shape[1], x.shape[2]
    x = x.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(p["cls_token"].astype(jnp.float32), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(jnp.float32)

    n_blocks = sum(1 for name in p if name.startswith("block"))
    for i in range(n_blocks):
        blk = p[f"block{i}"]
        h = _layer_norm(x, blk["norm1"])
        h = _attn_int8(h, blk["attn"])
        if "ls1_gamma" in blk:
            h = h * blk["ls1_gamma"].astype(jnp.float32)
        x = x + h
        h = _layer_norm(x, blk["norm2"])
        m1 = blk["mlp1"]
        h = int8_dense(h, m1["q"], m1["s"], m1["bias"])
        h = jax.nn.gelu(h, approximate=False)
        m2 = blk["mlp2"]
        h = int8_dense(h, m2["q"], m2["s"], m2["bias"])
        if "ls2_gamma" in blk:
            h = h * blk["ls2_gamma"].astype(jnp.float32)
        x = x + h

    x = _layer_norm(x, p["norm"])
    return x[:, 0].astype(jnp.float32)
