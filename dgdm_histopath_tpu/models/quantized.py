"""Int8 (w8a8) inference for the DGDM graph model via flax method interception.

The reference's edge-deployment path quantizes weights for *storage* only and
dequantizes back to float before compute (reference
``dgdm_histopath/deployment/edge_deployment.py:202-206`` — torch dynamic
quantization of Linear layers on CPU). Here every ``nn.Dense`` in the model
actually COMPUTES on the TPU's int8 MXU path (2× the bf16 FLOP rate on v5e):
:func:`int8_apply` wraps ``model.apply`` with a method interceptor that
reroutes Dense calls through :func:`~dgdm_histopath_tpu.ops.quant.int8_dense`
(symmetric per-channel int8 weights, dynamic per-row int8 activations, int32
accumulation).

Design notes:

* **No separate quantized checkpoint.** Weights are quantized inside the
  traced program from the ordinary float param tree — an O(K·N) elementwise
  absmax+round per Dense, negligible next to the O(rows·K·N) matmul it
  feeds. Any trained/converted checkpoint plugs in unchanged, and the same
  params serve float and int8 callers concurrently.
* **Data×data matmuls stay float.** The graph aggregation (adjacency @
  features), attention score/value contractions and softmax chains are not
  Dense layers and keep their f32/bf16 numerics; only weight matmuls are
  quantized. This bounds the accuracy cost (logit cosine pinned in
  tests/test_quant.py) while capturing the Dense share of inference compute.
* **Tiny projections are skipped** (``min_features``): per-head score nets
  and small heads gain nothing from int8 and lose the most precision.

Used by ``DGDMPredictor(quant="int8")`` and the edge deployment engine; the
ViT featurizer has its own precomputed-scale int8 path
(``models/vit_int8.py``) because its weights are static across calls.
"""

from __future__ import annotations

import functools
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.quant import int8_dense, quantize_weight

__all__ = ["int8_apply", "make_int8_interceptor"]


def _int8_dense_call(mod: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    params = mod.variables["params"]
    kernel = params["kernel"]
    w_q, w_scale = quantize_weight(kernel, axis=-1)
    bias = params.get("bias") if mod.use_bias else None
    out = int8_dense(x, w_q, w_scale, bias)
    out_dtype = mod.dtype or jnp.result_type(x.dtype, jnp.float32)
    return out.astype(out_dtype)


def make_int8_interceptor(min_features: int = 64):
    """Interceptor rerouting eligible ``nn.Dense`` calls to the int8 path.

    Eligible = both the contraction dim K and the output dim N are at least
    ``min_features`` (int8 quantization error is amortized over K; tiny
    projections keep full precision at negligible compute cost).
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Dense) and context.method_name == "__call__"
                and args and hasattr(args[0], "shape")
                and "params" in mod.variables
                and "kernel" in mod.variables["params"]):
            k = int(args[0].shape[-1])
            n = int(mod.variables["params"]["kernel"].shape[-1])
            if k >= min_features and n >= min_features:
                return _int8_dense_call(mod, args[0])
        return next_fun(*args, **kwargs)

    return interceptor


def int8_apply(model: nn.Module, variables: Any, *args,
               min_features: int = 64, **kwargs):
    """``model.apply`` with every eligible Dense on the int8 MXU path.

    Drop-in for inference: ``int8_apply(model, params, graph,
    mode="inference")``. Safe under ``jax.jit`` (interception happens at
    trace time). Do NOT use for training — the round-to-nearest
    quantization has a zero/undefined gradient.
    """
    interceptor = make_int8_interceptor(min_features=min_features)
    with nn.intercept_methods(interceptor):
        return model.apply(variables, *args, **kwargs)


def int8_apply_fn(model: nn.Module, min_features: int = 64):
    """Partially-applied :func:`int8_apply` suitable for ``jax.jit``."""
    return functools.partial(int8_apply, model, min_features=min_features)
