"""Int8 (w8a8) quantized inference path: ops.quant + models.vit_int8.

Pins (a) exactness of the int8 matmul primitive on integer-representable
inputs, (b) quantization error bounds, (c) end-to-end feature parity of the
quantized ViT forward against the float module on the SAME param tree, and
(d) the PatchFeatureExtractor(quant="int8") serving path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor, VisionTransformer
from dgdm_histopath_tpu.models.vit_int8 import (
    quantize_vit_params,
    vit_int8_forward,
)
from dgdm_histopath_tpu.ops.quant import (
    int8_dense,
    int8_matmul,
    quantize_activations,
    quantize_weight,
)


class TestQuantPrimitives:
    def test_int8_matmul_exact(self):
        rs = np.random.RandomState(0)
        x = rs.randint(-127, 128, (16, 64)).astype(np.int8)
        w = rs.randint(-127, 128, (64, 32)).astype(np.int8)
        out = int8_matmul(jnp.asarray(x), jnp.asarray(w))
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(out), x.astype(np.int32) @ w.astype(np.int32))

    def test_weight_quant_roundtrip_error(self):
        rs = np.random.RandomState(1)
        w = rs.randn(128, 96).astype(np.float32)
        w_q, scale = quantize_weight(jnp.asarray(w))
        assert w_q.dtype == jnp.int8
        deq = np.asarray(w_q, np.float32) * np.asarray(scale)
        # symmetric per-channel quant: error <= scale/2 per element
        bound = np.asarray(scale)[0] / 2 + 1e-7
        assert np.all(np.abs(deq - w) <= bound)

    def test_weight_quant_zero_column(self):
        w = jnp.zeros((8, 4), jnp.float32)
        w_q, scale = quantize_weight(w)
        assert np.all(np.asarray(w_q) == 0)
        assert np.all(np.isfinite(np.asarray(scale)))

    def test_activation_quant_per_row(self):
        rs = np.random.RandomState(2)
        # one outlier row must not degrade the other rows' scales
        x = rs.randn(4, 64).astype(np.float32)
        x[0] *= 1000.0
        x_q, s_x = quantize_activations(jnp.asarray(x))
        deq = np.asarray(x_q, np.float32) * np.asarray(s_x)
        rel = np.abs(deq - x).max(axis=1) / np.abs(x).max(axis=1)
        assert np.all(rel <= 0.5 / 127 + 1e-6)

    def test_int8_dense_vs_float(self):
        rs = np.random.RandomState(3)
        x = rs.randn(32, 128).astype(np.float32)
        w = rs.randn(128, 64).astype(np.float32) * 0.05
        b = rs.randn(64).astype(np.float32) * 0.1
        w_q, s = quantize_weight(jnp.asarray(w))
        out = np.asarray(int8_dense(jnp.asarray(x), w_q, s, jnp.asarray(b)))
        ref = x @ w + b
        # int8 x int8 dot over K=128: relative error ~1% of output scale
        denom = np.abs(ref).max()
        assert np.abs(out - ref).max() / denom < 0.02


def _small_vit():
    return VisionTransformer(embed_dim=64, depth=2, num_heads=4,
                             patch_size=8, layer_scale=True,
                             dtype=jnp.float32)


class TestVitInt8Parity:
    def test_feature_cosine_vs_float(self):
        module = _small_vit()
        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
        params = module.init(rng, images)
        ref = np.asarray(module.apply(params, images))
        qp = quantize_vit_params(params)
        out = np.asarray(jax.jit(vit_int8_forward)(qp, images))
        assert out.shape == ref.shape
        cos = np.sum(out * ref, -1) / (
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
        assert np.all(cos > 0.999), cos
        rel = np.linalg.norm(out - ref, axis=-1) / np.linalg.norm(ref, axis=-1)
        assert np.all(rel < 0.05), rel

    def test_quantized_tree_structure(self):
        module = _small_vit()
        params = module.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))
        qp = quantize_vit_params(params)["params"]
        blk = qp["block0"]
        assert blk["attn"]["query"]["q"].dtype == jnp.int8
        assert blk["attn"]["out"]["q"].shape[0] == 64    # H*Dh flattened
        assert blk["mlp1"]["q"].dtype == jnp.int8
        assert "ls1_gamma" in blk                        # passthrough kept
        # non-block entries untouched
        assert qp["patch_embed"]["kernel"].dtype != jnp.int8


class TestQuantizedExtractor:
    def test_extract_matches_float_path(self):
        fx_f = PatchFeatureExtractor(arch="vit_small", batch_size=8,
                                     image_size=64, seed=7)
        fx_q = PatchFeatureExtractor(arch="vit_small", batch_size=8,
                                     image_size=64, seed=7, quant="int8")
        rs = np.random.RandomState(0)
        patches = rs.randint(0, 256, (10, 64, 64, 3)).astype(np.uint8)
        with pytest.warns(UserWarning):
            ref = fx_f.extract(patches)
        with pytest.warns(UserWarning):
            out = fx_q.extract(patches)
        assert out.shape == ref.shape == (10, 384)
        cos = np.sum(out * ref, -1) / (
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
        # float path runs bf16, quant path runs int8: both approximate the
        # same f32 math — cross-path agreement bounds the quant error
        assert np.all(cos > 0.995), cos

    def test_simple_cnn_rejects_quant(self):
        with pytest.raises(ValueError):
            PatchFeatureExtractor(arch="simple_cnn", quant="int8")

    def test_unknown_mode_rejects(self):
        with pytest.raises(ValueError):
            PatchFeatureExtractor(arch="vit_small", quant="int4")
