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
    @pytest.mark.slow
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
    @pytest.mark.slow
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


class TestDGDMInt8Apply:
    """int8_apply: the full DGDM graph model with Dense layers on the int8
    MXU path (models/quantized.py). Data-data matmuls (adjacency, attention
    scores) stay float, so logits must track the float forward closely."""

    def _model_and_graph(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from conftest import make_synthetic_graph
        from dgdm_histopath_tpu.models import DGDMModel
        from dgdm_histopath_tpu.ops.graph import batch_graphs

        g = batch_graphs([make_synthetic_graph(
            seed=i, n_nodes=64, n_real=56, feat_dim=128, num_classes=3)
            for i in range(2)])
        model = DGDMModel(node_features=128, hidden_dims=(128, 64),
                          num_diffusion_steps=4, attention_heads=4,
                          graph_layers=2, num_classes=3,
                          compute_dtype="float32")
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(3)}, g, mode="pretrain")
        return model, params, g

    @pytest.mark.slow
    def test_logit_cosine_vs_float(self):
        from dgdm_histopath_tpu.models.quantized import int8_apply

        model, params, g = self._model_and_graph()
        ref = np.asarray(model.apply(params, g, mode="inference")
                         ["classification_logits"], np.float32)
        got = np.asarray(int8_apply(model, params, g, mode="inference")
                         ["classification_logits"], np.float32)
        # per-graph logit cosine: int8 Dense quantization must not distort
        # the decision geometry
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12)
        assert cos.min() > 0.98, (cos, ref, got)
        assert np.all(np.isfinite(got))

    def test_int8_actually_changes_program(self):
        """The interceptor must reroute at least the wide Dense layers:
        identical outputs would mean it silently never fired."""
        from dgdm_histopath_tpu.models.quantized import int8_apply

        model, params, g = self._model_and_graph()
        ref = np.asarray(model.apply(params, g, mode="inference")
                         ["classification_logits"], np.float32)
        got = np.asarray(int8_apply(model, params, g, mode="inference")
                         ["classification_logits"], np.float32)
        assert np.abs(ref - got).max() > 0

    def test_jit_and_mask_invariance(self):
        from dgdm_histopath_tpu.models.quantized import int8_apply

        model, params, g = self._model_and_graph()
        fwd = jax.jit(lambda p, gg: int8_apply(
            model, p, gg, mode="inference")["classification_logits"])
        a = np.asarray(fwd(params, g))
        # padded-node perturbation must not move real outputs (dynamic
        # per-row activation scales are per-node, so padding can't bleed
        # through the quantizer either)
        x2 = np.asarray(g.x).copy()
        x2[~np.asarray(g.node_mask)] = 9.9
        b = np.asarray(fwd(params, g.replace(x=jnp.asarray(x2))))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_min_features_gate(self):
        """min_features larger than every layer width must reproduce the
        float forward bit-exactly (no Dense rerouted)."""
        from dgdm_histopath_tpu.models.quantized import int8_apply

        model, params, g = self._model_and_graph()
        ref = np.asarray(model.apply(params, g, mode="inference")
                         ["classification_logits"], np.float32)
        got = np.asarray(int8_apply(model, params, g, mode="inference",
                                    min_features=100000)
                         ["classification_logits"], np.float32)
        np.testing.assert_array_equal(ref, got)

    def test_predictor_quant_knob(self):
        from dgdm_histopath_tpu.evaluation.predictor import DGDMPredictor

        model, params, g = self._model_and_graph()
        pred = DGDMPredictor(model=model, params=params,
                             feature_extractor="none", quant="int8")
        out = pred.predict_graph(jax.tree_util.tree_map(
            lambda a: a[0] if hasattr(a, "ndim") else a, g))
        assert "probabilities" in out and np.isfinite(out["logits"]).all()

    def test_predictor_rejects_unknown_quant(self):
        from dgdm_histopath_tpu.evaluation.predictor import DGDMPredictor
        from dgdm_histopath_tpu.utils.exceptions import InferenceError

        model, params, g = self._model_and_graph()
        with pytest.raises(InferenceError):
            DGDMPredictor(model=model, params=params,
                          feature_extractor="none", quant="int4")
