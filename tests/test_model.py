"""Model-layer tests: nn blocks, encoders, heads, DGDMModel forward/pretrain.

Mirrors the reference's synthetic-graph unit pattern
(reference tests/test_basic.py:70-189).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgdm_histopath_tpu.models import (
    ClassificationHead, DGDMModel, FeatureEncoder, GraphEncoder,
    MultiTaskHead, RegressionHead, SurvivalHead,
)
from dgdm_histopath_tpu.models.decoders import (
    cox_partial_likelihood, discrete_survival_loss,
)
from dgdm_histopath_tpu.nn import (
    DiffusionLayer, DynamicGraphLayer, GraphConvolution, GraphUNet,
    MultiHeadAttention, SpatialAttention,
)
from dgdm_histopath_tpu.ops.graph import batch_graphs

from conftest import make_synthetic_graph


def small_batch(num_classes=None, feat_dim=32, n_nodes=32, n_real=24, b=2):
    gs = [make_synthetic_graph(seed=i, n_nodes=n_nodes, n_real=n_real,
                               feat_dim=feat_dim, num_classes=num_classes)
          for i in range(b)]
    return batch_graphs(gs)


class TestNNBlocks:
    def test_graph_convolution_shapes(self):
        g = small_batch()
        layer = GraphConvolution(features=16, dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask, g.edge_attr)
        out = layer.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.edge_attr)
        assert out.shape == (2, 32, 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dynamic_graph_layer_attention_applied(self):
        g = small_batch()
        layer = DynamicGraphLayer(features=16, num_heads=4, dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask, g.edge_attr)
        out, attn = layer.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.edge_attr,
                                return_attention=True)
        assert out.shape == (2, 32, 16)
        assert attn.shape == (2, 32, g.max_neighbors, 4)
        # attention sums to 1 over valid neighbor slots (or 0 if none valid)
        sums = np.asarray(jnp.sum(attn, axis=2))
        has_nbr = np.asarray(jnp.any(g.nbr_mask, axis=-1))
        np.testing.assert_allclose(sums[has_nbr], 1.0, atol=1e-5)

    def test_mha_masking(self):
        mha = MultiHeadAttention(embed_dim=16, num_heads=4, dtype=jnp.float32)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16), jnp.float32)
        mask = jnp.asarray([[True] * 6 + [False] * 4, [True] * 10])
        params = mha.init(jax.random.PRNGKey(0), x, key_mask=mask)
        out, w = mha.apply(params, x, key_mask=mask, return_weights=True)
        assert out.shape == (2, 10, 16)
        # no attention mass on masked keys
        assert float(jnp.sum(w[0, :, :, 6:])) < 1e-6

    def test_spatial_attention(self):
        g = small_batch(feat_dim=16)
        sa = SpatialAttention(embed_dim=16, num_heads=4, dtype=jnp.float32)
        params = sa.init(jax.random.PRNGKey(0), g.x, g.pos, g.node_mask)
        out = sa.apply(params, g.x, g.pos, g.node_mask)
        assert out.shape == g.x.shape
        # padded nodes output zero
        assert float(jnp.abs(out[:, 24:]).max()) == 0.0

    def test_spatial_attention_bf16_traffic_close_to_f32(self):
        """bf16 storage of the [B,H,N,N] logits/weights buffers (the
        HBM-traffic optimization) must stay numerically close to the f32
        path: the only deltas are one bf16 rounding of logits and of
        weights — softmax math itself stays f32."""
        g = small_batch(feat_dim=16)
        f32 = SpatialAttention(embed_dim=16, num_heads=4, dtype=jnp.float32)
        bf = SpatialAttention(embed_dim=16, num_heads=4, dtype=jnp.float32,
                              traffic_dtype=jnp.bfloat16)
        params = f32.init(jax.random.PRNGKey(0), g.x, g.pos, g.node_mask)
        a = f32.apply(params, g.x, g.pos, g.node_mask)
        b = bf.apply(params, g.x, g.pos, g.node_mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-2, rtol=3e-2)
        # and the compressed path still masks padded nodes exactly
        assert float(jnp.abs(b[:, 24:]).max()) == 0.0

    def test_spatial_attention_windowed(self):
        """Block-local windowed attention: identical params to dense,
        mask-correct, and — with a sharp distance bias on Morton-sorted
        nodes — close to the dense all-pairs result."""
        from dgdm_histopath_tpu.parallel.halo import spatial_sort
        from conftest import make_synthetic_graph
        from dgdm_histopath_tpu.ops.graph import batch_graphs

        gs = [spatial_sort(make_synthetic_graph(
            seed=i, n_nodes=64, n_real=56, feat_dim=16)) for i in range(2)]
        g = batch_graphs(gs)
        # sharp bias: effective attention radius << window span
        dense = SpatialAttention(embed_dim=16, num_heads=4,
                                 distance_tau=0.02, dtype=jnp.float32)
        windowed = SpatialAttention(embed_dim=16, num_heads=4,
                                    distance_tau=0.02, window_size=16,
                                    dtype=jnp.float32)
        params = dense.init(jax.random.PRNGKey(0), g.x, g.pos, g.node_mask)
        a = np.asarray(dense.apply(params, g.x, g.pos, g.node_mask))
        b = np.asarray(windowed.apply(params, g.x, g.pos, g.node_mask))
        assert b.shape == a.shape
        # padded nodes zero
        pad = ~np.asarray(g.node_mask)
        assert np.abs(b[pad]).max() == 0.0
        # local approximation of the dense result
        real = np.asarray(g.node_mask)
        err = np.abs(a[real] - b[real]).max()
        ref = np.abs(a[real]).max()
        assert err < 0.15 * ref, (err, ref)

    def test_spatial_attention_window_mask_invariance(self):
        """Changing PADDED node features/positions must not change real-node
        outputs (repo mask-correctness rule)."""
        from dgdm_histopath_tpu.parallel.halo import spatial_sort
        from conftest import make_synthetic_graph
        from dgdm_histopath_tpu.ops.graph import batch_graphs

        g = batch_graphs([spatial_sort(make_synthetic_graph(
            seed=3, n_nodes=64, n_real=48, feat_dim=16))])
        sa = SpatialAttention(embed_dim=16, num_heads=4, window_size=16,
                              dtype=jnp.float32)
        params = sa.init(jax.random.PRNGKey(0), g.x, g.pos, g.node_mask)
        out1 = np.asarray(sa.apply(params, g.x, g.pos, g.node_mask))
        x2 = np.asarray(g.x).copy()
        p2 = np.asarray(g.pos).copy()
        pad = ~np.asarray(g.node_mask)
        x2[pad] = 7.7
        p2[pad] = 0.123
        out2 = np.asarray(sa.apply(params, jnp.asarray(x2), jnp.asarray(p2),
                                   g.node_mask))
        real = np.asarray(g.node_mask)
        np.testing.assert_allclose(out1[real], out2[real], atol=1e-6)

    def test_spatial_attention_window_fallback(self):
        """N/W < 3 (or indivisible N) silently takes the dense path —
        outputs bit-match the unwindowed module with the same params."""
        g = small_batch(feat_dim=16)
        n = g.x.shape[1]
        dense = SpatialAttention(embed_dim=16, num_heads=4, dtype=jnp.float32)
        wide = SpatialAttention(embed_dim=16, num_heads=4,
                                window_size=n // 2, dtype=jnp.float32)
        params = dense.init(jax.random.PRNGKey(0), g.x, g.pos, g.node_mask)
        a = np.asarray(dense.apply(params, g.x, g.pos, g.node_mask))
        b = np.asarray(wide.apply(params, g.x, g.pos, g.node_mask))
        np.testing.assert_array_equal(a, b)

    def test_graph_unet(self):
        g = small_batch(feat_dim=16)
        unet = GraphUNet(features=16, depth=2, num_heads=4, dtype=jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                           g.node_mask, g.edge_attr)
        out = unet.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask, g.edge_attr)
        assert out.shape == (2, 32, 16)

    def test_diffusion_layer_training_and_shapes(self):
        layer = DiffusionLayer(features=16, num_steps=5, dtype=jnp.float32)
        x0 = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16), jnp.float32)
        params = layer.init({"params": jax.random.PRNGKey(0),
                             "diffusion": jax.random.PRNGKey(1)}, x0,
                            jax.random.PRNGKey(2))
        pred, noise, t = layer.apply(params, x0, jax.random.PRNGKey(3))
        assert pred.shape == x0.shape and noise.shape == x0.shape
        assert t.shape == (2,)
        assert np.all(np.asarray(t) >= 0) and np.all(np.asarray(t) < 5)


class TestEncoders:
    def test_feature_encoder(self):
        enc = FeatureEncoder(hidden_dims=(32, 16), dtype=jnp.float32)
        x = jnp.ones((2, 10, 64))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (2, 10, 16)

    def test_graph_encoder(self):
        g = small_batch(feat_dim=32)
        enc = GraphEncoder(hidden_dim=16, num_layers=2, num_heads=4, dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                          g.node_mask, g.edge_attr)
        out = enc.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask, g.edge_attr)
        assert out["embeddings"].shape == (2, 32, 16)
        assert len(out["layer_outputs"]) == 2

    def test_hierarchical_encoder_single_graph(self):
        """In-model coarsened levels: graph-level output, padding-invariant."""
        from dgdm_histopath_tpu.models import HierarchicalEncoder
        g = small_batch(feat_dim=32)
        enc = HierarchicalEncoder(hidden_dim=16, num_levels=3, num_heads=4,
                                  dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                          g.node_mask, g.edge_attr)
        out = enc.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask,
                        g.edge_attr)
        assert out.shape == (2, 16)
        assert np.all(np.isfinite(np.asarray(out)))
        # mask-correctness: garbage in padded node slots must not leak
        x_dirty = g.x + 1e3 * (~g.node_mask[..., None]).astype(g.x.dtype)
        out_dirty = enc.apply(params, x_dirty, g.nbr_idx, g.nbr_mask,
                              g.node_mask, g.edge_attr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_dirty),
                                   atol=1e-5)

    def test_hierarchical_encoder_per_level_graphs(self):
        """Reference API parity: distinct per-level graphs (each its own
        node set/topology, reference models/encoders.py:363-481)."""
        from dgdm_histopath_tpu.models import HierarchicalEncoder
        levels = [small_batch(feat_dim=32, n_nodes=32, n_real=24),
                  small_batch(feat_dim=32, n_nodes=16, n_real=12)]
        enc = HierarchicalEncoder(hidden_dim=16, num_levels=2, num_heads=4,
                                  dtype=jnp.float32)
        args = ([g.x for g in levels], [g.nbr_idx for g in levels],
                [g.nbr_mask for g in levels], [g.node_mask for g in levels],
                [g.edge_attr for g in levels])
        params = enc.init(jax.random.PRNGKey(0), *args)
        out = enc.apply(params, *args)
        assert out.shape == (2, 16)
        assert np.all(np.isfinite(np.asarray(out)))
        # wrong level count is a config error, not silent truncation
        with pytest.raises(ValueError):
            enc.init(jax.random.PRNGKey(0), *([a[:1] for a in args]))


class TestHeads:
    def test_classification_head_loss(self):
        head = ClassificationHead(num_classes=3, dtype=jnp.float32)
        x = jnp.ones((4, 16))
        params = head.init(jax.random.PRNGKey(0), x)
        logits = head.apply(params, x)
        assert logits.shape == (4, 3)
        labels = jnp.asarray([0, 1, 2, 0])
        loss = head.loss(logits, labels)
        assert float(loss) > 0.0
        pred = head.predict(logits)
        assert pred["predictions"].shape == (4,)

    def test_regression_uncertainty(self):
        head = RegressionHead(num_targets=2, predict_uncertainty=True,
                              loss_type="gaussian_nll", dtype=jnp.float32)
        x = jnp.ones((4, 16))
        params = head.init(jax.random.PRNGKey(0), x)
        out = head.apply(params, x)
        assert out["mean"].shape == (4, 2) and out["log_var"].shape == (4, 2)
        loss = head.loss(out, jnp.zeros((4, 2)))
        assert np.isfinite(float(loss))

    def test_cox_loss_orders_risk(self):
        # higher risk for earlier events should give lower loss
        time = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        event = jnp.asarray([1, 1, 1, 1])
        good = cox_partial_likelihood(jnp.asarray([3.0, 2.0, 1.0, 0.0]), time, event)
        bad = cox_partial_likelihood(jnp.asarray([0.0, 1.0, 2.0, 3.0]), time, event)
        assert float(good) < float(bad)

    def test_discrete_survival(self):
        logits = jnp.zeros((3, 5))
        loss = discrete_survival_loss(logits, jnp.asarray([0, 2, 4]), jnp.asarray([1, 0, 1]))
        assert np.isfinite(float(loss))

    def test_survival_head(self):
        head = SurvivalHead(mode="discrete", num_intervals=4, dtype=jnp.float32)
        x = jnp.ones((3, 16))
        params = head.init(jax.random.PRNGKey(0), x)
        out = head.apply(params, x)
        assert out["hazard_logits"].shape == (3, 4)
        surv = np.asarray(out["survival"])
        assert np.all(np.diff(surv, axis=-1) <= 1e-6)  # survival non-increasing

    def test_multitask_head(self):
        head = MultiTaskHead(
            task_configs={"subtype": {"type": "classification", "num_classes": 4},
                          "grade": {"type": "regression", "num_targets": 1}},
            dtype=jnp.float32)
        x = jnp.ones((4, 16))
        params = head.init(jax.random.PRNGKey(0), x)
        out = head.apply(params, x)
        assert out["subtype"].shape == (4, 4)
        assert out["grade"]["mean"].shape == (4, 1)


class TestDGDMModel:
    def make_model(self, **kw):
        defaults = dict(node_features=32, hidden_dims=(32, 16), num_diffusion_steps=4,
                        attention_heads=4, graph_layers=2, num_classes=3,
                        compute_dtype="float32")
        defaults.update(kw)
        return DGDMModel(**defaults)

    def init_params(self, model, g):
        return model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            g, mode="pretrain", deterministic=True)

    def test_inference_forward(self):
        g = small_batch(num_classes=3, feat_dim=32)
        model = self.make_model()
        params = self.init_params(model, g)
        out = model.apply(params, g, mode="inference")
        assert out["classification_logits"].shape == (2, 3)
        assert out["graph_embedding"].shape == (2, 16)
        assert out["node_embeddings"].shape == (2, 32, 16)
        assert np.all(np.isfinite(np.asarray(out["classification_logits"])))

    def test_inference_forward_spatial_window(self):
        """spatial_window plumbs through to SpatialAttention: same param
        structure as dense (pure formulation change), finite logits."""
        g = small_batch(num_classes=3, feat_dim=32)   # N=32 -> 4 blocks of 8
        dense = self.make_model()
        windowed = self.make_model(spatial_window=8)
        params = self.init_params(dense, g)
        out = windowed.apply(params, g, mode="inference")
        assert np.all(np.isfinite(np.asarray(out["classification_logits"])))

    def test_pretrain_step_losses(self):
        g = small_batch(feat_dim=32)
        model = self.make_model(num_classes=None)
        params = self.init_params(model, g)
        out = model.apply(
            params, g, mask_ratio=0.3, deterministic=True,
            method=DGDMModel.pretrain_step,
            rngs={"diffusion": jax.random.PRNGKey(5), "masking": jax.random.PRNGKey(6)})
        assert float(out["diffusion_loss"]) > 0.0
        assert float(out["reconstruction_loss"]) >= 0.0
        # only real nodes get masked
        masked = np.asarray(out["masked_nodes"])
        real = np.asarray(g.node_mask)
        assert not np.any(masked & ~real)

    def test_return_attention(self):
        g = small_batch(num_classes=3, feat_dim=32)
        model = self.make_model()
        params = self.init_params(model, g)
        out = model.apply(params, g, mode="inference", return_attention=True)
        assert "attention_weights" in out
        assert out["attention_weights"].shape == (2, 32)
        w = np.asarray(out["attention_weights"])
        # pooled attention concentrates on real nodes
        assert w[:, 24:].max() < 1e-6

    def test_jit_forward(self):
        g = small_batch(num_classes=3, feat_dim=32)
        model = self.make_model()
        params = self.init_params(model, g)

        @jax.jit
        def forward(p, graph):
            return model.apply(p, graph, mode="inference")["classification_logits"]

        out1 = forward(params, g)
        out2 = forward(params, g)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_invalid_config_raises(self):
        from dgdm_histopath_tpu.utils.exceptions import ConfigurationError
        g = small_batch(feat_dim=32)
        model = self.make_model(attention_heads=5)  # doesn't divide 16
        with pytest.raises(ConfigurationError):
            self.init_params(model, g)

    def test_pooling_variants(self):
        g = small_batch(feat_dim=32)
        for pooling in ("mean", "max", "attention", "set2set"):
            model = self.make_model(num_classes=None, pooling=pooling)
            params = self.init_params(model, g)
            out = model.apply(params, g, mode="inference")
            assert out["graph_embedding"].shape == (2, 16), pooling


class TestPresets:
    def test_presets_construct(self):
        from dgdm_histopath_tpu.models import create_model, list_presets
        assert "dgdm-base" in list_presets()
        m = create_model("dgdm-base", num_classes=2)
        assert m.node_features == 768
        assert m.hidden_dims == (512, 256, 128)
        large = create_model("dgdm-large")
        assert large.attention_heads == 16
        # the windowed+banded scaling config is the validated default at
        # the Large bucket (models/presets.py default_window_policy)
        assert large.spatial_window == 128 and large.graph_window == 128
        dense = create_model("dgdm-large", spatial_window=None,
                             graph_window=None)
        assert dense.spatial_window is None

    def test_default_window_policy(self):
        from dgdm_histopath_tpu.models.presets import default_window_policy
        assert default_window_policy(1024) == (None, None)
        assert default_window_policy(2048) == (128, 128)
        assert default_window_policy(8192) == (128, 128)

    def test_preset_override_and_unknown(self):
        from dgdm_histopath_tpu.models import create_model
        m = create_model("dgdm-small", num_classes=3, dropout=0.0)
        assert m.dropout == 0.0 and m.num_classes == 3
        with pytest.raises(ValueError):
            create_model("dgdm-mega")


class TestRemat:
    @pytest.mark.slow
    def test_remat_matches_plain(self):
        from dgdm_histopath_tpu.ops.graph import batch_graphs
        g = small_batch(feat_dim=32)
        plain = DGDMModel(node_features=32, hidden_dims=(32, 16),
                          num_diffusion_steps=4, attention_heads=4,
                          graph_layers=2, num_classes=2,
                          use_hierarchical=False, compute_dtype="float32")
        remat = plain.replace(use_remat=True) if hasattr(plain, "replace") else DGDMModel(
            node_features=32, hidden_dims=(32, 16), num_diffusion_steps=4,
            attention_heads=4, graph_layers=2, num_classes=2,
            use_hierarchical=False, compute_dtype="float32", use_remat=True)
        rngs = {"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1),
                "masking": jax.random.PRNGKey(2)}
        params = plain.init(rngs, g, mode="pretrain", deterministic=True)
        out1 = plain.apply(params, g, mode="inference")["classification_logits"]
        out2 = remat.apply(params, g, mode="inference")["classification_logits"]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-5)
        # gradients flow through the remat path
        def loss(p):
            o = remat.apply(p, g, mode="inference")["classification_logits"]
            return jnp.sum(o ** 2)
        grads = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(grads))


class TestReassociatedEdgeMath:
    """The r2 HBM-traffic reassociations (edge terms summed in edge-attr
    space before projection; edge-key injection folded into q-space) must be
    numerically equivalent to the explicit [N,K,F]/[N,K,H,D] formulations."""

    def test_graph_conv_matches_explicit_edge_path(self):
        from dgdm_histopath_tpu.nn.graph_layers import GraphConvolution
        from dgdm_histopath_tpu.ops.graph import gather_neighbors, symmetric_norm
        rs = np.random.RandomState(0)
        B, N, K, F, E = 2, 32, 6, 16, 3
        x = jnp.asarray(rs.randn(B, N, F), jnp.float32)
        idx = jnp.asarray(rs.randint(0, N, (B, N, K)), jnp.int32)
        mask = jnp.asarray(rs.rand(B, N, K) > 0.3)
        ea = jnp.asarray(rs.randn(B, N, K, E), jnp.float32)
        ew = jnp.asarray(rs.rand(B, N, K), jnp.float32)
        conv = GraphConvolution(F, dtype=jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x, idx, mask, ea, ew)
        out = conv.apply(params, x, idx, mask, ea, ew)

        p = params["params"]
        h = x @ p["lin"]["kernel"]
        norm, self_norm = symmetric_norm(idx, mask)
        weight = norm * ew * mask.astype(jnp.float32)
        # explicit old path: project per-edge, add to gathered, weighted sum
        h_nbr = gather_neighbors(h, idx) + ea @ p["edge_lin"]["kernel"]
        agg = jnp.sum(h_nbr * weight[..., None], axis=-2)
        ref = agg + h * self_norm[..., None] + p["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_dynamic_layer_attention_matches_explicit_edge_keys(self):
        from dgdm_histopath_tpu.nn.graph_layers import DynamicGraphLayer
        from dgdm_histopath_tpu.ops.graph import gather_neighbors, masked_softmax
        rs = np.random.RandomState(1)
        B, N, K, F, E, H = 2, 32, 6, 16, 3, 4
        D = F // H
        x = jnp.asarray(rs.randn(B, N, F), jnp.float32)
        idx = jnp.asarray(rs.randint(0, N, (B, N, K)), jnp.int32)
        mask = jnp.asarray(rs.rand(B, N, K) > 0.3)
        ea = jnp.asarray(rs.randn(B, N, K, E), jnp.float32)
        layer = DynamicGraphLayer(F, H, dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), x, idx, mask, ea)
        _, attn = layer.apply(params, x, idx, mask, ea, return_attention=True)

        p = params["params"]
        q = jnp.einsum("bnf,fhd->bnhd", x, p["q_proj"]["kernel"]) + p["q_proj"]["bias"]
        k = jnp.einsum("bnf,fhd->bnhd", x, p["k_proj"]["kernel"]) + p["k_proj"]["bias"]
        k_nbr = gather_neighbors(k.reshape(B, N, F), idx).reshape(B, N, K, H, D)
        # explicit old path: materialize per-edge keys, then q·k
        e_k = jnp.einsum("bnke,ehd->bnkhd", ea, p["edge_k_proj"]["kernel"]) \
            + p["edge_k_proj"]["bias"]
        scores = jnp.einsum("bnhd,bnkhd->bnkh", q, k_nbr + e_k) / np.sqrt(D)
        ref_attn = masked_softmax(scores, mask[..., None], axis=-2)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                                   atol=1e-5, rtol=1e-4)

    def test_onehot_gather_impl_matches_take(self):
        """gather_impl='onehot' (the TPU MXU formulation) == 'xla' take path."""
        from dgdm_histopath_tpu.nn.graph_layers import DynamicGraphLayer
        from dgdm_histopath_tpu.ops.graph import gather_neighbors
        rs = np.random.RandomState(2)
        B, N, K, F, E = 2, 64, 6, 16, 3
        x = jnp.asarray(rs.randn(B, N, F), jnp.float32)
        idx = jnp.asarray(rs.randint(0, N, (B, N, K)), jnp.int32)
        mask = jnp.asarray(rs.rand(B, N, K) > 0.3)
        ea = jnp.asarray(rs.randn(B, N, K, E), jnp.float32)
        # raw gather op parity
        np.testing.assert_allclose(
            np.asarray(gather_neighbors(x, idx, impl="onehot")),
            np.asarray(gather_neighbors(x, idx, impl="take")),
            atol=1e-5, rtol=1e-5)
        # full layer parity
        la = DynamicGraphLayer(F, 4, gather_impl="onehot", dtype=jnp.float32)
        lb = DynamicGraphLayer(F, 4, gather_impl="xla", dtype=jnp.float32)
        params = la.init(jax.random.PRNGKey(0), x, idx, mask, ea)
        oa = la.apply(params, x, idx, mask, ea)
        ob = lb.apply(params, x, idx, mask, ea)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   atol=2e-4, rtol=2e-4)


class TestCompactPooling:
    """Compact (physically-shrinking) GraphUNet pooling (ops/graph.py
    compact_top_k_nodes + scatter_nodes) vs the round-2 re-masking path."""

    def test_compact_matches_mask_at_ratio_one(self):
        """ratio=1.0 keeps every node: the compact path is then a pure
        relabeling and must match the masked path numerically."""
        g = small_batch(feat_dim=16)
        kw = dict(features=16, depth=2, num_heads=4, pool_ratio=1.0,
                  dtype=jnp.float32)
        a = GraphUNet(compact_pooling=True, **kw)
        b = GraphUNet(compact_pooling=False, **kw)
        params = a.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                        g.node_mask, g.edge_attr)
        oa = a.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask, g.edge_attr)
        ob = b.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask, g.edge_attr)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   atol=2e-4, rtol=2e-4)

    def test_compact_shapes_and_padding_zero(self):
        g = small_batch(feat_dim=16)
        unet = GraphUNet(features=16, depth=2, num_heads=4,
                         compact_pooling=True, dtype=jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                           g.node_mask, g.edge_attr)
        out = unet.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask,
                         g.edge_attr)
        assert out.shape == g.x.shape
        assert float(jnp.abs(out * ~g.node_mask[..., None]).max()) == 0.0

    def test_compact_padding_invariance(self):
        """Garbage in padded node slots must not change real-node outputs
        (repo mask-correctness rule)."""
        g = small_batch(feat_dim=16)
        unet = GraphUNet(features=16, depth=2, num_heads=4,
                         compact_pooling=True, dtype=jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                           g.node_mask, g.edge_attr)
        out1 = unet.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask,
                          g.edge_attr)
        x_dirty = g.x + 1e3 * (~g.node_mask[..., None]).astype(g.x.dtype)
        out2 = unet.apply(params, x_dirty, g.nbr_idx, g.nbr_mask, g.node_mask,
                          g.edge_attr)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-5)

    @pytest.mark.slow
    def test_compact_gradients_flow(self):
        g = small_batch(feat_dim=16)
        unet = GraphUNet(features=16, depth=1, num_heads=4,
                         compact_pooling=True, dtype=jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                           g.node_mask, g.edge_attr)

        def loss(p):
            o = unet.apply(p, g.x, g.nbr_idx, g.nbr_mask, g.node_mask,
                           g.edge_attr)
            return jnp.sum(o ** 2)

        grads = jax.grad(loss)(params)
        total = sum(float(jnp.abs(l).sum())
                    for l in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(total) and total > 0

    def test_compact_top_k_nodes_semantics(self):
        """Hand-checked selection: top-2 of 4 nodes by score, neighbor ids
        remapped, edges into dropped nodes removed."""
        from dgdm_histopath_tpu.ops.graph import (
            compact_top_k_nodes, scatter_nodes,
        )
        x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 4, 2))
        nbr_idx = jnp.asarray([[[1, 2], [0, 3], [3, 0], [2, 1]]], jnp.int32)
        nbr_mask = jnp.ones((1, 4, 2), bool)
        node_mask = jnp.asarray([[True, True, True, False]])
        score = jnp.asarray([[0.9, 0.1, 0.5, 0.99]], jnp.float32)  # node 3 invalid
        c = compact_top_k_nodes(x, nbr_idx, nbr_mask, node_mask, score, 2)
        # kept: node 0 (0.9) then node 2 (0.5)
        np.testing.assert_array_equal(np.asarray(c["sel_idx"]), [[0, 2]])
        assert np.asarray(c["node_mask"]).tolist() == [[True, True]]
        np.testing.assert_array_equal(np.asarray(c["x"])[0, 0], [0.0, 1.0])
        np.testing.assert_array_equal(np.asarray(c["x"])[0, 1], [4.0, 5.0])
        # node 0's neighbors were (1, 2): 1 dropped, 2 -> slot 1
        assert np.asarray(c["nbr_mask"])[0, 0].tolist() == [False, True]
        assert int(np.asarray(c["nbr_idx"])[0, 0, 1]) == 1
        # node 2's neighbors were (3, 0): 3 dropped, 0 -> slot 0
        assert np.asarray(c["nbr_mask"])[0, 1].tolist() == [False, True]
        assert int(np.asarray(c["nbr_idx"])[0, 1, 1]) == 0
        # unpool scatters back to original slots
        up = scatter_nodes(c["x"], c["sel_idx"], 4, valid=c["node_mask"])
        np.testing.assert_array_equal(np.asarray(up)[0, 0], [0.0, 1.0])
        np.testing.assert_array_equal(np.asarray(up)[0, 2], [4.0, 5.0])
        assert float(jnp.abs(up[0, 1]).max()) == 0.0
        assert float(jnp.abs(up[0, 3]).max()) == 0.0


class TestBandedGraphLayers:
    """Banded (Morton-window) message passing — graph_window / band_window.

    The banded layer must compute EXACTLY the dense layer on the
    band-pruned graph (out-of-band edges removed from messages and degree
    norm); on graphs whose edges are all in-band the two formulations are
    numerically identical.
    """

    def _sorted_batch(self, n=64, real=56, feat=16, b=2):
        from dgdm_histopath_tpu.parallel.halo import spatial_sort
        gs = [spatial_sort(make_synthetic_graph(
            seed=10 + i, n_nodes=n, n_real=real, feat_dim=feat))
            for i in range(b)]
        return batch_graphs(gs)

    def test_dynamic_layer_banded_matches_dense_on_pruned_graph(self):
        from dgdm_histopath_tpu.ops.graph import banded_relative_neighbors
        w = 16
        g = self._sorted_batch()
        dense = DynamicGraphLayer(16, num_heads=4, dtype=jnp.float32)
        banded = DynamicGraphLayer(16, num_heads=4, band_window=w,
                                   dtype=jnp.float32)
        params = dense.init(jax.random.PRNGKey(0), g.x, g.nbr_idx,
                            g.nbr_mask, g.edge_attr)
        # dense reference on the band-pruned edge set
        _, ok = banded_relative_neighbors(g.nbr_idx, g.nbr_mask, w)
        want = np.asarray(dense.apply(params, g.x, g.nbr_idx, ok,
                                      g.edge_attr))
        got = np.asarray(banded.apply(params, g.x, g.nbr_idx, g.nbr_mask,
                                      g.edge_attr))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    def test_graph_convolution_banded_matches_dense_on_pruned_graph(self):
        from dgdm_histopath_tpu.ops.graph import banded_relative_neighbors
        w = 16
        g = self._sorted_batch(feat=8)
        dense = GraphConvolution(features=8, dtype=jnp.float32)
        banded = GraphConvolution(features=8, band_window=w,
                                  dtype=jnp.float32)
        params = dense.init(jax.random.PRNGKey(1), g.x, g.nbr_idx,
                            g.nbr_mask, g.edge_attr)
        _, ok = banded_relative_neighbors(g.nbr_idx, g.nbr_mask, w)
        want = np.asarray(dense.apply(params, g.x, g.nbr_idx, ok,
                                      g.edge_attr))
        got = np.asarray(banded.apply(params, g.x, g.nbr_idx, g.nbr_mask,
                                      g.edge_attr))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    def test_banded_mask_invariance(self):
        """Padded node features must not leak into real-node outputs."""
        w = 16
        g = self._sorted_batch(real=40)
        layer = DynamicGraphLayer(16, num_heads=4, band_window=w,
                                  dtype=jnp.float32)
        masked_nbr = g.nbr_mask & g.node_mask[..., None]
        params = layer.init(jax.random.PRNGKey(0), g.x, g.nbr_idx,
                            masked_nbr, g.edge_attr)
        out1 = np.asarray(layer.apply(params, g.x, g.nbr_idx, masked_nbr,
                                      g.edge_attr))
        x2 = np.asarray(g.x).copy()
        x2[~np.asarray(g.node_mask)] = 5.5
        out2 = np.asarray(layer.apply(params, jnp.asarray(x2), g.nbr_idx,
                                      masked_nbr, g.edge_attr))
        real = np.asarray(g.node_mask)
        np.testing.assert_allclose(out1[real], out2[real], atol=1e-5)

    def test_graph_unet_banded_matches_dense_on_pruned_graph(self):
        """U-Net with band_window: full-N levels (down0/up0) banded, pooled
        levels dense — exact vs the dense U-Net on the band-pruned graph."""
        from dgdm_histopath_tpu.ops.graph import banded_relative_neighbors
        w = 16
        g = self._sorted_batch()
        dense = GraphUNet(features=16, depth=2, num_heads=4,
                          dtype=jnp.float32)
        banded = GraphUNet(features=16, depth=2, num_heads=4, band_window=w,
                           dtype=jnp.float32)
        # band-complete graph: prune out-of-band edges up front so BOTH
        # variants see identical edges at every level (pooled levels pass
        # the mask through unchanged)
        _, ok = banded_relative_neighbors(g.nbr_idx, g.nbr_mask, w)
        params = dense.init(jax.random.PRNGKey(0), g.x, g.nbr_idx,
                            ok, g.node_mask, g.edge_attr)
        want = np.asarray(dense.apply(params, g.x, g.nbr_idx, ok,
                                      g.node_mask, g.edge_attr))
        got = np.asarray(banded.apply(params, g.x, g.nbr_idx, ok,
                                      g.node_mask, g.edge_attr))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)

    def test_model_graph_window_runs_and_falls_back(self):
        g = small_batch(num_classes=3, feat_dim=32)   # N=32
        base = DGDMModel(node_features=32, hidden_dims=(32, 16),
                         num_diffusion_steps=4, attention_heads=4,
                         graph_layers=2, num_classes=3,
                         compute_dtype="float32")
        banded = DGDMModel(node_features=32, hidden_dims=(32, 16),
                           num_diffusion_steps=4, attention_heads=4,
                           graph_layers=2, num_classes=3,
                           compute_dtype="float32", graph_window=8)
        params = base.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(3)}, g, mode="pretrain")
        out = banded.apply(params, g, mode="inference")
        assert np.all(np.isfinite(np.asarray(out["classification_logits"])))
        # ineligible window (N/W < 3) silently runs the dense path
        fallback = DGDMModel(node_features=32, hidden_dims=(32, 16),
                             num_diffusion_steps=4, attention_heads=4,
                             graph_layers=2, num_classes=3,
                             compute_dtype="float32", graph_window=16)
        a = np.asarray(base.apply(params, g,
                                  mode="inference")["classification_logits"])
        b = np.asarray(fallback.apply(params, g,
                                      mode="inference")["classification_logits"])
        np.testing.assert_array_equal(a, b)


class TestScaleBuckets:
    """8192-node bucket under the windowed+banded scaling config.

    The reference structurally caps slides at max_patches=2000
    (/root/reference/configs/dgdm_large.yaml:41) because its dense N^2
    spatial attention and per-graph Python loops make larger graphs
    intractable; the windowed+banded config is linear in N, so an 8k-node
    bucket is a supported geometry here. This pins that the full model
    (spatial attention + banded encoder + U-Net + diffusion + pooling)
    traces and runs at N=8192 with finite, mask-correct outputs.
    """

    @pytest.mark.slow
    def test_8k_bucket_windowed_forward(self):
        from dgdm_histopath_tpu.parallel.halo import spatial_sort
        n, real = 8192, 8000
        g = batch_graphs([spatial_sort(make_synthetic_graph(
            seed=3, n_nodes=n, n_real=real, feat_dim=16))])
        model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                          num_diffusion_steps=4, attention_heads=4,
                          graph_layers=2, num_classes=3,
                          compute_dtype="float32",
                          spatial_window=128, graph_window=128)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(3)}, g, mode="pretrain")
        out = model.apply(params, g, mode="inference")
        logits = np.asarray(out["classification_logits"])
        assert logits.shape == (1, 3)
        assert np.all(np.isfinite(logits))
        # padded nodes must not contribute: perturbing them is a no-op
        x2 = np.asarray(g.x).copy()
        x2[0, ~np.asarray(g.node_mask[0])] = 7.7
        g2 = g.replace(x=jnp.asarray(x2))
        logits2 = np.asarray(model.apply(params, g2,
                                         mode="inference")["classification_logits"])
        np.testing.assert_allclose(logits, logits2, atol=1e-5)
