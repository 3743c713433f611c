"""Pallas kernel tests (interpret mode on CPU; same code path as TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.ops.pallas.flash_spatial import (
    _dense_reference, flash_spatial_attention,
)


def _inputs(B=2, N=256, H=2, D=128, masked_from=200, seed=0):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.float32)
    pos = jnp.asarray(rs.rand(B, N, 2), jnp.float32)
    mask = np.ones((B, N), bool)
    mask[:, masked_from:] = False
    return q, k, v, pos, jnp.asarray(mask), mask


def _dense(q, k, v, pos, mask, tau=0.1):
    B, N, H, D = q.shape
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    out = _dense_reference(qf, kf, vf, jnp.repeat(pos, H, 0),
                           jnp.repeat(mask, H, 0), tau)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


class TestFlashSpatial:
    def test_matches_dense_reference(self):
        q, k, v, pos, mask, mask_np = _inputs()
        out_p = flash_spatial_attention(q, k, v, pos, mask, tau=0.1,
                                        force_pallas=True)
        out_d = _dense(q, k, v, pos, mask)
        valid = mask_np[:, :, None, None]
        diff = np.abs(np.asarray(out_p) - np.asarray(out_d)) * valid
        assert diff.max() < 1e-4

    def test_fully_masked_tail_contributes_nothing(self):
        q, k, v, pos, mask, mask_np = _inputs(masked_from=128)
        out1 = flash_spatial_attention(q, k, v, pos, mask, force_pallas=True)
        # change masked-out v rows: output on valid rows must not change
        v2 = v.at[:, 128:].set(99.0)
        out2 = flash_spatial_attention(q, k, v2, pos, mask, force_pallas=True)
        valid = mask_np[:, :, None, None]
        np.testing.assert_allclose(np.asarray(out1) * valid,
                                   np.asarray(out2) * valid, atol=1e-5)

    def test_distance_bias_effect(self):
        # with tiny tau, attention should collapse onto the nearest neighbor
        q, k, v, pos, mask, _ = _inputs(masked_from=256)
        # sharp softmax amplifies the numeric difference between the kernel's
        # |a|^2-2ab+|b|^2 distance expansion and the dense diff-based form
        out_smalltau = flash_spatial_attention(q, k, v, pos, mask, tau=1e-3,
                                               force_pallas=True)
        d = _dense(q, k, v, pos, mask, tau=1e-3)
        np.testing.assert_allclose(np.asarray(out_smalltau), np.asarray(d),
                                   atol=5e-3)

    def test_gradients_flow(self):
        q, k, v, pos, mask, mask_np = _inputs(N=128, masked_from=128)

        def loss(q_, k_, v_):
            o = flash_spatial_attention(q_, k_, v_, pos, mask,
                                        force_pallas=True)
            return jnp.sum(o ** 2)

        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for g in (gq, gk, gv):
            assert bool(jnp.all(jnp.isfinite(g)))
            assert float(jnp.abs(g).max()) > 0

        # gradient matches the dense path's gradient
        def dense_loss(q_, k_, v_):
            return jnp.sum(_dense(q_, k_, v_, pos, mask) ** 2)

        dq_ref = jax.grad(dense_loss)(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(dq_ref),
                                   rtol=1e-3, atol=1e-3)

    def test_fallback_on_nontiling_shapes(self):
        # N=100 doesn't tile: wrapper must fall back to dense silently
        q, k, v, pos, mask, _ = _inputs(N=100, masked_from=100, D=128)
        out = flash_spatial_attention(q, k, v, pos, mask)
        assert out.shape == q.shape

    def test_spatial_attention_module_flash_parity(self):
        """SpatialAttention(use_flash=True) == use_flash=False numerically."""
        from dgdm_histopath_tpu.nn.attention import SpatialAttention
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 128, 128), jnp.float32)
        pos = jnp.asarray(rs.rand(2, 128, 2), jnp.float32)
        mask = jnp.asarray(np.ones((2, 128), bool))
        flash = SpatialAttention(embed_dim=128, num_heads=1, use_flash=True,
                                 dtype=jnp.float32)
        dense = SpatialAttention(embed_dim=128, num_heads=1, use_flash=False,
                                 dtype=jnp.float32)
        params = flash.init(jax.random.PRNGKey(0), x, pos, mask)
        out_f = flash.apply(params, x, pos, mask)
        out_d = dense.apply(params, x, pos, mask)   # same params!
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                                   atol=2e-4)

    def test_small_head_dim_padded(self):
        """head_dim 16 (the real DGDM configuration) pads to the lane tile."""
        q, k, v, pos, mask, mask_np = _inputs(N=128, H=4, D=16, masked_from=100)
        out_p = flash_spatial_attention(q, k, v, pos, mask, tau=0.1,
                                        force_pallas=True)
        out_d = _dense(q, k, v, pos, mask)
        valid = mask_np[:, :, None, None]
        diff = np.abs(np.asarray(out_p) - np.asarray(out_d)) * valid
        assert out_p.shape == q.shape
        assert diff.max() < 1e-4


class TestGatherAgg:
    """Fused one-hot-MXU weighted neighbor aggregation
    (ops/pallas/gather_agg.py) — interpret-mode golden + vjp parity."""

    def _data(self, b=2, n=256, k=24, f=128, seed=0):
        rs = np.random.RandomState(seed)
        h = jnp.asarray(rs.randn(b, n, f), jnp.float32)
        idx = jnp.asarray(rs.randint(0, n, (b, n, k)), jnp.int32)
        w = jnp.asarray(rs.rand(b, n, k), jnp.float32)
        return h, idx, w

    @staticmethod
    def _plain(h, idx, w):
        b, n, k = idx.shape
        f = h.shape[-1]
        g = jnp.take_along_axis(h, idx.reshape(b, n * k)[..., None],
                                axis=-2).reshape(b, n, k, f)
        return jnp.sum(g * w[..., None], axis=-2)

    def test_forward_golden(self):
        from dgdm_histopath_tpu.ops.pallas.gather_agg import weighted_gather_sum
        h, idx, w = self._data()
        out = weighted_gather_sum(h, idx, w, True)
        ref = self._plain(h, idx, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_zero_weight_rows_are_padding_safe(self):
        from dgdm_histopath_tpu.ops.pallas.gather_agg import weighted_gather_sum
        h, idx, w = self._data()
        w = w.at[:, 128:].set(0.0)                 # padded tail: zero weight
        h_dirty = h.at[:, 200:].set(1e9)           # garbage padding features
        out = weighted_gather_sum(h, idx, w, True)
        assert np.isfinite(np.asarray(out)[:, :128]).all()
        np.testing.assert_array_equal(np.asarray(out)[:, 128:], 0.0)

    def test_vjp_matches_autodiff(self):
        from dgdm_histopath_tpu.ops.pallas.gather_agg import weighted_gather_sum
        h, idx, w = self._data(n=128)
        lp = lambda h_, w_: jnp.sum(self._plain(h_, idx, w_) ** 2)
        lk = lambda h_, w_: jnp.sum(weighted_gather_sum(h_, idx, w_, True) ** 2)
        gp = jax.grad(lp, argnums=(0, 1))(h, w)
        gk = jax.grad(lk, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gk[0]),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gk[1]),
                                   atol=1e-3, rtol=1e-3)

    @pytest.mark.slow
    def test_model_level_pallas_gather_matches_xla(self):
        """DGDMModel(gather_impl='pallas') == gather_impl='xla' on the same
        params (the A/B wiring used for on-chip benchmarking)."""
        from dgdm_histopath_tpu.models import DGDMModel
        from conftest import make_synthetic_graph
        from dgdm_histopath_tpu.ops.graph import batch_graphs
        batch = batch_graphs([make_synthetic_graph(seed=i, n_nodes=128,
                                                   n_real=100, feat_dim=16)
                              for i in range(2)])
        kw = dict(node_features=16, hidden_dims=(32, 16), num_diffusion_steps=3,
                  attention_heads=4, graph_layers=2, num_classes=2,
                  use_hierarchical=False, compute_dtype="float32", dropout=0.0)
        m_xla = DGDMModel(**kw, gather_impl="xla")
        m_pal = DGDMModel(**kw, gather_impl="pallas")
        rngs = {"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1),
                "masking": jax.random.PRNGKey(2)}
        params = m_xla.init(rngs, batch, mode="pretrain", deterministic=True)
        o1 = m_xla.apply(params, batch, mode="inference", deterministic=True)
        o2 = m_pal.apply(params, batch, mode="inference", deterministic=True)
        np.testing.assert_allclose(
            np.asarray(o1["classification_logits"], np.float32),
            np.asarray(o2["classification_logits"], np.float32),
            atol=1e-3, rtol=1e-3)


class TestPackedFlash:
    """Packed-heads kernel (H*D == 128 lane tile, ops/pallas/flash_spatial
    ``_flash_spatial_packed``) — interpret-mode parity vs the dense path."""

    def test_packed_matches_dense_dgdm_geometry(self):
        """8 heads x head_dim 16 (the real DGDM Base shape) routes packed."""
        q, k, v, pos, mask, mask_np = _inputs(N=256, H=8, D=16, masked_from=200)
        out_p = flash_spatial_attention(q, k, v, pos, mask, tau=0.1,
                                        force_pallas=True)
        out_d = _dense(q, k, v, pos, mask)
        valid = mask_np[:, :, None, None]
        diff = np.abs(np.asarray(out_p) - np.asarray(out_d)) * valid
        assert out_p.shape == q.shape
        assert diff.max() < 1e-4

    def test_packed_gradients_match_dense(self):
        q, k, v, pos, mask, _ = _inputs(N=128, H=8, D=16, masked_from=120)

        def loss_flash(q_, k_, v_):
            o = flash_spatial_attention(q_, k_, v_, pos, mask, tau=0.1,
                                        force_pallas=True)
            return jnp.sum((o * mask[..., None, None]) ** 2)

        def loss_dense(q_, k_, v_):
            o = _dense(q_, k_, v_, pos, mask)
            return jnp.sum((o * mask[..., None, None]) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3)


class TestGatherRows:
    """VMEM one-hot row gather (``ops/pallas/gather_rows``) — the
    DynamicGraphLayer key gather without the HBM [B,N,K,N] selector."""

    @staticmethod
    def _data(b=2, n=256, k=9, f=128, dtype=jnp.float32, seed=0):
        rs = np.random.RandomState(seed)
        src = jnp.asarray(rs.randn(b, n, f), dtype)
        idx = jnp.asarray(rs.randint(0, n, size=(b, n, k)), jnp.int32)
        return src, idx

    @staticmethod
    def _take(src, idx):
        b, n, k = idx.shape
        f = src.shape[-1]
        return jnp.take_along_axis(
            src, idx.reshape(b, n * k)[..., None], axis=-2
        ).reshape(b, n, k, f)

    def test_forward_bit_exact(self):
        """Rows are copies, not sums: the kernel must be BIT-equal to
        take_along_axis, f32 and bf16."""
        from dgdm_histopath_tpu.ops.pallas.gather_rows import gather_rows
        for dt in (jnp.float32, jnp.bfloat16):
            src, idx = self._data(dtype=dt)
            out = gather_rows(src, idx, True)
            assert out.dtype == src.dtype
            np.testing.assert_array_equal(
                np.asarray(out, np.float32),
                np.asarray(self._take(src, idx), np.float32))

    def test_vjp_matches_autodiff(self):
        from dgdm_histopath_tpu.ops.pallas.gather_rows import gather_rows
        src, idx = self._data(n=128, k=5)
        w = jnp.asarray(np.random.RandomState(1).randn(2, 128, 5, 128),
                        jnp.float32)
        lp = lambda s: jnp.sum(self._take(s, idx) * w)
        lk = lambda s: jnp.sum(gather_rows(s, idx, True) * w)
        gp = jax.grad(lp)(src)
        gk = jax.grad(lk)(src)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gk),
                                   atol=1e-4, rtol=1e-4)

    def test_eligibility_gate(self):
        from dgdm_histopath_tpu.ops.pallas.gather_rows import eligible
        assert eligible(1024, 24, 128)          # Base geometry
        assert eligible(2048, 24, 128)          # Large bucket
        assert not eligible(1000, 24, 128)      # untiled node count
        assert not eligible(2048, 24, 8192)     # VMEM blowout

    def test_gather_neighbors_pallas_rows_route(self):
        """impl='pallas_rows' matches 'take' exactly, and ineligible shapes
        fall back instead of failing."""
        from dgdm_histopath_tpu.ops.graph import gather_neighbors
        src, idx = self._data()
        out = gather_neighbors(src, idx, impl="pallas_rows")
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(self._take(src, idx)))
        # ineligible (n=100 untiled) -> silent fallback, same result
        src2, idx2 = self._data(n=100, k=3, f=16)
        out2 = gather_neighbors(src2, idx2, impl="pallas_rows")
        np.testing.assert_array_equal(np.asarray(out2),
                                      np.asarray(self._take(src2, idx2)))

    def test_layer_level_key_gather_parity(self):
        """DynamicGraphLayer(gather_impl='pallas') == 'onehot' on identical
        params — the exact A/B wiring used for on-chip benchmarking."""
        from dgdm_histopath_tpu.nn.graph_layers import DynamicGraphLayer
        rs = np.random.RandomState(0)
        n, k, f = 128, 7, 32
        x = jnp.asarray(rs.randn(2, n, f), jnp.float32)
        idx = jnp.asarray(rs.randint(0, n, (2, n, k)), jnp.int32)
        mask = jnp.asarray(rs.rand(2, n, k) > 0.2)
        ea = jnp.asarray(rs.randn(2, n, k, 3), jnp.float32)
        kw = dict(features=f, num_heads=4, dtype=jnp.float32)
        l_ref = DynamicGraphLayer(**kw, gather_impl="onehot")
        l_pal = DynamicGraphLayer(**kw, gather_impl="pallas")
        params = l_ref.init(jax.random.PRNGKey(0), x, idx, mask, ea)
        o_ref = l_ref.apply(params, x, idx, mask, ea)
        o_pal = l_pal.apply(params, x, idx, mask, ea)
        np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_pal),
                                   atol=2e-5, rtol=2e-5)
