"""Golden tests for the timm-DINOv2 -> flax ViT weight converter.

The strongest offline evidence the converter is correct: a synthetic
torch-layout state dict is (a) run through an independent torch functional
forward implementing timm's ViT semantics, and (b) converted and run through
our flax ``VisionTransformer`` — outputs must match. (VERDICT r1 next-round
item #3; reference backbone at tissue_graph_builder.py:87-99.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from scripts.convert_timm_vit import (  # noqa: E402
    convert_state_dict, interpolate_pos_embed, load_torch_state_dict,
)

DIM, DEPTH, HEADS, PATCH, IMG = 32, 2, 4, 8, 32  # tiny but full-structure


def make_torch_state_dict(seed=0, layer_scale=True, dim=DIM, depth=DEPTH,
                          img=IMG, patch=PATCH):
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    n_tok = (img // patch) ** 2 + 1
    sd = {
        "cls_token": r(1, 1, dim),
        "pos_embed": r(1, n_tok, dim),
        "patch_embed.proj.weight": r(dim, 3, patch, patch),
        "patch_embed.proj.bias": r(dim),
        "norm.weight": 1.0 + r(dim), "norm.bias": r(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = 1.0 + r(dim)
        sd[p + "norm1.bias"] = r(dim)
        sd[p + "attn.qkv.weight"] = r(3 * dim, dim)
        sd[p + "attn.qkv.bias"] = r(3 * dim)
        sd[p + "attn.proj.weight"] = r(dim, dim)
        sd[p + "attn.proj.bias"] = r(dim)
        sd[p + "norm2.weight"] = 1.0 + r(dim)
        sd[p + "norm2.bias"] = r(dim)
        sd[p + "mlp.fc1.weight"] = r(4 * dim, dim)
        sd[p + "mlp.fc1.bias"] = r(4 * dim)
        sd[p + "mlp.fc2.weight"] = r(dim, 4 * dim)
        sd[p + "mlp.fc2.bias"] = r(dim)
        if layer_scale:
            sd[p + "ls1.gamma"] = 1e-1 + r(dim).abs()
            sd[p + "ls2.gamma"] = 1e-1 + r(dim).abs()
    return sd


def torch_vit_forward(sd, img_np, depth=DEPTH, heads=HEADS, patch=PATCH):
    """Independent timm-semantics ViT forward (pre-norm, qkv fused, exact
    GELU, optional LayerScale) straight from the state dict."""
    import torch.nn.functional as F
    x = torch.from_numpy(img_np).permute(0, 3, 1, 2).float()
    x = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=patch)
    b, d, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([sd["cls_token"].expand(b, -1, -1), x], dim=1)
    x = x + sd["pos_embed"]
    dh = d // heads
    for i in range(depth):
        p = f"blocks.{i}."
        h = F.layer_norm(x, (d,), sd[p + "norm1.weight"], sd[p + "norm1.bias"], eps=1e-6)
        qkv = F.linear(h, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        sh = lambda t: t.view(b, -1, heads, dh).transpose(1, 2)
        q, k, v = sh(q), sh(k), sh(v)
        attn = (q @ k.transpose(-2, -1)) * dh ** -0.5
        h = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, -1, d)
        h = F.linear(h, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
        if p + "ls1.gamma" in sd:
            h = h * sd[p + "ls1.gamma"]
        x = x + h
        h = F.layer_norm(x, (d,), sd[p + "norm2.weight"], sd[p + "norm2.bias"], eps=1e-6)
        h = F.linear(h, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
        h = F.gelu(h)  # exact erf
        h = F.linear(h, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
        if p + "ls2.gamma" in sd:
            h = h * sd[p + "ls2.gamma"]
        x = x + h
    x = F.layer_norm(x, (d,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)  # timm eps
    return x[:, 0].detach().numpy()


class TestConverter:
    @pytest.mark.parametrize("layer_scale", [True, False])
    def test_converted_forward_matches_torch(self, layer_scale):
        from dgdm_histopath_tpu.models.vit import VisionTransformer
        sd = make_torch_state_dict(layer_scale=layer_scale)
        sd_np = {k: v.numpy() for k, v in sd.items()}
        params = convert_state_dict(sd_np, depth=DEPTH, num_heads=HEADS)

        img = np.random.RandomState(0).rand(2, IMG, IMG, 3).astype(np.float32)
        golden = torch_vit_forward(sd, img)

        module = VisionTransformer(embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                                   patch_size=PATCH, layer_scale=layer_scale,
                                   dtype=jnp.float32)
        with jax.default_matmul_precision("float32"):
            ours = np.asarray(module.apply(params, jnp.asarray(img)))
        np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=2e-4)

    def test_layer_by_layer_mapping(self):
        """Every converted leaf equals the (transposed/reshaped) source."""
        sd = {k: v.numpy() for k, v in make_torch_state_dict().items()}
        params = convert_state_dict(sd, depth=DEPTH, num_heads=HEADS)["params"]
        np.testing.assert_array_equal(params["cls_token"], sd["cls_token"])
        np.testing.assert_array_equal(
            params["patch_embed"]["kernel"],
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        b0 = params["block0"]
        wq = sd["blocks.0.attn.qkv.weight"][:DIM]
        np.testing.assert_array_equal(
            b0["attn"]["query"]["kernel"],
            wq.T.reshape(DIM, HEADS, DIM // HEADS))
        np.testing.assert_array_equal(
            b0["attn"]["out"]["kernel"],
            sd["blocks.0.attn.proj.weight"].T.reshape(HEADS, DIM // HEADS, DIM))
        np.testing.assert_array_equal(b0["mlp1"]["kernel"],
                                      sd["blocks.0.mlp.fc1.weight"].T)
        np.testing.assert_array_equal(b0["norm1"]["scale"],
                                      sd["blocks.0.norm1.weight"])
        np.testing.assert_array_equal(b0["ls1_gamma"], sd["blocks.0.ls1.gamma"])

    def test_pos_embed_interpolation(self):
        pos = np.random.RandomState(0).rand(1, 17, 8).astype(np.float32)  # 4x4
        out = interpolate_pos_embed(pos, 37)                               # 6x6
        assert out.shape == (1, 37, 8)
        np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls preserved
        # identity when grids match
        np.testing.assert_array_equal(interpolate_pos_embed(pos, 17), pos)

    def test_cli_roundtrip_and_extractor_load(self, tmp_path):
        """Full path: torch .pth -> converter CLI -> PatchFeatureExtractor."""
        from scripts.convert_timm_vit import main as convert_main
        from dgdm_histopath_tpu.models.vit import _ARCHS, PatchFeatureExtractor

        # register a tiny arch so the CLI template check runs fast
        _ARCHS["_tiny_test"] = (dict(embed_dim=DIM, depth=DEPTH,
                                     num_heads=HEADS, patch_size=PATCH,
                                     layer_scale=True), DIM)
        try:
            src = tmp_path / "sd.pth"
            torch.save(make_torch_state_dict(), src)
            out = tmp_path / "converted.npz"
            rc = convert_main([str(src), str(out), "--arch", "_tiny_test",
                               "--image-size", str(IMG)])
            assert rc == 0 and out.exists()

            ext = PatchFeatureExtractor(arch="_tiny_test", batch_size=4,
                                        image_size=IMG)
            assert not ext.weights_loaded
            ext.load_npz_weights(str(out))
            assert ext.weights_loaded
            feats = ext.extract(np.random.RandomState(1).randint(
                0, 255, (3, IMG, IMG, 3), np.uint8))
            assert feats.shape == (3, DIM)
            assert np.isfinite(feats).all()
        finally:
            _ARCHS.pop("_tiny_test", None)

    def test_host_resize_matches_device_resize(self):
        """host_resize_u8 (PIL antialiased bilinear) must track the device
        path (jax.image.resize triangle kernel, antialias=True) to ~1 LSB —
        it substitutes for it when ``host_resize_upload=True`` shrinks the
        transfer-bound upload."""
        from dgdm_histopath_tpu.models.vit import host_resize_u8
        rng = np.random.RandomState(0)
        batch = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
        host = host_resize_u8(batch, 56).astype(np.float32)
        dev = np.asarray(jax.image.resize(
            jnp.asarray(batch, jnp.float32), (2, 56, 56, 3),
            method="bilinear"))
        assert np.abs(host - dev).max() <= 2.0

    def test_host_resize_numpy_fallback_matches_device(self):
        """The no-PIL numpy separable path implements the same antialiased
        triangle kernel as jax.image.resize."""
        from dgdm_histopath_tpu.models.vit import _triangle_weight_mat
        rng = np.random.RandomState(1)
        batch = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
        w = _triangle_weight_mat(64, 56)
        x = batch.astype(np.float32)
        x = np.einsum("nijc,ik->nkjc", x, w, optimize=True)
        x = np.einsum("nkjc,jm->nkmc", x, w, optimize=True)
        dev = np.asarray(jax.image.resize(
            jnp.asarray(batch, jnp.float32), (2, 56, 56, 3),
            method="bilinear"))
        np.testing.assert_allclose(x, dev, atol=1e-2)

    def test_extractor_host_resize_upload_pipeline(self):
        """host_resize_upload=True produces same-shape finite features and
        uploads the smaller buffer (dispatch resizes before padding)."""
        from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor
        ext = PatchFeatureExtractor(arch="simple_cnn", batch_size=4,
                                    image_size=32, host_resize_upload=True)
        feats, real = ext.dispatch(np.random.RandomState(2).randint(
            0, 255, (3, 48, 48, 3)).astype(np.uint8))
        assert real == 3 and feats.shape[0] == 4
        assert np.isfinite(np.asarray(feats)).all()

    def test_stain_stats_separate_nuclei_density(self):
        """The '+stats' feature channel (stain_stat_features) must rank a
        dense-nuclei patch above a sparse one on the hematoxylin
        high-concentration fraction — the nuclei-density signal the hard
        accuracy benchmark's oracle uses (benchmarks/probe_hard_task.py).
        Reference analogue: intensity placeholder features when images are
        absent (tissue_graph_builder.py:234-252)."""
        import jax.numpy as jnp
        from dgdm_histopath_tpu.models.vit import (
            STAIN_STATS_DIM, stain_stat_features,
        )
        rs = np.random.RandomState(0)

        def patch(n_nuclei):
            img = np.full((64, 64, 3), 235, np.float32)  # eosin-pink bg
            img[..., 1] = 210
            for _ in range(n_nuclei):
                cy, cx = rs.randint(4, 60, 2)
                img[cy - 2:cy + 2, cx - 2:cx + 2] = (80, 60, 140)  # basophilic
            return img

        dense = patch(120)
        sparse = patch(10)
        stats = stain_stat_features(jnp.stack([dense, sparse]))
        assert stats.shape == (2, STAIN_STATS_DIM)
        assert np.isfinite(np.asarray(stats)).all()
        h_frac = np.asarray(stats[:, 10])  # frac(H > 0.6)
        assert h_frac[0] > h_frac[1] + 0.05

    def test_extractor_stats_suffix_appends_dims(self):
        from dgdm_histopath_tpu.models.vit import (
            STAIN_STATS_DIM, PatchFeatureExtractor, _ARCHS,
        )
        ext = PatchFeatureExtractor(arch="simple_cnn+stats", batch_size=4,
                                    image_size=32)
        base_dim = _ARCHS["simple_cnn"][1]
        assert ext.feature_dim == base_dim + STAIN_STATS_DIM
        feats, real = ext.dispatch(np.random.RandomState(3).randint(
            0, 255, (3, 32, 32, 3)).astype(np.uint8))
        assert feats.shape == (4, ext.feature_dim)
        assert np.isfinite(np.asarray(feats)).all()

    def test_host_resize_commutes_with_stain_norm(self):
        """With host_resize_upload + device stain norm the pipeline applies
        norm∘resize instead of the reference's resize∘norm; on realistic
        H&E pixels (not adversarial noise) the two orders agree to ~1 LSB
        because the Macenko OD transform is locally smooth."""
        import jax
        import jax.numpy as jnp
        from dgdm_histopath_tpu.models.vit import host_resize_u8
        from dgdm_histopath_tpu.preprocessing.stain_normalization import (
            DEFAULT_MAX_CONCENTRATIONS, DEFAULT_STAIN_MATRIX,
            _macenko_normalize_single,
        )
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            generate_tissue_image,
        )
        rgb, _ = generate_tissue_image(width=64, height=64, seed=3)
        ref_s = jnp.asarray(DEFAULT_STAIN_MATRIX)
        ref_c = jnp.asarray(DEFAULT_MAX_CONCENTRATIONS)
        norm = lambda img: _macenko_normalize_single(
            jnp.asarray(img, jnp.float32), ref_s, ref_c, 1.0, 4096)
        # reference order: stain-norm at native res, then resize
        a = jax.image.resize(norm(rgb), (56, 56, 3), method="bilinear")
        # host-resize order: resize (uint8) then stain-norm
        b = norm(host_resize_u8(rgb[None], 56)[0])
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(diff) <= 2.0 and np.percentile(diff, 99) <= 12.0

    def test_torch_loader_rejects_pickle_code(self, tmp_path):
        """weights_only load path: a checkpoint with arbitrary objects fails
        instead of executing code."""
        bad = tmp_path / "bad.pth"
        # a function reference pickles by qualified name and would execute
        # a lookup on unpickle; weights_only=True must refuse it
        torch.save({"evil": print}, bad)
        with pytest.raises(Exception):
            load_torch_state_dict(bad)
