"""Preprocessing tests: stain norm golden values, tissue detection,
slide processing on synthetic WSIs, graph construction.

These fill the reference's test gap (SURVEY §4: "no small .svs fixture and
no golden-output test").
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dgdm_histopath_tpu.preprocessing import (
    ArrayBackend, PatchInfo, SlideProcessor, StainNormalizer, TissueDetector,
    TissueGraphBuilder, compute_tissue_mask, estimate_stain_matrix, od_to_rgb,
    rgb_to_od, synthetic_slide, write_synthetic_tiff, open_slide,
)
from dgdm_histopath_tpu.preprocessing.slide_processor import _integral_image, _box_sum
from dgdm_histopath_tpu.preprocessing.tissue_detection import (
    connected_components_filter, otsu_threshold,
)


class TestStainNormalization:
    def test_od_roundtrip(self):
        rgb = jnp.asarray(np.random.RandomState(0).randint(0, 255, (16, 3)), jnp.float32)
        back = od_to_rgb(rgb_to_od(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1.0)

    def test_estimate_stain_matrix_synthetic(self):
        # golden test: pixels generated from known H&E stain vectors should
        # recover those vectors (up to tolerance)
        rs = np.random.RandomState(0)
        true = np.array([[0.65, 0.07], [0.70, 0.99], [0.29, 0.11]], np.float32)
        true /= np.linalg.norm(true, axis=0, keepdims=True)
        conc = rs.uniform(0.05, 1.5, (5000, 2)).astype(np.float32)
        od = conc @ true.T
        rgb = np.clip(255.0 * np.exp(-od) - 1.0, 0, 255)
        est = np.asarray(estimate_stain_matrix(jnp.asarray(rgb)))
        # columns are unit vectors; compare via absolute cosine similarity
        for i in range(2):
            cos = abs(float(est[:, i] @ true[:, i]))
            assert cos > 0.95, f"stain {i}: cos={cos}, est={est[:, i]}, true={true[:, i]}"

    def test_macenko_normalize_batch_shapes_and_background(self):
        rs = np.random.RandomState(1)
        # mostly-white background with a tissue square
        imgs = np.full((3, 64, 64, 3), 245, np.uint8)
        imgs[:, 16:48, 16:48] = rs.randint(60, 200, (3, 32, 32, 3))
        norm = StainNormalizer("macenko")
        out = norm.normalize(imgs)
        assert out.shape == imgs.shape and out.dtype == np.uint8
        # background (transparent pixels) stays untouched
        np.testing.assert_array_equal(out[:, :8, :8], imgs[:, :8, :8])

    def test_reinhard_moves_stats_toward_target(self):
        rs = np.random.RandomState(2)
        img = rs.randint(40, 220, (1, 32, 32, 3)).astype(np.uint8)
        norm = StainNormalizer("reinhard")
        out = norm.normalize(img)
        assert out.shape == img.shape
        from dgdm_histopath_tpu.preprocessing.stain_normalization import rgb_to_lab
        lab = np.asarray(rgb_to_lab(jnp.asarray(out.astype(np.float32))))
        target_mean = np.asarray(norm.lab_mean)
        np.testing.assert_allclose(lab.mean(axis=(0, 1, 2)), target_mean, atol=0.5)

    def test_fit_to_template(self):
        rs = np.random.RandomState(3)
        template = rs.randint(60, 200, (64, 64, 3)).astype(np.uint8)
        norm = StainNormalizer("macenko").fit_to_template(template)
        assert norm.ref_stains.shape == (3, 2)
        assert np.all(np.isfinite(np.asarray(norm.ref_max_c)))

    def test_invalid_method(self):
        with pytest.raises(ValueError):
            StainNormalizer("vahadane")


class TestTissueDetection:
    def test_otsu_bimodal(self):
        gray = jnp.concatenate([jnp.full((500,), 50.0), jnp.full((500,), 200.0)])
        t = float(otsu_threshold(gray))
        assert 50 <= t < 200

    def test_mask_on_synthetic(self):
        backend, true_mask = synthetic_slide(512, 512, num_levels=3, seed=0)
        thumb = backend.read_region((0, 0), 0, (512, 512))
        det = TissueDetector(min_region_area=32)
        mask = det.detect_tissue(thumb)
        assert mask.shape == (512, 512)
        # detected tissue should overlap heavily with ground truth
        inter = (mask & true_mask).sum()
        union = (mask | true_mask).sum()
        iou = inter / max(union, 1)
        assert iou > 0.5, f"IoU={iou}"

    def test_connected_components_filter(self):
        mask = np.zeros((32, 32), bool)
        mask[2:20, 2:20] = True      # big region (324 px)
        mask[28:30, 28:30] = True    # small region (4 px)
        out = connected_components_filter(mask, min_area=10)
        assert out[10, 10] and not out[28, 28]

    def test_stats(self):
        det = TissueDetector()
        mask = np.zeros((16, 16), bool)
        mask[:8, :8] = True
        stats = det.get_tissue_stats(mask)
        assert stats.tissue_fraction == pytest.approx(0.25)
        assert stats.num_regions == 1


class TestSlideProcessor:
    def test_integral_image_box_sum(self):
        rs = np.random.RandomState(0)
        m = rs.rand(20, 30) > 0.5
        ii = _integral_image(m)
        assert _box_sum(ii, np.asarray(3), np.asarray(4), np.asarray(10),
                        np.asarray(12)) == m[3:10, 4:12].sum()

    def test_process_synthetic_slide(self):
        backend, _ = synthetic_slide(1024, 1024, num_levels=3, seed=1,
                                     objective_power=20.0)
        proc = SlideProcessor(patch_size=64, tissue_threshold=0.5,
                              max_patches=50, magnifications=[20.0],
                              stain_normalize=False)
        data = proc.process_slide(backend, slide_id="synthetic1")
        assert data.num_patches > 0
        assert data.num_patches <= 50
        assert data.patches.shape == (data.num_patches, 64, 64, 3)
        assert data.metadata["objective_power"] == 20.0
        # all patches pass the tissue gate
        assert all(p.tissue_fraction >= 0.5 for p in data.patch_info)

    def test_magnification_downsampling(self):
        backend, _ = synthetic_slide(1024, 1024, num_levels=3, seed=1,
                                     objective_power=40.0)
        proc = SlideProcessor(patch_size=64, tissue_threshold=0.3,
                              max_patches=10, magnifications=[10.0],
                              stain_normalize=False)
        data = proc.process_slide(backend)
        # at 10x on a 40x slide, each patch spans 64*4=256 level-0 px
        assert data.patch_info[0].size == 64
        assert data.patches.shape[1:] == (64, 64, 3)

    def test_hdf5_roundtrip(self, tmp_path):
        backend, _ = synthetic_slide(512, 512, num_levels=2, seed=2)
        proc = SlideProcessor(patch_size=32, tissue_threshold=0.4,
                              max_patches=20, stain_normalize=False)
        data = proc.process_slide(backend, slide_id="rt")
        p = proc.save_slide_data(data, tmp_path / "rt.h5")
        loaded = proc.load_slide_data(p)
        assert loaded.slide_id == "rt"
        assert loaded.num_patches == data.num_patches
        np.testing.assert_array_equal(loaded.patches, data.patches)
        assert loaded.patch_info[0].x == data.patch_info[0].x

    def test_tiff_backend_roundtrip(self, tmp_path):
        path = write_synthetic_tiff(tmp_path / "s.tiff", 512, 512, num_levels=3)
        slide = open_slide(path)
        assert slide.level_count == 3
        assert slide.dimensions == (512, 512)
        region = slide.read_region((100, 100), 0, (64, 64))
        assert region.shape == (64, 64, 3)
        slide.close()

    def test_invalid_params(self):
        from dgdm_histopath_tpu.utils.exceptions import SlideProcessingError
        with pytest.raises(SlideProcessingError):
            SlideProcessor(patch_size=0)
        with pytest.raises(SlideProcessingError):
            SlideProcessor(tissue_threshold=1.5)


class TestTissueGraphBuilder:
    def _slide_data(self, n_patches=30):
        backend, _ = synthetic_slide(1024, 1024, num_levels=3, seed=3)
        proc = SlideProcessor(patch_size=32, tissue_threshold=0.3,
                              max_patches=n_patches, stain_normalize=False)
        return proc.process_slide(backend, slide_id="gb")

    def test_build_graph_placeholder_features(self):
        data = self._slide_data()
        builder = TissueGraphBuilder(feature_extractor="none",
                                     node_buckets=[32, 64, 128])
        g = builder.build_graph(data, label=1)
        assert g.num_nodes in (32, 64, 128)
        assert int(g.n_real_nodes) == data.num_patches
        assert g.x.shape[-1] == 5
        assert g.max_neighbors == 8 + 16
        assert int(g.y) == 1
        # positions normalized
        pos = np.asarray(g.pos)[np.asarray(g.node_mask)]
        assert pos.min() >= 0.0 and pos.max() <= 1.0

    def test_build_graph_with_conv_features(self):
        data = self._slide_data(n_patches=12)
        builder = TissueGraphBuilder(feature_extractor="simple_cnn",
                                     node_buckets=[16, 32],
                                     feature_batch_size=8)
        g = builder.build_graph(data)
        assert g.x.shape[-1] == 512
        real = np.asarray(g.node_mask)
        feats = np.asarray(g.x)[real]
        assert np.isfinite(feats).all()
        assert np.abs(feats).sum() > 0

    def test_stats_extractor_arch(self):
        """arch='stats' yields deterministic 14-d stain-morphometry node
        features with no encoder weights (weights_loaded True, no random-
        init warning path)."""
        from dgdm_histopath_tpu.models.vit import (
            STAIN_STATS_DIM, PatchFeatureExtractor,
        )
        data = self._slide_data(n_patches=12)
        ex = PatchFeatureExtractor(arch="stats", batch_size=8)
        assert ex.weights_loaded  # weight-free arch is never "random init"
        builder = TissueGraphBuilder(extractor=ex, node_buckets=[16, 32])
        g = builder.build_graph(data)
        assert g.x.shape[-1] == STAIN_STATS_DIM
        feats = np.asarray(g.x)[np.asarray(g.node_mask)]
        assert np.isfinite(feats).all()
        # deterministic: a second extractor gives identical features
        g2 = TissueGraphBuilder(extractor=PatchFeatureExtractor(
            arch="stats", batch_size=8), node_buckets=[16, 32]).build_graph(data)
        np.testing.assert_allclose(np.asarray(g.x), np.asarray(g2.x),
                                   rtol=1e-6)

    def test_per_slide_feature_norm(self):
        """per_slide_feature_norm z-scores features within the slide:
        per-feature median ~0 and std ~1 over real nodes."""
        data = self._slide_data(n_patches=30)
        builder = TissueGraphBuilder(feature_extractor="none",
                                     node_buckets=[32, 64, 128],
                                     per_slide_feature_norm=True)
        g = builder.build_graph(data)
        feats = np.asarray(g.x)[np.asarray(g.node_mask)]
        med = np.median(feats, axis=0)
        assert np.abs(med).max() < 1e-4
        sd = feats.std(axis=0)
        # constant features stay ~0 (eps denominator); varying ones hit 1
        assert ((np.abs(sd - 1.0) < 1e-3) | (sd < 1e-3)).all()

    def test_bucket_subsampling(self):
        data = self._slide_data(n_patches=50)
        builder = TissueGraphBuilder(feature_extractor="none", node_buckets=[16])
        g = builder.build_graph(data)
        assert g.num_nodes == 16
        assert int(g.n_real_nodes) == 16  # subsampled into the bucket

    def test_coarsen(self):
        data = self._slide_data(n_patches=40)
        builder = TissueGraphBuilder(feature_extractor="none", node_buckets=[64])
        g = builder.build_graph(data)
        c = builder.coarsen_graph(g, ratio=0.5)
        assert c.num_nodes == g.num_nodes  # shape preserved
        assert int(c.n_real_nodes) == int(round(int(g.n_real_nodes) * 0.5))

    def test_spatial_sort_and_knn_window(self):
        """knn_window builds graphs whose every edge is addressable by
        banded model compute (in_band_fraction == 1), with Morton-sorted
        nodes and all spatial-kNN degree preserved."""
        from dgdm_histopath_tpu.ops.graph import in_band_fraction
        from dgdm_histopath_tpu.parallel.halo import morton_keys
        data = self._slide_data(n_patches=60)
        w = 16
        banded = TissueGraphBuilder(feature_extractor="none",
                                    node_buckets=[64], spatial_sort=True,
                                    knn_window=w)
        g = banded.build_graph(data)
        assert in_band_fraction(g.nbr_idx, g.nbr_mask, w) == 1.0
        # nodes really are in Morton order
        keys = morton_keys(np.asarray(g.pos), np.asarray(g.node_mask))
        real = np.asarray(g.node_mask)
        assert (np.diff(keys[real]) >= 0).all()
        # spatial kNN degree matches the unconstrained build (band-local
        # spatial neighbors ARE the nearest neighbors)
        free = TissueGraphBuilder(feature_extractor="none",
                                  node_buckets=[64], spatial_sort=True)
        g2 = free.build_graph(data)
        k_sp = banded.k_spatial
        assert (np.asarray(g.nbr_mask)[:, :k_sp].sum()
                == np.asarray(g2.nbr_mask)[:, :k_sp].sum())
        # knn_window without spatial_sort is rejected
        with pytest.raises(ValueError):
            TissueGraphBuilder(feature_extractor="none", knn_window=8)

    def test_empty_slide_raises(self):
        from dgdm_histopath_tpu.utils.exceptions import GraphConstructionError
        from dgdm_histopath_tpu.preprocessing import SlideData
        empty = SlideData("e", "", np.zeros((0, 32, 32, 3), np.uint8), [], {})
        builder = TissueGraphBuilder(feature_extractor="none")
        with pytest.raises(GraphConstructionError):
            builder.build_graph(empty)


class TestHDF5Slide:
    """dgdm_wsi chunked-HDF5 slide format + streaming gigapixel generator
    (VERDICT r1 next-round item #2)."""

    def test_streamed_write_matches_levels(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            write_synthetic_slide_hdf5)
        p = write_synthetic_slide_hdf5(tmp_path / "s.h5", width=2048,
                                       height=1536, num_levels=3, tile=512,
                                       seed=3)
        slide = open_slide(p)
        assert slide.level_count == 3
        assert slide.level_dimensions[0] == (2048, 1536)
        assert slide.level_dimensions[1] == (1024, 768)
        assert slide.level_downsamples[2] == pytest.approx(4.0)
        assert slide.properties["openslide.objective-power"] == "20.0"
        # read_region level-0 coords map into downsampled levels
        r0 = slide.read_region((512, 512), 0, (64, 64))
        r1 = slide.read_region((512, 512), 1, (32, 32))
        assert r0.shape == (64, 64, 3) and r1.shape == (32, 32, 3)
        # level-1 is the box mean of level-0 (tolerance: uint8 rounding)
        box = r0.astype(np.float32).reshape(32, 2, 32, 2, 3).mean(axis=(1, 3))
        assert np.abs(box - r1.astype(np.float32)).mean() < 2.0
        # out-of-bounds reads pad white like the other backends
        edge = slide.read_region((2048 - 16, 0), 0, (64, 64))
        assert (edge[:, 32:] == 255).all()
        slide.close()

    def test_tilewise_deterministic_tissue(self, tmp_path):
        """Tile rendering is analytic: the same seed yields identical tissue
        geometry regardless of tile size (no tile-boundary artifacts in the
        blob field)."""
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            write_synthetic_slide_hdf5)
        a = write_synthetic_slide_hdf5(tmp_path / "a.h5", 1024, 1024,
                                       num_levels=2, tile=256, seed=7,
                                       nuclei_density=0.0)
        b = write_synthetic_slide_hdf5(tmp_path / "b.h5", 1024, 1024,
                                       num_levels=2, tile=1024, seed=7,
                                       nuclei_density=0.0)
        sa, sb = open_slide(a), open_slide(b)
        ra = sa.read_region((100, 100), 0, (256, 256)).astype(np.int16)
        rb = sb.read_region((100, 100), 0, (256, 256)).astype(np.int16)
        # identical up to the per-tile noise fields (std 3.0 each)
        assert np.abs(ra - rb).mean() < 8.0
        sa.close(); sb.close()

    def test_full_pipeline_on_hdf5_slide(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            write_synthetic_slide_hdf5)
        p = write_synthetic_slide_hdf5(tmp_path / "s.h5", 2048, 2048,
                                       num_levels=3, tile=1024, seed=11)
        proc = SlideProcessor(patch_size=64, magnifications=[5.0],
                              tissue_threshold=0.3, max_patches=40,
                              stain_normalize=False)
        data = proc.process_slide(p)
        assert data.num_patches > 0
        assert data.patches.shape[1:] == (64, 64, 3)

    def test_read_regions_banded_matches_per_patch(self, tmp_path):
        """HDF5 banded batch reads == per-patch read_region (incl. edges)."""
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            write_synthetic_slide_hdf5)
        p = write_synthetic_slide_hdf5(tmp_path / "s.h5", 1536, 1024,
                                       num_levels=2, tile=512, seed=13)
        slide = open_slide(p)
        locs = [(0, 0), (256, 0), (1280, 0), (512, 512), (768, 512),
                (1400, 900),          # clipped bottom-right corner
                (100, 100)]           # unaligned
        batch = slide.read_regions(locs, 0, (256, 256))
        for i, loc in enumerate(locs):
            single = slide.read_region(loc, 0, (256, 256))
            np.testing.assert_array_equal(batch[i], single)
        # level-1 too
        batch1 = slide.read_regions(locs[:3], 1, (64, 64))
        for i, loc in enumerate(locs[:3]):
            np.testing.assert_array_equal(batch1[i],
                                          slide.read_region(loc, 1, (64, 64)))
        slide.close()

    def test_extract_patch_batch_matches_loop(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            write_synthetic_slide_hdf5)
        p = write_synthetic_slide_hdf5(tmp_path / "s.h5", 1024, 1024,
                                       num_levels=3, tile=512, seed=17)
        proc = SlideProcessor(patch_size=64, magnifications=[5.0],
                              tissue_threshold=0.2, max_patches=20,
                              stain_normalize=False)
        slide = open_slide(p)
        mask, ds = proc.detect_tissue_regions(slide)
        infos = proc.generate_patch_coordinates(slide, mask, ds)[:12]
        batch = proc.extract_patch_batch(slide, infos)
        loop = np.stack([proc.extract_patch(slide, i) for i in infos])
        np.testing.assert_array_equal(batch, loop)
        slide.close()


class TestHardTaskGenerator:
    """Calibrated hard stand-in task components (VERDICT r3 #1):
    focal-lesion rendering + the shared parameter sampler."""

    def test_focal_region_densifies_nuclei(self):
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            generate_tissue_image,
        )
        # strong focus so the count contrast is unambiguous
        img, _ = generate_tissue_image(
            512, 512, seed=3, nuclei_density=0.001, focal_density=0.02,
            focal_frac=0.15, noise_sigma=0.0)
        base, _ = generate_tissue_image(
            512, 512, seed=3, nuclei_density=0.001, noise_sigma=0.0)
        def nuclei_px(im):
            f = im.astype(np.float32)
            return int(((f[..., 2] > f[..., 0] + 10)
                        & (f.mean(-1) < 180)).sum())
        assert nuclei_px(img) > 2.0 * nuclei_px(base)

    def test_sampler_deterministic_and_contrast_ordering(self):
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            HARD_TASK_DEFAULTS, sample_hard_slide_params,
        )
        a = sample_hard_slide_params(np.random.RandomState(7), True, seed=1)
        b = sample_hard_slide_params(np.random.RandomState(7), True, seed=1)
        assert a == b
        lo, hi = HARD_TASK_DEFAULTS["base_density"]
        tum = [sample_hard_slide_params(np.random.RandomState(i), True)
               for i in range(40)]
        nrm = [sample_hard_slide_params(np.random.RandomState(i), False)
               for i in range(40)]
        for p in tum + nrm:
            assert lo <= p["nuclei_density"] <= hi
        # lesion contrast strictly separates from mimic contrast per-slide
        t_lo = min(p["focal_density"] / p["nuclei_density"] for p in tum)
        n_hi = max(p["focal_density"] / p["nuclei_density"] for p in nrm)
        assert t_lo >= HARD_TASK_DEFAULTS["lesion_contrast"][0] - 1e-9
        assert n_hi <= HARD_TASK_DEFAULTS["mimic_contrast"][1] + 1e-9

    def test_probe_oracle_scores_rank_obvious_pair(self):
        from benchmarks.probe_hard_task import oracle_slide_score
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            generate_tissue_image,
        )
        lesion, _ = generate_tissue_image(
            512, 512, seed=11, nuclei_density=0.004, focal_density=0.016,
            focal_frac=0.12, stain_jitter=0.1, brightness_jitter=0.05)
        flat, _ = generate_tissue_image(
            512, 512, seed=11, nuclei_density=0.004, stain_jitter=0.1,
            brightness_jitter=0.05)
        assert (oracle_slide_score(lesion, patch=64)
                > oracle_slide_score(flat, patch=64))
