"""Golden tests for the native tiled/pyramidal TIFF reader/writer
(preprocessing/tiff.py) against numpy ground truth, plus the slide_io
backend integration (VERDICT r2 #7: real-format decode without OpenSlide)."""

import numpy as np
import pytest

from dgdm_histopath_tpu.preprocessing.tiff import (
    TiledTiffReader, _lzw_decode, _lzw_encode, parse_aperio_properties,
    write_tiled_tiff,
)


def _pyramid(seed=0, w=700, h=500, levels=3):
    rs = np.random.RandomState(seed)
    base = rs.randint(0, 255, (h, w, 3), np.uint8)
    out = [base]
    for _ in range(levels - 1):
        out.append(out[-1][::2, ::2])
    return out


class TestLZW:
    def test_roundtrip_random(self):
        rs = np.random.RandomState(0)
        data = rs.randint(0, 255, 10000, np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data)) == data

    def test_roundtrip_repetitive(self):
        data = b"abcabcabc" * 2000 + b"\x00" * 5000
        assert _lzw_decode(_lzw_encode(data)) == data

    def test_roundtrip_long_forces_width_growth(self):
        # >4k distinct phrases forces 9->12 bit codes and a table reset
        rs = np.random.RandomState(1)
        data = rs.randint(0, 255, 40000, np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data)) == data


class TestTiffRoundtrip:
    @pytest.mark.parametrize("compression", ["raw", "deflate", "lzw"])
    @pytest.mark.parametrize("bigtiff", [False, True])
    def test_lossless_pyramid_roundtrip(self, tmp_path, compression, bigtiff):
        # the pure-python LZW codec runs ~85 KB/s — keep its fixture to a
        # couple of 128px tiles (boundary still crossed) or this runs minutes
        if compression == "lzw":
            levels = _pyramid(w=160, h=120, levels=2)
            tile = 128
        else:
            levels = _pyramid()
            tile = 256
        p = write_tiled_tiff(tmp_path / "t.tiff", levels, tile=tile,
                             compression=compression, bigtiff=bigtiff)
        r = TiledTiffReader(p)
        assert r.level_dimensions == [(lvl.shape[1], lvl.shape[0])
                                      for lvl in levels]
        for li, lvl in enumerate(levels):
            full = r.read_region_level(li, 0, 0, lvl.shape[1], lvl.shape[0])
            np.testing.assert_array_equal(full, lvl)
        r.close()

    def test_windowed_reads_cross_tile_boundaries(self, tmp_path):
        levels = _pyramid(seed=3)
        p = write_tiled_tiff(tmp_path / "t.tiff", levels, tile=256,
                             compression="deflate")
        r = TiledTiffReader(p)
        base = levels[0]
        for (x0, y0, w, h) in [(250, 250, 100, 100), (0, 0, 33, 700),
                               (511, 1, 200, 499), (300, 400, 512, 512)]:
            win = r.read_region_level(0, x0, y0, w, h)
            expect = np.full((h, w, 3), 255, np.uint8)
            y1 = min(y0 + h, base.shape[0]); x1 = min(x0 + w, base.shape[1])
            expect[:y1 - y0, :x1 - x0] = base[y0:y1, x0:x1]
            np.testing.assert_array_equal(win, expect)
        r.close()

    def test_out_of_bounds_is_white_padded(self, tmp_path):
        levels = _pyramid(seed=4, w=300, h=200, levels=1)
        p = write_tiled_tiff(tmp_path / "t.tiff", levels)
        r = TiledTiffReader(p)
        win = r.read_region_level(0, 250, 150, 100, 100)
        assert (win[60:, :, :] == 255).all()
        assert (win[:, 60:, :] == 255).all()
        np.testing.assert_array_equal(win[:50, :50], levels[0][150:, 250:])
        r.close()

    def test_jpeg_tiles_decode_approximately(self, tmp_path):
        # smooth gradient image: JPEG roundtrip should be close
        h, w = 300, 400
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(xx * 255 // w), (yy * 255 // h),
                        np.full((h, w), 128)], -1).astype(np.uint8)
        p = write_tiled_tiff(tmp_path / "t.tiff", [img], tile=256,
                             compression="jpeg", jpeg_quality=95)
        r = TiledTiffReader(p)
        out = r.read_region_level(0, 0, 0, w, h)
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 4.0, f"mean abs JPEG error {err}"
        r.close()

    def test_aspect_mismatched_pages_excluded(self, tmp_path):
        # svs-like layout: pyramid + a "label" page with a different aspect
        levels = _pyramid(seed=5, w=640, h=480, levels=2)
        label = np.zeros((90, 600, 3), np.uint8)
        p = write_tiled_tiff(tmp_path / "t.svs", [levels[0], label, levels[1]],
                             tile=256)
        r = TiledTiffReader(p)
        assert r.level_dimensions == [(640, 480), (320, 240)]
        r.close()


class TestStreamingWriter:
    """StreamingTiledTiffWriter: O(band) gigapixel fixture path (the JPEG
    .svs container for the e2e benchmark, VERDICT r3 #6)."""

    def test_streamed_equals_inmemory_raw(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.tiff import (
            StreamingTiledTiffWriter,
        )
        levels = _pyramid(w=512, h=384, levels=2)
        p_mem = write_tiled_tiff(tmp_path / "mem.tiff", levels, tile=256,
                                 compression="raw", bigtiff=True)
        wr = StreamingTiledTiffWriter(
            tmp_path / "stream.tiff",
            [(lvl.shape[0], lvl.shape[1]) for lvl in levels],
            tile=256, compression="raw", bigtiff=True)
        for li, lvl in enumerate(levels):
            for ty in range(0, lvl.shape[0], 256):
                for tx in range(0, lvl.shape[1], 256):
                    wr.write_tile(li, lvl[ty:ty + 256, tx:tx + 256])
        p_str = wr.close()
        ra, rb = TiledTiffReader(p_mem), TiledTiffReader(p_str)
        assert ra.level_dimensions == rb.level_dimensions
        for li, lvl in enumerate(levels):
            a = ra.read_region_level(li, 0, 0, lvl.shape[1], lvl.shape[0])
            b = rb.read_region_level(li, 0, 0, lvl.shape[1], lvl.shape[0])
            np.testing.assert_array_equal(a, b)
        ra.close(), rb.close()

    def test_missing_tiles_rejected(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.tiff import (
            StreamingTiledTiffWriter, TiffFormatError,
        )
        wr = StreamingTiledTiffWriter(tmp_path / "bad.tiff", [(512, 512)],
                                      tile=256)
        wr.write_tile(0, np.zeros((256, 256, 3), np.uint8))
        with pytest.raises(TiffFormatError):
            wr.close()

    def test_synthetic_jpeg_svs_fixture(self, tmp_path):
        """Device-free render -> JPEG .svs -> native reader -> PSNR vs the
        exact numpy ground truth of the same band render."""
        from dgdm_histopath_tpu.preprocessing.slide_io import open_slide
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            _make_blobs, _render_band_numpy, write_synthetic_slide_tiff,
        )
        p = write_synthetic_slide_tiff(
            tmp_path / "fix.svs", width=1024, height=1024, num_levels=3,
            band=256, seed=5, nuclei_density=2e-3, num_blobs=6,
            device="numpy")
        b = open_slide(p)
        assert type(b).__name__ == "TiledTiffBackend"
        assert b.level_dimensions == [(1024, 1024), (512, 512), (256, 256)]
        assert b.properties["openslide.objective-power"] == "20"
        got = np.asarray(b.read_region((0, 0), 0, (1024, 256)),
                         np.float32)
        rs = np.random.RandomState(5)
        blobs = _make_blobs(rs, 1024, 1024, 6)
        coarse = rs.rand(1024 // 32 + 2, 1024 // 32 + 2).astype(np.float32)
        truth = _render_band_numpy(0, 256, 1024, 1, blobs, coarse, 2e-3,
                                   5)[0].astype(np.float32)
        mse = float(np.mean((got - truth) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 30.0, psnr  # JPEG q85: lossy but faithful
        b.close()


class TestAperioProperties:
    def test_parse(self):
        desc = ("Aperio Image Library v10.0.50\r\n20000x15000 [0,0] "
                "|AppMag = 40|MPP = 0.2520|Filename = x")
        props = parse_aperio_properties(desc)
        assert props["openslide.objective-power"] == "40"
        assert props["openslide.mpp-x"] == "0.2520"
        assert props["aperio.Filename"] == "x"

    def test_description_roundtrips_through_writer(self, tmp_path):
        desc = "Aperio Image Library\r\nfoo |AppMag = 20|MPP = 0.5"
        p = write_tiled_tiff(tmp_path / "t.svs", _pyramid(levels=1),
                             description=desc)
        r = TiledTiffReader(p)
        assert r.properties["openslide.objective-power"] == "20"
        r.close()


class TestSlideIOIntegration:
    def test_open_slide_serves_tiled_svs(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.slide_io import (
            TiledTiffBackend, open_slide,
        )
        levels = _pyramid(seed=6, w=512, h=512, levels=2)
        p = write_tiled_tiff(
            tmp_path / "slide.svs", levels, tile=256, compression="deflate",
            description="Aperio Image Library\r\nx |AppMag = 20|")
        backend = open_slide(p)
        assert isinstance(backend, TiledTiffBackend)
        assert backend.level_count == 2
        assert backend.properties["openslide.objective-power"] == "20"
        # read_region takes LEVEL-0 coords at any level (OpenSlide semantics)
        region = backend.read_region((100, 100), 1, (64, 64))
        np.testing.assert_array_equal(region, levels[1][50:114, 50:114])
        clone = backend.clone()
        np.testing.assert_array_equal(
            clone.read_region((0, 0), 0, (64, 64)), levels[0][:64, :64])
        clone.close()
        backend.close()

    def test_pil_written_synthetic_tiff_still_opens(self, tmp_path):
        from dgdm_histopath_tpu.preprocessing.slide_io import open_slide
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            write_synthetic_tiff,
        )
        p = write_synthetic_tiff(tmp_path / "s.tiff", width=512, height=512,
                                 num_levels=2, seed=0)
        backend = open_slide(p)
        assert backend.level_count == 2
        region = backend.read_region((0, 0), 0, (128, 128))
        assert region.shape == (128, 128, 3)
        backend.close()

    def test_full_slide_pipeline_on_tiled_svs(self, tmp_path):
        """End to end: tiled .svs -> SlideProcessor -> graph (the exact path
        real CAMELYON16 slides take without OpenSlide)."""
        from dgdm_histopath_tpu.preprocessing import (
            SlideProcessor, TissueGraphBuilder,
        )
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            build_pyramid, generate_tissue_image,
        )
        img, _ = generate_tissue_image(768, 768, seed=7)
        p = write_tiled_tiff(
            tmp_path / "t.svs", build_pyramid(img, 2), tile=256,
            compression="deflate",
            description="Aperio Image Library\r\nx |AppMag = 20|")
        proc = SlideProcessor(patch_size=128, max_patches=64,
                              tissue_threshold=0.3)
        data = proc.process_slide(str(p))
        assert data.num_patches > 0
        builder = TissueGraphBuilder(feature_extractor="none",
                                     node_buckets=(128,))
        g = builder.build_graph(data, bucket=128)
        assert g.x.shape[0] == 128
        assert bool(g.node_mask.sum()) and int(g.node_mask.sum()) <= 64
