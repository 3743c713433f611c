"""Native direct-chunk HDF5 reader (native/dgdm_io.cpp) vs the h5py path.

The native reader must be byte-identical to h5py slicing for every
compression the dgdm_wsi writer emits (raw / gzip / lzf), including
out-of-bounds and chunk-straddling windows — it replaces the h5py read
machinery on the e2e decode hot path, so any divergence is silent data
corruption in the pipeline.
"""

import numpy as np
import pytest

import dgdm_histopath_tpu.native as native
from dgdm_histopath_tpu.preprocessing.slide_io import (
    HDF5SlideBackend, open_slide, write_hdf5_slide,
)


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable (no g++?)")


def _pyramid(rng, w0=1537, h0=1211, levels=3):
    lvls = []
    w, h = w0, h0
    for _ in range(levels):
        lvls.append(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        w, h = max(1, w // 4), max(1, h // 4)
    return lvls


@pytest.fixture(scope="module", params=[None, "gzip", "lzf"])
def slide_path(request, tmp_path_factory):
    rng = np.random.default_rng(7)
    path = tmp_path_factory.mktemp("nio") / f"s_{request.param}.h5"
    write_hdf5_slide(path, _pyramid(rng), properties={"objective-power": "40"},
                     tile=256, compression=request.param)
    return path


def _h5py_read(path, level, y0, x0, h, w):
    import h5py
    with h5py.File(path, "r") as f:
        arr = f[f"level_{level}"]
        out = np.full((h, w, 3), 255, np.uint8)
        y1, x1 = min(y0 + h, arr.shape[0]), min(x0 + w, arr.shape[1])
        ys, xs = max(y0, 0), max(x0, 0)
        if y1 > ys and x1 > xs:
            out[ys - y0:y1 - y0, xs - x0:x1 - x0] = arr[ys:y1, xs:x1]
        return out


class TestNativeReader:
    def test_interior_and_chunk_straddling(self, slide_path):
        b = HDF5SlideBackend(slide_path)
        assert b._native_ok, "native path should be active"
        for (y0, x0) in [(0, 0), (100, 100), (255, 255), (256, 256),
                         (250, 700), (511, 1), (1000, 1400)]:
            got = b.read_region((x0, y0), 0, (128, 96))   # (w=128, h=96)
            want = _h5py_read(slide_path, 0, y0, x0, 96, 128)
            np.testing.assert_array_equal(got, want)
        b.close()

    def test_out_of_bounds_fill(self, slide_path):
        b = HDF5SlideBackend(slide_path)
        got = b.read_region((-50, -30), 0, (100, 100))
        want = _h5py_read(slide_path, 0, -30, -50, 100, 100)
        np.testing.assert_array_equal(got, want)
        # fully outside: all fill
        got = b.read_region((10**6, 10**6), 0, (64, 64))
        assert (got == 255).all()
        # straddling the bottom-right corner
        w0, h0 = b.level_dimensions[0]
        got = b.read_region((w0 - 40, h0 - 20), 0, (64, 64))
        want = _h5py_read(slide_path, 0, h0 - 20, w0 - 40, 64, 64)
        np.testing.assert_array_equal(got, want)
        b.close()

    def test_batched_matches_h5py_fallback(self, slide_path, monkeypatch):
        rng = np.random.default_rng(3)
        locs = [(int(x), int(y)) for x, y in
                zip(rng.integers(-64, 1600, 40), rng.integers(-64, 1300, 40))]
        b = HDF5SlideBackend(slide_path)
        got = b.read_regions(locs, 0, (128, 128))
        b.close()
        monkeypatch.setenv("DGDM_NATIVE_IO", "0")
        b2 = HDF5SlideBackend(slide_path)
        assert not b2._native_ok
        want = b2.read_regions(locs, 0, (128, 128))
        b2.close()
        np.testing.assert_array_equal(got, want)

    def test_higher_levels_and_level0_coords(self, slide_path):
        b = HDF5SlideBackend(slide_path)
        ds = b.level_downsamples[1]
        got = b.read_region((512, 256), 1, (96, 96))
        want = _h5py_read(slide_path, 1, int(256 / ds), int(512 / ds), 96, 96)
        np.testing.assert_array_equal(got, want)
        b.close()

    def test_thumbnail_through_native(self, slide_path):
        b = open_slide(slide_path)
        thumb = b.get_thumbnail(max_size=128)
        assert thumb.ndim == 3 and thumb.shape[2] == 3
        assert thumb.std() > 0       # actual pixel content, not fill
        b.close()


class TestChunkIndexEligibility:
    def test_non_uint8_rejected(self, tmp_path):
        import h5py
        p = tmp_path / "f32.h5"
        with h5py.File(p, "w") as f:
            d = f.create_dataset("d", data=np.zeros((64, 64, 3), np.float32),
                                 chunks=(32, 32, 3))
        with h5py.File(p, "r") as f:
            assert native.ChunkIndex.from_dataset(f["d"]) is None

    def test_shuffle_rejected(self, tmp_path):
        import h5py
        p = tmp_path / "shuf.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=np.zeros((64, 64, 3), np.uint8),
                             chunks=(32, 32, 3), compression="gzip",
                             shuffle=True)
        with h5py.File(p, "r") as f:
            assert native.ChunkIndex.from_dataset(f["d"]) is None

    def test_contiguous_rejected(self, tmp_path):
        import h5py
        p = tmp_path / "cont.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=np.zeros((64, 64, 3), np.uint8))
        with h5py.File(p, "r") as f:
            assert native.ChunkIndex.from_dataset(f["d"]) is None

    def test_unallocated_chunks_read_fill_zero(self, tmp_path):
        import h5py
        p = tmp_path / "sparse.h5"
        with h5py.File(p, "w") as f:
            d = f.create_dataset("d", shape=(512, 512, 3), dtype=np.uint8,
                                 chunks=(256, 256, 3))
            d[:256, :256] = 7        # only one of four chunks allocated
        with h5py.File(p, "r") as f:
            idx = native.ChunkIndex.from_dataset(f["d"])
            assert idx is not None
            got = idx.read_patches(str(p), [200, 300], [200, 300], 128, 128)
        assert (got[0][:56, :56] == 7).all()      # allocated region
        assert (got[0][56:, 56:] == 0).all()      # HDF5 default fill
        assert (got[1] == 0).all()                # fully unallocated chunk


class TestAdvisePatches:
    """dgdm_advise_patches: advisory readahead must never disturb reads."""

    def test_advise_then_read_matches(self, slide_path):
        b = HDF5SlideBackend(slide_path)
        assert b._native_ok
        locs = [(0, 0), (300, 200), (1400, 1000), (-20, -20), (10**6, 10**6)]
        # advise the batch, then read it: results identical to h5py truth
        b.advise_regions(locs, 0, (128, 96))
        got = b.read_regions(locs, 0, (128, 96))
        for g, (x0, y0) in zip(got, locs):
            np.testing.assert_array_equal(
                g, _h5py_read(slide_path, 0, y0, x0, 96, 128))
        b.close()

    def test_advise_empty_and_base_noop(self, slide_path):
        from dgdm_histopath_tpu.preprocessing.slide_io import ArrayBackend
        b = HDF5SlideBackend(slide_path)
        b.advise_regions([], 0, (64, 64))          # no-op, no error
        b.close()
        ab = ArrayBackend([np.zeros((64, 64, 3), np.uint8)])
        ab.advise_regions([(0, 0)], 0, (32, 32))   # base-class no-op

    def test_processor_advise_groups_like_extract(self, slide_path):
        """advise_patch_batch must accept the same PatchInfo stream the
        extractor sees (multiple levels/mags) and never raise."""
        from dgdm_histopath_tpu.preprocessing.slide_processor import (
            PatchInfo, SlideProcessor)
        proc = SlideProcessor(patch_size=96, stain_normalize=False)
        b = HDF5SlideBackend(slide_path)
        infos = [PatchInfo(0, 0, 0, 40.0, 96, 1.0),
                 PatchInfo(256, 256, 0, 20.0, 96, 1.0),
                 PatchInfo(64, 64, 1, 10.0, 96, 1.0)]
        proc.advise_patch_batch(b, infos)
        out = proc.extract_patch_batch(b, infos)
        assert out.shape == (3, 96, 96, 3)
        b.close()


class TestCorruptChunks:
    """Malformed compressed chunk bytes must surface as a clean Python
    error (ERR_DECOMP via RuntimeError) — never a crash — and the backend
    must fall back to the h5py path for the rest of the handle's life."""

    @pytest.mark.parametrize("comp", ["gzip", "lzf"])
    def test_corrupt_chunk_raises_not_crashes(self, tmp_path, comp):
        import h5py
        path = tmp_path / f"corrupt_{comp}.h5"
        # compressible content: incompressible random data makes the h5py
        # LZF filter store chunks unfiltered (filter_mask bit 0), where
        # corruption is raw pixels by design, not a decode error
        level = np.full((800, 700, 3), 7, np.uint8)
        write_hdf5_slide(path, [level],
                         properties={}, tile=256, compression=comp)
        # overwrite the first chunk's stored bytes with garbage in place
        with h5py.File(path, "r") as f:
            ds = f["level_0"]
            info = ds.id.get_chunk_info(0)
            off, size = info.byte_offset, info.size
        with open(path, "r+b") as f:
            f.seek(off)
            f.write(bytes([0xFF] * min(size, 64)))
        idx = native.ChunkIndex.from_dataset_path(path, "level_0") \
            if hasattr(native.ChunkIndex, "from_dataset_path") else None
        if idx is None:
            with h5py.File(path, "r") as f:
                idx = native.ChunkIndex.from_dataset(f["level_0"])
        with pytest.raises(RuntimeError):
            idx.read_patches(path, [0], [0], 64, 64)
        # backend-level read falls back to h5py, which raises its own
        # (clean) error for the corrupted chunk — the process survives
        b = HDF5SlideBackend(path)
        try:
            b.read_region((0, 0), 0, (64, 64))
        except Exception:
            pass  # either error type is fine; surviving the read is the test


class TestDecodedChunkCache:
    """Cross-batch decoded-chunk cache (ABI v3): compressed datasets keep
    the last ~128 MB of decoded chunks so consecutive patch batches that
    re-touch a chunk column skip pread+inflate entirely. Correctness must
    hold through hits, misses, and eviction."""

    def _gradient_slide(self, tmp_path, comp):
        lvl = np.add.outer(np.arange(1200) % 251,
                           np.arange(1100) % 241)[..., None]
        lvl = np.repeat(lvl.astype(np.uint8), 3, axis=2)
        path = tmp_path / f"grad_{comp}.h5"
        write_hdf5_slide(path, [lvl], properties={}, tile=256,
                         compression=comp)
        return path, lvl

    def test_repeat_read_hits_and_matches(self, tmp_path):
        import h5py
        path, lvl = self._gradient_slide(tmp_path, "gzip")
        with h5py.File(path) as f:
            idx = native.ChunkIndex.from_dataset(f["level_0"])
        ys, xs = [0, 300, 600], [0, 200, 400]
        a = idx.read_patches(path, ys, xs, 256, 256)
        h0, m0, b0 = idx.cache_stats()
        assert h0 == 0 and m0 > 0 and b0 > 0
        b = idx.read_patches(path, ys, xs, 256, 256)
        h1, m1, _ = idx.cache_stats()
        assert h1 == m0 and m1 == m0        # identical call: all hits
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(
            a[0], lvl[0:256, 0:256])

    def test_eviction_under_tiny_budget_stays_correct(self, tmp_path,
                                                      monkeypatch):
        import h5py
        monkeypatch.setattr(native.ChunkIndex, "CACHE_MB_DEFAULT", 1)
        path, lvl = self._gradient_slide(tmp_path, "lzf")
        with h5py.File(path) as f:
            idx = native.ChunkIndex.from_dataset(f["level_0"])
        # 1 MB holds ~5 of the 20 chunks -> every sweep evicts
        ys = [y for y in range(0, 1200, 256) for _ in range(0, 1100, 256)]
        xs = [x for _ in range(0, 1200, 256) for x in range(0, 1100, 256)]
        for _ in range(3):
            got = idx.read_patches(path, ys, xs, 256, 256)
        _, _, resident = idx.cache_stats()
        assert resident <= 1 << 20
        for (y, x), patch in zip(zip(ys, xs), got):
            h = min(256, 1200 - y)
            w = min(256, 1100 - x)
            np.testing.assert_array_equal(patch[:h, :w],
                                          lvl[y:y + h, x:x + w])
            assert (patch[h:] == 255).all() and (patch[:, w:] == 255).all()

    def test_raw_datasets_do_not_cache(self, tmp_path):
        import h5py
        path, _ = self._gradient_slide(tmp_path, None)
        with h5py.File(path) as f:
            idx = native.ChunkIndex.from_dataset(f["level_0"])
        idx.read_patches(path, [0], [0], 256, 256)
        assert idx.cache_stats() == (0, 0, 0)
