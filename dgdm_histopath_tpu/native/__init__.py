"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the IO path around it is native where
it pays: ``dgdm_io.cpp`` reads dgdm_wsi chunked-HDF5 slides by pread(2)
directly from the HDF5 chunk index, bypassing the h5py/HDF5 per-read
machinery that an A/B study showed to be the decode floor (docs/ROADMAP.md
round-2 decode-format study). The shared library is compiled on demand with
the system g++ (no pybind11 / no pip installs) and cached next to the
source; every entry point falls back to the pure-h5py path when the
toolchain or the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "dgdm_io.cpp"
_LIB = _HERE / "build" / "libdgdm_io.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

#: compression codes understood by the native reader (must match dgdm_io.cpp)
COMP_RAW, COMP_GZIP, COMP_LZF = 0, 1, 2

_ERRORS = {-1: "open failed", -2: "pread failed", -3: "chunk decompression failed",
           -4: "bad arguments"}


def _build() -> bool:
    """Compile the shared library if missing or stale. Returns success."""
    try:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
        _LIB.parent.mkdir(parents=True, exist_ok=True)
        tmp = _LIB.with_suffix(".so.tmp")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               str(_SRC), "-o", str(tmp), "-lz", "-pthread"]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            return False
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (missing toolchain, failed build, or DGDM_NATIVE_IO=0)."""
    global _lib, _load_failed
    if os.environ.get("DGDM_NATIVE_IO", "1") == "0":
        return None
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            if lib.dgdm_io_version() != 3:
                raise OSError("ABI version mismatch")
            lib.dgdm_read_patches.restype = ctypes.c_int
            lib.dgdm_read_patches.argtypes = [
                ctypes.c_char_p,                      # path
                ctypes.c_int64, ctypes.c_int64,       # lvl_h, lvl_w
                ctypes.c_int64, ctypes.c_int64,       # ch, cw
                ctypes.POINTER(ctypes.c_uint64),      # chunk_off
                ctypes.POINTER(ctypes.c_uint64),      # chunk_nbytes
                ctypes.POINTER(ctypes.c_uint32),      # filter_mask
                ctypes.c_int,                         # comp
                ctypes.c_int64,                       # n
                ctypes.POINTER(ctypes.c_int64),       # ys
                ctypes.POINTER(ctypes.c_int64),       # xs
                ctypes.c_int64, ctypes.c_int64,       # ph, pw
                ctypes.POINTER(ctypes.c_uint8),       # out
                ctypes.c_int, ctypes.c_int,           # nthreads, do_readahead
            ]
            lib.dgdm_read_patches_cached.restype = ctypes.c_int
            lib.dgdm_read_patches_cached.argtypes = (
                lib.dgdm_read_patches.argtypes + [ctypes.c_void_p])
            lib.dgdm_cache_new.restype = ctypes.c_void_p
            lib.dgdm_cache_new.argtypes = [ctypes.c_int64]
            lib.dgdm_cache_free.restype = None
            lib.dgdm_cache_free.argtypes = [ctypes.c_void_p]
            lib.dgdm_cache_stats.restype = None
            lib.dgdm_cache_stats.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            lib.dgdm_advise_patches.restype = ctypes.c_int
            lib.dgdm_advise_patches.argtypes = [
                ctypes.c_char_p,                      # path
                ctypes.c_int64, ctypes.c_int64,       # lvl_h, lvl_w
                ctypes.c_int64, ctypes.c_int64,       # ch, cw
                ctypes.POINTER(ctypes.c_uint64),      # chunk_off
                ctypes.POINTER(ctypes.c_uint64),      # chunk_nbytes
                ctypes.c_int64,                       # n
                ctypes.POINTER(ctypes.c_int64),       # ys
                ctypes.POINTER(ctypes.c_int64),       # xs
                ctypes.c_int64, ctypes.c_int64,       # ph, pw
            ]
            _lib = lib
        except OSError:
            _load_failed = True
            return None
        return _lib


class ChunkIndex:
    """Chunk-address index for one chunked [H, W, 3] uint8 HDF5 dataset,
    enumerated once via h5py and handed to the native reader thereafter.

    ``None`` compression and gzip/lzf are supported; anything else (shuffle,
    fletcher32, scaleoffset — none of which the dgdm_wsi writer emits)
    makes the dataset ineligible and the caller falls back to h5py.
    """

    __slots__ = ("lvl_h", "lvl_w", "ch", "cw", "comp",
                 "offsets", "nbytes", "fmask", "_cache")

    #: decoded-chunk cache budget for COMPRESSED datasets (consecutive
    #: patch batches re-touch ~24% of their chunk columns; FIFO of the
    #: previous batch recovers all of it). 0 disables. Raw datasets never
    #: cache: a hit would only replace a page-cache pread with a memcpy.
    CACHE_MB_DEFAULT = int(os.environ.get("DGDM_CHUNK_CACHE_MB", "128"))

    def __init__(self, lvl_h, lvl_w, ch, cw, comp, offsets, nbytes, fmask):
        self.lvl_h, self.lvl_w = lvl_h, lvl_w
        self.ch, self.cw = ch, cw
        self.comp = comp
        self.offsets, self.nbytes, self.fmask = offsets, nbytes, fmask
        self._cache = None

    def _cache_handle(self):
        """Lazy native cache handle (compressed datasets only)."""
        if self._cache is None:
            lib = get_lib()
            mb = self.CACHE_MB_DEFAULT
            if lib is None or self.comp == COMP_RAW or mb <= 0:
                self._cache = 0                      # sentinel: disabled
            else:
                self._cache = lib.dgdm_cache_new(mb << 20) or 0
        return self._cache or None

    def cache_stats(self):
        """(hits, misses, resident_bytes) of the decoded-chunk cache."""
        lib = get_lib()
        if lib is None or not self._cache:
            return (0, 0, 0)
        h = ctypes.c_int64()
        m = ctypes.c_int64()
        b = ctypes.c_int64()
        lib.dgdm_cache_stats(self._cache, ctypes.byref(h), ctypes.byref(m),
                             ctypes.byref(b))
        return (h.value, m.value, b.value)

    def __del__(self):
        cache = getattr(self, "_cache", None)
        if cache:
            lib = _lib                     # don't (re)build during teardown
            if lib is not None:
                try:
                    lib.dgdm_cache_free(cache)
                except Exception:
                    pass

    @classmethod
    def from_dataset(cls, dset) -> Optional["ChunkIndex"]:
        if dset.chunks is None or dset.dtype != np.uint8 or dset.ndim != 3:
            return None
        ch, cw, cc = dset.chunks
        if cc != dset.shape[2] or dset.shape[2] != 3:
            return None
        comp = {None: COMP_RAW, "gzip": COMP_GZIP, "lzf": COMP_LZF}.get(
            dset.compression)
        if comp is None or dset.shuffle or dset.fletcher32 or dset.scaleoffset:
            return None
        lvl_h, lvl_w = int(dset.shape[0]), int(dset.shape[1])
        grid_rows = -(-lvl_h // ch)
        grid_cols = -(-lvl_w // cw)
        offsets = np.zeros(grid_rows * grid_cols, np.uint64)
        nbytes = np.zeros(grid_rows * grid_cols, np.uint64)
        fmask = np.zeros(grid_rows * grid_cols, np.uint32)

        def record(info):
            cid = (info.chunk_offset[0] // ch) * grid_cols \
                + info.chunk_offset[1] // cw
            offsets[cid] = info.byte_offset
            nbytes[cid] = info.size
            fmask[cid] = info.filter_mask

        try:
            if hasattr(dset.id, "chunk_iter"):      # h5py >= 3.8: one C pass
                dset.id.chunk_iter(record)
            else:
                for i in range(dset.id.get_num_chunks()):
                    record(dset.id.get_chunk_info(i))
        except Exception:
            return None
        return cls(lvl_h, lvl_w, int(ch), int(cw), comp, offsets, nbytes, fmask)

    def read_patches(self, path: str, ys, xs, ph: int, pw: int,
                     out: Optional[np.ndarray] = None, fill: int = 255,
                     nthreads: Optional[int] = None,
                     readahead: bool = True) -> np.ndarray:
        """Read len(ys) patches of [ph, pw, 3] at level coords (may be
        out of bounds; such pixels keep ``fill``)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        ys = np.ascontiguousarray(ys, np.int64)
        xs = np.ascontiguousarray(xs, np.int64)
        n = len(ys)
        if out is None:
            out = np.full((n, ph, pw, 3), fill, np.uint8)
        if not (out.flags.c_contiguous and out.dtype == np.uint8
                and out.shape == (n, ph, pw, 3)):
            raise ValueError("out must be C-contiguous uint8 [n, ph, pw, 3]")
        if n == 0:
            return out
        if nthreads is None:
            nthreads = min(8, os.cpu_count() or 1)
        rc = lib.dgdm_read_patches_cached(
            str(path).encode(),
            self.lvl_h, self.lvl_w, self.ch, self.cw,
            self.offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self.nbytes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self.fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self.comp, n,
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ph, pw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(nthreads), int(bool(readahead)), self._cache_handle())
        if rc != 0:
            raise RuntimeError(
                f"native chunk read failed: {_ERRORS.get(rc, rc)}")
        return out

    def advise_patches(self, path: str, ys, xs, ph: int, pw: int) -> None:
        """Issue coalesced WILLNEED for exactly the chunk byte ranges the
        patches touch — no reads. Called one batch AHEAD of decode so the
        kernel streams the next batch's bytes while this batch inflates.
        Advisory: failures are swallowed (the reads still work)."""
        lib = get_lib()
        if lib is None or len(ys) == 0:
            return
        ys = np.ascontiguousarray(ys, np.int64)
        xs = np.ascontiguousarray(xs, np.int64)
        try:
            lib.dgdm_advise_patches(
                str(path).encode(),
                self.lvl_h, self.lvl_w, self.ch, self.cw,
                self.offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                self.nbytes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                len(ys),
                ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ph, pw)
        except (OSError, ctypes.ArgumentError):
            pass


def available() -> bool:
    return get_lib() is not None
