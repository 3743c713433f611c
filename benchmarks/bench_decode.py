"""Host-only cold-cache decode A/B: one-batch-ahead chunk advise on/off.

Isolates the slide-decode stage (no TPU, no featurize): iterate a
tissue-grid of patches through ``SlideProcessor.extract_patch_batch`` in
production-sized batches against a cold page cache, with and without the
``advise_patch_batch`` one-batch-ahead targeted WILLNEED
(``native/dgdm_io.cpp::dgdm_advise_patches``).

The hypothesis: decode alternates disk waits (pread) with CPU phases
(inflate + window assembly + Python); advising batch i+1's chunk byte
ranges before decoding batch i lets the kernel stream those bytes during
the CPU phases, hiding seek/transfer latency. On raw-chunk fixtures the
CPU share is smaller (no inflate), so gzip shows the larger effect —
``--compression gzip`` repacks the cached raw fixture once.

Usage:
  python benchmarks/bench_decode.py [--batches 8] [--batch 128]
      [--compression raw|gzip] [--runs 3]
Prints one JSON line per variant plus a summary line.
"""

from __future__ import annotations

# host-only benchmark: force the CPU backend BEFORE any preprocessing
# import touches jax — the axon sitecustomize pins the tunnel backend,
# whose init HANGS indefinitely during tunnel outages
import jax

jax.config.update("jax_platforms", "cpu")

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def evict(path) -> bool:
    try:
        os.sync()
        fd = os.open(str(path), os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
        return True
    except (AttributeError, OSError):
        return False


def repack_gzip(src: Path, dst: Path, tile: int = 512) -> Path:
    """Copy a dgdm_wsi HDF5 slide with gzip-2 chunks (one-time, cached)."""
    import h5py
    if dst.exists():
        return dst
    with h5py.File(src, "r") as fi, h5py.File(dst, "w") as fo:
        for k, v in fi.attrs.items():
            fo.attrs[k] = v
        i = 0
        while f"level_{i}" in fi:
            d = fi[f"level_{i}"]
            ch = (min(tile, d.shape[0]), min(tile, d.shape[1]), 3)
            o = fo.create_dataset(f"level_{i}", shape=d.shape, dtype=np.uint8,
                                  chunks=ch, compression="gzip",
                                  compression_opts=2)
            # stream by chunk rows to bound memory
            step = ch[0]
            for y in range(0, d.shape[0], step):
                o[y:y + step] = d[y:y + step]
            i += 1
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture",
                    default="benchmarks/.slides/synthetic_24576px_raw_seed0.h5")
    ap.add_argument("--compression", default="raw", choices=["raw", "gzip"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--ab-chunk-cache", action="store_true",
                    help="A/B the native decoded-chunk cache instead of "
                         "advise-ahead: consecutive column-strip patch "
                         "order (the real predict enumeration, where "
                         "adjacent batches share ~24%% of chunk columns), "
                         "cache_off vs cache_on")
    args = ap.parse_args()

    from dgdm_histopath_tpu.preprocessing.slide_io import open_slide
    from dgdm_histopath_tpu.preprocessing.slide_processor import SlideProcessor

    path = Path(args.fixture)
    if not path.exists():
        print(json.dumps({"error": f"fixture missing: {path} — run "
                          "bench_suite e2e once to generate it"}))
        return
    if args.compression == "gzip":
        path = repack_gzip(path, path.with_name(path.stem + "_gz2.h5"))

    proc = SlideProcessor(patch_size=args.patch, tissue_threshold=0.0,
                          stain_normalize=False,
                          max_patches=args.batch * args.batches)
    slide = open_slide(path)
    # uniform grid over the level-0 plane (tissue gating irrelevant for IO)
    data = proc.process_slide  # noqa: F841  (not used; coords built below)
    mask = np.ones((64, 64), bool)
    infos = proc.generate_patch_coordinates(slide, mask,
                                            slide.dimensions[0] / 64)
    if args.ab_chunk_cache:
        # consecutive strip order: the enumeration the predict path feeds
        # the reader, where consecutive batches re-touch shared chunk
        # columns — exactly what the decoded-chunk cache recovers
        infos = infos[:args.batch * args.batches]
    else:
        idx = np.linspace(0, len(infos) - 1,
                          args.batch * args.batches).astype(int)
        infos = [infos[i] for i in idx]
    slide.close()

    # PAIRED, INTERLEAVED protocol: guest fadvise(DONTNEED) cannot evict the
    # hypervisor's cache on this virtio disk (sequential "cold" runs warm
    # monotonically: 10.8 -> 3.2 -> 1.2 s measured), so sequential
    # per-variant runs are ordering-biased. Instead: one true-cold warmup
    # pair (discarded), then alternate variants within each run pair and
    # report per-pair times + medians — both variants see the same host
    # cache state.
    def one_run(variant):
        if args.ab_chunk_cache:
            import dgdm_histopath_tpu.native as native
            native.ChunkIndex.CACHE_MB_DEFAULT = (
                128 if variant == "cache_on" else 0)
        evicted = evict(path)
        slide = open_slide(path)
        bs = args.batch
        t0 = time.perf_counter()
        for i in range(0, len(infos), bs):
            if variant == "advise_ahead":
                proc.advise_patch_batch(slide, infos[i + bs:i + 2 * bs])
            proc.extract_patch_batch(slide, infos[i:i + bs])
        dt = time.perf_counter() - t0
        slide.close()
        return dt, evicted

    variants = (("cache_off", "cache_on") if args.ab_chunk_cache
                else ("no_advise", "advise_ahead"))
    times = {v: [] for v in variants}
    evicted = True
    for r in range(args.runs + 1):
        order = variants if r % 2 == 0 else variants[::-1]
        pair = {}
        for v in order:
            pair[v], ev = one_run(v)
            evicted = evicted and ev
        if r == 0:
            continue                     # true-cold warmup pair: discard
        for v in variants:
            times[v].append(pair[v])
    results = {}
    for v in variants:
        ts = sorted(times[v])
        med = ts[len(ts) // 2]
        row = {"metric": "cold_decode", "variant": v,
               "compression": args.compression,
               "patches": len(infos), "batch": args.batch,
               "seconds": round(med, 3),
               "patches_per_s": round(len(infos) / med, 1),
               "runs_s": [round(t, 3) for t in times[v]],
               "cache_protocol": ("guest-cold(fadvise_dontneed), paired"
                                  if evicted
                                  else "WARM(fadvise unavailable)")}
        results[v] = row
        print(json.dumps(row), file=sys.stderr)
    base, faster = variants
    speedup = (results[base]["seconds"]
               / max(results[faster]["seconds"], 1e-9))
    print(json.dumps({"metric": ("decode_chunk_cache_ab"
                                 if args.ab_chunk_cache
                                 else "cold_decode_advise_ab"),
                      "compression": args.compression,
                      f"{base}_s": results[base]["seconds"],
                      f"{faster}_s": results[faster]["seconds"],
                      "speedup": round(speedup, 3)}))


if __name__ == "__main__":
    main()
