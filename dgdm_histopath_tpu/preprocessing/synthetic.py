"""Synthetic H&E whole-slide generator for tests and benchmarks.

The reference ships no slide fixture at all (SURVEY §4: "no small .svs
fixture and no golden-output test") — this fills that gap: procedurally
generated H&E-looking pyramids with known tissue geometry, writable as
multi-page TIFF (readable by ``slide_io.PILTiffBackend``) or returned as an
in-memory ``ArrayBackend``.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .slide_io import ArrayBackend

# H&E-ish colors (RGB)
_BACKGROUND = np.array([244, 242, 245], np.float32)
_EOSIN = np.array([228, 140, 178], np.float32)       # cytoplasm pink
_HEMATOXYLIN = np.array([94, 60, 140], np.float32)   # nuclei purple


def generate_tissue_image(
    width: int = 2048,
    height: int = 2048,
    num_blobs: int = 6,
    nuclei_density: float = 0.002,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural H&E image. Returns (rgb uint8 [H,W,3], tissue_mask bool)."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    tissue = np.zeros((height, width), np.float32)
    for _ in range(num_blobs):
        cx = rs.uniform(0.15, 0.85) * width
        cy = rs.uniform(0.15, 0.85) * height
        rx = rs.uniform(0.08, 0.25) * width
        ry = rs.uniform(0.08, 0.25) * height
        theta = rs.uniform(0, np.pi)
        dx = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
        dy = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
        d = (dx / rx) ** 2 + (dy / ry) ** 2
        tissue = np.maximum(tissue, np.clip(1.5 - d, 0.0, 1.0))
    tissue = np.clip(tissue, 0.0, 1.0)
    # low-frequency eosin texture
    coarse = rs.rand(height // 32 + 1, width // 32 + 1).astype(np.float32)
    texture = np.kron(coarse, np.ones((32, 32), np.float32))[:height, :width]
    img = _BACKGROUND[None, None] * (1 - tissue[..., None]) + (
        (_EOSIN[None, None] * (0.6 + 0.4 * texture[..., None])) * tissue[..., None])
    # nuclei dots
    n_nuclei = int(nuclei_density * tissue.sum())
    if n_nuclei > 0:
        ys, xs = np.nonzero(tissue > 0.5)
        if len(ys):
            pick = rs.choice(len(ys), min(n_nuclei, len(ys)), replace=False)
            r = 3
            for y, x in zip(ys[pick], xs[pick]):
                y0, y1 = max(0, y - r), min(height, y + r + 1)
                x0, x1 = max(0, x - r), min(width, x + r + 1)
                img[y0:y1, x0:x1] = _HEMATOXYLIN
    noise = rs.randn(height, width, 3).astype(np.float32) * 3.0
    img = np.clip(img + noise, 0, 255).astype(np.uint8)
    return img, tissue > 0.3


def build_pyramid(level0: np.ndarray, num_levels: int = 4) -> List[np.ndarray]:
    """2× downsampled pyramid via box averaging."""
    levels = [level0]
    cur = level0.astype(np.float32)
    for _ in range(num_levels - 1):
        h, w = cur.shape[:2]
        h2, w2 = h // 2 * 2, w // 2 * 2
        cur = cur[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2, 3).mean(axis=(1, 3))
        levels.append(np.clip(cur, 0, 255).astype(np.uint8))
    return levels


def synthetic_slide(
    width: int = 2048,
    height: int = 2048,
    num_levels: int = 4,
    objective_power: float = 20.0,
    seed: int = 0,
    **kw,
) -> Tuple[ArrayBackend, np.ndarray]:
    """In-memory synthetic pyramid. Returns (backend, level0_tissue_mask)."""
    img, mask = generate_tissue_image(width, height, seed=seed, **kw)
    levels = build_pyramid(img, num_levels)
    backend = ArrayBackend(levels, properties={
        "openslide.objective-power": str(objective_power),
        "synthetic": "true",
    })
    return backend, mask


def _make_blobs(rs: np.random.RandomState, width: int, height: int,
                num_blobs: int) -> List[Tuple[float, float, float, float, float]]:
    blobs = []
    for _ in range(num_blobs):
        cx = rs.uniform(0.15, 0.85) * width
        cy = rs.uniform(0.15, 0.85) * height
        rx = rs.uniform(0.04, 0.18) * width
        ry = rs.uniform(0.04, 0.18) * height
        theta = rs.uniform(0, np.pi)
        blobs.append((cx, cy, rx, ry, theta))
    return blobs


def _render_tile(tx: int, ty: int, w: int, h: int, blobs, coarse: np.ndarray,
                 rs_tile: np.random.RandomState,
                 nuclei_density: float) -> np.ndarray:
    """Render one level-0 tile (global coords) from analytic blob params —
    O(tile) memory regardless of slide size."""
    yy, xx = np.mgrid[ty:ty + h, tx:tx + w].astype(np.float32)
    tissue = np.zeros((h, w), np.float32)
    for cx, cy, rx, ry, theta in blobs:
        dx = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
        dy = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
        d = (dx / rx) ** 2 + (dy / ry) ** 2
        tissue = np.maximum(tissue, np.clip(1.5 - d, 0.0, 1.0))
    texture = coarse[np.ix_(np.arange(ty, ty + h) // 32,
                            np.arange(tx, tx + w) // 32)]
    img = _BACKGROUND[None, None] * (1 - tissue[..., None]) + (
        (_EOSIN[None, None] * (0.6 + 0.4 * texture[..., None])) * tissue[..., None])
    n_nuclei = int(nuclei_density * tissue.sum())
    if n_nuclei > 0:
        ys, xs = np.nonzero(tissue > 0.5)
        if len(ys):
            pick = rs_tile.choice(len(ys), min(n_nuclei, len(ys)), replace=False)
            r = 3
            for y, x in zip(ys[pick], xs[pick]):
                img[max(0, y - r):y + r + 1, max(0, x - r):x + r + 1] = _HEMATOXYLIN
    img = img + rs_tile.randn(h, w, 3).astype(np.float32) * 3.0
    return np.clip(img, 0, 255).astype(np.uint8)


def write_synthetic_slide_hdf5(
    path: str | Path,
    width: int = 20480,
    height: int = 20480,
    num_levels: int = 5,
    tile: int = 2048,
    seed: int = 0,
    objective_power: float = 20.0,
    num_blobs: int = 24,
    nuclei_density: float = 5e-4,
    compression_opts: int = 2,
) -> Path:
    """Stream a gigapixel-scale synthetic H&E pyramid to a dgdm_wsi HDF5
    slide (``slide_io.HDF5SlideBackend``) without ever materializing a full
    level in memory — peak host memory is O(tile²) for level 0 and one row
    band per downsampled level. A 40k×40k level-0 writes in tiles.
    """
    import json
    import h5py
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(seed)
    blobs = _make_blobs(rs, width, height, num_blobs)
    coarse = rs.rand(height // 32 + 2, width // 32 + 2).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.attrs["dgdm_wsi"] = "1"
        f.attrs["properties"] = json.dumps({
            "openslide.objective-power": str(objective_power),
            "synthetic": "true", "seed": str(seed)})
        # chunks much smaller than the render tile: a 256² patch read then
        # decompresses ≤4 small chunks instead of one 2048² (12.6 MB) chunk
        chunk = (min(512, height), min(512, width), 3)
        d0 = f.create_dataset(
            "level_0", shape=(height, width, 3), dtype="u1", chunks=chunk,
            compression="gzip", compression_opts=compression_opts)
        for ty in range(0, height, tile):
            for tx in range(0, width, tile):
                h = min(tile, height - ty)
                w = min(tile, width - tx)
                rs_tile = np.random.RandomState(
                    (seed * 1000003 + (ty // tile) * 8191 + tx // tile) % (2 ** 31))
                d0[ty:ty + h, tx:tx + w] = _render_tile(
                    tx, ty, w, h, blobs, coarse, rs_tile, nuclei_density)
        # downsampled levels: stream 2×-box-average row bands
        prev = d0
        for lvl in range(1, num_levels):
            ph, pw = prev.shape[:2]
            nh, nw = ph // 2, pw // 2
            if nh < 1 or nw < 1:
                break
            d = f.create_dataset(
                f"level_{lvl}", shape=(nh, nw, 3), dtype="u1",
                chunks=(min(512, nh), min(512, nw), 3),
                compression="gzip", compression_opts=compression_opts)
            for oy in range(0, nh, tile):
                rows = min(tile, nh - oy)
                src = prev[2 * oy:2 * (oy + rows), :2 * nw].astype(np.float32)
                d[oy:oy + rows] = src.reshape(
                    rows, 2, nw, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
            prev = d
    return path


def write_synthetic_tiff(
    path: str | Path,
    width: int = 2048,
    height: int = 2048,
    num_levels: int = 4,
    seed: int = 0,
) -> Path:
    """Write a multi-page pyramidal TIFF fixture via Pillow."""
    from PIL import Image
    img, _ = generate_tissue_image(width, height, seed=seed)
    levels = build_pyramid(img, num_levels)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pages = [Image.fromarray(lvl) for lvl in levels]
    pages[0].save(path, save_all=True, append_images=pages[1:], format="TIFF")
    return path
