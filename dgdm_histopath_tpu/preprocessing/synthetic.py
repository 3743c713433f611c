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
    focal_density: Optional[float] = None,
    focal_frac: float = 0.0,
    stain_jitter: float = 0.0,
    brightness_jitter: float = 0.0,
    noise_sigma: float = 3.0,
    nuclei_radius: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural H&E image. Returns (rgb uint8 [H,W,3], tissue_mask bool).

    Beyond the original uniform-density rendering, supports the calibrated
    hard benchmark (VERDICT r3 #1) via:
      * ``focal_density``/``focal_frac`` — ONE elliptical focus covering
        ~``focal_frac`` of the tissue whose nuclei density is
        ``focal_density`` instead of the baseline (a focal lesion or a
        benign mimic, depending on contrast);
      * ``stain_jitter`` — per-image multiplicative perturbation of the
        H&E stain colors (scanner/stain variation);
      * ``brightness_jitter`` / ``noise_sigma`` / ``nuclei_radius`` —
        scanner gain, sensor noise, and apparent nucleus size variation.
    """
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
    # stain/scanner jitter: per-image color-matrix + gain perturbation
    eosin, hema, background = _EOSIN, _HEMATOXYLIN, _BACKGROUND
    if stain_jitter > 0:
        eosin = eosin * rs.uniform(1 - stain_jitter, 1 + stain_jitter, 3)
        hema = hema * rs.uniform(1 - stain_jitter, 1 + stain_jitter, 3)
        background = background * rs.uniform(1 - stain_jitter / 2,
                                             1 + stain_jitter / 2, 3)
    # low-frequency eosin texture
    coarse = rs.rand(height // 32 + 1, width // 32 + 1).astype(np.float32)
    texture = np.kron(coarse, np.ones((32, 32), np.float32))[:height, :width]
    img = background[None, None] * (1 - tissue[..., None]) + (
        (eosin[None, None] * (0.6 + 0.4 * texture[..., None])) * tissue[..., None])

    # one elliptical focal region inside tissue (lesion or benign mimic):
    # nuclei density there is focal_density, baseline elsewhere
    focus = np.zeros((height, width), bool)
    if focal_density is not None and focal_frac > 0:
        ty, tx_ = np.nonzero(tissue > 0.5)
        if len(ty):
            j = rs.randint(len(ty))
            cy, cx = float(ty[j]), float(tx_[j])
            # ellipse area pi*rx*ry ~= focal_frac * tissue area
            area = focal_frac * float((tissue > 0.5).sum())
            r0 = np.sqrt(area / np.pi)
            ar = rs.uniform(0.6, 1.6)
            rx, ry = r0 * ar, r0 / ar
            theta = rs.uniform(0, np.pi)
            dx = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
            dy = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
            focus = (((dx / max(rx, 1.0)) ** 2 + (dy / max(ry, 1.0)) ** 2)
                     <= 1.0) & (tissue > 0.5)

    def _stamp_nuclei(region_mask: np.ndarray, density: float) -> None:
        n = int(density * region_mask.sum())
        if n <= 0:
            return
        ys, xs = np.nonzero(region_mask)
        if not len(ys):
            return
        pick = rs.choice(len(ys), min(n, len(ys)), replace=False)
        r = nuclei_radius
        for y, x in zip(ys[pick], xs[pick]):
            y0, y1 = max(0, y - r), min(height, y + r + 1)
            x0, x1 = max(0, x - r), min(width, x + r + 1)
            img[y0:y1, x0:x1] = hema

    _stamp_nuclei((tissue > 0.5) & ~focus, nuclei_density)
    if focus.any():
        _stamp_nuclei(focus, focal_density)
    if brightness_jitter > 0:
        img = img * rs.uniform(1 - brightness_jitter, 1 + brightness_jitter)
    noise = rs.randn(height, width, 3).astype(np.float32) * noise_sigma
    img = np.clip(img + noise, 0, 255).astype(np.uint8)
    return img, tissue > 0.3


# Calibrated hard stand-in task (VERDICT r3 #1): one source of truth for
# the per-slide generation parameters, shared by the dataset generator
# (scripts/eval_camelyon16.py --hard) and the fast oracle separability
# probe (benchmarks/probe_hard_task.py) so calibration transfers 1:1.
HARD_TASK_DEFAULTS = dict(
    base_density=(0.0030, 0.0090),   # per-slide baseline, log-uniform (3x)
    lesion_contrast=(2.1, 2.7),      # tumor focus density / own baseline
    mimic_contrast=(1.2, 1.7),       # benign focus on normal slides
    lesion_frac=(0.06, 0.14),        # focus area as fraction of tissue
    mimic_frac=(0.05, 0.12),
    stain_jitter=0.15,               # per-slide H&E color-matrix jitter
    brightness_jitter=0.08,          # scanner gain
    noise_sigma=(2.0, 5.0),          # sensor noise, per-slide uniform
    nuclei_radius=(2, 3, 3, 4),      # apparent nucleus size, per-slide
)


# Ordinal focal-contrast bands for the HARD MULTI-CLASS stand-in (TCGA-BRCA
# 4-subtype analogue, scripts/eval_tcga.py --hard): class k's focus sits at
# band-k x the slide's own baseline density, so adjacent-class confusion
# keeps the macro OVR AUC off the 1.0 ceiling. The upper bands widen
# geometrically because the oracle-measured contrast COMPRESSES at high
# density (nuclei overlap saturates measured density: nominal 3.15x
# measures ~1.9x) — evenly spaced bands probed macro 0.77 with adjacent
# pairs at 0.69-0.70. Calibrated 2026-08-20 via benchmarks/probe_hard_task
# --multiclass (n=12/class, 1024px): oracle macro OVR AUC 0.875,
# adjacent-pair AUCs [0.95, 0.83, 0.81], measured per-class contrast
# medians [1.24, 1.59, 2.06, 2.58].
HARD_MULTICLASS_BANDS = (
    (1.1, 1.4),     # LumA-like: barely above baseline (mimic territory)
    (1.8, 2.2),     # LumB
    (3.0, 3.5),     # Her2
    (4.8, 5.6),     # Basal
)


def sample_hard_slide_params(rs: np.random.RandomState, tumor: bool,
                             size: int = 1024, seed: int = 0,
                             **overrides) -> dict:
    """Sample one slide's render kwargs for the calibrated hard task.

    ``rs`` drives the *task-level* draws (baseline density, contrast,
    focus size, nuisance magnitudes); ``seed`` seeds the renderer's own
    texture/geometry RNG. Returns kwargs for :func:`generate_tissue_image`
    / :func:`write_synthetic_tiff`.
    """
    cfg = dict(HARD_TASK_DEFAULTS)
    cfg.update(overrides)
    base = float(np.exp(rs.uniform(np.log(cfg["base_density"][0]),
                                   np.log(cfg["base_density"][1]))))
    lo, hi = cfg["lesion_contrast"] if tumor else cfg["mimic_contrast"]
    focal = base * rs.uniform(lo, hi)
    frac = rs.uniform(*(cfg["lesion_frac"] if tumor else cfg["mimic_frac"]))
    return dict(
        width=size, height=size, seed=seed,
        nuclei_density=base, focal_density=focal, focal_frac=float(frac),
        stain_jitter=cfg["stain_jitter"],
        brightness_jitter=cfg["brightness_jitter"],
        noise_sigma=float(rs.uniform(*cfg["noise_sigma"])),
        nuclei_radius=int(rs.choice(list(cfg["nuclei_radius"]))),
    )


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


def _device_band_renderer(width: int, band: int, num_levels: int,
                          nuclei_density: float):
    """Jitted device renderer for one level-0 row band + its pyramid levels.

    Returns a function ``(blobs [B,5] f32, coarse [..] f32, ty i32, key)
    -> tuple of uint8 arrays [(band/2^l, width/2^l, 3) for l in levels]``.
    The whole pipeline — blob fields (lax.scan), texture gather, nuclei
    (thresholded uniform field + max-pool dilation instead of the host
    path's exact sampling), gaussian noise, and every 2× box reduction —
    runs in ONE device call, so a 1-core throttled host only pays the
    tunnel fetch + gzip write.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def render(blobs, coarse, ty, key):
        xx = jnp.arange(width, dtype=jnp.float32)[None, :]
        yy = (jnp.arange(band, dtype=jnp.float32) + ty)[:, None]

        def blob_step(tissue, blob):
            cx, cy, rx, ry, theta = (blob[0], blob[1], blob[2], blob[3],
                                     blob[4])
            c, s = jnp.cos(theta), jnp.sin(theta)
            dx = (xx - cx) * c + (yy - cy) * s
            dy = -(xx - cx) * s + (yy - cy) * c
            d = (dx / rx) ** 2 + (dy / ry) ** 2
            return jnp.maximum(tissue, jnp.clip(1.5 - d, 0.0, 1.0)), None

        tissue, _ = lax.scan(blob_step, jnp.zeros((band, width), jnp.float32),
                             blobs)
        tex_rows = ((jnp.arange(band) + ty) // 32).astype(jnp.int32)
        tex_cols = (jnp.arange(width) // 32).astype(jnp.int32)
        texture = coarse[tex_rows][:, tex_cols]
        bg = jnp.asarray(_BACKGROUND)
        eo = jnp.asarray(_EOSIN)
        he = jnp.asarray(_HEMATOXYLIN)
        t3 = tissue[..., None]
        img = bg * (1 - t3) + eo * (0.6 + 0.4 * texture[..., None]) * t3
        # nuclei: per-tissue-pixel bernoulli centers, dilated radius 3 —
        # same expected density as the host path's exact draw
        k_nuc, k_noise = jax.random.split(key)
        centers = ((jax.random.uniform(k_nuc, (band, width)) < nuclei_density)
                   & (tissue > 0.5)).astype(jnp.float32)
        nucleus = lax.reduce_window(centers, 0.0, lax.add,
                                    (7, 7), (1, 1), "SAME") > 0.0
        img = jnp.where(nucleus[..., None], he, img)
        img = img + jax.random.normal(k_noise, (band, width, 3)) * 3.0
        out0 = jnp.clip(img, 0, 255).astype(jnp.uint8)
        outs = [out0]
        cur = img
        for _ in range(1, num_levels):
            h, w = cur.shape[:2]
            cur = cur.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
            outs.append(jnp.clip(cur, 0, 255).astype(jnp.uint8))
        return tuple(outs)

    return jax.jit(render)


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
    compression: str = "gzip",
    chunk_px: int = 512,
    device: str = "auto",
) -> Path:
    """Stream a gigapixel-scale synthetic H&E pyramid to a dgdm_wsi HDF5
    slide (``slide_io.HDF5SlideBackend``) without ever materializing a full
    level in memory — peak host memory is O(band) per level.

    ``device='auto'`` renders on the accelerator when one is attached
    (one jitted call per row band returns the band at every pyramid scale;
    the host only gzip-writes) — the numpy path needs ~minutes/tile on a
    throttled 1-core host. ``'numpy'`` forces the host path; ``'jax'``
    forces the device path. The file is written to a temp name and renamed,
    so a killed run never leaves a truncated slide behind.
    """
    import json
    import os
    import h5py
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    use_jax = device == "jax"
    if device == "auto":
        try:
            import jax
            use_jax = jax.default_backend() != "cpu"
        except Exception:
            use_jax = False
    # the device path's banded pyramid reduction needs clean 2× splits
    div = 1 << (num_levels - 1)
    if use_jax and (width % div or height % tile or tile % div):
        use_jax = False
    rs = np.random.RandomState(seed)
    blobs = _make_blobs(rs, width, height, num_blobs)
    coarse = rs.rand(height // 32 + 2, width // 32 + 2).astype(np.float32)
    with h5py.File(tmp, "w") as f:
        f.attrs["dgdm_wsi"] = "1"
        f.attrs["properties"] = json.dumps({
            "openslide.objective-power": str(objective_power),
            "synthetic": "true", "seed": str(seed)})
        # chunks much smaller than the render tile: a 256² patch read then
        # decompresses ≤4 small chunks instead of one 2048² (12.6 MB) chunk
        comp = dict(compression=compression,
                    compression_opts=(compression_opts
                                      if compression == "gzip" else None),
                    chunk_px=chunk_px)
        if use_jax:
            _write_levels_device(f, width, height, num_levels, tile, seed,
                                 blobs, coarse, nuclei_density, comp)
        else:
            _write_levels_numpy(f, width, height, num_levels, tile, seed,
                                blobs, coarse, nuclei_density, comp)
    os.replace(tmp, path)
    return path


def _make_level_datasets(f, width: int, height: int, num_levels: int,
                         comp: dict):
    import h5py  # noqa: F401 (kept for symmetry; f is an h5py file)
    cpx = comp.get("chunk_px", 512)
    ds = []
    h, w = height, width
    for lvl in range(num_levels):
        if h < 1 or w < 1:
            break
        ds.append(f.create_dataset(
            f"level_{lvl}", shape=(h, w, 3), dtype="u1",
            chunks=(min(cpx, h), min(cpx, w), 3),
            compression=comp.get("compression", "gzip"),
            compression_opts=comp.get("compression_opts")))
        h, w = h // 2, w // 2
    return ds


def _write_levels_device(f, width, height, num_levels, tile, seed, blobs,
                         coarse, nuclei_density, comp) -> None:
    import jax
    import jax.numpy as jnp
    datasets = _make_level_datasets(f, width, height, num_levels, comp)
    levels = len(datasets)
    render = _device_band_renderer(width, tile, levels, nuclei_density)
    blobs_d = jnp.asarray(np.asarray(blobs, np.float32))
    coarse_d = jnp.asarray(coarse)
    base_key = jax.random.PRNGKey(seed)
    pending = None  # overlap device render of band i+1 with gzip of band i
    for bi, ty in enumerate(range(0, height, tile)):
        outs = render(blobs_d, coarse_d, jnp.float32(ty),
                      jax.random.fold_in(base_key, bi))
        if pending is not None:
            _flush_band(datasets, *pending)
        pending = (tile, ty, [np.asarray(o) for o in outs])
    if pending is not None:
        _flush_band(datasets, *pending)


def _flush_band(datasets, tile, ty, host_outs) -> None:
    for lvl, (d, arr) in enumerate(zip(datasets, host_outs)):
        oy = ty >> lvl
        rows = min(arr.shape[0], d.shape[0] - oy)
        if rows > 0:
            d[oy:oy + rows] = arr[:rows]


def _write_levels_numpy(f, width, height, num_levels, tile, seed, blobs,
                        coarse, nuclei_density, comp) -> None:
    datasets = _make_level_datasets(f, width, height, num_levels, comp)
    d0 = datasets[0]
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
    for lvl in range(1, len(datasets)):
        d = datasets[lvl]
        nh, nw = d.shape[:2]
        for oy in range(0, nh, tile):
            rows = min(tile, nh - oy)
            src = prev[2 * oy:2 * (oy + rows), :2 * nw].astype(np.float32)
            d[oy:oy + rows] = src.reshape(
                rows, 2, nw, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
        prev = d


def _render_band_numpy(ty: int, band: int, width: int, num_levels: int,
                       blobs, coarse: np.ndarray, nuclei_density: float,
                       seed: int) -> List[np.ndarray]:
    """Host fallback for one level-0 row band + its pyramid reductions."""
    chunks = []
    for tx in range(0, width, 2048):
        w = min(2048, width - tx)
        rs_tile = np.random.RandomState(
            (seed * 1000003 + (ty // band) * 8191 + tx // 2048) % (2 ** 31))
        chunks.append(_render_tile(tx, ty, w, band, blobs, coarse, rs_tile,
                                   nuclei_density))
    out0 = np.concatenate(chunks, axis=1)
    outs = [out0]
    cur = out0.astype(np.float32)
    for _ in range(1, num_levels):
        h, w = cur.shape[:2]
        cur = cur.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
        outs.append(np.clip(cur, 0, 255).astype(np.uint8))
    return outs


def write_synthetic_slide_tiff(
    path: str | Path,
    width: int = 24576,
    height: int = 24576,
    num_levels: int = 5,
    band: int = 2048,
    tiff_tile: int = 256,
    seed: int = 0,
    compression: str = "jpeg",
    jpeg_quality: int = 85,
    num_blobs: int = 24,
    nuclei_density: float = 5e-4,
    objective_power: float = 20.0,
    device: str = "auto",
) -> Path:
    """Stream a gigapixel synthetic H&E pyramid to a JPEG-tiled BigTIFF —
    the REAL .svs container (Aperio layout: 256-px JPEG tiles, AppMag in
    the ImageDescription) — with O(band) memory.

    This is the honest e2e fixture (VERDICT r3 #6): the HDF5 ``dgdm_wsi``
    headline rides uncompressed chunks, while deployment slides pay a JPEG
    decode per tile. Renders on the accelerator when attached (one jitted
    call per row band, same renderer as :func:`write_synthetic_slide_hdf5`),
    JPEG-encodes tile-by-tile on the host, and streams them through
    ``tiff.StreamingTiledTiffWriter``.
    """
    from .tiff import StreamingTiledTiffWriter
    path = Path(path)
    div = 1 << (num_levels - 1)
    if width % div or height % band or band % div or width % tiff_tile:
        raise ValueError(
            f"width ({width}) must divide by 2^(levels-1) ({div}) and "
            f"tiff_tile ({tiff_tile}); height ({height}) by band ({band}); "
            f"band by {div}")
    use_jax = device == "jax"
    if device == "auto":
        try:
            import jax
            use_jax = jax.default_backend() != "cpu"
        except Exception:
            use_jax = False
    rs = np.random.RandomState(seed)
    blobs = _make_blobs(rs, width, height, num_blobs)
    coarse = rs.rand(height // 32 + 2, width // 32 + 2).astype(np.float32)
    level_dims = [(height >> lvl, width >> lvl) for lvl in range(num_levels)]
    desc = (f"Aperio Synthetic (dgdm fixture)|AppMag = {objective_power:g}"
            f"|MPP = 0.5000")
    writer = StreamingTiledTiffWriter(
        path, level_dims, tile=tiff_tile, compression=compression,
        bigtiff=True, jpeg_quality=jpeg_quality, description=desc)
    bufs = [np.zeros((0, width >> lvl, 3), np.uint8)
            for lvl in range(num_levels)]

    def flush(lvl: int, final: bool) -> None:
        tt = tiff_tile
        while bufs[lvl].shape[0] >= tt or (final and bufs[lvl].shape[0]):
            strip, bufs[lvl] = bufs[lvl][:tt], bufs[lvl][tt:]
            for tx in range(0, strip.shape[1], tt):
                writer.write_tile(lvl, strip[:, tx:tx + tt])
            if final and not bufs[lvl].shape[0]:
                break

    if use_jax:
        import jax
        import jax.numpy as jnp
        render = _device_band_renderer(width, band, num_levels,
                                       nuclei_density)
        blobs_d = jnp.asarray(np.asarray(blobs, np.float32))
        coarse_d = jnp.asarray(coarse)
        base_key = jax.random.PRNGKey(seed)
        pending = None     # overlap device render with host JPEG encode
        for bi, ty in enumerate(range(0, height, band)):
            outs = render(blobs_d, coarse_d, jnp.float32(ty),
                          jax.random.fold_in(base_key, bi))
            if pending is not None:
                for lvl, arr in enumerate(pending):
                    bufs[lvl] = np.concatenate([bufs[lvl], arr], axis=0)
                    flush(lvl, final=False)
            pending = [np.asarray(o) for o in outs]
        if pending is not None:
            for lvl, arr in enumerate(pending):
                bufs[lvl] = np.concatenate([bufs[lvl], arr], axis=0)
                flush(lvl, final=True)
    else:
        bands = list(range(0, height, band))
        for bi, ty in enumerate(bands):
            outs = _render_band_numpy(ty, band, width, num_levels, blobs,
                                      coarse, nuclei_density, seed)
            last = bi == len(bands) - 1
            for lvl, arr in enumerate(outs):
                bufs[lvl] = np.concatenate([bufs[lvl], arr], axis=0)
                flush(lvl, final=last)
    return writer.close()


def write_synthetic_tiff(
    path: str | Path,
    width: int = 2048,
    height: int = 2048,
    num_levels: int = 4,
    seed: int = 0,
    **image_kw,
) -> Path:
    """Write a multi-page pyramidal TIFF fixture via Pillow.

    Extra kwargs (``nuclei_density``, ``num_blobs``) pass through to
    :func:`generate_tissue_image` — used by ``scripts/eval_camelyon16.py``
    to synthesize separable "tumor" vs "normal" stand-in classes."""
    from PIL import Image
    img, _ = generate_tissue_image(width, height, seed=seed, **image_kw)
    levels = build_pyramid(img, num_levels)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pages = [Image.fromarray(lvl) for lvl in levels]
    pages[0].save(path, save_all=True, append_images=pages[1:], format="TIFF")
    return path
