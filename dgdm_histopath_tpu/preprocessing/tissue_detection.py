"""Tissue detection on low-resolution slide thumbnails.

Parity surface: reference ``dgdm_histopath/preprocessing/tissue_detection.py``
(:15-203) — composite mask = (gray < background_threshold) ∧ Otsu ∧ HSV gates
(saturation > 20, value < 240) after Gaussian blur (:88-108), optional
KMeans(3) detector (:110-130), morphological close/open (:132-148),
connected-component minimum-area filter (:150-166), tissue statistics
(:168-203).

TPU-native design: the thumbnail is small (≤ ~2k²) but the math is still
expressed in jnp so it can run on-device and fuse (blur as two 1-D
convolutions, Otsu from a 256-bin histogram, morphology via
``lax.reduce_window``). Connected components — inherently sequential — run
on host via a two-pass union-find over numpy (cv2-free).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# device-side mask computation
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur on [H, W] or [H, W, C] float arrays."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[:, None]   # [C,1,H,W]
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn)
    out = jnp.moveaxis(x[:, 0], 0, -1)
    return out[..., 0] if squeeze else out


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return jnp.tensordot(rgb.astype(jnp.float32), w, axes=([-1], [0]))


def rgb_to_hsv_sv(rgb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Saturation and Value channels (0-255 scale) without the hue branch."""
    r = rgb.astype(jnp.float32)
    mx = jnp.max(r, axis=-1)
    mn = jnp.min(r, axis=-1)
    s = jnp.where(mx > 0, (mx - mn) / jnp.maximum(mx, 1e-6) * 255.0, 0.0)
    return s, mx


def otsu_threshold(gray: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold from a 256-bin histogram (device-side)."""
    hist = jnp.histogram(jnp.clip(gray, 0, 255), bins=256, range=(0, 256))[0].astype(jnp.float32)
    total = jnp.sum(hist)
    p = hist / jnp.maximum(total, 1.0)
    omega = jnp.cumsum(p)
    bins = jnp.arange(256, dtype=jnp.float32)
    mu = jnp.cumsum(p * bins)
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-9, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-9), 0.0)
    return jnp.argmax(sigma_b).astype(jnp.float32)


def _binary_morph(mask: jnp.ndarray, size: int, op: str) -> jnp.ndarray:
    """Erode/dilate a boolean mask with a size×size window via reduce_window."""
    pad = size // 2
    x = mask.astype(jnp.float32)
    if op == "dilate":
        out = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (size, size), (1, 1),
                                    [(pad, pad), (pad, pad)])
    else:
        out = jax.lax.reduce_window(x, jnp.inf, jax.lax.min, (size, size), (1, 1),
                                    [(pad, pad), (pad, pad)])
    return out > 0.5


def morph_close(mask: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    return _binary_morph(_binary_morph(mask, size, "dilate"), size, "erode")


def morph_open(mask: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    return _binary_morph(_binary_morph(mask, size, "erode"), size, "dilate")


@functools.partial(jax.jit, static_argnames=("bg_threshold", "sat_threshold",
                                             "val_threshold", "blur_sigma",
                                             "morphology_size"))
def compute_tissue_mask(
    thumbnail: jnp.ndarray,            # [H, W, 3] uint8/float RGB
    bg_threshold: float = 220.0,
    sat_threshold: float = 20.0,
    val_threshold: float = 240.0,
    blur_sigma: float = 2.0,
    morphology_size: int = 5,
) -> jnp.ndarray:
    """Composite tissue mask (reference detect_tissue :52-108 + morphology)."""
    img = gaussian_blur(thumbnail.astype(jnp.float32), blur_sigma)
    gray = rgb_to_gray(img)
    sat, val = rgb_to_hsv_sv(img)
    not_background = gray < bg_threshold
    # argmax convention: class 0 = bins [0..t] inclusive, so tissue is <= t
    otsu = gray <= otsu_threshold(gray)
    hsv_gate = (sat > sat_threshold) & (val < val_threshold)
    mask = not_background & otsu & hsv_gate
    mask = morph_close(mask, morphology_size)
    mask = morph_open(mask, morphology_size)
    return mask


# ---------------------------------------------------------------------------
# host-side connected components (sequential; numpy union-find)
# ---------------------------------------------------------------------------

def connected_components_filter(mask: np.ndarray, min_area: int) -> np.ndarray:
    """Remove 4-connected components smaller than ``min_area`` pixels
    (reference :150-166). scipy labeling on host."""
    mask = np.asarray(mask, bool)
    if min_area <= 1 or not mask.any():
        return mask.copy()
    from scipy import ndimage
    labeled, n = ndimage.label(mask)
    if n == 0:
        return mask.copy()
    areas = np.bincount(labeled.ravel(), minlength=n + 1)
    areas[0] = 0
    keep = areas >= min_area
    return keep[labeled]


@dataclass
class TissueStats:
    tissue_fraction: float
    num_regions: int
    largest_region_area: int
    total_tissue_pixels: int


class TissueDetector:
    """Tissue detector with the reference class API (``detect_tissue``,
    ``get_tissue_stats``; reference :15-203)."""

    def __init__(
        self,
        bg_threshold: float = 220.0,
        sat_threshold: float = 20.0,
        val_threshold: float = 240.0,
        blur_sigma: float = 2.0,
        morphology_size: int = 5,
        min_region_area: int = 64,
        method: str = "composite",   # composite | kmeans
    ):
        self.bg_threshold = bg_threshold
        self.sat_threshold = sat_threshold
        self.val_threshold = val_threshold
        self.blur_sigma = blur_sigma
        self.morphology_size = morphology_size
        self.min_region_area = min_region_area
        self.method = method

    def detect_tissue(self, thumbnail: np.ndarray) -> np.ndarray:
        """RGB thumbnail [H, W, 3] -> boolean tissue mask [H, W]."""
        if self.method == "kmeans":
            mask = self._detect_kmeans(thumbnail)
        else:
            mask = np.asarray(compute_tissue_mask(
                jnp.asarray(thumbnail), self.bg_threshold, self.sat_threshold,
                self.val_threshold, self.blur_sigma, self.morphology_size))
        if self.min_region_area > 0:
            mask = connected_components_filter(mask, self.min_region_area)
        return mask

    def _detect_kmeans(self, thumbnail: np.ndarray, k: int = 3) -> np.ndarray:
        """KMeans(3) on RGB; darkest-centroid cluster(s) = tissue
        (reference :110-130). Uses sklearn when present, else a tiny
        numpy Lloyd iteration."""
        pixels = thumbnail.reshape(-1, 3).astype(np.float32)
        try:
            from sklearn.cluster import KMeans
            km = KMeans(n_clusters=k, n_init=3, random_state=0).fit(pixels)
            centers, assign = km.cluster_centers_, km.labels_
        except ImportError:  # pragma: no cover
            rs = np.random.RandomState(0)
            centers = pixels[rs.choice(len(pixels), k, replace=False)]
            for _ in range(10):
                d = ((pixels[:, None] - centers[None]) ** 2).sum(-1)
                assign = d.argmin(1)
                for c in range(k):
                    sel = pixels[assign == c]
                    if len(sel):
                        centers[c] = sel.mean(0)
        brightness = centers.mean(axis=1)
        tissue_cluster = int(np.argmin(brightness))
        return (assign == tissue_cluster).reshape(thumbnail.shape[:2])

    def get_tissue_stats(self, mask: np.ndarray) -> TissueStats:
        """Region statistics (reference :168-203)."""
        total = int(mask.sum())
        frac = float(total) / float(mask.size) if mask.size else 0.0
        try:
            from scipy import ndimage
            labeled, n = ndimage.label(mask)
            areas = np.bincount(labeled.ravel())[1:]
            largest = int(areas.max()) if len(areas) else 0
            return TissueStats(frac, int(n), largest, total)
        except ImportError:  # pragma: no cover - scipy missing
            return TissueStats(frac, -1, -1, total)
