#!/usr/bin/env python
"""Oracle separability probe for the calibrated hard stand-in benchmark.

Problem (VERDICT r3 #1): the round-3 accuracy gates saturated at AUC 1.0 on
a trivially separable task, so "zero AUC delta" claims for windowed / int8 /
MoE had no statistical power. The replacement task must land the REAL model
in ~0.80-0.95 — but each full model run costs hours, so difficulty is
calibrated with a fast *oracle* detector first: a hand-built nuclei-density
analyzer that knows the generative recipe. The oracle's AUC upper-bounds
task separability in minutes; the model is then validated once at the
chosen setting.

Oracle design notes (each clause fixes a failure found while probing):
  * Tissue detection by SATURATION, not brightness — per-slide brightness
    jitter pushes background below any fixed RGB threshold, and per-slide
    stain jitter shifts the background hue; background stays near-gray
    (S ~= 0.01) while eosin is strongly pink (S ~= 0.39).
  * Nuclei by BLUE-DOMINANCE (B > R) + darkness — a plain darkness
    threshold counts dark eosin texture (0.6x eosin is within RGB distance
    ~59 of hematoxylin) as nuclei; hematoxylin is the only blue-dominant
    stain in the palette, robust to +/-15% channel jitter.
  * Per-patch density on a grid, 3x3 box-smoothed — the GNN pools over
    neighborhoods, so the fair oracle sees neighborhood statistics, and
    smoothing divides per-patch Poisson noise by ~3.
  * Score = top-quantile smoothed density / per-slide MEDIAN density —
    baseline density varies 3x across slides by construction, so absolute
    density is non-diagnostic; only the within-slide focal contrast is.

Usage:
    python benchmarks/probe_hard_task.py --n 64 --size 1024
    python benchmarks/probe_hard_task.py --override lesion_contrast=1.6,2.0
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def oracle_patch_density(img: np.ndarray, patch: int = 64):
    """Per-patch nuclei fraction + tissue fraction grids for one RGB slide."""
    h, w = img.shape[:2]
    f = img.astype(np.float32)
    mx = f.max(axis=-1)
    mn = f.min(axis=-1)
    sat = (mx - mn) / np.maximum(mx, 1.0)
    tissue = sat > 0.12                     # background is near-gray
    lum = f.mean(axis=-1)
    med_lum = np.median(lum[tissue]) if tissue.any() else 128.0
    nuclei = tissue & (f[..., 2] > f[..., 0] + 10) & (lum < med_lum)
    gh, gw = h // patch, w // patch
    t = tissue[:gh * patch, :gw * patch].reshape(gh, patch, gw, patch)
    n = nuclei[:gh * patch, :gw * patch].reshape(gh, patch, gw, patch)
    tissue_frac = t.mean(axis=(1, 3))
    nuc_frac = n.sum(axis=(1, 3)) / np.maximum(t.sum(axis=(1, 3)), 1)
    return nuc_frac, tissue_frac


def _box3(x: np.ndarray, valid: np.ndarray):
    """Masked 3x3 box filter (ignores non-tissue cells)."""
    num = np.zeros_like(x)
    den = np.zeros_like(x)
    xm = np.where(valid, x, 0.0)
    vm = valid.astype(np.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            num += np.roll(np.roll(xm, dy, 0), dx, 1)
            den += np.roll(np.roll(vm, dy, 0), dx, 1)
    return num / np.maximum(den, 1.0)


def oracle_slide_score(img: np.ndarray, patch: int = 64,
                       min_tissue: float = 0.5, top_q: float = 0.98) -> float:
    """Focal-contrast score: high when some neighborhood's nuclei density
    stands far above the slide's own baseline."""
    nuc, tis = oracle_patch_density(img, patch)
    valid = tis >= min_tissue
    if valid.sum() < 8:
        return 0.0
    sm = _box3(nuc, valid)
    vals = sm[valid]
    base = np.median(vals)
    hot = np.quantile(vals, top_q)
    return float(hot / max(base, 1e-6))


def run_probe(n_per_class: int, size: int, seed: int, overrides: dict,
              patch: int = 64):
    from dgdm_histopath_tpu.evaluation.metrics import bootstrap_ci
    from dgdm_histopath_tpu.preprocessing.synthetic import (
        generate_tissue_image, sample_hard_slide_params,
    )
    scores, labels = [], []
    t0 = time.time()
    idx = 0
    for label in (0, 1):
        for i in range(n_per_class):
            idx += 1
            rs = np.random.RandomState(seed * 100003 + idx)
            params = sample_hard_slide_params(rs, bool(label), size=size,
                                              seed=seed + idx, **overrides)
            img, _ = generate_tissue_image(**params)
            scores.append(oracle_slide_score(img, patch))
            labels.append(label)
    labels = np.asarray(labels)
    scores = np.asarray(scores)

    def auc_fn(y, s):
        pos, neg = s[y == 1], s[y == 0]
        if not len(pos) or not len(neg):
            return float("nan")
        gt = (pos[:, None] > neg[None, :]).mean()
        eq = (pos[:, None] == neg[None, :]).mean()
        return float(gt + 0.5 * eq)

    ci = bootstrap_ci(auc_fn, labels, scores, n_bootstrap=1000)
    return {
        "oracle_auc": round(ci["value"], 4),
        "ci": [round(ci["lower"], 4), round(ci["upper"], 4)],
        "n": int(2 * n_per_class), "size": size, "patch": patch,
        "score_normal": [round(float(np.median(scores[labels == 0])), 3),
                         round(float(scores[labels == 0].std()), 3)],
        "score_tumor": [round(float(np.median(scores[labels == 1])), 3),
                        round(float(scores[labels == 1].std()), 3)],
        "overrides": overrides,
        "wall_s": round(time.time() - t0, 1),
    }


def run_probe_multiclass(n_per_class: int, size: int, seed: int,
                         patch: int = 64, bands=None):
    """Oracle separability of the hard MULTI-CLASS task (eval_tcga --hard):
    renders slides from ``HARD_MULTICLASS_BANDS``, scores each with the
    same focal-contrast oracle, and reports (a) adjacent-pair binary AUCs on
    the raw scalar (the binding ordinal constraint) and (b) macro OVR AUC
    using per-class scores = −|scalar − band center| (the oracle's class
    posterior surrogate)."""
    from dgdm_histopath_tpu.evaluation.metrics import macro_ovr_auc
    from dgdm_histopath_tpu.preprocessing.synthetic import (
        HARD_MULTICLASS_BANDS, generate_tissue_image,
        sample_hard_slide_params,
    )
    bands = bands or HARD_MULTICLASS_BANDS
    scores, labels = [], []
    t0 = time.time()
    idx = 0
    for ci_, band in enumerate(bands):
        for i in range(n_per_class):
            idx += 1
            rs = np.random.RandomState(seed * 100003 + idx)
            params = sample_hard_slide_params(rs, tumor=True, size=size,
                                              seed=seed + idx,
                                              lesion_contrast=band)
            img, _ = generate_tissue_image(**params)
            scores.append(oracle_slide_score(img, patch))
            labels.append(ci_)
    labels = np.asarray(labels)
    scores = np.asarray(scores)

    def pair_auc(a, b):
        pos, neg = scores[labels == b], scores[labels == a]
        gt = (pos[:, None] > neg[None, :]).mean()
        eq = (pos[:, None] == neg[None, :]).mean()
        return float(gt + 0.5 * eq)

    # the oracle's measured score compresses at high contrast (nuclei
    # overlap saturates measured density), so decode against the MEASURED
    # per-class medians — the best monotone decoder an oracle that knows
    # the recipe can build — rather than the nominal band centers
    centers = np.array([float(np.median(scores[labels == k]))
                        for k in range(len(bands))])
    cls_scores = -np.abs(scores[:, None] - centers[None, :])
    return {
        "oracle_macro_ovr_auc": round(macro_ovr_auc(labels, cls_scores), 4),
        "adjacent_pair_auc": [round(pair_auc(k, k + 1), 4)
                              for k in range(len(centers) - 1)],
        "bands": [list(b) for b in bands],
        "score_median_by_class": [
            round(float(np.median(scores[labels == k])), 3)
            for k in range(len(centers))],
        "n": int(len(labels)), "size": size, "patch": patch,
        "wall_s": round(time.time() - t0, 1),
    }


def parse_override(s: str):
    k, v = s.split("=", 1)
    parts = v.split(",")
    vals = tuple(float(p) for p in parts)
    return k, (vals if len(vals) > 1 else vals[0])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--n", type=int, default=48, help="slides per class")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--override", action="append", default=[],
                    help="e.g. lesion_contrast=1.8,2.4 (repeatable)")
    ap.add_argument("--multiclass", action="store_true",
                    help="probe the 4-subtype hard task "
                         "(HARD_MULTICLASS_BANDS) instead of the binary one")
    args = ap.parse_args(argv)
    if args.multiclass:
        out = run_probe_multiclass(args.n, args.size, args.seed, args.patch)
    else:
        overrides = dict(parse_override(s) for s in args.override)
        out = run_probe(args.n, args.size, args.seed, overrides, args.patch)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
