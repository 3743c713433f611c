"""Featurization bound analysis: transfer vs compute on the real chip.

Warm-cache e2e is featurize-bound (README: 3.2 s device featurize vs 2.4 s
decode for ~1000 patches). This isolates where that time goes:

  * ``compute``  — ViT forward on device-resident uint8 batches (no host
    transfer in the timed region);
  * ``e2e``      — the production ``extract()`` path: host numpy → device
    uint8 upload → fused stain-norm+resize+forward → single fetch.

Timing discipline per CLAUDE.md: the axon tunnel returns from
``block_until_ready`` after dispatch, so every measurement ends in a forced
device→host fetch and per-item cost is a two-point slope between run
lengths (cancels the fixed dispatch+fetch overhead).

Prints one JSON line with patches/s for both modes and the implied
transfer share.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fetch_sync(x):
    return float(np.asarray(x.ravel()[0]))


def ab_int8(args, base_ext, dev):
    """Paired bf16-vs-int8 device-compute A/B on the same weights.

    Measures the pure device forward (no host transfer in the timed region)
    because that is what the int8 MXU path changes; the tunnel's upload
    bound is unaffected (uint8 uploads either way). Also reports the
    cross-path feature cosine so the speed number always travels with its
    accuracy cost.
    """
    import jax
    import jax.numpy as jnp

    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor

    if base_ext.quant is not None:
        base_ext = PatchFeatureExtractor(
            arch=args.arch, batch_size=args.batch,
            stain_normalize_on_device=args.stain, params=base_ext.params)
    q_ext = PatchFeatureExtractor(
        arch=args.arch, batch_size=args.batch,
        stain_normalize_on_device=args.stain, params=base_ext.params,
        quant="int8")

    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, (args.batch, args.patch_px, args.patch_px, 3),
                        dtype=np.uint8)
    dev_chunk = jax.device_put(jnp.asarray(host), dev)

    feats = {}
    rows = []
    for tag, ext in (("bf16", base_ext), ("int8", q_ext)):
        fwd_params = ext._qparams if ext.quant == "int8" else ext.params
        out = ext._fused(fwd_params, dev_chunk)     # compile + warmup
        feats[tag] = np.asarray(out)

        def run(k):
            t0 = time.perf_counter()
            outs = [ext._fused(fwd_params, dev_chunk) for _ in range(k)]
            fetch_sync(outs[-1])
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(args.n1), run(args.n2)
        per_batch = (t2 - t1) / (args.n2 - args.n1)
        rows.append({"tag": tag, "per_batch_s": round(per_batch, 4),
                     "patches_per_s": round(args.batch / per_batch, 1)})
        print(json.dumps(rows[-1]), file=sys.stderr)

    a, b = feats["bf16"], feats["int8"]
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1) + 1e-12)
    print(json.dumps({
        "metric": "ab_featurize_int8", "arch": args.arch,
        "batch": args.batch, "patch_px": args.patch_px, "device": str(dev),
        "rows": rows,
        "speedup": round(rows[0]["per_batch_s"] / rows[1]["per_batch_s"], 3),
        "feature_cosine_min": round(float(cos.min()), 5),
        "feature_cosine_mean": round(float(cos.mean()), 5),
        "timing": "forced-fetch two-point slope, paired in one process",
    }))


def ab_stain(args, dev):
    """Paired device-compute A/B: fused stain-norm+ViT vs ViT alone.

    Isolates the per-patch Macenko share of the featurize program (vmapped
    3×3 eigh + lstsq + OD transforms per patch) from the transformer
    itself, so optimization effort aims at the measured term.
    """
    import jax
    import jax.numpy as jnp

    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor

    base = PatchFeatureExtractor(arch=args.arch, batch_size=args.batch,
                                 stain_normalize_on_device=True)
    plain = PatchFeatureExtractor(arch=args.arch, batch_size=args.batch,
                                  stain_normalize_on_device=False,
                                  params=base.params)
    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, (args.batch, args.patch_px, args.patch_px, 3),
                        dtype=np.uint8)
    dev_chunk = jax.device_put(jnp.asarray(host), dev)

    rows = []
    for tag, ext in (("stain+vit", base), ("vit_only", plain)):
        out = ext._fused(ext.params, dev_chunk)
        fetch_sync(out)

        def run(k, ext=ext):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = ext._fused(ext.params, dev_chunk)
            fetch_sync(out)
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(args.n1), run(args.n2)
        per_batch = (t2 - t1) / (args.n2 - args.n1)
        rows.append({"tag": tag, "per_batch_s": round(per_batch, 4),
                     "patches_per_s": round(args.batch / per_batch, 1)})
        print(json.dumps(rows[-1]), file=sys.stderr)
    stain_s = rows[0]["per_batch_s"] - rows[1]["per_batch_s"]
    print(json.dumps({
        "metric": "ab_featurize_stain_share", "arch": args.arch,
        "batch": args.batch, "patch_px": args.patch_px, "device": str(dev),
        "rows": rows,
        "stain_share": round(stain_s / rows[0]["per_batch_s"], 3),
        "stain_ms_per_batch": round(stain_s * 1e3, 2),
        "timing": "forced-fetch two-point slope, paired in one process"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="dinov2")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--patch-px", type=int, default=256)
    ap.add_argument("--n1", type=int, default=8, help="batches, short run")
    ap.add_argument("--n2", type=int, default=24, help="batches, long run")
    ap.add_argument("--stain", action="store_true", default=True)
    ap.add_argument("--no-stain", dest="stain", action="store_false")
    ap.add_argument("--host-resize", action="store_true",
                    help="resize to 224 on host before upload (cuts upload "
                         "bytes 23%% on the transfer-bound tunnel; device "
                         "stain norm then runs on the resized pixels)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quant", choices=["int8"], default=None,
                    help="run the w8a8 int8 inference engine "
                         "(models/vit_int8.py) instead of the bf16 module")
    ap.add_argument("--ab-int8", action="store_true",
                    help="paired device-compute A/B: bf16 module vs int8 "
                         "engine on the SAME weights (back-to-back in one "
                         "process; only the paired delta is meaningful)")
    ap.add_argument("--ab-stain", action="store_true",
                    help="paired device-compute A/B: fused stain+ViT vs "
                         "ViT alone — isolates the Macenko share")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor

    dev = jax.devices()[0]
    ext = PatchFeatureExtractor(arch=args.arch, batch_size=args.batch,
                                stain_normalize_on_device=args.stain,
                                host_resize_upload=args.host_resize,
                                quant=args.quant)

    if args.ab_int8:
        ab_int8(args, ext, dev)
        return
    if args.ab_stain:
        ab_stain(args, dev)
        return

    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, (args.batch, args.patch_px, args.patch_px, 3),
                        dtype=np.uint8)
    dev_chunk = jax.device_put(jnp.asarray(host), dev)

    # warmup/compile
    t0 = time.perf_counter()
    f, _ = ext.dispatch(host)
    fetch_sync(f)
    compile_s = time.perf_counter() - t0

    fwd_params = ext._qparams if ext.quant == "int8" else ext.params

    def run_compute(k):
        t0 = time.perf_counter()
        outs = [ext._fused(fwd_params, dev_chunk) for _ in range(k)]
        for o in outs:
            pass
        fetch_sync(outs[-1])          # forced fetch ends the timing
        return time.perf_counter() - t0

    def run_e2e(k):
        t0 = time.perf_counter()
        pending = [ext.dispatch(host) for _ in range(k)]
        ext.materialize(pending)      # single full fetch (production path)
        return time.perf_counter() - t0

    results = {}
    for name, fn in [("compute", run_compute), ("e2e", run_e2e)]:
        fn(2)                          # steady-state warmup
        t1 = fn(args.n1)
        t2 = fn(args.n2)
        per_batch = (t2 - t1) / (args.n2 - args.n1)
        results[name] = {
            "per_batch_s": round(per_batch, 4),
            "patches_per_s": round(args.batch / per_batch, 1),
            "t_short_s": round(t1, 3), "t_long_s": round(t2, 3),
        }

    tr = results["e2e"]["per_batch_s"] - results["compute"]["per_batch_s"]
    up_px = ext.image_size if args.host_resize else args.patch_px
    mb = (args.batch * up_px * up_px * 3) / 2**20
    print(json.dumps({
        "metric": "featurize_throughput",
        "arch": args.arch, "batch": args.batch, "patch_px": args.patch_px,
        "device": str(dev), "compile_s": round(compile_s, 1),
        **{f"{k}_{kk}": vv for k, r in results.items() for kk, vv in r.items()},
        "implied_transfer_s_per_batch": round(tr, 4),
        "upload_mb_per_batch": round(mb, 1),
        "implied_upload_mb_s": round(mb / tr, 1) if tr > 1e-4 else None,
        "transfer_share_pct": round(100 * tr / results["e2e"]["per_batch_s"], 1),
        "timing": "forced-fetch two-point slope",
    }))


if __name__ == "__main__":
    main()
