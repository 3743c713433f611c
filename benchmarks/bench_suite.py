"""Benchmark suite: per-stage throughput/latency on the current backend.

The reference shipped no benchmark harness at all (SURVEY §6); this measures
every pipeline stage the published claims reference:

  * stain normalization (patches/sec, batched Macenko)
  * patch featurization (patches/sec, ViT forward)
  * kNN graph construction (graphs/sec)
  * training step (graphs/sec, DGDM-Base pretrain)
  * inference step (slides/sec, DGDM-Base forward)

Usage: python benchmarks/bench_suite.py [--stages stain,feat,knn,train,infer]
Prints one JSON object per stage.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(out):
    """Force real completion: on the axon tunnel, ``block_until_ready``
    returns after dispatch, not execution (bench.py timing note) — only a
    device->host fetch waits for the device."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                              else leaf))


def _time(fn, warmup=2, iters=10):
    """Two-point slope timing with forced fetch (cancels dispatch/fetch
    overheads; robust to the tunnel's async dispatch)."""
    for _ in range(warmup):
        out = fn()
    _sync(out)
    n1, n2 = max(iters // 2, 3), iters * 2

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        _sync(out)
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def bench_stain(batch=256, size=256):
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.preprocessing.stain_normalization import (
        DEFAULT_MAX_CONCENTRATIONS, DEFAULT_STAIN_MATRIX,
        macenko_normalize_batch,
    )
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.randint(30, 250, (batch, size, size, 3)), jnp.float32)
    ref_s = jnp.asarray(DEFAULT_STAIN_MATRIX)
    ref_c = jnp.asarray(DEFAULT_MAX_CONCENTRATIONS)
    dt = _time(lambda: macenko_normalize_batch(imgs, ref_s, ref_c))
    return {"stage": "stain_normalization", "value": round(batch / dt, 1),
            "unit": f"patches/sec ({size}px, batched macenko)"}


def bench_featurize(batch=64, size=224):
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor
    ext = PatchFeatureExtractor(arch="dinov2", batch_size=batch,
                                image_size=size)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
    dt = _time(lambda: ext._apply(ext.params, x))
    return {"stage": "patch_featurization", "value": round(batch / dt, 1),
            "unit": "patches/sec (ViT-Base bf16)"}


def bench_featsplit(batch=128, patch=256, size=224):
    """Decompose the fused featurize call: stain-norm vs resize+normalize vs
    ViT forward — identifies which stage bounds slides/hour."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor
    from dgdm_histopath_tpu.preprocessing.stain_normalization import (
        DEFAULT_MAX_CONCENTRATIONS, DEFAULT_STAIN_MATRIX,
        macenko_normalize_batch,
    )
    rs = np.random.RandomState(0)
    u8 = jnp.asarray(rs.randint(30, 250, (batch, patch, patch, 3)), jnp.uint8)
    f32 = u8.astype(jnp.float32)
    ref_s = jnp.asarray(DEFAULT_STAIN_MATRIX)
    ref_c = jnp.asarray(DEFAULT_MAX_CONCENTRATIONS)

    res = {}
    for name, stats_px in (("stain_full", 0), ("stain_sub4k", 4096)):
        f = jax.jit(lambda x, sp=stats_px: macenko_normalize_batch(
            x, ref_s, ref_c, stats_pixels=sp))
        res[name + "_ms"] = round(_time(lambda: f(f32)) * 1e3, 2)

    ext = PatchFeatureExtractor(arch="dinov2", batch_size=batch,
                                image_size=size)
    x224 = jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
    res["vit_fwd_ms"] = round(_time(lambda: ext._apply(ext.params, x224)) * 1e3, 2)

    ext_f = PatchFeatureExtractor(arch="dinov2", batch_size=batch,
                                  image_size=size,
                                  stain_normalize_on_device=True)
    res["fused_total_ms"] = round(_time(lambda: ext_f._fused(ext_f.params, u8)) * 1e3, 2)
    res["patches_per_sec_fused"] = round(batch / (res["fused_total_ms"] / 1e3), 1)
    return {"stage": "featurize_decomposition", **res,
            "unit": f"ms per {batch}-patch batch ({patch}px in, {size}px ViT)"}


def bench_knn(n=1024, feat=768):
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.ops.knn import build_dual_knn
    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.rand(n, 2), jnp.float32)
    feats = jnp.asarray(rs.randn(n, feat), jnp.float32)
    mask = jnp.ones((n,), bool)
    dt = _time(lambda: build_dual_knn(pos, feats, mask)["nbr_idx"])
    return {"stage": "knn_graph_construction", "value": round(1.0 / dt, 2),
            "unit": f"graphs/sec ({n} nodes, spatial+morphological)"}


def _base_setup(batch=4, nodes=1024):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
    from dgdm_histopath_tpu.ops.knn import knn_euclidean
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    def mk(seed):
        rs = np.random.RandomState(seed)
        x = rs.randn(nodes, 768).astype(np.float32)
        pos = rs.rand(nodes, 2).astype(np.float32)
        mask = jnp.ones((nodes,), bool)
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), mask, 8)
        return PaddedGraph(
            x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx,
            nbr_mask=valid,
            edge_attr=jnp.stack([dist, jnp.exp(-10 * dist),
                                 jnp.zeros_like(dist)], -1),
            node_mask=mask, y=jnp.asarray(seed % 2, jnp.int32))

    model = DGDMModel(node_features=768, hidden_dims=(512, 256, 128),
                      num_diffusion_steps=10, attention_heads=8,
                      graph_layers=4, num_classes=2)
    b = batch_graphs([mk(i) for i in range(batch)])
    trainer = DGDMTrainer(model, TrainerConfig(warmup_steps=10,
                                               pretrain_epochs=10,
                                               steps_per_epoch=100),
                          use_mesh=False)
    trainer.init_state(jax.random.PRNGKey(0), b)
    return trainer, b, batch


def bench_train(batch=4, nodes=1024):
    trainer, b, batch_n = _base_setup(batch, nodes)
    step = trainer._get_step_fn("pretrain", b)
    state = trainer.state

    def run():
        nonlocal state
        state, metrics = step(state, b)
        return metrics["loss"]

    dt = _time(run, warmup=2, iters=20)
    return {"stage": "train_step", "value": round(batch_n / dt, 2),
            "unit": f"graphs/sec (DGDM-Base pretrain, {nodes} nodes)"}


def bench_infer(batch=4, nodes=1024):
    import jax
    trainer, b, batch_n = _base_setup(batch, nodes)
    fwd = jax.jit(lambda p, g: trainer.model.apply(
        p, g, mode="inference", deterministic=True)["classification_logits"])
    params = trainer.state.params
    dt = _time(lambda: fwd(params, b), warmup=2, iters=20)
    return {"stage": "inference_forward", "value": round(batch_n / dt, 2),
            "unit": f"slides/sec (DGDM-Base, {nodes}-node graphs)"}


def _evict_page_cache(path) -> bool:
    """Drop this file's pages from the OS page cache (posix_fadvise
    DONTNEED — per-file, no root). Returns False when unsupported."""
    import os
    try:
        os.sync()                       # DONTNEED only evicts clean pages
        fd = os.open(str(path), os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
        return True
    except (AttributeError, OSError):
        return False


def bench_e2e(slides=4, width=24576, patch=256, max_patches=1000,
              extractor="dinov2", cache_dir="benchmarks/.slides",
              distinct=1, cold=True, fixture="h5raw"):
    """End-to-end predict_slide on ON-DISK gigapixel-scale slides
    (dgdm_wsi HDF5; default 24.5k×24.5k level-0 — three orders of magnitude
    above the round-1 toy), decode/compute pipelined.

    The BASELINE.md north-star metric (slides/hour/chip; reference implied
    ~100/hour: 30 s preprocess + 5 s inference, README.md:275-277). The
    breakdown proves overlap: ``sum_stages_s > total_s`` means host decode
    ran concurrently with device featurization.

    ``cold=True`` (the default headline, VERDICT r2 #9) evicts each slide's
    pages from the OS cache immediately before its measured read, so the
    number is the deployment bound (every byte pulled from disk), not the
    page-cache bound. ``e2e_warm`` keeps the old warm-cache protocol.
    """
    import jax
    import numpy as np
    from dgdm_histopath_tpu.evaluation import DGDMPredictor
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor
    from dgdm_histopath_tpu.ops.graph import batch_graphs
    from dgdm_histopath_tpu.preprocessing import (
        SlideProcessor, TissueGraphBuilder,
    )
    from dgdm_histopath_tpu.preprocessing.synthetic import (
        write_synthetic_slide_hdf5, write_synthetic_slide_tiff)

    # gigapixel fixtures are expensive to render — cache across runs
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    paths = []
    gen_s = 0.0
    for i in range(distinct):
        if fixture == "jpeg_tiff":
            # the REAL .svs container: 256-px JPEG tiles in a BigTIFF —
            # deployment slides pay a JPEG decode per tile that the
            # uncompressed dgdm_wsi headline never sees (VERDICT r3 #6)
            p = cache / f"synthetic_{width}px_jpeg_seed{i}.svs"
            if not p.exists():
                t = time.perf_counter()
                write_synthetic_slide_tiff(p, width=width, height=width,
                                           num_levels=5, band=2048, seed=i,
                                           compression="jpeg",
                                           jpeg_quality=85)
                gen_s += time.perf_counter() - t
            paths.append(p)
            continue
        # uncompressed chunks: the A/B over {gzip2,lzf}×{256,512} vs raw
        # measured 74/82/69/85 vs 137 patches/s decode on the 1-core host —
        # h5py read machinery, not decompression, is the floor, and raw
        # still wins ~1.7x (run bw02rahz2, 8192px, 500-patch grid)
        p = cache / f"synthetic_{width}px_raw_seed{i}.h5"
        if not p.exists():
            t = time.perf_counter()
            write_synthetic_slide_hdf5(p, width=width, height=width,
                                       num_levels=5, tile=2048, seed=i,
                                       compression=None, chunk_px=512)
            gen_s += time.perf_counter() - t
        paths.append(p)

    # fused path: stain-norm happens on device inside featurization;
    # batch 128 → ≥8 pipeline stages per 1000-patch slide (overlap granularity)
    ext = PatchFeatureExtractor(arch=extractor, batch_size=128,
                                stain_normalize_on_device=True)
    model = DGDMModel(node_features=ext.feature_dim,
                      hidden_dims=(512, 256, 128), num_diffusion_steps=10,
                      attention_heads=8, graph_layers=4, num_classes=2)
    proc = SlideProcessor(patch_size=patch, tissue_threshold=0.3,
                          max_patches=max_patches, stain_normalize=False)
    builder = TissueGraphBuilder(extractor=ext,
                                 node_buckets=[512, 1024, 2048])
    data0 = proc.process_slide(paths[0], slide_id="warm")
    g0 = builder.build_graph(data0)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch_graphs([g0]), mode="pretrain",
                        deterministic=True)
    pred = DGDMPredictor(model=model, params=params, patch_size=patch,
                         max_patches=max_patches, tissue_threshold=0.3)
    pred.graph_builder = builder
    pred.processor = proc
    pred.predict_slide(paths[0], slide_id="warmup")   # compile everything

    evicted = True
    agg = {}
    total = 0.0
    for i in range(slides):
        p = paths[i % distinct]
        if cold:
            evicted = _evict_page_cache(p) and evicted
        t0 = time.perf_counter()
        r = pred.predict_slide(p, slide_id=f"s{i}", pipelined=True)
        total += time.perf_counter() - t0
        for k, v in r["pipeline_timings"].items():
            agg[k] = agg.get(k, 0.0) + v
    dt = total / slides
    breakdown = {k: round(v / slides, 3) for k, v in agg.items()}
    stage_sum = sum(v for k, v in breakdown.items() if k != "total_s")
    protocol = ("cold_page_cache(fadvise_dontneed)" if cold and evicted
                else "cold_requested_but_fadvise_unavailable" if cold
                else "warm_page_cache")
    container = ("JPEG-tiled .svs" if fixture == "jpeg_tiff"
                 else "on-disk HDF5")
    return {"stage": "end_to_end_predict_slide"
                     + ("_jpeg" if fixture == "jpeg_tiff" else "")
                     + ("" if cold else "_warm"),
            "value": round(3600.0 / dt, 1),
            "unit": f"slides/hour/chip ({width}px {container} slide, "
                    f"≤{max_patches} patches, {extractor}, stain-norm fused)",
            "cache_protocol": protocol,
            "seconds_per_slide": round(dt, 2),
            "breakdown_s": breakdown,
            "sum_stages_s": round(stage_sum, 3),
            "overlap_evidence": round(stage_sum - breakdown.get("total_s", 0.0), 3),
            "fixture_gen_s": round(gen_s, 1)}


def bench_e2e_fleet(slides=4, width=24576, patch=256, max_patches=1000,
                    extractor="dinov2", cache_dir="benchmarks/.slides",
                    host_resize=False):
    """Cold multi-slide throughput through ``predict_slides``: DISTINCT
    slides, all evicted from the page cache up front, processed as one
    fleet so the one-ahead open/readahead (predictor.predict_slides) can
    hide slide i+1's disk reads behind slide i's device time. Compare
    against ``e2e`` (per-slide cold, no cross-slide overlap) — the delta is
    the hidden IO."""
    import jax
    from dgdm_histopath_tpu.evaluation import DGDMPredictor
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.models.vit import PatchFeatureExtractor
    from dgdm_histopath_tpu.ops.graph import batch_graphs
    from dgdm_histopath_tpu.preprocessing import (
        SlideProcessor, TissueGraphBuilder,
    )
    from dgdm_histopath_tpu.preprocessing.synthetic import (
        write_synthetic_slide_hdf5)

    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    paths, gen_s = [], 0.0
    for i in range(slides):
        p = cache / f"synthetic_{width}px_raw_seed{i}.h5"
        if not p.exists():
            t = time.perf_counter()
            write_synthetic_slide_hdf5(p, width=width, height=width,
                                       num_levels=5, tile=2048, seed=i,
                                       compression=None, chunk_px=512)
            gen_s += time.perf_counter() - t
        paths.append(p)

    ext = PatchFeatureExtractor(arch=extractor, batch_size=128,
                                stain_normalize_on_device=True,
                                host_resize_upload=host_resize)
    model = DGDMModel(node_features=ext.feature_dim,
                      hidden_dims=(512, 256, 128), num_diffusion_steps=10,
                      attention_heads=8, graph_layers=4, num_classes=2)
    proc = SlideProcessor(patch_size=patch, tissue_threshold=0.3,
                          max_patches=max_patches, stain_normalize=False)
    builder = TissueGraphBuilder(extractor=ext,
                                 node_buckets=[512, 1024, 2048])
    data0 = proc.process_slide(paths[0], slide_id="warm")
    g0 = builder.build_graph(data0)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch_graphs([g0]), mode="pretrain",
                        deterministic=True)
    pred = DGDMPredictor(model=model, params=params, patch_size=patch,
                         max_patches=max_patches, tissue_threshold=0.3)
    pred.graph_builder = builder
    pred.processor = proc
    pred.predict_slide(paths[0], slide_id="warmup")   # compile everything

    evicted = all(_evict_page_cache(p) for p in paths)
    t0 = time.perf_counter()
    results = pred.predict_slides(paths, pipelined=True)
    total = time.perf_counter() - t0
    dt = total / slides
    agg = {}
    for r in results:
        for k, v in r["pipeline_timings"].items():
            agg[k] = agg.get(k, 0.0) + v
    return {"stage": "end_to_end_fleet",
            "value": round(3600.0 / dt, 1),
            "unit": f"slides/hour/chip ({width}px, {slides} distinct cold "
                    f"slides, one-ahead readahead, {extractor}"
                    + (", host-resize upload" if host_resize else "") + ")",
            "cache_protocol": ("cold_page_cache(fadvise_dontneed)" if evicted
                               else "cold_requested_but_fadvise_unavailable"),
            "seconds_per_slide": round(dt, 2),
            "breakdown_s": {k: round(v / slides, 3) for k, v in agg.items()},
            "fixture_gen_s": round(gen_s, 1)}


STAGES = {"stain": bench_stain, "feat": bench_featurize,
          "featsplit": bench_featsplit, "knn": bench_knn,
          "train": bench_train, "infer": bench_infer,
          "e2e": bench_e2e,                                   # cold (headline)
          "e2e_jpeg": lambda: bench_e2e(fixture="jpeg_tiff"),  # real .svs container
          "e2e_warm": lambda: bench_e2e(cold=False),
          "e2e_fleet": bench_e2e_fleet,                       # cross-slide overlap
          "e2e_fleet_hr": lambda: bench_e2e_fleet(host_resize=True)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="stain,knn,train,infer")
    args = p.parse_args()
    import jax
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}))
    for name in args.stages.split(","):
        fn = STAGES.get(name.strip())
        if fn is None:
            continue
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"stage": name, "error": str(exc)}), flush=True)


if __name__ == "__main__":
    main()
