"""Basic usage: synthetic slide → graph → model → prediction.

Parity with the reference's ``examples/basic_usage_simple.py`` (dependency-
free demo on synthetic data) — runs end-to-end without any external files.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    # the image's sitecustomize pins jax_platforms=axon programmatically;
    # honor a JAX_PLATFORMS=cpu request made via the environment
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from dgdm_histopath_tpu.evaluation import DGDMPredictor
from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.preprocessing import (
    SlideProcessor, TissueGraphBuilder, synthetic_slide,
)


def main():
    print("=== DGDM Histopath TPU — basic usage ===")
    print(f"devices: {jax.devices()}")

    # 1. synthetic whole-slide image (no external data needed)
    slide, _ = synthetic_slide(1024, 1024, num_levels=3, seed=0,
                               objective_power=20.0)
    print("created synthetic 1024x1024 H&E pyramid")

    # 2. preprocess: tissue detection + tiling (stain-norm off for speed here)
    processor = SlideProcessor(patch_size=64, tissue_threshold=0.4,
                               max_patches=100, stain_normalize=False)
    slide_data = processor.process_slide(slide, slide_id="demo")
    print(f"extracted {slide_data.num_patches} tissue patches "
          f"(tissue fraction {slide_data.metadata['tissue_fraction']:.2f})")

    # 3. build the tissue graph (placeholder features keep the demo light;
    #    switch to feature_extractor='dinov2' for the ViT path)
    builder = TissueGraphBuilder(feature_extractor="none",
                                 node_buckets=[128, 256])
    graph = builder.build_graph(slide_data)
    print(f"graph: {int(graph.n_real_nodes)} nodes in a {graph.num_nodes}-node "
          f"bucket, {graph.max_neighbors} neighbor slots")

    # 4. a small DGDM model
    model = DGDMModel(node_features=graph.feature_dim, hidden_dims=(64, 32),
                      num_diffusion_steps=5, attention_heads=4, graph_layers=2,
                      num_classes=2, compute_dtype="float32")
    batched = batch_graphs([graph])
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, batched, mode="pretrain", deterministic=True)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e3:.1f}k parameters")

    # 5. end-to-end prediction via the Predictor API
    predictor = DGDMPredictor(model=model, params=params, patch_size=64,
                              max_patches=100, feature_extractor="none",
                              tissue_threshold=0.4, stain_normalize=False,
                              node_buckets=[128, 256])
    result = predictor.predict_slide(slide, slide_id="demo")
    print(f"prediction: class {result['predicted_class']} "
          f"(confidence {result['confidence']:.2f}, "
          f"entropy {result['uncertainty']['entropy']:.3f})")
    print(f"top biomarker region: {result['biomarkers'][0]['position']}")
    print("done.")


if __name__ == "__main__":
    main()
