"""Windowed scaling configuration: the measured-fast setup for big buckets.

Demonstrates the full windowed stack (ADR-0004 add.9/add.10):

  * ``TissueGraphBuilder(spatial_sort=True, knn_window=W)`` — nodes in
    Morton order, BOTH kNN searches restricted to the ±1-block band, so
    every edge is addressable by banded compute (exact by construction);
  * ``DGDMModel(spatial_window=W, graph_window=W)`` — block-local spatial
    attention + banded message passing (attention/conv work scales as
    3W/N of the dense parity formulation);
  * ``DGDMPredictor`` deriving the matching graph-build config from the
    model automatically.

Measured on TPU v5e: 2.40× whole-step at DGDM-Large (windowed attention
alone; banded message passing stacks on top — see README performance
table). Accuracy gate vs the dense parity config: zero AUC delta on the
staged CAMELYON16 loop (docs/results/c16_ab_window32.json).

The equivalent config-file setup is ``configs/dgdm_large_windowed.yaml``.
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
from dgdm_histopath_tpu.ops.graph import batch_graphs, in_band_fraction
from dgdm_histopath_tpu.preprocessing import (
    SlideProcessor, TissueGraphBuilder, synthetic_slide,
)

WINDOW = 32  # production Large uses 128 on 2048-node buckets


def main():
    print("=== windowed scaling configuration ===")
    slide, _ = synthetic_slide(1024, 1024, num_levels=3, seed=0,
                               objective_power=20.0)
    processor = SlideProcessor(patch_size=64, tissue_threshold=0.4,
                               max_patches=200, stain_normalize=False)
    slide_data = processor.process_slide(slide, slide_id="demo")

    # band-built graph: Morton-sorted, every edge within the ±1-block band
    builder = TissueGraphBuilder(feature_extractor="none",
                                 node_buckets=[128, 256],
                                 spatial_sort=True, knn_window=WINDOW)
    graph = builder.build_graph(slide_data)
    frac = in_band_fraction(graph.nbr_idx, graph.nbr_mask, WINDOW)
    print(f"graph: {int(graph.n_real_nodes)} nodes, in-band edge fraction "
          f"= {frac:.3f} (1.0 -> banded compute is exact)")

    model = DGDMModel(node_features=graph.feature_dim, hidden_dims=(64, 32),
                      num_diffusion_steps=5, attention_heads=4,
                      graph_layers=2, num_classes=2, compute_dtype="float32",
                      spatial_window=WINDOW, graph_window=WINDOW)
    batched = batch_graphs([graph])
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, batched, mode="pretrain", deterministic=True)
    logits = model.apply(params, batched,
                         mode="inference")["classification_logits"]
    print(f"windowed forward OK: logits {np.asarray(logits).shape}")

    # the predictor derives spatial_sort/knn_window from the model
    predictor = DGDMPredictor(model=model, params=params, patch_size=64,
                              max_patches=200, feature_extractor="none",
                              tissue_threshold=0.4, stain_normalize=False,
                              node_buckets=[128, 256])
    assert predictor.graph_builder.knn_window == WINDOW
    result = predictor.predict_slide(slide, slide_id="demo")
    print(f"prediction: class {result['predicted_class']} "
          f"(confidence {result['confidence']:.2f})")
    print("done.")


if __name__ == "__main__":
    main()
