"""Dependency-light demo: synthetic graphs only (no slides, no cv2/PIL).

Parity with the reference's ``examples/basic_usage_simple.py`` (a demo that
runs with nothing but the core numeric stack; their version used synthetic
50-node × 768-d graphs).
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
import jax.numpy as jnp
import numpy as np

from dgdm_histopath_tpu.models import DGDMModel, create_model
from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
from dgdm_histopath_tpu.ops.knn import knn_euclidean
from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig


def synthetic_graph(seed: int, n_nodes: int = 64, n_real: int = 50,
                    feat_dim: int = 768) -> PaddedGraph:
    """Synthetic tissue graph: random 768-d features + spatial kNN edges."""
    rs = np.random.RandomState(seed)
    x = np.zeros((n_nodes, feat_dim), np.float32)
    x[:n_real] = rs.randn(n_real, feat_dim)
    pos = np.zeros((n_nodes, 2), np.float32)
    pos[:n_real] = rs.rand(n_real, 2)
    mask = np.zeros((n_nodes,), bool)
    mask[:n_real] = True
    idx, dist, valid = knn_euclidean(jnp.asarray(pos), jnp.asarray(mask), 8)
    return PaddedGraph(
        x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx, nbr_mask=valid,
        edge_attr=jnp.stack([dist, jnp.exp(-10 * dist), jnp.zeros_like(dist)], -1),
        node_mask=jnp.asarray(mask), y=jnp.asarray(seed % 2, jnp.int32))


def main():
    print("=== DGDM Histopath TPU — synthetic-graph demo ===")
    batch = batch_graphs([synthetic_graph(i) for i in range(4)])
    print(f"batch: {batch.x.shape[0]} graphs × {batch.num_nodes} nodes "
          f"({int(batch.n_real_nodes[0])} real) × {batch.feature_dim} features")

    model = create_model("dgdm-base", num_classes=2)
    trainer = DGDMTrainer(model, TrainerConfig(
        learning_rate=1e-4, warmup_steps=10, pretrain_epochs=1,
        steps_per_epoch=5), use_mesh=False)
    trainer.init_state(jax.random.PRNGKey(0), batch)

    print("-- self-supervised pretrain steps (diffusion + contrastive) --")
    for step in range(3):
        m = trainer.training_step(batch, epoch=0)
        print(f"  step {step}: loss={m['loss']:.4f} "
              f"(diffusion={m['diffusion_loss']:.4f})")

    print("-- supervised finetune steps (classification) --")
    for step in range(3):
        m = trainer.training_step(batch, epoch=1)
        print(f"  step {step}: loss={m['loss']:.4f} acc={m['accuracy']:.2f}")

    out = trainer.predict_step(batch)
    probs = jax.nn.softmax(out["classification_logits"].astype(jnp.float32), -1)
    print("predictions:", np.asarray(jnp.argmax(probs, -1)))
    print("attention over nodes available:", "attention_weights" in out)
    print("done.")


if __name__ == "__main__":
    main()
