"""Learning-capability validation: the full pipeline can actually fit.

The reference's published AUCs (BASELINE.md) require TCGA/CAMELYON16 data
that isn't available here; this is the strongest offline equivalent — a
synthetic slide-classification task with known signal, learned end-to-end
through the real pipeline (synthetic WSI → tissue graph → DGDM finetune).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.evaluation.metrics import compute_classification_metrics
from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

from conftest import make_synthetic_graph


def make_labeled_graph(seed, n_nodes=32, n_real=24, feat_dim=16):
    """Class 1 graphs get a +1.5 shift on the first 4 feature dims — a
    learnable but non-trivial slide-level signal."""
    g = make_synthetic_graph(seed=seed, n_nodes=n_nodes, n_real=n_real,
                             feat_dim=feat_dim)
    label = seed % 2
    if label == 1:
        x = np.array(g.x)          # writable copy (np.asarray view is read-only)
        x[:n_real, :4] += 1.5
        g = g.replace(x=jnp.asarray(x))
    return g.replace(y=jnp.asarray(label, jnp.int32))


@pytest.mark.slow
class TestLearning:
    def test_supervised_task_is_learned(self):
        model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                          num_diffusion_steps=3, attention_heads=4,
                          graph_layers=2, num_classes=2,
                          use_hierarchical=False, compute_dtype="float32",
                          dropout=0.0)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=3e-3, warmup_steps=5, pretrain_epochs=0,
            steps_per_epoch=8, scheduler_type="none"), use_mesh=False)

        train_batches = [batch_graphs([make_labeled_graph(s) for s in
                                       range(i * 8, i * 8 + 8)])
                         for i in range(4)]
        val_batch = batch_graphs([make_labeled_graph(s)
                                  for s in range(100, 116)])
        trainer.init_state(jax.random.PRNGKey(0), train_batches[0])

        for epoch in range(15):
            for b in train_batches:
                trainer.training_step(b, epoch=1)   # finetune phase

        out = trainer.validation_step(val_batch, epoch=1)
        acc = float(out["accuracy"])
        probs = np.asarray(out["probabilities"])
        labels = np.asarray(val_batch.y)
        metrics = compute_classification_metrics(labels, probs)
        assert acc >= 0.9, f"val accuracy {acc}"
        assert metrics["auc"] >= 0.95, f"val AUC {metrics['auc']}"

    def test_supervised_task_is_learned_windowed(self):
        """Accuracy proxy for the windowed-attention approximation
        (ADR-0004 add.9): block-local spatial attention on Morton-sorted
        graphs must still learn the synthetic slide-level signal."""
        from dgdm_histopath_tpu.parallel.halo import spatial_sort

        model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                          num_diffusion_steps=3, attention_heads=4,
                          graph_layers=2, num_classes=2,
                          use_hierarchical=False, compute_dtype="float32",
                          dropout=0.0, spatial_window=8)   # N=32 -> 4 blocks
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=3e-3, warmup_steps=5, pretrain_epochs=0,
            steps_per_epoch=8, scheduler_type="none"), use_mesh=False)

        def sorted_labeled(seed):
            return spatial_sort(make_labeled_graph(seed))

        train_batches = [batch_graphs([sorted_labeled(s) for s in
                                       range(i * 8, i * 8 + 8)])
                         for i in range(4)]
        val_batch = batch_graphs([sorted_labeled(s)
                                  for s in range(100, 116)])
        trainer.init_state(jax.random.PRNGKey(0), train_batches[0])
        for epoch in range(15):
            for b in train_batches:
                trainer.training_step(b, epoch=1)
        out = trainer.validation_step(val_batch, epoch=1)
        acc = float(out["accuracy"])
        probs = np.asarray(out["probabilities"])
        metrics = compute_classification_metrics(
            np.asarray(val_batch.y), probs)
        assert acc >= 0.9, f"windowed val accuracy {acc}"
        assert metrics["auc"] >= 0.95, f"windowed val AUC {metrics['auc']}"

    def test_supervised_task_is_learned_moe(self):
        """Accuracy gate for the MoE tier: a moe_experts=4 model (top-1
        Switch routing, aux loss on) must learn the same synthetic
        slide-level signal the dense model does."""
        model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                          num_diffusion_steps=3, attention_heads=4,
                          graph_layers=2, num_classes=2,
                          use_hierarchical=False, compute_dtype="float32",
                          dropout=0.0, moe_experts=4)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=3e-3, warmup_steps=5, pretrain_epochs=0,
            steps_per_epoch=8, scheduler_type="none"), use_mesh=False)

        train_batches = [batch_graphs([make_labeled_graph(s) for s in
                                       range(i * 8, i * 8 + 8)])
                         for i in range(4)]
        val_batch = batch_graphs([make_labeled_graph(s)
                                  for s in range(100, 116)])
        trainer.init_state(jax.random.PRNGKey(0), train_batches[0])
        for epoch in range(15):
            for b in train_batches:
                trainer.training_step(b, epoch=1)
        out = trainer.validation_step(val_batch, epoch=1)
        acc = float(out["accuracy"])
        probs = np.asarray(out["probabilities"])
        metrics = compute_classification_metrics(
            np.asarray(val_batch.y), probs)
        assert acc >= 0.9, f"moe val accuracy {acc}"
        assert metrics["auc"] >= 0.95, f"moe val AUC {metrics['auc']}"

    def test_survival_task_is_learned(self):
        """Synthetic hazard: risk increases with the mean of the first 4
        feature dims → shorter survival time. Cox training must rank-order
        (C-index > 0.8). (VERDICT r1 next-round item #7.)"""
        def make_survival_graph(seed):
            rs = np.random.RandomState(seed)
            g = make_synthetic_graph(seed=seed, n_nodes=32, n_real=24,
                                     feat_dim=16)
            shift = rs.uniform(-1.5, 1.5)
            x = np.array(g.x)
            x[:24, :4] += shift
            # high shift → high hazard → early event
            time = float(np.exp(-shift) * 10.0 + rs.uniform(0, 0.5))
            event = 1.0
            return g.replace(x=jnp.asarray(x),
                             y=jnp.asarray([time, event], jnp.float32))

        model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                          num_diffusion_steps=3, attention_heads=4,
                          graph_layers=2, survival_mode="cox",
                          use_hierarchical=False, compute_dtype="float32",
                          dropout=0.0)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=3e-3, warmup_steps=5, pretrain_epochs=0,
            steps_per_epoch=8, scheduler_type="none"), use_mesh=False)
        assert trainer.task == "survival"

        train_batches = [batch_graphs([make_survival_graph(s) for s in
                                       range(i * 8, i * 8 + 8)])
                         for i in range(4)]
        val_batches = [batch_graphs([make_survival_graph(s)
                                     for s in range(100 + i * 8, 108 + i * 8)])
                       for i in range(2)]
        trainer.init_state(jax.random.PRNGKey(0), train_batches[0])

        result = trainer.fit(train_batches * 4, val_batches, max_epochs=4)
        cindex = result["history"][-1]["val_cindex"]
        assert np.isfinite(result["history"][-1]["val_loss"])
        assert cindex > 0.8, f"val C-index {cindex}"

    def test_pretrain_improves_diffusion_loss(self):
        model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                          num_diffusion_steps=3, attention_heads=4,
                          graph_layers=1, use_hierarchical=False,
                          use_spatial_attention=False,
                          compute_dtype="float32", dropout=0.0)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=5, pretrain_epochs=100,
            steps_per_epoch=10, use_contrastive_loss=False,
            reconstruction_weight=0.0, scheduler_type="none"), use_mesh=False)
        batch = batch_graphs([make_labeled_graph(s) for s in range(8)])
        trainer.init_state(jax.random.PRNGKey(0), batch)
        first = [trainer.training_step(batch, 0)["diffusion_loss"]
                 for _ in range(5)]
        for _ in range(40):
            trainer.training_step(batch, 0)
        last = [trainer.training_step(batch, 0)["diffusion_loss"]
                for _ in range(5)]
        assert np.mean(last) < np.mean(first) * 0.8, (np.mean(first),
                                                      np.mean(last))
