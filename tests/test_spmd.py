"""Explicit shard_map+psum SPMD step: parity with the GSPMD jit path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from dgdm_histopath_tpu.parallel.spmd_step import make_spmd_train_step
from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

from conftest import make_synthetic_graph


def setup_trainer(mesh=None, use_mesh=False):
    model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                      num_diffusion_steps=3, attention_heads=4, graph_layers=1,
                      num_classes=2, use_hierarchical=False,
                      use_spatial_attention=False, compute_dtype="float32",
                      dropout=0.0)
    trainer = DGDMTrainer(model, TrainerConfig(
        learning_rate=1e-3, warmup_steps=1, pretrain_epochs=0,
        steps_per_epoch=10, scheduler_type="none"),
        mesh=mesh, use_mesh=use_mesh)
    return trainer


def labeled_batch(b=8):
    gs = []
    for i in range(b):
        g = make_synthetic_graph(seed=i, n_nodes=24, n_real=20, feat_dim=16)
        gs.append(g.replace(y=jnp.asarray(i % 2, jnp.int32)))
    return batch_graphs(gs)


class TestShardMapStep:
    def test_matches_gspmd_path(self):
        mesh = make_mesh(axes=("data",))
        batch = labeled_batch(8)

        # GSPMD path
        t1 = setup_trainer(mesh=mesh)
        t1.init_state(jax.random.PRNGKey(0), batch)
        # shard_map path with the same initial state
        t2 = setup_trainer(mesh=mesh)
        t2.init_state(jax.random.PRNGKey(0), batch)

        step = make_spmd_train_step(t2._finetune_losses, t2.tx, mesh)
        sharded = shard_batch(batch, mesh)

        m1 = t1.training_step(batch, epoch=1)
        state2, m2 = step(t2.state, sharded)

        # losses agree (supervised CE has no per-shard rng dependence)
        assert m1["loss"] == pytest.approx(float(m2["loss"]), rel=1e-5)
        p1 = jax.tree_util.tree_leaves(t1.state.params)
        p2 = jax.tree_util.tree_leaves(state2.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_multiple_steps_converge(self):
        mesh = make_mesh(axes=("data",))
        batch = labeled_batch(8)
        trainer = setup_trainer(mesh=mesh)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        step = make_spmd_train_step(trainer._finetune_losses, trainer.tx, mesh)
        sharded = shard_batch(batch, mesh)
        state = trainer.state
        losses = []
        for _ in range(10):
            state, m = step(state, sharded)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
