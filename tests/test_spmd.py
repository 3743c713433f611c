"""Explicit shard_map+psum SPMD step: parity with the GSPMD jit path."""

from pathlib import Path

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
    @pytest.mark.slow
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

    @pytest.mark.slow
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


class TestBandedUnderDP:
    """Banded message passing + windowed attention must compose with the
    DP mesh: the node-axis block reshapes are shard-local (batch is the
    sharded axis), so mesh and single-device runs agree."""

    @pytest.mark.slow
    def test_banded_dp_matches_single_device(self):
        from dgdm_histopath_tpu.parallel.halo import spatial_sort

        def banded_trainer(mesh, use_mesh):
            model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                              num_diffusion_steps=3, attention_heads=4,
                              graph_layers=1, num_classes=2,
                              use_hierarchical=False,
                              use_spatial_attention=True,
                              compute_dtype="float32", dropout=0.0,
                              graph_window=8, spatial_window=8)
            return DGDMTrainer(model, TrainerConfig(
                learning_rate=1e-3, warmup_steps=1, pretrain_epochs=0,
                steps_per_epoch=10, scheduler_type="none",
                # graphs here are Morton-sorted but not band-built; the
                # mesh-vs-solo parity being tested is unaffected by which
                # edges the band drops (both arms drop the same ones)
                allow_out_of_band_graphs=True),
                mesh=mesh, use_mesh=use_mesh)

        gs = [spatial_sort(make_synthetic_graph(
            seed=i, n_nodes=32, n_real=28, feat_dim=16).replace(
            y=jnp.asarray(i % 2, jnp.int32))) for i in range(8)]
        batch = batch_graphs(gs)

        mesh = make_mesh(axes=("data",))
        t_mesh = banded_trainer(mesh, True)
        t_mesh.init_state(jax.random.PRNGKey(0), batch)
        t_solo = banded_trainer(None, False)
        t_solo.init_state(jax.random.PRNGKey(0), batch)

        m1 = t_mesh.training_step(shard_batch(batch, mesh), epoch=1)
        m2 = t_solo.training_step(batch, epoch=1)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  rel=1e-5)
        # atol 1e-4, not 1e-5: Adam's grad/sqrt(v) normalization amplifies
        # mesh-vs-solo reduction-order fp noise on near-zero first-step
        # grads (observed 1.1e-5 on zero-init biases); the loss equality
        # above is the tight functional check
        for a, b in zip(jax.tree_util.tree_leaves(t_mesh.state.params),
                        jax.tree_util.tree_leaves(t_solo.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


class TestTensorParallel:
    """2-D ('data','model') mesh: TP param layout (parallel/tp.py)."""

    def test_param_specs_pair_bias_with_kernel(self):
        from jax.sharding import PartitionSpec as P
        from dgdm_histopath_tpu.parallel.tp import (
            describe_sharding, tp_param_specs)
        mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
        batch = labeled_batch(4)
        trainer = setup_trainer(use_mesh=False)
        params = trainer.model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2)},
            batch, mode="pretrain", deterministic=True)
        specs = tp_param_specs(params, mesh)
        flat = {tuple(str(getattr(k, "key", k)) for k in path): s
                for path, s in jax.tree_util.tree_flatten_with_path(
                    specs, is_leaf=lambda x: isinstance(x, P))[0]}
        # hidden dims (32, 16) divide tp=4: column-parallel kernels exist
        cols = [p for p, s in flat.items() if s == P(None, "model")]
        assert cols, "expected at least one column-parallel kernel"
        # every column kernel's sibling bias is sharded the same way
        for path in cols:
            bias_path = path[:-1] + ("bias",)
            if bias_path in flat:
                assert flat[bias_path] == P("model"), (path, flat[bias_path])
        counts = describe_sharding(params, mesh)
        assert counts["column"] > 0 and counts["replicated"] > 0

    @pytest.mark.slow
    def test_tp_training_matches_dp_only(self):
        # identical math: a (2,4) TP layout must produce the same losses and
        # updated params as the 1-D DP mesh (GSPMD only changes layout)
        batch = labeled_batch(4)

        t_dp = setup_trainer(mesh=make_mesh(axes=("data",)))
        t_dp.init_state(jax.random.PRNGKey(0), batch)
        t_tp = setup_trainer(mesh=make_mesh(axes=("data", "model"),
                                            shape=(2, 4)))
        t_tp.init_state(jax.random.PRNGKey(0), batch)

        for epoch in (1, 1, 1):
            m_dp = t_dp.training_step(batch, epoch=epoch, materialize=True)
            m_tp = t_tp.training_step(batch, epoch=epoch, materialize=True)
            assert float(m_dp["loss"]) == pytest.approx(float(m_tp["loss"]),
                                                        rel=2e-4)
        p1 = jax.tree_util.tree_leaves(t_dp.state.params)
        p2 = jax.tree_util.tree_leaves(t_tp.state.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    @pytest.mark.slow
    def test_tp_state_actually_sharded(self):
        from dgdm_histopath_tpu.parallel.tp import MODEL_AXIS
        mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
        batch = labeled_batch(4)
        trainer = setup_trainer(mesh=mesh)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        sharded_leaves = 0
        for leaf in jax.tree_util.tree_leaves(trainer.state.params):
            spec = leaf.sharding.spec
            if any(ax == MODEL_AXIS for ax in spec if ax is not None):
                sharded_leaves += 1
        assert sharded_leaves > 0, "no parameter ended up model-sharded"
        # pretrain step also runs under the 2-D mesh
        m = trainer.training_step(batch, epoch=0, materialize=True)
        assert np.isfinite(float(m["loss"]))

    def test_mesh_shape_from_config(self):
        # hardware.mesh_shape/mesh_axes drive the trainer's mesh (CLI
        # --mesh-shape 2,4 lands here via load_config overrides)
        from dgdm_histopath_tpu.training import DGDMTrainer
        from dgdm_histopath_tpu.utils.config import load_config
        cfg = load_config(None, overrides={
            "model": {"node_features": 16, "hidden_dims": [32, 16],
                      "num_diffusion_steps": 3, "attention_heads": 4,
                      "graph_layers": 1, "compute_dtype": "float32"},
            "hardware": {"mesh_shape": [2, 4],
                         "mesh_axes": ["data", "model"]}})
        trainer = DGDMTrainer.from_config(cfg)
        assert trainer.mesh is not None
        assert trainer.mesh.axis_names == ("data", "model")
        assert dict(trainer.mesh.shape) == {"data": 2, "model": 4}


class TestNodeSharding:
    """SP analogue: node axis sharded over 'model' (parallel/sp.py)."""

    def test_forward_matches_replicated(self):
        from dgdm_histopath_tpu.parallel.sp import shard_graph_nodes
        mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
        # 24-node graphs pad to buckets; use 32 nodes (divisible by tp=4)
        gs = []
        for i in range(4):
            g = make_synthetic_graph(seed=i, n_nodes=32, n_real=28,
                                     feat_dim=16)
            gs.append(g.replace(y=jnp.asarray(i % 2, jnp.int32)))
        batch = batch_graphs(gs)

        trainer = setup_trainer(use_mesh=False)
        params = trainer.model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2)},
            batch, mode="inference", deterministic=True)

        fwd = jax.jit(lambda p, b: trainer.model.apply(
            p, b, mode="inference", deterministic=True)
            ["classification_logits"])
        ref = np.asarray(fwd(params, batch))

        sharded = shard_graph_nodes(batch, mesh)
        for leaf in (sharded.x, sharded.node_mask, sharded.nbr_idx):
            spec = leaf.sharding.spec
            assert "model" in [ax for ax in spec if ax is not None]
        out = np.asarray(fwd(params, sharded))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_indivisible_bucket_rejected(self):
        from dgdm_histopath_tpu.parallel.sp import shard_graph_nodes
        mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
        g = make_synthetic_graph(seed=0, n_nodes=30, n_real=28, feat_dim=16)
        batch = batch_graphs([g, g])
        with pytest.raises(ValueError):
            shard_graph_nodes(batch, mesh)

    def test_tp_checkpoint_roundtrip_restores_layout(self, tmp_path):
        # Orbax restore returns host arrays; place_state must re-establish
        # the TP layout so resumed training keeps the sharded step
        from dgdm_histopath_tpu.parallel.tp import MODEL_AXIS
        from dgdm_histopath_tpu.training import CheckpointManager
        mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
        batch = labeled_batch(4)
        trainer = setup_trainer(mesh=mesh)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        trainer.training_step(batch, epoch=1, materialize=True)

        mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=1)
        mgr.save(trainer.state, step=1, metric=1.0)
        restored = trainer.place_state(mgr.restore(trainer.state))
        # params identical and model-sharded again
        for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        n_sharded = sum(
            1 for leaf in jax.tree_util.tree_leaves(restored.params)
            if any(ax == MODEL_AXIS for ax in leaf.sharding.spec
                   if ax is not None))
        assert n_sharded > 0
        trainer.state = restored
        m = trainer.training_step(batch, epoch=1, materialize=True)
        assert np.isfinite(float(m["loss"]))


class TestMultiController:
    """Two real OS processes form one JAX cluster (VERDICT r2 #6): the
    datamodule's process-sharding defaults, global collectives, and a
    shared-mesh train step all follow the multi-host contract."""

    @pytest.mark.slow           # ~90s solo: 2x jax startup + distributed init
    def test_two_process_cluster(self, tmp_path):
        import json
        import os
        import socket
        import subprocess
        import sys as _sys

        # free port for the coordinator
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"

        worker = str(Path(__file__).parent / "multiproc_worker.py")
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("JAX_NUM_PROCESSES", None)
        procs = [subprocess.Popen(
            [_sys.executable, worker, coord, str(i), "2", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)]
        try:
            outs = [p.communicate(timeout=540)[0].decode() for p in procs]
        finally:
            for p in procs:            # no orphans on timeout/assert
                if p.poll() is None:
                    p.kill()
                    p.wait()
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

        reports = [json.loads((tmp_path / f"proc{i}.json").read_text())
                   for i in range(2)]
        # one cluster: 2 processes x 2 devices, psum saw all 4
        for i, r in enumerate(reports):
            assert r["process_count"] == 2
            assert r["process_index"] == i
            assert r["local_devices"] == 2
            assert r["global_devices_via_psum"] == 4
            assert r["num_shards"] == 2 and r["shard_index"] == i
        # disjoint train shards covering the global split; identical val
        t0, t1 = (set(r["train_indices"]) for r in reports)
        assert t0 and t1 and not (t0 & t1)
        assert reports[0]["val_indices"] == reports[1]["val_indices"]
        # the shared-mesh step computed ONE global loss, same on every host
        assert np.isfinite(reports[0]["loss"])
        assert reports[0]["loss"] == pytest.approx(reports[1]["loss"],
                                                   rel=1e-5)
