"""Trainer tests: loss functions, optimizer schedule, train/eval steps,
DP sharding over the virtual 8-device CPU mesh, checkpointing.

The reference's training tests live at reference tests/test_basic.py:195-218
(loss sanity) — extended here with actual optimization and SPMD coverage the
reference never had (SURVEY §4 "Distributed/multi-node testing: none").
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.parallel.mesh import make_mesh
from dgdm_histopath_tpu.training import (
    CheckpointManager, DGDMTrainer, TrainerConfig, contrastive_loss,
    diffusion_loss, graph_reconstruction_loss, make_lr_schedule,
)

from conftest import make_synthetic_graph


def tiny_model(num_classes=None, **kw):
    return DGDMModel(node_features=32, hidden_dims=(32, 16), num_diffusion_steps=4,
                     attention_heads=4, graph_layers=2, num_classes=num_classes,
                     use_hierarchical=False, compute_dtype="float32", **kw)


def tiny_batch(b=4, num_classes=None, seed0=0):
    gs = [make_synthetic_graph(seed=seed0 + i, n_nodes=32, n_real=24, feat_dim=32,
                               num_classes=num_classes) for i in range(b)]
    return batch_graphs(gs)


class TestLosses:
    def test_diffusion_loss_masked(self):
        pred = jnp.ones((2, 8, 4))
        true = jnp.zeros((2, 8, 4))
        mask = jnp.asarray([[True] * 4 + [False] * 4] * 2)
        full = diffusion_loss(pred, true)
        masked = diffusion_loss(pred, true, mask)
        assert float(full) == pytest.approx(1.0)
        assert float(masked) == pytest.approx(1.0)  # all valid entries are 1

    def test_contrastive_same_graph_positive(self):
        rs = np.random.RandomState(0)
        emb = jnp.asarray(rs.randn(2, 16, 8), jnp.float32)
        mask = jnp.ones((2, 16), bool)
        loss = contrastive_loss(emb, mask, temperature=0.1)
        assert np.isfinite(float(loss)) and float(loss) > 0.0

    def test_contrastive_ignores_padding(self):
        rs = np.random.RandomState(0)
        emb = np.zeros((2, 16, 8), np.float32)
        emb[:, :8] = rs.randn(2, 8, 8)
        mask = np.zeros((2, 16), bool)
        mask[:, :8] = True
        l_pad = contrastive_loss(jnp.asarray(emb), jnp.asarray(mask))
        l_tight = contrastive_loss(jnp.asarray(emb[:, :8]), jnp.asarray(mask[:, :8]))
        assert float(l_pad) == pytest.approx(float(l_tight), rel=1e-5)

    def test_contrastive_subsample_mask_aware(self):
        # re-masked graphs can have real nodes anywhere (e.g. back-packed);
        # the old first-M slice would pick only padding → zero anchors
        rs = np.random.RandomState(0)
        emb = np.zeros((2, 32, 8), np.float32)
        emb[:, 24:] = rs.randn(2, 8, 8)
        mask = np.zeros((2, 32), bool)
        mask[:, 24:] = True
        loss = contrastive_loss(jnp.asarray(emb), jnp.asarray(mask),
                                max_nodes_per_graph=8)
        assert float(loss) > 0.0

    def test_contrastive_subsample_varies_with_rng(self):
        rs = np.random.RandomState(1)
        emb = jnp.asarray(rs.randn(2, 64, 8), jnp.float32)
        mask = jnp.ones((2, 64), bool)
        l1 = contrastive_loss(emb, mask, max_nodes_per_graph=8,
                              rng=jax.random.PRNGKey(0))
        l2 = contrastive_loss(emb, mask, max_nodes_per_graph=8,
                              rng=jax.random.PRNGKey(1))
        assert float(l1) != pytest.approx(float(l2))  # different node subsets
        # padding excluded even under random sampling: huge garbage rows in
        # the padded tail must not change the loss
        emb_dirty = emb.at[:, 48:].set(1e6)
        mask_part = mask.at[:, 48:].set(False)
        a = contrastive_loss(emb, mask_part, max_nodes_per_graph=8,
                             rng=jax.random.PRNGKey(2))
        b = contrastive_loss(emb_dirty, mask_part, max_nodes_per_graph=8,
                             rng=jax.random.PRNGKey(2))
        assert float(a) == pytest.approx(float(b), rel=1e-6)

    def test_graph_reconstruction_loss(self):
        g = tiny_batch(2)
        loss = graph_reconstruction_loss(
            g.x, g.nbr_idx, g.nbr_mask, g.node_mask, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))

    def test_cox_loss_masks_filler_rows(self):
        from dgdm_histopath_tpu.models.decoders import cox_partial_likelihood
        rs = np.random.RandomState(0)
        risk = jnp.asarray(rs.randn(8), jnp.float32)
        time = jnp.asarray(rs.rand(8) * 10, jnp.float32)
        event = jnp.ones((8,), jnp.float32)
        # filler rows (garbage risk) must not perturb the valid-subset loss
        full = cox_partial_likelihood(risk[:6], time[:6], event[:6])
        valid = jnp.asarray([True] * 6 + [False] * 2)
        dirty = risk.at[6:].set(100.0)
        masked = cox_partial_likelihood(dirty, time, event, valid=valid)
        assert float(masked) == pytest.approx(float(full), rel=1e-5)

    def test_discrete_survival_loss_masks_filler(self):
        from dgdm_histopath_tpu.models.decoders import discrete_survival_loss
        rs = np.random.RandomState(1)
        logits = jnp.asarray(rs.randn(6, 5), jnp.float32)
        interval = jnp.asarray([0, 1, 2, 3, 4, 2], jnp.int32)
        event = jnp.asarray([1, 0, 1, 1, 0, 1], jnp.float32)
        full = discrete_survival_loss(logits[:4], interval[:4], event[:4])
        valid = jnp.asarray([True] * 4 + [False] * 2)
        masked = discrete_survival_loss(logits, interval, event, valid=valid)
        assert float(masked) == pytest.approx(float(full), rel=1e-5)


class TestSchedule:
    def test_lr_phase_drop(self):
        cfg = TrainerConfig(learning_rate=1e-3, warmup_steps=10, max_epochs=10,
                            pretrain_epochs=5, steps_per_epoch=100,
                            scheduler_type="cosine", finetune_lr_factor=0.1)
        sched = make_lr_schedule(cfg)
        before = float(sched(499))
        after = float(sched(500))
        assert after < before * 0.5  # sharp drop at the transition


class TestTrainerSteps:
    @pytest.mark.slow
    def test_pretrain_step_decreases_loss(self):
        model = tiny_model()
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=10,
            steps_per_epoch=10, use_contrastive_loss=True), use_mesh=False)
        batch = tiny_batch(4)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        losses = [trainer.training_step(batch, epoch=0)["loss"] for _ in range(12)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    @pytest.mark.slow
    def test_finetune_classification_step(self):
        model = tiny_model(num_classes=3)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=0,
            steps_per_epoch=10), use_mesh=False)
        batch = tiny_batch(4, num_classes=3)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        m = trainer.training_step(batch, epoch=1)
        assert "accuracy" in m
        assert np.isfinite(m["loss"])

    def test_validation_step(self):
        model = tiny_model(num_classes=3)
        trainer = DGDMTrainer(model, TrainerConfig(pretrain_epochs=0), use_mesh=False)
        batch = tiny_batch(4, num_classes=3)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        out = trainer.validation_step(batch, epoch=1)
        assert "accuracy" in out
        assert out["probabilities"].shape == (4, 3)

    @pytest.mark.slow
    def test_fit_loop_with_early_stop(self):
        model = tiny_model(num_classes=2)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, max_epochs=3, pretrain_epochs=1,
            steps_per_epoch=2), use_mesh=False)
        train = [tiny_batch(2, num_classes=2, seed0=i * 10) for i in range(2)]
        val = [tiny_batch(2, num_classes=2, seed0=100)]
        trainer.init_state(jax.random.PRNGKey(0), train[0])
        result = trainer.fit(train, val, max_epochs=3)
        assert len(result["history"]) == 3
        assert result["history"][0]["phase"] == "pretrain"
        assert result["history"][1]["phase"] == "finetune"
        assert np.isfinite(result["best_val_loss"])

    @pytest.mark.slow
    def test_fit_restore_best_params(self):
        # with restore_best_params=True, fit() must leave self.state holding
        # the params from the best-val epoch, not the last epoch (reference
        # ModelCheckpoint(monitor="val_loss") semantics, cli/train.py:308-317)
        model = tiny_model(num_classes=2)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=5e-2, warmup_steps=1, max_epochs=6,
            pretrain_epochs=0, scheduler_type="none",
            steps_per_epoch=2), use_mesh=False)
        train = [tiny_batch(2, num_classes=2, seed0=i * 10) for i in range(2)]
        val = [tiny_batch(2, num_classes=2, seed0=100)]
        trainer.init_state(jax.random.PRNGKey(0), train[0])
        result = trainer.fit(train, val, max_epochs=6,
                             early_stopping_patience=100,
                             restore_best_params=True)
        # re-evaluating with the restored params must reproduce the best
        # val loss, not the final epoch's
        out = trainer.validation_step(val[0], epoch=6)
        assert abs(float(out["loss"]) - result["best_val_loss"]) < 1e-4
        val_curve = [h["val_loss"] for h in result["history"]]
        assert result["best_val_loss"] <= min(val_curve) + 1e-6


@pytest.mark.integration
class TestBandGuard:
    """init_state hard-rejects graph_window models on graphs that were not
    band-built (out-of-band edges would be silently dropped — VERDICT r4
    weak #7); band-built graphs and the explicit opt-in both pass."""

    def _windowed_trainer(self, **cfg_kw):
        model = tiny_model(graph_window=8)
        return DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=1,
            steps_per_epoch=4, **cfg_kw), use_mesh=False)

    def _banded_batch(self, b=2, window=8):
        from dgdm_histopath_tpu.ops.knn import knn_euclidean
        from dgdm_histopath_tpu.parallel.halo import spatial_sort
        gs = []
        for i in range(b):
            g = spatial_sort(make_synthetic_graph(
                seed=i, n_nodes=32, n_real=24, feat_dim=32))
            idx, dist, valid = knn_euclidean(g.pos, g.node_mask, 4,
                                             band_window=window)
            gs.append(g.replace(
                nbr_idx=idx, nbr_mask=valid,
                edge_attr=jnp.zeros((32, 4, g.edge_attr.shape[-1]),
                                    g.edge_attr.dtype)))
        return batch_graphs(gs)

    def test_out_of_band_graphs_rejected(self):
        trainer = self._windowed_trainer()
        batch = tiny_batch(2)   # plain kNN graphs: not band-built
        from dgdm_histopath_tpu.ops.graph import in_band_fraction
        assert in_band_fraction(batch.nbr_idx, batch.nbr_mask, 8) < 0.99, \
            "fixture must actually contain out-of-band edges"
        with pytest.raises(ValueError, match="in-band"):
            trainer.init_state(jax.random.PRNGKey(0), batch)

    def test_escape_hatch_allows(self):
        trainer = self._windowed_trainer(allow_out_of_band_graphs=True)
        batch = tiny_batch(2)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        m = trainer.training_step(batch, epoch=0)
        assert np.isfinite(m["loss"])

    def test_band_built_graphs_pass(self):
        trainer = self._windowed_trainer()
        batch = self._banded_batch()
        from dgdm_histopath_tpu.ops.graph import in_band_fraction
        assert in_band_fraction(batch.nbr_idx, batch.nbr_mask, 8) == 1.0
        trainer.init_state(jax.random.PRNGKey(0), batch)

    def test_config_plumbing(self):
        """yaml training.allow_out_of_band_graphs reaches TrainerConfig."""
        from dgdm_histopath_tpu.utils.config import DGDMConfig
        cfg = DGDMConfig()
        cfg.training.allow_out_of_band_graphs = True
        assert TrainerConfig.from_config(cfg).allow_out_of_band_graphs


class TestDataParallel:
    @pytest.mark.slow
    def test_dp_mesh_step_matches_single_device(self):
        n_dev = len(jax.devices())
        assert n_dev == 8, f"expected 8 virtual CPU devices, got {n_dev}"
        mesh = make_mesh(axes=("data",))
        model = tiny_model(num_classes=2)
        batch = tiny_batch(8, num_classes=2)

        t_mesh = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=0,
            steps_per_epoch=10), mesh=mesh)
        t_single = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=0,
            steps_per_epoch=10), use_mesh=False)
        t_mesh.init_state(jax.random.PRNGKey(0), batch)
        t_single.init_state(jax.random.PRNGKey(0), batch)

        m_mesh = t_mesh.training_step(batch, epoch=1)
        m_single = t_single.training_step(batch, epoch=1)
        # SPMD sharded step computes the same global loss/grads
        assert m_mesh["loss"] == pytest.approx(m_single["loss"], rel=1e-4)

        p_mesh = jax.tree_util.tree_leaves(t_mesh.state.params)
        p_single = jax.tree_util.tree_leaves(t_single.state.params)
        for a, b in zip(p_mesh, p_single):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestTrainLogger:
    def test_csv_jsonl_rows(self, tmp_path):
        import csv as _csv
        import json as _json
        from dgdm_histopath_tpu.training import TrainLogger
        lg = TrainLogger(tmp_path, logger_type="csv")
        lg.log_hparams({"lr": 1e-3, "model": "tiny"})
        lg.log_metrics({"train_loss": 1.5, "phase": "pretrain"}, step=0)
        lg.log_metrics({"train_loss": 1.0, "val_loss": 0.9}, step=1)
        lg.close()
        with open(tmp_path / "metrics.csv") as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 2
        assert float(rows[0]["train_loss"]) == 1.5
        assert rows[0]["val_loss"] == ""          # late-appearing column
        assert float(rows[1]["val_loss"]) == 0.9
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert _json.loads(lines[1])["val_loss"] == 0.9
        assert _json.loads((tmp_path / "hparams.json").read_text())["lr"] == 1e-3

    @pytest.mark.slow
    def test_tensorboard_event_files(self, tmp_path):
        pytest.importorskip("torch.utils.tensorboard")
        from dgdm_histopath_tpu.training import TrainLogger
        lg = TrainLogger(tmp_path, logger_type="tensorboard")
        lg.log_metrics({"loss": 0.5}, step=0)
        lg.close()
        events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert events, "no TensorBoard event file written"

    @pytest.mark.slow
    def test_fit_wires_logger(self, tmp_path):
        from dgdm_histopath_tpu.training import TrainLogger
        model = tiny_model()
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=2,
            max_epochs=2, steps_per_epoch=2, use_contrastive_loss=False),
            use_mesh=False)
        batch = tiny_batch(2)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        lg = TrainLogger(tmp_path, logger_type="csv")
        trainer.fit([batch, batch], max_epochs=2, train_logger=lg)
        lg.close()
        import csv as _csv
        with open(tmp_path / "metrics.csv") as f:
            rows = list(_csv.DictReader(f))
        assert len(rows) == 2
        assert "train_loss" in rows[0]


class TestCheckpoint:
    def test_save_restore_topk(self):
        model = tiny_model()
        trainer = DGDMTrainer(model, TrainerConfig(), use_mesh=False)
        batch = tiny_batch(2)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, save_top_k=2)
            mgr.save(trainer.state, step=0, metric=1.0)
            mgr.save(trainer.state, step=1, metric=0.5)
            mgr.save(trainer.state, step=2, metric=2.0)
            mgr.save(trainer.state, step=3, metric=0.4)
            assert mgr.best_step == 3
            assert mgr.last_step == 3
            # top-2 by metric = steps 3, 1 (+ last which is 3)
            assert set(mgr.all_steps()) == {1, 3}
            restored = mgr.restore(trainer.state, best=True)
            orig = jax.tree_util.tree_leaves(trainer.state.params)
            rest = jax.tree_util.tree_leaves(restored.params)
            for a, b in zip(orig, rest):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_bundle_named_paths_roundtrip(self, tmp_path):
        from dgdm_histopath_tpu.training import load_model_bundle, save_model_bundle
        params = {"params": {"enc": {"kernel": np.ones((2, 3), np.float32)},
                             "dec": {"bias": np.zeros((4,), np.float32)}}}
        p = save_model_bundle(tmp_path / "m.npz", params, {"node_features": 8})
        # verify leaves are name-keyed, not order-keyed
        raw = np.load(p, allow_pickle=False)
        assert "p:params/enc/kernel" in raw.files
        restored = load_model_bundle(p, params)
        np.testing.assert_allclose(restored["params"]["enc"]["kernel"],
                                   params["params"]["enc"]["kernel"])

    def test_bundle_renamed_module_fails_loudly(self, tmp_path):
        from dgdm_histopath_tpu.training import load_model_bundle, save_model_bundle
        from dgdm_histopath_tpu.utils.exceptions import CheckpointError
        params = {"params": {"enc": {"kernel": np.ones((2, 3), np.float32)},
                             "dec": {"kernel": np.zeros((2, 3), np.float32)}}}
        p = save_model_bundle(tmp_path / "m.npz", params, {})
        # same leaf count + shapes, different module names: must NOT load
        renamed = {"params": {"enc2": {"kernel": np.ones((2, 3), np.float32)},
                              "dec": {"kernel": np.zeros((2, 3), np.float32)}}}
        with pytest.raises(CheckpointError):
            load_model_bundle(p, renamed)
        # same names, different shape: must NOT load
        reshaped = {"params": {"enc": {"kernel": np.ones((3, 2), np.float32)},
                               "dec": {"kernel": np.zeros((2, 3), np.float32)}}}
        with pytest.raises(CheckpointError):
            load_model_bundle(p, reshaped)

    def test_bundle_legacy_order_format_still_loads(self, tmp_path):
        import json as _json
        from dgdm_histopath_tpu.training import load_model_bundle
        params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                  "b": np.ones((4,), np.float32)}
        flat, _ = jax.tree_util.tree_flatten(params)
        arrays = {f"param_{i}": leaf for i, leaf in enumerate(flat)}
        meta = {"model_config": {}, "num_leaves": len(flat), "extra": {}}
        np.savez_compressed(tmp_path / "legacy.npz",
                            __meta__=_json.dumps(meta), **arrays)
        restored = load_model_bundle(tmp_path / "legacy.npz", params)
        np.testing.assert_allclose(restored["a"], params["a"])


class TestAsyncCheckpoint:
    @pytest.mark.slow
    def test_async_save_restores_bit_identical_snapshot(self):
        """save() returns before serialization finishes (async window); a
        checkpoint completing while training continues must restore the
        state AS OF the save call, bit-identically (VERDICT r2 #8)."""
        model = tiny_model()
        trainer = DGDMTrainer(model, TrainerConfig(), use_mesh=False)
        batch = tiny_batch(2)
        trainer.init_state(jax.random.PRNGKey(0), batch)
        snapshot = jax.tree_util.tree_map(
            lambda a: np.array(a, copy=True),
            jax.device_get(trainer.state.params))
        with tempfile.TemporaryDirectory() as d:
            mgr = CheckpointManager(d, save_top_k=2)
            mgr.save(trainer.state, step=0, metric=1.0)
            # "training continues" while the save drains: mutate the live state
            trainer.training_step(batch, epoch=0)
            mgr.wait_until_finished()
            restored = mgr.restore(trainer.state, step=0)
            for a, b in zip(jax.tree_util.tree_leaves(snapshot),
                            jax.tree_util.tree_leaves(restored.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

class TestPreemption:
    """Graceful preemption: SIGTERM -> flag -> emergency checkpoint at a step
    boundary -> bit-identical mid-epoch resume (training/preemption.py).
    The reference has no preemption handling at all (its cli/train.py
    registers no signal handlers; an interrupted fit loses the epoch)."""

    def _make(self):
        model = tiny_model(num_classes=2)
        return DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, max_epochs=2,
            pretrain_epochs=0, steps_per_epoch=4), use_mesh=False)

    def _batches(self, n=4):
        return [tiny_batch(2, num_classes=2, seed0=i * 7) for i in range(n)]

    def test_sigterm_sets_flag_without_exiting(self):
        import os, signal as _signal
        from dgdm_histopath_tpu.training import PreemptionGuard
        with PreemptionGuard() as guard:
            assert not guard.triggered
            os.kill(os.getpid(), _signal.SIGTERM)
            assert guard.triggered
        # handler restored after the context exits
        assert _signal.getsignal(_signal.SIGTERM) not in (guard._handler,)

    @pytest.mark.slow
    def test_midepoch_resume_is_bit_identical(self, tmp_path):
        from dgdm_histopath_tpu.training import PreemptionGuard
        batches = self._batches(4)

        # uninterrupted reference run: 2 epochs x 4 steps
        t_ref = self._make()
        t_ref.init_state(jax.random.PRNGKey(0), batches[0])
        t_ref.fit(batches, max_epochs=2)

        # interrupted run: trip the guard before the loop; it stops after
        # exactly one step and writes an emergency checkpoint
        t_int = self._make()
        t_int.init_state(jax.random.PRNGKey(0), batches[0])
        mgr = CheckpointManager(tmp_path / "ckpt", save_top_k=2)
        guard = PreemptionGuard(install=False)
        guard.trigger()
        result = t_int.fit(batches, max_epochs=2, checkpoint_manager=mgr,
                           preemption_guard=guard)
        assert result["interrupted"] is True
        info = result["resume"]
        assert info["mid_epoch"] and info["epoch"] == 0
        assert 1 <= info["step_in_epoch"] <= len(batches)
        mgr.wait_until_finished()
        assert mgr.record_extra()["resume"] == info

        # resume: restore state, re-enter the SAME epoch, skip done steps
        t_res = self._make()
        t_res.init_state(jax.random.PRNGKey(0), batches[0])
        t_res.state = t_res.place_state(mgr.restore(t_res.state))
        t_res.current_epoch = info["epoch"]
        res2 = t_res.fit(batches, max_epochs=2,
                         start_step_in_epoch=info["step_in_epoch"])
        assert res2["interrupted"] is False
        assert int(t_res.state.step) == int(t_ref.state.step)
        for a, b in zip(jax.tree_util.tree_leaves(t_ref.state.params),
                        jax.tree_util.tree_leaves(t_res.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_prefetch_close_unblocks_producer(self):
        import itertools, threading
        from dgdm_histopath_tpu.utils.optimization import PrefetchIterator
        it = PrefetchIterator(itertools.count(), depth=2)  # infinite stream
        assert next(it) == 0
        it.close()
        it._thread.join(timeout=5.0)
        assert not it._thread.is_alive()
