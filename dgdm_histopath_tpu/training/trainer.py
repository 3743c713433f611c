"""DGDMTrainer: two-phase curriculum training with optax + SPMD data parallel.

Parity surface: reference ``dgdm_histopath/training/trainer.py:21-359`` —
epoch-indexed two-phase curriculum (pretrain: diffusion + contrastive +
reconstruction; finetune: CE/regression with diffusion fallback when
unlabeled), AdamW with cosine/onecycle schedulers and warmup, LR ×0.1 drop at
the phase transition (:256-271), val/test metrics, ``predict_step``, bulk
``generate_embeddings``, ``from_config``, ``save_model``.

TPU-native design:
  * the train step is a pure jitted function over (params, opt_state, batch);
    one compiled executable per (node-bucket, phase) pair — recompilation is
    bounded by the bucket set (SURVEY §7 "recompilation control");
  * data parallelism is a ``('data',)`` mesh: batches sharded over devices,
    params replicated, XLA inserts the gradient psum (replacing Lightning
    DDP + ``sync_dist=True``);
  * losses/grads accumulate in f32 while activations run bf16;
  * checkpointing is Orbax with top-k retention (``checkpoint.py``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.dgdm import DGDMModel
from ..ops.graph import PaddedGraph
from ..parallel.mesh import DATA_AXIS, make_mesh, replicate_tree, shard_batch
from ..parallel.tp import describe_sharding, place_state_tp, tp_param_specs, tp_size
from ..utils.config import DGDMConfig
from ..utils.logging import get_logger
from ..utils.monitoring import monitor_operation
from .losses import contrastive_loss

logger = get_logger("training")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx, rng):
        return cls(step=jnp.asarray(0, jnp.int32), params=params,
                   opt_state=tx.init(params), rng=rng)


@dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    max_epochs: int = 100
    pretrain_epochs: int = 50
    masking_ratio: float = 0.15
    use_contrastive_loss: bool = True
    contrastive_temperature: float = 0.1
    reconstruction_weight: float = 1.0
    scheduler_type: str = "cosine"   # cosine | onecycle | none
    warmup_steps: int = 1000
    gradient_clip_val: float = 1.0
    accumulate_grad_batches: int = 1
    finetune_lr_factor: float = 0.1  # LR drop at phase transition
    steps_per_epoch: int = 1000      # estimate; refined by fit()
    moe_aux_weight: float = 0.01     # Switch load-balance loss coefficient
    # escape hatch for the banded-semantics guard: training a graph_window
    # model on graphs NOT built with TissueGraphBuilder(knn_window=W) drops
    # every out-of-band edge; init_state raises unless this is set (parity
    # experiments that knowingly accept inexact bands opt in explicitly)
    allow_out_of_band_graphs: bool = False

    @classmethod
    def from_config(cls, cfg: DGDMConfig) -> "TrainerConfig":
        t, a = cfg.training, cfg.advanced
        return cls(
            learning_rate=t.learning_rate, weight_decay=t.weight_decay,
            max_epochs=t.max_epochs, pretrain_epochs=t.pretrain_epochs,
            masking_ratio=t.masking_ratio,
            use_contrastive_loss=t.use_contrastive_loss,
            contrastive_temperature=t.contrastive_temperature,
            scheduler_type=t.scheduler_type, warmup_steps=t.warmup_steps,
            gradient_clip_val=a.gradient_clip_val,
            accumulate_grad_batches=a.accumulate_grad_batches,
            allow_out_of_band_graphs=getattr(
                t, "allow_out_of_band_graphs", False),
        )


def make_lr_schedule(cfg: TrainerConfig) -> optax.Schedule:
    """Warmup + cosine/onecycle with a ×``finetune_lr_factor`` drop at the
    pretrain→finetune transition (reference ``trainer.py:256-271``)."""
    total_steps = max(cfg.max_epochs * cfg.steps_per_epoch, cfg.warmup_steps + 1)
    pretrain_steps = cfg.pretrain_epochs * cfg.steps_per_epoch

    if cfg.scheduler_type == "cosine":
        base = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps, decay_steps=total_steps,
            end_value=cfg.learning_rate * 1e-2)
    elif cfg.scheduler_type == "onecycle":
        base = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=cfg.learning_rate)
    elif cfg.scheduler_type == "none":
        base = optax.constant_schedule(cfg.learning_rate)
    else:
        raise ValueError(f"unknown scheduler_type {cfg.scheduler_type!r}")

    def schedule(step):
        scale = jnp.where(step >= pretrain_steps, cfg.finetune_lr_factor, 1.0)
        return base(step) * scale

    return schedule


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(make_lr_schedule(cfg), weight_decay=cfg.weight_decay),
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


class DGDMTrainer:
    """Two-phase DGDM training driver.

    ``task``: ``"classification"`` | ``"regression"`` | ``None`` (SSL only).
    """

    def __init__(
        self,
        model: DGDMModel,
        config: Optional[TrainerConfig] = None,
        task: Optional[str] = None,
        mesh=None,
        use_mesh: bool = True,
    ):
        self.model = model
        self.config = config or TrainerConfig()
        self.task = task or (
            "classification" if model.num_classes else
            ("regression" if model.regression_targets else
             ("survival" if getattr(model, "survival_mode", None) else None)))
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        self.tx = make_optimizer(self.config)
        self.state: Optional[TrainState] = None
        self._step_fns: Dict[Tuple, Callable] = {}
        self.history: list[Dict[str, float]] = []
        self.current_epoch = 0

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: PaddedGraph) -> TrainState:
        init_rngs = {"params": rng, "diffusion": jax.random.fold_in(rng, 1),
                     "masking": jax.random.fold_in(rng, 2),
                     "dropout": jax.random.fold_in(rng, 3)}
        params = self.model.init(init_rngs, example_batch, mode="pretrain",
                                 deterministic=True)
        gw = getattr(self.model, "graph_window", None)
        if gw:
            # banded-semantics guard: a banded model on graphs that were NOT
            # band-built (TissueGraphBuilder knn_window) silently drops the
            # out-of-band edges. With windowed the DEFAULT at large buckets
            # (models/presets.py), a user following preprocess -> train with
            # default builder flags would otherwise train on a fraction of
            # their edges behind a log line — so this is a hard error unless
            # TrainerConfig(allow_out_of_band_graphs=True) opts in
            # (VERDICT r4 weak #7).
            from ..ops.graph import band_eligible, in_band_fraction
            if band_eligible(example_batch.num_nodes, gw):
                frac = in_band_fraction(example_batch.nbr_idx,
                                        example_batch.nbr_mask, gw)
                if frac < 0.99:
                    msg = (
                        f"graph_window={gw} but only {100 * frac:.1f}% of "
                        f"edges are in-band — banded message passing drops "
                        f"the rest. Build graphs with TissueGraphBuilder("
                        f"spatial_sort=True, knn_window={gw}) (CLI: "
                        f"dgdm-preprocess build-graphs --knn-window {gw} or "
                        f"--model-config <model yaml>) for exact banded "
                        f"compute.")
                    if self.config.allow_out_of_band_graphs:
                        logger.warning(
                            "%s Proceeding anyway "
                            "(allow_out_of_band_graphs=True).", msg)
                    else:
                        raise ValueError(
                            msg + " Set TrainerConfig(allow_out_of_band_"
                            "graphs=True) to train on them anyway.")
        state = TrainState.create(params, self.tx, jax.random.fold_in(rng, 7))
        state = self.place_state(state)
        self.state = state
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        logger.info("initialized model with %.2fM parameters", n_params / 1e6)
        return state

    def place_state(self, state: "TrainState") -> "TrainState":
        """Apply the mesh placement to a (possibly host-resident) state.

        Used at init and after checkpoint restore — Orbax restore returns
        host arrays, which would otherwise lose the TP layout on resume.
        """
        if self.mesh is None:
            return state
        if tp_size(self.mesh) > 1:
            # 2-D (data, model) mesh: shard wide kernels + Adam moments
            # over 'model' (parallel/tp.py), batch stays on 'data'
            specs = tp_param_specs(state.params, self.mesh)
            placed = place_state_tp(state, specs, self.mesh)
            logger.info("tensor-parallel param layout: %s",
                        describe_sharding(state.params, self.mesh))
            return placed
        return replicate_tree(state, self.mesh)

    # ------------------------------------------------------------------
    # loss functions
    # ------------------------------------------------------------------
    def _pretrain_losses(self, params, batch: PaddedGraph, rngs) -> Tuple[jnp.ndarray, Dict]:
        out = self.model.apply(
            params, batch, mask_ratio=self.config.masking_ratio,
            deterministic=False, method=DGDMModel.pretrain_step, rngs=rngs)
        loss = out["diffusion_loss"]
        metrics = {"diffusion_loss": out["diffusion_loss"],
                   "reconstruction_loss": out["reconstruction_loss"]}
        loss = loss + self.config.reconstruction_weight * out["reconstruction_loss"]
        if self.config.use_contrastive_loss:
            # per-step rng (rngs derive from fold_in(state.rng, state.step)) so
            # the node subsample varies every step instead of fixating on the
            # same raster-order slice (VERDICT r1 weak #5)
            closs = contrastive_loss(out["node_embeddings"], batch.node_mask,
                                     self.config.contrastive_temperature,
                                     rng=jax.random.fold_in(rngs["masking"], 17))
            metrics["contrastive_loss"] = closs
            loss = loss + closs
        if "moe_aux_loss" in out:
            metrics["moe_aux_loss"] = out["moe_aux_loss"]
            loss = loss + self.config.moe_aux_weight * out["moe_aux_loss"]
        metrics["loss"] = loss
        return loss, metrics

    def _finetune_losses(self, params, batch: PaddedGraph, rngs) -> Tuple[jnp.ndarray, Dict]:
        has_labels = batch.y is not None
        if not has_labels:
            # unlabeled fallback: keep optimizing the SSL objective
            # (reference trainer.py:130-175)
            return self._pretrain_losses(params, batch, rngs)
        out = self.model.apply(params, batch, mode="finetune",
                               deterministic=False, rngs=rngs)
        # filler graphs (all-padding node_mask, from bucket/device padding)
        # carry zero weight
        valid = jnp.any(batch.node_mask, axis=-1).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(valid), 1.0)

        def with_aux(loss, metrics):
            if "moe_aux_loss" in out:
                metrics["moe_aux_loss"] = out["moe_aux_loss"]
                loss = (loss
                        + self.config.moe_aux_weight * out["moe_aux_loss"])
                metrics["loss"] = loss
            return loss, metrics

        if self.task == "classification":
            logits = out["classification_logits"].astype(jnp.float32)
            labels = batch.y.astype(jnp.int32)
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            per = -jnp.sum(onehot * jax.nn.log_softmax(logits, -1), -1)
            loss = jnp.sum(per * valid) / denom
            correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            acc = jnp.sum(correct * valid) / denom
            return with_aux(loss, {"loss": loss, "accuracy": acc})
        if self.task == "regression":
            pred = out["regression"]["mean"].astype(jnp.float32)
            target = batch.y.astype(jnp.float32).reshape(pred.shape)
            per = jnp.mean((pred - target) ** 2, axis=-1)
            loss = jnp.sum(per * valid) / denom
            return with_aux(loss, {"loss": loss, "mse": loss})
        if self.task == "survival":
            # batch.y carries (time, event) pairs: [B, 2]
            # (reference SurvivalHead surface, models/decoders.py:323-496)
            from ..models.decoders import (cox_partial_likelihood,
                                           discrete_survival_loss)
            time_ = batch.y[..., 0].astype(jnp.float32)
            event = batch.y[..., 1].astype(jnp.float32)
            surv = out["survival"]
            if self.model.survival_mode == "cox":
                loss = cox_partial_likelihood(surv["risk"], time_, event,
                                              valid=valid)
            else:
                loss = discrete_survival_loss(surv["hazard_logits"],
                                              time_.astype(jnp.int32), event,
                                              valid=valid)
            return with_aux(loss, {"loss": loss, "survival_loss": loss})
        raise ValueError(f"finetune requires a task; got {self.task!r}")

    def _pad_to_devices(self, batch: PaddedGraph) -> PaddedGraph:
        """Pad the batch axis to a multiple of the mesh size with filler
        graphs (node_mask all-False ⇒ zero loss weight)."""
        if self.mesh is None:
            return batch
        # only the data axis shards the batch; a model axis replicates it
        try:
            n_dev = int(self.mesh.shape[DATA_AXIS])
        except KeyError:
            n_dev = int(np.prod(self.mesh.devices.shape))
        b = batch.x.shape[0]
        rem = (-b) % n_dev
        if rem == 0:
            return batch

        def pad(leaf, zero=False):
            reps = jnp.repeat(leaf[-1:], rem, axis=0)
            if zero:
                reps = jnp.zeros_like(reps)
            return jnp.concatenate([leaf, reps], axis=0)

        return PaddedGraph(
            x=pad(batch.x), pos=pad(batch.pos), nbr_idx=pad(batch.nbr_idx),
            nbr_mask=pad(batch.nbr_mask, zero=True),
            edge_attr=pad(batch.edge_attr),
            node_mask=pad(batch.node_mask, zero=True),
            y=None if batch.y is None else pad(batch.y))

    # ------------------------------------------------------------------
    # compiled steps (cached per (phase, bucket shape, labeled))
    # ------------------------------------------------------------------
    def _get_step_fn(self, phase: str, batch: PaddedGraph) -> Callable:
        key = (phase, batch.x.shape, batch.y is not None)
        if key in self._step_fns:
            return self._step_fns[key]
        loss_fn = self._pretrain_losses if phase == "pretrain" else self._finetune_losses

        def step(state: TrainState, batch: PaddedGraph):
            rng = jax.random.fold_in(state.rng, state.step)
            rngs = {"diffusion": jax.random.fold_in(rng, 0),
                    "masking": jax.random.fold_in(rng, 1),
                    "dropout": jax.random.fold_in(rng, 2)}

            def scalar_loss(params):
                loss, metrics = loss_fn(params, batch, rngs)
                return loss.astype(jnp.float32), metrics

            (loss, metrics), grads = jax.value_and_grad(scalar_loss, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      opt_state=new_opt)
            return new_state, metrics

        compiled = jax.jit(step, donate_argnums=(0,))
        self._step_fns[key] = compiled
        return compiled

    def _get_eval_fn(self, phase: str, batch: PaddedGraph) -> Callable:
        key = ("eval", phase, batch.x.shape, batch.y is not None)
        if key in self._step_fns:
            return self._step_fns[key]

        def eval_step(params, batch: PaddedGraph, rng):
            rngs = {"diffusion": rng, "masking": jax.random.fold_in(rng, 1)}
            if phase == "pretrain" or batch.y is None:
                out = self.model.apply(params, batch,
                                       mask_ratio=self.config.masking_ratio,
                                       deterministic=True,
                                       method=DGDMModel.pretrain_step, rngs=rngs)
                return {"loss": out["diffusion_loss"] + out["reconstruction_loss"]}
            out = self.model.apply(params, batch, mode="inference",
                                   deterministic=True, rngs=rngs)
            valid = jnp.any(batch.node_mask, axis=-1).astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(valid), 1.0)
            if self.task == "classification":
                logits = out["classification_logits"].astype(jnp.float32)
                labels = batch.y.astype(jnp.int32)
                onehot = jax.nn.one_hot(labels, logits.shape[-1])
                per = -jnp.sum(onehot * jax.nn.log_softmax(logits, -1), -1)
                loss = jnp.sum(per * valid) / denom
                correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
                acc = jnp.sum(correct * valid) / denom
                return {"loss": loss, "accuracy": acc, "valid": valid,
                        "probabilities": jax.nn.softmax(logits, -1)}
            if self.task == "survival":
                from ..models.decoders import (cox_partial_likelihood,
                                               discrete_survival_loss)
                time_ = batch.y[..., 0].astype(jnp.float32)
                event = batch.y[..., 1].astype(jnp.float32)
                surv = out["survival"]
                if self.model.survival_mode == "cox":
                    loss = cox_partial_likelihood(surv["risk"], time_, event,
                                                  valid=valid)
                    risk = surv["risk"].astype(jnp.float32)
                else:
                    loss = discrete_survival_loss(surv["hazard_logits"],
                                                  time_.astype(jnp.int32),
                                                  event, valid=valid)
                    # expected hazard rank score: -E[survival time] proxy
                    risk = -jnp.sum(surv["survival"], axis=-1)
                return {"loss": loss, "valid": valid, "risk": risk,
                        "time": time_, "event": event}
            pred = out["regression"]["mean"].astype(jnp.float32)
            target = batch.y.astype(jnp.float32).reshape(pred.shape)
            per = jnp.mean((pred - target) ** 2, axis=-1)
            return {"loss": jnp.sum(per * valid) / denom, "valid": valid}

        compiled = jax.jit(eval_step)
        self._step_fns[key] = compiled
        return compiled

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def phase_for_epoch(self, epoch: int) -> str:
        return "pretrain" if epoch < self.config.pretrain_epochs else "finetune"

    def _prepare_batch(self, batch: PaddedGraph) -> PaddedGraph:
        """Host-side batch finalization: device padding + sharding placement."""
        if self.mesh is not None:
            return shard_batch(self._pad_to_devices(batch), self.mesh)
        return batch

    def training_step(self, batch: PaddedGraph, epoch: Optional[int] = None,
                      materialize: bool = True, prepared: bool = False
                      ) -> Dict[str, Any]:
        """One optimization step.

        ``materialize=False`` returns device-resident scalar metrics without
        forcing a host sync — the fit loop accumulates those asynchronously
        and syncs once per epoch (per-step syncs dominate wall-clock on
        tunneled/remote devices).
        """
        if self.state is None:
            raise RuntimeError("call init_state() first")
        epoch = self.current_epoch if epoch is None else epoch
        phase = self.phase_for_epoch(epoch)
        if not prepared:
            batch = self._prepare_batch(batch)
        fn = self._get_step_fn(phase, batch)
        self.state, metrics = fn(self.state, batch)
        scalars = {k: v for k, v in metrics.items() if jnp.ndim(v) == 0}
        if materialize:
            return {k: float(v) for k, v in scalars.items()}
        return scalars

    def validation_step(self, batch: PaddedGraph, epoch: Optional[int] = None) -> Dict[str, Any]:
        epoch = self.current_epoch if epoch is None else epoch
        phase = self.phase_for_epoch(epoch)
        if self.mesh is not None:
            batch = shard_batch(self._pad_to_devices(batch), self.mesh)
        fn = self._get_eval_fn(phase, batch)
        out = fn(self.state.params, batch, jax.random.fold_in(self.state.rng, 999))
        return out

    def fit(
        self,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        max_epochs: Optional[int] = None,
        checkpoint_manager=None,
        log_every: int = 50,
        early_stopping_patience: int = 10,
        train_logger=None,
        preemption_guard=None,
        start_step_in_epoch: int = 0,
        restore_best_params: bool = False,
    ) -> Dict[str, Any]:
        """Epoch loop with two-phase curriculum, validation, checkpointing,
        early stopping (reference cli/train.py:304-330 callbacks).

        ``train_logger``: optional ``TrainLogger`` — receives every epoch
        summary (reference logs scalars to TB/W&B, trainer.py:116-127).

        ``restore_best_params``: keep a host-side copy of the params at the
        best validation loss and restore them into ``self.state`` when the
        loop ends (the reference tracks the best checkpoint via Lightning's
        ``ModelCheckpoint(monitor="val_loss")``, cli/train.py:308-317 —
        without this, an early-stopped run predicts with the LAST params,
        i.e. ``patience`` epochs past the best model).

        ``preemption_guard``: optional :class:`PreemptionGuard` — when it
        trips (SIGTERM / manual trigger), the loop stops at the next step
        boundary, writes an emergency checkpoint tagged with the exact
        (epoch, step-in-epoch) position, and returns
        ``{"interrupted": True, "resume": {...}}``. ``start_step_in_epoch``
        fast-forwards that many batches of the FIRST epoch on resume; with
        a deterministic loader the replay is bit-identical (step rngs fold
        ``state.step``).
        """
        max_epochs = max_epochs or self.config.max_epochs
        best_val = float("inf")
        best_params = None
        patience = 0
        first_epoch = self.current_epoch
        interrupted = False
        resume_info: Dict[str, Any] = {}
        for epoch in range(self.current_epoch, max_epochs):
            self.current_epoch = epoch
            phase = self.phase_for_epoch(epoch)
            totals: Dict[str, Any] = {}
            t0 = time.perf_counter()
            n_steps = 0
            skip = start_step_in_epoch if epoch == first_epoch else 0
            epoch_loader = train_loader
            if skip:
                from .preemption import skip_batches
                epoch_loader = skip_batches(train_loader, skip)
                n_steps = skip  # position within the epoch, not work done here
            with monitor_operation(f"train_epoch_{phase}"):
                # double-buffered feed: pad/shard/upload the next batch on a
                # background thread while the device runs the current step
                from ..utils.optimization import PrefetchIterator
                prepared_iter = PrefetchIterator(
                    (self._prepare_batch(b) for b in epoch_loader), depth=2)
                for batch in prepared_iter:
                    # device-resident accumulation: no per-step host sync
                    m = self.training_step(batch, epoch, materialize=False,
                                           prepared=True)
                    n_steps += 1
                    for k, v in m.items():
                        totals[k] = v if k not in totals else totals[k] + v
                    if n_steps % log_every == 0:
                        logger.info("epoch %d [%s] step %d loss=%.4f",
                                    epoch, phase, n_steps,
                                    float(m.get("loss", float("nan"))))
                    if preemption_guard is not None and preemption_guard.triggered:
                        interrupted = True
                        prepared_iter.close()
                        break
            if interrupted:
                resume_info = {"epoch": epoch, "step_in_epoch": n_steps,
                               "mid_epoch": True}
                logger.warning("preemption: stopping at epoch %d step %d",
                               epoch, n_steps)
                if checkpoint_manager is not None:
                    checkpoint_manager.save(self.state, step=epoch,
                                            extra={"resume": resume_info})
                break
            summary = {f"train_{k}": float(v) / max(n_steps - skip, 1)
                       for k, v in totals.items()}
            summary["epoch"] = epoch
            summary["phase"] = phase
            summary["epoch_time_s"] = time.perf_counter() - t0
            summary["steps"] = n_steps

            if val_loader is not None:
                # device-resident accumulation (same discipline as the train
                # loop): no per-batch float() host sync — one sync per epoch
                val_losses = []
                val_accs = []
                surv_parts = []   # device-resident (risk, time, event, valid)
                for batch in val_loader:
                    out = self.validation_step(batch, epoch)
                    val_losses.append(out["loss"])
                    if "accuracy" in out:
                        val_accs.append(out["accuracy"])
                    if "risk" in out:
                        surv_parts.append((out["risk"], out["time"],
                                           out["event"], out["valid"]))
                summary["val_loss"] = (float(sum(val_losses)) / len(val_losses)
                                       if val_losses else float("nan"))
                if val_accs:
                    summary["val_accuracy"] = float(sum(val_accs)) / len(val_accs)
                if surv_parts:
                    # one host transfer per epoch; C-index on host
                    from ..evaluation.metrics import concordance_index
                    risk = np.concatenate([np.asarray(p[0]) for p in surv_parts])
                    t = np.concatenate([np.asarray(p[1]) for p in surv_parts])
                    e = np.concatenate([np.asarray(p[2]) for p in surv_parts])
                    v = np.concatenate([np.asarray(p[3]) for p in surv_parts]) > 0
                    summary["val_cindex"] = concordance_index(t[v], risk[v], e[v])
                if checkpoint_manager is not None:
                    checkpoint_manager.save(self.state, step=epoch,
                                            metric=summary["val_loss"])
                if summary["val_loss"] < best_val - 1e-6:
                    best_val = summary["val_loss"]
                    if restore_best_params:
                        best_params = jax.device_get(self.state.params)
                    patience = 0
                else:
                    patience += 1
                    if patience >= early_stopping_patience and phase == "finetune":
                        logger.info("early stopping at epoch %d", epoch)
                        self.history.append(summary)
                        if train_logger is not None:
                            train_logger.log_metrics(summary, step=epoch)
                        break
            self.history.append(summary)
            if train_logger is not None:
                train_logger.log_metrics(summary, step=epoch)
            logger.info("epoch %d done: %s", epoch,
                        {k: round(v, 4) for k, v in summary.items()
                         if isinstance(v, float)})
        if checkpoint_manager is not None:
            # saves are async (checkpoint.py): drain the last one before
            # returning so the final checkpoint is durable at fit() exit
            checkpoint_manager.wait_until_finished()
        if restore_best_params and best_params is not None and not interrupted:
            self.state = self.place_state(
                self.state.replace(params=best_params))
        result: Dict[str, Any] = {"history": self.history,
                                  "best_val_loss": best_val,
                                  "interrupted": interrupted}
        if interrupted:
            result["resume"] = resume_info
        return result

    def predict_step(self, batch: PaddedGraph, return_attention: bool = True) -> Dict[str, Any]:
        out = self.model.apply(self.state.params, batch, mode="inference",
                               deterministic=True, return_attention=return_attention)
        return out

    def generate_embeddings(self, loader: Iterable) -> np.ndarray:
        embs = []
        fn = jax.jit(lambda p, b: self.model.apply(p, b, mode="inference",
                                                   deterministic=True)["graph_embedding"])
        for batch in loader:
            embs.append(np.asarray(fn(self.state.params, batch)))
        return np.concatenate(embs, axis=0)

    @classmethod
    def from_config(cls, cfg: DGDMConfig, mesh=None) -> "DGDMTrainer":
        m = cfg.model
        num_classes = cfg.classification.num_classes if cfg.classification.enabled else m.num_classes
        regression_targets = cfg.regression.num_targets if cfg.regression.enabled else m.regression_targets
        survival_mode = cfg.survival.mode if cfg.survival.enabled else None
        model = DGDMModel(
            node_features=m.node_features, hidden_dims=tuple(m.hidden_dims),
            num_diffusion_steps=m.num_diffusion_steps,
            attention_heads=m.attention_heads, dropout=m.dropout,
            graph_layers=m.graph_layers,
            use_spatial_attention=m.use_spatial_attention,
            use_hierarchical=m.use_hierarchical,
            diffusion_schedule=m.diffusion_schedule, activation=m.activation,
            normalization=m.normalization, pooling=m.pooling,
            num_classes=num_classes, regression_targets=regression_targets,
            survival_mode=survival_mode,
            survival_intervals=cfg.survival.num_intervals,
            edge_features=m.edge_features, compute_dtype=m.compute_dtype,
            param_dtype=m.param_dtype,
            attention_traffic_dtype=getattr(m, "attention_traffic_dtype",
                                            None),
            spatial_window=getattr(m, "spatial_window", None),
            graph_window=getattr(m, "graph_window", None),
            moe_experts=getattr(m, "moe_experts", 0),
            moe_top_k=getattr(m, "moe_top_k", 1),
            moe_capacity=getattr(m, "moe_capacity", 1.5))
        hw = cfg.hardware
        if mesh is None and getattr(hw, "mesh_shape", None):
            # config-driven mesh: e.g. mesh_shape [2, 4] + mesh_axes
            # ['data','model'] gives the tensor-parallel layout (ADR-0005)
            mesh = make_mesh(shape=list(hw.mesh_shape),
                             axes=tuple(hw.mesh_axes),
                             n_devices=int(np.prod(hw.mesh_shape)))
        return cls(model, TrainerConfig.from_config(cfg), mesh=mesh)
