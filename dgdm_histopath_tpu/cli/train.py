"""``dgdm-train``: training CLI.

Parity surface: reference ``dgdm_histopath/cli/train.py`` — the full flag
surface (model/training/data/hardware/logging, :39-84), seed + validation
(:117-139), checkpoint/early-stopping/LR callbacks (:304-330), trainer
construction (:346-359), config snapshot (:361-386), fit→test→save
(:388-408), ``resume`` (:419-449) and ``validate`` (:452+) subcommands.

Implemented with argparse (typer is not in this image); flags keep the
reference's names so invocations port over.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
from pathlib import Path

from ..utils.config import DGDMConfig, config_to_dict, load_config, save_config
from ..utils.logging import get_logger, setup_logging
from ..utils.validation import InputValidator

logger = get_logger("cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dgdm-train",
                                description="Train a DGDM model on histopathology data")
    sub = p.add_subparsers(dest="command")

    def add_common(sp):
        sp.add_argument("--config", type=str, default=None, help="YAML config path")
        sp.add_argument("--preset", type=str, default=None,
                        help="model preset: dgdm-base|dgdm-large|dgdm-clinical|dgdm-small")
        sp.add_argument("--data-dir", type=str, required=False)
        sp.add_argument("--output-dir", type=str, default="./outputs")
        sp.add_argument("--dataset-type", choices=["slide", "graph", "patch"],
                        default=None)
        sp.add_argument("--metadata", type=str, default=None,
                        help="labels json/csv")
        # model
        sp.add_argument("--node-features", type=int, default=None)
        sp.add_argument("--hidden-dims", type=str, default=None,
                        help="comma-separated, e.g. 512,256,128")
        sp.add_argument("--num-diffusion-steps", type=int, default=None)
        sp.add_argument("--attention-heads", type=int, default=None)
        sp.add_argument("--graph-layers", type=int, default=None)
        sp.add_argument("--dropout", type=float, default=None)
        sp.add_argument("--pooling", choices=["mean", "max", "attention", "set2set"],
                        default=None)
        sp.add_argument("--num-classes", type=int, default=None)
        sp.add_argument("--regression-targets", type=int, default=None)
        sp.add_argument("--survival-mode", choices=["cox", "discrete"],
                        default=None, help="enable the survival task "
                        "(labels are (time, event) pairs)")
        sp.add_argument("--survival-intervals", type=int, default=None)
        # training
        sp.add_argument("--max-epochs", type=int, default=None)
        sp.add_argument("--pretrain-epochs", type=int, default=None)
        sp.add_argument("--learning-rate", type=float, default=None)
        sp.add_argument("--weight-decay", type=float, default=None)
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--masking-ratio", type=float, default=None)
        sp.add_argument("--scheduler", choices=["cosine", "onecycle", "none"],
                        default=None)
        # hardware
        sp.add_argument("--devices", type=int, default=None,
                        help="data-parallel device count (default: all)")
        sp.add_argument("--mesh-shape", type=str, default=None,
                        help="comma ints, e.g. '8' (pure DP) or '2,4' "
                             "(data x model tensor-parallel; ADR-0005)")
        sp.add_argument("--mesh-axes", type=str, default=None,
                        help="comma names matching --mesh-shape; default "
                             "'data' or 'data,model'")
        sp.add_argument("--precision", choices=["32", "bf16-mixed", "16-mixed"],
                        default=None)
        # logging
        sp.add_argument("--log-level", default="INFO")
        sp.add_argument("--log-file", default=None)
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--save-top-k", type=int, default=None)
        sp.add_argument("--early-stopping-patience", type=int, default=10)

    train_p = sub.add_parser("train", help="train a model")
    add_common(train_p)
    resume_p = sub.add_parser("resume", help="resume from checkpoint dir")
    add_common(resume_p)
    resume_p.add_argument("--checkpoint-dir", type=str, required=True)
    val_p = sub.add_parser("validate", help="validate a checkpoint")
    add_common(val_p)
    val_p.add_argument("--checkpoint-dir", type=str, required=True)
    # default command is train
    add_common(p)
    return p


def merge_cli_config(args: argparse.Namespace) -> DGDMConfig:
    overrides: dict = {"model": {}, "training": {}, "data": {},
                       "hardware": {}, "logging": {}, "experiment": {}}
    m, t, d, h = (overrides["model"], overrides["training"],
                  overrides["data"], overrides["hardware"])
    if getattr(args, "preset", None):
        from ..models.presets import PRESETS
        if args.preset not in PRESETS:
            raise SystemExit(f"unknown preset {args.preset!r}; "
                             f"options: {sorted(PRESETS)}")
        preset = {k: (list(v) if isinstance(v, tuple) else v)
                  for k, v in PRESETS[args.preset].items()
                  if k != "label_note"}
        m.update(preset)
    if args.node_features is not None:
        m["node_features"] = args.node_features
    if args.hidden_dims is not None:
        m["hidden_dims"] = [int(x) for x in args.hidden_dims.split(",")]
    if args.num_diffusion_steps is not None:
        m["num_diffusion_steps"] = args.num_diffusion_steps
    if args.attention_heads is not None:
        m["attention_heads"] = args.attention_heads
    if args.graph_layers is not None:
        m["graph_layers"] = args.graph_layers
    if args.dropout is not None:
        m["dropout"] = args.dropout
    if args.pooling is not None:
        m["pooling"] = args.pooling
    if args.num_classes is not None:
        m["num_classes"] = args.num_classes
    if args.regression_targets is not None:
        m["regression_targets"] = args.regression_targets
    if getattr(args, "survival_mode", None) is not None:
        overrides["survival"] = {"enabled": True, "mode": args.survival_mode}
        if args.survival_intervals is not None:
            overrides["survival"]["num_intervals"] = args.survival_intervals
    if args.max_epochs is not None:
        t["max_epochs"] = args.max_epochs
    if args.pretrain_epochs is not None:
        t["pretrain_epochs"] = args.pretrain_epochs
    if args.learning_rate is not None:
        t["learning_rate"] = args.learning_rate
    if args.weight_decay is not None:
        t["weight_decay"] = args.weight_decay
    if args.masking_ratio is not None:
        t["masking_ratio"] = args.masking_ratio
    if args.scheduler is not None:
        t["scheduler_type"] = args.scheduler
    if args.batch_size is not None:
        d["batch_size"] = args.batch_size
    if args.dataset_type is not None:
        d["dataset_type"] = args.dataset_type
    if args.devices is not None:
        h["devices"] = args.devices
    if getattr(args, "mesh_shape", None):
        shape = [int(x) for x in args.mesh_shape.split(",")]
        h["mesh_shape"] = shape
        if getattr(args, "mesh_axes", None):
            h["mesh_axes"] = [a.strip() for a in args.mesh_axes.split(",")]
        else:
            h["mesh_axes"] = ["data", "model"][:len(shape)] \
                if len(shape) <= 2 else [f"axis{i}" for i in range(len(shape))]
    if args.precision is not None:
        h["precision"] = args.precision
    if args.seed is not None:
        overrides["experiment"]["seed"] = args.seed
    if args.save_top_k is not None:
        overrides["logging"]["save_top_k"] = args.save_top_k
    return load_config(args.config, overrides=overrides)


def _build_dataset(cfg: DGDMConfig, args):
    from ..data import GraphDataset, HistopathDataset, SlideDataset, load_labels
    from ..preprocessing import SlideProcessor, TissueGraphBuilder
    data_dir = Path(args.data_dir)
    labels = load_labels(args.metadata) if args.metadata else {}
    if cfg.data.dataset_type == "graph":
        return HistopathDataset(data_dir, dataset_type="graph",
                                metadata_path=args.metadata,
                                augmentations=cfg.data.augmentations)
    proc = SlideProcessor(
        patch_size=cfg.data.patch_size, magnifications=cfg.data.magnifications,
        tissue_threshold=cfg.data.tissue_threshold,
        max_patches=cfg.data.max_patches)
    builder = TissueGraphBuilder(
        feature_extractor=cfg.data.feature_extractor,
        node_buckets=cfg.data.node_buckets,
        spatial_sort=getattr(cfg.data, "spatial_sort", False),
        knn_window=getattr(cfg.data, "knn_window", None))
    paths = sorted(p for p in data_dir.rglob("*")
                   if p.suffix.lower() in (".svs", ".tiff", ".tif", ".ndpi", ".wsi"))
    return SlideDataset(paths, processor=proc, graph_builder=builder,
                        labels=labels, augmentations=cfg.data.augmentations)


def _execute_training(cfg: DGDMConfig, args, resume_dir=None) -> int:
    import jax
    from ..data import HistopathDataModule
    from ..training import CheckpointManager, DGDMTrainer

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, out_dir / "config_snapshot.yaml")

    dataset = _build_dataset(cfg, args)
    if len(dataset) == 0:
        logger.error("no data found in %s", args.data_dir)
        return 1
    dm = HistopathDataModule(
        dataset, batch_size=cfg.data.batch_size,
        train_split=cfg.data.train_split, val_split=cfg.data.val_split,
        test_split=cfg.data.test_split, shuffle_train=cfg.data.shuffle_train,
        seed=cfg.experiment.seed)
    dm.setup()
    logger.info("dataset: %s", dm.get_dataset_info())

    trainer = DGDMTrainer.from_config(cfg)
    trainer.config.steps_per_epoch = max(1, len(dm.train_dataloader()))
    example = next(iter(dm.train_dataloader()))
    trainer.init_state(jax.random.PRNGKey(cfg.experiment.seed), example)

    ckpt_dir = Path(resume_dir) if resume_dir else out_dir / "checkpoints"
    mgr = CheckpointManager(ckpt_dir, save_top_k=cfg.logging.save_top_k,
                            monitor=cfg.logging.monitor_metric)
    start_step_in_epoch = 0
    if resume_dir and mgr.last_step is not None:
        trainer.state = trainer.place_state(mgr.restore(trainer.state))
        resume_meta = mgr.record_extra(mgr.last_step).get("resume")
        if resume_meta and resume_meta.get("mid_epoch"):
            # preemption checkpoint: re-enter the SAME epoch, skipping the
            # steps already taken (bit-identical replay — preemption.py)
            trainer.current_epoch = int(resume_meta["epoch"])
            start_step_in_epoch = int(resume_meta["step_in_epoch"])
            logger.info("resumed mid-epoch: epoch %d step %d",
                        trainer.current_epoch, start_step_in_epoch)
        else:
            trainer.current_epoch = mgr.last_step + 1
            logger.info("resumed from epoch %d", trainer.current_epoch)

    # experiment logger: TB/W&B by config flag, CSV/JSONL always
    # (reference cli/train.py:332-343)
    from ..training.experiment_logging import make_logger
    train_logger = make_logger(cfg.logging, out_dir / "logs",
                               run_name=cfg.experiment.name
                               if getattr(cfg.experiment, "name", None) else None)
    train_logger.log_hparams(config_to_dict(cfg))

    # graceful preemption: SIGTERM flips a flag; fit() checkpoints the exact
    # (epoch, step) position and exits cleanly instead of dying mid-step
    from ..training import PreemptionGuard
    guard = PreemptionGuard(install=True)
    try:
        result = trainer.fit(
            dm.train_dataloader(), dm.val_dataloader(),
            max_epochs=cfg.training.max_epochs, checkpoint_manager=mgr,
            early_stopping_patience=args.early_stopping_patience,
            train_logger=train_logger, preemption_guard=guard,
            start_step_in_epoch=start_step_in_epoch)
    finally:
        guard.uninstall()
        train_logger.close()
    if result.get("interrupted"):
        logger.warning("training preempted at %s; resume with "
                       "`dgdm-train resume --checkpoint-dir %s`",
                       result.get("resume"), ckpt_dir)
        return 75  # EX_TEMPFAIL: scheduler should reschedule

    # test pass
    test_metrics = []
    for batch in dm.test_dataloader():
        test_metrics.append(trainer.validation_step(batch))
    if test_metrics:
        import numpy as np
        test_loss = float(np.mean([float(m["loss"]) for m in test_metrics]))
        logger.info("test_loss=%.4f", test_loss)
        result["test_loss"] = test_loss

    # final model bundle
    from ..training.checkpoint import save_model_bundle
    model_cfg = {
        "node_features": cfg.model.node_features,
        "hidden_dims": list(cfg.model.hidden_dims),
        "num_diffusion_steps": cfg.model.num_diffusion_steps,
        "attention_heads": cfg.model.attention_heads,
        "dropout": cfg.model.dropout,
        "graph_layers": cfg.model.graph_layers,
        "use_spatial_attention": cfg.model.use_spatial_attention,
        "use_hierarchical": cfg.model.use_hierarchical,
        "pooling": cfg.model.pooling,
        "num_classes": trainer.model.num_classes,
        "regression_targets": trainer.model.regression_targets,
        "survival_mode": trainer.model.survival_mode,
        "survival_intervals": trainer.model.survival_intervals,
        "compute_dtype": cfg.model.compute_dtype,
    }
    import jax as _jax
    save_model_bundle(out_dir / "final_model.npz",
                      _jax.device_get(trainer.state.params), model_cfg,
                      extra={"history_len": len(result["history"])})
    (out_dir / "history.json").write_text(json.dumps(result["history"], indent=2))
    logger.info("training complete; outputs in %s", out_dir)
    return 0


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    setup_logging(args.log_level, args.log_file)
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda s, f: sys.exit(130))
    if args.data_dir is None and args.command != "validate":
        parser.error("--data-dir is required")
    InputValidator.validate_path(args.data_dir, "data_dir", must_exist=True)
    cfg = merge_cli_config(args)
    if args.command == "resume":
        return _execute_training(cfg, args, resume_dir=args.checkpoint_dir)
    if args.command == "validate":
        return _validate(cfg, args)
    return _execute_training(cfg, args)


def _validate(cfg: DGDMConfig, args) -> int:
    import jax
    import numpy as np
    from ..data import HistopathDataModule
    from ..training import CheckpointManager, DGDMTrainer
    dataset = _build_dataset(cfg, args)
    dm = HistopathDataModule(dataset, batch_size=cfg.data.batch_size,
                             seed=cfg.experiment.seed)
    dm.setup()
    trainer = DGDMTrainer.from_config(cfg)
    example = next(iter(dm.val_dataloader()))
    trainer.init_state(jax.random.PRNGKey(0), example)
    mgr = CheckpointManager(args.checkpoint_dir)
    trainer.state = trainer.place_state(mgr.restore(trainer.state, best=True))
    losses = [float(trainer.validation_step(b)["loss"])
              for b in dm.val_dataloader()]
    print(json.dumps({"val_loss": float(np.mean(losses)), "batches": len(losses)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
