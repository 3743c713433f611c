"""Training layer (reference L6, ``dgdm_histopath/training/``)."""

from .trainer import DGDMTrainer, TrainerConfig, TrainState, make_optimizer, make_lr_schedule
from .losses import (
    diffusion_loss, contrastive_loss, contrastive_loss_pairs, masked_lm_loss,
    graph_reconstruction_loss, multi_task_loss,
)
from .checkpoint import CheckpointManager, save_model_bundle, load_model_bundle
from .experiment_logging import TrainLogger, make_logger
from .preemption import PreemptionGuard, skip_batches

__all__ = [
    "DGDMTrainer", "TrainerConfig", "TrainState", "make_optimizer", "make_lr_schedule",
    "diffusion_loss", "contrastive_loss", "contrastive_loss_pairs", "masked_lm_loss",
    "graph_reconstruction_loss", "multi_task_loss",
    "CheckpointManager", "save_model_bundle", "load_model_bundle",
    "TrainLogger", "make_logger",
    "PreemptionGuard", "skip_batches",
]
