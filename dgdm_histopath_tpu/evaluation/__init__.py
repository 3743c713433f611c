"""Evaluation/inference layer (reference L7, ``dgdm_histopath/evaluation/``)."""

from .predictor import DGDMPredictor, load_model_checkpoint
from .visualizer import AttentionVisualizer
from .metrics import (
    compute_classification_metrics, compute_regression_metrics,
    compute_segmentation_metrics, compute_graph_statistics,
    compute_clinical_metrics, concordance_index, dice_score, iou_score,
    bootstrap_ci, paired_bootstrap_delta, pooled_paired_bootstrap_delta,
    quadratic_weighted_kappa, expected_grade_decode,
)

__all__ = [
    "DGDMPredictor", "load_model_checkpoint", "AttentionVisualizer",
    "compute_classification_metrics", "compute_regression_metrics",
    "compute_segmentation_metrics", "compute_graph_statistics",
    "quadratic_weighted_kappa", "expected_grade_decode",
    "compute_clinical_metrics", "concordance_index", "dice_score", "iou_score",
    "bootstrap_ci", "paired_bootstrap_delta", "pooled_paired_bootstrap_delta",
]
