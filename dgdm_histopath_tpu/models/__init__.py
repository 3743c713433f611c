"""Model layer (reference L4, ``dgdm_histopath/models/``)."""

from .dgdm import DGDMModel
from .encoders import FeatureEncoder, GraphEncoder, PositionalEncoder, HierarchicalEncoder
from .decoders import (
    ClassificationHead, RegressionHead, SurvivalHead, MultiTaskHead,
    cross_entropy_loss, cox_partial_likelihood, discrete_survival_loss,
)
from .pooling import (
    GlobalMeanPool, GlobalMaxPool, GlobalAttentionPool, GlobalSet2SetPool, make_pool,
)
from .presets import (create_model, default_window_policy, list_presets, PRESETS)

__all__ = [
    "DGDMModel",
    "FeatureEncoder", "GraphEncoder", "PositionalEncoder", "HierarchicalEncoder",
    "ClassificationHead", "RegressionHead", "SurvivalHead", "MultiTaskHead",
    "cross_entropy_loss", "cox_partial_likelihood", "discrete_survival_loss",
    "GlobalMeanPool", "GlobalMaxPool", "GlobalAttentionPool", "GlobalSet2SetPool",
    "make_pool",
    "create_model", "default_window_policy", "list_presets", "PRESETS",
]
