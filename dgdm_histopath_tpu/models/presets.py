"""Model presets: the published DGDM family configurations.

Parity surface: the reference's model zoo (README model table — DGDM-Base /
DGDM-Large / DGDM-Clinical; reference README.md:182-184,267-271) realized as
constructors. Checkpoint URLs in the reference were placeholders
(SURVEY §6 caveats), so presets define architectures, not weights.
"""

from __future__ import annotations

from typing import Optional

from .dgdm import DGDMModel

PRESETS = {
    # configs/dgdm_base.yaml
    "dgdm-base": dict(
        node_features=768, hidden_dims=(512, 256, 128), num_diffusion_steps=10,
        attention_heads=8, dropout=0.1, graph_layers=4,
        use_spatial_attention=True, use_hierarchical=True,
        diffusion_schedule="cosine", pooling="attention"),
    # configs/dgdm_large.yaml
    "dgdm-large": dict(
        node_features=1024, hidden_dims=(768, 512, 256, 128),
        num_diffusion_steps=20, attention_heads=16, dropout=0.15,
        graph_layers=6, use_spatial_attention=True, use_hierarchical=True,
        diffusion_schedule="cosine", pooling="attention"),
    # multi-cancer clinical variant (reference README "DGDM-Clinical")
    "dgdm-clinical": dict(
        node_features=768, hidden_dims=(512, 256, 128), num_diffusion_steps=15,
        attention_heads=8, dropout=0.1, graph_layers=5,
        use_spatial_attention=True, use_hierarchical=True,
        diffusion_schedule="cosine", pooling="attention",
        label_note="multi-cancer grading"),
    # light preset for edge/latency-critical deployments
    "dgdm-small": dict(
        node_features=384, hidden_dims=(256, 128), num_diffusion_steps=5,
        attention_heads=8, dropout=0.1, graph_layers=2,
        use_spatial_attention=True, use_hierarchical=False,
        diffusion_schedule="cosine", pooling="attention"),
}


def create_model(preset: str = "dgdm-base",
                 num_classes: Optional[int] = None,
                 regression_targets: int = 0,
                 **overrides) -> DGDMModel:
    """Build a DGDMModel from a named preset with optional overrides."""
    if preset not in PRESETS:
        raise ValueError(f"unknown preset {preset!r}; options: {sorted(PRESETS)}")
    cfg = {k: v for k, v in PRESETS[preset].items() if k != "label_note"}
    cfg.update(overrides)
    return DGDMModel(num_classes=num_classes,
                     regression_targets=regression_targets, **cfg)


def list_presets():
    return sorted(PRESETS)
