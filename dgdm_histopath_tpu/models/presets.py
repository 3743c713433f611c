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
    # configs/dgdm_large.yaml — windowed+banded by default at its 2048-node
    # buckets (default_window_policy below; pass spatial_window=None,
    # graph_window=None for dense reference-parity semantics)
    "dgdm-large": dict(
        node_features=1024, hidden_dims=(768, 512, 256, 128),
        num_diffusion_steps=20, attention_heads=16, dropout=0.15,
        graph_layers=6, use_spatial_attention=True, use_hierarchical=True,
        diffusion_schedule="cosine", pooling="attention",
        spatial_window=128, graph_window=128),
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


# Default scaling-config policy (VERDICT r3 #4): at large node buckets the
# windowed+banded config is the default, resting on throughput evidence
# plus multi-seed accuracy NEUTRALITY (not uplift).
#
# Evidence trail:
#   * throughput — combined windowed (W=64 Base / W=128 Large) is 1.23x / 2.76x
#     paired on hardware (ADR-0004 add.9/10); at N>=2048 the dense N^2
#     spatial pass dominates the step and windowed is strictly faster.
#   * accuracy — single-seed deltas are NOT evidence (train seed 0
#     measured +0.168, seed 1 −0.199 for the same A/B, each CI excluding
#     zero in opposite directions); the gate is the pooled multi-seed delta
#     with a seed-resampling bootstrap
#     (docs/results/c16_hard*/report_pooled.json, ADR-0006). Two pooled
#     findings back the default:
#       - the BINDING gate (docs/results/c16_hard_n1024: 2048px slides,
#         patch 32, bucket 1024; MEASURED mean 417 real nodes, window32 =
#         13.0 Morton blocks — the shipped 2048/128 geometry spans 16) is
#         the semantics-bearing accuracy evidence: pooled window delta
#         +0.036 [-0.028, +0.102] over 20 training seeds — neutral-to-
#         positive where the band genuinely constrains compute.
#       - bucket-256 gate, 10 seeds/arm: window32 +0.022, window16 +0.020
#         (CIs straddle zero). CAVEAT: that gate's graphs hold only ~29
#         REAL nodes, so windows >= 16 never BIND (all real nodes fit
#         inside the ±1-block band — the arm is semantically ~= dense).
#         Useful as "windowed machinery costs nothing when it does not
#         bind", not as semantics evidence.
#     The default stands while the BINDING pooled delta is
#     neutral-or-positive; a pooled negative whose TWO-LEVEL CI excludes
#     zero reverts it (VERDICT r4 #1). The binding gate's own trajectory
#     — k=5 -0.038 (fixed-seed CI < 0), k=10 +0.041 (fixed-seed CI > 0),
#     k=15 +0.009, k=20 +0.036 — shows fixed-seed intervals "settling"
#     in OPPOSITE directions on the same experiment; only the two-level
#     interval is the decision statistic.
#     window8 at the 256-gate — the one arm that DID bind there (29/8 ≈
#     3.7 blocks) — pools to −0.059 over 5 seeds (fixed-seed CI < 0; only
#     −0.017 on the TCGA ordinal task): far below the shipped 1/16
#     window/N ratio it cuts most real adjacency, a real but
#     task-dependent cost; don't shrink windows below the task's feature
#     scale.
#   * at N<=1024 (Base bucket) dense stays the default: the window lever
#     pays 1.23x there but windowed attention is an approximation of the
#     all-pairs reference semantics, and the bucket fits comfortably.
#     NOTE (round 5): the binding gate IS a bucket-1024 geometry, so its
#     neutral-to-positive pooled delta is also the first semantics
#     evidence that a windowed Base default would be accuracy-safe; dense
#     is retained at <=1024 as a reference-parity-by-default choice (the
#     1.23x is available via spatial_window=graph_window=64 opt-in), not
#     for lack of evidence.
#
# Policy: buckets >= WINDOWED_DEFAULT_MIN_NODES get spatial_window =
# graph_window = DEFAULT_WINDOW (graphs must be built with
# TissueGraphBuilder(spatial_sort=True, knn_window=DEFAULT_WINDOW) for the
# banded compute to be exact — the predictor derives this automatically,
# dgdm-preprocess build-graphs takes --model-config, and the trainer
# hard-rejects out-of-band graphs).
WINDOWED_DEFAULT_MIN_NODES = 2048
DEFAULT_WINDOW = 128


def default_window_policy(max_nodes: int):
    """Return the default (spatial_window, graph_window) for a node bucket.

    ``None`` means dense (all-pairs attention + full kNN message passing —
    exact reference parity semantics). Buckets >= 2048 default to the
    windowed+banded scaling config (see policy note above).
    """
    if max_nodes >= WINDOWED_DEFAULT_MIN_NODES:
        return DEFAULT_WINDOW, DEFAULT_WINDOW
    return None, None


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
