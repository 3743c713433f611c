"""AttentionVisualizer: heatmaps, graph renders, prediction summaries.

Parity surface: reference ``dgdm_histopath/evaluation/visualizer.py:34-509``
— matplotlib attention scatter/heatmap (:102-153), graph render (:214-302),
prediction summary panel (:304-402), biomarker chart (:404-459), uncertainty
plot (:461-509). (The reference's plotly variants are covered by the same
figures; plotly is optional here.)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("evaluation")

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    MATPLOTLIB_AVAILABLE = True
except ImportError:  # pragma: no cover
    MATPLOTLIB_AVAILABLE = False


def _require_mpl():
    if not MATPLOTLIB_AVAILABLE:
        raise ImportError("matplotlib is required for visualization")


class AttentionVisualizer:
    """Render attention/uncertainty/biomarker figures for slide predictions."""

    def __init__(self, cmap: str = "viridis", figsize=(10, 8), dpi: int = 120):
        self.cmap = cmap
        self.figsize = figsize
        self.dpi = dpi

    # ------------------------------------------------------------------
    def attention_heatmap(
        self,
        pos: np.ndarray,                 # [N, 2] normalized coords
        attention: np.ndarray,           # [N]
        node_mask: Optional[np.ndarray] = None,
        save_path: Optional[str | Path] = None,
        title: str = "Attention heatmap",
    ):
        """Scatter heatmap of per-patch attention (reference :102-153)."""
        _require_mpl()
        if node_mask is not None:
            pos, attention = pos[node_mask], attention[node_mask]
        fig, ax = plt.subplots(figsize=self.figsize, dpi=self.dpi)
        sc = ax.scatter(pos[:, 0], 1.0 - pos[:, 1], c=attention,
                        cmap=self.cmap, s=24, edgecolors="none")
        fig.colorbar(sc, ax=ax, label="attention")
        ax.set_title(title)
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.set_aspect("equal")
        return self._finish(fig, save_path)

    def render_graph(
        self,
        pos: np.ndarray,
        nbr_idx: np.ndarray,
        nbr_mask: np.ndarray,
        node_mask: Optional[np.ndarray] = None,
        node_values: Optional[np.ndarray] = None,
        save_path: Optional[str | Path] = None,
        max_edges: int = 2000,
        title: str = "Tissue graph",
    ):
        """Node-link render of the tissue graph (reference :214-302)."""
        _require_mpl()
        fig, ax = plt.subplots(figsize=self.figsize, dpi=self.dpi)
        n = pos.shape[0]
        mask = node_mask if node_mask is not None else np.ones(n, bool)
        # edges
        src = nbr_idx.reshape(-1)
        dst = np.repeat(np.arange(n), nbr_idx.shape[1])
        ok = nbr_mask.reshape(-1) & mask[dst] & mask[src]
        src, dst = src[ok][:max_edges], dst[ok][:max_edges]
        for s, d in zip(src, dst):
            ax.plot([pos[s, 0], pos[d, 0]], [1 - pos[s, 1], 1 - pos[d, 1]],
                    color="lightgray", linewidth=0.4, zorder=1)
        vals = node_values[mask] if node_values is not None else "tab:blue"
        sc = ax.scatter(pos[mask, 0], 1 - pos[mask, 1], c=vals, cmap=self.cmap,
                        s=22, zorder=2)
        if node_values is not None:
            fig.colorbar(sc, ax=ax)
        ax.set_title(title)
        ax.set_aspect("equal")
        return self._finish(fig, save_path)

    def prediction_summary(
        self,
        result: Dict[str, Any],
        class_names: Optional[Sequence[str]] = None,
        save_path: Optional[str | Path] = None,
    ):
        """Multi-panel summary: probabilities + attention + uncertainty
        (reference :304-402)."""
        _require_mpl()
        fig, axes = plt.subplots(1, 3, figsize=(15, 4.5), dpi=self.dpi)
        # class probabilities
        probs = result.get("probabilities")
        if probs is not None:
            names = class_names or [f"class {i}" for i in range(len(probs))]
            axes[0].bar(range(len(probs)), probs, color="tab:blue")
            axes[0].set_xticks(range(len(probs)))
            axes[0].set_xticklabels(names, rotation=30, ha="right")
            axes[0].set_ylim(0, 1)
            axes[0].set_title(f"prediction: {names[result['predicted_class']]}"
                              f" ({result['confidence']:.2f})")
        # attention spatial map
        attn = result.get("attention_weights")
        infos = result.get("patch_info")
        if attn is not None and infos:
            xs = np.asarray([p["x"] for p in infos], np.float64)
            ys = np.asarray([p["y"] for p in infos], np.float64)
            xs = xs / max(xs.max(), 1)
            ys = ys / max(ys.max(), 1)
            sc = axes[1].scatter(xs, 1 - ys, c=attn[: len(xs)], cmap=self.cmap, s=14)
            fig.colorbar(sc, ax=axes[1])
            axes[1].set_title("patch attention")
            axes[1].set_aspect("equal")
        # uncertainty
        unc = result.get("uncertainty")
        if unc:
            keys = ["entropy", "normalized_entropy", "max_probability", "margin"]
            vals = [unc.get(k, np.nan) for k in keys]
            axes[2].bar(range(len(keys)), vals, color="tab:orange")
            axes[2].set_xticks(range(len(keys)))
            axes[2].set_xticklabels(keys, rotation=30, ha="right")
            axes[2].set_title("uncertainty")
        fig.suptitle(result.get("slide_id", ""))
        fig.tight_layout()
        return self._finish(fig, save_path)

    def biomarker_chart(self, biomarkers: List[Dict[str, Any]],
                        save_path: Optional[str | Path] = None):
        """Top-k biomarker attention bar chart (reference :404-459)."""
        _require_mpl()
        fig, ax = plt.subplots(figsize=(8, 5), dpi=self.dpi)
        ranks = [b["rank"] for b in biomarkers]
        scores = [b["attention_score"] for b in biomarkers]
        ax.barh(ranks, scores, color="tab:green")
        ax.invert_yaxis()
        ax.set_xlabel("attention score")
        ax.set_ylabel("biomarker rank")
        ax.set_title("Top attended regions")
        return self._finish(fig, save_path)

    def uncertainty_plot(self, uncertainties: List[Dict[str, float]],
                         save_path: Optional[str | Path] = None):
        """Cohort-level uncertainty distribution (reference :461-509)."""
        _require_mpl()
        fig, ax = plt.subplots(figsize=(8, 5), dpi=self.dpi)
        ent = [u["entropy"] for u in uncertainties]
        ax.hist(ent, bins=20, color="tab:purple", alpha=0.8)
        ax.set_xlabel("prediction entropy")
        ax.set_ylabel("count")
        ax.set_title("Uncertainty distribution")
        return self._finish(fig, save_path)

    # ------------------------------------------------------------------
    def _finish(self, fig, save_path):
        if save_path is not None:
            save_path = Path(save_path)
            save_path.parent.mkdir(parents=True, exist_ok=True)
            fig.savefig(save_path, bbox_inches="tight")
            plt.close(fig)
            return save_path
        return fig
