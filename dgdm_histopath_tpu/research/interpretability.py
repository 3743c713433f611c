"""Clinical interpretability: saliency, feature attribution, report text.

Parity surface: reference ``dgdm_histopath/research/interpretability_framework.py``
— ``ClinicalSaliencyAnalyzer`` (:46; gradient saliency over patches),
``PathologyFeatureExtractor`` (:315; region-level summary statistics),
``ClinicalReportGenerator`` (:490; structured findings → narrative).

TPU-native: saliency is a single jitted gradient of the class logit w.r.t.
node features (the reference looped hooks through torch autograd).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import PaddedGraph
from ..utils.logging import get_logger

logger = get_logger("research")


class ClinicalSaliencyAnalyzer:
    """Gradient-based saliency over tissue-graph nodes."""

    def __init__(self, model, params):
        self.model = model
        self.params = params

        def _class_score(x, graph, class_idx):
            out = self.model.apply(self.params, graph.replace(x=x),
                                   mode="inference", deterministic=True)
            return out["classification_logits"][..., class_idx].sum()

        self._grad = jax.jit(jax.grad(_class_score), static_argnames=())

    def node_saliency(self, graph: PaddedGraph,
                      class_idx: Optional[int] = None) -> np.ndarray:
        """L2 gradient magnitude per node -> [B, N] (or [N])."""
        if class_idx is None:
            out = self.model.apply(self.params, graph, mode="inference",
                                   deterministic=True)
            class_idx = int(np.asarray(
                out["classification_logits"]).argmax(-1).ravel()[0])
        g = self._grad(graph.x, graph, class_idx)
        sal = np.asarray(jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=-1)))
        return sal * np.asarray(graph.node_mask)

    def integrated_gradients(self, graph: PaddedGraph, class_idx: int,
                             steps: int = 16) -> np.ndarray:
        """Integrated gradients from a zero-feature baseline."""
        alphas = jnp.linspace(0.0, 1.0, steps)

        def one(alpha):
            return self._grad(graph.x * alpha, graph, class_idx)

        grads = jax.lax.map(one, alphas)               # [S, ..., N, F]
        avg = jnp.mean(grads, axis=0)
        ig = np.asarray(jnp.sum(graph.x * avg, axis=-1).astype(jnp.float32))
        return ig * np.asarray(graph.node_mask)


class PathologyFeatureExtractor:
    """Region-level morphology summaries from saliency + coordinates
    (reference :315)."""

    @staticmethod
    def summarize_regions(saliency: np.ndarray, pos: np.ndarray,
                          node_mask: np.ndarray, top_fraction: float = 0.1
                          ) -> Dict[str, Any]:
        sal = saliency[node_mask]
        coords = pos[node_mask]
        if len(sal) == 0:
            return {"num_nodes": 0}
        k = max(1, int(len(sal) * top_fraction))
        top = np.argsort(-sal)[:k]
        top_coords = coords[top]
        centroid = top_coords.mean(axis=0)
        spread = top_coords.std(axis=0)
        return {
            "num_nodes": int(len(sal)),
            "salient_nodes": int(k),
            "saliency_mean": float(sal.mean()),
            "saliency_max": float(sal.max()),
            "salient_centroid": [float(centroid[0]), float(centroid[1])],
            "salient_spread": [float(spread[0]), float(spread[1])],
            "focality": float(1.0 / (1.0 + spread.mean())),  # 1 = focal, →0 diffuse
        }


class ClinicalReportGenerator:
    """Structured findings → narrative clinical summary (reference :490)."""

    def __init__(self, class_names: Optional[List[str]] = None,
                 language: str = "en"):
        self.class_names = class_names
        from ..utils.globalization import InternationalizationManager
        self.i18n = InternationalizationManager(language)

    def generate(self, prediction: Dict[str, Any],
                 region_summary: Optional[Dict[str, Any]] = None) -> str:
        lines = []
        cls = prediction.get("predicted_class")
        name = (self.class_names[cls] if self.class_names and cls is not None
                else f"class {cls}")
        conf = prediction.get("confidence", 0.0)
        lines.append(f"{self.i18n.t('prediction')}: {name} "
                     f"({self.i18n.t('confidence').lower()}: {conf:.1%}).")
        unc = prediction.get("uncertainty", {})
        if unc:
            level = ("low" if unc.get("normalized_entropy", 0) < 0.3
                     else "moderate" if unc.get("normalized_entropy", 0) < 0.7
                     else "high")
            lines.append(f"Model {self.i18n.t('uncertainty').lower()} is {level} "
                         f"(normalized entropy "
                         f"{unc.get('normalized_entropy', 0):.2f}).")
        if region_summary and region_summary.get("num_nodes"):
            foc = region_summary["focality"]
            pattern = "focal" if foc > 0.6 else "multifocal/diffuse"
            cx, cy = region_summary["salient_centroid"]
            lines.append(
                f"Attention is {pattern}; the most informative region is "
                f"centered at normalized coordinates ({cx:.2f}, {cy:.2f}) "
                f"covering {region_summary['salient_nodes']} of "
                f"{region_summary['num_nodes']} analyzed tissue patches.")
        bios = prediction.get("biomarkers") or []
        if bios:
            top = bios[0]
            lines.append(f"Top-ranked region (attention "
                         f"{top['attention_score']:.3f}) at position "
                         f"({top['position'][0]:.2f}, {top['position'][1]:.2f}).")
        lines.append("This is a research-use-only computational analysis and "
                     "not a clinical diagnosis.")
        return " ".join(lines)
