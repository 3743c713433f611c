"""TissueGraphBuilder: patches → features → kNN tissue graph (PaddedGraph).

Parity surface: reference ``dgdm_histopath/preprocessing/tissue_graph_builder.py``
(:42-516) — DINOv2 patch features (:87-99) with simple-CNN fallback
(:108-127), node creation with coordinate normalization (:200-267) and 5-d
placeholder features when images are absent (:234-252), spatial kNN edges
(k=8, weight=exp(-10·dist), :290-320), morphological kNN edges (k=16,
cosine similarity, :322-352), PyG Data assembly (:367-437), hierarchical
degree-based coarsening (:449-516).

TPU-native design (vs SURVEY §3.3's "worst offender" hot loops):
  * features are extracted in LARGE jitted batches (``models.vit``), not one
    forward per patch;
  * both kNN searches run on device as tiled matmuls + ``top_k``
    (``ops.knn.build_dual_knn``) instead of host sklearn;
  * the output is a static-shape ``PaddedGraph`` in a node bucket, ready to
    batch under jit with zero recompilation across slides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.vit import PatchFeatureExtractor
from ..ops.graph import PaddedGraph, pick_bucket
from ..ops.knn import build_dual_knn
from ..utils.exceptions import GraphConstructionError
from ..utils.logging import get_logger
from ..utils.monitoring import monitor_operation
from .slide_processor import SlideData

logger = get_logger("preprocessing")

PLACEHOLDER_DIM = 5  # reference's imageless placeholder features (:234-252)


class TissueGraphBuilder:
    """Build padded tissue graphs from processed slide data."""

    def __init__(
        self,
        feature_extractor: str = "dinov2",
        k_spatial: int = 8,
        k_morphological: int = 16,
        spatial_decay: float = 10.0,
        node_buckets: Sequence[int] = (128, 256, 512, 1024, 2048),
        feature_batch_size: int = 256,
        extractor: Optional[PatchFeatureExtractor] = None,
        spatial_sort: bool = False,
        knn_window: Optional[int] = None,
        per_slide_feature_norm: bool = False,
    ):
        self.k_spatial = k_spatial
        self.k_morphological = k_morphological
        self.spatial_decay = spatial_decay
        self.node_buckets = list(node_buckets)
        self.feature_extractor_name = feature_extractor
        self._extractor = extractor
        self._extractor_batch = feature_batch_size
        # Morton-order nodes at build time (semantic no-op; makes block
        # sharding of the node axis spatially local so the halo-exchange SP
        # path — parallel/halo.py, ADR-0005 add.2 — stays cheap)
        self.spatial_sort = spatial_sort
        # restrict BOTH kNN searches to each node's ±1 Morton block band of
        # width ``knn_window``: every edge of the built graph is then
        # addressable by the model's banded message passing
        # (``DGDMModel(graph_window=knn_window)``) — banded compute becomes
        # exact by construction rather than an edge-dropping approximation.
        # Morphological edges become band-local (nearest similar patches
        # within the spatial neighborhood instead of slide-global).
        # Requires spatial_sort.
        if knn_window is not None and not spatial_sort:
            raise ValueError("knn_window requires spatial_sort=True")
        self.knn_window = knn_window
        # z-score node features within each slide (robust center: median).
        # Slide-level staining/scanner shifts move ABSOLUTE feature values
        # ~3x across slides while diagnostic signal is the WITHIN-slide
        # contrast of focal regions against the slide's own baseline — the
        # same per-slide reference the reference's Macenko fit_to_template
        # normalization approximates in pixel space
        # (stain_normalization.py; reference preprocessing pipeline).
        self.per_slide_feature_norm = per_slide_feature_norm

    @property
    def extractor(self) -> Optional[PatchFeatureExtractor]:
        if self._extractor is None and self.feature_extractor_name not in ("none", None):
            self._extractor = PatchFeatureExtractor(
                arch=self.feature_extractor_name,
                batch_size=self._extractor_batch)
        return self._extractor

    @property
    def feature_dim(self) -> int:
        if self.feature_extractor_name in ("none", None):
            return PLACEHOLDER_DIM
        return self.extractor.feature_dim

    # ------------------------------------------------------------------
    def extract_patch_features(self, patches: np.ndarray) -> np.ndarray:
        """Featurize patch images in large device batches."""
        with monitor_operation("extract_patch_features"):
            return self.extractor.extract(patches)

    @staticmethod
    def normalize_coordinates(infos, slide_dims: Tuple[int, int]) -> np.ndarray:
        """Patch centers normalized to [0, 1] (reference :200-230)."""
        w0, h0 = slide_dims
        out = np.zeros((len(infos), 2), np.float32)
        for i, p in enumerate(infos):
            half = p.size / 2.0
            out[i, 0] = (p.x + half) / max(w0, 1)
            out[i, 1] = (p.y + half) / max(h0, 1)
        return out

    def placeholder_features(self, infos, pos: np.ndarray) -> np.ndarray:
        """5-d imageless node features: (x, y, tissue_frac, mag/40, level)
        (reference :234-252)."""
        out = np.zeros((len(infos), PLACEHOLDER_DIM), np.float32)
        out[:, 0:2] = pos
        for i, p in enumerate(infos):
            out[i, 2] = p.tissue_fraction
            out[i, 3] = p.magnification / 40.0
            out[i, 4] = float(p.level)
        return out

    # ------------------------------------------------------------------
    def build_graph(
        self,
        slide_data: SlideData,
        label=None,
        bucket: Optional[int] = None,
        features: Optional[np.ndarray] = None,
    ) -> PaddedGraph:
        """SlideData → PaddedGraph (reference build_graph :164-437)."""
        infos = slide_data.patch_info
        n = len(infos)
        if n == 0:
            raise GraphConstructionError("slide has no patches",
                                         {"slide": slide_data.slide_id})
        dims = slide_data.metadata.get("dimensions", [1, 1])
        pos = self.normalize_coordinates(infos, (dims[0], dims[1]))

        if features is None:
            if self.feature_extractor_name in ("none", None) or slide_data.patches.size == 0:
                features = self.placeholder_features(infos, pos)
            else:
                features = self.extract_patch_features(slide_data.patches)
        features = np.asarray(features, np.float32)
        if self.per_slide_feature_norm:
            # applied pre-padding: every row is a real node here
            features = ((features - np.median(features, axis=0))
                        / (features.std(axis=0) + 1e-6))

        target = bucket if bucket is not None else pick_bucket(n, self.node_buckets)
        if n > target:
            # uniform node subsample into the largest bucket
            idx = np.linspace(0, n - 1, target).astype(int)
            features, pos = features[idx], pos[idx]
            infos = [infos[i] for i in idx]
            n = target

        pad = target - n
        x = np.pad(features, ((0, pad), (0, 0)))
        p = np.pad(pos, ((0, pad), (0, 0)))
        node_mask = np.zeros((target,), bool)
        node_mask[:n] = True

        if self.spatial_sort:
            # Morton-sort BEFORE edge construction: row index == curve rank,
            # so knn_window band limits apply directly and the built edges
            # reference sorted positions. Pad rows keep the max key and stay
            # at the tail (node_mask unchanged).
            from ..parallel.halo import morton_keys
            order = np.argsort(morton_keys(p, node_mask), kind="stable")
            x, p = x[order], p[order]

        with monitor_operation("build_knn_edges"):
            knn = build_dual_knn(
                jnp.asarray(p), jnp.asarray(x), jnp.asarray(node_mask),
                k_spatial=self.k_spatial, k_morph=self.k_morphological,
                decay=self.spatial_decay, band_window=self.knn_window)

        y = None if label is None else jnp.asarray(label)
        return PaddedGraph(
            x=jnp.asarray(x), pos=jnp.asarray(p),
            nbr_idx=knn["nbr_idx"], nbr_mask=knn["nbr_mask"],
            edge_attr=knn["edge_attr"], node_mask=jnp.asarray(node_mask), y=y)

    # ------------------------------------------------------------------
    def coarsen_graph(self, graph: PaddedGraph, ratio: float = 0.5) -> PaddedGraph:
        """Hierarchical coarsening: keep the top-``ratio`` nodes by degree and
        rebuild kNN over the survivors (reference :449-516). Shape-preserving:
        the padded layout stays, dropped nodes become padding."""
        deg = np.asarray(jnp.sum(graph.nbr_mask, axis=-1))
        mask = np.asarray(graph.node_mask)
        n_real = int(mask.sum())
        keep_n = max(1, int(round(n_real * ratio)))
        order = np.argsort(np.where(mask, deg, -1))[::-1]
        keep_idx = order[:keep_n]
        new_mask = np.zeros_like(mask)
        new_mask[keep_idx] = True
        knn = build_dual_knn(
            graph.pos, graph.x, jnp.asarray(new_mask),
            k_spatial=self.k_spatial, k_morph=self.k_morphological,
            decay=self.spatial_decay)
        return graph.replace(
            nbr_idx=knn["nbr_idx"], nbr_mask=knn["nbr_mask"],
            edge_attr=knn["edge_attr"], node_mask=jnp.asarray(new_mask))

    def build_hierarchical_graphs(self, slide_data: SlideData, levels: int = 2,
                                  ratio: float = 0.5, **kw) -> List[PaddedGraph]:
        g = self.build_graph(slide_data, **kw)
        out = [g]
        for _ in range(levels - 1):
            g = self.coarsen_graph(g, ratio)
            out.append(g)
        return out
