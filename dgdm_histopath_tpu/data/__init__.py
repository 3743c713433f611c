"""Data layer (reference L5, ``dgdm_histopath/data/``)."""

from .dataset import (
    HistopathDataset, SlideDataset, GraphDataset, augment_patches,
    empty_graph, load_labels,
)
from .datamodule import HistopathDataModule, BucketedLoader
from .graph_io import save_graph, load_graph, load_graph_h5, GRAPH_SUFFIX

__all__ = [
    "HistopathDataset", "SlideDataset", "GraphDataset", "augment_patches",
    "empty_graph", "load_labels",
    "HistopathDataModule", "BucketedLoader",
    "save_graph", "load_graph", "load_graph_h5", "GRAPH_SUFFIX",
]
