"""CLI entry points (reference L8, ``dgdm_histopath/cli/``): console scripts
``dgdm-train``, ``dgdm-predict``, ``dgdm-preprocess``, ``dgdm-quality``."""

__all__ = ["train", "predict", "preprocess", "quality_gates"]
