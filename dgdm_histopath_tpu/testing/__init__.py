"""In-package self-testing framework (reference ``dgdm_histopath/testing/``)."""

from .quality_gates import QualityGateRunner, GATES, LEVEL_REQUIREMENTS

__all__ = ["QualityGateRunner", "GATES", "LEVEL_REQUIREMENTS"]
