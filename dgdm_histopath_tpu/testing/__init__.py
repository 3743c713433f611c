"""In-package self-testing framework (reference ``dgdm_histopath/testing/``)."""

from .quality_gates import QualityGateRunner, GATES, LEVEL_REQUIREMENTS
from .scalable_gates import (
    GateResultCache, ScalableQualityGateRunner, package_fingerprint,
)
from .autonomous import AutonomousTestRunner, DGDMTestSuite

__all__ = ["QualityGateRunner", "GATES", "LEVEL_REQUIREMENTS",
           "GateResultCache", "ScalableQualityGateRunner",
           "package_fingerprint",
           "AutonomousTestRunner", "DGDMTestSuite"]
