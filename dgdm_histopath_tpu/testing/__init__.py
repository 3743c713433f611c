"""In-package self-testing framework (reference ``dgdm_histopath/testing/``)."""

from .quality_gates import QualityGateRunner, GATES, LEVEL_REQUIREMENTS
from .autonomous import AutonomousTestRunner, DGDMTestSuite

__all__ = ["QualityGateRunner", "GATES", "LEVEL_REQUIREMENTS",
           "AutonomousTestRunner", "DGDMTestSuite"]
