"""Deployment layer (reference ``dgdm_histopath/deployment/``)."""

from .edge import (
    EdgeConfig, EdgeModelOptimizer, EdgeInferenceEngine, EdgeResourceMonitor,
    EdgeDeploymentManager, quantize_params_int8, dequantize_params, cast_params,
)
from .production import (
    K8sConfig, KubernetesOrchestrator, AutoScaler, ProductionOrchestrator,
    ProductionHealthChecker, DeploymentStage,
)

__all__ = [
    "EdgeConfig", "EdgeModelOptimizer", "EdgeInferenceEngine",
    "EdgeResourceMonitor", "EdgeDeploymentManager",
    "quantize_params_int8", "dequantize_params", "cast_params",
    "K8sConfig", "KubernetesOrchestrator", "AutoScaler",
    "ProductionOrchestrator", "ProductionHealthChecker", "DeploymentStage",
]
