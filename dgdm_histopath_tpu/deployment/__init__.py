"""Deployment layer (reference ``dgdm_histopath/deployment/``)."""

from .edge import (
    EdgeConfig, EdgeModelOptimizer, EdgeInferenceEngine, EdgeResourceMonitor,
    EdgeDeploymentManager, quantize_params_int8, dequantize_params, cast_params,
)
from .production import (
    K8sConfig, KubernetesOrchestrator, AutoScaler, ProductionOrchestrator,
    ProductionHealthChecker, DeploymentStage,
)
from .serving import InferenceServer, graph_from_json
from .batching import DynamicBatcher

__all__ = [
    "EdgeConfig", "EdgeModelOptimizer", "EdgeInferenceEngine",
    "EdgeResourceMonitor", "EdgeDeploymentManager",
    "quantize_params_int8", "dequantize_params", "cast_params",
    "K8sConfig", "KubernetesOrchestrator", "AutoScaler",
    "ProductionOrchestrator", "ProductionHealthChecker", "DeploymentStage",
    "InferenceServer", "graph_from_json", "DynamicBatcher",
]
