"""Task orchestration layer (reference L9, ``dgdm_histopath/quantum/``).

The reference exports these under quantum-themed names
(``dgdm_histopath/__init__.py:53-57``); the implementations are classical
schedulers/optimizers (SURVEY §2.8) and are named honestly internally.
"""

from .planner import (
    QuantumTaskPlanner, QuantumPlanner, Task, TaskPriority, TaskStatus,
)
from .scheduler import QuantumScheduler, SchedulingStrategy, ResourceSnapshot, read_resources
from .optimizer import (
    QuantumOptimizer, OptimizationSpace, Parameter, Trial, dgdm_search_space,
)
from .federated_learning import (
    FederatedClient, FederatedServer, FederatedStrategy, FederatedDGDMManager,
    DPConfig,
)
from .safety import QuantumSafetyManager, SafeScheduler
from .hardware import (
    QuantumProvider, QuantumConfig, Circuit, QuantumBackendInterface,
    LocalStatevectorBackend, IBMQuantumBackend, GoogleQuantumBackend,
    QuantumHardwareManager, HybridQuantumClassicalLayer,
)
from .distributed import (
    NodeType, TaskDistributionStrategy, ComputeNode, DistributedTask,
    ClusterKV, QuantumDistributedManager,
)

__all__ = [
    "QuantumSafetyManager", "SafeScheduler",
    "QuantumProvider", "QuantumConfig", "Circuit", "QuantumBackendInterface",
    "LocalStatevectorBackend", "IBMQuantumBackend", "GoogleQuantumBackend",
    "QuantumHardwareManager", "HybridQuantumClassicalLayer",
    "NodeType", "TaskDistributionStrategy", "ComputeNode", "DistributedTask",
    "ClusterKV", "QuantumDistributedManager",
    "QuantumTaskPlanner", "QuantumPlanner", "Task", "TaskPriority", "TaskStatus",
    "QuantumScheduler", "SchedulingStrategy", "ResourceSnapshot", "read_resources",
    "QuantumOptimizer", "OptimizationSpace", "Parameter", "Trial",
    "dgdm_search_space",
    "FederatedClient", "FederatedServer", "FederatedStrategy",
    "FederatedDGDMManager", "DPConfig",
]
