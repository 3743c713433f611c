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

__all__ = [
    "QuantumSafetyManager", "SafeScheduler",
    "QuantumTaskPlanner", "QuantumPlanner", "Task", "TaskPriority", "TaskStatus",
    "QuantumScheduler", "SchedulingStrategy", "ResourceSnapshot", "read_resources",
    "QuantumOptimizer", "OptimizationSpace", "Parameter", "Trial",
    "dgdm_search_space",
    "FederatedClient", "FederatedServer", "FederatedStrategy",
    "FederatedDGDMManager", "DPConfig",
]
