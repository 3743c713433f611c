"""Cross-cutting utilities: logging, config, validation, monitoring, errors."""

from .logging import get_logger, setup_logging, log_execution_time
from .exceptions import (
    DGDMException, ConfigurationError, ValidationError, DataError,
    SlideProcessingError, GraphConstructionError, ModelError, TrainingError,
    CheckpointError, InferenceError, ResourceError, SecurityError,
    safe_execute, ExceptionHandler,
)
from .config import (
    DGDMConfig, ModelConfig, DataConfig, TrainingConfig, HardwareConfig,
    load_config, save_config, merge_configs, config_transaction,
    config_from_dict, config_to_dict,
)
from .validation import InputValidator, FileValidator
from .monitoring import (
    monitor_operation, MetricsCollector, GLOBAL_METRICS, HealthChecker,
    GLOBAL_HEALTH, device_memory_stats, PerformanceMetrics,
)

__all__ = [
    "get_logger", "setup_logging", "log_execution_time",
    "DGDMException", "ConfigurationError", "ValidationError", "DataError",
    "SlideProcessingError", "GraphConstructionError", "ModelError",
    "TrainingError", "CheckpointError", "InferenceError", "ResourceError",
    "SecurityError", "safe_execute", "ExceptionHandler",
    "DGDMConfig", "ModelConfig", "DataConfig", "TrainingConfig", "HardwareConfig",
    "load_config", "save_config", "merge_configs", "config_transaction",
    "config_from_dict", "config_to_dict",
    "InputValidator", "FileValidator",
    "monitor_operation", "MetricsCollector", "GLOBAL_METRICS", "HealthChecker",
    "GLOBAL_HEALTH", "device_memory_stats", "PerformanceMetrics",
]
