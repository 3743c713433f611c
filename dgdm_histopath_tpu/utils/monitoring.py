"""Performance monitoring: timers, metric collection, health checks.

Parity surface with the reference's ``monitor_operation`` context manager and
``AdvancedMetricsCollector``/``HealthChecker``
(``dgdm_histopath/utils/monitoring.py:64,383,480-527``), rebuilt for TPU:
timers optionally wrap ``jax.profiler.TraceAnnotation`` spans so operations
show up in TPU profiles, and device-memory stats come from
``jax.local_devices()[i].memory_stats()`` instead of psutil/CUDA.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

from .logging import get_logger

logger = get_logger("monitoring")

try:  # resource is POSIX-only but always present on linux
    import resource

    def _rss_bytes() -> int:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
except ImportError:  # pragma: no cover
    def _rss_bytes() -> int:
        return 0


@dataclass
class PerformanceMetrics:
    operation: str
    duration_s: float
    rss_delta_bytes: int = 0
    timestamp: float = field(default_factory=time.time)
    extra: Dict[str, Any] = field(default_factory=dict)


class MetricsCollector:
    """Thread-safe rolling store of operation metrics."""

    def __init__(self, max_records_per_op: int = 1000):
        self._lock = threading.Lock()
        self._records: Dict[str, deque] = defaultdict(lambda: deque(maxlen=max_records_per_op))
        self._counters: Dict[str, float] = defaultdict(float)

    def record(self, metrics: PerformanceMetrics) -> None:
        with self._lock:
            self._records[metrics.operation].append(metrics)

    def increment(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def counters(self) -> Dict[str, float]:
        with self._lock:
            return dict(self._counters)

    def summary(self, operation: Optional[str] = None) -> Dict[str, Any]:
        with self._lock:
            ops = [operation] if operation else list(self._records)
            out: Dict[str, Any] = {}
            for op in ops:
                recs = list(self._records.get(op, ()))
                if not recs:
                    continue
                durations = [r.duration_s for r in recs]
                out[op] = {
                    "count": len(recs),
                    "total_s": sum(durations),
                    "mean_s": sum(durations) / len(recs),
                    "max_s": max(durations),
                    "min_s": min(durations),
                    "last_s": durations[-1],
                }
            return out

    def reset(self) -> None:
        with self._lock:
            self._records.clear()
            self._counters.clear()


GLOBAL_METRICS = MetricsCollector()


@contextlib.contextmanager
def monitor_operation(name: str, collector: Optional[MetricsCollector] = None,
                      trace: bool = True, log_level: Optional[int] = None, **extra: Any):
    """Time an operation, record RSS delta, and (optionally) open a profiler span.

    Drop-in analogue of the reference's ``monitor_operation``
    (``utils/monitoring.py:479-527``).
    """
    collector = collector or GLOBAL_METRICS
    span = contextlib.nullcontext()
    if trace:
        try:
            import jax.profiler
            span = jax.profiler.TraceAnnotation(name)
        except Exception:  # pragma: no cover - profiler unavailable
            span = contextlib.nullcontext()
    rss0 = _rss_bytes()
    start = time.perf_counter()
    try:
        with span:
            yield
    finally:
        duration = time.perf_counter() - start
        metrics = PerformanceMetrics(
            operation=name, duration_s=duration, rss_delta_bytes=_rss_bytes() - rss0, extra=dict(extra)
        )
        collector.record(metrics)
        if log_level is not None:
            logger.log(log_level, "%s: %.4fs", name, duration)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device HBM stats (bytes) when the backend exposes them."""
    stats: Dict[str, Dict[str, int]] = {}
    try:
        import jax
        for dev in jax.local_devices():
            mem = dev.memory_stats()
            if mem:
                stats[str(dev)] = {
                    "bytes_in_use": int(mem.get("bytes_in_use", 0)),
                    "bytes_limit": int(mem.get("bytes_limit", 0)),
                    "peak_bytes_in_use": int(mem.get("peak_bytes_in_use", 0)),
                }
    except Exception:  # pragma: no cover - non-fatal
        pass
    return stats


@dataclass
class HealthCheck:
    name: str
    check: Callable[[], bool]
    description: str = ""


class HealthChecker:
    """Registry of named health checks with aggregated status reporting."""

    def __init__(self):
        self._checks: Dict[str, HealthCheck] = {}
        self.register("host_memory", self._host_memory_ok, "process RSS below 90% of system memory")
        self.register("devices", self._devices_ok, "at least one JAX device is reachable")

    def register(self, name: str, check: Callable[[], bool], description: str = "") -> None:
        self._checks[name] = HealthCheck(name, check, description)

    @staticmethod
    def _host_memory_ok() -> bool:
        try:
            with open("/proc/meminfo") as f:
                info = {line.split(":")[0]: int(line.split()[1]) for line in f if ":" in line}
            return info.get("MemAvailable", 1) * 1024 > 256 * 1024 * 1024
        except OSError:  # pragma: no cover
            return True

    @staticmethod
    def _devices_ok() -> bool:
        try:
            import jax
            return len(jax.devices()) > 0
        except Exception:
            return False

    def check(self) -> Dict[str, Any]:
        results = {}
        for name, hc in self._checks.items():
            try:
                ok = bool(hc.check())
            except Exception as exc:  # noqa: BLE001
                ok = False
                logger.warning("health check %s raised: %s", name, exc)
            results[name] = ok
        return {"healthy": all(results.values()), "checks": results, "timestamp": time.time()}


GLOBAL_HEALTH = HealthChecker()


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a real ``jax.profiler`` trace (TensorBoard-viewable)."""
    import jax.profiler
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
