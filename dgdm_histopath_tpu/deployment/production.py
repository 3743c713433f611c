"""Production orchestration: k8s manifest generation, autoscaling policy,
staged deployment, health checking.

Parity surface: reference ``dgdm_histopath/deployment/`` —
``KubernetesOrchestrator`` (production_orchestration.py:103; manifest
construction for deployment/service/HPA), ``AutoScaler`` (:697; utilization-
driven replica policy), ``ProductionOrchestrator`` with
``deploy_to_production`` staged rollout (production_orchestrator.py:57,648),
``ProductionHealthChecker``/``DeploymentManager`` (production_ready.py:86,376)
and the standalone health probe (deployment/healthcheck.py:19-30).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import yaml

from ..utils.logging import get_logger

logger = get_logger("deployment")


# ---------------------------------------------------------------------------
# kubernetes manifests
# ---------------------------------------------------------------------------

@dataclass
class K8sConfig:
    name: str = "dgdm-histopath"
    namespace: str = "dgdm"
    image: str = "dgdm-histopath-tpu:latest"
    replicas: int = 2
    port: int = 8080
    tpu_resource: str = "google.com/tpu"
    tpu_count: int = 1
    memory: str = "16Gi"
    cpu: str = "8"
    min_replicas: int = 1
    max_replicas: int = 8
    target_cpu_percent: int = 70


class KubernetesOrchestrator:
    """Generate and (optionally) apply k8s manifests."""

    def __init__(self, config: Optional[K8sConfig] = None):
        self.config = config or K8sConfig()

    def deployment_manifest(self) -> dict:
        c = self.config
        return {
            "apiVersion": "apps/v1",
            "kind": "Deployment",
            "metadata": {"name": c.name, "namespace": c.namespace,
                         "labels": {"app": c.name}},
            "spec": {
                "replicas": c.replicas,
                "selector": {"matchLabels": {"app": c.name}},
                "strategy": {"type": "RollingUpdate",
                             "rollingUpdate": {"maxUnavailable": 0,
                                               "maxSurge": 1}},
                "template": {
                    "metadata": {"labels": {"app": c.name}},
                    "spec": {
                        "securityContext": {"runAsNonRoot": True,
                                            "runAsUser": 1000},
                        "containers": [{
                            "name": c.name,
                            "image": c.image,
                            "ports": [{"containerPort": c.port}],
                            "resources": {
                                "requests": {"memory": c.memory, "cpu": c.cpu,
                                             c.tpu_resource: c.tpu_count},
                                "limits": {"memory": c.memory,
                                           c.tpu_resource: c.tpu_count},
                            },
                            "livenessProbe": {
                                "httpGet": {"path": "/healthz", "port": c.port},
                                "initialDelaySeconds": 60,
                                "periodSeconds": 15},
                            "readinessProbe": {
                                "httpGet": {"path": "/readyz", "port": c.port},
                                "initialDelaySeconds": 30,
                                "periodSeconds": 10},
                        }],
                    },
                },
            },
        }

    def service_manifest(self) -> dict:
        c = self.config
        return {
            "apiVersion": "v1", "kind": "Service",
            "metadata": {"name": c.name, "namespace": c.namespace},
            "spec": {"selector": {"app": c.name},
                     "ports": [{"port": 80, "targetPort": c.port}]},
        }

    def hpa_manifest(self) -> dict:
        c = self.config
        return {
            "apiVersion": "autoscaling/v2", "kind": "HorizontalPodAutoscaler",
            "metadata": {"name": c.name, "namespace": c.namespace},
            "spec": {
                "scaleTargetRef": {"apiVersion": "apps/v1",
                                   "kind": "Deployment", "name": c.name},
                "minReplicas": c.min_replicas,
                "maxReplicas": c.max_replicas,
                "metrics": [{"type": "Resource",
                             "resource": {"name": "cpu",
                                          "target": {"type": "Utilization",
                                                     "averageUtilization":
                                                         c.target_cpu_percent}}}],
            },
        }

    def write_manifests(self, directory: str | Path) -> List[Path]:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        out = []
        for name, manifest in [("deployment", self.deployment_manifest()),
                               ("service", self.service_manifest()),
                               ("hpa", self.hpa_manifest())]:
            p = directory / f"{name}.yaml"
            p.write_text(yaml.safe_dump(manifest, sort_keys=False))
            out.append(p)
        return out


# ---------------------------------------------------------------------------
# autoscaling policy
# ---------------------------------------------------------------------------

class AutoScaler:
    """Utilization-driven replica recommendation with hysteresis
    (reference production_orchestration.py:697; utils/auto_scaling.py:92)."""

    def __init__(self, min_replicas: int = 1, max_replicas: int = 8,
                 scale_up_threshold: float = 0.75,
                 scale_down_threshold: float = 0.3,
                 cooldown_s: float = 60.0):
        self.min_replicas = min_replicas
        self.max_replicas = max_replicas
        self.scale_up_threshold = scale_up_threshold
        self.scale_down_threshold = scale_down_threshold
        self.cooldown_s = cooldown_s
        self.current = min_replicas
        self._last_change = float("-inf")
        self.history: List[Dict[str, float]] = []

    def decide(self, utilization: float, now: Optional[float] = None) -> int:
        now = now if now is not None else time.monotonic()
        target = self.current
        if now - self._last_change >= self.cooldown_s:
            if utilization > self.scale_up_threshold:
                target = min(self.current * 2, self.max_replicas)
            elif utilization < self.scale_down_threshold:
                target = max(self.current - 1, self.min_replicas)
        if target != self.current:
            self._last_change = now
            logger.info("autoscale: %d -> %d (util %.2f)", self.current,
                        target, utilization)
            self.current = target
        self.history.append({"ts": now, "utilization": utilization,
                             "replicas": self.current})
        return self.current


# ---------------------------------------------------------------------------
# staged production rollout
# ---------------------------------------------------------------------------

@dataclass
class DeploymentStage:
    name: str
    action: Callable[[], bool]
    rollback: Optional[Callable[[], None]] = None


class ProductionOrchestrator:
    """Staged deploy with verification + rollback
    (reference production_orchestrator.py:57-648)."""

    def __init__(self):
        self.stages: List[DeploymentStage] = []
        self.log: List[Dict[str, Any]] = []

    def add_stage(self, name: str, action: Callable[[], bool],
                  rollback: Optional[Callable[[], None]] = None) -> None:
        self.stages.append(DeploymentStage(name, action, rollback))

    def deploy_to_production(self) -> Dict[str, Any]:
        completed: List[DeploymentStage] = []
        for stage in self.stages:
            t0 = time.perf_counter()
            try:
                ok = bool(stage.action())
            except Exception as exc:  # noqa: BLE001
                ok = False
                logger.error("stage %s raised: %s", stage.name, exc)
            self.log.append({"stage": stage.name, "ok": ok,
                             "duration_s": time.perf_counter() - t0})
            if not ok:
                logger.error("deployment failed at stage %s; rolling back",
                             stage.name)
                for done in reversed(completed):
                    if done.rollback is not None:
                        try:
                            done.rollback()
                        except Exception as exc:  # noqa: BLE001
                            logger.error("rollback %s failed: %s",
                                         done.name, exc)
                return {"success": False, "failed_stage": stage.name,
                        "log": self.log}
            completed.append(stage)
        return {"success": True, "stages": len(completed), "log": self.log}


class ProductionHealthChecker:
    """Deep health check over model + pipeline + resources
    (reference production_ready.py:86; healthcheck.py:19-30)."""

    def __init__(self, predictor=None):
        self.predictor = predictor

    def check(self) -> Dict[str, Any]:
        from ..utils.monitoring import GLOBAL_HEALTH
        report = GLOBAL_HEALTH.check()
        checks = dict(report["checks"])
        if self.predictor is not None:
            try:
                info = self.predictor.get_model_info()
                checks["model_loaded"] = info["num_parameters"] > 0
            except Exception:  # noqa: BLE001
                checks["model_loaded"] = False
        from ..utils.dependency_check import check_dependencies
        checks["dependencies"] = check_dependencies()["healthy"]
        return {"healthy": all(checks.values()), "checks": checks,
                "timestamp": time.time()}

    def serve_forever(self, port: int = 8080):  # pragma: no cover - network
        """Minimal HTTP health endpoint (the k8s probe target)."""
        import http.server

        checker = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path in ("/healthz", "/readyz", "/health"):
                    report = checker.check()
                    code = 200 if report["healthy"] else 503
                    body = json.dumps(report).encode()
                    self.send_response(code)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def log_message(self, *a):
                pass

        http.server.HTTPServer(("", port), Handler).serve_forever()
