"""Autonomous test runner: self-contained smoke + integration harness.

Parity surface: reference ``dgdm_histopath/testing/autonomous_quality_framework.py``
— ``AutonomousTestRunner`` (:92), ``DGDMTestSuite`` (:300),
``QualityGateValidator`` (:378): a harness that exercises the framework
without pytest and emits a scored report, usable inside deployments.
"""

from __future__ import annotations

import json
import time
import traceback
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

from ..utils.logging import get_logger
from .quality_gates import GATES, LEVEL_REQUIREMENTS, QualityGateRunner

logger = get_logger("testing")


class DGDMTestSuite:
    """Named test registry with setup-free smoke/integration cases."""

    def __init__(self):
        self.tests: Dict[str, Callable[[], None]] = {}
        # seed with the quality gates as the base suite
        for name, fn in GATES.items():
            self.tests[f"gate:{name}"] = fn

    def register(self, name: str, fn: Callable[[], None]) -> None:
        self.tests[name] = fn

    def run(self, pattern: Optional[str] = None) -> List[Dict[str, Any]]:
        results = []
        for name, fn in self.tests.items():
            if pattern and pattern not in name:
                continue
            t0 = time.perf_counter()
            try:
                fn()
                status, error = "passed", None
            except Exception as exc:  # noqa: BLE001
                status, error = "failed", f"{exc}"
                logger.error("test %s failed: %s\n%s", name, exc,
                             traceback.format_exc())
            results.append({"name": name, "status": status,
                            "duration_s": round(time.perf_counter() - t0, 3),
                            "error": error})
        return results


class AutonomousTestRunner:
    """End-to-end self-test: suite + gates + report artifact."""

    def __init__(self, output_dir: Optional[str | Path] = None,
                 level: str = "development"):
        self.suite = DGDMTestSuite()
        self.level = level
        self.output_dir = Path(output_dir) if output_dir else None

    def run(self) -> Dict[str, Any]:
        t0 = time.perf_counter()
        results = self.suite.run()
        passed = sum(1 for r in results if r["status"] == "passed")
        gate_report = QualityGateRunner(self.level).run()
        report = {
            "timestamp": time.time(),
            "duration_s": round(time.perf_counter() - t0, 2),
            "tests": {"total": len(results), "passed": passed,
                      "failed": len(results) - passed, "results": results},
            "quality_gates": gate_report,
            "overall_pass": passed == len(results) and gate_report["passed"],
        }
        if self.output_dir is not None:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            (self.output_dir / "autonomous_report.json").write_text(
                json.dumps(report, indent=2))
        return report
