"""``dgdm-quality``: self-contained quality-gate runner CLI.

Parity surface: reference ``dgdm_histopath/cli/quality_gates.py:1-120`` —
a CLI over the in-package quality-gate framework (import smoke tests, model
validation, scored report, maturity levels). The gates themselves live in
``dgdm_histopath_tpu.testing.quality_gates``.
"""

from __future__ import annotations

import argparse
import json
import sys

from ..utils.logging import get_logger, setup_logging

logger = get_logger("cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dgdm-quality")
    p.add_argument("--level", choices=["greenfield", "development", "staging",
                                       "production"], default="development",
                   help="maturity level: controls which gates must pass")
    p.add_argument("--gates", type=str, default=None,
                   help="comma-separated subset of gate names")
    p.add_argument("--output", type=str, default=None, help="report json path")
    p.add_argument("--fail-fast", action="store_true")
    p.add_argument("--parallel", type=int, default=0, metavar="N",
                   help="run gates across N workers (threads; reference "
                        "scalable_quality_gates.py:220 DistributedValidator)")
    p.add_argument("--cache-dir", type=str, default=None,
                   help="persistent result cache: unchanged source tree "
                        "serves previously-passed gates instantly (reference "
                        "scalable_quality_gates.py:46 ResultCache)")
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(args.log_level)
    if args.parallel or args.cache_dir:
        from ..testing.scalable_gates import ScalableQualityGateRunner
        runner = ScalableQualityGateRunner(
            level=args.level, fail_fast=args.fail_fast,
            cache_dir=args.cache_dir, max_workers=args.parallel or 1)
    else:
        from ..testing.quality_gates import QualityGateRunner
        runner = QualityGateRunner(level=args.level, fail_fast=args.fail_fast)
    selected = args.gates.split(",") if args.gates else None
    report = runner.run(selected)
    summary = {"score": report["score"], "passed": report["passed"],
               "level": args.level,
               "gates": {g["name"]: g["status"] for g in report["gates"]}}
    for k in ("cache_hits", "parallel_speedup"):
        if report.get(k) is not None:
            summary[k] = report[k]
    print(json.dumps(summary, indent=2))
    if args.output:
        from pathlib import Path
        Path(args.output).write_text(json.dumps(report, indent=2))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
