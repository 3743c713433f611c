"""Scalable quality-gate execution: persistent result cache + parallel runs.

Parity surface: reference ``dgdm_histopath/testing/scalable_quality_gates.py``
— ``ResultCache`` (:46, SQLite-backed, file-mtime invalidation, hit
counters) and ``DistributedValidator`` (:220, worker-pool gate execution).

TPU-environment adaptation: gates here are in-process JAX programs, so the
parallel runner defaults to THREADS — a gate spends most of its wall time
inside XLA compile/execute where the GIL is released, and a process pool
would pay a full ``import jax`` (~10 s) per worker on this host. A
``mode="process"`` escape hatch exists for gates that must not share a
runtime.
"""

from __future__ import annotations

import hashlib
import json
import sqlite3
import threading
import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, List, Optional

from ..utils.logging import get_logger
from .quality_gates import GATES, LEVEL_REQUIREMENTS, QualityGateRunner

logger = get_logger("testing.scalable")


def package_fingerprint(root: Optional[Path] = None) -> str:
    """Hash of (path, mtime, size) over the package's source files — the
    cache-invalidation key (reference ``_calculate_hash`` :81-105 hashes
    file mtimes/sizes the same way). Any source edit changes the
    fingerprint, so stale gate results can never be served."""
    root = Path(root) if root else Path(__file__).resolve().parent.parent
    h = hashlib.sha256()
    for p in sorted(root.rglob("*")):
        if p.suffix not in (".py", ".cpp", ".h", ".yaml") or not p.is_file():
            continue
        st = p.stat()
        h.update(f"{p.relative_to(root)}:{st.st_mtime_ns}:{st.st_size}\n"
                 .encode())
    return h.hexdigest()


class GateResultCache:
    """SQLite-backed persistent cache of gate results (reference :46-217).

    Keyed by ``(gate_name, package_fingerprint, metadata)``; serves PASSED
    results only by default — a cached failure is always re-verified, since
    re-running is exactly how a fix is detected.
    """

    def __init__(self, cache_dir: Path | str):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.db_path = self.cache_dir / "gate_cache.db"
        self._lock = threading.Lock()
        # One persistent connection, shared across worker threads under
        # _lock (check_same_thread=False is safe because every use is
        # serialized by the lock); per-call connections leaked handles.
        self._db = sqlite3.connect(str(self.db_path), check_same_thread=False)
        with self._lock, self._conn() as conn:
            conn.execute("""
                CREATE TABLE IF NOT EXISTS gate_results (
                    key TEXT PRIMARY KEY,
                    gate_name TEXT,
                    result TEXT,
                    timestamp REAL,
                    hits INTEGER DEFAULT 0
                )""")
            conn.execute("""
                CREATE INDEX IF NOT EXISTS idx_gate_ts
                ON gate_results(gate_name, timestamp)""")

    def _conn(self):
        return self._db

    def close(self) -> None:
        with self._lock:
            self._db.close()

    @staticmethod
    def _key(gate_name: str, fingerprint: str, metadata: Dict) -> str:
        raw = json.dumps({"g": gate_name, "f": fingerprint, "m": metadata},
                         sort_keys=True, default=str)
        return hashlib.sha256(raw.encode()).hexdigest()

    def get(self, gate_name: str, fingerprint: str,
            metadata: Optional[Dict] = None,
            serve_failures: bool = False) -> Optional[Dict]:
        key = self._key(gate_name, fingerprint, metadata or {})
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT result, hits FROM gate_results WHERE key = ?",
                (key,)).fetchone()
            if row is None:
                return None
            result = json.loads(row[0])
            if result.get("status") != "passed" and not serve_failures:
                return None
            conn.execute("UPDATE gate_results SET hits = ? WHERE key = ?",
                         (row[1] + 1, key))
            result["cached"] = True
            result["cache_hits"] = row[1] + 1
            return result

    def put(self, gate_name: str, fingerprint: str, result: Dict,
            metadata: Optional[Dict] = None) -> None:
        key = self._key(gate_name, fingerprint, metadata or {})
        slim = {k: v for k, v in result.items() if k != "cached"}
        with self._lock, self._conn() as conn:
            conn.execute(
                "INSERT OR REPLACE INTO gate_results "
                "(key, gate_name, result, timestamp, hits) "
                "VALUES (?, ?, ?, ?, COALESCE((SELECT hits FROM gate_results "
                "WHERE key = ?), 0))",
                (key, gate_name, json.dumps(slim), time.time(), key))

    def stats(self) -> Dict:
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT COUNT(*), AVG(hits), MAX(hits), "
                "COUNT(DISTINCT gate_name) FROM gate_results").fetchone()
        return {"total_entries": row[0] or 0,
                "average_hits": float(row[1] or 0),
                "max_hits": row[2] or 0,
                "unique_gates": row[3] or 0}

    def clear(self) -> None:
        with self._lock, self._conn() as conn:
            conn.execute("DELETE FROM gate_results")


def _run_one_gate(name: str) -> Dict:
    import traceback
    fn = GATES.get(name)
    if fn is None:
        return {"name": name, "status": "unknown", "duration_s": 0.0,
                "error": "no such gate"}
    start = time.perf_counter()
    try:
        fn()
        status, error = "passed", None
    except Exception as exc:  # noqa: BLE001
        status, error = "failed", f"{exc}\n{traceback.format_exc()}"
        logger.error("gate %s failed: %s", name, exc)
    return {"name": name, "status": status,
            "duration_s": round(time.perf_counter() - start, 3),
            "error": error}


def _run_gates_subprocess(names: List[str]) -> List[Dict]:
    """Run a gate chunk in a fresh interpreter (strict isolation mode)."""
    import subprocess
    import sys
    code = (
        "import json, sys\n"
        "from dgdm_histopath_tpu.testing.scalable_gates import _run_one_gate\n"
        "print(json.dumps([_run_one_gate(n) for n in "
        f"{names!r}]))\n")
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=1800)
    if proc.returncode != 0:
        return [{"name": n, "status": "failed", "duration_s": 0.0,
                 "error": f"worker died: {proc.stderr[-1000:]}"}
                for n in names]
    return json.loads(proc.stdout.strip().splitlines()[-1])


class ScalableQualityGateRunner(QualityGateRunner):
    """QualityGateRunner + result cache + parallel execution.

    ``max_workers > 1`` runs gates concurrently (threads by default, see
    module docstring); ``cache_dir`` enables the persistent result cache —
    an unchanged source tree serves previously-passed gates instantly,
    mirroring the reference's ResultCache semantics with source-fingerprint
    invalidation instead of per-validator file lists.
    """

    def __init__(self, level: str = "development", fail_fast: bool = False,
                 cache_dir: Optional[Path | str] = None,
                 max_workers: int = 4, mode: str = "thread"):
        super().__init__(level=level, fail_fast=fail_fast)
        if mode not in ("thread", "process"):
            raise ValueError(f"mode must be thread|process, got {mode!r}")
        self.cache = GateResultCache(cache_dir) if cache_dir else None
        self.max_workers = max(1, int(max_workers))
        self.mode = mode

    def run(self, selected: Optional[List[str]] = None) -> Dict:
        names = selected or list(GATES)
        fingerprint = package_fingerprint() if self.cache else ""
        meta = {"level": self.level}

        results: List[Optional[Dict]] = [None] * len(names)
        to_run: List[int] = []
        cache_hits = 0
        for i, name in enumerate(names):
            cached = (self.cache.get(name, fingerprint, meta)
                      if self.cache else None)
            if cached is not None:
                results[i] = cached
                cache_hits += 1
            else:
                to_run.append(i)

        t0 = time.perf_counter()
        if self.mode == "process" and to_run:
            chunks: List[List[int]] = [
                to_run[j::self.max_workers] for j in range(self.max_workers)]
            chunks = [c for c in chunks if c]
            with ThreadPoolExecutor(max_workers=len(chunks)) as pool:
                futs = {pool.submit(_run_gates_subprocess,
                                    [names[i] for i in c]): c
                        for c in chunks}
                for fut in as_completed(futs):
                    for i, res in zip(futs[fut], fut.result()):
                        results[i] = res
        elif self.max_workers > 1 and len(to_run) > 1:
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                futs = {pool.submit(_run_one_gate, names[i]): i
                        for i in to_run}
                for fut in as_completed(futs):
                    results[futs[fut]] = fut.result()
        else:
            for i in to_run:
                results[i] = _run_one_gate(names[i])
                if results[i]["status"] == "failed" and self.fail_fast:
                    results = [r for r in results if r is not None]
                    break
        wall = time.perf_counter() - t0

        results = [r for r in results if r is not None]
        if self.cache:
            for r in results:
                if not r.get("cached"):
                    self.cache.put(r["name"], fingerprint, r, meta)

        passed_names = {r["name"] for r in results if r["status"] == "passed"}
        score = len(passed_names) / max(len(results), 1)
        req = LEVEL_REQUIREMENTS[self.level]
        level_ok = (score >= req["min_score"]
                    and all(r in passed_names for r in req["required"]
                            if r in {x["name"] for x in results}))
        serial_s = sum(r["duration_s"] for r in results)
        return {"score": round(score, 3), "passed": bool(level_ok),
                "level": self.level, "gates": results,
                "cache_hits": cache_hits,
                "parallel_wall_s": round(wall, 3),
                "serial_equivalent_s": round(serial_s, 3),
                "parallel_speedup": round(serial_s / wall, 2) if wall > 0.01
                                    else None,
                "cache_stats": self.cache.stats() if self.cache else None}
