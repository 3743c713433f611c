"""Task planner with dependency resolution and annealed schedule optimization.

Parity surface: reference ``dgdm_histopath/quantum/quantum_planner.py:98-559``
— the ``QuantumTaskPlanner`` API: task registration with priorities,
dependencies and resource requirements; priority→weight mapping
(reference's "amplitude" metaphor :192-206); simulated-annealing schedule
optimization with dependency repair (:223-249); thread/process execution
(:144-146).

The implementation is honest classical scheduling (the reference's quantum
vocabulary is cosmetic — SURVEY §2.8): weighted topological ordering with
simulated annealing over the makespan objective.
"""

from __future__ import annotations

import heapq
import math
import random
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..utils.exceptions import QuantumPlannerError
from ..utils.logging import get_logger

logger = get_logger("quantum")


class TaskPriority(Enum):
    CRITICAL = 4
    HIGH = 3
    MEDIUM = 2
    LOW = 1
    BACKGROUND = 0


class TaskStatus(Enum):
    PENDING = "pending"
    READY = "ready"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"
    CANCELLED = "cancelled"


@dataclass
class Task:
    task_id: str
    name: str
    fn: Optional[Callable] = None
    args: tuple = ()
    kwargs: dict = field(default_factory=dict)
    priority: TaskPriority = TaskPriority.MEDIUM
    dependencies: List[str] = field(default_factory=list)
    estimated_duration: float = 1.0
    resources: Dict[str, float] = field(default_factory=dict)
    status: TaskStatus = TaskStatus.PENDING
    result: Any = None
    error: Optional[str] = None
    started_at: Optional[float] = None
    finished_at: Optional[float] = None

    @property
    def weight(self) -> float:
        """Priority weight (the reference's amplitude mapping :192-206)."""
        return float(2 ** self.priority.value)


class QuantumTaskPlanner:
    """Priority/dependency task planner with annealed schedule optimization."""

    def __init__(self, max_workers: int = 4, anneal_iterations: int = 200,
                 seed: int = 0):
        self.max_workers = max_workers
        self.anneal_iterations = anneal_iterations
        self.tasks: Dict[str, Task] = {}
        self._lock = threading.RLock()
        self._rng = random.Random(seed)

    # ------------------------------------------------------------------
    def add_task(
        self,
        name: str,
        fn: Optional[Callable] = None,
        args: tuple = (),
        kwargs: Optional[dict] = None,
        priority: TaskPriority | str = TaskPriority.MEDIUM,
        dependencies: Optional[Sequence[str]] = None,
        estimated_duration: float = 1.0,
        resources: Optional[Dict[str, float]] = None,
        task_id: Optional[str] = None,
    ) -> str:
        if isinstance(priority, str):
            priority = TaskPriority[priority.upper()]
        tid = task_id or str(uuid.uuid4())[:8]
        with self._lock:
            for dep in dependencies or []:
                if dep not in self.tasks:
                    raise QuantumPlannerError("unknown dependency",
                                              {"task": name, "dependency": dep})
            self.tasks[tid] = Task(
                task_id=tid, name=name, fn=fn, args=args, kwargs=kwargs or {},
                priority=priority, dependencies=list(dependencies or []),
                estimated_duration=estimated_duration,
                resources=dict(resources or {}))
        return tid

    # ------------------------------------------------------------------
    def _schedule_cost(self, order: List[str]) -> float:
        """Weighted completion time: earlier completion of heavy tasks wins."""
        t = 0.0
        cost = 0.0
        for tid in order:
            task = self.tasks[tid]
            t += task.estimated_duration
            cost += t * task.weight   # Σ w_j·C_j — heavy tasks finish early
        return cost

    def _valid(self, order: List[str]) -> bool:
        pos = {tid: i for i, tid in enumerate(order)}
        return all(pos[d] < pos[t] for t in order for d in self.tasks[t].dependencies)

    def _repair(self, order: List[str]) -> List[str]:
        """Dependency repair: stable topological reinsertion (reference :241-249)."""
        placed: List[str] = []
        remaining = list(order)
        while remaining:
            progressed = False
            for tid in list(remaining):
                if all(d in placed for d in self.tasks[tid].dependencies):
                    placed.append(tid)
                    remaining.remove(tid)
                    progressed = True
            if not progressed:
                raise QuantumPlannerError("dependency cycle detected",
                                          {"remaining": remaining})
        return placed

    def plan(self) -> List[str]:
        """Produce an execution order: greedy weighted topo order, then
        simulated annealing over adjacent swaps (reference :223-249)."""
        with self._lock:
            if not self.tasks:
                return []
            # initial order: priority-weighted topological
            order = self._repair(sorted(
                self.tasks, key=lambda t: -self.tasks[t].weight))
            best = list(order)
            best_cost = self._schedule_cost(best)
            temp = 1.0
            for it in range(self.anneal_iterations):
                cand = list(best)
                i = self._rng.randrange(len(cand))
                j = self._rng.randrange(len(cand))
                cand[i], cand[j] = cand[j], cand[i]
                try:
                    cand = self._repair(cand)
                except QuantumPlannerError:
                    continue
                cost = self._schedule_cost(cand)
                if cost < best_cost or self._rng.random() < math.exp(
                        -(cost - best_cost) / max(temp, 1e-9)):
                    if cost < best_cost:
                        best, best_cost = cand, cost
                temp *= 0.98
            return best

    # ------------------------------------------------------------------
    def execute(self, order: Optional[List[str]] = None,
                timeout: Optional[float] = None) -> Dict[str, Task]:
        """Run tasks respecting dependencies with a thread pool."""
        order = order or self.plan()
        done: set[str] = set()
        failed: set[str] = set()
        t_start = time.monotonic()
        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            pending = list(order)
            futures: Dict[Any, str] = {}
            while pending or futures:
                if timeout is not None and time.monotonic() - t_start > timeout:
                    for tid in pending:
                        self.tasks[tid].status = TaskStatus.CANCELLED
                    break
                launched = []
                for tid in pending:
                    task = self.tasks[tid]
                    deps = set(task.dependencies)
                    if deps & failed:
                        task.status = TaskStatus.CANCELLED
                        task.error = "dependency failed"
                        failed.add(tid)
                        launched.append(tid)
                        continue
                    if deps <= done:
                        task.status = TaskStatus.RUNNING
                        task.started_at = time.monotonic()
                        futures[pool.submit(self._run_task, task)] = tid
                        launched.append(tid)
                for tid in launched:
                    pending.remove(tid)
                if futures:
                    from concurrent.futures import FIRST_COMPLETED, wait
                    finished, _ = wait(list(futures), timeout=0.1,
                                       return_when=FIRST_COMPLETED)
                    for fut in finished:
                        tid = futures.pop(fut)
                        task = self.tasks[tid]
                        if task.status == TaskStatus.COMPLETED:
                            done.add(tid)
                        else:
                            failed.add(tid)
                elif pending:
                    time.sleep(0.01)
        return dict(self.tasks)

    @staticmethod
    def _run_task(task: Task) -> None:
        try:
            if task.fn is not None:
                task.result = task.fn(*task.args, **task.kwargs)
            task.status = TaskStatus.COMPLETED
        except Exception as exc:  # noqa: BLE001
            task.status = TaskStatus.FAILED
            task.error = str(exc)
            logger.error("task %s failed: %s", task.name, exc)
        finally:
            task.finished_at = time.monotonic()

    # ------------------------------------------------------------------
    def status_summary(self) -> Dict[str, int]:
        from collections import Counter
        return dict(Counter(t.status.value for t in self.tasks.values()))


# Reference exports the planner as ``QuantumPlanner`` (dgdm __init__.py:53)
QuantumPlanner = QuantumTaskPlanner
