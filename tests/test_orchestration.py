"""Tests for the task planner/scheduler/optimizer (reference quantum layer).

Modeled on reference tests/test_quantum_integration.py:31-735 (planner/
scheduler/optimizer unit + integration, 100-task scale, concurrency safety).
"""

import threading
import time

import pytest

from dgdm_histopath_tpu.quantum import (
    OptimizationSpace, QuantumOptimizer, QuantumScheduler, QuantumTaskPlanner,
    SchedulingStrategy, TaskPriority, TaskStatus, dgdm_search_space,
    read_resources,
)
from dgdm_histopath_tpu.utils.exceptions import QuantumPlannerError


class TestPlanner:
    def test_plan_respects_dependencies(self):
        p = QuantumTaskPlanner()
        a = p.add_task("a")
        b = p.add_task("b", dependencies=[a])
        c = p.add_task("c", dependencies=[b])
        order = p.plan()
        assert order.index(a) < order.index(b) < order.index(c)

    def test_priority_ordering(self):
        p = QuantumTaskPlanner()
        low = p.add_task("low", priority=TaskPriority.LOW)
        crit = p.add_task("crit", priority=TaskPriority.CRITICAL)
        order = p.plan()
        assert order.index(crit) < order.index(low)

    def test_unknown_dependency_raises(self):
        p = QuantumTaskPlanner()
        with pytest.raises(QuantumPlannerError):
            p.add_task("x", dependencies=["nope"])

    def test_execute_runs_functions(self):
        p = QuantumTaskPlanner(max_workers=2)
        results = []
        a = p.add_task("a", fn=lambda: results.append("a") or 1)
        b = p.add_task("b", fn=lambda: results.append("b") or 2,
                       dependencies=[a])
        tasks = p.execute()
        assert tasks[a].status == TaskStatus.COMPLETED
        assert tasks[b].status == TaskStatus.COMPLETED
        assert results == ["a", "b"]
        assert tasks[b].result == 2

    def test_failed_dependency_cancels(self):
        p = QuantumTaskPlanner()
        def boom():
            raise RuntimeError("boom")
        a = p.add_task("a", fn=boom)
        b = p.add_task("b", fn=lambda: 1, dependencies=[a])
        tasks = p.execute()
        assert tasks[a].status == TaskStatus.FAILED
        assert tasks[b].status == TaskStatus.CANCELLED

    def test_scale_100_tasks(self):
        # reference scale test (:680)
        p = QuantumTaskPlanner(max_workers=8, anneal_iterations=50)
        counter = {"n": 0}
        lock = threading.Lock()
        def bump():
            with lock:
                counter["n"] += 1
        prev = None
        for i in range(100):
            deps = [prev] if prev and i % 10 == 0 else []
            prev = p.add_task(f"t{i}", fn=bump, dependencies=deps)
        tasks = p.execute(timeout=60)
        assert counter["n"] == 100
        assert all(t.status == TaskStatus.COMPLETED for t in tasks.values())


class TestScheduler:
    def test_read_resources(self):
        snap = read_resources()
        assert snap.mem_total_mb > 0
        assert 0.0 <= snap.mem_used_fraction <= 1.0

    def test_priority_run(self):
        s = QuantumScheduler(max_workers=1,
                             strategy=SchedulingStrategy.PRIORITY)
        order = []
        s.submit("low", lambda: order.append("low"), priority="low")
        s.submit("crit", lambda: order.append("crit"), priority="critical")
        s.run_pending()
        assert order == ["crit", "low"]
        assert s.status_summary() == {"completed": 2}

    def test_resource_aware_defers(self):
        s = QuantumScheduler(strategy=SchedulingStrategy.RESOURCE_AWARE)
        s.submit("impossible", lambda: None, min_free_mem_mb=1e12)
        jobs = s.run_pending()
        assert list(jobs.values())[0].status == "deferred"

    def test_monitor_thread(self):
        s = QuantumScheduler(monitor_interval=0.05)
        with s:
            # poll-wait: a fixed 0.2 s sleep flaked under full-suite load on
            # the 1-core host (the monitor thread never got scheduled)
            deadline = time.time() + 10.0
            while not s.resource_history and time.time() < deadline:
                time.sleep(0.05)
        assert len(s.resource_history) >= 1

    def test_failed_job_recorded(self):
        s = QuantumScheduler()
        def boom():
            raise ValueError("x")
        s.submit("bad", boom)
        jobs = s.run_pending()
        job = list(jobs.values())[0]
        assert job.status == "failed" and "x" in job.error


class TestOptimizer:
    def test_finds_minimum(self):
        space = OptimizationSpace().add_float("x", -5.0, 5.0)
        opt = QuantumOptimizer(space, lambda c: (c["x"] - 2.0) ** 2,
                               mode="min", seed=0)
        best, val = opt.optimize(n_trials=60)
        assert abs(best["x"] - 2.0) < 0.5
        assert val < 0.3
        conv = opt.convergence
        assert conv == sorted(conv, reverse=True)  # monotone improving

    def test_choice_and_int_params(self):
        space = (OptimizationSpace()
                 .add_choice("act", ["a", "b"])
                 .add_int("layers", 1, 4)
                 .add_float("lr", 1e-5, 1e-1, log=True))
        opt = QuantumOptimizer(space, lambda c: c["layers"], mode="min", seed=1)
        best, val = opt.optimize(n_trials=20)
        assert best["layers"] == 1
        assert best["act"] in ("a", "b")
        assert 1e-5 <= best["lr"] <= 1e-1

    def test_failing_objective_survives(self):
        space = OptimizationSpace().add_float("x", 0.0, 1.0)
        calls = {"n": 0}
        def obj(c):
            calls["n"] += 1
            if calls["n"] % 2:
                raise RuntimeError("flaky")
            return c["x"]
        opt = QuantumOptimizer(space, obj, seed=2)
        best, val = opt.optimize(n_trials=10)
        assert best is not None

    def test_dgdm_space(self):
        import random
        space = dgdm_search_space()
        cfg = space.sample(random.Random(0))
        assert "learning_rate" in cfg and "pooling" in cfg
        assert 1e-5 <= cfg["learning_rate"] <= 1e-3


class TestSafetyManager:
    """Unified auth/lockout/audit facade guarding the scheduler
    (reference quantum_safety.py:72-682; VERDICT r1 missing #5)."""

    def _mgr(self, **kw):
        from dgdm_histopath_tpu.quantum import QuantumSafetyManager
        return QuantumSafetyManager(**kw)

    def test_register_auth_roundtrip(self):
        mgr = self._mgr()
        mgr.register_user("alice", "correct-horse-battery")
        token = mgr.authenticate("alice", "correct-horse-battery")
        assert mgr.verify_session(token) == "alice"

    def test_lockout_after_failed_attempts(self):
        from dgdm_histopath_tpu.utils.exceptions import SecurityError
        mgr = self._mgr(max_failed_attempts=3, lockout_seconds=60.0)
        mgr.register_user("bob", "password123")
        for _ in range(3):
            with pytest.raises(SecurityError):
                mgr.authenticate("bob", "wrong-password")
        # locked now — even the correct password is rejected
        with pytest.raises(SecurityError, match="locked"):
            mgr.authenticate("bob", "password123")
        assert mgr.audit_summary().get("account_lockout") == 1

    def test_invalid_token_rejected(self):
        from dgdm_histopath_tpu.utils.exceptions import SecurityError
        mgr = self._mgr()
        with pytest.raises(SecurityError):
            mgr.verify_session("garbage|token|here|sig")

    def test_critical_priority_requires_admin(self):
        from dgdm_histopath_tpu.utils.exceptions import SecurityError
        mgr = self._mgr()
        mgr.register_user("user1", "password123", role="user")
        mgr.register_user("root1", "password123", role="admin")
        ut = mgr.authenticate("user1", "password123")
        at = mgr.authenticate("root1", "password123")
        with pytest.raises(SecurityError, match="admin"):
            mgr.authorize_submission(ut, "job", TaskPriority.CRITICAL)
        assert mgr.authorize_submission(at, "job", TaskPriority.CRITICAL) == "root1"

    def test_safe_scheduler_guards_submission(self):
        from dgdm_histopath_tpu.quantum import SafeScheduler
        from dgdm_histopath_tpu.utils.exceptions import SecurityError
        ss = SafeScheduler(max_workers=2)
        ss.safety.register_user("carol", "password123")
        token = ss.safety.authenticate("carol", "password123")
        ran = []
        jid = ss.submit(token, "work", lambda: ran.append(1))
        assert jid in ss.jobs            # passthrough inspection works
        with pytest.raises(SecurityError):
            ss.submit("bad-token", "evil", lambda: ran.append(2))
        ss.run_pending(token)
        assert ran == [1]
        assert ss.jobs[jid].status == "completed"
        assert ss.safety.audit_summary()["job_authorized"] == 1

    def test_rate_anomaly_detection(self):
        from dgdm_histopath_tpu.utils.exceptions import SecurityError
        mgr = self._mgr(submissions_per_minute=5)
        mgr.register_user("dave", "password123")
        token = mgr.authenticate("dave", "password123")
        for i in range(5):
            mgr.authorize_submission(token, f"j{i}")
        with pytest.raises(SecurityError, match="rate"):
            mgr.authorize_submission(token, "j5")
        assert mgr.audit_summary().get("rate_limited") == 1
