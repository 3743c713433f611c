"""Tests for the local-cluster task layer and resilient training wrapper."""

import threading
import time

import numpy as np
import pytest

import jax

from dgdm_histopath_tpu.utils.distributed_processing import (
    DistributedTaskScheduler, IntelligentLoadBalancer, LocalCluster,
    create_local_cluster, distributed_task, process_batch,
)
from dgdm_histopath_tpu.utils.resilient_training import ResilientTrainer


class TestLoadBalancer:
    def test_least_loaded(self):
        lb = IntelligentLoadBalancer("least_loaded")
        a = lb.register("a")
        b = lb.register("b")
        a.active = 3
        assert lb.select().node_id == "b"

    def test_round_robin(self):
        lb = IntelligentLoadBalancer("round_robin")
        lb.register("a")
        lb.register("b")
        assert [lb.select().node_id for _ in range(4)] == ["a", "b", "a", "b"]

    def test_fastest(self):
        lb = IntelligentLoadBalancer("fastest")
        a = lb.register("a")
        b = lb.register("b")
        lb.record(a, True, 1.0)
        lb.record(b, True, 0.1)
        assert lb.select().node_id == "b"

    def test_unknown_strategy(self):
        with pytest.raises(ValueError):
            IntelligentLoadBalancer("magic")


class TestScheduler:
    def test_submit_and_results(self):
        with DistributedTaskScheduler(num_workers=2) as sched:
            futures = [sched.submit(lambda x=i: x * 2) for i in range(10)]
            assert sorted(f.result(timeout=5) for f in futures) == sorted(
                i * 2 for i in range(10))

    def test_priority_ordering(self):
        order = []
        lock = threading.Lock()
        with DistributedTaskScheduler(num_workers=1) as sched:
            # block the single worker, then enqueue mixed priorities
            gate = threading.Event()
            sched.submit(lambda: gate.wait(2))
            time.sleep(0.05)
            f_low = sched.submit(lambda: order.append("low"), priority=1)
            f_high = sched.submit(lambda: order.append("high"), priority=9)
            gate.set()
            f_low.result(timeout=5)
            f_high.result(timeout=5)
        assert order == ["high", "low"]

    def test_exception_propagates(self):
        with DistributedTaskScheduler(num_workers=1) as sched:
            def boom():
                raise ValueError("x")
            f = sched.submit(boom)
            with pytest.raises(ValueError):
                f.result(timeout=5)


class TestCluster:
    def test_map(self):
        with create_local_cluster(num_workers=4) as cluster:
            assert cluster.map(lambda x: x + 1, range(20)) == list(range(1, 21))
            status = cluster.status()
            assert sum(s["completed"] for s in status.values()) == 20

    def test_process_batch_chunked(self):
        out = process_batch(lambda x: x * x, list(range(10)), num_workers=2,
                            chunk_size=3)
        assert out == [i * i for i in range(10)]

    def test_distributed_task_decorator(self):
        @distributed_task(priority=5)
        def add(a, b):
            return a + b
        assert add(2, 3).result(timeout=5) == 5
        assert add.sync(2, 3) == 5


class _FlakyTrainer:
    """Minimal DGDMTrainer-shaped stub for resilience testing."""

    def __init__(self, fail_times=1):
        self.state = object()
        self.fail_times = fail_times
        self.calls = 0

    def training_step(self, batch, epoch=None):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError("transient device error")
        return {"loss": 1.0 / self.calls}


class TestResilientTrainer:
    def test_recovers_from_transient_failure(self):
        rt = ResilientTrainer(_FlakyTrainer(fail_times=1),
                              max_batch_retries=2)
        m = rt.training_step(batch=None)
        assert m is not None
        assert rt.stats["errors_recovered"] == 1

    def test_skips_persistent_failure(self):
        rt = ResilientTrainer(_FlakyTrainer(fail_times=100),
                              max_batch_retries=1, skip_failed_batches=True)
        assert rt.training_step(batch=None) is None
        assert rt.stats["batches_skipped"] == 1

    def test_raises_when_not_skipping(self):
        rt = ResilientTrainer(_FlakyTrainer(fail_times=100),
                              max_batch_retries=0, skip_failed_batches=False)
        with pytest.raises(RuntimeError):
            rt.training_step(batch=None)

    def test_train_epoch_stats(self):
        rt = ResilientTrainer(_FlakyTrainer(fail_times=0))
        report = rt.train_epoch([None, None, None], epoch=0)
        assert report["batches"] == 3
        assert np.isfinite(report["mean_loss"])
        assert rt.best_step is not None
