"""Tests for quantum/hardware.py (statevector sim, manager, hybrid layer)
and quantum/distributed.py (KV, node selection, task lifecycle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.quantum.hardware import (
    Circuit, GoogleQuantumBackend, HybridQuantumClassicalLayer,
    IBMQuantumBackend, LocalStatevectorBackend, QuantumConfig,
    QuantumHardwareManager, QuantumProvider, statevector, z_expectations,
)
from dgdm_histopath_tpu.quantum.distributed import (
    ClusterKV, ComputeNode, NodeType, QuantumDistributedManager,
    TaskDistributionStrategy,
)


# ---------------------------------------------------------------------------
# statevector math goldens
# ---------------------------------------------------------------------------

def test_single_qubit_ry_z_expectation():
    # RY(theta)|0> has <Z> = cos(theta), exactly
    for theta in [0.0, 0.3, np.pi / 2, np.pi, 2.2]:
        angles = jnp.asarray([[theta]], jnp.float32)  # [1 layer, 1 qubit]
        z = np.asarray(z_expectations(angles, 1))
        np.testing.assert_allclose(z[0], np.cos(theta), atol=1e-5)


def test_statevector_normalized_and_cz_entangles():
    rng = np.random.default_rng(0)
    angles = jnp.asarray(rng.uniform(0, 2 * np.pi, (3, 4)), jnp.float32)
    psi = np.asarray(statevector(angles, 4))
    np.testing.assert_allclose((psi ** 2).sum(), 1.0, atol=1e-5)


def test_two_qubit_golden_against_dense_matrices():
    # Build the same circuit with explicit 4x4 matrices and compare.
    theta = np.array([[0.7, 1.9]], np.float64)  # one layer, 2 qubits

    def ry(t):
        c, s = np.cos(t / 2), np.sin(t / 2)
        return np.array([[c, -s], [s, c]])

    # little-endian: qubit 0 is the fastest-varying axis
    u0 = np.kron(np.eye(2), ry(theta[0, 0]))   # RY on qubit 0
    u1 = np.kron(ry(theta[0, 1]), np.eye(2))   # RY on qubit 1
    cz = np.diag([1.0, 1.0, 1.0, -1.0])
    expected = cz @ u1 @ u0 @ np.array([1.0, 0, 0, 0])

    psi = np.asarray(statevector(jnp.asarray(theta, jnp.float32), 2))
    np.testing.assert_allclose(psi, expected, atol=1e-5)


def test_z_expectations_batched_vmap_shape():
    angles = jnp.zeros((5, 2, 3), jnp.float32)  # batch 5, 2 layers, 3 qubits
    z = z_expectations(angles, 3)
    assert z.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-6)  # all |0>


# ---------------------------------------------------------------------------
# backends + manager
# ---------------------------------------------------------------------------

def test_local_backend_counts_match_probabilities():
    backend = LocalStatevectorBackend()
    assert backend.initialize(QuantumConfig(shots=4000, seed=1))
    circ = Circuit(np.asarray([[np.pi / 2, np.pi / 2]], np.float32))
    result = backend.execute_circuit(circ, shots=4000)
    assert sum(result["counts"].values()) == 4000
    probs = result["probabilities"]
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    # empirical frequencies track exact probabilities
    freq = np.zeros_like(probs)
    for bits, c in result["counts"].items():
        freq[int(bits, 2)] = c / 4000
    np.testing.assert_allclose(freq, probs, atol=0.05)


def test_provider_backends_unavailable_without_sdk():
    assert IBMQuantumBackend().initialize(QuantumConfig()) is False
    assert GoogleQuantumBackend().initialize(QuantumConfig()) is False


def test_manager_falls_back_to_local_simulator():
    mgr = QuantumHardwareManager(
        QuantumConfig(provider=QuantumProvider.IBM_QUANTUM, shots=256))
    assert mgr.initialize()
    assert isinstance(mgr.backend, LocalStatevectorBackend)
    assert mgr.calibration["gate_fidelity"] == 1.0


def test_manager_execute_quantum_layer_and_cache():
    mgr = QuantumHardwareManager(QuantumConfig(shots=512, seed=3))
    assert mgr.initialize()
    feats = mgr.execute_quantum_layer(
        np.linspace(-1, 1, 8, dtype=np.float32),
        {"n_qubits": 3, "n_layers": 2})
    assert feats.shape == (8,)
    np.testing.assert_allclose(feats.sum(), 1.0, atol=1e-4)
    assert len(mgr.circuit_cache) == 1
    feats2 = mgr.execute_quantum_layer(
        np.linspace(-1, 1, 8, dtype=np.float32),
        {"n_qubits": 3, "n_layers": 2})
    np.testing.assert_array_equal(feats, feats2)  # cache hit


def test_circuit_optimization_preserves_unitary():
    mgr = QuantumHardwareManager(QuantumConfig(optimization_level=2))
    circ = Circuit(np.asarray([[5.0, 0.1, 6.2]], np.float32))
    opt = mgr.optimize_circuit_for_hardware(circ)
    # canonicalized into (-pi, pi] but same statevector
    assert np.all(opt.angles <= np.pi + 1e-6) and np.all(opt.angles > -np.pi - 1e-6)
    psi_a = np.asarray(statevector(jnp.asarray(circ.angles), 3))
    psi_b = np.asarray(statevector(jnp.asarray(opt.angles), 3))
    np.testing.assert_allclose(psi_a, psi_b, atol=1e-4)


# ---------------------------------------------------------------------------
# hybrid flax layer
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_hybrid_layer_shapes_jit_and_gradients():
    layer = HybridQuantumClassicalLayer(
        input_size=16, quantum_size=8, output_size=4, n_qubits=4, n_layers=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 16)),
                    jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    out = jax.jit(layer.apply)(params, x)
    assert out.shape == (6, 4)
    assert np.all(np.isfinite(np.asarray(out)))

    # gradients flow through the quantum path (angle_proj kernel nonzero grad)
    def loss(p):
        return jnp.sum(layer.apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    g = np.asarray(grads["params"]["angle_proj"]["kernel"])
    assert np.abs(g).max() > 0.0


# ---------------------------------------------------------------------------
# distributed manager
# ---------------------------------------------------------------------------

def test_cluster_kv_ttl_and_prefix():
    kv = ClusterKV()
    kv.set("nodes/a", 1, ttl_s=100)
    kv.set("nodes/b", 2, ttl_s=-1)  # already expired
    kv.set("tasks/x", 3)
    assert kv.get("nodes/a") == 1
    assert kv.get("nodes/b") is None
    assert kv.keys("nodes/") == ["nodes/a"]
    kv.delete("nodes/a")
    assert kv.get("nodes/a", "gone") == "gone"


def test_distributed_manager_task_lifecycle_and_dependencies():
    with QuantumDistributedManager(num_workers=2,
                                   capabilities=["cpu"]) as mgr:
        order = []
        t1 = mgr.submit_task(lambda: order.append("first") or 10)
        t2 = mgr.submit_task(lambda x: order.append("second") or x + 5,
                             7, dependencies=[t1])
        assert mgr.get_result(t1, timeout=10) == 10
        assert mgr.get_result(t2, timeout=10) == 12
        assert order[0] == "first"
        status = mgr.get_cluster_status()
        assert status["tasks"]["completed"] == 2
        assert status["tasks"]["failed"] == 0
        assert len(status["nodes"]) >= 1


def test_distributed_manager_capability_filter_and_failure():
    with QuantumDistributedManager(num_workers=1,
                                   capabilities=["cpu"]) as mgr:
        with pytest.raises(RuntimeError):
            mgr.submit_task(lambda: None, required_capabilities=["tpu-v9"])

        def boom():
            raise ValueError("nope")

        tid = mgr.submit_task(boom)
        with pytest.raises(ValueError):
            mgr.get_result(tid, timeout=10)
        assert mgr.get_cluster_status()["tasks"]["failed"] == 1


def test_distributed_manager_selection_strategies():
    with QuantumDistributedManager(
            strategy=TaskDistributionStrategy.QUANTUM_ANNEALING,
            num_workers=1, capabilities=["cpu"], seed=7) as mgr:
        # add two idle peer nodes; annealing should spread assignments
        for i, perf in [(1, 1.0), (2, 1.0)]:
            mgr.register_node(ComputeNode(node_id=f"peer-{i}",
                                          node_type=NodeType.WORKER,
                                          performance_score=perf))
        picked = set()
        for _ in range(30):
            tid = mgr.submit_task(lambda: 0)
            picked.add(mgr._tasks[tid].assigned_node)
            mgr.get_result(tid, timeout=10)
        assert len(picked) >= 2  # stochastic placement uses several nodes

    with QuantumDistributedManager(
            strategy=TaskDistributionStrategy.ROUND_ROBIN,
            num_workers=1, capabilities=["cpu"]) as mgr:
        mgr.register_node(ComputeNode(node_id="peer-rr"))
        a = mgr.submit_task(lambda: 0)
        b = mgr.submit_task(lambda: 0)
        assert (mgr._tasks[a].assigned_node != mgr._tasks[b].assigned_node)
        mgr.wait_all(timeout=10)


def test_distributed_manager_priority_inverted_deps_no_deadlock():
    """High-priority dependents must not occupy every worker while their
    low-priority dependency is still queued (ADVICE r2 deadlock): deps now
    resolve via callbacks BEFORE the dependent enters the pool."""
    import threading
    with QuantumDistributedManager(num_workers=1,
                                   capabilities=["cpu"]) as mgr:
        gate = threading.Event()
        # occupy the single worker so everything below queues first
        blocker = mgr.submit_task(gate.wait, 10)
        dep = mgr.submit_task(lambda: "dep", priority=1)       # low priority
        dependents = [mgr.submit_task(lambda: "ok", priority=9,
                                      dependencies=[dep])
                      for _ in range(3)]                        # high priority
        gate.set()
        assert mgr.get_result(blocker, timeout=10) is not False
        for t in dependents:
            assert mgr.get_result(t, timeout=10) == "ok"


def test_distributed_manager_unknown_dependency_raises():
    with QuantumDistributedManager(num_workers=1,
                                   capabilities=["cpu"]) as mgr:
        with pytest.raises(ValueError, match="unknown dependency"):
            mgr.submit_task(lambda: 0, dependencies=["task-nonexistent"])


def test_distributed_manager_failed_dependency_fails_dependent():
    with QuantumDistributedManager(num_workers=2,
                                   capabilities=["cpu"]) as mgr:
        def boom():
            raise ValueError("upstream")
        bad = mgr.submit_task(boom)
        child = mgr.submit_task(lambda: "never", dependencies=[bad])
        with pytest.raises(ValueError):
            mgr.get_result(bad, timeout=10)
        with pytest.raises(RuntimeError, match="dependency failed"):
            mgr.get_result(child, timeout=10)


def test_circuit_key_includes_shape():
    """(1,4) and (2,2) angles share raw bytes but are different circuits;
    their cache keys must differ (ADVICE r2 cache-collision)."""
    angles = np.arange(4, dtype=np.float32)
    a = Circuit(angles.reshape(1, 4))
    b = Circuit(angles.reshape(2, 2))
    assert a.key() != b.key()
