"""Quantum-hardware integration layer.

Reference parity surface: ``dgdm_histopath/quantum/quantum_hardware.py:48-664``
(QuantumProvider, QuantumConfig, QuantumBackendInterface, IBM/Google/local
backends, QuantumHardwareManager, HybridQuantumClassicalLayer).

The reference's local fallback "simulates" circuits by sampling a random
Dirichlet distribution (``quantum_hardware.py:568-585``) — the output carries
no information about the circuit — and its hybrid layer loops Python per
sample and cannot backpropagate through measurement counts. This rebuild
keeps the API surface but makes the mathematics honest and TPU-native:

* :class:`LocalStatevectorBackend` runs an **exact statevector simulation**
  of the parameterized ansatz (RY rotation layers + a CZ entangling ring) as
  batched ``jnp`` contractions — jittable, vmappable over circuits.
* :class:`HybridQuantumClassicalLayer` is a flax module whose "quantum"
  features are **analytic Z-expectations** of that statevector — fully
  differentiable, so the circuit parameters actually train (the reference's
  cannot: gradients die at the sampling step).

Provider backends for real hardware (IBM/Google) are import-gated exactly
like the reference (qiskit/cirq are not shipped); when unavailable the
manager falls back to the local simulator, matching
``quantum_hardware.py:344-351``.
"""

from __future__ import annotations

import hashlib
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("quantum.hardware")

MAX_QUBITS = 12  # 4096-amplitude statevector; plenty for feature widths here


class QuantumProvider(Enum):
    IBM_QUANTUM = "ibm_quantum"
    GOOGLE_QUANTUM = "google_quantum"
    SIMULATOR = "simulator"
    LOCAL_SIMULATOR = "local_simulator"


@dataclass
class QuantumConfig:
    """Mirror of reference ``QuantumConfig`` (quantum_hardware.py:57-68)."""

    provider: QuantumProvider = QuantumProvider.LOCAL_SIMULATOR
    backend_name: Optional[str] = None
    shots: int = 1024
    max_circuits: int = 100
    optimization_level: int = 2
    measurement_error_mitigation: bool = True
    readout_error_mitigation: bool = True
    quantum_volume_threshold: int = 32
    coherence_time_threshold: float = 50e-6
    gate_error_threshold: float = 1e-3
    seed: Optional[int] = 0


@dataclass
class Circuit:
    """A parameterized ansatz: per-layer RY angles + CZ entangling ring.

    ``angles`` has shape [n_layers, n_qubits]. This is the standard
    hardware-efficient ansatz; the reference builds the same family of
    parameterized circuits (``_build_parametrized_circuit``) when qiskit is
    present.
    """

    angles: np.ndarray

    @property
    def n_layers(self) -> int:
        return int(self.angles.shape[0])

    @property
    def n_qubits(self) -> int:
        return int(self.angles.shape[1])

    def key(self) -> str:
        # shape goes into the hash: (1,4) and (2,2) angles share raw bytes
        # but describe different circuits with different 2**n_qubits outputs
        h = hashlib.sha1(repr(self.angles.shape).encode())
        h.update(np.ascontiguousarray(self.angles.astype(np.float64)))
        return h.hexdigest()


# ---------------------------------------------------------------------------
# Exact statevector math (pure jnp; shared by backend + flax layer)
# ---------------------------------------------------------------------------

def _apply_ry(state, theta, qubit: int, n_qubits: int):
    """Apply RY(theta) to ``qubit`` of ``state`` [..., 2**n] (little-endian)."""
    import jax.numpy as jnp
    lead = state.shape[:-1]
    hi, lo = 2 ** (n_qubits - qubit - 1), 2 ** qubit
    s = state.reshape(lead + (hi, 2, lo))
    # theta carries the leading batch dims; add (hi, lo) broadcast axes
    c = jnp.cos(theta / 2.0)[..., None, None]
    sn = jnp.sin(theta / 2.0)[..., None, None]
    a0 = s[..., 0, :]
    a1 = s[..., 1, :]
    out = jnp.stack([c * a0 - sn * a1, sn * a0 + c * a1], axis=-2)
    return out.reshape(lead + (2 ** n_qubits,))


def _cz_ring_signs(n_qubits: int) -> np.ndarray:
    """Static ±1 diagonal of the CZ ring (CZ on (i, i+1 mod n), n>1)."""
    dim = 2 ** n_qubits
    idx = np.arange(dim)
    bits = (idx[:, None] >> np.arange(n_qubits)[None, :]) & 1  # [dim, n]
    sign = np.ones(dim, np.float32)
    if n_qubits > 1:
        pairs = [(i, (i + 1) % n_qubits) for i in range(n_qubits)] \
            if n_qubits > 2 else [(0, 1)]
        for i, j in pairs:
            sign *= np.where((bits[:, i] & bits[:, j]) == 1, -1.0, 1.0)
    return sign


def _z_signs(n_qubits: int) -> np.ndarray:
    """[n_qubits, 2**n] matrix of ±1: Z eigenvalue of qubit k per basis state."""
    dim = 2 ** n_qubits
    idx = np.arange(dim)
    bits = (idx[None, :] >> np.arange(n_qubits)[:, None]) & 1
    return (1.0 - 2.0 * bits).astype(np.float32)


def statevector(angles, n_qubits: int):
    """Exact final statevector for the RY+CZ-ring ansatz.

    angles: [..., n_layers, n_qubits] (any leading batch dims).
    Returns real amplitudes [..., 2**n] (RY+CZ keeps the state real).
    """
    import jax.numpy as jnp
    lead = angles.shape[:-2]
    n_layers = angles.shape[-2]
    dim = 2 ** n_qubits
    state = jnp.zeros(lead + (dim,), angles.dtype).at[..., 0].set(1.0)
    cz = jnp.asarray(_cz_ring_signs(n_qubits), angles.dtype)
    for layer in range(n_layers):
        for q in range(n_qubits):
            state = _apply_ry(state, angles[..., layer, q], q, n_qubits)
        state = state * cz
    return state


def z_expectations(angles, n_qubits: int):
    """Analytic per-qubit <Z> of the ansatz — differentiable in ``angles``.

    Returns [..., n_qubits]. Implemented as probs @ signs.T (one matmul).
    """
    import jax.numpy as jnp
    psi = statevector(angles, n_qubits)
    probs = psi * psi
    signs = jnp.asarray(_z_signs(n_qubits), probs.dtype)
    return probs @ signs.T


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------

class QuantumBackendInterface(ABC):
    """Backend ABC (reference ``quantum_hardware.py:71-93``; sync methods —
    the reference's ``async`` wrappers contain no awaits of real IO)."""

    @abstractmethod
    def initialize(self, config: QuantumConfig) -> bool: ...

    @abstractmethod
    def execute_circuit(self, circuit: Circuit, shots: int = 1024) -> Dict[str, Any]: ...

    @abstractmethod
    def get_backend_properties(self) -> Dict[str, Any]: ...

    @abstractmethod
    def calibrate(self) -> Dict[str, float]: ...


class LocalStatevectorBackend(QuantumBackendInterface):
    """Exact local simulator (replaces the reference's Dirichlet-random
    ``_numpy_simulation``, quantum_hardware.py:568-585)."""

    def __init__(self) -> None:
        self.config: Optional[QuantumConfig] = None
        self._rng = np.random.default_rng(0)
        self._compiled: Dict[Tuple[int, int], Any] = {}

    def initialize(self, config: QuantumConfig) -> bool:
        self.config = config
        self._rng = np.random.default_rng(config.seed)
        logger.info("initialized local statevector simulator")
        return True

    def _probs_fn(self, n_layers: int, n_qubits: int):
        key = (n_layers, n_qubits)
        if key not in self._compiled:
            import jax
            import jax.numpy as jnp

            def probs(angles):
                psi = statevector(angles, n_qubits)
                return (psi * psi).astype(jnp.float32)

            self._compiled[key] = jax.jit(probs)
        return self._compiled[key]

    def execute_circuit(self, circuit: Circuit, shots: int = 1024) -> Dict[str, Any]:
        if circuit.n_qubits > MAX_QUBITS:
            raise ValueError(f"n_qubits {circuit.n_qubits} > {MAX_QUBITS}")
        import jax.numpy as jnp
        probs = np.asarray(
            self._probs_fn(circuit.n_layers, circuit.n_qubits)(
                jnp.asarray(circuit.angles, jnp.float32)))
        probs = np.clip(probs, 0.0, None)
        probs /= probs.sum()
        outcomes = self._rng.choice(probs.size, size=shots, p=probs)
        counts: Dict[str, int] = {}
        for o, c in zip(*np.unique(outcomes, return_counts=True)):
            counts[format(int(o), f"0{circuit.n_qubits}b")] = int(c)
        return {
            "counts": counts,
            "probabilities": probs,
            "metadata": {"simulation": "statevector_exact",
                         "n_qubits": circuit.n_qubits,
                         "n_layers": circuit.n_layers},
            "job_id": "local_statevector",
        }

    def get_backend_properties(self) -> Dict[str, Any]:
        return {"name": "local_statevector", "type": "simulator",
                "perfect_gates": True, "no_decoherence": True,
                "max_qubits": MAX_QUBITS}

    def calibrate(self) -> Dict[str, float]:
        return {"gate_fidelity": 1.0, "measurement_fidelity": 1.0,
                "coherence_time": float("inf")}


class _UnavailableProviderBackend(QuantumBackendInterface):
    """Import-gated provider backend; reports unavailable without the SDK
    (mirrors reference behavior — qiskit/cirq are optional extras there)."""

    sdk_module = ""
    provider_name = ""

    def __init__(self) -> None:
        self.config: Optional[QuantumConfig] = None

    def initialize(self, config: QuantumConfig) -> bool:
        try:
            __import__(self.sdk_module)
        except ImportError:
            logger.warning("%s SDK (%s) not installed; backend unavailable",
                           self.provider_name, self.sdk_module)
            return False
        self.config = config
        return True

    def execute_circuit(self, circuit: Circuit, shots: int = 1024) -> Dict[str, Any]:
        raise RuntimeError(f"{self.provider_name} backend not initialized")

    def get_backend_properties(self) -> Dict[str, Any]:
        return {"name": self.provider_name, "type": "hardware",
                "available": False}

    def calibrate(self) -> Dict[str, float]:
        raise RuntimeError(f"{self.provider_name} backend not initialized")


class IBMQuantumBackend(_UnavailableProviderBackend):
    sdk_module = "qiskit"
    provider_name = "ibm_quantum"


class GoogleQuantumBackend(_UnavailableProviderBackend):
    sdk_module = "cirq"
    provider_name = "google_quantum"


# ---------------------------------------------------------------------------
# Manager
# ---------------------------------------------------------------------------

class QuantumHardwareManager:
    """Backend selection + hybrid-layer execution + circuit cache
    (reference ``quantum_hardware.py:334-515``)."""

    def __init__(self, config: Optional[QuantumConfig] = None) -> None:
        self.config = config or QuantumConfig()
        self.backend: Optional[QuantumBackendInterface] = None
        self.circuit_cache: Dict[str, Dict[str, Any]] = {}
        self.calibration: Dict[str, float] = {}

    def initialize(self) -> bool:
        if self.config.provider == QuantumProvider.IBM_QUANTUM:
            self.backend = IBMQuantumBackend()
        elif self.config.provider == QuantumProvider.GOOGLE_QUANTUM:
            self.backend = GoogleQuantumBackend()
        else:
            self.backend = LocalStatevectorBackend()
        ok = self.backend.initialize(self.config)
        if not ok:
            # provider SDK missing → local fallback (reference :344-351)
            logger.warning("provider %s unavailable; falling back to local "
                           "statevector simulator", self.config.provider.value)
            self.backend = LocalStatevectorBackend()
            ok = self.backend.initialize(self.config)
        if ok:
            self.calibration = self.backend.calibrate()
        return ok

    # -- circuit construction ------------------------------------------------
    @staticmethod
    def classical_to_quantum_params(features: np.ndarray,
                                    n_qubits: int,
                                    n_layers: int = 2) -> Circuit:
        """Map a feature vector to ansatz angles in [0, 2π) (reference
        ``_classical_to_quantum_params`` uses sigmoid·2π; same here)."""
        f = np.asarray(features, np.float64).reshape(-1)
        need = n_qubits * n_layers
        reps = int(np.ceil(need / max(f.size, 1)))
        f = np.tile(f, reps)[:need]
        angles = (1.0 / (1.0 + np.exp(-f))) * 2.0 * np.pi
        return Circuit(angles.reshape(n_layers, n_qubits).astype(np.float32))

    def optimize_circuit_for_hardware(self, circuit: Circuit) -> Circuit:
        """Merge consecutive single-qubit rotations between entanglers.

        With optimization_level == 0 the circuit is returned untouched. A
        single RY layer per entangling block is already minimal, so the
        honest optimization here is angle canonicalization into (−π, π] —
        shorter pulses on real hardware, identical unitary.
        """
        if self.config.optimization_level <= 0:
            return circuit
        ang = np.mod(circuit.angles + np.pi, 2 * np.pi) - np.pi
        return Circuit(ang.astype(np.float32))

    # -- execution -----------------------------------------------------------
    def execute_quantum_layer(self, classical_input: np.ndarray,
                              circuit_params: Optional[Dict[str, Any]] = None
                              ) -> np.ndarray:
        """features → circuit → execute → measurement-probability features.

        Returns the basis-state probability vector [2**n_qubits] (the
        reference's ``_quantum_to_classical_tensor`` shape). Falls back to
        the analytic probabilities if backend execution fails.
        """
        if self.backend is None:
            self.initialize()
        p = circuit_params or {}
        n_qubits = int(min(p.get("n_qubits", 4), MAX_QUBITS))
        n_layers = int(p.get("n_layers", 2))
        circuit = self.optimize_circuit_for_hardware(
            self.classical_to_quantum_params(classical_input, n_qubits, n_layers))
        key = circuit.key()
        if key in self.circuit_cache:
            return self.circuit_cache[key]["features"]
        try:
            result = self.backend.execute_circuit(circuit, self.config.shots)
            if "probabilities" in result:
                feats = np.asarray(result["probabilities"], np.float32)
            else:
                total = max(sum(result["counts"].values()), 1)
                feats = np.zeros(2 ** n_qubits, np.float32)
                for bits, c in result["counts"].items():
                    feats[int(bits, 2)] = c / total
        except Exception as exc:  # pragma: no cover - backend failure path
            logger.error("quantum execution failed (%s); classical fallback", exc)
            feats = self._classical_fallback(circuit)
        if len(self.circuit_cache) < self.config.max_circuits:
            self.circuit_cache[key] = {"features": feats}
        return feats

    @staticmethod
    def _classical_fallback(circuit: Circuit) -> np.ndarray:
        import jax.numpy as jnp
        psi = statevector(jnp.asarray(circuit.angles, jnp.float32),
                          circuit.n_qubits)
        return np.asarray(psi * psi, np.float32)


# ---------------------------------------------------------------------------
# Hybrid flax layer
# ---------------------------------------------------------------------------

try:
    import flax.linen as nn
    import jax.numpy as jnp

    class HybridQuantumClassicalLayer(nn.Module):
        """Differentiable hybrid layer (reference
        ``quantum_hardware.py:590-652``, which loops Python per batch sample
        and blocks gradients at sampling; here the quantum features are
        analytic Z-expectations — one vmapped statevector per batch, fully
        differentiable and jittable).

        input [B, input_size] → Dense prep → angles → exact <Z_k> features
        → learned convex mix with classical features → Dense out.
        """

        input_size: int
        quantum_size: int
        output_size: int
        n_qubits: int = 6
        n_layers: int = 2
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            nq = min(self.n_qubits, MAX_QUBITS)
            classical = nn.Dense(self.quantum_size, dtype=self.dtype,
                                 name="classical_prep")(x)
            raw = nn.Dense(self.n_layers * nq, dtype=self.dtype,
                           name="angle_proj")(classical)
            angles = nn.sigmoid(raw) * (2.0 * jnp.pi)
            angles = angles.reshape(x.shape[:-1] + (self.n_layers, nq))
            # f32 statevector regardless of activation dtype: 2**n amplitudes
            # accumulate; bf16 phases visibly bias <Z> (repo f32-accum rule)
            zexp = z_expectations(angles.astype(jnp.float32), nq)
            quantum = nn.Dense(self.quantum_size, dtype=self.dtype,
                               name="quantum_proj")(zexp.astype(self.dtype))
            w = nn.sigmoid(self.param("quantum_weight",
                                      lambda *_: jnp.zeros(())))
            hybrid = w * quantum + (1.0 - w) * classical
            return nn.Dense(self.output_size, dtype=self.dtype,
                            name="classical_post")(hybrid)

except ImportError:  # pragma: no cover
    HybridQuantumClassicalLayer = None  # type: ignore


__all__ = [
    "QuantumProvider", "QuantumConfig", "Circuit",
    "QuantumBackendInterface", "LocalStatevectorBackend",
    "IBMQuantumBackend", "GoogleQuantumBackend",
    "QuantumHardwareManager", "HybridQuantumClassicalLayer",
    "statevector", "z_expectations",
]
