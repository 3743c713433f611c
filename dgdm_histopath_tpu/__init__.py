"""dgdm_histopath_tpu — TPU-native Dynamic Graph Diffusion Models for
whole-slide histopathology.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``dgdm_histopath`` framework (public API parity surface:
reference ``dgdm_histopath/__init__.py:35-84``): slide preprocessing, tissue
graph construction, the DGDM model family, two-phase training, prediction,
visualization, and task orchestration — designed TPU-first (SPMD over device
meshes, static-shape padded graphs, bf16 MXU compute).
"""

__version__ = "0.1.0"
__author__ = "DGDM TPU Team"

from .utils.logging import get_logger, setup_logging

# Core model path — import-gated like the reference's CORE_AVAILABLE flag
# (reference dgdm_histopath/__init__.py:44-57).
try:
    from .models import DGDMModel
    from .ops.graph import PaddedGraph, batch_graphs, from_edge_index
    CORE_AVAILABLE = True
except ImportError as _exc:  # pragma: no cover
    CORE_AVAILABLE = False
    _core_import_error = _exc

try:
    from .preprocessing import SlideProcessor, TissueDetector, TissueGraphBuilder, StainNormalizer
    from .training import DGDMTrainer
    from .evaluation import DGDMPredictor, AttentionVisualizer
    from .data import HistopathDataModule, HistopathDataset, SlideDataset
    FULL_AVAILABLE = True
except ImportError:  # pragma: no cover - optional heavy deps missing
    FULL_AVAILABLE = False

try:
    from .quantum import QuantumPlanner, QuantumScheduler
    QUANTUM_AVAILABLE = True
except ImportError:  # pragma: no cover
    QUANTUM_AVAILABLE = False


def check_installation() -> dict:
    """Report component availability (parity with reference
    ``check_installation``, ``dgdm_histopath/__init__.py:71-84``)."""
    import importlib.util
    deps = {}
    for mod in ("jax", "flax", "optax", "orbax.checkpoint", "numpy", "h5py",
                "yaml", "cv2", "sklearn", "PIL", "matplotlib"):
        deps[mod] = importlib.util.find_spec(mod) is not None
    report = {
        "version": __version__,
        "core_available": CORE_AVAILABLE,
        "full_available": FULL_AVAILABLE,
        "quantum_available": QUANTUM_AVAILABLE,
        "dependencies": deps,
    }
    try:
        import jax
        report["devices"] = [str(d) for d in jax.devices()]
        report["default_backend"] = jax.default_backend()
    except Exception as exc:  # pragma: no cover
        report["devices_error"] = str(exc)
    return report


def get_build_info() -> dict:
    import jax
    return {
        "version": __version__,
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
    }


__all__ = [
    "DGDMModel", "PaddedGraph", "batch_graphs", "from_edge_index",
    "get_logger", "setup_logging", "check_installation", "get_build_info",
    "CORE_AVAILABLE", "FULL_AVAILABLE", "QUANTUM_AVAILABLE",
]
