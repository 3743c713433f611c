"""Environment/dependency probing.

Parity surface: reference ``dgdm_histopath/utils/dependency_check.py:1-373``
(import probing with graceful degradation reports) and
``robust_environment.py`` (environment validation).
"""

from __future__ import annotations

import importlib.util
import platform
import sys
from typing import Dict, List

REQUIRED = ["jax", "flax", "optax", "numpy", "yaml", "h5py"]
OPTIONAL = {
    "orbax.checkpoint": "async checkpointing",
    "PIL": "TIFF slide backend + patch resizing",
    "cv2": "OpenCV image ops",
    "sklearn": "metrics cross-checks, kmeans tissue detector",
    "scipy": "connected-component labeling",
    "matplotlib": "visualization",
    "openslide": "native .svs/.ndpi decoding",
    "pandas": "tabular metadata",
    "cryptography": "data encryption at rest",
}


def probe(module: str) -> bool:
    try:
        return importlib.util.find_spec(module) is not None
    except (ImportError, ValueError):
        return False


def check_dependencies() -> Dict[str, object]:
    """Full environment report (reference check_installation + dependency
    probing)."""
    required = {m: probe(m) for m in REQUIRED}
    optional = {m: {"available": probe(m), "enables": desc}
                for m, desc in OPTIONAL.items()}
    missing_required = [m for m, ok in required.items() if not ok]
    report: Dict[str, object] = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "required": required,
        "optional": optional,
        "missing_required": missing_required,
        "healthy": not missing_required,
    }
    if required.get("jax"):
        try:
            import jax
            report["jax"] = {
                "version": jax.__version__,
                "backend": jax.default_backend(),
                "device_count": jax.device_count(),
                "devices": [str(d) for d in jax.devices()],
            }
        except Exception as exc:  # pragma: no cover
            report["jax"] = {"error": str(exc)}
    return report


def degraded_features() -> List[str]:
    """Which capabilities are unavailable in this environment."""
    return [f"{m}: {desc}" for m, desc in OPTIONAL.items() if not probe(m)]


def assert_healthy() -> None:
    report = check_dependencies()
    if not report["healthy"]:
        from .exceptions import ConfigurationError
        raise ConfigurationError("missing required dependencies",
                                 {"missing": report["missing_required"]})
