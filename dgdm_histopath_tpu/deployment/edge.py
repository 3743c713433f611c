"""Edge deployment: model compression, packaged inference engine, monitoring.

Parity surface: reference ``dgdm_histopath/deployment/edge_deployment.py`` —
``EdgeModelOptimizer`` (dynamic int8 quantization :202-206, fp16 :209,
TorchScript/ONNX/TensorRT export flags :33-57 — the JAX analogues are
bf16/int8 param compression and a serialized StableHLO export),
``EdgeInferenceEngine`` (:467), ``EdgeResourceMonitor`` (:722),
``EdgeDeploymentManager`` (:833).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger

logger = get_logger("deployment")


@dataclass
class EdgeConfig:
    """Export configuration (reference EdgeDeploymentConfig :33-57)."""
    quantization: str = "bf16"       # none | bf16 | int8
    max_batch_size: int = 1
    target: str = "tpu"              # tpu | cpu
    export_stablehlo: bool = False


# ---------------------------------------------------------------------------
# parameter compression
# ---------------------------------------------------------------------------

def quantize_params_int8(params) -> Dict[str, Any]:
    """Per-leaf symmetric int8 quantization of float parameters."""
    flat, treedef = jax.tree_util.tree_flatten(params)
    q_leaves, scales, kinds = [], [], []
    for leaf in flat:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and arr.size > 16:
            scale = float(np.abs(arr).max() / 127.0) or 1.0
            q_leaves.append(np.clip(np.round(arr / scale), -127, 127
                                    ).astype(np.int8))
            scales.append(scale)
            kinds.append("int8")
        else:
            q_leaves.append(arr)
            scales.append(1.0)
            kinds.append("raw")
    return {"leaves": q_leaves, "scales": scales, "kinds": kinds,
            "treedef": treedef}


def dequantize_params(qdata: Dict[str, Any]):
    leaves = []
    for leaf, scale, kind in zip(qdata["leaves"], qdata["scales"], qdata["kinds"]):
        if kind == "int8":
            leaves.append(jnp.asarray(leaf, jnp.float32) * scale)
        else:
            leaves.append(jnp.asarray(leaf))
    return jax.tree_util.tree_unflatten(qdata["treedef"], leaves)


def cast_params(params, dtype=jnp.bfloat16):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params)


class EdgeModelOptimizer:
    """Compress a (model, params) pair for edge serving."""

    def __init__(self, config: Optional[EdgeConfig] = None):
        self.config = config or EdgeConfig()

    def optimize(self, params) -> Dict[str, Any]:
        before = sum(np.asarray(p).nbytes
                     for p in jax.tree_util.tree_leaves(params))
        if self.config.quantization == "int8":
            qdata = quantize_params_int8(params)
            after = sum(np.asarray(l).nbytes for l in qdata["leaves"])
            packed: Dict[str, Any] = {"format": "int8", "data": qdata}
        elif self.config.quantization == "bf16":
            cast = cast_params(params, jnp.bfloat16)
            after = sum(np.asarray(p).nbytes
                        for p in jax.tree_util.tree_leaves(cast))
            packed = {"format": "bf16", "data": cast}
        else:
            packed = {"format": "none", "data": params}
            after = before
        packed["stats"] = {"bytes_before": before, "bytes_after": after,
                           "compression": before / max(after, 1)}
        logger.info("edge optimize: %.1f MB -> %.1f MB (%.2fx)",
                    before / 1e6, after / 1e6, before / max(after, 1))
        return packed

    @staticmethod
    def restore(packed: Dict[str, Any]):
        if packed["format"] == "int8":
            return dequantize_params(packed["data"])
        return packed["data"]

    @staticmethod
    def export_stablehlo(fn, example_args, path: str | Path) -> Path:
        """Serialize the jitted computation as StableHLO text (the JAX
        analogue of the reference's TorchScript/ONNX export)."""
        lowered = jax.jit(fn).lower(*example_args)
        path = Path(path)
        path.write_text(lowered.as_text())
        return path


class EdgeInferenceEngine:
    """Packaged single-model inference with latency accounting
    (reference :467)."""

    def __init__(self, model, packed_params: Dict[str, Any],
                 config: Optional[EdgeConfig] = None):
        self.model = model
        self.params = EdgeModelOptimizer.restore(packed_params)
        self.config = config or EdgeConfig()
        if self.config.quantization == "int8":
            # int8-packaged models also COMPUTE int8: eligible Dense layers
            # run on the int8 MXU path (models/quantized.py) instead of the
            # reference's dequantize-then-float-compute
            # (reference deployment/edge_deployment.py:202-206)
            from ..models.quantized import int8_apply
            self._forward = jax.jit(
                lambda p, g: int8_apply(self.model, p, g, mode="inference",
                                        deterministic=True))
        else:
            self._forward = jax.jit(
                lambda p, g: self.model.apply(p, g, mode="inference",
                                              deterministic=True))
        self.stats = {"requests": 0, "total_latency_s": 0.0,
                      "max_latency_s": 0.0}

    def predict(self, graph) -> Dict[str, Any]:
        t0 = time.perf_counter()
        out = self._forward(self.params, graph)
        logits = out.get("classification_logits")
        # fetch (not block_until_ready, which returns at dispatch on
        # tunneled backends) so latency_s covers real execution
        arr = None if logits is None else np.asarray(logits, np.float32)
        dt = time.perf_counter() - t0
        self.stats["requests"] += 1
        self.stats["total_latency_s"] += dt
        self.stats["max_latency_s"] = max(self.stats["max_latency_s"], dt)
        result: Dict[str, Any] = {"latency_s": dt}
        if arr is not None:
            probs = np.exp(arr - arr.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            result.update({"probabilities": probs,
                           "predicted_class": probs.argmax(-1)})
        result["graph_embedding"] = np.asarray(out["graph_embedding"])
        return result

    @property
    def mean_latency_s(self) -> float:
        n = self.stats["requests"]
        return self.stats["total_latency_s"] / n if n else 0.0


class EdgeResourceMonitor:
    """Lightweight host+device resource sampling (reference :722)."""

    def __init__(self):
        self.samples: List[Dict[str, float]] = []

    def sample(self) -> Dict[str, float]:
        from ..quantum.scheduler import read_resources
        snap = read_resources()
        s = {"ts": snap.timestamp, "cpu_load": snap.cpu_load_1m,
             "host_mem_used_frac": snap.mem_used_fraction,
             "device_mem_used_mb": snap.device_mem_used_mb}
        self.samples.append(s)
        if len(self.samples) > 1000:
            self.samples = self.samples[-1000:]
        return s

    def report(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        loads = [s["cpu_load"] for s in self.samples]
        return {"samples": len(self.samples),
                "cpu_load_mean": float(np.mean(loads)),
                "cpu_load_max": float(np.max(loads))}


class EdgeDeploymentManager:
    """Bundle → verify → serve lifecycle (reference :833)."""

    def __init__(self, output_dir: str | Path = "./edge_bundle"):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

    def package(self, model, params, model_config: Dict[str, Any],
                config: Optional[EdgeConfig] = None) -> Path:
        """Write an npz edge bundle (``allow_pickle=False`` end to end).

        Clinical edge bundles get copied between machines; the round-1 pickle
        format was an arbitrary-code-execution hazard on load (ADVICE r1).
        Leaves are name-keyed (``p:<path>``) with per-leaf quantization
        metadata in the JSON header — no code objects anywhere.
        """
        config = config or EdgeConfig()
        from ..training.checkpoint import _KEY_PREFIX, _path_str
        flat_with_paths, _ = jax.tree_util.tree_flatten_with_path(
            jax.device_get(params))
        arrays: Dict[str, np.ndarray] = {}
        leaf_meta: Dict[str, Dict[str, Any]] = {}
        before = after = 0
        for kp, leaf in flat_with_paths:
            name = _path_str(kp)
            arr = np.asarray(leaf)
            before += arr.nbytes
            if (config.quantization == "int8" and arr.dtype.kind == "f"
                    and arr.size > 16):
                scale = float(np.abs(arr).max() / 127.0) or 1.0
                stored = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                leaf_meta[name] = {"kind": "int8", "scale": scale}
            elif config.quantization == "bf16" and arr.dtype.kind == "f":
                # bf16 stored as a uint16 view (npz has no native bf16)
                stored = np.asarray(jnp.asarray(arr, jnp.bfloat16)).view(np.uint16)
                leaf_meta[name] = {"kind": "bf16"}
            else:
                stored = arr
                leaf_meta[name] = {"kind": "raw"}
            arrays[_KEY_PREFIX + name] = stored
            after += stored.nbytes
        stats = {"bytes_before": before, "bytes_after": after,
                 "compression": before / max(after, 1)}
        meta = {"format": "edge_npz_v2", "model_config": model_config,
                "edge_config": config.__dict__, "leaves": leaf_meta,
                "stats": stats}
        bundle_path = self.output_dir / "edge_model.npz"
        np.savez_compressed(bundle_path, __meta__=json.dumps(meta), **arrays)
        (self.output_dir / "manifest.json").write_text(json.dumps({
            "format": config.quantization, "stats": stats,
            "model_config": model_config, "created": time.time()}, indent=2))
        logger.info("edge bundle: %.1f MB -> %.1f MB (%.2fx) at %s",
                    before / 1e6, after / 1e6, stats["compression"], bundle_path)
        return bundle_path

    @staticmethod
    def load(bundle_path: str | Path):
        """Load an npz edge bundle — never unpickles untrusted bytes."""
        from ..models.dgdm import DGDMModel
        from ..training.checkpoint import _KEY_PREFIX
        bundle_path = Path(bundle_path)
        if bundle_path.suffix == ".pkl":
            raise ValueError(
                "legacy pickle edge bundles are no longer loaded (arbitrary "
                "code execution risk); re-export with "
                "EdgeDeploymentManager.package()")
        data = np.load(bundle_path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        # rebuild the nested params dict from '/'-joined leaf paths
        params: Dict[str, Any] = {}
        for name, info in meta["leaves"].items():
            arr = data[_KEY_PREFIX + name]
            if info["kind"] == "int8":
                leaf = jnp.asarray(arr, jnp.float32) * info["scale"]
            elif info["kind"] == "bf16":
                leaf = jnp.asarray(arr.view(jnp.bfloat16))
            else:
                leaf = jnp.asarray(arr)
            node = params
            parts = name.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = leaf
        model = DGDMModel(**meta["model_config"])
        packed = {"format": "none", "data": params}
        return EdgeInferenceEngine(model, packed,
                                   EdgeConfig(**meta["edge_config"]))
