"""Tensor-parallel parameter layouts over a 2-D ``('data', 'model')`` mesh.

The reference has no TP anywhere (SURVEY §2.7: DP-only via Lightning DDP);
this is TPU-native headroom for the large configs: shard the wide Dense
kernels over the ``model`` axis, let GSPMD insert the all-gathers/
reduce-scatters, and keep the batch sharded over ``data``. Parameters are
laid out with the classic pairing:

* a 2-D kernel ``[in, out]`` is sharded on its **output** dim when divisible
  by the TP size (column parallel), else on its input dim (row parallel),
  else replicated;
* a module's ``bias``/``scale`` vectors follow their kernel: output-sharded
  kernel ⇒ sharded bias, otherwise replicated (a row-parallel matmul's
  output is a psum — its bias must be added once, i.e. replicated);
* everything else (LayerNorm scales, mask tokens, embeddings) replicates.

Optimizer state is placed leaf-for-leaf like the parameters (same shapes),
so Adam moments shard identically and the update is fully local.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.logging import get_logger
from .mesh import DATA_AXIS, MODEL_AXIS

logger = get_logger("parallel.tp")


def tp_size(mesh: Mesh) -> int:
    """Size of the ``model`` axis (1 when the mesh has none)."""
    try:
        return int(mesh.shape[MODEL_AXIS])
    except KeyError:
        return 1


def _kernel_spec(shape, tp: int) -> P:
    if len(shape) == 2:
        if shape[1] % tp == 0 and shape[1] >= tp:
            return P(None, MODEL_AXIS)          # column parallel
        if shape[0] % tp == 0 and shape[0] >= tp:
            return P(MODEL_AXIS, None)          # row parallel
    return P()


def tp_param_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for ``params`` under the mesh's ``model`` axis.

    Walks module dicts so each ``bias`` matches its sibling ``kernel``.
    Returns an all-replicated spec tree when the mesh has no model axis.
    """
    tp = tp_size(mesh)

    def walk(node) -> Any:
        if isinstance(node, dict):
            out: Dict[str, Any] = {}
            kspec = _kernel_spec(np.shape(node["kernel"]), tp) \
                if "kernel" in node and hasattr(node["kernel"], "shape") else None
            for name, child in node.items():
                if isinstance(child, dict):
                    out[name] = walk(child)
                elif name == "kernel":
                    out[name] = kspec if kspec is not None else P()
                elif name == "bias" and kspec == P(None, MODEL_AXIS):
                    out[name] = P(MODEL_AXIS)   # follows column-parallel kernel
                else:
                    out[name] = P()             # scales, tokens, row-par bias
            return out
        return P()

    if tp <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    # FrozenDict-compatible: unfreeze view via tree flattening of dicts
    as_dict = jax.tree_util.tree_map(lambda x: x, params)  # copy structure
    if hasattr(as_dict, "unfreeze"):
        plain = as_dict.unfreeze()
        specs = walk(plain)
        return type(as_dict)(specs)
    return walk(as_dict)


def shard_tree_like(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """``device_put`` every leaf of ``tree`` with its spec's NamedSharding.

    ``specs`` may be the spec tree of a *sub*-structure (e.g. params) applied
    to a congruent tree (e.g. optimizer moments with identical leaf shapes).
    """
    flat_specs = {tuple(str(k) for k in path): spec
                  for path, spec in _flatten_with_path(specs)}

    def place(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        key = tuple(str(k) for k in path)
        spec = flat_specs.get(key)
        if spec is None:
            # shape-matched fallback (optimizer moments carry the param
            # subtree under extra prefixes): match by path suffix
            spec = next((s for p, s in flat_specs.items()
                         if key[-len(p):] == p), P())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return _tree_map_with_path(place, tree)


def _flatten_with_path(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: isinstance(x, P))
    out = []
    for path, leaf in flat:
        keys = []
        for k in path:
            keys.append(getattr(k, "key", getattr(k, "name", str(k))))
        out.append((keys, leaf))
    return out


def _tree_map_with_path(fn, tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        keys = []
        for k in path:
            keys.append(getattr(k, "key", getattr(k, "name", str(k))))
        leaves.append(fn(keys, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def place_state_tp(state: Any, params_specs: Any, mesh: Mesh) -> Any:
    """Place a TrainState: params + optimizer moments sharded per the param
    specs (suffix-matched), everything else replicated."""
    return shard_tree_like(state, params_specs, mesh)


def describe_sharding(params: Any, mesh: Mesh) -> Dict[str, int]:
    """Summary counters for logging/tests: how many leaves got which layout."""
    specs = tp_param_specs(params, mesh)
    flat = _flatten_with_path(specs)
    counts = {"column": 0, "row": 0, "replicated": 0}
    for _, spec in flat:
        if spec == P(None, MODEL_AXIS):
            counts["column"] += 1
        elif spec == P(MODEL_AXIS, None):
            counts["row"] += 1
        elif spec == P(MODEL_AXIS):
            counts["column"] += 1  # sharded bias rides its column kernel
        else:
            counts["replicated"] += 1
    return counts


__all__ = ["tp_size", "tp_param_specs", "shard_tree_like", "place_state_tp",
           "describe_sharding", "DATA_AXIS", "MODEL_AXIS"]
