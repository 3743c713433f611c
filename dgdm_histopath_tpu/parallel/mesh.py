"""Device mesh construction and sharding helpers.

The reference's entire distributed story is implicit DDP through Lightning
(reference ``cli/train.py:346-359``; SURVEY §2.7). The TPU-native equivalent
is explicit SPMD: a ``jax.sharding.Mesh`` with a ``data`` axis (DP parity),
optionally a ``model`` axis for tensor-parallel layouts of the large configs.
Batches are sharded over ``data``; parameters are replicated (or sharded over
``model``); XLA inserts the gradient ``psum`` automatically under ``jit``.
Collectives ride ICI within a slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.logging import get_logger

logger = get_logger("parallel")

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    Default: 1-D ``('data',)`` mesh over all local devices (pure DP). Pass
    ``axes=('data','model')`` with ``shape=(dp, tp)`` for 2-D layouts.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = [len(devs)] + [1] * (len(axes) - 1)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(f"mesh shape {tuple(shape)} != device count {len(devs)}")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axes))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree batch with its leading axis sharded over ``data``.

    Leaves without a leading batch axis (scalars) are replicated.
    """
    ds = data_sharding(mesh)
    rs = replicated(mesh)

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jax.device_put(leaf, ds)
        return jax.device_put(leaf, rs)

    return jax.tree_util.tree_map(place, batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rs = replicated(mesh)
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, rs), tree)


def pad_batch_to_devices(batch_np: Any, n_devices: int) -> Any:
    """Host-side: pad the leading axis of every array leaf to a multiple of
    ``n_devices`` (repeats the last element; callers mask padded samples)."""

    def pad(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        b = leaf.shape[0]
        rem = (-b) % n_devices
        if rem == 0:
            return leaf
        reps = np.repeat(leaf[-1:], rem, axis=0)
        return np.concatenate([leaf, reps], axis=0)

    return jax.tree_util.tree_map(pad, batch_np)
