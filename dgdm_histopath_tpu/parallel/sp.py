"""Node-dimension sharding: the graph analogue of sequence parallelism.

The reference has no long-context strategy (SURVEY §5.7: it caps patches and
subsamples nodes). For graphs whose padded node dimension outgrows one
chip's HBM (e.g. 8k+-node buckets at 1024-d hidden), the TPU-native answer
is to shard the **node axis** over the mesh's ``model`` axis: activations
``[B, N, F]`` live distributed as ``[B, N/tp, F]`` per chip, elementwise ops
and LayerNorms run fully local, and XLA inserts the all-gathers only where
the program genuinely needs cross-shard data (neighbor gathers and global
pooling) — the same schedule a hand-written ring would express.

This composes with the DP batch axis: ``('data', 'model')`` mesh, batch on
``data``, nodes on ``model``, params replicated (use ``parallel/tp.py``'s
param layout instead when *parameters* are the memory bound).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graph import PaddedGraph
from ..utils.logging import get_logger
from .mesh import DATA_AXIS, MODEL_AXIS

logger = get_logger("parallel.sp")


def node_sharding(mesh: Mesh, batch_sharded: bool = True) -> NamedSharding:
    """Sharding for ``[B, N, ...]`` graph leaves: batch over ``data``,
    nodes over ``model``."""
    lead = DATA_AXIS if batch_sharded else None
    return NamedSharding(mesh, P(lead, MODEL_AXIS))


def shard_graph_nodes(graph: PaddedGraph, mesh: Mesh) -> PaddedGraph:
    """Place a batched ``PaddedGraph`` with its node axis sharded.

    All per-node leaves (``x``, ``pos``, ``node_mask``, ``nbr_idx``,
    ``nbr_mask``, ``edge_attr``) shard dim 1 over ``model``; neighbor
    indices are *global* node ids, so they remain valid — the cross-shard
    gather becomes an XLA collective, not an index fixup. Labels stay on
    ``data`` only.

    Requires the padded node count to be divisible by the ``model``-axis
    size (node buckets are powers of two, mesh sizes too).
    """
    ns = node_sharding(mesh)
    ds = NamedSharding(mesh, P(DATA_AXIS))

    def place_nodes(leaf):
        if leaf is None:
            return None
        return jax.device_put(leaf, ns)

    n = graph.x.shape[1]
    tp = int(mesh.shape[MODEL_AXIS])
    if n % tp != 0:
        raise ValueError(f"node bucket {n} not divisible by model axis {tp}")
    return PaddedGraph(
        x=place_nodes(graph.x),
        pos=place_nodes(graph.pos),
        nbr_idx=place_nodes(graph.nbr_idx),
        nbr_mask=place_nodes(graph.nbr_mask),
        edge_attr=place_nodes(graph.edge_attr),
        node_mask=place_nodes(graph.node_mask),
        y=None if graph.y is None else jax.device_put(graph.y, ds),
    )


def constrain_nodes(hidden: Any, mesh: Mesh | None) -> Any:
    """Inside-jit annotation keeping ``[B, N, F]`` activations node-sharded.

    Optional: GSPMD usually propagates the input layout; use this to pin the
    layout at layer boundaries when propagation picks replication.
    """
    if mesh is None:
        return hidden
    return jax.lax.with_sharding_constraint(
        hidden, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None)))


__all__ = ["node_sharding", "shard_graph_nodes", "constrain_nodes"]
