"""Expert-parallel parameter layout for the MoE tier (``nn/moe.py``).

The reference has no MoE and no expert parallelism (SURVEY §2.7) — this is
the fifth sharding tier (DP / TP / SP / PP / EP). Expert FFN parameters
carry a leading ``[E]`` axis; sharding that axis over an ``expert`` mesh
axis makes each chip hold ``E / ep`` experts. Under ``jit`` GSPMD then
keeps the three expert matmuls fully local and inserts the expert
all-to-all (scatter of ``[E, C, F]`` dispatch slices, gather of expert
outputs) exactly where the dense dispatch/combine einsums cross the expert
axis — the GShard schedule without any hand-written collective.

Layout only — compose with ``tp.shard_tree_like`` for placement and with
the ``data`` axis for the batch, e.g. ``make_mesh(axes=('data','expert'),
shape=(dp, ep))``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.logging import get_logger

EXPERT_AXIS = "expert"

#: leaf names of per-expert parameters in ``nn.moe.MoEFFN`` (leading E axis)
_EXPERT_LEAVES = frozenset({"w_in", "b_in", "w_out", "b_out"})

logger = get_logger("parallel.ep")


def ep_size(mesh: Mesh) -> int:
    """Size of the ``expert`` axis (1 when the mesh has none)."""
    try:
        return int(mesh.shape[EXPERT_AXIS])
    except KeyError:
        return 1


def ep_param_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree: expert-stacked leaves shard their leading
    ``[E]`` axis over ``expert``; everything else (router included — its
    output must exist on every shard) replicates.

    Apply with ``tp.shard_tree_like`` (also correct for congruent optimizer
    moments, making the expert Adam state ``1/ep`` per chip).
    """
    import jax

    ep = ep_size(mesh)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for name, child in node.items():
                if isinstance(child, dict):
                    out[name] = walk(child)
                elif (name in _EXPERT_LEAVES and hasattr(child, "shape")
                      and np.shape(child)[0] % ep == 0):
                    out[name] = P(EXPERT_AXIS)
                else:
                    out[name] = P()
            return out
        return P()

    if ep <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    as_dict = jax.tree_util.tree_map(lambda x: x, params)
    if hasattr(as_dict, "unfreeze"):
        plain = as_dict.unfreeze()
        return type(as_dict)(walk(plain))
    return walk(as_dict)


def count_expert_sharded(specs: Any) -> int:
    """Number of leaves laid out over the expert axis (logging/tests)."""
    import jax

    return sum(1 for leaf in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
        if isinstance(leaf, P) and len(leaf) > 0 and leaf[0] == EXPERT_AXIS)


__all__ = ["EXPERT_AXIS", "ep_size", "ep_param_specs", "count_expert_sharded"]
