"""Locality-aware halo exchange for node-sharded graphs.

``parallel/sp.py`` shards the node axis and lets GSPMD insert the cross-shard
collectives. That is correct but pessimistic: a *global* neighbor gather from
a node-sharded ``[B, N, F]`` array compiles to all-gathering the full source
(ADR-0005 addendum: 177 all-gathers + 30 all-to-alls for the tiny config),
because the compiler cannot know that kNN neighbors are spatially local.

This module exploits that locality explicitly — the classic halo/ghost-cell
pattern, expressed TPU-natively as one small static ``all_to_all`` per gather:

1. **Spatial sort** (host, once per graph): permute nodes into Morton (Z-curve)
   order so a contiguous block shard is a spatially compact region and nearly
   all kNN edges stay within their block.
2. **Halo plan** (host, once per batch): for every (source shard j, dest shard
   i) pair, the unique source rows that i's nodes reference — padded to a
   static ``halo_size`` H — plus neighbor indices relabelled into each
   shard's ``[local rows ‖ halo buffer]`` coordinate system.
3. **Exchange** (device, inside ``shard_map``): each shard gathers its
   outgoing rows ``[B, tp, H, F]``, one ``lax.all_to_all`` over the ``model``
   axis swaps them, and the neighbor gather proceeds locally against
   ``concat([x_local, halo])``. Per-shard traffic is ``tp·H·F`` elements
   instead of the full ``N·F`` all-gather — with Morton order H tracks the
   shard *perimeter*, so the ratio improves as buckets grow.

The reference has no analogue (it caps patch counts and subsamples nodes —
SURVEY §5.7); this is the scale-out path for 8k+-node buckets. Padding
nodes sort to the tail, so trailing shards carry the padding — acceptable
skew at DGDM bucket sizes, and the plan is mask-exact regardless.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.graph import PaddedGraph, gather_neighbors, resolve_gather_impl
from ..utils.logging import get_logger
from .mesh import DATA_AXIS, MODEL_AXIS

logger = get_logger("parallel.halo")


# ---------------------------------------------------------------------------
# 1. Spatial (Morton) sort — host-side, once per graph
# ---------------------------------------------------------------------------

def _interleave_bits(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``v`` to even positions (int64)."""
    v = v.astype(np.int64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_keys(pos: np.ndarray, node_mask: np.ndarray) -> np.ndarray:
    """Z-curve key per node from 2-D coords (real nodes only; pad rows get
    the max key so they sort last). pos [N, 2] -> int64 [N]."""
    pos = np.asarray(pos, np.float64)
    mask = np.asarray(node_mask, bool)
    if mask.any():
        lo = pos[mask].min(axis=0)
        span = np.maximum(pos[mask].max(axis=0) - lo, 1e-12)
    else:  # degenerate all-padding graph
        lo, span = np.zeros(2), np.ones(2)
    q = np.clip(((pos - lo) / span * 65535.0), 0, 65535).astype(np.int64)
    keys = _interleave_bits(q[:, 0]) | (_interleave_bits(q[:, 1]) << 1)
    return np.where(mask, keys, np.iinfo(np.int64).max)


def spatial_permutation(pos: np.ndarray, node_mask: np.ndarray) -> np.ndarray:
    """Permutation ``perm`` (new row i takes old row ``perm[i]``) putting real
    nodes in Morton order, padding last. Stable, so it is deterministic."""
    return np.argsort(morton_keys(pos, node_mask), kind="stable").astype(np.int32)


def permute_graph(graph: PaddedGraph, perm: np.ndarray) -> PaddedGraph:
    """Relabel an UNBATCHED PaddedGraph by a node permutation (host-side).

    Semantically a no-op: every per-node row moves together and neighbor ids
    are remapped through the inverse permutation, so any mask-correct padded
    op produces row-permuted outputs (tested in tests/test_halo.py).
    """
    if graph.x.ndim != 2:
        raise ValueError("permute_graph expects an unbatched graph; permute "
                         "before batch_graphs (per-graph perms differ)")
    perm = np.asarray(perm, np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    idx = np.asarray(graph.nbr_idx)
    mask = np.asarray(graph.nbr_mask)
    new_idx = inv[idx][perm]           # rows permuted, values remapped
    new_idx = np.where(mask[perm], new_idx, 0).astype(np.int32)
    return PaddedGraph(
        x=jnp.asarray(np.asarray(graph.x)[perm]),
        pos=jnp.asarray(np.asarray(graph.pos)[perm]),
        nbr_idx=jnp.asarray(new_idx),
        nbr_mask=jnp.asarray(mask[perm]),
        edge_attr=jnp.asarray(np.asarray(graph.edge_attr)[perm]),
        node_mask=jnp.asarray(np.asarray(graph.node_mask)[perm]),
        y=graph.y,
    )


def spatial_sort(graph: PaddedGraph) -> PaddedGraph:
    """Morton-sort an unbatched graph's nodes (the step-1 entry point)."""
    perm = spatial_permutation(np.asarray(graph.pos), np.asarray(graph.node_mask))
    return permute_graph(graph, perm)


# ---------------------------------------------------------------------------
# 2. Halo plan — host-side, once per batch
# ---------------------------------------------------------------------------

class HaloPlan(NamedTuple):
    """Static exchange schedule for one batched bucket shape.

    send_idx      [B, tp, tp, H] int32 — send_idx[b, j, i] are the LOCAL row
                  ids shard j ships to shard i (padded with 0).
    nbr_idx_local [B, N, K] int32 — neighbor ids in each owning shard's
                  ``[0, n_local + tp*H)`` coordinate system (local rows first,
                  then the received halo buffer in source-shard-major order).
    halo_size     H (static). n_local = N // tp. tp = model-axis size.
    """

    send_idx: np.ndarray
    nbr_idx_local: np.ndarray
    halo_size: int
    n_local: int
    tp: int


def build_halo_plan(nbr_idx: np.ndarray, nbr_mask: np.ndarray, tp: int,
                    halo_size: Optional[int] = None) -> HaloPlan:
    """Plan the exchange for contiguous block sharding of the node axis.

    ``halo_size`` pins H for a stable compiled shape across batches (the
    production setting: one H per node bucket, validated here); default is
    the observed max. Raises if any (src, dst) pair needs more than H rows.

    Host cost: ~22 ms (tp=4) / ~60 ms (tp=8) for a batch-32 × 1024-node
    bucket on the 1-core dev host — run it in the loader's prefetch thread
    (data/datamodule.py) so it overlaps the previous device step.
    """
    idx = np.asarray(nbr_idx)
    msk = np.asarray(nbr_mask, bool)
    if idx.ndim == 2:
        idx, msk = idx[None], msk[None]
    b_sz, n, k = idx.shape
    if n % tp:
        raise ValueError(f"node bucket {n} not divisible by tp={tp}")
    n_loc = n // tp

    dst_shard = np.repeat(np.arange(tp), n_loc)           # [N]
    needed = {}                                            # (b, j, i) -> rows
    h_max = 1
    for b in range(b_sz):
        src_shard = idx[b] // n_loc                        # [N, K]
        cross = msk[b] & (src_shard != dst_shard[:, None])
        for i in range(tp):
            rows = idx[b, i * n_loc:(i + 1) * n_loc]
            crs = cross[i * n_loc:(i + 1) * n_loc]
            srcs = rows // n_loc
            for j in range(tp):
                uniq = np.unique(rows[crs & (srcs == j)])
                if uniq.size:
                    needed[(b, j, i)] = uniq
                    h_max = max(h_max, int(uniq.size))
    h = int(halo_size) if halo_size is not None else h_max
    if h_max > h:
        raise ValueError(f"halo_size={h} too small: batch needs {h_max}")

    send_idx = np.zeros((b_sz, tp, tp, h), np.int32)
    new_idx = np.where(msk, idx % n_loc, 0).astype(np.int32)  # local default
    for (b, j, i), uniq in needed.items():
        send_idx[b, j, i, :uniq.size] = (uniq % n_loc).astype(np.int32)
        # remap dst-shard i's cross-edges into the halo buffer: position of
        # each global id within (j, i)'s unique list, offset by j's lane
        lo, hi = i * n_loc, (i + 1) * n_loc
        blk = idx[b, lo:hi]
        hit = msk[b, lo:hi] & np.isin(blk, uniq)
        pos = np.searchsorted(uniq, blk[hit])
        new_idx[b, lo:hi][hit] = (n_loc + j * h + pos).astype(np.int32)
    if b_sz and nbr_idx.ndim == 2:
        send_idx, new_idx = send_idx[0], new_idx[0]
    return HaloPlan(send_idx=send_idx, nbr_idx_local=new_idx,
                    halo_size=h, n_local=n_loc, tp=tp)


# ---------------------------------------------------------------------------
# 3. Exchange + gather — device-side, inside shard_map
# ---------------------------------------------------------------------------

def halo_gather(x: jnp.ndarray, plan: HaloPlan, mesh: Mesh,
                batch_sharded: bool = True) -> jnp.ndarray:
    """Neighbor gather over a node-sharded ``[B, N, F]`` array.

    Returns ``[B, N, K, F]`` with the node axis sharded over ``model``
    exactly like the input. The only collective is one
    ``all_to_all([B, tp, H, F])`` over the ``model`` axis — per-shard traffic
    ``tp·H·F`` elements vs the ``N·F`` all-gather GSPMD emits for the same
    gather (measured in tests/test_halo.py from the compiled HLO).
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError("halo_gather needs a mesh with a 'model' axis")
    tp = int(mesh.shape[MODEL_AXIS])
    if tp != plan.tp:
        raise ValueError(f"plan built for tp={plan.tp}, mesh has {tp}")
    lead = DATA_AXIS if (batch_sharded and DATA_AXIS in mesh.axis_names) else None
    h = plan.halo_size

    x_spec = P(lead, MODEL_AXIS, None)
    send_spec = P(lead, MODEL_AXIS, None, None)
    idx_spec = P(lead, MODEL_AXIS, None)
    out_spec = P(lead, MODEL_AXIS, None, None)

    def _exchange(x_l, send_l, idx_l):
        # x_l [b, n_loc, F]; send_l [b, 1, tp, H] (this shard's outgoing
        # rows per destination); idx_l [b, n_loc, K] in local+halo coords
        b, n_loc, f = x_l.shape
        send = send_l[:, 0]                                     # [b, tp, H]
        rows = jnp.take_along_axis(
            jnp.broadcast_to(x_l[:, None], (b, tp, n_loc, f)),
            jnp.broadcast_to(send[..., None], (b, tp, h, 1)).astype(jnp.int32),
            axis=2)                                             # [b, tp, H, F]
        recv = jax.lax.all_to_all(rows, MODEL_AXIS,
                                  split_axis=1, concat_axis=1)  # [b, tp, H, F]
        full = jnp.concatenate([x_l, recv.reshape(b, tp * h, f)], axis=1)
        # rectangular gather: [b, n_src, F] table, [b, n_loc, K] indices
        # (gather_neighbors assumes a square table, so inline the two impls
        # under the same backend policy it uses)
        n_src = full.shape[1]
        k = idx_l.shape[-1]
        if resolve_gather_impl() == "onehot":
            sel = (idx_l[..., None] ==
                   jnp.arange(n_src, dtype=idx_l.dtype)).astype(full.dtype)
            return jnp.einsum("bnks,bsf->bnkf", sel, full)
        flat = jnp.broadcast_to(idx_l.reshape(b, n_loc * k)[..., None],
                                (b, n_loc * k, f))
        return jnp.take_along_axis(full, flat, axis=1).reshape(b, n_loc, k, f)

    kw = dict(mesh=mesh, in_specs=(x_spec, send_spec, idx_spec),
              out_specs=out_spec)
    try:
        exchange = shard_map(_exchange, check_vma=False, **kw)
    except TypeError:  # pragma: no cover - older jax uses check_rep
        exchange = shard_map(_exchange, check_rep=False, **kw)

    send = jnp.asarray(plan.send_idx)
    idx = jnp.asarray(plan.nbr_idx_local)
    if x.ndim == 2:  # unbatched convenience
        return exchange(x[None], send[None], idx[None])[0]
    return exchange(x, send, idx)


def sp_graph_conv(params, x: jnp.ndarray, nbr_idx: jnp.ndarray,
                  nbr_mask: jnp.ndarray, plan: HaloPlan, mesh: Mesh,
                  edge_attr: Optional[jnp.ndarray] = None,
                  edge_weight: Optional[jnp.ndarray] = None,
                  dtype=jnp.float32) -> jnp.ndarray:
    """``nn.GraphConvolution`` forward over node-sharded inputs.

    Applies a trained layer's parameter tree (``{'lin','edge_lin','bias'}``,
    as produced by ``nn.graph_layers.GraphConvolution``) with every per-node
    op running shard-local and BOTH gathers — the neighbor inverse-sqrt
    degree and the neighbor features — riding the same halo plan (the plan
    depends only on ``nbr_idx``, which the two gathers share). Math matches
    the dense layer's take-path exactly, including the Σ_k weight·e
    linearity reassociation (``nn/graph_layers.py:86-122``); parity is
    pinned in tests/test_halo.py.

    Inputs are ``[B, N, ...]`` with the node axis sharded over ``model``
    (``sp.shard_graph_nodes``); the output keeps that layout.
    """
    kernel = jnp.asarray(params["lin"]["kernel"], dtype)
    bias = jnp.asarray(params["bias"], dtype)
    h = x.astype(dtype) @ kernel                              # node-local
    deg = jnp.sum(nbr_mask.astype(dtype), axis=-1) + 1.0      # self-loop
    inv = jax.lax.rsqrt(jnp.maximum(deg, 1.0))                # [B, N]
    nbr_inv = halo_gather(inv[..., None], plan, mesh)[..., 0]  # [B, N, K]
    weight = inv[..., None] * nbr_inv * nbr_mask.astype(dtype)
    if edge_weight is not None:
        weight = weight * edge_weight.astype(dtype)
    weight = weight * nbr_mask.astype(dtype)
    h_nbr = halo_gather(h, plan, mesh)                        # [B, N, K, F']
    agg = jnp.sum(h_nbr * weight[..., None], axis=-2)
    if edge_attr is not None and "edge_lin" in params:
        e_sum = jnp.sum(edge_attr.astype(dtype) * weight[..., None], axis=-2)
        agg = agg + e_sum @ jnp.asarray(params["edge_lin"]["kernel"], dtype)
    out = agg + h * (inv * inv)[..., None]
    return out + bias


def halo_fraction(nbr_idx: np.ndarray, nbr_mask: np.ndarray, tp: int) -> float:
    """Diagnostic: fraction of real edges that cross a shard boundary under
    contiguous block sharding (lower after spatial_sort ⇒ smaller H)."""
    idx = np.asarray(nbr_idx)
    msk = np.asarray(nbr_mask, bool)
    if idx.ndim == 2:
        idx, msk = idx[None], msk[None]
    n = idx.shape[-2]
    n_loc = n // tp
    dst = np.repeat(np.arange(tp), n_loc)[None, :, None]
    cross = msk & ((idx // n_loc) != dst)
    total = max(int(msk.sum()), 1)
    return float(cross.sum()) / total


__all__ = ["HaloPlan", "build_halo_plan", "halo_gather", "halo_fraction",
           "sp_graph_conv",
           "morton_keys", "spatial_permutation", "permute_graph",
           "spatial_sort"]
