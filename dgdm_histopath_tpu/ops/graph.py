"""Padded dense-neighbor graph format and masked segment ops.

This is the TPU-native replacement for the reference's PyG ragged COO format
(``torch_geometric.data.Data`` with ``edge_index`` — see reference
``preprocessing/tissue_graph_builder.py:367-437``). XLA wants static shapes,
so a tissue graph is stored as fixed-size padded arrays:

  - ``x``         [N, F]   node (patch) features
  - ``pos``       [N, 2]   normalized patch coordinates
  - ``nbr_idx``   [N, K]   int32 neighbor indices (row i's incoming edges)
  - ``nbr_mask``  [N, K]   True where the neighbor slot is a real edge
  - ``edge_attr`` [N, K, E] per-edge features (dist/weight/sim)
  - ``node_mask`` [N]      True for real (non-padding) nodes

``N`` is drawn from a small set of buckets (config ``data.node_buckets``) so
the number of distinct compiled programs stays bounded (SURVEY §7 "hard
parts"). A batch of graphs adds a leading ``B`` axis to every field; all ops
here are written for the unbatched case and ``jax.vmap`` over batches.

Neighbor gathers (``take_along_axis``) plus masked reductions replace PyG's
scatter-add message passing; the dense [N, K] layout keeps the feature
matmuls MXU-shaped.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PaddedGraph:
    """A fixed-shape tissue graph (or batch of graphs with leading axis)."""

    x: jnp.ndarray          # [..., N, F] float
    pos: jnp.ndarray        # [..., N, 2] float
    nbr_idx: jnp.ndarray    # [..., N, K] int32
    nbr_mask: jnp.ndarray   # [..., N, K] bool
    edge_attr: jnp.ndarray  # [..., N, K, E] float
    node_mask: jnp.ndarray  # [..., N] bool
    y: Optional[jnp.ndarray] = None  # [...] or [..., T] labels/targets

    @property
    def num_nodes(self) -> int:
        return self.x.shape[-2]

    @property
    def max_neighbors(self) -> int:
        return self.nbr_idx.shape[-1]

    @property
    def feature_dim(self) -> int:
        return self.x.shape[-1]

    @property
    def n_real_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask.astype(jnp.int32), axis=-1)

    def replace_features(self, x: jnp.ndarray) -> "PaddedGraph":
        return self.replace(x=x)


def neighbor_onehot(nbr_idx: jnp.ndarray, n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """One-hot neighbor selector [..., N, K, N]; fuses into MXU einsums."""
    return (nbr_idx[..., None] == jnp.arange(n, dtype=nbr_idx.dtype)).astype(dtype)


def weighted_adjacency(nbr_idx: jnp.ndarray, weight: jnp.ndarray,
                       n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dense weighted adjacency: ``A[..., n, m] = Σ_k w[..., n, k]·[idx==m]``.

    Built as a fused compare·multiply·reduce over k — only the [..., N, N]
    result hits HBM, never the [..., N, K, N] selector (1.6 GB at
    batch 32 × 1024 nodes bf16, vs 64 MB for A). ``A @ h`` then aggregates
    messages as one MXU matmul per layer.
    """
    sel = nbr_idx[..., None] == jnp.arange(n, dtype=nbr_idx.dtype)
    contrib = jnp.where(sel, weight[..., None].astype(jnp.float32), 0.0)
    return jnp.sum(contrib, axis=-2).astype(dtype)


def resolve_gather_impl() -> str:
    """``auto`` gather policy: one-hot MXU matmuls on TPU-class backends,
    plain ``take_along_axis`` elsewhere.

    The TPU check must accept ``axon`` — the tunneled chip registers under
    that backend name, and an ``== "tpu"`` equality silently routed it to
    XLA gathers, which execute ~60x slower than the one-hot matmuls at DGDM
    geometries (fetch-synced whole-step A/B, ADR-0004 addendum 2: 2694 ms vs
    45 ms per batch-4 pretrain step). CPU *and GPU* keep take_along_axis:
    XLA gathers are fast on GPU and the dense [B,N,K,N] selector /[B,N,N]
    adjacency intermediates (~268 MB bf16 at batch 32, N=2048) would regress
    memory and speed there — the one-hot win was measured only on TPU.
    """
    return "onehot" if jax.default_backend() in ("tpu", "axon") else "take"


def resolve_key_gather_impl(n: int, k: int, f: int,
                            dtype_bytes: int = 2) -> str:
    """Key-gather policy for ``DynamicGraphLayer`` (static, trace-time).

    ``onehot`` on TPU backends, ``take`` elsewhere — the same policy as
    :func:`resolve_gather_impl`. The Pallas ``gather_rows`` kernel
    (VMEM-resident one-hot tiles) measured 31% SLOWER whole-step than the
    XLA one-hot einsum (85.6 vs 65.3 ms, batch-32 Base, paired idle-host
    A/B — ADR-0004 addendum 7): the executable's temp allocation shows XLA
    never materializes the [B,N,K,N] selector in the first place, and a
    gather-stubbed ablation put the key gather's whole-step cost near zero.
    The kernel stays an explicit opt-in (``gather_impl='pallas'``) for
    future geometries.
    """
    if jax.default_backend() in ("tpu", "axon"):
        return "onehot"
    return "take"


def gather_neighbors(x: jnp.ndarray, nbr_idx: jnp.ndarray,
                     impl: str = "auto") -> jnp.ndarray:
    """Gather neighbor features with arbitrary leading batch axes.

    x [..., N, F], nbr_idx [..., N, K] -> [..., N, K, F].

    ``impl``:
      * ``"onehot"`` — the gather as an MXU matmul against a fused one-hot
        selector. Measured on TPU v5e at [4,1024,24,128]: 3.4 ms vs 152.6 ms
        for the take_along_axis lowering (benchmarks/bench_gather.py) — XLA's
        TPU gather walks rows serially while the MXU eats the equivalent
        matmul. Costs O(N·K·N·F) FLOPs, a bargain below ~4k nodes.
      * ``"pallas_rows"`` — same MXU math, but the one-hot tiles are built
        in VMEM by the ``ops.pallas.gather_rows`` kernel, so the [N,K,N]
        selector never touches HBM (falls back to ``auto`` when shapes are
        ineligible or the input isn't [B, N, F]).
      * ``"take"`` — the take_along_axis lowering (fast on CPU).
      * ``"auto"`` — onehot on TPU backends, take elsewhere.
    """
    *batch, n, f = x.shape
    k = nbr_idx.shape[-1]
    if impl == "pallas_rows":
        from .pallas.gather_rows import eligible, gather_rows
        if len(batch) == 1 and eligible(n, k, f, x.dtype.itemsize):
            return gather_rows(x, nbr_idx)
        impl = "auto"
    if impl == "auto":
        impl = resolve_gather_impl()
    if impl == "onehot":
        sel = neighbor_onehot(nbr_idx, n, x.dtype)
        return jnp.einsum("...nkm,...mf->...nkf", sel, x)
    flat_idx = nbr_idx.reshape(*batch, n * k)
    gathered = jnp.take_along_axis(
        x, jnp.broadcast_to(flat_idx[..., None], (*batch, n * k, f)), axis=-2
    )
    return gathered.reshape(*batch, n, k, f)


def gather_scalar(values: jnp.ndarray, nbr_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-node scalars: values [..., N], nbr_idx [..., N, K] -> [..., N, K]."""
    *batch, n = values.shape
    k = nbr_idx.shape[-1]
    flat = jnp.take_along_axis(values, nbr_idx.reshape(*batch, n * k), axis=-1)
    return flat.reshape(*batch, n, k)


def masked_neighbor_sum(messages: jnp.ndarray, nbr_mask: jnp.ndarray) -> jnp.ndarray:
    """Sum messages [N, K, F] over valid neighbor slots -> [N, F]."""
    return jnp.sum(messages * nbr_mask[..., None].astype(messages.dtype), axis=-2)


def masked_neighbor_mean(messages: jnp.ndarray, nbr_mask: jnp.ndarray) -> jnp.ndarray:
    count = jnp.sum(nbr_mask.astype(messages.dtype), axis=-1, keepdims=True)
    return masked_neighbor_sum(messages, nbr_mask) / jnp.maximum(count, 1.0)


def degrees(nbr_mask: jnp.ndarray, add_self_loops: bool = True) -> jnp.ndarray:
    """In-degree per node from the neighbor mask; [N]."""
    deg = jnp.sum(nbr_mask.astype(jnp.float32), axis=-1)
    if add_self_loops:
        deg = deg + 1.0
    return deg


def symmetric_norm(nbr_idx: jnp.ndarray, nbr_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GCN symmetric normalization 1/sqrt(d_i d_j) per neighbor slot.

    Matches the normalization of the reference's ``GraphConvolution``
    (reference ``core/graph_layers.py:76-84``) on the dense neighbor layout.
    Returns (edge_norm [N, K], self_norm [N]).
    """
    deg = degrees(nbr_mask, add_self_loops=True)            # [..., N]
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    nbr_inv = gather_scalar(inv_sqrt, nbr_idx)              # [..., N, K]
    edge_norm = inv_sqrt[..., :, None] * nbr_inv * nbr_mask.astype(inv_sqrt.dtype)
    self_norm = inv_sqrt * inv_sqrt                          # self-loop term
    return edge_norm, self_norm


# ---------------------------------------------------------------------------
# Banded (Morton-window) message passing
#
# With nodes in spatial-sort (Morton) order split into nb = N/W contiguous
# blocks, a node in block b may address neighbors in blocks [b-1, b+1] — the
# same ±1-block band the windowed SpatialAttention uses (ADR-0004 add.9).
# The dense [N, N] weighted adjacency then becomes [nb, W, 3W] and message
# aggregation costs N·3W·F MACs instead of N²·F. Out-of-band neighbor slots
# are masked off (and excluded from the degree normalization), so the banded
# layer computes EXACTLY the dense layer on the band-pruned graph; pair with
# ``TissueGraphBuilder(spatial_sort=True, knn_window=...)`` to build graphs
# whose edges are all in-band by construction.
# ---------------------------------------------------------------------------

def band_eligible(n: int, window: Optional[int]) -> bool:
    """Banded layout applies when the bucket splits into >= 3 whole blocks."""
    return (window is not None and window > 0 and n % window == 0
            and n // window >= 3)


def banded_relative_neighbors(nbr_idx: jnp.ndarray, nbr_mask: jnp.ndarray,
                              window: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute neighbor indices -> band-relative indices.

    nbr_idx/nbr_mask [..., N, K] -> (rel_idx [..., N, K] in [0, 3W),
    in_band [..., N, K]). Node i in block b = i // W addresses the widened
    key range [(b-1)·W, (b+2)·W); a neighbor outside it gets rel 0 and
    in_band False (edge dropped). ``in_band`` is already ANDed with
    ``nbr_mask``.
    """
    n = nbr_idx.shape[-2]
    base = ((jnp.arange(n, dtype=nbr_idx.dtype) // window) - 1) * window
    rel = nbr_idx - base[:, None]
    ok = (rel >= 0) & (rel < 3 * window) & nbr_mask
    return jnp.where(ok, rel, 0).astype(nbr_idx.dtype), ok


def band_widen(t: jnp.ndarray, window: int) -> jnp.ndarray:
    """[..., N, F] -> [..., nb, 3W, F]: each block's previous + own + next
    block along the node order. The ends roll-wrap, but wrapped rows are
    unaddressable: relative indices from ``banded_relative_neighbors`` can
    never land on them (block 0's prev slots would need a negative absolute
    index, block nb-1's next slots one >= N)."""
    *lead, n, f = t.shape
    nb = n // window
    b = t.reshape(*lead, nb, window, f)
    ax = len(lead)
    return jnp.concatenate(
        [jnp.roll(b, 1, axis=ax), b, jnp.roll(b, -1, axis=ax)], axis=ax + 1)


def banded_weighted_adjacency(rel_idx: jnp.ndarray, weight: jnp.ndarray,
                              window: int,
                              dtype=jnp.bfloat16) -> jnp.ndarray:
    """Banded analogue of :func:`weighted_adjacency`.

    A[..., b, i, m] = Σ_k weight[..., bW+i, k] · [rel_idx[..., bW+i, k] == m]
    with m over the 3W widened key slots. Same fused compare·multiply·reduce
    build — only the [..., nb, W, 3W] result hits HBM (3W/N of the dense
    adjacency's footprint).
    """
    *lead, n, k = rel_idx.shape
    nb = n // window
    r = rel_idx.reshape(*lead, nb, window, k)
    w = weight.reshape(*lead, nb, window, k)
    sel = r[..., None] == jnp.arange(3 * window, dtype=rel_idx.dtype)
    contrib = jnp.where(sel, w[..., None].astype(jnp.float32), 0.0)
    return jnp.sum(contrib, axis=-2).astype(dtype)


def banded_conv_agg(adj_band: jnp.ndarray, h: jnp.ndarray,
                    window: int) -> jnp.ndarray:
    """Aggregate messages with a banded adjacency:
    [..., nb, W, 3W] @ band_widen(h) -> [..., N, F]."""
    *lead, n, f = h.shape
    hb = band_widen(h, window)
    out = jnp.einsum("...bwm,...bmf->...bwf", adj_band, hb.astype(adj_band.dtype))
    return out.reshape(*lead, n, f)


def banded_gather_neighbors(x: jnp.ndarray, rel_idx: jnp.ndarray,
                            window: int) -> jnp.ndarray:
    """Banded one-hot neighbor gather: x [..., N, F], rel_idx [..., N, K]
    (from :func:`banded_relative_neighbors`) -> [..., N, K, F]. The one-hot
    contraction runs over the 3W widened keys instead of all N."""
    *lead, n, f = x.shape
    k = rel_idx.shape[-1]
    nb = n // window
    xb = band_widen(x, window)
    r = rel_idx.reshape(*lead, nb, window, k)
    sel = (r[..., None] == jnp.arange(3 * window, dtype=rel_idx.dtype)
           ).astype(x.dtype)
    out = jnp.einsum("...bwkm,...bmf->...bwkf", sel, xb)
    return out.reshape(*lead, n, k, f)


def in_band_fraction(nbr_idx, nbr_mask, window: int) -> float:
    """Host diagnostic: fraction of real edges a banded model can address.

    1.0 means banded compute is exact on this graph (guaranteed when it was
    built with ``TissueGraphBuilder(knn_window=window)``); lower values
    quantify the edges an unconstrained graph would lose to band pruning.
    """
    idx = np.asarray(nbr_idx)
    m = np.asarray(nbr_mask, bool)
    n = idx.shape[-2]
    base = (np.arange(n) // window - 1) * window
    rel = idx - base[:, None]
    ok = (rel >= 0) & (rel < 3 * window) & m
    return float(ok.sum() / max(m.sum(), 1))


def compact_top_k_nodes(
    x: jnp.ndarray,          # [..., N, F]
    nbr_idx: jnp.ndarray,    # [..., N, K]
    nbr_mask: jnp.ndarray,   # [..., N, K]
    node_mask: jnp.ndarray,  # [..., N]
    score: jnp.ndarray,      # [..., N] f32, higher = keep
    keep: int,
    edge_attr: Optional[jnp.ndarray] = None,   # [..., N, K, E]
):
    """Physically shrink a padded graph to its top-``keep`` nodes.

    The static output size (``keep = ceil(ratio*N)``) is what lets pooled
    U-Net levels run on genuinely smaller tensors instead of re-masked
    full-size ones (reference ``AdaptiveGraphPooling`` rebuilds the edge
    index over the surviving nodes, ``core/graph_layers.py:250-329``; the
    round-2 re-masking formulation paid full-N compute at every level AND
    deviated from the reference's unpool-by-scatter: dropped rows leaked
    bias-propagated values instead of zeros).

    Returns dict with compacted ``x, nbr_idx, nbr_mask, node_mask,
    edge_attr`` and ``sel_idx [..., keep]`` (original node ids, for
    :func:`scatter_nodes` unpooling). Padding/dropped slots select node 0
    with ``node_mask`` False.
    """
    n = x.shape[-2]
    k = nbr_idx.shape[-1]
    neg = jnp.finfo(jnp.float32).min
    masked_score = jnp.where(node_mask, score.astype(jnp.float32), neg)
    # take the top-keep by score; argsort is descending via negation
    sel_idx = jnp.argsort(-masked_score, axis=-1)[..., :keep]     # [..., keep]
    sel_valid = jnp.take_along_axis(node_mask, sel_idx, axis=-1)  # [..., keep]

    # one-hot selection matrix [.., keep, N]: every ROW gather below rides
    # the MXU as a matmul — the naive take_along_axis formulation of this
    # function measured a 2x whole-step regression on the axon backend
    # (XLA vector gathers execute ~60x slower there, ADR-0004 addendum 2/5)
    onehot = sel_idx[..., :, None] == jnp.arange(n)               # [.., keep, N]
    sel_f32 = onehot.astype(jnp.float32)

    # inverse map: orig id -> compact slot (or `keep` when dropped)
    slot = jnp.arange(keep, dtype=jnp.int32)[..., :, None]
    inv = jnp.sum(jnp.where(onehot, slot, 0), axis=-2).astype(jnp.int32)
    in_sel = jnp.any(onehot, axis=-2)                             # [.., N]
    inv = jnp.where(in_sel, inv, keep)                            # sentinel

    # neighbor rows of surviving nodes (exact small-int matmuls), then ids
    # remapped through inv via a scalar flat gather (the [.., keep*K] class
    # of gather the fast step already uses in symmetric_norm)
    nbr_rows = jnp.einsum("...sn,...nk->...sk", sel_f32,
                          nbr_idx.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST
                          ).astype(jnp.int32)                     # [.., keep, K]
    mask_rows = jnp.einsum("...sn,...nk->...sk", sel_f32,
                           nbr_mask.astype(jnp.float32)) > 0.5
    batch = nbr_rows.shape[:-2]
    new_ids = jnp.take_along_axis(
        inv, nbr_rows.reshape(*batch, keep * k), axis=-1
    ).reshape(*batch, keep, k)                                    # [.., keep, K]
    survives = new_ids < keep
    new_mask = mask_rows & survives & sel_valid[..., None]
    new_ids = jnp.where(new_mask, new_ids, 0)

    x_c = jnp.einsum("...sn,...nf->...sf", sel_f32.astype(x.dtype), x)
    x_c = x_c * sel_valid[..., None].astype(x.dtype)
    out = {
        "x": x_c, "nbr_idx": new_ids, "nbr_mask": new_mask,
        "node_mask": sel_valid, "sel_idx": sel_idx, "edge_attr": None,
    }
    if edge_attr is not None:
        ea_rows = jnp.einsum("...sn,...nke->...ske",
                             sel_f32.astype(edge_attr.dtype), edge_attr)
        out["edge_attr"] = ea_rows * new_mask[..., None].astype(ea_rows.dtype)
    return out


def scatter_nodes(h_small: jnp.ndarray, sel_idx: jnp.ndarray, n: int,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Unpool: place compacted rows back at their original slots (zeros
    elsewhere) — the reference's unpool-by-scatter (`core/graph_layers.py`
    GraphUNet) as a one-hot MXU matmul. h_small [..., keep, F],
    sel_idx [..., keep] -> [..., n, F]."""
    onehot = (sel_idx[..., :, None] == jnp.arange(n)).astype(h_small.dtype)
    if valid is not None:
        onehot = onehot * valid[..., None].astype(h_small.dtype)
    return jnp.einsum("...kn,...kf->...nf", onehot, h_small)


def masked_global_mean(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over real nodes: x [N, F], mask [N] -> [F]."""
    m = node_mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=-2)
    count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return total / count


def masked_global_max(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    neg = jnp.finfo(x.dtype).min
    masked = jnp.where(node_mask[..., None], x, neg)
    return jnp.max(masked, axis=-2)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax that zeroes masked entries.

    Fully-masked rows return all-zeros rather than NaN.
    """
    neg = jnp.finfo(logits.dtype).min
    masked_logits = jnp.where(mask, logits, neg)
    maxes = jnp.max(masked_logits, axis=axis, keepdims=True)
    # guard fully-masked rows: max would be `neg`, exp(neg - neg) = 1; mask after.
    unnorm = jnp.exp(masked_logits - jax.lax.stop_gradient(maxes))
    unnorm = unnorm * mask.astype(unnorm.dtype)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, jnp.asarray(1e-20, unnorm.dtype))


# ---------------------------------------------------------------------------
# Construction / conversion helpers (host-side, numpy)
# ---------------------------------------------------------------------------

def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (last bucket if n exceeds all; caller subsamples)."""
    for b in buckets:
        if n <= b:
            return int(b)
    return int(buckets[-1])


def build_padded_graph(
    x: np.ndarray,
    pos: np.ndarray,
    nbr_idx: np.ndarray,
    nbr_dist_or_attr: np.ndarray,
    nbr_mask: np.ndarray,
    bucket: Optional[int] = None,
    y: Optional[np.ndarray] = None,
) -> PaddedGraph:
    """Pad host-side graph arrays up to ``bucket`` nodes."""
    n, f = x.shape
    k = nbr_idx.shape[1]
    e = nbr_dist_or_attr.shape[-1] if nbr_dist_or_attr.ndim == 3 else 1
    attr = nbr_dist_or_attr.reshape(n, k, e)
    target = int(bucket) if bucket is not None else n
    if n > target:
        raise ValueError(f"graph has {n} nodes, exceeds bucket {target}")
    pad = target - n
    xp = np.pad(x.astype(np.float32), ((0, pad), (0, 0)))
    posp = np.pad(pos.astype(np.float32), ((0, pad), (0, 0)))
    idxp = np.pad(nbr_idx.astype(np.int32), ((0, pad), (0, 0)))
    maskp = np.pad(nbr_mask.astype(bool), ((0, pad), (0, 0)))
    attrp = np.pad(attr.astype(np.float32), ((0, pad), (0, 0), (0, 0)))
    node_mask = np.zeros((target,), dtype=bool)
    node_mask[:n] = True
    return PaddedGraph(
        x=jnp.asarray(xp), pos=jnp.asarray(posp), nbr_idx=jnp.asarray(idxp),
        nbr_mask=jnp.asarray(maskp), edge_attr=jnp.asarray(attrp),
        node_mask=jnp.asarray(node_mask),
        y=None if y is None else jnp.asarray(y),
    )


def from_edge_index(
    x: np.ndarray,
    edge_index: np.ndarray,
    pos: Optional[np.ndarray] = None,
    edge_attr: Optional[np.ndarray] = None,
    max_neighbors: int = 16,
    bucket: Optional[int] = None,
    y: Optional[np.ndarray] = None,
) -> PaddedGraph:
    """Convert a COO edge list (the reference's on-disk format) to PaddedGraph.

    ``edge_index`` is [2, E] with rows (src, dst); incoming edges of node i are
    those with dst == i, truncated to ``max_neighbors`` — highest-weight first
    when ``edge_attr`` is present (weight = last attr column, matching the
    builder's [dist, weight] / [sim] layouts), else input order. Without the
    weight sort, strong edges of high-degree nodes would be silently dropped
    when converting reference COO graphs (ADVICE r1).
    """
    n = x.shape[0]
    e_dim = 1 if edge_attr is None else (edge_attr.shape[1] if edge_attr.ndim == 2 else 1)
    nbr_idx = np.zeros((n, max_neighbors), dtype=np.int32)
    nbr_mask = np.zeros((n, max_neighbors), dtype=bool)
    attr = np.zeros((n, max_neighbors, e_dim), dtype=np.float32)
    if edge_index.size:
        src, dst = edge_index[0], edge_index[1]
        n_edges = src.shape[0]
        ea = None
        if edge_attr is not None and edge_attr.shape[0] == n_edges:
            ea = edge_attr.reshape(n_edges, -1)
        if ea is not None:
            # sort by (dst asc, weight desc) so per-node truncation keeps the
            # strongest incoming edges
            order = np.lexsort((-ea[:, -1], dst))
        else:
            order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        if ea is not None:
            ea = ea[order]
        # vectorized per-node truncation (VERDICT r2 weak #6 — no O(N)
        # Python loop): each edge's rank within its dst group is its slot;
        # edges ranked past max_neighbors drop
        starts = np.searchsorted(dst, np.arange(n), side="left")
        rank = np.arange(n_edges) - starts[dst]
        keep = rank < max_neighbors
        d_k, r_k = dst[keep], rank[keep]
        nbr_idx[d_k, r_k] = src[keep]
        nbr_mask[d_k, r_k] = True
        if ea is not None:
            attr[d_k, r_k, : ea.shape[1]] = ea[keep]
    if pos is None:
        pos = np.zeros((n, 2), dtype=np.float32)
    return build_padded_graph(x, pos, nbr_idx, attr, nbr_mask, bucket=bucket, y=y)


def batch_graphs(graphs: Sequence[PaddedGraph]) -> PaddedGraph:
    """Stack same-bucket graphs into a batched PaddedGraph (leading B axis)."""
    if not graphs:
        raise ValueError("cannot batch zero graphs")
    n = graphs[0].num_nodes
    k = graphs[0].max_neighbors
    for g in graphs:
        if g.num_nodes != n or g.max_neighbors != k:
            raise ValueError("all graphs in a batch must share the same bucket shape")
    stack = lambda getter: jnp.stack([getter(g) for g in graphs], axis=0)
    ys = [g.y for g in graphs]
    y = None if any(v is None for v in ys) else jnp.stack(ys, axis=0)
    return PaddedGraph(
        x=stack(lambda g: g.x), pos=stack(lambda g: g.pos),
        nbr_idx=stack(lambda g: g.nbr_idx), nbr_mask=stack(lambda g: g.nbr_mask),
        edge_attr=stack(lambda g: g.edge_attr), node_mask=stack(lambda g: g.node_mask),
        y=y,
    )
