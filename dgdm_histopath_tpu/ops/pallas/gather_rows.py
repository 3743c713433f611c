"""Neighbor ROW gather as a tiled one-hot MXU kernel (no HBM selector).

``out[b, n, k, :] = src[b, idx[b, n, k], :]`` — the key gather of every
``DynamicGraphLayer`` (``nn/graph_layers.py``; reference per-edge attention
``core/graph_layers.py:160-205``). Built to test the hypothesis that the
XLA one-hot formulation materializes the ``[B, N, K, N]`` selector in HBM
(1.6 GB bf16 at batch 32 × 1024 nodes × K=24). Measurement REFUTED it:
XLA never materializes the selector, the key gather costs ~0.1 ms
whole-step, and this kernel runs 31% slower than the XLA path at Base
geometry (ADR-0004 addendum 7) — so it stays an explicit
``gather_impl='pallas'`` opt-in for future geometries, not the default.

Here the one-hot tiles only ever exist in VMEM:

  forward   grid (B, N/TILE_N): per node-tile, loop source tiles S —
            m[n, k, s] = (idx - base == s)           (VPU, in VMEM)
            acc[n, k, :] += m · src[S]               (MXU dot_general)
            HBM traffic per graph: src once + out once (≈ 7 MB vs 3.2 GB).
  backward  grid (B, N/TILE_N) revisiting one [N, F] accumulator block:
            selᵀ[m, (n,k)] = (idx == m)              (VPU, in VMEM)
            dsrc[m, :]    += selᵀ · g[n-tile]        (MXU)
            HBM per graph: g once + dsrc once.

MXU FLOPs are identical to the XLA one-hot path — the win is pure HBM
traffic. Output is exact (each row is a copy, not a true sum: bf16
accumulation only ever adds zeros), verified bit-equal against
``take_along_axis`` in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128   # node rows per forward grid step
TILE_S = 128   # source rows per inner accumulation step
# VMEM budget gate (bytes): src block + out block + one-hot temp, double
# buffered. Above this the caller should fall back to the XLA path.
VMEM_BUDGET = 12 * 2 ** 20


def eligible(n: int, k: int, f: int, dtype_bytes: int = 2) -> bool:
    """True when shapes tile cleanly and fit the VMEM budget."""
    if n % TILE_N or n % TILE_S:
        return False
    src = n * f * dtype_bytes
    out = TILE_N * k * f * dtype_bytes
    onehot = TILE_N * k * TILE_S * dtype_bytes
    return 2 * (src + out + onehot) < VMEM_BUDGET


def _fwd_kernel(idx_ref, src_ref, out_ref):
    idx = idx_ref[:]                                   # [TILE_N, K] int32
    tile_n, k = idx.shape
    n_src = src_ref.shape[0]
    f = src_ref.shape[-1]
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(s, _):
        base = s * TILE_S
        local = idx - base
        hit = (local >= 0) & (local < TILE_S)

        @pl.when(jnp.any(hit))
        def _():
            # NB: no explicit `hit` mask — local values outside [0, TILE_S)
            # can never equal an in-range iota, and Mosaic rejects minor-dim
            # insertion on i1 (`hit[..., None]`)
            j = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k, TILE_S), 2)
            m = (local[..., None] == j).astype(src_ref.dtype)
            src_s = src_ref[pl.ds(base, TILE_S), :]
            # collapse (n, k) -> one [128·K, S] · [S, F] MXU matmul (lane
            # dims S and F both 128-clean)
            part = jnp.dot(m.reshape(tile_n * k, TILE_S), src_s,
                           preferred_element_type=jnp.float32)
            out_ref[:] += part.reshape(tile_n, k, f).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_src // TILE_S, body, 0)


def _bwd_kernel(idx_ref, g_ref, dsrc_ref):
    """Accumulates d(src) for ONE node-tile into the full [N, F] block.

    The dsrc out_spec maps every node-tile grid step of a graph to the same
    block; Pallas keeps it resident in VMEM across revisits, so the
    accumulation never round-trips HBM.
    """
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        dsrc_ref[:] = jnp.zeros_like(dsrc_ref)

    idx = idx_ref[:]                                   # [TILE_N, K]
    tile_n, k = idx.shape
    f = g_ref.shape[-1]
    g2 = g_ref[:].reshape(tile_n * k, f)               # [128·K, F]
    n_src = dsrc_ref.shape[0]

    def body(s, _):
        base = s * TILE_S
        local = idx - base
        hit = (local >= 0) & (local < TILE_S)

        @pl.when(jnp.any(hit))
        def _():
            # same one-hot tile as the forward (out-of-range local values
            # match no iota, so no i1 minor-dim mask is needed); contracting
            # its LEADING (n·k) dim against g gives the scatter-transpose
            j = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k, TILE_S), 2)
            m = (local[..., None] == j).astype(g2.dtype)
            # [128·K, S]ᵀ · [128·K, F] -> [S, F]
            part = jax.lax.dot_general(
                m.reshape(tile_n * k, TILE_S), g2,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cur = dsrc_ref[pl.ds(base, TILE_S), :]
            dsrc_ref[pl.ds(base, TILE_S), :] = cur + part.astype(
                dsrc_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_src // TILE_S, body, 0)


def _interpret_default() -> bool:
    # Mosaic only exists on TPU-class backends; CPU tests interpret
    return jax.default_backend() not in ("tpu", "axon")


def _fwd_pallas(src: jnp.ndarray, idx: jnp.ndarray, interpret=None
                ) -> jnp.ndarray:
    if interpret is None:
        interpret = _interpret_default()
    b, n, f = src.shape
    k = idx.shape[-1]
    grid = (b, n // TILE_N)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TILE_N, k), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((None, n, f), lambda bi, ti: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, TILE_N, k, f),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, k, f), src.dtype),
        interpret=interpret,
    )(idx, src)


def _bwd_pallas(idx: jnp.ndarray, g: jnp.ndarray, n: int, dtype,
                interpret=None) -> jnp.ndarray:
    if interpret is None:
        interpret = _interpret_default()
    b, _, k, f = g.shape
    grid = (b, n // TILE_N)
    dsrc = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TILE_N, k), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((None, TILE_N, k, f),
                         lambda bi, ti: (bi, ti, 0, 0)),
        ],
        # every node-tile revisits the graph's single [N, F] accumulator
        out_specs=pl.BlockSpec((None, n, f), lambda bi, ti: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        interpret=interpret,
    )(idx, g.astype(dtype))
    return dsrc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(src: jnp.ndarray, idx: jnp.ndarray, interpret=None
                ) -> jnp.ndarray:
    """``out[b, n, k] = src[b, idx[b, n, k]]`` with VMEM-resident one-hot
    tiles in both directions. src [B, N, F], idx [B, N, K] -> [B, N, K, F].

    Caller must pre-check :func:`eligible`; use ``gather_neighbors`` for the
    general fallback.
    """
    return _fwd_pallas(src, idx, interpret=interpret)


def _vjp_fwd(src, idx, interpret=None):
    # residuals must be JAX types: src's n and dtype are recoverable from
    # the cotangent (out[b, n, k, f] shares n and dtype with src)
    return _fwd_pallas(src, idx, interpret=interpret), idx


def _vjp_bwd(interpret, idx, g):
    dsrc = _bwd_pallas(idx, g, g.shape[1], g.dtype, interpret=interpret)
    return dsrc.astype(g.dtype), None


gather_rows.defvjp(_vjp_fwd, _vjp_bwd)
