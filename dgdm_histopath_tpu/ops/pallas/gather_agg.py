"""Fused weighted neighbor aggregation as a tiled one-hot MXU kernel.

Computes ``out[b, n, :] = sum_k w[b, n, k] * h[b, idx[b, n, k], :]`` — the
inner op of every ``GraphConvolution`` message pass (three per
``DynamicGraphLayer``; reference hot loop SURVEY §3.2). The XLA path
materializes the gathered ``[B, N, K, F]`` tensor in HBM; here the per-graph
feature matrix ``h`` (≤4096×128 bf16 = 1 MB) stays resident in VMEM and the
gather becomes 128×128 MXU matmuls against on-the-fly one-hot tiles — no
``[N, K, F]`` intermediate ever exists.

Per (node-tile T, source-tile S) step:
  hit/local = idx in [S·TS, S·TS+TS)
  A[i, j]   = sum_k w[i, k] · (local[i, k] == j)        (VPU, in VMEM)
  acc_T    += A @ h_S                                    (MXU)
Source tiles with no hits are skipped (`@pl.when`) — spatial kNN indices are
raster-local, so most (T, S) pairs are empty.

Forward-only: the training path wires this through ``jax.custom_vjp`` with
an XLA backward (see ``weighted_gather_sum``'s vjp below) so autodiff works
while the forward takes the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128   # node-tile rows per grid step
TILE_S = 128   # source-tile rows per inner step


def _kernel(idx_ref, w_ref, h_ref, out_ref):
    idx = idx_ref[:]                       # [TILE_N, K] int32
    w = w_ref[:].astype(jnp.float32)       # [TILE_N, K]
    n_src = h_ref.shape[0]
    n_tiles = n_src // TILE_S
    tile_n, k = idx.shape

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(s, _):
        base = s * TILE_S
        local = idx - base
        hit = (local >= 0) & (local < TILE_S)             # [TILE_N, K]

        @pl.when(jnp.any(hit))
        def _():
            j = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k, TILE_S), 2)
            m = (local[..., None] == j) & hit[..., None]
            a = jnp.sum(w[..., None] * m.astype(jnp.float32), axis=1)
            h_s = h_ref[pl.ds(base, TILE_S), :].astype(jnp.float32)
            out_ref[:] += jnp.dot(a, h_s,
                                  preferred_element_type=jnp.float32
                                  ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)


def _fwd_pallas(h: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                interpret=None) -> jnp.ndarray:
    if interpret is None:
        # Mosaic only exists on TPU; tests on the CPU mesh use the
        # interpreter automatically
        interpret = jax.default_backend() != "tpu"
    b, n, f = h.shape
    k = idx.shape[-1]
    if n % TILE_N or n % TILE_S:
        raise ValueError(f"nodes ({n}) must tile by {TILE_N}")
    grid = (b, n // TILE_N)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, TILE_N, k), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((None, TILE_N, k), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((None, n, f), lambda bi, ti: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, TILE_N, f), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        interpret=interpret,
    )(idx, w, h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def weighted_gather_sum(h: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                        interpret=None) -> jnp.ndarray:
    """``out[b,n] = Σ_k w[b,n,k] · h[b, idx[b,n,k]]`` with a fused Pallas
    forward (one-hot MXU) and an XLA backward. [B, N, F] float32 out."""
    return _fwd_pallas(h, idx, w, interpret=interpret)


def _vjp_fwd(h, idx, w, interpret=None):
    return _fwd_pallas(h, idx, w, interpret=interpret), (h, idx, w)


def _vjp_bwd(interpret, res, g):
    h, idx, w = res
    b, n, f = h.shape
    k = idx.shape[-1]
    g = g.astype(jnp.float32)
    # dh[b, m] = Σ_{n,k: idx[b,n,k]=m} w[b,n,k] · g[b,n]  (scatter-add)
    flat_idx = idx.reshape(b, n * k)
    contrib = (w[..., None] * g[:, :, None, :]).reshape(b, n * k, f)
    dh = jnp.zeros((b, n, f), jnp.float32).at[
        jnp.arange(b)[:, None], flat_idx].add(contrib)
    # dw[b,n,k] = g[b,n] · h[b, idx[b,n,k]]
    gathered = jnp.take_along_axis(
        h.astype(jnp.float32), flat_idx[..., None], axis=-2
    ).reshape(b, n, k, f)
    dw = jnp.einsum("bnkf,bnf->bnk", gathered, g)
    return dh.astype(h.dtype), None, dw.astype(w.dtype)


weighted_gather_sum.defvjp(_vjp_fwd, _vjp_bwd)
