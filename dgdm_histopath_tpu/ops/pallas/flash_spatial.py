"""Pallas TPU kernel: flash-style masked attention with spatial distance bias.

This fuses the DGDM spatial-attention bottleneck (SURVEY §5.7: the dense
N×N distance-biased attention is the quadratic memory cap; reference
``core/attention.py:261-327``) into a single kernel:

  * never materializes the [N, N] score/weight matrices in HBM;
  * computes the pairwise-distance bias (−‖p_i − p_j‖ / τ) on the fly from
    the [N, 2] coordinates inside the kernel;
  * online-softmax accumulation in f32, tiles sized for the MXU;
  * K/V/coords stream block-by-block through the pipelined grid (innermost
    grid dimension), so VMEM holds only the current tiles + scratch — the
    kernel scales to any N without VMEM growth.

Layout: q/k/v are [B*H, N, D] (head-major). Grid: (BH, Nq_blocks,
Nk_blocks); online-softmax state (m, l, acc) lives in VMEM scratch and is
reset at the first K-block of each Q-row, with the output written at the
last K-block.

Hardware-verified numerics notes (see docs/adr/0003): the distance uses
per-component broadcast diffs on the VPU, not a coordinate matmul — any
|a|²+|b|²−2ab form cancels catastrophically for nearby points and the error
is amplified by exp(-dist/τ) into O(1e-3) output error (ADR-0004). The node
mask rides in lane 2 of the coordinate array so every input is a lane-tiled
f32 load (narrow int32 mask blocks mis-tile under Mosaic). Head dims below
128 are zero-padded to the lane tile by the wrapper (free on the MXU, exact).

The public wrapper routes through a custom VJP whose backward re-runs the
dense jnp reference (the forward is the inference-critical path; training
keeps full fidelity).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, qpos_ref, k_ref, v_ref, kpos_ref, o_ref,
                  m_ref, l_ref, acc_ref,
                  *, scale: float, inv_tau: float):
    """One (bh, q-block, k-block) program with scratch-carried softmax state.

    q_ref [bq, D]; qpos_ref [bq, 128] (lane 0 = x, 1 = y, 2 = validity);
    k_ref/v_ref [bk, D]; kpos_ref [bk, 128]; o_ref [bq, D].
    Scratch: m_ref/l_ref [bq, 128] f32 (lane-replicated), acc_ref [bq, D] f32.
    """
    j = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.float32) * scale                   # [bq, D]
    qpos = qpos_ref[:, 0:2].astype(jnp.float32)                # [bq, 2]
    k_blk = k_ref[:].astype(jnp.float32)                       # [bk, D]
    v_blk = v_ref[:].astype(jnp.float32)
    kpos = kpos_ref[:, 0:2].astype(jnp.float32)                # [bk, 2]
    kmask = kpos_ref[:, 2]                                     # [bk] f32 0/1

    scores = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
    # per-component broadcast diff (VPU): exact where the |a|²+|b|²−2ab
    # matmul form cancels catastrophically for nearby points — keeps
    # bit-level agreement with the dense path's formulation (ADR-0004)
    dx = qpos[:, 0:1] - kpos[:, 0:1].T                         # [bq, bk]
    dy = qpos[:, 1:2] - kpos[:, 1:2].T
    dist = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12))
    scores = scores - dist * inv_tau
    scores = jnp.where(kmask[None, :] > 0.5, scores, NEG_INF)

    m_prev = m_ref[:, 0:1]                                     # [bq, 1]
    l_prev = l_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    # fully-masked guard: exp(NEG_INF - NEG_INF) = 1 on masked slots
    p = p * (kmask[None, :] > 0.5).astype(jnp.float32)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, v_blk, preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_kb - 1)
    def _finalize():
        o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:, 0:1], 1e-20)
                    ).astype(o_ref.dtype)


def _flash_kernel_packed(q_ref, qpos_ref, k_ref, v_ref, kpos_ref, o_ref,
                         m_ref, l_ref, acc_ref,
                         *, scale: float, inv_tau: float,
                         num_heads: int, head_dim: int):
    """Packed-heads program: ALL heads ride one 128-lane tile.

    At DGDM geometry (8 heads × head_dim 16 = 128 lanes) the head-major
    kernel zero-pads each 16-lane head to the full tile — 8× DMA and VMEM
    waste that made dense win by >20× (ADR-0004). Here q/k/v blocks are
    [bq, H*D] with no padding; the distance bias is computed ONCE per
    (q-block, k-block) and shared by every head; per-head online-softmax
    state lives in lane h of the [bq, 128] m/l scratch.
    """
    j = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qpos = qpos_ref[:, 0:2].astype(jnp.float32)               # [bq, 2]
    kpos = kpos_ref[:, 0:2].astype(jnp.float32)               # [bk, 2]
    kmask = kpos_ref[:, 2]                                    # [bk] f32 0/1
    dx = qpos[:, 0:1] - kpos[:, 0:1].T                        # [bq, bk]
    dy = qpos[:, 1:2] - kpos[:, 1:2].T
    bias = -jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12)) * inv_tau
    valid = (kmask[None, :] > 0.5)

    q_all = q_ref[:].astype(jnp.float32) * scale              # [bq, H*D]
    k_all = k_ref[:].astype(jnp.float32)
    v_all = v_ref[:].astype(jnp.float32)

    for h in range(num_heads):                                # static unroll
        sl = slice(h * head_dim, (h + 1) * head_dim)
        scores = jnp.dot(q_all[:, sl], k_all[:, sl].T,
                         preferred_element_type=jnp.float32) + bias
        scores = jnp.where(valid, scores, NEG_INF)
        m_prev = m_ref[:, h:h + 1]
        l_prev = l_ref[:, h:h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new) * valid.astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, h:h + 1] = l_prev * alpha + jnp.sum(p, axis=-1,
                                                     keepdims=True)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + jnp.dot(
            p, v_all[:, sl], preferred_element_type=jnp.float32)
        m_ref[:, h:h + 1] = m_new

    @pl.when(j == num_kb - 1)
    def _finalize():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[:, sl] = (acc_ref[:, sl]
                            / jnp.maximum(l_ref[:, h:h + 1], 1e-20)
                            ).astype(o_ref.dtype)


def _packed_forward(q4, k4, v4, pos, node_mask, tau: float,
                    block_q: int, block_k: int, interpret: bool):
    """q4/k4/v4 [B, N, H, D] with H*D == 128 -> [B, N, H, D]."""
    b, n, h, d = q4.shape
    hd = h * d
    qf = q4.reshape(b, n, hd)
    kf = k4.reshape(b, n, hd)
    vf = v4.reshape(b, n, hd)
    pos_pad = jnp.concatenate(
        [pos.astype(jnp.float32),
         node_mask.astype(jnp.float32)[..., None],
         jnp.zeros((b, n, 125), jnp.float32)], axis=-1)
    grid = (b, n // block_q, n // block_k)
    kernel = functools.partial(_flash_kernel_packed,
                               scale=1.0 / math.sqrt(d), inv_tau=1.0 / tau,
                               num_heads=h, head_dim=d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, hd), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 128), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, hd), lambda b_, i, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, hd), lambda b_, i, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, 128), lambda b_, i, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, hd), lambda b_, i, j: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q4.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # per-head running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # per-head denom
            pltpu.VMEM((block_q, hd), jnp.float32),    # packed accumulator
        ],
        interpret=interpret,
    )(qf, pos_pad, kf, vf, pos_pad)
    return out.reshape(b, n, h, d)


def _dense_reference4(q4, k4, v4, pos, node_mask, tau):
    """Dense path on the [B, N, H, D] layout (packed backward)."""
    b, n, h, d = q4.shape
    to_flat = lambda a: a.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    posf = jnp.repeat(pos, h, axis=0)
    maskf = jnp.repeat(node_mask, h, axis=0)
    out = _dense_reference(to_flat(q4), to_flat(k4), to_flat(v4),
                           posf, maskf, tau)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_spatial_packed(q4, k4, v4, pos, node_mask, tau, block_q, block_k,
                          interpret):
    return _packed_forward(q4, k4, v4, pos, node_mask, tau, block_q, block_k,
                           interpret)


def _packed_fwd(q4, k4, v4, pos, node_mask, tau, block_q, block_k, interpret):
    out = _packed_forward(q4, k4, v4, pos, node_mask, tau, block_q, block_k,
                          interpret)
    return out, (q4, k4, v4, pos, node_mask)


def _packed_bwd(tau, block_q, block_k, interpret, residuals, g):
    q4, k4, v4, pos, node_mask = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _dense_reference4(q_, k_, v_, pos,
                                                          node_mask, tau),
                     q4, k4, v4)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(pos), None


_flash_spatial_packed.defvjp(_packed_fwd, _packed_bwd)


def _flash_forward(q, k, v, pos, node_mask, tau: float,
                   block_q: int, block_k: int, interpret: bool,
                   scale: Optional[float] = None):
    """q/k/v [BH, N, D]; pos [BH, N, 2]; node_mask [BH, N] -> [BH, N, D].

    ``scale`` is 1/sqrt(semantic head_dim) — supplied by the wrapper when
    lane padding widened D."""
    bh, n, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # coords + validity packed into one lane-tiled array:
    # lane 0 = x, lane 1 = y, lane 2 = mask, lanes 3.. zero
    pos_pad = jnp.concatenate(
        [pos.astype(jnp.float32),
         node_mask.astype(jnp.float32)[..., None],
         jnp.zeros((bh, n, 125), jnp.float32)], axis=-1)
    grid = (bh, n // block_q, n // block_k)

    kernel = functools.partial(_flash_kernel, scale=scale, inv_tau=1.0 / tau)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),      # q block
            pl.BlockSpec((None, block_q, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),      # q-block coords
            pl.BlockSpec((None, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),      # streamed k block
            pl.BlockSpec((None, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),      # streamed v block
            pl.BlockSpec((None, block_k, 128), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),      # streamed k coords+mask
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),    # running max (lane-rep)
            pltpu.VMEM((block_q, 128), jnp.float32),    # running denom
            pltpu.VMEM((block_q, d), jnp.float32),      # output accumulator
        ],
        interpret=interpret,
    )(q, pos_pad, k, v, pos_pad)


def _dense_reference(q, k, v, pos, node_mask, tau, scale=None):
    """jnp reference path (also the backward)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
    scores = scores - dist / tau
    scores = jnp.where(node_mask[:, None, :], scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", w, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_spatial(q, k, v, pos, node_mask, tau, block_q, block_k, interpret,
                   scale):
    return _flash_forward(q, k, v, pos, node_mask, tau, block_q, block_k,
                          interpret, scale)


def _fwd(q, k, v, pos, node_mask, tau, block_q, block_k, interpret, scale):
    out = _flash_forward(q, k, v, pos, node_mask, tau, block_q, block_k,
                         interpret, scale)
    return out, (q, k, v, pos, node_mask)


def _bwd(tau, block_q, block_k, interpret, scale, residuals, g):
    q, k, v, pos, node_mask = residuals
    # recompute through the dense path for exact gradients (padded lanes are
    # zeros, so the dense recompute over padded arrays matches at this scale)
    _, vjp = jax.vjp(lambda q_, k_, v_: _dense_reference(q_, k_, v_, pos,
                                                         node_mask, tau,
                                                         scale=scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(pos), None


_flash_spatial.defvjp(_fwd, _bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def flash_spatial_attention(
    q: jnp.ndarray,          # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos: jnp.ndarray,        # [B, N, 2]
    node_mask: jnp.ndarray,  # [B, N]
    tau: float = 0.1,
    block_q: int = 128,
    block_k: int = 128,
    force_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Distance-biased masked attention without materializing [N, N].

    Returns [B, N, H, D]. Uses the Pallas kernel when N tiles cleanly;
    head dims below the 128-lane tile are zero-padded up — free on the MXU
    (which pads sub-tile contractions internally anyway) and the padded V
    lanes read back as zeros, so results are exact. Falls back to the dense
    jnp path otherwise.
    """
    b, n, h, d = q.shape
    d_pad = (-d) % 128
    usable = n % block_q == 0 and n % block_k == 0 and n >= block_q
    use_pallas = usable if force_pallas is None else (force_pallas and usable)
    if use_pallas and h * d == 128:
        # packed-heads kernel: all heads share one lane tile, distance bias
        # computed once per block pair — no head-major flatten, no padding
        return _flash_spatial_packed(q, k, v, pos.astype(jnp.float32),
                                     node_mask, tau, block_q, block_k,
                                     not _on_tpu())
    # head-major flatten: [B*H, N, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    posf = jnp.repeat(pos, h, axis=0)
    maskf = jnp.repeat(node_mask, h, axis=0)
    if use_pallas:
        sm_scale = 1.0 / math.sqrt(d)   # semantic head_dim, pre-padding
        if d_pad:
            pad = [(0, 0), (0, 0), (0, d_pad)]
            qf, kf, vf = (jnp.pad(a, pad) for a in (qf, kf, vf))
        out = _flash_spatial(qf, kf, vf, posf, maskf, tau, block_q, block_k,
                             not _on_tpu(), sm_scale)
        if d_pad:
            out = out[..., :d]
    else:
        out = _dense_reference(qf, kf, vf, posf, maskf, tau)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
