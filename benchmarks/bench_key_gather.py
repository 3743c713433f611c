#!/usr/bin/env python
"""A/B: one-hot key gather vs dense-scores + flat scalar selection.

The attention-score computation in ``DynamicGraphLayer`` is the largest
executed-FLOPs overhead at Base geometry (VERDICT r3 #3: ~70% of step FLOPs
are gather overhead). Today it one-hot-gathers neighbor keys then contracts
with q:

    k_nbr = onehot(nbr_idx) @ k          # K·N²·F MACs
    scores = einsum(q, k_nbr)            # N·K·F

The dense-scores formulation computes every pairwise score on the MXU and
then SELECTS the K neighbor entries with one flat scalar gather (the
gather class ``symmetric_norm`` already uses in the fast step):

    S = einsum('bnhd,bmhd->bhnm', q, k)  # N²·F MACs — K× fewer
    scores = S.flat[(h·N + n)·N + idx]   # B·H·N·K scalars

A round-3 attempt at score-space selection used per-node [K,N]@[N,H]
selection MATMULS and measured 77.5→135.4 ms whole-step — tiny matmuls map
terribly onto the MXU. This probes the scalar-gather selection instead.

Timing: fetch-synced two-point slope (CLAUDE.md / bench.py discipline —
block_until_ready returns after dispatch on the tunnel backend).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--feat", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, N, K, H = args.batch, args.nodes, args.k, args.heads
    D = args.feat // H
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    idx = jnp.asarray(rs.randint(0, N, (B, N, K)), jnp.int32)

    def onehot_scores(q, k, idx):
        sel = (idx[..., None] == jnp.arange(N, dtype=idx.dtype)
               ).astype(q.dtype)                        # [B,N,K,N]
        k_flat = k.reshape(B, N, H * D)
        k_nbr = jnp.einsum("bnkm,bmf->bnkf", sel, k_flat
                           ).reshape(B, N, K, H, D)
        return jnp.einsum("bnhd,bnkhd->bnkh", q, k_nbr).astype(jnp.float32)

    def dense_scores(q, k, idx):
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k)         # [B,H,N,N]
        base = (jnp.arange(H, dtype=jnp.int32)[None, :, None, None] * N
                + jnp.arange(N, dtype=jnp.int32)[None, None, :, None]) * N
        flat = (base + idx[:, None, :, :]).reshape(B, H * N * K)
        out = jnp.take_along_axis(s.reshape(B, H * N * N), flat, axis=-1)
        return out.reshape(B, H, N, K).transpose(0, 2, 3, 1
                                                 ).astype(jnp.float32)

    f_one = jax.jit(onehot_scores)
    f_den = jax.jit(dense_scores)

    # parity first (bf16 MXU math either way)
    a = np.asarray(f_one(q, k, idx))
    b = np.asarray(f_den(q, k, idx))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)
    parity_max_abs = float(np.max(np.abs(a - b)))

    def timed(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(q, k, idx)
        _ = float(out[0, 0, 0, 0])                       # forced fetch sync
        return time.perf_counter() - t0

    results = {}
    for name, fn in (("onehot", f_one), ("dense_flatgather", f_den)):
        timed(fn, 2)                                     # warmup
        n1, n2 = max(args.iters // 2, 5), args.iters * 2
        t1 = timed(fn, n1)
        t2 = timed(fn, n2)
        results[name + "_ms"] = round(1e3 * (t2 - t1) / (n2 - n1), 3)
    results["speedup"] = round(results["onehot_ms"]
                               / max(results["dense_flatgather_ms"], 1e-9), 3)
    results["parity_max_abs"] = round(parity_max_abs, 5)
    results.update({"B": B, "N": N, "K": K, "H": H, "F": args.feat,
                    "backend": jax.default_backend()})
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
