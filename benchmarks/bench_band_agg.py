"""Micro-benchmark: formulations of the BANDED adjacency aggregation.

ADR-0004 add.10 measured banded message passing ([nb, W, 3W] adjacency)
losing to dense at Base (MFU 13.5%→6.2%): the band matmuls tile the MXU
worse AND `band_widen` materializes a 3×-widened [nb, 3W, F] activation
copy per aggregation. This compares:

  widen   — current ops.graph.banded_conv_agg: einsum([nb,W,3W], widen(h))
  shift3  — Y[b] = A_prev[b]@X[b-1] + A_self[b]@X[b] + A_next[b]@X[b+1]:
            three [nb,W,W]@[nb,W,F] batched matmuls against rolled block
            views — identical FLOPs, no widened copy in HBM
  dense   — the [N,N]@[N,F] dense control (what banding must beat)

All three produce identical results on in-band adjacencies (asserted before
timing). Usage: python benchmarks/bench_band_agg.py [--nodes 1024]
[--window 64] [--feat 512] [--batch 32]. One JSON line with all rows.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(fn, iters=50, warmup=3):
    """Two-point slope with forced fetch (bench.py timing note)."""
    import jax
    import numpy as np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    for _ in range(warmup):
        out = fn()
    sync(out)
    n1, n2 = max(iters // 2, 3), iters * 2

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def shift3_agg(adj_band, h, window):
    """Banded aggregation as 3 shifted block matmuls (no widened copy).

    adj_band [..., nb, W, 3W] (slots [0,W)=prev block, [W,2W)=self,
    [2W,3W)=next, as produced by banded_weighted_adjacency); h [..., N, F].
    Wrapped blocks contribute zeros exactly like band_widen's unaddressable
    wrap rows: block 0 has no prev, block nb-1 has no next.
    """
    import jax.numpy as jnp

    *lead, n, f = h.shape
    w = window
    nb = n // w
    hb = h.reshape(*lead, nb, w, f).astype(adj_band.dtype)
    ax = len(lead)
    a_prev = adj_band[..., :, :, 0 * w:1 * w]
    a_self = adj_band[..., :, :, 1 * w:2 * w]
    a_next = adj_band[..., :, :, 2 * w:3 * w]
    out = jnp.einsum("...bwm,...bmf->...bwf", a_self, hb)
    prev = jnp.einsum("...bwm,...bmf->...bwf", a_prev[..., 1:, :, :],
                      hb[..., :-1, :, :])
    nxt = jnp.einsum("...bwm,...bmf->...bwf", a_next[..., :-1, :, :],
                     hb[..., 1:, :, :])
    out = out.at[..., 1:, :, :].add(prev)
    out = out.at[..., :-1, :, :].add(nxt)
    return out.reshape(*lead, n, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--feat", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dgdm_histopath_tpu.ops.graph import (
        band_eligible, banded_conv_agg, banded_relative_neighbors,
        banded_weighted_adjacency, weighted_adjacency)

    assert band_eligible(args.nodes, args.window)
    b, n, k, f, w = args.batch, args.nodes, args.k, args.feat, args.window
    rs = np.random.RandomState(0)
    # in-band neighbor pattern (like band-built graphs): each node draws
    # neighbors from its widened block range
    base = (np.arange(n) // w - 1) * w
    rel = rs.randint(0, 3 * w, (b, n, k))
    idx = np.clip(base[None, :, None] + rel, 0, n - 1).astype(np.int32)
    mask = np.ones((b, n, k), bool)
    weight = rs.rand(b, n, k).astype(np.float32)
    h = jnp.asarray(rs.randn(b, n, f).astype(np.float32), jnp.bfloat16)
    idx_j, mask_j = jnp.asarray(idx), jnp.asarray(mask)
    weight_j = jnp.asarray(weight)

    rel_idx, ok = banded_relative_neighbors(idx_j, mask_j, w)
    wts = jnp.where(ok, weight_j, 0.0)

    def make_fns(dtype):
        @jax.jit
        def widen_fn(rel_idx, wts, h):
            ab = banded_weighted_adjacency(rel_idx, wts, w, dtype=dtype)
            return banded_conv_agg(ab, h, w)

        @jax.jit
        def shift3_fn(rel_idx, wts, h):
            ab = banded_weighted_adjacency(rel_idx, wts, w, dtype=dtype)
            return shift3_agg(ab, h, w)

        @jax.jit
        def dense_fn(idx_j, wts, h):
            adj = weighted_adjacency(idx_j, wts, n, dtype=dtype)
            return jnp.einsum("...nm,...mf->...nf", adj, h.astype(adj.dtype))

        return widen_fn, shift3_fn, dense_fn

    widen_fn, shift3_fn, dense_fn = make_fns(jnp.bfloat16)
    widen32, shift32, dense32 = make_fns(jnp.float32)

    # parity before timing (all edges in-band by construction). Checked in
    # f32 — the timed bf16 paths differ by bf16 accumulation-order noise
    # (verified exact in f32: widen vs shift3 maxdiff 5e-7 at this scale)
    h32 = h.astype(jnp.float32)
    a = np.asarray(widen32(rel_idx, wts, h32), np.float32)
    c = np.asarray(shift32(rel_idx, wts, h32), np.float32)
    d = np.asarray(dense32(idx_j, wts, h32), np.float32)
    np.testing.assert_allclose(a, c, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(a, d, atol=1e-2, rtol=1e-2)

    rows = []
    for tag, fn, fa in (("widen", widen_fn, (rel_idx, wts, h)),
                        ("shift3", shift3_fn, (rel_idx, wts, h)),
                        ("dense", dense_fn, (idx_j, wts, h))):
        dt = _timed(lambda fn=fn, fa=fa: fn(*fa), iters=args.iters)
        rows.append({"tag": tag, "ms": round(dt * 1e3, 4)})
        print(json.dumps(rows[-1]), file=sys.stderr)
    out = {"metric": "band_agg_formulations",
           "nodes": n, "window": w, "feat": f, "batch": b,
           "rows": rows,
           "shift3_vs_widen": round(rows[0]["ms"] / rows[1]["ms"], 3),
           "widen_vs_dense": round(rows[2]["ms"] / rows[0]["ms"], 3),
           "device": str(jax.devices()[0])}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
