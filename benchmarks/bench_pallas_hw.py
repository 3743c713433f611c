"""Hardware A/B of the Pallas kernels vs their XLA formulations.

Round-2's remote-compile tunnel rejected Mosaic programs (HTTP 500,
ADR-0004), leaving both kernels interpret-verified but unmeasured on the
chip. This script retries the real-hardware compile and, when it succeeds,
reports correctness + timing against the dense/XLA path at the flagship
geometries. Usage:

    python benchmarks/bench_pallas_hw.py [--geometry base|large]

Prints one JSON object per kernel with {compiled, max_err, pallas_ms,
xla_ms, speedup}. A Mosaic rejection is caught and reported as
compiled=false rather than crashing.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time(fn, iters=20):
    """Forced-fetch two-point-slope ms/op (block_until_ready returns after
    dispatch on the tunnel backend — see bench.py timing note)."""
    import jax
    import numpy as np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    sync(fn())
    n1, n2 = max(iters // 2, 3), iters * 2

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9) * 1e3


def bench_gather(batch=4, n=1024, k=24, f=128):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.ops.pallas.gather_agg import weighted_gather_sum

    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(batch, n, f), jnp.bfloat16)
    idx = jnp.asarray(rs.randint(0, n, (batch, n, k)), jnp.int32)
    w = jnp.asarray(rs.rand(batch, n, k), jnp.bfloat16)

    def xla(h, idx, w):
        g = jnp.take_along_axis(
            h, idx.reshape(batch, -1)[..., None], axis=1
        ).reshape(batch, n, k, f)
        return jnp.einsum("bnk,bnkf->bnf", w.astype(jnp.float32),
                          g.astype(jnp.float32)).astype(h.dtype)

    out = {"kernel": "gather_agg", "geometry": [batch, n, k, f]}
    xla_fn = jax.jit(lambda: xla(h, idx, w))
    out["xla_ms"] = round(_time(xla_fn), 3)
    try:
        pallas_fn = jax.jit(
            lambda: weighted_gather_sum(h, idx, w, interpret=False))
        ref = np.asarray(xla_fn(), np.float32)
        got = np.asarray(pallas_fn(), np.float32)
        out["compiled"] = True
        out["max_err"] = float(np.abs(ref - got).max())
        out["pallas_ms"] = round(_time(pallas_fn), 3)
        out["speedup_vs_xla"] = round(out["xla_ms"] / out["pallas_ms"], 3)
    except Exception as exc:  # Mosaic rejection or runtime failure
        out["compiled"] = False
        out["error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
    return out


def bench_flash(batch=4, n=2048, heads=8, head_dim=16):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.ops.pallas.flash_spatial import (
        _dense_reference, flash_spatial_attention)

    rs = np.random.RandomState(0)
    # layout [B, N, H, D] (flash_spatial_attention's contract)
    q = jnp.asarray(rs.randn(batch, n, heads, head_dim), jnp.float32)
    k = jnp.asarray(rs.randn(batch, n, heads, head_dim), jnp.float32)
    v = jnp.asarray(rs.randn(batch, n, heads, head_dim), jnp.float32)
    pos = jnp.asarray(rs.rand(batch, n, 2), jnp.float32)
    mask = jnp.asarray(rs.rand(batch, n) < 0.95)
    tau = 1.0

    out = {"kernel": "flash_spatial",
           "geometry": [batch, heads, n, head_dim]}
    # dense reference wants head-folded [B*H, N, D]
    qf = q.transpose(0, 2, 1, 3).reshape(batch * heads, n, head_dim)
    kf = k.transpose(0, 2, 1, 3).reshape(batch * heads, n, head_dim)
    vf = v.transpose(0, 2, 1, 3).reshape(batch * heads, n, head_dim)
    posf = jnp.repeat(pos, heads, axis=0)
    maskf = jnp.repeat(mask, heads, axis=0)
    dense_fn = jax.jit(lambda: _dense_reference(qf, kf, vf, posf, maskf, tau))
    out["xla_ms"] = round(_time(dense_fn, iters=10), 3)
    try:
        flash_fn = jax.jit(lambda: flash_spatial_attention(
            q, k, v, pos, mask, tau, force_pallas=True))
        ref = np.asarray(dense_fn(), np.float32)
        got = np.asarray(flash_fn(), np.float32)
        got = got.transpose(0, 2, 1, 3).reshape(ref.shape)  # [B,N,H,D]→[B*H,N,D]
        out["compiled"] = True
        out["max_err"] = float(np.abs(ref - got).max())
        out["pallas_ms"] = round(_time(flash_fn, iters=10), 3)
        out["speedup_vs_xla"] = round(out["xla_ms"] / out["pallas_ms"], 3)
    except Exception as exc:
        out["compiled"] = False
        out["error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=["base", "large"], default="base")
    ap.add_argument("--kernels", default="gather,flash")
    args = ap.parse_args()
    large = args.geometry == "large"
    for name in args.kernels.split(","):
        if name == "gather":
            r = bench_gather(f=256 if large else 128,
                             n=2048 if large else 1024)
        elif name == "flash":
            r = bench_flash(heads=16 if large else 8,
                            head_dim=64 if large else 16)
        else:
            continue
        print(json.dumps(r))


if __name__ == "__main__":
    main()
