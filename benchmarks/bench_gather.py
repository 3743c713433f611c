"""Micro-benchmark: formulations of the weighted neighbor aggregation.

The DGDM hot loop is `out[b,n] = sum_k w[b,n,k] * h[b, idx[b,n,k], :]`
(three of these per DynamicGraphLayer, nine layers per forward). This
compares TPU implementations so kernel work follows measurement:

  gather     — take_along_axis then masked weighted sum (current ops.graph)
  onehot     — W[b,n,m] = sum_k w * (idx==m) (fused by XLA), then W @ h
               (turns the gather into one MXU matmul per graph)
  pallas     — tiled one-hot MXU kernel, whole h resident in VMEM
               (ops/pallas/gather_agg.py), when available

Usage: python benchmarks/bench_gather.py [--nodes 1024] [--batch 4] [--feat 128]
Prints one JSON line per formulation (fwd and fwd+bwd).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(fn, iters=50, warmup=3):
    """Two-point slope with forced fetch: block_until_ready returns at
    dispatch on the tunnel backend (bench.py timing note)."""
    import jax
    import numpy as np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                                  else leaf))

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--impls", default="gather,onehot,pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    b, n, f, k = args.batch, args.nodes, args.feat, args.k
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(b, n, f), jnp.bfloat16)
    idx = jnp.asarray(rs.randint(0, n, (b, n, k)), jnp.int32)
    w = jnp.asarray(rs.rand(b, n, k), jnp.float32)

    impls = {}

    def gather_impl(h, idx, w):
        from dgdm_histopath_tpu.ops.graph import gather_neighbors
        nbr = gather_neighbors(h, idx)                       # [B,N,K,F]
        return jnp.sum(nbr.astype(jnp.float32) * w[..., None], axis=2)

    impls["gather"] = gather_impl

    def onehot_impl(h, idx, w):
        m = jnp.arange(n, dtype=jnp.int32)
        onehot = (idx[..., None] == m).astype(jnp.float32)   # [B,N,K,N] fused
        W = jnp.einsum("bnk,bnkm->bnm", w, onehot)           # [B,N,N]
        return jnp.einsum("bnm,bmf->bnf", W,
                          h.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    impls["onehot"] = onehot_impl

    try:
        from dgdm_histopath_tpu.ops.pallas.gather_agg import weighted_gather_sum
        impls["pallas"] = lambda h, idx, w: weighted_gather_sum(h, idx, w)
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"impl": "pallas", "error": str(exc)}), flush=True)

    dev = jax.devices()[0]
    print(json.dumps({"device": getattr(dev, "device_kind", str(dev)),
                      "shape": [b, n, k, f]}), flush=True)

    ref = None
    for name in args.impls.split(","):
        fn = impls.get(name)
        if fn is None:
            continue
        try:
            jf = jax.jit(fn)
            out = jf(h, idx, w)
            jax.block_until_ready(out)
            if ref is None:
                ref = np.asarray(out, np.float32)
            else:
                err = float(np.abs(np.asarray(out, np.float32) - ref).max())
                assert err < 0.15, f"{name} mismatch {err}"   # bf16 tolerance
            fwd_ms = _timed(lambda: jf(h, idx, w), iters=args.iters) * 1e3

            def loss(h_):
                return jnp.sum(fn(h_, idx, w) ** 2)
            jg = jax.jit(jax.grad(loss))
            jax.block_until_ready(jg(h))
            bwd_ms = _timed(lambda: jg(h), iters=args.iters) * 1e3
            print(json.dumps({"impl": name, "fwd_ms": round(fwd_ms, 4),
                              "fwd_bwd_ms": round(bwd_ms, 4)}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"impl": name, "error": str(exc)[:300]}), flush=True)


if __name__ == "__main__":
    main()
