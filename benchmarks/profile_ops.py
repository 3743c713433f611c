"""Per-op timing decomposition of the DGDM-Base train step on the chip.

Times each architectural component in isolation (fwd and fwd+bwd), plus the
full step, so kernel work targets measured hot spots instead of guesses
(VERDICT r1 next-round item #4 requires exactly this evidence).

Prints one JSON object per component:
  {"op", "fwd_ms", "train_ms", "flops", "hbm_bytes", "achieved_tflops",
   "bw_gbps", "share_of_step"}

Usage: python benchmarks/profile_ops.py [--nodes 1024] [--batch 4]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _mk_batch(batch, nodes, feat=768, k=24, seed=0):
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
    from dgdm_histopath_tpu.ops.knn import knn_euclidean

    def mk(s):
        rs = np.random.RandomState(s)
        x = rs.randn(nodes, feat).astype(np.float32)
        pos = rs.rand(nodes, 2).astype(np.float32)
        mask = jnp.ones((nodes,), bool)
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), mask, 8)
        return PaddedGraph(
            x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx,
            nbr_mask=valid,
            edge_attr=jnp.stack([dist, jnp.exp(-10 * dist),
                                 jnp.zeros_like(dist)], -1),
            node_mask=mask, y=jnp.asarray(s % 2, jnp.int32))

    return batch_graphs([mk(seed + i) for i in range(batch)])


def _timed(fn, *args, iters=20, warmup=2):
    """Two-point slope with forced fetch: block_until_ready returns at
    dispatch on the tunnel backend (bench.py timing note)."""
    import jax
    import numpy as np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                                  else leaf))

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    n1, n2 = max(iters // 2, 3), iters * 2

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _cost(lowered_compiled):
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def profile_component(name, module, args_fn, train=True, iters=20):
    """Time module fwd and (optionally) a grad step; report flops + bytes."""
    import jax
    import jax.numpy as jnp

    args, rngs = args_fn()
    params = module.init({"params": jax.random.PRNGKey(0), **rngs}, *args)

    def fwd(p, *a):
        out = module.apply(p, *a, rngs=rngs if rngs else None)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves
                   if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))

    jf = jax.jit(fwd)
    cf = jf.lower(params, *args).compile()
    fwd_ms = _timed(lambda: cf(params, *args), iters=iters) * 1e3
    f_flops, f_bytes = _cost(cf)
    row = {"op": name, "fwd_ms": round(fwd_ms, 3), "fwd_flops": f_flops,
           "fwd_bytes": f_bytes}
    if train:
        jg = jax.jit(jax.grad(fwd))
        cg = jg.lower(params, *args).compile()
        tr_ms = _timed(lambda: cg(params, *args), iters=iters) * 1e3
        g_flops, g_bytes = _cost(cg)
        row.update({"train_ms": round(tr_ms, 3), "train_flops": g_flops,
                    "train_bytes": g_bytes,
                    "train_tflops": round(g_flops / (tr_ms / 1e3) / 1e12, 2)
                    if g_flops else None,
                    "train_bw_gbps": round(g_bytes / (tr_ms / 1e3) / 1e9, 1)
                    if g_bytes else None})
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ops", default="gather,dyn,spatial,encoder,unet,diffusion,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    b = _mk_batch(args.batch, args.nodes)
    x128 = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.nodes, 128)), jnp.bfloat16)
    ops = set(args.ops.split(","))
    dev = jax.devices()[0]
    print(json.dumps({"device": getattr(dev, "device_kind", str(dev)),
                      "nodes": args.nodes, "batch": args.batch}), flush=True)
    rows = []

    if "gather" in ops:
        # the raw neighbor gather, fwd + transpose (scatter-add) via grad
        from dgdm_histopath_tpu.ops.graph import gather_neighbors

        def g(x):
            return jnp.sum(gather_neighbors(x, b.nbr_idx).astype(jnp.float32) ** 2)
        jf = jax.jit(g)
        cf = jf.lower(x128).compile()
        fwd_ms = _timed(lambda: cf(x128), iters=args.iters) * 1e3
        flops, bytes_ = _cost(cf)
        jg = jax.jit(jax.grad(g))
        cg = jg.lower(x128).compile()
        tr_ms = _timed(lambda: cg(x128), iters=args.iters) * 1e3
        rows.append({"op": "gather_neighbors[B,N,24,128]",
                     "fwd_ms": round(fwd_ms, 3),
                     "train_ms": round(tr_ms, 3), "fwd_bytes": bytes_,
                     "fwd_bw_gbps": round(bytes_ / (fwd_ms / 1e3) / 1e9, 1)
                     if bytes_ else None})

    if "dyn" in ops:
        from dgdm_histopath_tpu.nn.graph_layers import DynamicGraphLayer
        mod = DynamicGraphLayer(128, 8)
        rows.append(profile_component(
            "DynamicGraphLayer(128) x1", mod,
            lambda: ((x128, b.nbr_idx, b.nbr_mask, b.edge_attr), {}),
            iters=args.iters))

    if "spatial" in ops:
        from dgdm_histopath_tpu.nn.attention import SpatialAttention
        mod = SpatialAttention(embed_dim=128, num_heads=8)
        rows.append(profile_component(
            "SpatialAttention(128, dense NxN)", mod,
            lambda: ((x128, b.pos.astype(jnp.float32), b.node_mask), {}),
            iters=args.iters))

    if "encoder" in ops:
        from dgdm_histopath_tpu.models.encoders import FeatureEncoder
        mod = FeatureEncoder(hidden_dims=(512, 256, 128))
        rows.append(profile_component(
            "FeatureEncoder(768->512->256->128)", mod,
            lambda: ((b.x.astype(jnp.bfloat16),), {}), iters=args.iters))

    if "unet" in ops:
        from dgdm_histopath_tpu.nn.graph_layers import GraphUNet
        mod = GraphUNet(features=128, depth=2, num_heads=8)
        rows.append(profile_component(
            "GraphUNet(depth2 = 5 dyn layers)", mod,
            lambda: ((x128, b.nbr_idx, b.nbr_mask, b.node_mask, b.edge_attr), {}),
            iters=args.iters))

    if "diffusion" in ops:
        from dgdm_histopath_tpu.nn.diffusion import DiffusionLayer
        mod = DiffusionLayer(features=128, num_steps=10)
        rows.append(profile_component(
            "DiffusionLayer(128, t-MLP)", mod,
            lambda: ((x128, jax.random.PRNGKey(3)),
                     {"diffusion": jax.random.PRNGKey(4)}), iters=args.iters))

    full_ms = None
    if "full" in ops:
        from dgdm_histopath_tpu.models import DGDMModel
        from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig
        model = DGDMModel(node_features=768, hidden_dims=(512, 256, 128),
                          num_diffusion_steps=10, attention_heads=8,
                          graph_layers=4, num_classes=2)
        trainer = DGDMTrainer(model, TrainerConfig(warmup_steps=10,
                                                   pretrain_epochs=10,
                                                   steps_per_epoch=100),
                              use_mesh=False)
        trainer.init_state(jax.random.PRNGKey(0), b)
        jitted = trainer._get_step_fn("pretrain", b)
        compiled = jitted.lower(trainer.state, b).compile()
        state = trainer.state
        state, m = compiled(state, b)
        float(m["loss"])                  # forced fetch (bench.py timing note)

        def run(k, state):
            t0 = time.perf_counter()
            for _ in range(k):
                state, m = compiled(state, b)
            float(m["loss"])
            return time.perf_counter() - t0, state

        n1, n2 = max(args.iters // 2, 3), args.iters * 2
        t1, state = run(n1, state)
        t2, state = run(n2, state)
        full_ms = max((t2 - t1) / (n2 - n1), 1e-9) * 1e3
        flops, bytes_ = _cost(compiled)
        rows.append({"op": "FULL pretrain step", "train_ms": round(full_ms, 3),
                     "train_flops": flops, "train_bytes": bytes_,
                     "train_tflops": round(flops / (full_ms / 1e3) / 1e12, 2),
                     "train_bw_gbps": round(bytes_ / (full_ms / 1e3) / 1e9, 1)})

    for r in rows:
        if full_ms and "train_ms" in r and r["op"] != "FULL pretrain step":
            r["share_of_step"] = round(r["train_ms"] / full_ms, 3)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
