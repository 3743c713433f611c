"""GSPMD collective-schedule study on virtual CPU meshes (no TPU needed).

For each parallelism layout, lower + compile the FULL pretrain step over an
``--xla_force_host_platform_device_count`` mesh and count the collectives
XLA inserted (all-reduce / all-gather / reduce-scatter / collective-permute
/ all-to-all), with byte volumes recovered from the instruction shapes.
This pins the communication schedule our sharding annotations produce —
the thing to compare against the scaling-book recipe once multi-chip
hardware is reachable (roadmap: DP/TP over ICI vs DCN).

Layouts:
  * dp N        — ('data',) mesh, batch sharded, params replicated:
                  expect one gradient all-reduce per step (fused).
  * dp2_tpM     — ('data','model') mesh, parallel/tp.py param layout:
                  expect all-gathers at column/row kernel boundaries +
                  gradient reduce over 'data'.
  * sp2_tpM     — node axis sharded over 'model' (parallel/sp.py), params
                  replicated: expect all-gathers at neighbor gathers and
                  pooling reductions.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python benchmarks/bench_collectives.py [--nodes 256] [--batch 8]
Prints one JSON line per layout plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_txt: str) -> int:
    """'bf16[4,256,64]' -> byte count; tuple shapes sum their elements."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_txt):
        dt = _DTYPE_BYTES.get(m.group(1))
        if dt is None:
            continue
        numel = 1
        for d in m.group(2).split(","):
            if d:
                numel *= int(d)
        total += dt * numel
    return total


def count_collectives(hlo_text: str) -> dict:
    out = {}
    for kind in _COLLECTIVES:
        # e.g. "%all-gather.3 = bf16[8,256,64]{...} all-gather("
        #  or fused/start variants: all-reduce-start / all-gather-done
        pat = re.compile(
            r"= ((?:\([^)]*\))|(?:\S+)) " + re.escape(kind) + r"(?:-start)?\(")
        n, nbytes = 0, 0
        for m in pat.finditer(hlo_text):
            n += 1
            nbytes += _shape_bytes(m.group(1))
        if n:
            out[kind] = {"count": n, "bytes_out": nbytes}
    return out


def build_step(layout: str, n_devices: int, nodes: int, batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
    from dgdm_histopath_tpu.ops.knn import knn_euclidean
    from dgdm_histopath_tpu.parallel.mesh import make_mesh, shard_batch
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    model = DGDMModel(node_features=64, hidden_dims=(64, 32),
                      num_diffusion_steps=4, attention_heads=4,
                      graph_layers=2, num_classes=2,
                      use_spatial_attention=True, use_hierarchical=True,
                      pooling="attention", compute_dtype="bfloat16")

    def make_graph(seed, n_real=None):
        rs = np.random.RandomState(seed)
        n_real = n_real or max(nodes - 16, nodes // 2)
        x = np.zeros((nodes, 64), np.float32)
        x[:n_real] = rs.randn(n_real, 64)
        pos = np.zeros((nodes, 2), np.float32)
        pos[:n_real] = rs.rand(n_real, 2)
        mask = np.zeros((nodes,), bool)
        mask[:n_real] = True
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), jnp.asarray(mask), 8)
        ea = jnp.stack([dist, jnp.exp(-10.0 * dist), jnp.zeros_like(dist)], -1)
        return PaddedGraph(x=jnp.asarray(x), pos=jnp.asarray(pos),
                           nbr_idx=idx, nbr_mask=valid, edge_attr=ea,
                           node_mask=jnp.asarray(mask),
                           y=jnp.asarray(seed % 2, jnp.int32))

    batch_g = batch_graphs([make_graph(i) for i in range(batch)])

    if layout.startswith("dp2_tp") or layout.startswith("sp2_tp"):
        mesh = make_mesh(n_devices=n_devices, axes=("data", "model"),
                         shape=(2, n_devices // 2))
    else:
        mesh = make_mesh(n_devices=n_devices, axes=("data",))

    trainer = DGDMTrainer(
        model, TrainerConfig(learning_rate=1e-3, warmup_steps=1,
                             pretrain_epochs=1, steps_per_epoch=4),
        mesh=mesh)
    trainer.init_state(jax.random.PRNGKey(0), batch_g)

    if layout.startswith("sp2_tp"):
        from dgdm_histopath_tpu.parallel.sp import shard_graph_nodes
        batch_g = shard_graph_nodes(batch_g, mesh)
    else:
        batch_g = shard_batch(batch_g, mesh)

    jitted = trainer._get_step_fn("pretrain", batch_g)
    return jitted.lower(trainer.state, batch_g)


def bench_halo(nodes: int, batch: int, tp: int):
    """Op-level study: halo-exchange neighbor gather vs the GSPMD lowering
    of the same node-sharded gather (parallel/halo.py vs plain sp.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dgdm_histopath_tpu.ops.graph import (
        PaddedGraph, batch_graphs, gather_neighbors)
    from dgdm_histopath_tpu.ops.knn import knn_euclidean
    from dgdm_histopath_tpu.parallel.halo import (
        build_halo_plan, halo_fraction, halo_gather, spatial_sort)
    from dgdm_histopath_tpu.parallel.mesh import make_mesh

    def make_graph(seed, feat=64):
        rs = np.random.RandomState(seed)
        n_real = nodes - nodes // 16
        pos = np.zeros((nodes, 2), np.float32)
        pos[:n_real] = rs.rand(n_real, 2)
        mask = np.zeros((nodes,), bool)
        mask[:n_real] = True
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), jnp.asarray(mask), 8)
        x = np.zeros((nodes, feat), np.float32)
        x[:n_real] = rs.randn(n_real, feat)
        ea = jnp.stack([dist, jnp.exp(-10.0 * dist), jnp.zeros_like(dist)], -1)
        return spatial_sort(PaddedGraph(
            x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx,
            nbr_mask=valid, edge_attr=ea, node_mask=jnp.asarray(mask)))

    g = batch_graphs([make_graph(i) for i in range(batch)])
    plan = build_halo_plan(g.nbr_idx, g.nbr_mask, tp=tp)
    frac = halo_fraction(g.nbr_idx, g.nbr_mask, tp)
    dp = max(1, min(len(jax.devices()) // tp, batch))
    mesh = make_mesh(n_devices=dp * tp, axes=("data", "model"),
                     shape=(dp, tp))
    ns = NamedSharding(mesh, P("data", "model", None))
    x = jax.device_put(g.x, ns)
    idx = jax.device_put(g.nbr_idx, ns)

    halo_hlo = (jax.jit(lambda a: halo_gather(a, plan, mesh))
                .lower(x).compile().as_text())
    gspmd_hlo = (jax.jit(lambda a, i: gather_neighbors(a, i, impl="take"),
                         out_shardings=NamedSharding(
                             mesh, P("data", "model", None, None)))
                 .lower(x, idx).compile().as_text())
    row = {"layout": f"halo_vs_gspmd_tp{tp}", "nodes": nodes, "batch": batch,
           "halo_size": plan.halo_size, "cross_shard_edge_frac": round(frac, 4),
           "halo": count_collectives(halo_hlo),
           "gspmd": count_collectives(gspmd_hlo)}
    for k in ("halo", "gspmd"):
        row[f"{k}_bytes"] = sum(v["bytes_out"] for v in row[k].values())
    row["bytes_ratio"] = round(row["halo_bytes"] / max(row["gspmd_bytes"], 1), 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--halo", action="store_true",
                    help="op-level halo-exchange vs GSPMD gather study")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    n = len(jax.devices())

    if args.halo:
        rows = [bench_halo(args.nodes, args.batch, tp)
                for tp in (2, 4) if n % tp == 0]
        for r in rows:
            print(json.dumps(r), file=sys.stderr)
        print(json.dumps({"metric": "halo_vs_gspmd_gather", "rows": rows}))
        return

    layouts = [f"dp{n}"]
    if n >= 4 and n % 2 == 0:
        layouts += [f"dp2_tp{n // 2}", f"sp2_tp{n // 2}"]

    rows = []
    for layout in layouts:
        lowered = build_step(layout, n, args.nodes, args.batch)
        hlo = lowered.compile().as_text()
        cols = count_collectives(hlo)
        total_bytes = sum(v["bytes_out"] for v in cols.values())
        row = {"layout": layout, "devices": n, "nodes": args.nodes,
               "batch": args.batch, "collectives": cols,
               "total_collective_bytes_out": total_bytes}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    print(json.dumps({"metric": "gspmd_collective_schedule", "rows": rows}))


if __name__ == "__main__":
    main()
