"""Benchmark harness: DGDM-Base training-step throughput + MFU on the real chip.

Prints ONE *compact* JSON line (<~1 kB — the driver captures only the tail
of stdout, see VERDICT r3 weak #4):
  {"metric", "value", "unit", "vs_baseline", "mfu", "mfu_model_math",
   "step_time_ms", "batch", "device", <one-line rider summaries>, "detail"}
The full record (flops accounting, memory analysis, timing protocol, full
rider sub-objects) is written to docs/results/bench_full.json.

Honest accounting (replaces round-1's invented 4-graphs/s constant — see
BASELINE.md "Throughput baseline derivation"):
  * ``flops_per_step`` sums 2·M·N·K over the ``stablehlo.dot_general``
    instructions of the lowered module we compile and time
    (``matmul_flops_from_stablehlo``). The executable's own
    ``cost_analysis()`` is also printed but overcounts this program — the
    batch-32 sweep "achieved" 263 TFLOPs on a 197-TFLOP chip by its counts.
  * ``mfu`` = achieved matmul FLOPs/s ÷ the chip's published peak bf16
    FLOPs/s (elementwise work excluded: conservative, standard MFU).
  * ``vs_baseline`` divides our measured graphs/s by a *derived* A100
    capability bound for the same per-graph FLOPs: the reference trains on
    A100s (README.md:276) and publishes no throughput, so the fairest
    denominator is what an A100 could do on this workload at a generous
    40% MFU of its 312 TFLOPs bf16 peak:
        baseline_graphs_per_s = 0.40 * 312e12 / flops_per_graph.
    40% favors the reference: torch-geometric scatter workloads typically
    realize far less. The derivation is printed in the JSON so the number
    can never detach from its assumptions.

Run with --large to additionally bench the DGDM-Large preset geometry
(configs/dgdm_large.yaml: 1024-d features, hidden [768,512,256,128],
16 heads, 20 diffusion steps, 2048-node bucket).
"""

import json
import sys
import time

A100_PEAK_BF16 = 312e12
A100_ASSUMED_MFU = 0.40

# published peak bf16 FLOPs/s per chip generation (for MFU denominators)
_TPU_PEAKS = (
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_bf16_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _TPU_PEAKS:
        if key in kind:
            return peak
    return None


def matmul_flops_from_stablehlo(lowered) -> float | None:
    """Sum 2·out_numel·K over every ``stablehlo.dot_general`` in the lowered
    (pre-backend) module.

    XLA's ``cost_analysis()['flops']`` overcounts this program (the batch-32
    sweep "achieved" 263 TFLOPs on a 197-TFLOP chip), and the TPU backend
    rewrites batched matmuls into convolutions whose window encodings are
    not recoverable from text — the StableHLO dot_generals carry full shapes
    inline and are backend-independent. Caveat: ops inside ``while``/scan
    bodies are counted once (the pretrain step has no matmul-bearing scan);
    elementwise work is excluded. This is the standard, conservative MFU
    numerator (model matmul FLOPs).
    """
    import re
    try:
        txt = lowered.as_text()
    except Exception:
        return None
    total = 0.0

    def dims_of(tensor_body: str):
        # "4x1024x768xf32" -> [4, 1024, 768]; "f32" (scalar) -> []
        return [int(t) for t in tensor_body.split("x") if t.isdigit()]

    pat = re.compile(
        r"stablehlo\.dot_general[^\n]*?"
        r"(?:lhs_)?contracting_dim(?:ension)?s\s*=\s*\[([\d, ]*)\][^\n]*?"
        r":\s*\(tensor<([^>]+)>,\s*tensor<[^>]+>\)\s*->\s*tensor<([^>]+)>")
    for m in pat.finditer(txt):
        cdims = [int(x) for x in m.group(1).replace(" ", "").split(",") if x]
        lhs_dims = dims_of(m.group(2))
        out_dims = dims_of(m.group(3))
        k = 1
        for d in cdims:
            if d < len(lhs_dims):
                k *= lhs_dims[d]
        out = 1
        for d in out_dims:
            out *= d
        total += 2.0 * out * k
    return total or None


def matmul_flops_from_hlo(compiled) -> float | None:
    """Sum 2·M·N·K over every ``dot`` in the optimized HLO (CPU/GPU form;
    the TPU backend rewrites dots into convolutions — use
    ``matmul_flops_from_stablehlo`` there)."""
    import re
    try:
        txt = compiled.as_text()
    except Exception:
        return None
    # pass 1: shape of every named instruction (operand shapes are not
    # printed inline in optimized HLO — resolve "%a.1" via its definition)
    shapes = {}
    def_pat = re.compile(r"%([\w.\-]+) = [a-z0-9]+\[([\d,]*)\]")
    for m in def_pat.finditer(txt):
        shapes[m.group(1)] = [int(x) for x in m.group(2).split(",") if x]
    total = 0.0
    # pass 2a: dot instructions (CPU/GPU form) — out numel × lhs contracting
    dot_pat = re.compile(
        r"= [a-z0-9]+\[([\d,]*)\][^ ]* dot\(%([\w.\-]+), %([\w.\-]+)\)(.*)")
    for m in dot_pat.finditer(txt):
        out_dims = [int(x) for x in m.group(1).split(",") if x]
        lhs_dims = shapes.get(m.group(2), [])
        rest = m.group(4)
        cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", rest)
        k = 1
        if cm:
            for d in (int(x) for x in cm.group(1).split(",") if x):
                if d < len(lhs_dims):
                    k *= lhs_dims[d]
        out = 1
        for d in out_dims:
            out *= d
        total += 2.0 * out * k
    return total or None


def _enable_compile_cache():
    """Persistent XLA compile cache: a repeated config (driver re-runs,
    paired A/Bs re-benching the dense side) skips its tunnel compile. Keys
    include platform/geometry, so CPU test and TPU bench entries coexist."""
    import os
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache_bench")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def bench_config(name, node_features, hidden_dims, num_steps, heads, layers,
                 nodes, n_real, batch, n_iters=30,
                 use_spatial=True, use_hier=True, phase="pretrain",
                 trainer_overrides=None, **model_overrides):
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    import numpy as np
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
    from dgdm_histopath_tpu.ops.knn import knn_euclidean
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    # windowed configs get band-built graphs (Morton-sorted, kNN confined to
    # the ±1 block band) — the exact semantics TissueGraphBuilder(knn_window)
    # produces and the trainer now requires for graph_window models; same
    # shapes either way, so throughput numbers are unaffected
    from dgdm_histopath_tpu.ops.graph import band_eligible
    gw = model_overrides.get("graph_window")
    band = gw if (gw and band_eligible(nodes, gw)) else None

    def make_graph(seed):
        rs = np.random.RandomState(seed)
        x = np.zeros((nodes, node_features), np.float32)
        x[:n_real] = rs.randn(n_real, node_features).astype(np.float32)
        pos = np.zeros((nodes, 2), np.float32)
        pos[:n_real] = rs.rand(n_real, 2)
        mask = np.zeros((nodes,), bool)
        mask[:n_real] = True
        if band is not None:
            from dgdm_histopath_tpu.parallel.halo import morton_keys
            order = np.argsort(morton_keys(pos, mask), kind="stable")
            pos, x, mask = pos[order], x[order], mask[order]
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), jnp.asarray(mask),
                                         8, band_window=band)
        edge_attr = jnp.stack([dist, jnp.exp(-10.0 * dist), jnp.zeros_like(dist)], -1)
        return PaddedGraph(x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx,
                           nbr_mask=valid, edge_attr=edge_attr,
                           node_mask=jnp.asarray(mask),
                           y=jnp.asarray(seed % 2, jnp.int32))

    model = DGDMModel(
        node_features=node_features, hidden_dims=hidden_dims,
        num_diffusion_steps=num_steps, attention_heads=heads,
        graph_layers=layers, num_classes=2,
        use_spatial_attention=use_spatial, use_hierarchical=use_hier,
        pooling="attention", **model_overrides,
    )
    batch_g = batch_graphs([make_graph(i) for i in range(batch)])
    trainer = DGDMTrainer(
        model,
        TrainerConfig(learning_rate=1e-4, warmup_steps=10, pretrain_epochs=10,
                      steps_per_epoch=100, **(trainer_overrides or {})),
        use_mesh=len(jax.devices()) > 1,
    )
    trainer.init_state(jax.random.PRNGKey(0), batch_g)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(trainer.state.params))

    from dgdm_histopath_tpu.parallel.mesh import shard_batch
    if trainer.mesh is not None:
        batch_g = shard_batch(batch_g, trainer.mesh)

    # AOT: lower+compile once, read the cost model from the SAME executable
    # we time (no second tunnel compile, no invented FLOPs)
    jitted = trainer._get_step_fn(phase, batch_g)
    lowered = jitted.lower(trainer.state, batch_g)
    compiled = lowered.compile()
    flops_ca = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops_ca = float(ca.get("flops", 0.0)) or None
    except Exception:
        flops_ca = None
    # MFU numerator: dot_general FLOPs from the StableHLO module — the
    # cost model overcounts this program (>100% "MFU" at batch 32)
    flops = matmul_flops_from_stablehlo(lowered) or flops_ca

    # model-math FLOPs (VERDICT r2 #5): the one-hot gather formulation adds
    # O(N^2 K F) selector matmuls that are formulation overhead, not model
    # math. Lower (trace only, no tunnel compile) the SAME step with the
    # take_along_axis formulation — its dot_generals are the dense/attention
    # matmuls the reference's scatter formulation also performs — and report
    # a second MFU over that honest numerator.
    flops_model = None
    try:
        model_xla = DGDMModel(
            node_features=node_features, hidden_dims=hidden_dims,
            num_diffusion_steps=num_steps, attention_heads=heads,
            graph_layers=layers, num_classes=2,
            use_spatial_attention=use_spatial, use_hierarchical=use_hier,
            pooling="attention", **{**model_overrides, "gather_impl": "xla"},
        )
        trainer_xla = DGDMTrainer(
            model_xla,
            TrainerConfig(learning_rate=1e-4, warmup_steps=10,
                          pretrain_epochs=10, steps_per_epoch=100),
            use_mesh=trainer.mesh is not None,
        )
        trainer_xla.state = trainer.state     # same param tree; compute differs
        lowered_xla = trainer_xla._get_step_fn(phase, batch_g).lower(
            trainer.state, batch_g)
        flops_model = matmul_flops_from_stablehlo(lowered_xla)
    except Exception:
        flops_model = None

    # HBM high-water of the timed executable (argument + temp allocations)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k] = int(v)
        if "argument_size_in_bytes" in mem and "temp_size_in_bytes" in mem:
            mem["hbm_highwater_gb"] = round(
                (mem["argument_size_in_bytes"] + mem["output_size_in_bytes"]
                 + mem["temp_size_in_bytes"]) / 1e9, 3)
    except Exception:
        pass

    # TIMING DISCIPLINE (two-point slope with forced fetch): on the axon
    # tunnel backend ``block_until_ready`` returns after DISPATCH, not
    # execution — an 8192^3 bf16 matmul chain "measured" 50,000 TFLOPs/s
    # under it. Only a device->host fetch (float(loss)) waits for real
    # completion, and the slope between two run lengths cancels the fixed
    # dispatch/fetch overheads (~60 ms measured on the probe).
    def timed_run(k, state):
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = compiled(state, batch_g)
        loss = float(metrics["loss"])                    # real sync point
        assert loss == loss, "non-finite loss in bench run"
        return time.perf_counter() - t0, state

    state, metrics = compiled(trainer.state, batch_g)    # warmup (cached exec)
    float(metrics["loss"])
    n1, n2 = max(n_iters // 2, 5), n_iters * 2
    # median of >=3 interleaved slope measurements: the chip is single-tenant
    # but the TUNNEL is not — one contended window skewed a prior headline
    # by 36% (README 666 g/s vs driver 488 g/s, VERDICT r4 weak #6); the
    # median of repeated slopes is robust to one bad window and costs only
    # already-compiled steps
    slopes, reps = [], []
    for _ in range(3):
        t1, state = timed_run(n1, state)
        t2, state = timed_run(n2, state)
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-9))
        reps.append({"n1": n1, "t1_s": round(t1, 4),
                     "n2": n2, "t2_s": round(t2, 4)})
    step_time = float(np.median(slopes))
    graphs_per_sec = batch / step_time
    dev = jax.devices()[0]
    peak = peak_bf16_flops(dev)
    achieved = flops / step_time if flops else None
    mfu = achieved / peak if (achieved and peak) else None
    vs_lower_bound = None
    if flops:
        # LOWER BOUND on relative efficiency: assumes the torch reference
        # magically hits 40% MFU on A100 — scatter-based PyG with per-graph
        # Python loops realizes a small fraction of that, so the true ratio
        # is several times higher. See BASELINE.md for the assumption map.
        baseline_graphs_per_s = A100_ASSUMED_MFU * A100_PEAK_BF16 / (flops / batch)
        vs_lower_bound = graphs_per_sec / baseline_graphs_per_s
    return {
        "metric": f"pretrain_step_throughput_{name}",
        "value": round(graphs_per_sec, 3),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(vs_lower_bound, 3) if vs_lower_bound else None,
        "params": n_params,
        "flops_per_step": flops,
        "flops_source": "stablehlo_dot_general" if flops is not flops_ca else "cost_analysis",
        "flops_cost_analysis": flops_ca,
        "achieved_tflops": round(achieved / 1e12, 3) if achieved else None,
        "mfu": round(mfu, 4) if mfu else None,
        "flops_per_step_model_math": flops_model,
        "mfu_model_math": (round(flops_model / step_time / peak, 4)
                           if (flops_model and peak) else None),
        "memory_analysis": mem or None,
        "step_time_ms": round(step_time * 1e3, 3),
        "timing": {"protocol": "median_of_3_two_point_slopes_forced_fetch",
                   "slope_ms": [round(s * 1e3, 3) for s in slopes],
                   "reps": reps},
        "device": getattr(dev, "device_kind", str(dev)),
        "peak_bf16_tflops": round(peak / 1e12, 1) if peak else None,
        "baseline_derivation": ("LOWER BOUND: assumes reference reaches 0.40 "
                                "MFU x 312 TFLOPs bf16 A100 on measured "
                                "flops-per-graph; realized PyG MFU is far "
                                "lower (BASELINE.md assumption map)"),
    }


def main():
    if "--batch-sweep" in sys.argv:
        # find the saturating batch for the Base geometry: throughput
        # benchmarks report the best batch (each size is a fresh compile)
        results = []
        for b in (8, 32, 64, 128):
            r = bench_config(f"1024node_base_b{b}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=b, n_iters=20)
            r["batch"] = b
            results.append(r)
            print(json.dumps(r), file=sys.stderr)
        best = max(results, key=lambda r: r["value"])
        print(json.dumps(best))
        return
    if "--large-sweep" in sys.argv:
        # find the saturating batch for DGDM-Large (2048-node bucket):
        # batch 4 leaves the chip ~2.85 GB of a 16 GB HBM budget — sweep
        # upward until OOM or throughput rolls over. Each size is its own
        # tunnel compile; OOM is recorded, not fatal.
        results = []
        for b in (4, 8, 16, 32):
            try:
                r = bench_config(f"2048node_large_b{b}", node_features=1024,
                                 hidden_dims=(768, 512, 256, 128),
                                 num_steps=20, heads=16, layers=4,
                                 nodes=2048, n_real=2000, batch=b,
                                 n_iters=10)
                r["batch"] = b
                results.append(r)
                print(json.dumps(r), file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 - record OOM and stop
                print(json.dumps({"batch": b, "error":
                                  f"{type(exc).__name__}: {str(exc)[:200]}"}),
                      file=sys.stderr)
                break
        if results:
            best = max(results, key=lambda r: r["value"])
            print(json.dumps(best))
        return
    if "--ab-int8-infer" in sys.argv:
        # paired float-vs-int8 INFERENCE forward (models/quantized.py):
        # eligible Dense layers on the int8 MXU path, data-data matmuls
        # (adjacency aggregation, attention) unchanged. The logit cosine is
        # reported beside the speedup so the accuracy cost always travels
        # with the number.
        import jax
        import jax.numpy as jnp
        import numpy as np
        _enable_compile_cache()
        from dgdm_histopath_tpu.models import DGDMModel
        from dgdm_histopath_tpu.models.quantized import int8_apply
        from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
        from dgdm_histopath_tpu.ops.knn import knn_euclidean

        def mkgraph(seed, nodes=1024, n_real=1000, feat=768):
            rs = np.random.RandomState(seed)
            x = np.zeros((nodes, feat), np.float32)
            x[:n_real] = rs.randn(n_real, feat).astype(np.float32)
            pos = np.zeros((nodes, 2), np.float32)
            pos[:n_real] = rs.rand(n_real, 2)
            mask = np.zeros((nodes,), bool)
            mask[:n_real] = True
            idx, dist, valid = knn_euclidean(jnp.asarray(pos),
                                             jnp.asarray(mask), 8)
            ea = jnp.stack([dist, jnp.exp(-10.0 * dist),
                            jnp.zeros_like(dist)], -1)
            return PaddedGraph(x=jnp.asarray(x), pos=jnp.asarray(pos),
                               nbr_idx=idx, nbr_mask=valid, edge_attr=ea,
                               node_mask=jnp.asarray(mask),
                               y=jnp.asarray(seed % 2, jnp.int32))

        batch = 32
        g = batch_graphs([mkgraph(i) for i in range(batch)])
        model = DGDMModel(node_features=768, hidden_dims=(512, 256, 128),
                          num_diffusion_steps=10, attention_heads=8,
                          graph_layers=4, num_classes=2, pooling="attention")
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "masking": jax.random.PRNGKey(2),
             "dropout": jax.random.PRNGKey(3)}, g, mode="pretrain")
        fwd_f = jax.jit(lambda p, gg: model.apply(
            p, gg, mode="inference", deterministic=True)
            ["classification_logits"])
        fwd_q = jax.jit(lambda p, gg: int8_apply(
            model, p, gg, mode="inference", deterministic=True)
            ["classification_logits"])

        rows, logits = [], {}
        for tag, fn in (("float", fwd_f), ("int8", fwd_q)):
            logits[tag] = np.asarray(fn(params, g), np.float32)  # warmup
            def run(k, fn=fn):
                t0 = time.perf_counter()
                out = None
                for _ in range(k):
                    out = fn(params, g)
                float(out.ravel()[0])                # real sync point
                return time.perf_counter() - t0
            run(3)
            t1, t2 = run(10), run(30)
            per = (t2 - t1) / 20
            rows.append({"tag": tag, "forward_ms": round(per * 1e3, 3),
                         "graphs_per_s": round(batch / per, 1)})
            print(json.dumps(rows[-1]), file=sys.stderr)
        a, b = logits["float"], logits["int8"]
        cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                   * np.linalg.norm(b, axis=-1) + 1e-12)
        print(json.dumps({
            "metric": "ab_int8_inference_base_b32", "rows": rows,
            "speedup": round(rows[0]["forward_ms"] / rows[1]["forward_ms"], 3),
            "logit_cosine_min": round(float(cos.min()), 5),
            "timing": "forced-fetch two-point slope, paired in one process"}))
        return
    if "--scale-sweep" in sys.argv:
        # node-count scaling of the windowed+banded config (ADR-0004
        # add.9/10) at Large geometry, constant total-node budget per step
        # (8192 nodes): the combined config is linear in N, so ms/graph
        # should scale ~linearly with bucket size where the dense parity
        # formulation is quadratic. This is the capability the reference
        # structurally lacks — it caps slides at max_patches=2000
        # (/root/reference/configs/dgdm_large.yaml) because its dense N^2
        # spatial attention and per-graph Python loops make larger graphs
        # intractable. A guarded dense row at 8192 records the cliff.
        rows = []
        for nodes, b in ((2048, 4), (4096, 2), (8192, 1)):
            try:
                r = bench_config(f"scale_windowed_{nodes}", node_features=1024,
                                 hidden_dims=(768, 512, 256, 128),
                                 num_steps=20, heads=16, layers=4,
                                 nodes=nodes, n_real=nodes - 48, batch=b,
                                 n_iters=10, spatial_window=128,
                                 graph_window=128)
                rows.append({"nodes": nodes, "batch": b,
                             "step_ms": r["step_time_ms"],
                             "ms_per_graph": round(r["step_time_ms"] / b, 3),
                             "ms_per_knode": round(
                                 r["step_time_ms"] / b / (nodes / 1024), 3),
                             "graphs_per_s": r["value"], "mfu": r["mfu"],
                             "hbm_gb": (r.get("memory_analysis") or {}).get(
                                 "hbm_highwater_gb")})
            except Exception as exc:  # noqa: BLE001 - record OOM, continue
                rows.append({"nodes": nodes, "batch": b, "error":
                             f"{type(exc).__name__}: {str(exc)[:200]}"})
            print(json.dumps(rows[-1]), file=sys.stderr)
        dense8k = None
        if "--with-dense-8k" in sys.argv:
            try:
                r = bench_config("scale_dense_8192", node_features=1024,
                                 hidden_dims=(768, 512, 256, 128),
                                 num_steps=20, heads=16, layers=4,
                                 nodes=8192, n_real=8144, batch=1, n_iters=5)
                dense8k = {"nodes": 8192, "batch": 1,
                           "step_ms": r["step_time_ms"],
                           "graphs_per_s": r["value"], "mfu": r["mfu"],
                           "hbm_gb": (r.get("memory_analysis") or {}).get(
                               "hbm_highwater_gb")}
            except Exception as exc:  # noqa: BLE001
                dense8k = {"nodes": 8192, "batch": 1, "error":
                           f"{type(exc).__name__}: {str(exc)[:200]}"}
            print(json.dumps(dense8k), file=sys.stderr)
        print(json.dumps({"metric": "scale_sweep_large_windowed_w128",
                          "rows": rows, "dense_8192": dense8k}))
        return
    if "--ablate-large" in sys.argv:
        # component split of the LARGE step (2048-node bucket, batch 4):
        # the batch sweep shows the chip saturated at batch 4 (linear
        # per-graph scaling 11.4->12.0 ms/graph, b32 OOM) — this locates
        # where the 45 ms goes before any kernel work at N=2048
        rows = []
        for tag, sp, hi in (("full", True, True), ("no_spatial", False, True),
                            ("no_unet", True, False),
                            ("encoder_only", False, False)):
            r = bench_config(f"ablate_large_{tag}", node_features=1024,
                             hidden_dims=(768, 512, 256, 128), num_steps=20,
                             heads=16, layers=4, nodes=2048, n_real=2000,
                             batch=4, n_iters=10, use_spatial=sp, use_hier=hi)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"]})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ablation_large_b4", "rows": rows}))
        return
    if "--ablate-base" in sys.argv:
        # component split of the BASE step (1024-node bucket, batch 32):
        # locates where the ~66 ms goes (spatial attention vs U-Net vs
        # encoder) to aim round-4 work; paired in one process per add.7
        rows = []
        for tag, sp, hi in (("full", True, True), ("no_spatial", False, True),
                            ("no_unet", True, False),
                            ("encoder_only", False, False)):
            r = bench_config(f"ablate_base_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, use_spatial=sp, use_hier=hi)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"]})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ablation_base_b32", "rows": rows}))
        return
    if "--ablate-floor" in sys.argv:
        # split of the 27.9 ms encoder_only floor (add.15) + the windowed
        # combined step: where does non-attention time live (diffusion scan
        # depth, contrastive N^2 loss, banded adjacency), and what does the
        # supervised finetune step cost (the serving-relevant step)? All
        # paired in one process per add.7.
        rows = []
        for tag, kw in (
            ("encoder_only", dict(use_spatial=False, use_hier=False)),
            ("enc_no_contrastive", dict(
                use_spatial=False, use_hier=False,
                trainer_overrides={"use_contrastive_loss": False})),
            ("enc_diffsteps1", dict(use_spatial=False, use_hier=False,
                                    num_steps=1)),
            ("enc_band64", dict(use_spatial=False, use_hier=False,
                                graph_window=64)),
            ("combined_w64", dict(spatial_window=64, graph_window=64)),
            ("combined_w64_no_contrastive", dict(
                spatial_window=64, graph_window=64,
                trainer_overrides={"use_contrastive_loss": False})),
            ("full_finetune", dict(phase="finetune")),
            ("combined_w64_finetune", dict(spatial_window=64,
                                           graph_window=64,
                                           phase="finetune")),
        ):
            kw.setdefault("num_steps", 10)
            r = bench_config(f"floor_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128),
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, **kw)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "mfu_model_math": r.get("mfu_model_math")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ablation_floor_base_b32", "rows": rows}))
        return
    if "--ab-attn-traffic" in sys.argv:
        # whole-program A/B of spatial attention's HBM-buffer dtype: f32
        # (strict) vs bf16 (halves the bandwidth-bound [B,H,N,N] traffic).
        # ADR lesson: only whole-step measurements count.
        rows = []
        for tag, td in (("f32_traffic", None), ("bf16_traffic", "bfloat16")):
            r = bench_config(f"attn_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20,
                             attention_traffic_dtype=td)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"]})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_attn_traffic_base_b32", "rows": rows}))
        return
    if "--ab-window" in sys.argv:
        # whole-step A/B of block-local (windowed) spatial attention vs the
        # dense all-pairs pass (nn.attention window_size; an approximation —
        # opt-in scaling lever, so the measurement question is pure speed).
        # Paired back-to-back in one process: only the paired delta counts
        # (idle-host baseline drifts day to day, ADR-0004 add.7).
        rows = []
        for tag, ov in (("dense", {}), ("window128", {"spatial_window": 128}),
                        ("window64", {"spatial_window": 64})):
            r = bench_config(f"win_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_spatial_window_base_b32",
                          "rows": rows}))
        return
    if "--ab-window-large" in sys.argv:
        # the windowed pass at its actual target: DGDM-Large's 2048-node
        # bucket, where the N^2 spatial term is 4x the Base share
        rows = []
        for tag, ov in (("dense", {}), ("window256", {"spatial_window": 256}),
                        ("window128", {"spatial_window": 128})):
            r = bench_config(f"winL_{tag}", node_features=1024,
                             hidden_dims=(768, 512, 256, 128), num_steps=20,
                             heads=16, layers=4, nodes=2048, n_real=2000,
                             batch=4, n_iters=10, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_spatial_window_large_b4",
                          "rows": rows}))
        return
    if "--large-windowed-sweep" in sys.argv:
        # DGDM-Large batch sweep under the FULL windowed scaling config
        # (spatial_window + graph_window = 128): the dense sweep OOMed at
        # batch 32 (>16 GB) with batch 4 already compute-saturated; the
        # windowed config cuts temp HBM 65%+ (ADR-0004 add.9/10), so larger
        # batches may fit AND the per-graph time should drop ~2.4x+
        results = []
        for b in (4, 8, 16, 32):
            try:
                r = bench_config(f"2048node_largewin_b{b}", node_features=1024,
                                 hidden_dims=(768, 512, 256, 128),
                                 num_steps=20, heads=16, layers=4,
                                 nodes=2048, n_real=2000, batch=b,
                                 n_iters=10, spatial_window=128,
                                 graph_window=128)
                r["batch"] = b
                results.append(r)
                print(json.dumps(r), file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 - record OOM and stop
                print(json.dumps({"batch": b, "error":
                                  f"{type(exc).__name__}: {str(exc)[:200]}"}),
                      file=sys.stderr)
                break
        if results:
            best = max(results, key=lambda r: r["value"])
            print(json.dumps(best))
        return
    if "--ab-band" in sys.argv:
        # whole-step A/B of banded (Morton-window) message passing: the
        # encoder's [N,N] weighted-adjacency matmuls + one-hot key gather
        # become [nb,W,3W] banded forms (ops.graph banded helpers). Third
        # row stacks the windowed spatial attention on top — the combined
        # scaling config. Speed-only question (semantics gated separately
        # by scripts/eval_camelyon16.py --ab-window); paired in one process.
        rows = []
        for tag, ov in (("dense", {}),
                        ("band64", {"graph_window": 64}),
                        ("band64_win64", {"graph_window": 64,
                                          "spatial_window": 64})):
            r = bench_config(f"band_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_graph_window_base_b32", "rows": rows}))
        return
    if "--ab-moe" in sys.argv:
        # whole-step cost of the MoE tier at Base batch 32: the question is
        # OVERHEAD (a width/capacity lever, params scale with E at constant
        # per-token FLOPs), not speedup. Paired in one process per add.7.
        rows = []
        for tag, ov in (("dense", {}),
                        ("moe4_top1", {"moe_experts": 4}),
                        ("moe8_top2", {"moe_experts": 8, "moe_top_k": 2})):
            r = bench_config(f"moe_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "params": r.get("params")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_moe_base_b32", "rows": rows}))
        return
    if "--ab-base-128" in sys.argv:
        # window-size sweep of the COMBINED config at Base: W=64 measured
        # 1.23x (add.10) but its [nb,W,3W] band matmuls put only 64 rows on
        # the 128-row MXU tile; W=128 doubles the banded work yet tiles
        # perfectly — paired against dense and the W=64 combined config.
        rows = []
        for tag, ov in (("dense", {}),
                        ("band64_win64", {"graph_window": 64,
                                          "spatial_window": 64}),
                        ("band128_win128", {"graph_window": 128,
                                            "spatial_window": 128})):
            r = bench_config(f"b128_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_combined_window_size_base_b32",
                          "rows": rows}))
        return
    if "--ab-band-large" in sys.argv:
        # banded message passing at DGDM-Large (2048-node bucket): the
        # [N,N] adjacency share is 4x Base. window128 matches the measured
        # spatial-window optimum there (ADR-0004 add.9).
        rows = []
        for tag, ov in (("dense", {}),
                        ("band128", {"graph_window": 128}),
                        ("band128_win128", {"graph_window": 128,
                                            "spatial_window": 128})):
            r = bench_config(f"bandL_{tag}", node_features=1024,
                             hidden_dims=(768, 512, 256, 128), num_steps=20,
                             heads=16, layers=4, nodes=2048, n_real=2000,
                             batch=4, n_iters=10, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_graph_window_large_b4", "rows": rows}))
        return
    if "--ab-key-gather" in sys.argv:
        # whole-step A/B: XLA one-hot key gather (round-2 default) vs the
        # VMEM one-hot Pallas kernel (ops/pallas/gather_rows). Run on an
        # IDLE host: contention makes the step dispatch-bound and absorbs
        # device-side deltas (ADR-0004 add.4).
        rows = []
        for tag, ov in (("onehot_xla", {"gather_impl": "onehot"}),
                        ("pallas_rows", {})):        # auto -> kernel on TPU
            r = bench_config(f"kg_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, **ov)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_key_gather_impl_base_b32",
                          "rows": rows}))
        return
    if "--ablate-gather" in sys.argv:
        # isolate the DynamicGraphLayer KEY GATHER's whole-step cost: row B
        # replaces gather_neighbors with a same-shape broadcast of the first
        # K source rows (every downstream einsum keeps its real shape and
        # operands, so XLA can't fold them away) — the step delta is the
        # cost of building/consuming the [B,N,K,N] one-hot selector. The
        # stub changes semantics (scores see wrong keys), which is fine for
        # a timing ablation: loss stays finite, compute graph stays honest.
        import dgdm_histopath_tpu.nn.graph_layers as _gl
        real = _gl.gather_neighbors

        def _stub(x, nbr_idx, impl="auto"):
            k = nbr_idx.shape[-1]
            first_k = x[..., :k, :]                        # [..., K, F]
            tgt = (*x.shape[:-2], x.shape[-2], k, x.shape[-1])
            return jnp_broadcast(first_k, tgt)

        import jax.numpy as _jnp

        def jnp_broadcast(a, shape):
            return _jnp.broadcast_to(a[..., None, :, :], shape)

        rows = []
        for tag, fn in (("full", real), ("gather_stubbed", _stub)):
            _gl.gather_neighbors = fn
            try:
                r = bench_config(f"abg_{tag}", node_features=768,
                                 hidden_dims=(512, 256, 128), num_steps=10,
                                 heads=8, layers=4, nodes=1024, n_real=1000,
                                 batch=32, n_iters=20)
            finally:
                _gl.gather_neighbors = real
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"],
                         "temp_bytes": (r.get("memory_analysis") or {}).get(
                             "temp_size_in_bytes")})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ab_key_gather_base_b32", "rows": rows}))
        return
    if "--ablate" in sys.argv:
        # component split of the Base step (fetch-synced; each row is its
        # own compile): full vs no-spatial vs no-hierarchical
        rows = []
        for tag, sp, hi in (("full", True, True), ("no_spatial", False, True),
                            ("no_unet", True, False),
                            ("encoder_only", False, False)):
            r = bench_config(f"ablate_{tag}", node_features=768,
                             hidden_dims=(512, 256, 128), num_steps=10,
                             heads=8, layers=4, nodes=1024, n_real=1000,
                             batch=32, n_iters=20, use_spatial=sp,
                             use_hier=hi)
            rows.append({"tag": tag, "step_ms": r["step_time_ms"],
                         "graphs_per_s": r["value"], "mfu": r["mfu"]})
            print(json.dumps(rows[-1]), file=sys.stderr)
        print(json.dumps({"metric": "ablation_base_b32", "rows": rows}))
        return
    # batch 32 saturates the chip (fetch-synced sweep, ADR-0004 add.3/4:
    # b32 is the throughput optimum; earlier 11k-g/s figures were
    # dispatch-timed and retracted); --parity benches the reference's
    # batch-4 config instead
    headline_batch = 4 if "--parity" in sys.argv else 32
    base = bench_config("1024node_base", node_features=768,
                        hidden_dims=(512, 256, 128), num_steps=10, heads=8,
                        layers=4, nodes=1024, n_real=1000,
                        batch=headline_batch, n_iters=20)
    base["batch"] = headline_batch
    if "--windowed" in sys.argv:
        # windowed+banded scaling config rider (spatial_window +
        # graph_window; ADR-0004 add.9/10). bench_config band-builds the
        # graphs for windowed configs, so this benches the EXACT
        # banded/windowed semantics (the TissueGraphBuilder(knn_window=W)
        # pairing the trainer enforces). The headline `value` stays the
        # dense parity number; this row records what the documented scaling
        # levers buy on the same chip.
        try:
            win = bench_config("1024node_base_windowed", node_features=768,
                               hidden_dims=(512, 256, 128), num_steps=10,
                               heads=8, layers=4, nodes=1024, n_real=1000,
                               batch=headline_batch, n_iters=20,
                               spatial_window=64, graph_window=64)
            win["batch"] = headline_batch
            win["semantics"] = ("windowed+banded scaling config (window 64)"
                                " on band-built graphs — exact semantics")
            if base.get("flops_per_step"):
                dense_per_graph = base["flops_per_step"] / base["batch"]
                a100_bound = A100_ASSUMED_MFU * A100_PEAK_BF16 / dense_per_graph
                win["vs_baseline"] = round(win["value"] / a100_bound, 3)
                win["baseline_derivation"] = (
                    "A100 bound derived from the DENSE per-graph FLOPs "
                    "(the common workload)")
            base["windowed"] = win
        except Exception as exc:  # noqa: BLE001
            base["windowed"] = {
                "error": f"{type(exc).__name__}: {str(exc)[:200]}"}
    if "--no-large" not in sys.argv:
        # DGDM-Large rides along by default so every bench record carries
        # both configs (VERDICT r2 #4); guarded — a tunnel failure on the
        # second compile must not lose the Base headline.
        #
        # Since VERDICT r3 #4 the SHIPPED dgdm_large.yaml defaults to the
        # windowed+banded scaling config (spatial_window=graph_window=128,
        # band-built graphs — models/presets.py default_window_policy), so
        # the "large" rider IS the windowed run; the dense all-pairs
        # reference-parity semantics ride as "large_dense_parity".
        try:
            ldense = bench_config("2048node_large_dense", node_features=1024,
                                  hidden_dims=(768, 512, 256, 128),
                                  num_steps=20, heads=16, layers=4,
                                  nodes=2048, n_real=2000, batch=4, n_iters=10)
            ldense["batch"] = 4
            ldense["semantics"] = ("dense all-pairs/all-edges reference-"
                                   "parity semantics (spatial_window=None)")
            base["large_dense_parity"] = ldense
        except Exception as exc:  # noqa: BLE001
            ldense = {}
            base["large_dense_parity"] = {
                "error": f"{type(exc).__name__}: {str(exc)[:200]}"}
        try:
            # the shipped configs/dgdm_large.yaml default — the measured
            # 2.76x paired win (ADR-0004 add.10 hardware table); exact on
            # band-built graphs (data.spatial_sort + data.knn_window, the
            # yaml default), an approximation otherwise. Accuracy evidence:
            # paired bootstrap AUC delta vs dense on the calibrated hard
            # gate, docs/results/c16_hard/report_hard.json.
            lw = bench_config("2048node_large", node_features=1024,
                              hidden_dims=(768, 512, 256, 128),
                              num_steps=20, heads=16, layers=4,
                              nodes=2048, n_real=2000, batch=4, n_iters=10,
                              spatial_window=128, graph_window=128)
            lw["batch"] = 4
            lw["semantics"] = ("windowed+banded scaling config (window 128)"
                               " — the shipped dgdm_large.yaml default; "
                               "exact on band-built graphs (the yaml "
                               "default), approximation otherwise")
            # vs_baseline: the A100 bound must be derived from the DENSE
            # formulation's per-graph FLOPs (the workload both systems
            # solve), not the windowed program's smaller count — otherwise
            # reducing work reads as losing ground.
            if ldense.get("flops_per_step"):
                dense_per_graph = ldense["flops_per_step"] / ldense["batch"]
                a100_bound = A100_ASSUMED_MFU * A100_PEAK_BF16 / dense_per_graph
                lw["vs_baseline"] = round(lw["value"] / a100_bound, 3)
                lw["baseline_derivation"] = (
                    "same A100 lower bound as the dense rows, derived from "
                    "the DENSE per-graph FLOPs (the common workload); the "
                    "windowed program does less arithmetic for the same "
                    "step, which must not inflate its baseline")
            base["large"] = lw
        except Exception as exc:  # noqa: BLE001
            base["large"] = {"error": f"{type(exc).__name__}: {str(exc)[:200]}"}
    # DRIVER CONTRACT (VERDICT r3 weak #4): print exactly ONE *compact*
    # JSON line (<~1 kB) — round-3's full record overflowed the driver's
    # tail capture and BENCH_r03 recorded `parsed: null`. The full record
    # (flops accounting, memory analysis, timing protocol, sub-benches)
    # goes to docs/results/bench_full.json; the stdout line carries the
    # headline numbers plus one-line summaries of the riders.
    import os
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "results", "bench_full.json")
    try:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as fh:
            json.dump(base, fh, indent=1)
    except OSError:
        full_path = None

    def _brief(r):
        if not isinstance(r, dict):
            return None
        if "error" in r:
            return {"error": r["error"][:120]}
        return {"value": r.get("value"),
                "vs_baseline": r.get("vs_baseline"),
                "mfu": r.get("mfu"),
                "mfu_model_math": r.get("mfu_model_math"),
                "step_time_ms": r.get("step_time_ms")}

    compact = {
        "metric": base["metric"],
        "value": base["value"],
        "unit": base["unit"],
        "vs_baseline": base["vs_baseline"],
        "mfu": base.get("mfu"),
        "mfu_model_math": base.get("mfu_model_math"),
        "step_time_ms": base.get("step_time_ms"),
        "batch": base.get("batch"),
        "device": base.get("device"),
    }
    for key in ("windowed", "large", "large_dense_parity"):
        if key in base:
            compact[key] = _brief(base[key])
    if full_path:
        compact["detail"] = "docs/results/bench_full.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
