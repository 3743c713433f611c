"""Serving-layer A/B: serialized requests vs dynamic batching.

Closed-loop load test against the real HTTP server (stdlib client threads,
inline-graph /predict payloads): measures requests/s and latency
percentiles with ``dynamic_batch=0`` (one device call per request, the
single-tenant default) vs ``dynamic_batch=N`` (concurrent requests
coalesce into predict_batch calls — deployment/batching.py).

The win is per-call dispatch amortization, so it scales with device
dispatch overhead: small on in-process CPU, large on remote/tunneled
accelerators (~60 ms fixed dispatch+fetch per call on the axon tunnel,
see bench.py timing protocol). Run on CPU by default so it measures the
serving machinery, not the tunnel.

Usage: python benchmarks/bench_serving.py [--clients 8] [--requests 64]
       [--nodes 64] [--batch 16] [--tpu]
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import threading
import time


def build_payload(n_nodes: int) -> str:
    import numpy as np
    import jax.numpy as jnp
    from dgdm_histopath_tpu.ops.knn import knn_euclidean

    rs = np.random.RandomState(0)
    n_real = int(n_nodes * 0.8)
    x = np.zeros((n_nodes, 16), np.float32)
    x[:n_real] = rs.randn(n_real, 16).astype(np.float32)
    pos = np.zeros((n_nodes, 2), np.float32)
    pos[:n_real] = rs.rand(n_real, 2).astype(np.float32)
    node_mask = np.zeros((n_nodes,), bool)
    node_mask[:n_real] = True
    idx, dist, mask = knn_euclidean(jnp.asarray(pos), jnp.asarray(node_mask), 8)
    edge_attr = np.stack([np.asarray(dist), np.exp(-10.0 * np.asarray(dist)),
                          np.zeros_like(np.asarray(dist))], axis=-1)
    graph = {"x": x.tolist(), "pos": pos.tolist(),
             "nbr_idx": np.asarray(idx).tolist(),
             "nbr_mask": np.asarray(mask).tolist(),
             "edge_attr": edge_attr.tolist(),
             "node_mask": node_mask.tolist()}
    return json.dumps({"graph": graph})


def make_predictor():
    import jax
    from dgdm_histopath_tpu.evaluation import DGDMPredictor
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import batch_graphs

    model = DGDMModel(node_features=16, hidden_dims=(32, 16),
                      num_diffusion_steps=2, attention_heads=4,
                      graph_layers=1, num_classes=2, use_hierarchical=False,
                      compute_dtype="float32")
    # init on a placeholder graph of the benchmark bucket
    import numpy as np
    import jax.numpy as jnp
    from dgdm_histopath_tpu.ops.graph import PaddedGraph
    from dgdm_histopath_tpu.ops.knn import knn_euclidean
    pos = jnp.asarray(np.random.RandomState(1).rand(64, 2), jnp.float32)
    mask = jnp.ones((64,), bool)
    idx, dist, nmask = knn_euclidean(pos, mask, 8)
    g = batch_graphs([PaddedGraph(
        x=jnp.zeros((64, 16)), pos=pos, nbr_idx=idx, nbr_mask=nmask,
        edge_attr=jnp.zeros((64, 8, 3)), node_mask=mask)])
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    return DGDMPredictor(model=model, params=params, feature_extractor="none")


def run_load(port: int, payload: str, clients: int, total: int):
    """Closed-loop: `clients` threads issue requests until `total` served."""
    latencies = []
    lock = threading.Lock()
    counter = {"n": 0}

    def worker():
        conn = http.client.HTTPConnection("localhost", port, timeout=120)
        while True:
            with lock:
                if counter["n"] >= total:
                    return
                counter["n"] += 1
            t0 = time.perf_counter()
            conn.request("POST", "/predict", body=payload,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            body = r.read()
            if r.status != 200:
                raise RuntimeError(f"status {r.status}: {body[:200]}")
            with lock:
                latencies.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    latencies.sort()
    p = lambda q: latencies[min(len(latencies) - 1, int(q * len(latencies)))]
    return {"wall_s": round(wall, 3), "req_per_s": round(total / wall, 2),
            "p50_ms": round(p(0.50) * 1e3, 1), "p95_ms": round(p(0.95) * 1e3, 1)}


def bench_mode(predictor, payload, port, clients, total, dynamic_batch,
               wait_ms):
    from dgdm_histopath_tpu.deployment import InferenceServer
    server = InferenceServer(predictor, port=port, rate_limit_per_s=10000,
                             dynamic_batch=dynamic_batch,
                             batch_wait_ms=wait_ms)
    server.start(background=True)
    try:
        # warm deterministically: compile every power-of-two bucket the
        # batcher can produce (serving pads coalesced batches to these)
        from dgdm_histopath_tpu.deployment.serving import graph_from_json
        g = graph_from_json(json.loads(payload)["graph"])
        t_warm = time.perf_counter()
        if server.batcher is not None:
            size = 1
            while size <= dynamic_batch:
                server.batcher.batch_fn([g] * size)
                size *= 2
            server.batcher.stats["batches"] = 0
            server.batcher.stats["items"] = 0
            server.batcher.stats["max_batch_seen"] = 0
        else:
            server.predictor.predict_batch([g])
        res = run_load(port, payload, clients, total)
        res["warm_compile_s"] = round(time.perf_counter() - t_warm, 1)
        if server.batcher is not None:
            res["mean_batch"] = round(server.batcher.mean_batch_size, 2)
            res["max_batch"] = int(server.batcher.stats["max_batch_seen"])
        return res
    finally:
        server.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--nodes", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--wait-ms", type=float, default=5.0)
    ap.add_argument("--port", type=int, default=18300)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend; slow compiles")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    predictor = make_predictor()
    payload = build_payload(args.nodes)

    serial = bench_mode(predictor, payload, args.port, args.clients,
                        args.requests, 0, args.wait_ms)
    batched = bench_mode(predictor, payload, args.port + 1, args.clients,
                         args.requests, args.batch, args.wait_ms)
    speedup = round(batched["req_per_s"] / serial["req_per_s"], 3)
    print(json.dumps({"bench": "serving_ab", "clients": args.clients,
                      "requests": args.requests, "nodes": args.nodes,
                      "serialized": serial, "dynamic_batch": batched,
                      "speedup": speedup,
                      "backend": jax.devices()[0].platform}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
