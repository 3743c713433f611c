"""Benchmark harness: DGDM-Base training-step throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation: the reference publishes "~24 h training on 4× A100"
for the full dataset (reference README.md:276) but ships no machine-readable
throughput harness (SURVEY §6). We therefore benchmark the hot loop —
pretrain train-step throughput in graphs/sec on a DGDM-Base model over
1024-node tissue graphs — and report vs_baseline against a fixed reference
budget of 4 graphs/step ÷ measured-A100-step-estimate (0.25 s/step ⇒ 16
graphs/s on 4 GPUs ⇒ 4 graphs/s/device). vs_baseline = our graphs/s/chip ÷ 4.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import PaddedGraph, batch_graphs
    from dgdm_histopath_tpu.ops.knn import knn_euclidean
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    BATCH = 4          # dgdm_base.yaml data.batch_size
    NODES = 1024       # max_patches=1000 → 1024 bucket
    FEAT = 768

    def make_graph(seed, n_nodes=NODES, n_real=1000):
        rs = np.random.RandomState(seed)
        x = np.zeros((n_nodes, FEAT), np.float32)
        x[:n_real] = rs.randn(n_real, FEAT).astype(np.float32)
        pos = np.zeros((n_nodes, 2), np.float32)
        pos[:n_real] = rs.rand(n_real, 2)
        mask = np.zeros((n_nodes,), bool)
        mask[:n_real] = True
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), jnp.asarray(mask), 8)
        edge_attr = jnp.stack([dist, jnp.exp(-10.0 * dist), jnp.zeros_like(dist)], -1)
        return PaddedGraph(x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx,
                           nbr_mask=valid, edge_attr=edge_attr,
                           node_mask=jnp.asarray(mask),
                           y=jnp.asarray(seed % 2, jnp.int32))

    model = DGDMModel(
        node_features=FEAT, hidden_dims=(512, 256, 128), num_diffusion_steps=10,
        attention_heads=8, graph_layers=4, num_classes=2,
        use_spatial_attention=True, use_hierarchical=True, pooling="attention",
    )
    batch = batch_graphs([make_graph(i) for i in range(BATCH)])
    trainer = DGDMTrainer(
        model,
        TrainerConfig(learning_rate=1e-4, warmup_steps=10, pretrain_epochs=10,
                      steps_per_epoch=100),
        use_mesh=len(jax.devices()) > 1,
    )
    trainer.init_state(jax.random.PRNGKey(0), batch)

    # drive the compiled step directly: no per-step host syncs, batch stays
    # device-resident, state donated in place
    from dgdm_histopath_tpu.parallel.mesh import shard_batch
    if trainer.mesh is not None:
        batch = shard_batch(batch, trainer.mesh)
    step_fn = trainer._get_step_fn("pretrain", batch)
    state = trainer.state
    state, metrics = step_fn(state, batch)            # compile + warmup
    jax.block_until_ready(metrics["loss"])

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    graphs_per_sec = BATCH * n_iters / dt
    baseline_graphs_per_sec_per_device = 4.0
    print(json.dumps({
        "metric": "pretrain_step_throughput_1024node_graphs",
        "value": round(graphs_per_sec, 3),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(graphs_per_sec / baseline_graphs_per_sec_per_device, 3),
    }))


if __name__ == "__main__":
    main()
