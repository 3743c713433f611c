"""Worker process for the two-process multi-controller test (VERDICT r2 #6).

Launched by tests/test_spmd.py as ``python tests/multiproc_worker.py
<coordinator> <process_id> <num_processes> <outdir>`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=2``. Each controller:

  * joins the cluster via ``jax.distributed.initialize`` (the real
    multi-host entry point, CPU backend);
  * checks the global collective fabric (pmap psum over ALL processes'
    devices);
  * builds a ``HistopathDataModule`` whose shard defaults follow
    ``jax.process_index/count`` — the contract under test;
  * runs one shared-mesh train step on a global batch assembled from
    process-local shards via ``jax.make_array_from_process_local_data``;
  * writes its observations to ``<outdir>/proc<i>.json`` for the parent
    test to cross-check (disjoint train shards, identical val split,
    identical global loss).
"""

import json
import sys
from pathlib import Path


def main() -> None:
    coord, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), Path(sys.argv[4]))
    sys.path.insert(0, str(Path(__file__).parent.parent))   # repo root
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import make_synthetic_graph

    from dgdm_histopath_tpu.data.datamodule import HistopathDataModule
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import batch_graphs
    from dgdm_histopath_tpu.parallel.mesh import make_mesh
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    n_local = jax.local_device_count()
    # global collective across both processes' devices
    summed = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        np.ones((n_local,), np.float32))
    global_devices = int(summed[0])

    # deterministic dataset, identical on every controller
    graphs = [make_synthetic_graph(n_nodes=16, n_real=12, feat_dim=8, k=4,
                                   seed=i, num_classes=2) for i in range(24)]
    dm = HistopathDataModule(graphs, batch_size=2, seed=7,
                             train_split=0.5, val_split=0.25, test_split=0.25)
    train_idx = dm._subset("train").indices.tolist()
    val_idx = dm._subset("val").indices.tolist()

    # shared-mesh train step: global batch of 4 (2 per controller), real
    # tp/dp shardings come from the trainer's mesh path
    mesh = make_mesh(axes=("data",))        # over ALL global devices
    model = DGDMModel(node_features=8, hidden_dims=(16, 8),
                      num_diffusion_steps=2, attention_heads=4,
                      graph_layers=1, num_classes=2, use_hierarchical=False,
                      use_spatial_attention=False, compute_dtype="float32")
    trainer = DGDMTrainer(model, TrainerConfig(
        learning_rate=1e-3, warmup_steps=1, pretrain_epochs=0,
        steps_per_epoch=4), mesh=mesh)

    # train_idx is already THIS controller's strided shard: every process
    # contributes its own first two shard members to the global batch of 4
    local = batch_graphs([graphs[train_idx[0]], graphs[train_idx[1]]])
    sharding = NamedSharding(mesh, P("data"))

    def globalize(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(leaf))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(leaf))

    gbatch = jax.tree_util.tree_map(globalize, local)
    trainer.init_state(jax.random.PRNGKey(0), gbatch)
    metrics = trainer.training_step(gbatch, epoch=1, prepared=True,
                                    materialize=False)
    loss = float(metrics["loss"])     # fully-replicated global scalar

    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / f"proc{pid}.json").write_text(json.dumps({
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": n_local,
        "global_devices_via_psum": global_devices,
        "num_shards": dm.num_shards,
        "shard_index": dm.shard_index,
        "train_indices": train_idx,
        "val_indices": val_idx,
        "loss": loss,
        "accuracy": float(metrics.get("accuracy", float("nan"))),
    }))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
