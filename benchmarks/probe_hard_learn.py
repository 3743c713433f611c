"""Learning-curve probe for the calibrated hard accuracy benchmark.

The round-4 main eval run landed the DGDM Base model at chance AUC
(0.485) on the calibrated hard stand-in task, while (a) the nuclei-count
oracle reaches 0.92 (benchmarks/probe_hard_task.py) and (b) a plain
logistic regression over mean/max-aggregated cached node features
reaches 0.73 — i.e. the features carry the signal but the training loop
failed to extract it. This probe trains directly on the CACHED graphs
(docs/results/c16_hard/graph_cache) with configurable hyperparameters
and prints per-epoch val/test AUC learning curves, so the failure can
be localized (undertrained vs overfit vs collapse) without re-running
preprocessing.

Reference training surface being diagnosed: two-phase curriculum
/root/reference/dgdm_histopath/training/trainer.py:91-175.

Usage (CPU, background — each config is ~10-30 min on the 1-core host):
    python benchmarks/probe_hard_learn.py --lr 1e-3 --pretrain-epochs 4 \
        --finetune-epochs 60 --tag baseline
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", type=Path,
                    default=REPO / "docs/results/c16_hard")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight-decay", type=float, default=1e-5)
    ap.add_argument("--pretrain-epochs", type=int, default=4)
    ap.add_argument("--finetune-epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shuffle", action="store_true",
                    help="reshuffle train batches every epoch (the eval "
                    "script uses FIXED batch composition)")
    ap.add_argument("--scheduler", default="cosine",
                    choices=("cosine", "onecycle", "none"))
    ap.add_argument("--finetune-lr-factor", type=float, default=0.1,
                    help="LR multiplier after the pretrain->finetune "
                    "transition (TrainerConfig default 0.1 — tuned for LONG "
                    "pretraining; with a short pretrain phase the x0.1 drop "
                    "makes the classifier underfit: train CE stuck ~0.69)")
    ap.add_argument("--eval-every", type=int, default=2)
    ap.add_argument("--cache-tag", default="",
                    help="graph-cache filename suffix, e.g. "
                    "'_simple_cnn-stats' to train on the +stats featurizer "
                    "caches (eval_camelyon16 --extractor simple_cnn+stats)")
    ap.add_argument("--stats-only", action="store_true",
                    help="keep only the trailing 14 stain-stats feature dims "
                    "(equivalent to --extractor stats): the 512 random-CNN "
                    "dims carry no signal and overfit 96 train slides "
                    "(pooled-LR: 526-d train 1.0/test 0.73 vs 14-d 0.94/0.83)")
    ap.add_argument("--per-slide-norm", action="store_true",
                    help="z-score node features within each slide (median/"
                    "std over valid nodes) — exposes the within-slide focal "
                    "contrast the task is built on (probe_hard_task.py "
                    "oracle notes)")
    ap.add_argument("--hidden", default="512,256,128",
                    help="comma-separated model hidden dims")
    ap.add_argument("--graph-layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import jax.random as jrandom
    import numpy as np

    from dgdm_histopath_tpu.data.graph_io import load_graph
    from dgdm_histopath_tpu.evaluation.metrics import _roc_auc
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import batch_graphs
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    man = json.load(open(args.root / "synthetic_data/manifest.json"))
    cache = args.root / "graph_cache"
    train, test = [], []
    for s in man["slides"]:
        p = cache / f"{s['slide']}_b256{args.cache_tag}.npz"
        if not p.exists():
            raise SystemExit(f"missing cached graph {p} — run "
                             "scripts/eval_camelyon16.py --synthetic --hard "
                             "first to populate the cache")
        g = load_graph(p)
        x = g.x
        if args.stats_only:
            from dgdm_histopath_tpu.models.vit import STAIN_STATS_DIM
            if x.shape[-1] <= STAIN_STATS_DIM:
                raise SystemExit("--stats-only needs a '+stats' cache-tag "
                                 f"(cache feature dim {x.shape[-1]})")
            x = x[:, -STAIN_STATS_DIM:]
        if args.per_slide_norm:
            m = g.node_mask.astype(bool)
            valid = np.asarray(x)[np.asarray(m)]
            x = (x - np.median(valid, 0)) / (valid.std(0) + 1e-6)
            x = x * g.node_mask[:, None]
        g = g.replace(x=jnp.asarray(x, jnp.float32))
        if s["split"] == "training":
            train.append(g.replace(y=jnp.asarray(s["filed_label"], jnp.int32)))
        else:
            test.append(g.replace(y=jnp.asarray(s["true_label"], jnp.int32)))

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(train))
    n_val = max(1, len(order) // 5)
    val_idx, tr_idx = order[:n_val], order[n_val:]

    def as_batches(graphs, idxs, bs):
        return [batch_graphs([graphs[i] for i in idxs[j:j + bs]])
                for j in range(0, len(idxs), bs)]

    val_batches = as_batches(train, val_idx, args.batch_size)
    test_batches = as_batches(test, np.arange(len(test)), args.batch_size)
    test_labels = np.concatenate(
        [np.asarray(b.y) for b in test_batches])
    val_labels = np.concatenate([np.asarray(b.y) for b in val_batches])

    feat_dim = train[0].x.shape[-1]
    hidden = tuple(int(h) for h in args.hidden.split(","))
    model = DGDMModel(node_features=feat_dim, hidden_dims=hidden,
                      attention_heads=args.heads,
                      num_diffusion_steps=10, dropout=args.dropout,
                      graph_layers=args.graph_layers, num_classes=2,
                      pooling="attention")
    total_epochs = args.pretrain_epochs + args.finetune_epochs
    steps_per_epoch = (len(tr_idx) + args.batch_size - 1) // args.batch_size
    trainer = DGDMTrainer(model, TrainerConfig(
        learning_rate=args.lr, weight_decay=args.weight_decay,
        warmup_steps=min(100, steps_per_epoch),
        max_epochs=total_epochs, pretrain_epochs=args.pretrain_epochs,
        scheduler_type=args.scheduler,
        finetune_lr_factor=args.finetune_lr_factor,
        steps_per_epoch=steps_per_epoch), use_mesh=False)
    example = as_batches(train, tr_idx[:args.batch_size], args.batch_size)[0]
    trainer.init_state(jrandom.PRNGKey(args.seed), example)

    def probs_for(batches):
        ps = []
        for b in batches:
            out = trainer.predict_step(b, return_attention=False)
            logits = np.asarray(out["classification_logits"], np.float64)
            p = np.exp(logits - logits.max(-1, keepdims=True))
            ps.append((p / p.sum(-1, keepdims=True))[:, 1])
        return np.concatenate(ps)

    curve = []
    t0 = time.time()
    for epoch in range(total_epochs):
        phase = trainer.phase_for_epoch(epoch)
        ep_rng = np.random.RandomState(args.seed * 1000 + epoch)
        idxs = (ep_rng.permutation(tr_idx) if args.shuffle else tr_idx)
        losses = []
        for b in as_batches(train, idxs, args.batch_size):
            m = trainer.training_step(b, epoch)
            losses.append(m["loss"])
        trainer.current_epoch = epoch + 1
        row = {"tag": args.tag, "epoch": epoch, "phase": phase,
               "train_loss": round(float(np.mean(losses)), 4)}
        if (phase == "finetune"
                and ((epoch - args.pretrain_epochs) % args.eval_every == 0
                     or epoch == total_epochs - 1)):
            row["val_auc"] = round(_roc_auc(val_labels,
                                            probs_for(val_batches)), 4)
            row["test_auc"] = round(_roc_auc(test_labels,
                                             probs_for(test_batches)), 4)
        row["wall_s"] = round(time.time() - t0, 1)
        curve.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(
            {"args": {k: str(v) for k, v in vars(args).items()},
             "curve": curve}, indent=2))
        print(f"[probe_hard_learn] -> {args.out}")


if __name__ == "__main__":
    main()
