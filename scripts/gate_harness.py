"""Shared multi-seed A/B gate harness for the staged accuracy evaluations.

Both calibrated hard gates (CAMELYON16 binary — ``eval_camelyon16.py --hard``
— and TCGA-BRCA 4-subtype — ``eval_tcga.py --hard``) run the same protocol:

  variants (dense / window{W} / moe{E} / scratch, + int8 rider on dense)
    x training seeds (``--train-seed 0,1,...`` — data seed stays pinned,
      so every replicate shares the SAME test set and arms pool with
      :func:`~dgdm_histopath_tpu.evaluation.metrics.pooled_paired_bootstrap_delta`)

with per-arm crash-resume (``variant_{tag}_s{seed}[t{tseed}].npz`` carrying
test probs + labels + metrics + the arm's config fingerprint) and per-seed
reports. All seeds run IN ONE PROCESS and each arm's model/trainer is built
once and re-initialized per seed, so the jitted train/eval programs compile
once per arm for the whole replicate set — on the remote-compile TPU tunnel
(minutes per program) this is what makes seed replicates affordable
(VERDICT r4 #3).

Binary tasks store 1-d tumor-probability vectors (back-compatible with the
round-4 c16_hard npz layout); multi-class tasks store the full ``[N, C]``
probability matrix and pool with macro one-vs-rest AUC.

Reference protocol being exceeded: the reference publishes single-number
accuracy tables with no seed replication or CIs at all
(``/root/reference/README.md:267-271``).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def slide_to_graph(path: Path, label: int, processor, builder, cache_dir: Path,
                   bucket: int, sort_tag: str = ""):
    """Preprocess one slide into a cached PaddedGraph."""
    from dgdm_histopath_tpu.data.graph_io import load_graph, save_graph
    cache = cache_dir / f"{path.stem}_b{bucket}{sort_tag}.npz"
    if cache.exists():
        g = load_graph(cache)
    else:
        slide_data = processor.process_slide(str(path), slide_id=path.stem)
        g = builder.build_graph(slide_data, bucket=bucket)
        save_graph(g, cache)
    import jax.numpy as jnp
    return g.replace(y=jnp.asarray(label, jnp.int32))


@dataclass
class GateSpec:
    """Task-specific inputs to :func:`run_gate` (everything the shared
    variant x seed machinery does not own)."""
    train_items: Sequence[Tuple[Path, int]]
    test_items: Sequence[Tuple[Path, int]]
    num_classes: int
    extractor: Any                  # PatchFeatureExtractor
    arch: str
    weights_loaded: bool
    processor: Any                  # SlideProcessor
    hidden: Tuple[int, ...]
    heads: int
    steps: int
    bucket: int
    max_patches: int
    patch_size: int
    pretrain_epochs: int
    finetune_epochs: int
    dataset_name: str
    reference_target: Optional[Dict[str, Any]] = None
    default_arch: str = "simple_cnn"   # cache tags mark non-default arches
    report_extra: Dict[str, Any] = field(default_factory=dict)
    t_start: float = field(default_factory=time.time)


def metric_fn_for(num_classes: int):
    """Scalar metric over (labels, stored scores): binary AUC on 1-d tumor
    probs, macro OVR AUC on [N, C] prob matrices."""
    from dgdm_histopath_tpu.evaluation.metrics import _roc_auc, macro_ovr_auc
    return _roc_auc if num_classes == 2 else macro_ovr_auc


def build_variants(args, ap) -> List[Tuple[str, dict, Optional[int], Optional[int]]]:
    """(tag, model kwargs, graph-build knn_window, pretrain override) list
    from the shared A/B flags. The windowed scaling config pairs the banded
    model with band-built graphs, so its banded compute is exact by
    construction (ops.knn._band_mask)."""
    windows = ([int(w) for w in str(args.window).split(",")]
               if args.window is not None else [])
    variants: List[Tuple[str, dict, Optional[int], Optional[int]]] = []
    if not windows or args.ab_window:
        variants.append(("dense", {}, None, None))
    for w in windows:
        variants.append((f"window{w}",
                         {"spatial_window": w, "graph_window": w}, w, None))
    if args.moe_experts:
        variants.append((f"moe{args.moe_experts}",
                         {"moe_experts": args.moe_experts}, None, None))
    if args.ab_pretrain:
        # transfer gate: same finetune budget, no SSL pretraining phase
        variants.append(("scratch", {}, None, 0))
    if args.ab_int8 and not any(t == "dense" for t, _, _, _ in variants):
        # the int8 gate pairs against the dense arm; with --window but no
        # --ab-window there is none, and the gate would silently no-op
        ap.error("--ab-int8 pairs int8 inference against the dense arm, but "
                 "no dense arm is scheduled (--window without --ab-window); "
                 "add --ab-window or drop --window")
    return variants


def run_gate(args, ap, spec: GateSpec):
    """Run variants x training seeds, write per-seed reports (+ pooled when
    multi-seed), return the last per-seed report."""
    import jax
    import jax.random as jrandom

    from dgdm_histopath_tpu.data.datamodule import BucketedLoader
    from dgdm_histopath_tpu.evaluation.metrics import (
        bootstrap_ci, compute_classification_metrics, paired_bootstrap_delta,
    )
    from dgdm_histopath_tpu.models import DGDMModel
    from dgdm_histopath_tpu.ops.graph import batch_graphs
    from dgdm_histopath_tpu.preprocessing import TissueGraphBuilder
    from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig

    script = Path(ap.prog or "gate").stem
    metric_fn = metric_fn_for(spec.num_classes)
    variants = build_variants(args, ap)
    windows = ([int(w) for w in str(args.window).split(",")]
               if args.window is not None else [])
    tseeds = ([int(s) for s in str(args.train_seed).split(",")]
              if getattr(args, "train_seed", None) is not None
              else [args.seed])

    cache_dir = args.out / "graph_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    n_slides = len(spec.train_items) + len(spec.test_items)
    prep_stats = {"s": 0.0, "n": 0}

    def load_graphs(knn_window):
        """Preprocess (or load cached) graphs for one graph-build config."""
        builder = TissueGraphBuilder(
            extractor=spec.extractor, node_buckets=(spec.bucket,),
            spatial_sort=knn_window is not None, knn_window=knn_window,
            per_slide_feature_norm=args.per_slide_norm)
        tag = f"_w{knn_window}" if knn_window else ""
        if spec.arch != spec.default_arch:   # distinct features -> cache
            tag += "_" + spec.arch.replace("+", "-")
        if args.per_slide_norm:              # distinct features -> cache
            tag += "_psn"
        if spec.patch_size != 64:            # distinct patch grid -> cache
            tag += f"_p{spec.patch_size}"    # (64 = synthetic default,
            # kept suffix-free for round-4 cache compatibility)
        if spec.max_patches != spec.bucket:  # distinct subsample cap
            tag += f"_mp{spec.max_patches}"
        print(f"[{script}] preprocessing slides -> graphs "
              f"(bucket={spec.bucket}, knn_window={knn_window}, "
              f"cache={cache_dir})", flush=True)
        t0 = time.time()

        def fetch(items):
            """Build-or-load each slide's cache, then upload the whole set
            as ONE stacked device array per field. Per-graph jnp.asarray
            costs one tunnel RPC per array (7 x n_slides round-trips —
            measured ~20+ min per config at bucket 1024); batching makes
            it 7 transfers total, with per-graph rows as device slices."""
            import jax.numpy as jnp
            from dgdm_histopath_tpu.ops.graph import PaddedGraph
            raws, labels = [], []
            for p, y in items:
                cache = cache_dir / f"{p.stem}_b{spec.bucket}{tag}.npz"
                if not cache.exists():
                    slide_to_graph(p, y, spec.processor, builder, cache_dir,
                                   spec.bucket, tag)
                with np.load(cache) as z:
                    raws.append({k: z[k] for k in
                                 ("x", "pos", "nbr_idx", "nbr_mask",
                                  "edge_attr", "node_mask")})
                labels.append(y)
            fields = {k: jnp.asarray(np.stack([r[k] for r in raws]))
                      for k in raws[0]}
            ys = jnp.asarray(np.asarray(labels, np.int32))
            return [PaddedGraph(x=fields["x"][i], pos=fields["pos"][i],
                                nbr_idx=fields["nbr_idx"][i],
                                nbr_mask=fields["nbr_mask"][i],
                                edge_attr=fields["edge_attr"][i],
                                node_mask=fields["node_mask"][i],
                                y=ys[i])
                    for i in range(len(raws))], raws

        tr, raw_tr = fetch(spec.train_items)
        te, raw_te = fetch(spec.test_items)
        prep_stats["s"] += time.time() - t0
        prep_stats["n"] += n_slides
        counts = np.asarray([r["node_mask"].sum() for r in raw_tr + raw_te])
        real_node_stats[knn_window] = {
            "mean": round(float(counts.mean()), 1),
            "min": int(counts.min()), "max": int(counts.max())}
        print(f"[{script}] real nodes per graph (bucket {spec.bucket}): "
              f"mean {counts.mean():.0f}, min {counts.min()}, "
              f"max {counts.max()}", flush=True)
        return tr, te

    def as_batches(graphs, idxs, bs):
        return [batch_graphs([graphs[i] for i in idxs[j:j + bs]])
                for j in range(0, len(idxs), bs)]

    def arm_config(tag, extra_kwargs, knn_window, pt):
        """Config-affecting inputs of one arm, persisted into the variant
        cache so a resume into the same --out with DIFFERENT hyperparameters
        is refused instead of silently mixing configs in one report."""
        return {
            "tag": tag, "model_kwargs": dict(extra_kwargs),
            "knn_window": knn_window,
            "pretrain_epochs": pt, "finetune_epochs": spec.finetune_epochs,
            "config": args.config, "hidden": list(spec.hidden),
            "heads": spec.heads, "diffusion_steps": spec.steps,
            "num_classes": spec.num_classes,
            "dropout": args.dropout, "weight_decay": args.weight_decay,
            "lr": args.lr or (1e-4 if spec.weights_loaded else 1e-3),
            "finetune_lr_factor": args.finetune_lr_factor,
            "selection": args.selection, "batch_size": args.batch_size,
            "extractor": spec.arch, "per_slide_norm": args.per_slide_norm,
            "bucket": spec.bucket, "max_patches": spec.max_patches,
            "patch_size": spec.patch_size, "data_seed": args.seed,
            "n_train_per_class": args.n_train_per_class,
            "n_test_per_class": args.n_test_per_class,
        }

    # graphs and compiled programs shared across train seeds (see module
    # docstring — the make-seeds-cheap lever)
    graph_memo: dict = {}
    env_memo: dict = {}
    real_node_stats: dict = {}

    def get_graphs(knn_window):
        if knn_window not in graph_memo:
            graph_memo[knn_window] = load_graphs(knn_window)
        return graph_memo[knn_window]

    def get_env(tag, extra_kwargs, pt, n_train_batches):
        if tag in env_memo:
            return env_memo[tag]
        if args.dropout is not None:
            extra_kwargs = dict(extra_kwargs, dropout=args.dropout)
        model = DGDMModel(node_features=spec.extractor.feature_dim,
                          hidden_dims=spec.hidden,
                          attention_heads=spec.heads,
                          num_diffusion_steps=spec.steps, graph_layers=4,
                          num_classes=spec.num_classes, pooling="attention",
                          **extra_kwargs)
        lr = args.lr or (1e-4 if spec.weights_loaded else 1e-3)
        tc = dict(learning_rate=lr,
                  warmup_steps=min(100, n_train_batches),
                  max_epochs=pt + spec.finetune_epochs,
                  pretrain_epochs=pt,
                  steps_per_epoch=n_train_batches)
        if args.weight_decay is not None:
            tc["weight_decay"] = args.weight_decay
        if args.finetune_lr_factor is not None:
            tc["finetune_lr_factor"] = args.finetune_lr_factor
        trainer = DGDMTrainer(model, TrainerConfig(**tc), use_mesh=False)
        fwd = jax.jit(lambda p, gg: model.apply(
            p, gg, mode="inference",
            deterministic=True)["classification_logits"])
        env = {"model": model, "trainer": trainer, "fwd": fwd, "lr": lr}
        env_memo[tag] = env
        return env

    def predict_probs(fwd, params, test_graphs):
        probs, labels = [], []
        for j in range(0, len(test_graphs), args.batch_size):
            chunk = test_graphs[j:j + args.batch_size]
            if len(chunk) < args.batch_size:  # pad to the compiled shape
                batch = batch_graphs(chunk + [chunk[-1]] *
                                     (args.batch_size - len(chunk)))
            else:
                batch = batch_graphs(chunk)
            logits = np.asarray(fwd(params, batch), np.float64)[:len(chunk)]
            p = np.exp(logits - logits.max(-1, keepdims=True))
            probs.append(p / p.sum(-1, keepdims=True))
            labels.extend(int(g.y) for g in chunk)
        return np.concatenate(probs, axis=0), np.asarray(labels)

    def stored_scores(full_probs):
        """1-d tumor prob for binary (round-4 npz compat), [N, C] otherwise."""
        return full_probs[:, 1] if spec.num_classes == 2 else full_probs

    def run_variant(tag, extra_kwargs, knn_window, pt_epochs, tseed):
        """Train + evaluate one (graph-build, model) config for one training
        seed. Returns the metrics dict with ``_probs``/``_labels`` stashed
        for PAIRED bootstrap deltas (same resampled slides for all arms)."""
        pt = spec.pretrain_epochs if pt_epochs is None else pt_epochs
        cfg_fp = arm_config(tag, extra_kwargs, knn_window, pt)
        vsuffix = (f"s{args.seed}" if tseed == args.seed
                   else f"s{args.seed}t{tseed}")
        vcache = args.out / f"variant_{tag}_{vsuffix}.npz"
        if vcache.exists():
            z = np.load(vcache, allow_pickle=True)
            m = json.loads(str(z["metrics"]))
            stored_cfg = m.pop("_arm_config", None)
            # compare only keys both sides record: fingerprint fields added
            # in later rounds must not retroactively invalidate old arms
            diff = ({k: (stored_cfg[k], cfg_fp[k])
                     for k in set(stored_cfg) & set(cfg_fp)
                     if stored_cfg[k] != cfg_fp[k]}
                    if stored_cfg is not None else {})
            if diff:
                raise SystemExit(
                    f"[{script}] {vcache} was trained with DIFFERENT "
                    f"hyperparameters than this invocation (stored vs "
                    f"requested: {diff}). Resuming would mix configs in one "
                    f"report — use a different --out or delete the stale "
                    f"variant cache.")
            if stored_cfg is None:
                print(f"[{script}] [{tag}] WARNING: {vcache.name} predates "
                      "config fingerprinting — resuming on trust that it "
                      "used this invocation's hyperparameters")
            m["_probs"] = z["probs"]
            m["_labels"] = z["labels"]
            if "probs_int8" in z.files:
                m["_probs_int8"] = z["probs_int8"]
            print(f"[{script}] [{tag}] resumed from {vcache} "
                  f"(auc={m.get('auc')})")
            return m
        train_graphs, test_graphs = get_graphs(knn_window)
        rng = np.random.RandomState(tseed)
        order = rng.permutation(len(spec.train_items))
        n_val = max(1, len(order) // 5)
        val_idx, tr_idx = order[:n_val], order[n_val:]
        # epoch-reshuffled training batches (reference DataLoader(shuffle=
        # True), data/datamodule.py:173-197); val/test stay fixed
        train_loader = BucketedLoader([train_graphs[i] for i in tr_idx],
                                      args.batch_size, shuffle=True,
                                      seed=tseed)
        n_train_batches = len(train_loader)
        val_batches = as_batches(train_graphs, val_idx, args.batch_size)
        env = get_env(tag, extra_kwargs, pt, n_train_batches)
        model, trainer = env["model"], env["trainer"]
        trainer.current_epoch = 0   # re-entry for the next seed replicate
        trainer.history = []
        example = batch_graphs(
            [train_graphs[i] for i in tr_idx[:args.batch_size]])
        trainer.init_state(jrandom.PRNGKey(tseed), example)
        print(f"[{script}] [{tag}] t{tseed} finetuning {args.config}: "
              f"{pt} pretrain + {spec.finetune_epochs} finetune "
              f"epochs x {n_train_batches} steps, lr={env['lr']}", flush=True)
        fit = trainer.fit(train_loader, val_batches,
                          max_epochs=pt + spec.finetune_epochs,
                          early_stopping_patience=(
                              10**9 if args.selection == "final"
                              else max(10, spec.finetune_epochs // 3)),
                          restore_best_params=args.selection != "final")
        full_probs, labels = predict_probs(env["fwd"], trainer.state.params,
                                           test_graphs)
        m = compute_classification_metrics(labels, full_probs)
        m["best_val_loss"] = fit["best_val_loss"]
        m["_probs"] = stored_scores(full_probs)
        m["_labels"] = labels
        print(f"[{script}] [{tag}] t{tseed} auc={m.get('auc')} "
              f"f1={m.get('f1')}", flush=True)
        if args.ab_int8 and tag == "dense":
            # same finetuned params, Dense layers on the int8 MXU path —
            # the end-task accuracy gate for the quantized serving path
            # (dense arm only: the report pairs int8 against the primary)
            if "fwd8" not in env:
                from dgdm_histopath_tpu.models.quantized import int8_apply
                env["fwd8"] = jax.jit(lambda p, gg: int8_apply(
                    model, p, gg, mode="inference",
                    deterministic=True)["classification_logits"])
            probs8, _ = predict_probs(env["fwd8"], trainer.state.params,
                                      test_graphs)
            m8 = compute_classification_metrics(labels, probs8)
            m["auc_int8"] = m8.get("auc")
            m["f1_int8"] = m8.get("f1")
            m["int8_auc_delta"] = (None if m.get("auc") is None
                                   else round(m8["auc"] - m["auc"], 4))
            m["_probs_int8"] = stored_scores(probs8)
            print(f"[{script}] [{tag}] t{tseed} int8: auc={m8.get('auc')} "
                  f"f1={m8.get('f1')} delta={m['int8_auc_delta']}")
        arrays = {"probs": m["_probs"], "labels": m["_labels"]}
        if m.get("_probs_int8") is not None:
            arrays["probs_int8"] = m["_probs_int8"]
        payload = {k: v for k, v in m.items() if not k.startswith("_")}
        payload["_arm_config"] = cfg_fp
        np.savez(vcache, metrics=json.dumps(payload, default=float), **arrays)
        return m

    def build_report(results, tseed):
        primary_tag = variants[0][0]
        metrics = results[primary_tag]
        labels_t = metrics["_labels"]
        auc_ci = bootstrap_ci(metric_fn, labels_t, metrics["_probs"],
                              n_bootstrap=2000)
        target = spec.reference_target or {}
        report = {
            "dataset": spec.dataset_name,
            "config": args.config,
            "hidden_dims": list(spec.hidden),
            "per_slide_norm": args.per_slide_norm,
            "selection": args.selection,
            "seed": args.seed,
            "train_seed": tseed,
            "extractor": spec.arch,
            "vit_weights": (str(args.vit_weights) if args.vit_weights
                            else None),
            "backbone_pretrained": spec.weights_loaded,
            "n_train": len(spec.train_items),
            "n_test": len(spec.test_items),
            "bucket": spec.bucket, "max_patches": spec.max_patches,
            "auc": metrics.get("auc"), "f1": metrics.get("f1"),
            "auc_ci95": [round(auc_ci["lower"], 4),
                         round(auc_ci["upper"], 4)],
            "accuracy": metrics.get("accuracy"),
            "auc_int8": metrics.get("auc_int8"),
            "int8_auc_delta": metrics.get("int8_auc_delta"),
            "reference_target": spec.reference_target,
            "auc_delta_vs_reference": (
                None if metrics.get("auc") is None or not target.get("auc")
                else round(metrics["auc"] - target["auc"], 4)),
            "parity_valid": spec.weights_loaded and not args.synthetic,
            "preprocess_s_per_slide": round(
                prep_stats["s"] / max(prep_stats["n"], 1), 2),
            "best_val_loss": metrics["best_val_loss"],
            "wall_s": round(time.time() - spec.t_start, 1),
            "device": str(jax.devices()[0]),
        }
        report.update(spec.report_extra)
        if real_node_stats:
            report["real_nodes"] = (real_node_stats.get(None)
                                    or next(iter(real_node_stats.values())))
        # window-binding diagnostic: a ±1-block band constrains real-node
        # pairs only when the real nodes span >= 3 Morton blocks; below
        # that, every real pair is in-band, the windowed arm is
        # semantically ~= dense, and its paired delta measures TRAINING
        # NOISE, not windowed semantics (round-5 finding: the bucket-256
        # gate's ~29-real-node graphs never bind windows >= 16)
        wb = {}
        for vtag, _kw, knnw, _pt in variants:
            stats = real_node_stats.get(knnw)
            if knnw and stats:
                blocks = stats["mean"] / knnw
                wb[vtag] = {"blocks_spanned_mean": round(blocks, 1),
                            "binds": bool(blocks >= 3)}
        if wb:
            report["window_binding"] = wb
        if len(results) > 1:
            report["variants"] = {
                t: {k: r.get(k) for k in ("auc", "f1", "accuracy",
                                          "best_val_loss")}
                for t, r in results.items()}
            # paired bootstrap deltas vs the primary variant: both systems
            # are evaluated on the SAME resampled slide sets, so between-
            # slide variance cancels and the CI reflects only their
            # disagreement
            for vtag, _, _, _ in variants[1:]:
                r = results[vtag]
                if r.get("auc") is None or metrics.get("auc") is None:
                    continue
                if vtag == "scratch":
                    d = paired_bootstrap_delta(
                        metric_fn, labels_t, r["_probs"], metrics["_probs"])
                    report["pretrain_auc_uplift"] = {
                        "delta": round(d["delta"], 4),
                        "ci95": [round(d["lower"], 4), round(d["upper"], 4)]}
                else:
                    d = paired_bootstrap_delta(metric_fn, labels_t,
                                               metrics["_probs"],
                                               r["_probs"])
                    key = ("window_auc_delta_vs_dense"
                           if windows and vtag == f"window{windows[0]}"
                           else f"{vtag}_auc_delta_vs_dense")
                    report[key] = round(r["auc"] - metrics["auc"], 4)
                    report[key + "_ci95"] = [round(d["lower"], 4),
                                             round(d["upper"], 4)]
        if args.ab_int8 and metrics.get("_probs_int8") is not None:
            d = paired_bootstrap_delta(metric_fn, labels_t,
                                       metrics["_probs"],
                                       metrics["_probs_int8"])
            report["int8_auc_delta_ci95"] = [round(d["lower"], 4),
                                             round(d["upper"], 4)]
        return report

    if getattr(args, "prep_only", False):
        # build-or-refresh every graph-build config's cache, then exit:
        # lets a CPU process pre-pay the host-bound preprocessing while the
        # TPU tunnel stays free, so the subsequent TPU gate run starts at
        # warm cache (the npz cache is backend-independent)
        for knnw in dict.fromkeys(knnw for _, _, knnw, _ in variants):
            get_graphs(knnw)
        print(f"[{script}] --prep-only: graph caches ready under "
              f"{cache_dir} ({prep_stats['n']} slide-configs, "
              f"{prep_stats['s']:.0f}s)", flush=True)
        return None

    report = None
    for tseed in tseeds:
        results = {tag: run_variant(tag, kw, knnw, pt, tseed)
                   for tag, kw, knnw, pt in variants}
        report = build_report(results, tseed)
        name = args.report_name
        if tseed != args.seed:
            stem, dot, ext = name.partition(".")
            name = f"{stem}_t{tseed}{dot}{ext}"
        out_path = args.out / name
        if out_path.exists():
            # resumed arms skip graph loading, so this run may not have
            # recomputed every arm's window_binding/real_nodes — merge the
            # previous report's entries rather than dropping them
            try:
                old = json.loads(out_path.read_text())
            except (OSError, json.JSONDecodeError):
                old = {}
            merged = {**(old.get("window_binding") or {}),
                      **(report.get("window_binding") or {})}
            if merged:
                report["window_binding"] = merged
            if "real_nodes" not in report and "real_nodes" in old:
                report["real_nodes"] = old["real_nodes"]
        out_path.write_text(json.dumps(report, indent=2))
        print(json.dumps(report, indent=2))
        print(f"[{script}] report -> {out_path}", flush=True)
    if len(tseeds) > 1:
        # refresh the pooled multi-seed report over EVERY arm npz in --out
        # (including replicates from earlier invocations)
        try:
            import aggregate_hard_seeds
            aggregate_hard_seeds.main(["--dir", str(args.out)])
        except SystemExit as e:
            print(f"[{script}] pooled aggregation skipped: {e}")
    if not report["parity_valid"]:
        print(f"[{script}] NOTE: this run does NOT establish reference "
              "parity (synthetic data and/or random-init backbone). Drop in "
              "the artifacts from the module docstring and rerun.")
    return report
