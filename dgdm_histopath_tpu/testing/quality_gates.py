"""Self-contained quality gates: runnable health checks over the framework.

Parity surface: reference ``dgdm_histopath/testing/quality_gates.py:66-834``
(``QualityGateRunner`` with scored report) and the maturity-staged
``progressive_quality_gates.py:20-735`` (greenfield → development → staging →
production levels). Gates here exercise the real pipeline on synthetic data —
imports, config, model construction/forward, training step, preprocessing,
data loading, checkpointing, input validation, determinism — without needing
any external data or services.
"""

from __future__ import annotations

import time
import traceback
from typing import Callable, Dict, List, Optional

from ..utils.logging import get_logger

logger = get_logger("testing")

# gates required per maturity level (reference progressive_quality_gates.py)
LEVEL_REQUIREMENTS = {
    "greenfield": {"min_score": 0.5,
                   "required": ["imports", "config"]},
    "development": {"min_score": 0.7,
                    "required": ["imports", "config", "model_construction",
                                 "model_forward"]},
    "staging": {"min_score": 0.85,
                "required": ["imports", "config", "model_construction",
                             "model_forward", "training_step", "data_pipeline",
                             "input_validation"]},
    "production": {"min_score": 0.95,
                   "required": ["imports", "config", "model_construction",
                                "model_forward", "training_step",
                                "preprocessing", "data_pipeline",
                                "checkpointing", "input_validation",
                                "determinism", "prediction_end_to_end",
                                "preemption_resume", "serving"]},
}


def _tiny_graph(num_classes=None, feat_dim=16, n=32, b=2):
    import numpy as np
    import jax.numpy as jnp
    from ..ops.graph import PaddedGraph, batch_graphs
    from ..ops.knn import knn_euclidean
    graphs = []
    for seed in range(b):
        rs = np.random.RandomState(seed)
        x = rs.randn(n, feat_dim).astype(np.float32)
        pos = rs.rand(n, 2).astype(np.float32)
        mask = jnp.ones((n,), bool)
        idx, dist, valid = knn_euclidean(jnp.asarray(pos), mask, 6)
        graphs.append(PaddedGraph(
            x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx,
            nbr_mask=valid,
            edge_attr=jnp.stack([dist, jnp.exp(-10 * dist), jnp.zeros_like(dist)], -1),
            node_mask=mask,
            y=None if num_classes is None else jnp.asarray(seed % num_classes)))
    return batch_graphs(graphs)


# ---------------------------------------------------------------------------
# individual gates
# ---------------------------------------------------------------------------

def gate_imports() -> None:
    import dgdm_histopath_tpu
    from dgdm_histopath_tpu import models, ops, parallel, training, utils  # noqa: F401
    assert dgdm_histopath_tpu.CORE_AVAILABLE


def gate_config() -> None:
    from ..utils.config import DGDMConfig, config_from_dict, config_to_dict
    cfg = DGDMConfig()
    cfg.validate()
    rt = config_from_dict(config_to_dict(cfg))
    rt.validate()


def gate_model_construction() -> None:
    import jax
    from ..models import DGDMModel
    model = DGDMModel(node_features=16, hidden_dims=(32, 16), attention_heads=4,
                      graph_layers=2, num_classes=2, compute_dtype="float32")
    g = _tiny_graph(num_classes=2)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    assert params is not None


def gate_model_forward() -> None:
    import jax
    import numpy as np
    from ..models import DGDMModel
    model = DGDMModel(node_features=16, hidden_dims=(32, 16), attention_heads=4,
                      graph_layers=2, num_classes=2, compute_dtype="float32")
    g = _tiny_graph(num_classes=2)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    out = model.apply(params, g, mode="inference")
    logits = np.asarray(out["classification_logits"])
    assert logits.shape == (2, 2) and np.isfinite(logits).all()


def gate_training_step() -> None:
    import jax
    import numpy as np
    from ..models import DGDMModel
    from ..training import DGDMTrainer, TrainerConfig
    model = DGDMModel(node_features=16, hidden_dims=(32, 16), attention_heads=4,
                      graph_layers=2, num_classes=2, use_hierarchical=False,
                      compute_dtype="float32")
    trainer = DGDMTrainer(model, TrainerConfig(warmup_steps=1, pretrain_epochs=1,
                                               steps_per_epoch=2), use_mesh=False)
    batch = _tiny_graph(num_classes=2)
    trainer.init_state(jax.random.PRNGKey(0), batch)
    m = trainer.training_step(batch, epoch=0)
    assert np.isfinite(m["loss"])


def gate_preprocessing() -> None:
    import numpy as np
    from ..preprocessing import SlideProcessor, synthetic_slide
    backend, _ = synthetic_slide(512, 512, num_levels=3, seed=0)
    proc = SlideProcessor(patch_size=32, tissue_threshold=0.3, max_patches=10,
                          stain_normalize=False)
    data = proc.process_slide(backend)
    assert data.num_patches > 0
    assert data.patches.dtype == np.uint8


def gate_data_pipeline() -> None:
    from ..data import BucketedLoader
    graphs = [_tiny_graph(num_classes=2)]  # already batched; use raw graphs:
    import numpy as np
    singles = []
    for i in range(4):
        g = _tiny_graph(num_classes=2, b=1)
        singles.append(
            g.replace(x=g.x[0], pos=g.pos[0], nbr_idx=g.nbr_idx[0],
                      nbr_mask=g.nbr_mask[0], edge_attr=g.edge_attr[0],
                      node_mask=g.node_mask[0], y=None if g.y is None else g.y[0]))
    loader = BucketedLoader(singles, batch_size=2, prefetch=0)
    batches = list(loader)
    assert len(batches) == 2


def gate_checkpointing() -> None:
    import tempfile
    import jax
    from ..models import DGDMModel
    from ..training import CheckpointManager, DGDMTrainer, TrainerConfig
    model = DGDMModel(node_features=16, hidden_dims=(32, 16), attention_heads=4,
                      graph_layers=2, use_hierarchical=False,
                      compute_dtype="float32")
    trainer = DGDMTrainer(model, TrainerConfig(), use_mesh=False)
    batch = _tiny_graph()
    trainer.init_state(jax.random.PRNGKey(0), batch)
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(trainer.state, step=0, metric=1.0)
        restored = mgr.restore(trainer.state)
        assert restored is not None


def gate_input_validation() -> None:
    from ..utils.exceptions import ValidationError
    from ..utils.validation import InputValidator
    try:
        InputValidator.validate_integer("x", "field")
        raise AssertionError("should have raised")
    except ValidationError:
        pass
    try:
        InputValidator.validate_path("../../etc/passwd", "p")
        raise AssertionError("should have raised")
    except ValidationError:
        pass
    assert InputValidator.validate_probability(0.5, "p") == 0.5


def gate_prediction_end_to_end() -> None:
    """Full predict_slide on a synthetic WSI (the user-facing flow)."""
    from ..evaluation import DGDMPredictor
    from ..models import DGDMModel
    from ..preprocessing import synthetic_slide
    import jax
    model = DGDMModel(node_features=5, hidden_dims=(16, 8), attention_heads=4,
                      graph_layers=1, num_diffusion_steps=2, num_classes=2,
                      use_hierarchical=False, use_spatial_attention=False,
                      compute_dtype="float32")
    g = _tiny_graph(feat_dim=5, b=1)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    predictor = DGDMPredictor(model=model, params=params, patch_size=32,
                              max_patches=20, feature_extractor="none",
                              tissue_threshold=0.3, stain_normalize=False,
                              node_buckets=[32, 64])
    backend, _ = synthetic_slide(512, 512, num_levels=3, seed=9)
    result = predictor.predict_slide(backend, slide_id="gate")
    assert result["probabilities"].shape == (2,)
    assert result["uncertainty"]["entropy"] >= 0.0


def gate_determinism() -> None:
    import jax
    import numpy as np
    from ..models import DGDMModel
    model = DGDMModel(node_features=16, hidden_dims=(32, 16), attention_heads=4,
                      graph_layers=2, num_classes=2, compute_dtype="float32")
    g = _tiny_graph(num_classes=2)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    out1 = model.apply(params, g, mode="inference")["classification_logits"]
    out2 = model.apply(params, g, mode="inference")["classification_logits"]
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def gate_preemption_resume() -> None:
    """Interrupted fit writes a resumable mid-epoch checkpoint (the cloud
    TPU reclaim path): trigger -> emergency save -> restore -> finish."""
    import tempfile
    import jax
    from ..models import DGDMModel
    from ..training import (CheckpointManager, DGDMTrainer, PreemptionGuard,
                            TrainerConfig)
    model = DGDMModel(node_features=16, hidden_dims=(32, 16), attention_heads=4,
                      graph_layers=1, num_diffusion_steps=2, num_classes=2,
                      use_hierarchical=False, compute_dtype="float32")
    batches = [_tiny_graph(num_classes=2) for _ in range(3)]
    trainer = DGDMTrainer(model, TrainerConfig(pretrain_epochs=0,
                                               warmup_steps=1),
                          use_mesh=False)
    trainer.init_state(jax.random.PRNGKey(0), batches[0])
    guard = PreemptionGuard(install=False)
    guard.trigger()
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        result = trainer.fit(batches, max_epochs=2, checkpoint_manager=mgr,
                             preemption_guard=guard)
        assert result["interrupted"] is True
        info = mgr.record_extra().get("resume")
        assert info and info["mid_epoch"]
        resumed = DGDMTrainer(model, TrainerConfig(pretrain_epochs=0,
                                                   warmup_steps=1),
                              use_mesh=False)
        resumed.init_state(jax.random.PRNGKey(0), batches[0])
        resumed.state = resumed.place_state(mgr.restore(resumed.state))
        resumed.current_epoch = info["epoch"]
        done = resumed.fit(batches, max_epochs=2,
                           start_step_in_epoch=info["step_in_epoch"])
        assert done["interrupted"] is False


def gate_serving() -> None:
    """Dynamic-batching server answers a predict roundtrip in-process."""
    import jax
    from ..deployment import InferenceServer
    from ..evaluation import DGDMPredictor
    from ..models import DGDMModel
    model = DGDMModel(node_features=16, hidden_dims=(16, 8), attention_heads=4,
                      graph_layers=1, num_diffusion_steps=2, num_classes=2,
                      use_hierarchical=False, use_spatial_attention=False,
                      compute_dtype="float32")
    g = _tiny_graph(b=1)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    predictor = DGDMPredictor(model=model, params=params,
                              feature_extractor="none")
    server = InferenceServer(predictor, port=0, dynamic_batch=4)
    try:
        single = jax.tree_util.tree_map(
            lambda a: a[0] if hasattr(a, "ndim") and a.ndim > 0 else a, g)
        out = server.handle_predict({"graph": {
            k: __import__("numpy").asarray(getattr(single, k)).tolist()
            for k in ("x", "pos", "nbr_idx", "nbr_mask", "edge_attr",
                      "node_mask")}})
        assert "probabilities" in out
        assert server.batcher.stats["items"] == 1
        assert "dgdm_batch_size_mean" in server.prometheus_metrics()
    finally:
        server.stop()


GATES: Dict[str, Callable[[], None]] = {
    "imports": gate_imports,
    "config": gate_config,
    "model_construction": gate_model_construction,
    "model_forward": gate_model_forward,
    "training_step": gate_training_step,
    "preprocessing": gate_preprocessing,
    "data_pipeline": gate_data_pipeline,
    "checkpointing": gate_checkpointing,
    "input_validation": gate_input_validation,
    "determinism": gate_determinism,
    "prediction_end_to_end": gate_prediction_end_to_end,
    "preemption_resume": gate_preemption_resume,
    "serving": gate_serving,
}


class QualityGateRunner:
    """Run gates, produce a scored report (reference quality_gates.py:66-834)."""

    def __init__(self, level: str = "development", fail_fast: bool = False):
        if level not in LEVEL_REQUIREMENTS:
            raise ValueError(f"unknown maturity level {level!r}")
        self.level = level
        self.fail_fast = fail_fast

    def run(self, selected: Optional[List[str]] = None) -> Dict:
        names = selected or list(GATES)
        results = []
        for name in names:
            fn = GATES.get(name)
            if fn is None:
                results.append({"name": name, "status": "unknown",
                                "duration_s": 0.0, "error": "no such gate"})
                continue
            start = time.perf_counter()
            try:
                fn()
                status, error = "passed", None
            except Exception as exc:  # noqa: BLE001
                status, error = "failed", f"{exc}\n{traceback.format_exc()}"
                logger.error("gate %s failed: %s", name, exc)
            results.append({"name": name, "status": status,
                            "duration_s": round(time.perf_counter() - start, 3),
                            "error": error})
            if status == "failed" and self.fail_fast:
                break
        passed_names = {r["name"] for r in results if r["status"] == "passed"}
        score = len(passed_names) / max(len(results), 1)
        req = LEVEL_REQUIREMENTS[self.level]
        level_ok = (score >= req["min_score"]
                    and all(r in passed_names for r in req["required"]
                            if r in {x["name"] for x in results}))
        return {"score": round(score, 3), "passed": bool(level_ok),
                "level": self.level, "gates": results}
