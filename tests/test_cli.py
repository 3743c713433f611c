"""CLI + quality-gate tests: drive the console entry points end-to-end on
synthetic fixtures (the workflow the reference documents in its README)."""

import json
from pathlib import Path

import numpy as np
import pytest

from dgdm_histopath_tpu.preprocessing import write_synthetic_tiff


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    slides = d / "slides"
    slides.mkdir()
    for i in range(3):
        write_synthetic_tiff(slides / f"case{i}.tiff", 384, 384, num_levels=3,
                             seed=i)
    (d / "labels.csv").write_text(
        "slide_id,label\n" + "\n".join(f"case{i},{i % 2}" for i in range(3)))
    return d


class TestPreprocessCLI:
    def test_process_and_build(self, fixture_dir):
        from dgdm_histopath_tpu.cli.preprocess import main
        rc = main(["process-slides", "--input-dir", str(fixture_dir / "slides"),
                   "--output-dir", str(fixture_dir / "h5"),
                   "--patch-size", "32", "--tissue-threshold", "0.3",
                   "--max-patches", "15", "--num-workers", "2"])
        assert rc == 0
        assert len(list((fixture_dir / "h5").glob("*.h5"))) == 3

        rc = main(["build-graphs", "--input-dir", str(fixture_dir / "h5"),
                   "--output-dir", str(fixture_dir / "graphs"),
                   "--feature-extractor", "none", "--node-buckets", "16,32"])
        assert rc == 0
        assert len(list((fixture_dir / "graphs").glob("*_graph.npz"))) == 3

        rc = main(["validate-preprocessing", "--dir", str(fixture_dir)])
        assert rc == 0

    def test_no_slides_error(self, tmp_path):
        from dgdm_histopath_tpu.cli.preprocess import main
        empty = tmp_path / "empty"
        empty.mkdir()
        rc = main(["process-slides", "--input-dir", str(empty),
                   "--output-dir", str(tmp_path / "out")])
        assert rc == 1

    def test_build_graphs_derives_band_from_model_config(self, fixture_dir,
                                                         tmp_path):
        """--model-config with model.graph_window band-builds the graphs
        (the preprocess -> train path the trainer's band guard assumes),
        and a conflicting explicit --knn-window is rejected."""
        from dgdm_histopath_tpu.cli.preprocess import main
        from dgdm_histopath_tpu.data.graph_io import load_graph
        from dgdm_histopath_tpu.ops.graph import band_eligible, in_band_fraction

        if not (fixture_dir / "h5").exists():  # order-robust (see below)
            main(["process-slides", "--input-dir", str(fixture_dir / "slides"),
                  "--output-dir", str(fixture_dir / "h5"), "--patch-size",
                  "32", "--tissue-threshold", "0.3", "--max-patches", "15"])
        cfg = tmp_path / "windowed.yaml"
        cfg.write_text("model:\n  graph_window: 8\n  spatial_window: 8\n")
        out = tmp_path / "graphs_banded"
        rc = main(["build-graphs", "--input-dir", str(fixture_dir / "h5"),
                   "--output-dir", str(out),
                   "--feature-extractor", "none", "--node-buckets", "32",
                   "--model-config", str(cfg)])
        assert rc == 0
        graphs = sorted(out.glob("*_graph.npz"))
        assert graphs
        for p in graphs:
            g = load_graph(p)
            if band_eligible(g.num_nodes, 8):
                assert in_band_fraction(g.nbr_idx, g.nbr_mask, 8) == 1.0

        rc = main(["build-graphs", "--input-dir", str(fixture_dir / "h5"),
                   "--output-dir", str(tmp_path / "graphs_conflict"),
                   "--feature-extractor", "none", "--node-buckets", "32",
                   "--knn-window", "16", "--model-config", str(cfg)])
        assert rc == 1


class TestTrainPredictCLI:
    @pytest.mark.slow
    def test_train_then_predict(self, fixture_dir):
        from dgdm_histopath_tpu.cli.predict import main as predict_main
        from dgdm_histopath_tpu.cli.train import main as train_main
        # ensure graphs exist (depends on previous test order; rebuild if not)
        if not (fixture_dir / "graphs").exists():
            from dgdm_histopath_tpu.cli.preprocess import main as pre
            pre(["process-slides", "--input-dir", str(fixture_dir / "slides"),
                 "--output-dir", str(fixture_dir / "h5"), "--patch-size", "32",
                 "--tissue-threshold", "0.3", "--max-patches", "15"])
            pre(["build-graphs", "--input-dir", str(fixture_dir / "h5"),
                 "--output-dir", str(fixture_dir / "graphs"),
                 "--feature-extractor", "none", "--node-buckets", "16,32"])
        out = fixture_dir / "run"
        rc = train_main([
            "--data-dir", str(fixture_dir / "graphs"), "--dataset-type", "graph",
            "--metadata", str(fixture_dir / "labels.csv"),
            "--output-dir", str(out),
            "--node-features", "5", "--hidden-dims", "16,8",
            "--attention-heads", "4", "--graph-layers", "1",
            "--num-diffusion-steps", "3", "--num-classes", "2",
            "--max-epochs", "2", "--pretrain-epochs", "1",
            "--batch-size", "2", "--learning-rate", "1e-3", "--seed", "0"])
        assert rc == 0
        assert (out / "final_model.npz").exists()
        assert (out / "config_snapshot.yaml").exists()
        history = json.loads((out / "history.json").read_text())
        assert len(history) == 2
        assert history[0]["phase"] == "pretrain"
        assert history[1]["phase"] == "finetune"

        preds = fixture_dir / "preds"
        rc = predict_main([
            "--model", str(out / "final_model.npz"),
            "--input", str(fixture_dir / "graphs"),
            "--output-dir", str(preds), "--format", "both"])
        assert rc == 0
        files = list(preds.glob("*.json"))
        assert len(files) == 3
        result = json.loads(files[0].read_text())
        assert "probabilities" in result and "uncertainty" in result
        assert (preds / "predictions.csv").exists()

        # int8 inference through the same CLI surface: valid predictions
        preds8 = fixture_dir / "preds_int8"
        rc = predict_main([
            "--model", str(out / "final_model.npz"),
            "--input", str(fixture_dir / "graphs"),
            "--output-dir", str(preds8), "--quant", "int8"])
        assert rc == 0
        files8 = sorted(preds8.glob("*.json"))
        assert len(files8) == 3
        r8 = json.loads(files8[0].read_text())
        assert "probabilities" in r8
        assert all(np.isfinite(v) for v in r8["probabilities"])

    def test_missing_model_error(self, tmp_path):
        from dgdm_histopath_tpu.cli.predict import main
        from dgdm_histopath_tpu.utils.exceptions import InferenceError
        with pytest.raises(InferenceError):
            main(["--model", str(tmp_path / "missing.npz"),
                  "--input", str(tmp_path)])


class TestQualityGates:
    @pytest.mark.slow
    def test_runner_development_level(self):
        from dgdm_histopath_tpu.testing.quality_gates import QualityGateRunner
        runner = QualityGateRunner(level="development")
        report = runner.run(["imports", "config", "model_construction",
                             "model_forward", "input_validation"])
        assert report["passed"], report
        assert report["score"] == 1.0

    def test_cli(self, capsys):
        from dgdm_histopath_tpu.cli.quality_gates import main
        rc = main(["--level", "greenfield", "--gates", "imports,config"])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert out["passed"] is True

    def test_unknown_gate_reported(self):
        from dgdm_histopath_tpu.testing.quality_gates import QualityGateRunner
        report = QualityGateRunner().run(["imports", "nonexistent"])
        statuses = {g["name"]: g["status"] for g in report["gates"]}
        assert statuses["nonexistent"] == "unknown"


class TestScalableGates:
    """Cached + parallel gate execution (reference
    scalable_quality_gates.py:46 ResultCache, :220 DistributedValidator)."""

    GATES = ["imports", "config", "model_construction", "input_validation"]

    def test_cache_serves_second_run(self, tmp_path):
        from dgdm_histopath_tpu.testing import ScalableQualityGateRunner
        runner = ScalableQualityGateRunner(
            level="greenfield", cache_dir=tmp_path, max_workers=1)
        first = runner.run(self.GATES)
        assert first["passed"] and first["cache_hits"] == 0
        second = runner.run(self.GATES)
        assert second["passed"]
        assert second["cache_hits"] == len(self.GATES)
        assert all(g.get("cached") for g in second["gates"])
        assert second["cache_stats"]["total_entries"] == len(self.GATES)

    def test_source_change_invalidates(self, tmp_path, monkeypatch):
        from dgdm_histopath_tpu.testing import (
            GateResultCache, ScalableQualityGateRunner,
        )
        runner = ScalableQualityGateRunner(
            level="greenfield", cache_dir=tmp_path, max_workers=1)
        runner.run(["imports"])
        # a different fingerprint (i.e. any source edit) must miss
        cache = GateResultCache(tmp_path)
        assert cache.get("imports", "other-fingerprint") is None

    def test_failed_results_not_served(self, tmp_path):
        from dgdm_histopath_tpu.testing import GateResultCache
        cache = GateResultCache(tmp_path)
        cache.put("g", "fp", {"name": "g", "status": "failed",
                              "duration_s": 0.1, "error": "boom"})
        assert cache.get("g", "fp") is None
        assert cache.get("g", "fp", serve_failures=True)["status"] == "failed"

    def test_parallel_run_all_complete(self):
        from dgdm_histopath_tpu.testing import ScalableQualityGateRunner
        runner = ScalableQualityGateRunner(level="greenfield", max_workers=4)
        report = runner.run(self.GATES)
        assert report["passed"]
        assert {g["name"] for g in report["gates"]} == set(self.GATES)
        assert report["parallel_wall_s"] > 0

    def test_cli_flags(self, capsys, tmp_path):
        from dgdm_histopath_tpu.cli.quality_gates import main
        rc = main(["--level", "greenfield", "--gates", "imports,config",
                   "--parallel", "2", "--cache-dir", str(tmp_path)])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0 and out["passed"] is True
        rc2 = main(["--level", "greenfield", "--gates", "imports,config",
                    "--cache-dir", str(tmp_path)])
        out2 = json.loads(capsys.readouterr().out)
        assert rc2 == 0 and out2["cache_hits"] == 2


class TestAutonomousRunner:
    @pytest.mark.slow
    def test_report(self, tmp_path):
        from dgdm_histopath_tpu.testing import AutonomousTestRunner
        runner = AutonomousTestRunner(output_dir=tmp_path, level="greenfield")
        report = runner.run()
        assert report["tests"]["total"] >= 10
        assert report["overall_pass"], [
            r for r in report["tests"]["results"] if r["status"] != "passed"]
        assert (tmp_path / "autonomous_report.json").exists()
