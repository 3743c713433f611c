"""Shared gate-harness + TCGA hard-task tests.

The harness (scripts/gate_harness.py) is the multi-seed A/B engine behind
both calibrated hard gates; the binary path is exercised end-to-end by the
eval_camelyon16 smoke flows, so this file covers the multi-class side: the
ordinal hard-task generator and the full eval_tcga --hard loop (slow).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


class TestTcgaHardGenerator:
    def test_manifest_bands_and_label_noise(self, tmp_path):
        from eval_tcga import SUBTYPES, generate_synthetic_tcga_hard
        from dgdm_histopath_tpu.preprocessing.synthetic import (
            HARD_MULTICLASS_BANDS)
        man = generate_synthetic_tcga_hard(
            tmp_path, n_train_per_class=3, n_test_per_class=2, size=256,
            seed=0, label_noise=0.4)
        assert man["n_train"] == 12 and man["n_test"] == 8
        assert (tmp_path / "manifest.json").exists()
        assert (tmp_path / "labels.csv").exists()
        test_ids = set((tmp_path / "test_split.txt").read_text().split())
        assert len(test_ids) == 8
        # every slide's focal contrast lies inside its TRUE class band
        for rec in man["slides"]:
            lo, hi = HARD_MULTICLASS_BANDS[rec["true_class"]]
            contrast = rec["focal_density"] / rec["baseline_density"]
            assert lo - 1e-6 <= contrast <= hi + 1e-6, rec
            # test labels are clean; train labels may be noisy
            if rec["split"] == "testing":
                assert rec["filed_class"] == rec["true_class"]
        noisy = [r for r in man["slides"] if r["split"] == "training"
                 and r["filed_class"] != r["true_class"]]
        assert noisy, "0.4 label noise over 12 slides should flip some"
        # labels.csv files the NOISY label (what training sees)
        import csv
        with open(tmp_path / "labels.csv") as f:
            filed = {r[0]: SUBTYPES.index(r[1]) for r in csv.reader(f)}
        for rec in man["slides"]:
            assert filed[rec["slide"]] == rec["filed_class"]

    def test_generation_deterministic(self, tmp_path):
        from eval_tcga import generate_synthetic_tcga_hard
        m1 = generate_synthetic_tcga_hard(tmp_path / "a", 2, 1, size=256,
                                          seed=3)
        m2 = generate_synthetic_tcga_hard(tmp_path / "b", 2, 1, size=256,
                                          seed=3)
        assert m1["slides"] == m2["slides"]


@pytest.mark.slow
class TestTcgaHardLoop:
    def test_multiseed_hard_loop_end_to_end(self, tmp_path):
        """Tiny full run: 4-class hard gate through the shared harness with
        two training seeds -> per-seed reports + pooled report with 2-d
        prob matrices and macro OVR pooling."""
        from eval_tcga import main as tcga_main
        out = tmp_path / "gate"
        report = tcga_main([
            "--synthetic", "--hard", "--cpu", "--out", str(out),
            "--n-train-per-class", "4", "--n-test-per-class", "3",
            "--patch-size", "32", "--bucket", "64", "--max-patches", "64",
            "--hidden", "32,16", "--pretrain-epochs", "1",
            "--finetune-epochs", "2", "--batch-size", "2",
            "--train-seed", "0,1", "--ab-int8"])
        assert report["dataset"] == "tcga-brca-synthetic-hard"
        assert report["subtypes"] == ["LumA", "LumB", "Her2", "Basal"]
        assert (out / "report.json").exists()
        assert (out / "report_t1.json").exists()
        pooled = json.loads((out / "report_pooled.json").read_text())
        assert pooled["auc_metric"] == "macro_ovr"
        assert pooled["arms"]["dense"]["train_seeds"] == [0, 1]
        assert pooled["int8_auc_delta"]["train_seeds"] == [0, 1]
        # stored arm arrays are full [N, C] matrices
        z = np.load(out / "variant_dense_s0.npz", allow_pickle=True)
        assert z["probs"].ndim == 2 and z["probs"].shape[1] == 4
        m = json.loads(str(z["metrics"]))
        assert m["_arm_config"]["num_classes"] == 4
