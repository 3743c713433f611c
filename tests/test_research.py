"""Research-layer tests: adversarial robustness, statistics, experiments,
interpretability, multimodal fusion, novel algorithms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.research import (
    AdaptiveGraphTopology, AdaptiveModalityEncoder, BenchmarkSuite,
    ClinicalAdversarialDefense, ClinicalReportGenerator,
    ClinicalSaliencyAnalyzer, CrossModalAttentionFusion, ExperimentConfig,
    ExperimentRunner, HierarchicalAttentionFusion, MedicalAdversarialAttack,
    ModelComparator, PathologyFeatureExtractor, PhaseModulatedGraphDiffusion,
    PublicationPreparer, ResultsAnalyzer, RobustnessAnalyzer,
    StatisticalValidator, UncertaintyAwareFusion, cohens_d, paired_t_test,
    wilcoxon_signed_rank,
)

from conftest import make_synthetic_graph


def model_and_params(num_classes=2, feat_dim=16):
    model = DGDMModel(node_features=feat_dim, hidden_dims=(32, 16),
                      num_diffusion_steps=3, attention_heads=4, graph_layers=1,
                      num_classes=num_classes, use_hierarchical=False,
                      use_spatial_attention=False, compute_dtype="float32")
    g = batch_graphs([make_synthetic_graph(seed=i, n_nodes=24, n_real=20,
                                           feat_dim=feat_dim) for i in range(2)])
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    return model, params, g


class TestAdversarial:
    @pytest.mark.slow
    def test_fgsm_perturbs_within_epsilon(self):
        model, params, g = model_and_params()
        attack = MedicalAdversarialAttack(model, params, epsilon=0.1)
        labels = jnp.asarray([0, 1])
        adv = attack.attack(g, labels, method="fgsm")
        delta = np.abs(np.asarray(adv.x - g.x))
        assert delta.max() <= 0.1 + 1e-6
        # padding untouched
        pad = ~np.asarray(g.node_mask)
        assert delta[pad].max() == 0.0

    def test_pgd_bounded(self):
        model, params, g = model_and_params()
        attack = MedicalAdversarialAttack(model, params, epsilon=0.05, pgd_steps=5)
        adv = attack.attack(g, jnp.asarray([0, 1]), method="pgd",
                            rng=jax.random.PRNGKey(0))
        delta = np.abs(np.asarray(adv.x - g.x))
        assert delta.max() <= 0.05 + 1e-5

    def test_defense_smooths(self):
        model, params, g = model_and_params()
        defense = ClinicalAdversarialDefense(smoothing_weight=0.5)
        out = defense.defend(g)
        assert out.x.shape == g.x.shape
        assert not np.allclose(np.asarray(out.x), np.asarray(g.x))

    def test_robustness_analyzer(self):
        model, params, g = model_and_params()
        attack = MedicalAdversarialAttack(model, params, epsilon=0.1, pgd_steps=3)
        analyzer = RobustnessAnalyzer(model, params)
        report = analyzer.analyze(g, [0, 1], attack,
                                  defense=ClinicalAdversarialDefense(),
                                  methods=("fgsm",))
        assert "clean_accuracy" in report
        assert "fgsm" in report["attacks"]
        assert "defended_accuracy" in report["attacks"]["fgsm"]


class TestStatistics:
    def test_paired_t(self):
        rs = np.random.RandomState(0)
        a = rs.randn(100) + 1.0
        b = rs.randn(100)
        r = paired_t_test(a, b)
        assert r["p"] < 0.01 and r["mean_diff"] > 0.5

    def test_t_test_identical(self):
        a = np.ones(10)
        r = paired_t_test(a, a)
        assert r["p"] == 1.0

    def test_wilcoxon(self):
        rs = np.random.RandomState(1)
        a = rs.randn(50) + 1.0
        b = rs.randn(50)
        assert wilcoxon_signed_rank(a, b)["p"] < 0.05

    def test_cohens_d(self):
        assert cohens_d(np.asarray([1., 2, 3]), np.asarray([1., 2, 3])) == 0.0

    def test_validator_and_comparator(self):
        rs = np.random.RandomState(2)
        scores = {"m1": rs.rand(40) + 0.3, "m2": rs.rand(40)}
        out = ModelComparator().compare_all(scores)
        assert out["ranking"][0] == "m1"
        assert "m1_vs_m2" in out["pairwise"]
        assert out["pairwise"]["m1_vs_m2"]["significant"]


class TestExperiments:
    def test_runner_and_analysis(self, tmp_path):
        runner = ExperimentRunner(tmp_path)

        def exp(params, seed):
            rs = np.random.RandomState(seed)
            return {"auc": 0.8 + params["lr"] * 10 + rs.rand() * 0.01}

        runner.run_grid("sweep", {"lr": [0.001, 0.01]}, exp, seeds=(0, 1))
        assert len(runner.records) == 4
        analyzer = ResultsAnalyzer(runner.records)
        agg = analyzer.aggregate("auc")
        assert len(agg) == 2
        best = analyzer.best("auc")
        assert best.params["lr"] == 0.01
        # reload from disk
        reloaded = ExperimentRunner.load(tmp_path)
        assert len(reloaded.records) == 4

    def test_failed_experiment_recorded(self, tmp_path):
        runner = ExperimentRunner(tmp_path)
        def boom(params, seed):
            raise RuntimeError("x")
        recs = runner.run(ExperimentConfig("bad"), boom)
        assert recs[0].status == "failed"

    def test_publication_prep(self, tmp_path):
        runner = ExperimentRunner(tmp_path)
        runner.run(ExperimentConfig("e1", seeds=(0, 1)),
                   lambda p, s: {"auc": 0.9 + s * 0.01})
        prep = PublicationPreparer(ResultsAnalyzer(runner.records))
        table = prep.results_table(["auc"])
        assert "e1" in table and "±" in table
        path = prep.export(tmp_path / "results.md", ["auc"])
        assert path.exists()


class TestInterpretability:
    def test_saliency(self):
        model, params, g = model_and_params()
        analyzer = ClinicalSaliencyAnalyzer(model, params)
        sal = analyzer.node_saliency(g, class_idx=0)
        assert sal.shape == (2, 24)
        assert sal[~np.asarray(g.node_mask)].max() == 0.0
        assert sal[np.asarray(g.node_mask)].max() > 0.0

    def test_region_summary_and_report(self):
        model, params, g = model_and_params()
        analyzer = ClinicalSaliencyAnalyzer(model, params)
        sal = analyzer.node_saliency(g, class_idx=0)[0]
        summary = PathologyFeatureExtractor.summarize_regions(
            sal, np.asarray(g.pos)[0], np.asarray(g.node_mask)[0])
        assert summary["num_nodes"] == 20
        gen = ClinicalReportGenerator(class_names=["benign", "tumor"])
        text = gen.generate(
            {"predicted_class": 1, "confidence": 0.9,
             "uncertainty": {"normalized_entropy": 0.2},
             "biomarkers": [{"attention_score": 0.4, "position": [0.3, 0.7]}]},
            region_summary=summary)
        assert "tumor" in text
        assert "research-use-only" in text

    def test_report_spanish(self):
        gen = ClinicalReportGenerator(class_names=["benigno", "tumor"],
                                      language="es")
        text = gen.generate({"predicted_class": 0, "confidence": 0.7})
        assert "Predicción" in text


class TestMultimodal:
    def test_encoder_and_fusions(self):
        enc = AdaptiveModalityEncoder({"histology": 32, "genomic": 48},
                                      embed_dim=16)
        rs = np.random.RandomState(0)
        inputs = {"histology": jnp.asarray(rs.randn(4, 32), jnp.float32),
                  "genomic": jnp.asarray(rs.randn(4, 48), jnp.float32)}
        present = {"genomic": jnp.asarray([True, True, False, True])}
        params = enc.init(jax.random.PRNGKey(0), inputs, present)
        toks = enc.apply(params, inputs, present)
        assert toks.shape == (4, 2, 16)

        fuser = CrossModalAttentionFusion(16, num_heads=4, num_layers=1)
        fp = fuser.init(jax.random.PRNGKey(1), toks[:, 0], toks)
        fused = fuser.apply(fp, toks[:, 0], toks)
        assert fused.shape == (4, 16)

        ufuser = UncertaintyAwareFusion(16)
        up = ufuser.init(jax.random.PRNGKey(2), toks)
        out = ufuser.apply(up, toks)
        assert out["fused"].shape == (4, 16)
        np.testing.assert_allclose(np.asarray(out["weights"]).sum(-1), 1.0,
                                   atol=1e-5)

    def test_hierarchical_fusion(self):
        fuser = HierarchicalAttentionFusion(features=16, num_heads=4)
        g = make_synthetic_graph(n_nodes=16, n_real=12, feat_dim=16)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16), jnp.float32)
        mask = jnp.ones((2, 16), bool)
        params = fuser.init(jax.random.PRNGKey(0), [x, x * 0.5], mask)
        out = fuser.apply(params, [x, x * 0.5], mask)
        assert out.shape == (2, 16, 16)


class TestNovelAlgorithms:
    def test_phase_diffusion(self):
        g = batch_graphs([make_synthetic_graph(seed=i, n_nodes=16, n_real=12,
                                               feat_dim=16) for i in range(2)])
        mod = PhaseModulatedGraphDiffusion(features=16, num_rounds=2)
        params = mod.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                          g.node_mask)
        out = mod.apply(params, g.x, g.nbr_idx, g.nbr_mask, g.node_mask)
        assert out.shape == (2, 16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_adaptive_topology(self):
        g = batch_graphs([make_synthetic_graph(seed=i, n_nodes=16, n_real=12,
                                               feat_dim=16) for i in range(2)])
        mod = AdaptiveGraphTopology(features=16)
        params = mod.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask)
        out = mod.apply(params, g.x, g.nbr_idx, g.nbr_mask)
        # rewired mask is a subset of the original
        assert not np.any(np.asarray(out["nbr_mask"]) & ~np.asarray(g.nbr_mask))
        w = np.asarray(out["edge_weights"])
        has = np.asarray(g.nbr_mask).any(-1)
        np.testing.assert_allclose(w.sum(-1)[has], 1.0, atol=1e-5)
