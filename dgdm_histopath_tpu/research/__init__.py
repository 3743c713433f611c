"""Research layer (reference ``dgdm_histopath/research/``)."""

from .adversarial_robustness import (
    MedicalAdversarialAttack, ClinicalAdversarialDefense, RobustnessAnalyzer,
)
from .comparative_studies import (
    BenchmarkSuite, ModelComparator, StatisticalValidator, BenchmarkResult,
    paired_t_test, wilcoxon_signed_rank, cohens_d, bootstrap_diff_ci,
)
from .experiment_framework import (
    ExperimentRunner, ExperimentConfig, RunRecord, ResultsAnalyzer,
    PublicationPreparer,
)
from .interpretability import (
    ClinicalSaliencyAnalyzer, PathologyFeatureExtractor, ClinicalReportGenerator,
)
from .multimodal_fusion import (
    AdaptiveModalityEncoder, CrossModalAttentionFusion, UncertaintyAwareFusion,
    HierarchicalModalityFusion, benchmark_fusion_strategies,
)
from .novel_algorithms import (
    PhaseModulatedGraphDiffusion, QuantumGraphDiffusion,
    HierarchicalAttentionFusion, AdaptiveGraphTopology,
)

__all__ = [
    "MedicalAdversarialAttack", "ClinicalAdversarialDefense", "RobustnessAnalyzer",
    "BenchmarkSuite", "ModelComparator", "StatisticalValidator", "BenchmarkResult",
    "paired_t_test", "wilcoxon_signed_rank", "cohens_d", "bootstrap_diff_ci",
    "ExperimentRunner", "ExperimentConfig", "RunRecord", "ResultsAnalyzer",
    "PublicationPreparer",
    "ClinicalSaliencyAnalyzer", "PathologyFeatureExtractor", "ClinicalReportGenerator",
    "AdaptiveModalityEncoder", "CrossModalAttentionFusion", "UncertaintyAwareFusion",
    "HierarchicalModalityFusion", "benchmark_fusion_strategies",
    "PhaseModulatedGraphDiffusion", "QuantumGraphDiffusion",
    "HierarchicalAttentionFusion", "AdaptiveGraphTopology",
]
