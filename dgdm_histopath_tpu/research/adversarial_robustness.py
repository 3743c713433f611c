"""Adversarial robustness: attacks on tissue-graph features + defenses.

Parity surface: reference ``dgdm_histopath/research/adversarial_robustness.py``
— ``MedicalAdversarialAttack`` (FGSM/PGD-style feature perturbations, :43),
``ClinicalAdversarialDefense`` (input smoothing/denoising, :183),
``RobustnessAnalyzer`` (clean-vs-attacked metric deltas, :324).

TPU-native: attacks are pure jitted gradient computations on the padded
graph's node features (the attack surface of a WSI pipeline is the patch
features); defenses are batched jnp transforms.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import PaddedGraph
from ..utils.logging import get_logger

logger = get_logger("research")


def _loss_fn(model, params, graph: PaddedGraph, labels: jnp.ndarray) -> Callable:
    def loss_of(x):
        out = model.apply(params, graph.replace(x=x), mode="inference",
                          deterministic=True)
        logits = out["classification_logits"].astype(jnp.float32)
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits, -1), -1))
    return loss_of


class MedicalAdversarialAttack:
    """Feature-space attacks against a DGDM model."""

    def __init__(self, model, params, epsilon: float = 0.05,
                 pgd_steps: int = 10, pgd_alpha: Optional[float] = None):
        self.model = model
        self.params = params
        self.epsilon = epsilon
        self.pgd_steps = pgd_steps
        self.pgd_alpha = pgd_alpha or (2.5 * epsilon / pgd_steps)

    def fgsm(self, graph: PaddedGraph, labels: jnp.ndarray) -> PaddedGraph:
        """Fast gradient sign attack on node features."""
        loss_of = _loss_fn(self.model, self.params, graph, labels)
        g = jax.grad(loss_of)(graph.x)
        x_adv = graph.x + self.epsilon * jnp.sign(g)
        x_adv = jnp.where(graph.node_mask[..., None], x_adv, graph.x)
        return graph.replace(x=x_adv)

    def pgd(self, graph: PaddedGraph, labels: jnp.ndarray,
            rng: Optional[jax.Array] = None) -> PaddedGraph:
        """Projected gradient descent within an L∞ ball."""
        loss_of = _loss_fn(self.model, self.params, graph, labels)
        x0 = graph.x
        if rng is not None:
            x = x0 + jax.random.uniform(rng, x0.shape, minval=-self.epsilon,
                                        maxval=self.epsilon)
        else:
            x = x0

        def step(x, _):
            g = jax.grad(loss_of)(x)
            x = x + self.pgd_alpha * jnp.sign(g)
            x = jnp.clip(x, x0 - self.epsilon, x0 + self.epsilon)
            return x, None

        x, _ = jax.lax.scan(step, x, None, length=self.pgd_steps)
        x = jnp.where(graph.node_mask[..., None], x, x0)
        return graph.replace(x=x)

    def attack(self, graph: PaddedGraph, labels, method: str = "pgd",
               rng=None) -> PaddedGraph:
        labels = jnp.asarray(labels)
        if method == "fgsm":
            return self.fgsm(graph, labels)
        if method == "pgd":
            return self.pgd(graph, labels, rng)
        raise ValueError(f"unknown attack {method!r}")


class ClinicalAdversarialDefense:
    """Input-space defenses (reference :183): feature smoothing over the
    tissue-graph neighborhood, quantization, and gaussian purification."""

    def __init__(self, smoothing_weight: float = 0.5,
                 quantization_levels: int = 0, noise_sigma: float = 0.0):
        self.smoothing_weight = smoothing_weight
        self.quantization_levels = quantization_levels
        self.noise_sigma = noise_sigma

    def defend(self, graph: PaddedGraph, rng: Optional[jax.Array] = None
               ) -> PaddedGraph:
        from ..ops.graph import gather_neighbors, masked_neighbor_mean
        x = graph.x
        if self.smoothing_weight > 0:
            nbr = gather_neighbors(x, graph.nbr_idx)
            smooth = masked_neighbor_mean(nbr, graph.nbr_mask)
            has_nbr = jnp.any(graph.nbr_mask, axis=-1, keepdims=True)
            w = self.smoothing_weight * has_nbr.astype(x.dtype)
            x = (1 - w) * x + w * smooth
        if self.quantization_levels > 1:
            lo = jnp.min(x, axis=-1, keepdims=True)
            hi = jnp.max(x, axis=-1, keepdims=True)
            span = jnp.maximum(hi - lo, 1e-6)
            q = jnp.round((x - lo) / span * (self.quantization_levels - 1))
            x = lo + q / (self.quantization_levels - 1) * span
        if self.noise_sigma > 0 and rng is not None:
            x = x + self.noise_sigma * jax.random.normal(rng, x.shape, x.dtype)
        x = jnp.where(graph.node_mask[..., None], x, graph.x)
        return graph.replace(x=x)


class RobustnessAnalyzer:
    """Clean vs attacked vs defended accuracy/confidence deltas
    (reference :324)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params

    def _predict(self, graph: PaddedGraph) -> Dict[str, np.ndarray]:
        out = self.model.apply(self.params, graph, mode="inference",
                               deterministic=True)
        logits = np.asarray(out["classification_logits"], np.float32)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        return {"pred": probs.argmax(-1), "conf": probs.max(-1)}

    def analyze(self, graph: PaddedGraph, labels,
                attack: MedicalAdversarialAttack,
                defense: Optional[ClinicalAdversarialDefense] = None,
                methods=("fgsm", "pgd"), rng=None) -> Dict[str, Any]:
        labels_np = np.asarray(labels)
        clean = self._predict(graph)
        report: Dict[str, Any] = {
            "clean_accuracy": float((clean["pred"] == labels_np).mean()),
            "clean_confidence": float(clean["conf"].mean()),
            "attacks": {},
        }
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for method in methods:
            rng, sub = jax.random.split(rng)
            adv = attack.attack(graph, labels, method=method, rng=sub)
            attacked = self._predict(adv)
            entry = {
                "accuracy": float((attacked["pred"] == labels_np).mean()),
                "confidence": float(attacked["conf"].mean()),
                "flip_rate": float((attacked["pred"] != clean["pred"]).mean()),
            }
            if defense is not None:
                rng, sub = jax.random.split(rng)
                defended = self._predict(defense.defend(adv, sub))
                entry["defended_accuracy"] = float(
                    (defended["pred"] == labels_np).mean())
            report["attacks"][method] = entry
        return report
