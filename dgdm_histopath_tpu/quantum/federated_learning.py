"""Federated learning simulation: FedAvg / FedProx / SCAFFOLD over JAX pytrees.

Parity surface: reference ``dgdm_histopath/quantum/federated_learning.py`` —
``FederatedClient`` (:132), ``FederatedServer`` (:363) with strategy dispatch
(:387-397; enum :66-74 incl. the "QuantumFed" alias), differential-privacy
noise (:165-190; reference used Opacus — here DP is Gaussian noise +
clipping on client updates), client selection (:497+), and
``FederatedDGDMManager`` (:763).

TPU-native: client "training" runs the real jitted DGDMTrainer step; model
aggregation is pure pytree arithmetic (no process simulation needed — the
reference was in-process simulation too).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger

logger = get_logger("federated")


class FederatedStrategy(Enum):
    FEDAVG = "fedavg"
    FEDPROX = "fedprox"
    SCAFFOLD = "scaffold"
    QUANTUM_FED = "quantum_fed"   # reference alias — weighted FedAvg variant


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def tree_add(a, b, scale: float = 1.0):
    return jax.tree_util.tree_map(lambda x, y: x + scale * y, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(lambda x, y: x - y, a, b)


def tree_scale(a, s: float):
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


@dataclass
class DPConfig:
    """Client-side differential privacy: clip + Gaussian noise."""
    clip_norm: float = 1.0
    noise_multiplier: float = 0.0

    def privatize(self, update, rng: jax.Array):
        norm = tree_global_norm(update)
        scale = jnp.minimum(1.0, self.clip_norm / jnp.maximum(norm, 1e-12))
        clipped = tree_scale(update, scale)
        if self.noise_multiplier <= 0:
            return clipped
        sigma = self.noise_multiplier * self.clip_norm
        leaves, treedef = jax.tree_util.tree_flatten(clipped)
        rngs = jax.random.split(rng, len(leaves))
        noised = [l + sigma * jax.random.normal(r, l.shape, l.dtype)
                  for l, r in zip(leaves, rngs)]
        return jax.tree_util.tree_unflatten(treedef, noised)


class FederatedClient:
    """One simulated site: local data + a local-update function."""

    def __init__(self, client_id: str,
                 local_update_fn: Callable[[Any, int], Any],
                 num_samples: int, dp: Optional[DPConfig] = None):
        """``local_update_fn(global_params, round) -> new_local_params``."""
        self.client_id = client_id
        self.local_update_fn = local_update_fn
        self.num_samples = num_samples
        self.dp = dp
        self.control: Any = None      # SCAFFOLD client control variate

    def compute_update(self, global_params, round_idx: int,
                       rng: jax.Array) -> Any:
        new_params = self.local_update_fn(global_params, round_idx)
        update = tree_sub(new_params, global_params)
        if self.dp is not None:
            update = self.dp.privatize(update, rng)
        return update


class FederatedServer:
    """Round orchestration + strategy aggregation (reference :363-560)."""

    def __init__(self, global_params, strategy: FederatedStrategy | str = "fedavg",
                 clients_per_round: Optional[int] = None,
                 fedprox_mu: float = 0.01, server_lr: float = 1.0, seed: int = 0):
        if isinstance(strategy, str):
            strategy = FederatedStrategy(strategy)
        self.global_params = global_params
        self.strategy = strategy
        self.clients_per_round = clients_per_round
        self.fedprox_mu = fedprox_mu
        self.server_lr = server_lr
        self.clients: List[FederatedClient] = []
        self.server_control = None
        self.history: List[Dict[str, float]] = []
        self._rng = jax.random.PRNGKey(seed)
        self._select_rng = np.random.RandomState(seed)

    def register_client(self, client: FederatedClient) -> None:
        self.clients.append(client)
        if self.strategy == FederatedStrategy.SCAFFOLD and client.control is None:
            client.control = tree_zeros_like(self.global_params)

    def select_clients(self, round_idx: int) -> List[FederatedClient]:
        """Uniform sampling without replacement (reference :497+)."""
        k = self.clients_per_round or len(self.clients)
        k = min(k, len(self.clients))
        idx = self._select_rng.choice(len(self.clients), k, replace=False)
        return [self.clients[i] for i in idx]

    def run_round(self, round_idx: int) -> Dict[str, float]:
        selected = self.select_clients(round_idx)
        if not selected:
            raise ValueError("no clients registered")
        if self.server_control is None and self.strategy == FederatedStrategy.SCAFFOLD:
            self.server_control = tree_zeros_like(self.global_params)

        updates, weights = [], []
        for client in selected:
            self._rng, sub = jax.random.split(self._rng)
            update = client.compute_update(self.global_params, round_idx, sub)
            if self.strategy == FederatedStrategy.SCAFFOLD:
                # drift correction: subtract (c_i - c) from the update,
                # refresh the client control variate
                correction = tree_sub(client.control, self.server_control)
                update = tree_sub(update, correction)
                client.control = tree_add(client.control, update,
                                          scale=1.0 / max(len(selected), 1))
            updates.append(update)
            weights.append(float(client.num_samples))

        total = sum(weights)
        if self.strategy == FederatedStrategy.QUANTUM_FED:
            # reference's "amplitude" weighting = sqrt-sample weighting
            weights = [math.sqrt(w) for w in weights]
            total = sum(weights)
        norm_w = [w / total for w in weights]

        agg = tree_zeros_like(self.global_params)
        for update, w in zip(updates, norm_w):
            agg = tree_add(agg, update, scale=w)
        if self.strategy == FederatedStrategy.FEDPROX:
            # proximal damping of the aggregate step
            agg = tree_scale(agg, 1.0 / (1.0 + self.fedprox_mu))
        if self.strategy == FederatedStrategy.SCAFFOLD:
            self.server_control = tree_add(
                self.server_control, agg,
                scale=len(selected) / max(len(self.clients), 1))

        self.global_params = tree_add(self.global_params, agg,
                                      scale=self.server_lr)
        stats = {
            "round": round_idx,
            "clients": len(selected),
            "update_norm": float(tree_global_norm(agg)),
        }
        self.history.append(stats)
        return stats

    def run(self, num_rounds: int,
            eval_fn: Optional[Callable[[Any], Dict[str, float]]] = None
            ) -> List[Dict[str, float]]:
        for r in range(num_rounds):
            stats = self.run_round(r)
            if eval_fn is not None:
                stats.update({f"eval_{k}": v
                              for k, v in eval_fn(self.global_params).items()})
                self.history[-1] = stats
            logger.info("federated round %d: %s", r, stats)
        return self.history


class FederatedDGDMManager:
    """Convenience wrapper: federate DGDMTrainer instances over data shards
    (reference :763)."""

    def __init__(self, trainer_factory: Callable[[], Any],
                 client_loaders: Dict[str, Any],
                 local_steps: int = 4,
                 strategy: FederatedStrategy | str = "fedavg",
                 dp: Optional[DPConfig] = None, seed: int = 0):
        self.trainers = {cid: trainer_factory() for cid in client_loaders}
        self.client_loaders = client_loaders
        self.local_steps = local_steps
        base_trainer = next(iter(self.trainers.values()))
        if base_trainer.state is None:
            raise ValueError("trainer_factory must return initialized trainers")
        self.server = FederatedServer(base_trainer.state.params,
                                      strategy=strategy, seed=seed)
        for cid, trainer in self.trainers.items():
            loader = client_loaders[cid]

            def make_update(trainer=trainer, loader=loader):
                def local_update(global_params, round_idx):
                    trainer.state = trainer.state.replace(params=global_params)
                    it = iter(loader)
                    for _ in range(self.local_steps):
                        try:
                            batch = next(it)
                        except StopIteration:
                            it = iter(loader)
                            batch = next(it)
                        trainer.training_step(batch, epoch=0)
                    return trainer.state.params
                return local_update

            self.server.register_client(FederatedClient(
                cid, make_update(), num_samples=len(loader), dp=dp))

    def run(self, num_rounds: int, eval_fn=None) -> List[Dict[str, float]]:
        return self.server.run(num_rounds, eval_fn)

    @property
    def global_params(self):
        return self.server.global_params
