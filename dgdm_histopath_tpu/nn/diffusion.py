"""DiffusionLayer: noise-prediction network over node features.

Parity surface: reference ``dgdm_histopath/core/diffusion.py:64-275`` —
forward-noising q(x_t|x_0), an MLP denoiser conditioned on a 128-d sinusoidal
timestep embedding (and optional context), and DDPM ancestral sampling.

TPU-native differences: the schedule is precomputed constants
(``ops.diffusion.make_schedule``); training draws one timestep per *graph*
and noises all its nodes consistently; sampling is a ``lax.scan``. The layer
returns the noise it actually added so the loss regresses the true
corruption (reference bug — SURVEY §8.1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.diffusion import (
    DiffusionSchedule,
    add_noise,
    ddpm_sample_step,
    make_schedule,
    sinusoidal_time_embedding,
)

Dtype = jnp.dtype


class DenoiserMLP(nn.Module):
    """Predicts noise from (x_t, t_embedding, optional conditioning)."""

    features: int
    hidden: int = 0  # 0 -> 4 * features
    time_embed_dim: int = 128
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, t: jnp.ndarray,
                 cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        hidden = self.hidden or 4 * self.features
        t_emb = sinusoidal_time_embedding(t, self.time_embed_dim)
        t_emb = nn.Dense(hidden, name="time_mlp1", dtype=self.dtype,
                         param_dtype=self.param_dtype)(t_emb.astype(x_t.dtype))
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(hidden, name="time_mlp2", dtype=self.dtype,
                         param_dtype=self.param_dtype)(t_emb)
        # broadcast per-graph time embedding over node axis
        while t_emb.ndim < x_t.ndim:
            t_emb = t_emb[..., None, :]

        h = nn.Dense(hidden, name="in_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x_t)
        h = h + t_emb
        if cond is not None:
            h = h + nn.Dense(hidden, name="cond_proj", dtype=self.dtype,
                             param_dtype=self.param_dtype)(cond.astype(x_t.dtype))
        h = nn.silu(nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="norm1")(h))
        h = nn.Dense(hidden, name="mid_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.silu(nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="norm2")(h))
        return nn.Dense(self.features, name="out_proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(h)


class DiffusionLayer(nn.Module):
    """Forward-noising + denoiser; the SSL objective of DGDM pretraining."""

    features: int
    num_steps: int = 10
    schedule: str = "cosine"
    time_embed_dim: int = 128
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.constants: DiffusionSchedule = make_schedule(self.num_steps, self.schedule)
        self.denoiser = DenoiserMLP(
            features=self.features, time_embed_dim=self.time_embed_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        x0: jnp.ndarray,                      # [..., N, F] clean node features
        rng: jax.Array,
        cond: Optional[jnp.ndarray] = None,
        t: Optional[jnp.ndarray] = None,      # [...] per-graph timesteps
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Training forward: returns (predicted_noise, true_noise, t)."""
        rng_t, rng_noise = jax.random.split(rng)
        batch_shape = x0.shape[:-2]
        if t is None:
            t = jax.random.randint(rng_t, batch_shape, 0, self.num_steps)
        x_t, noise = add_noise(self.constants, x0, t, rng_noise)
        predicted = self.denoiser(x_t, t, cond)
        return predicted, noise, t

    def predict_noise(self, x_t: jnp.ndarray, t: jnp.ndarray,
                      cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.denoiser(x_t, t, cond)

    def sample(self, rng: jax.Array, shape: Tuple[int, ...],
               cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """DDPM ancestral sampling via lax.scan (reference :214-275)."""
        rng, init_rng = jax.random.split(rng)
        x_init = jax.random.normal(init_rng, shape, dtype=jnp.float32)

        def step(carry, t):
            x, r = carry
            r, r_step = jax.random.split(r)
            t_b = jnp.broadcast_to(t, shape[:-2]) if len(shape) > 2 else t
            eps = self.denoiser(x.astype(self.dtype), t_b, cond).astype(jnp.float32)
            x = ddpm_sample_step(self.constants, x, eps, t, r_step)
            return (x, r), None

        ts = jnp.arange(self.num_steps - 1, -1, -1)
        (x_final, _), _ = jax.lax.scan(step, (x_init, rng), ts)
        return x_final
