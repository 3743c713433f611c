"""DDPM diffusion schedules and noising/denoising primitives.

Parity surface: the reference's ``DiffusionScheduler``/``DiffusionLayer``
(``dgdm_histopath/core/diffusion.py:16-275``) — linear/cosine/sigmoid beta
schedules, q(x_t | x_0) forward noising, noise-prediction, and the DDPM
ancestral sampling loop. TPU-native differences:

  * schedules are precomputed host-side once and closed over as constants;
  * the sampling loop is a ``jax.lax.scan`` over timesteps (no Python loop
    under jit);
  * the sigmoid schedule is fixed to produce valid betas in
    [beta_start, beta_end] (the reference returned the raw [-3, 3]-sigmoid
    range — SURVEY §8.4);
  * ``add_noise`` returns the noise it actually used so the training loss can
    regress the true corruption (the reference resampled a fresh target —
    SURVEY §8.1).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Precomputed schedule constants; every field is [T] float32."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    num_steps: int,
    schedule: str = "cosine",
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> DiffusionSchedule:
    """Build a DDPM beta schedule (host-side, numpy; returned as jnp consts)."""
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    elif schedule == "cosine":
        # Nichol & Dhariwal cosine alphas-cumprod; betas derived from ratios.
        s = 0.008
        steps = np.arange(num_steps + 1, dtype=np.float64)
        f = np.cos(((steps / num_steps) + s) / (1 + s) * math.pi / 2) ** 2
        alphas_bar = f / f[0]
        betas = 1.0 - (alphas_bar[1:] / alphas_bar[:-1])
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sigmoid":
        # Sigmoid ramp correctly rescaled into [beta_start, beta_end]
        # (fixes reference core/diffusion.py:56-61).
        t = np.linspace(-6.0, 6.0, num_steps, dtype=np.float64)
        sig = 1.0 / (1.0 + np.exp(-t))
        sig = (sig - sig.min()) / (sig.max() - sig.min())
        betas = beta_start + sig * (beta_end - beta_start)
    else:
        raise ValueError(f"unknown diffusion schedule: {schedule!r}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / np.maximum(1.0 - alphas_cumprod, 1e-12)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        posterior_variance=f32(posterior_variance),
    )


def add_noise(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample x_t ~ q(x_t | x_0) and return (x_t, noise).

    ``t`` broadcasts against x0's leading axes (per-node or per-graph
    timesteps both work). Returning the noise is the bug-fix over the
    reference's loss target (SURVEY §8.1).
    """
    noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    sa = schedule.sqrt_alphas_cumprod[t].astype(x0.dtype)
    sb = schedule.sqrt_one_minus_alphas_cumprod[t].astype(x0.dtype)
    while sa.ndim < x0.ndim:
        sa = sa[..., None]
        sb = sb[..., None]
    return sa * x0 + sb * noise, noise


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int = 128,
                              max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, matching the reference's 128-d layout
    (reference ``core/diffusion.py:101-121``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def ddpm_sample_step(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    predicted_noise: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """One ancestral DDPM reverse step (mirrors reference sample loop
    ``core/diffusion.py:214-275``), safe at t == 0."""
    beta = schedule.betas[t]
    alpha = schedule.alphas[t]
    sb = schedule.sqrt_one_minus_alphas_cumprod[t]
    mean = (x_t - (beta / sb) * predicted_noise) * jax.lax.rsqrt(alpha)
    var = schedule.posterior_variance[t]
    noise = jax.random.normal(rng, x_t.shape, dtype=x_t.dtype)
    nonzero = (t > 0).astype(x_t.dtype)
    return mean + nonzero * jnp.sqrt(jnp.maximum(var, 0.0)) * noise


def ddpm_sample(
    schedule: DiffusionSchedule,
    denoise_fn,
    shape: Tuple[int, ...],
    rng: jax.Array,
    cond: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full ancestral sampling as a ``lax.scan`` from t = T-1 down to 0.

    ``denoise_fn(x_t, t, cond) -> predicted noise`` must be jittable.
    """
    T = schedule.num_steps
    rng, init_rng = jax.random.split(rng)
    x_init = jax.random.normal(init_rng, shape, dtype=jnp.float32)

    def step(carry, t):
        x, r = carry
        r, r_pred, r_step = jax.random.split(r, 3)
        eps = denoise_fn(x, t, cond)
        x = ddpm_sample_step(schedule, x, eps, t, r_step)
        return (x, r), None

    ts = jnp.arange(T - 1, -1, -1)
    (x_final, _), _ = jax.lax.scan(step, (x_init, rng), ts)
    return x_final
