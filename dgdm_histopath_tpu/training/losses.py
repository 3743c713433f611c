"""Training losses for DGDM pretraining and finetuning.

Parity surface: reference ``dgdm_histopath/training/losses.py`` —
``DiffusionLoss`` (:15-70), ``ContrastiveLoss`` InfoNCE over in-batch nodes
(:73-213), ``MaskedLanguageModelingLoss`` (:216-266),
``GraphReconstructionLoss`` with negative sampling (:269-410),
``MultiTaskLoss`` Kendall weighting (:413-454).

TPU-native: pure functions over padded/batched arrays; similarity matrices
are MXU matmuls; all reductions are mask-correct (padding contributes zero).
Losses accumulate in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def diffusion_loss(
    predicted_noise: jnp.ndarray,
    true_noise: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    loss_type: str = "mse",
    huber_delta: float = 1.0,
) -> jnp.ndarray:
    """Noise-prediction loss (mse/mae/huber), masked over padding nodes."""
    err = predicted_noise.astype(jnp.float32) - true_noise.astype(jnp.float32)
    if loss_type == "mse":
        per = err ** 2
    elif loss_type == "mae":
        per = jnp.abs(err)
    elif loss_type == "huber":
        abs_err = jnp.abs(err)
        quad = jnp.minimum(abs_err, huber_delta)
        per = 0.5 * quad ** 2 + huber_delta * (abs_err - quad)
    else:
        raise ValueError(f"unknown diffusion loss type {loss_type!r}")
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(jnp.float32)
    while m.ndim < per.ndim:
        m = m[..., None]
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * (per.size / m.size), 1.0)


def contrastive_loss(
    node_embeddings: jnp.ndarray,   # [B, N, F]
    node_mask: jnp.ndarray,         # [B, N]
    temperature: float = 0.1,
    max_nodes_per_graph: int = 64,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """InfoNCE: nodes of the same graph are positives, nodes of other graphs
    in the batch are negatives (reference ``losses.py:123-175``).

    The reference builds an O((B·N)²) similarity matrix over *all* nodes; at
    N=1000+ that blows HBM, so we subsample ``max_nodes_per_graph`` nodes per
    graph. The subsample is a *uniform random* draw over each graph's real
    (unpadded) nodes when ``rng`` is given — a fixed slice would bias toward
    raster-order top rows every step, and for re-masked graphs (node
    subsampling / adaptive pooling) a leading slice can be mostly padding.
    Without ``rng`` the selection is still mask-aware (real nodes first) but
    deterministic. Static shapes throughout: selection is a top-k over
    ``mask*2 + uniform`` so real nodes always outrank padding.
    """
    b, n, f = node_embeddings.shape
    m = min(n, max_nodes_per_graph)
    if m < n:
        score = node_mask.astype(jnp.float32) * 2.0
        if rng is not None:
            score = score + jax.random.uniform(rng, (b, n))
        _, sel = jax.lax.top_k(score, m)                     # [B, M] indices
        emb = jnp.take_along_axis(node_embeddings, sel[..., None], axis=1)
        mask = jnp.take_along_axis(node_mask, sel, axis=1)   # [B, M]
        emb = emb.astype(jnp.float32)
    else:
        emb = node_embeddings.astype(jnp.float32)            # [B, M, F]
        mask = node_mask                                     # [B, M]

    flat = emb.reshape(b * m, f)
    flat_mask = mask.reshape(b * m)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(flat * flat, axis=-1, keepdims=True), 1e-12))
    unit = flat / norm
    sim = jnp.dot(unit, unit.T, preferred_element_type=jnp.float32) / temperature

    graph_id = jnp.repeat(jnp.arange(b), m)
    pos_mask = (graph_id[:, None] == graph_id[None, :])
    eye = jnp.eye(b * m, dtype=bool)
    valid = flat_mask[:, None] & flat_mask[None, :] & ~eye
    pos_mask = pos_mask & valid

    neg_inf = jnp.finfo(jnp.float32).min
    logits = jnp.where(valid, sim, neg_inf)
    log_denom = jax.nn.logsumexp(logits, axis=-1)
    # mean over positives of -log p(pos | anchor)
    pos_logp = jnp.where(pos_mask, sim - log_denom[:, None], 0.0)
    pos_count = jnp.sum(pos_mask.astype(jnp.float32), axis=-1)
    anchor_ok = flat_mask & (pos_count > 0)
    per_anchor = -jnp.sum(pos_logp, axis=-1) / jnp.maximum(pos_count, 1.0)
    return (jnp.sum(per_anchor * anchor_ok.astype(jnp.float32))
            / jnp.maximum(jnp.sum(anchor_ok.astype(jnp.float32)), 1.0))


def contrastive_loss_pairs(
    anchor: jnp.ndarray,     # [P, F]
    positive: jnp.ndarray,   # [P, F]
    temperature: float = 0.1,
) -> jnp.ndarray:
    """Explicit-pair InfoNCE variant (reference ``losses.py:177-213``)."""
    a = anchor.astype(jnp.float32)
    p = positive.astype(jnp.float32)
    a = a / jnp.sqrt(jnp.maximum(jnp.sum(a * a, -1, keepdims=True), 1e-12))
    p = p / jnp.sqrt(jnp.maximum(jnp.sum(p * p, -1, keepdims=True), 1e-12))
    logits = jnp.dot(a, p.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(a.shape[0])
    return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[labels, labels])


def masked_lm_loss(
    logits: jnp.ndarray,      # [B, N, V]
    targets: jnp.ndarray,     # [B, N] int
    masked: jnp.ndarray,      # [B, N] bool — positions that were masked
) -> jnp.ndarray:
    """CE over masked-entity predictions (reference ``losses.py:216-266``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    m = masked.astype(jnp.float32)
    return -jnp.sum(picked * m) / jnp.maximum(jnp.sum(m), 1.0)


def graph_reconstruction_loss(
    node_embeddings: jnp.ndarray,   # [B, N, F]
    nbr_idx: jnp.ndarray,           # [B, N, K] positive edges
    nbr_mask: jnp.ndarray,          # [B, N, K]
    node_mask: jnp.ndarray,         # [B, N]
    rng: jax.Array,
    num_negatives: int = 1,
    focal_gamma: float = 0.0,
) -> jnp.ndarray:
    """Edge-existence BCE with random negative sampling
    (reference ``losses.py:269-410``). Edge score = dot(h_i, h_j)."""
    from ..ops.graph import gather_neighbors

    b, n, f = node_embeddings.shape
    k = nbr_idx.shape[-1]
    h = node_embeddings.astype(jnp.float32)

    pos_nbr = gather_neighbors(h, nbr_idx)                     # [B, N, K, F]
    pos_logits = jnp.einsum("bnf,bnkf->bnk", h, pos_nbr)
    neg_idx = jax.random.randint(rng, (b, n, k * num_negatives), 0, n)
    neg_nbr = gather_neighbors(h, neg_idx)
    neg_logits = jnp.einsum("bnf,bnkf->bnk", h, neg_nbr)

    def bce(logits, target):
        p = jax.nn.sigmoid(logits)
        ce = target * jax.nn.softplus(-logits) + (1 - target) * jax.nn.softplus(logits)
        if focal_gamma > 0.0:
            pt = target * p + (1 - target) * (1 - p)
            ce = ce * (1 - pt) ** focal_gamma
        return ce

    pos_m = (nbr_mask & node_mask[..., None]).astype(jnp.float32)
    neg_m = jnp.repeat(node_mask[..., None].astype(jnp.float32), k * num_negatives, axis=-1)
    pos_term = jnp.sum(bce(pos_logits, 1.0) * pos_m) / jnp.maximum(jnp.sum(pos_m), 1.0)
    neg_term = jnp.sum(bce(neg_logits, 0.0) * neg_m) / jnp.maximum(jnp.sum(neg_m), 1.0)
    return pos_term + neg_term


def multi_task_loss(losses: jnp.ndarray, log_vars: jnp.ndarray) -> jnp.ndarray:
    """Kendall-style uncertainty weighting over a vector of task losses
    (reference ``losses.py:413-454``)."""
    losses = losses.astype(jnp.float32)
    return jnp.sum(jnp.exp(-log_vars) * losses + 0.5 * log_vars)
