"""Mixture-of-Experts FFN with static-shape, MXU-friendly grouped dispatch.

The reference has no MoE anywhere (its capacity story is "cap the patch
count", SURVEY §5.7) — this is beyond-parity width scaling for the DGDM
family: a residual expert FFN after the message-passing stack whose
parameter count grows with ``num_experts`` while per-token FLOPs stay
constant. Usable stand-alone or via ``DGDMModel(moe_experts=E)``.

TPU-native design (GShard grouped dispatch, not a torch translation):

* tokens are split into fixed-size **groups** (GShard's trick) so the dense
  dispatch/combine tensors are ``[g, G, E, C]`` with per-group capacity
  ``C = cf·G·k/E`` — total dispatch cost is ``T·E·C·F`` with C independent
  of T, i.e. linear in tokens. A flat (ungrouped) formulation would carry a
  ``[T, E, cf·T·k/E]`` tensor: multi-GB and super-linear at the 32k tokens
  of a Base batch-32 step;
* routing, position assignment and capacity drop are masked one-hot
  cumsums within each group — every shape static, nothing ragged;
* dispatch and combine are dense einsums that contract on the MXU, and the
  expert compute is three batched matmuls over ``[E, g·C, F]``;
* expert parameters carry a leading ``[E]`` axis — shard it over an
  ``expert`` mesh axis with ``parallel/ep.py`` and GSPMD turns the
  dispatch/combine einsums into the expert all-to-alls while the expert
  matmuls stay fully local;
* padded graph nodes are mask-correct: they claim no capacity, receive
  zero output, and do not contribute to the load-balance loss.

Router math runs in f32; the load-balance auxiliary loss is the Switch
``E · Σ_e f_e · P_e`` per group, averaged over groups (≈ 1.0 balanced).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class MoEFFN(nn.Module):
    """Top-k routed expert FFN over the token (node) axis.

    Input ``x: [..., N, F]`` with ``token_mask: [..., N]``; returns
    ``(out [..., N, F], aux_loss scalar f32)``. Masked tokens get zeros.
    """

    features: int                 # F (input == output dim)
    hidden_dim: int               # per-expert FFN hidden width
    num_experts: int = 8
    top_k: int = 1                # 1 = Switch, 2 = GShard-style
    capacity_factor: float = 1.5  # C = ceil(cf · G · top_k / E) per group
    # routing-group size (GShard): capacity is per group, keeping dispatch
    # linear in tokens. Falls back to the trailing token-axis length N when
    # it doesn't divide the flat token count (N always does).
    group_size: int = 1024
    activation: str = "gelu"
    dropout: float = 0.0          # expert-hidden dropout ('dropout' rng)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, token_mask: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.top_k not in (1, 2):
            raise ValueError("top_k must be 1 or 2")
        e_num, f, hid = self.num_experts, self.features, self.hidden_dim
        if x.shape[-1] != f:
            raise ValueError(f"x feature dim {x.shape[-1]} != features {f}")
        import math
        lead = x.shape[:-1]
        t_tok = math.prod(lead) if lead else 1
        grp = min(self.group_size, t_tok)
        if t_tok % grp != 0:
            grp = x.shape[-2]          # per-graph groups always divide
        n_grp = t_tok // grp
        xg = x.reshape(n_grp, grp, f)                        # [g, G, F]
        mask = token_mask.reshape(n_grp, grp).astype(jnp.float32)
        cap = int(-(-self.capacity_factor * grp * self.top_k // e_num))
        cap = max(1, min(cap, grp))

        # --- routing (f32 end to end), per group ---
        logits = nn.Dense(e_num, name="router", dtype=jnp.float32,
                          param_dtype=jnp.float32)(
            xg.astype(jnp.float32))                          # [g, G, E]
        probs = jax.nn.softmax(logits, axis=-1)

        remaining = probs
        count_e = jnp.zeros((n_grp, e_num), jnp.float32)     # used capacity
        slot_onehots, slot_gates, slot_pos = [], [], []
        first_choice = None
        for _ in range(self.top_k):
            eidx = jnp.argmax(remaining, axis=-1)            # [g, G]
            oh_raw = jax.nn.one_hot(eidx, e_num,
                                    dtype=jnp.float32) * mask[..., None]
            gate = jnp.sum(remaining * oh_raw, axis=-1)      # [g, G]
            if first_choice is None:
                first_choice = oh_raw
            # position of each token within its expert's capacity buffer:
            # tokens assigned in earlier slots + earlier tokens in this
            # slot (exclusive cumsum along the group)
            pos_e = count_e[:, None, :] + jnp.cumsum(oh_raw, axis=1) - oh_raw
            pos = jnp.sum(pos_e * oh_raw, axis=-1)           # [g, G]
            keep = (pos < cap).astype(jnp.float32) * mask
            oh = oh_raw * keep[..., None]
            count_e = count_e + jnp.sum(oh, axis=1)
            slot_onehots.append(oh)
            slot_gates.append(gate * keep)
            slot_pos.append(pos)
            # zero the CHOSEN expert even if capacity-dropped, so the next
            # slot picks a different one
            remaining = remaining * (1.0 - oh_raw)
        # normalize the selected gates to sum to 1 per token (GShard);
        # a dropped slot keeps its zero gate so drops lose their share
        gnorm = jnp.maximum(sum(slot_gates), 1e-9)
        dispatch = jnp.zeros((n_grp, grp, e_num, cap), jnp.float32)
        combine = jnp.zeros((n_grp, grp, e_num, cap), jnp.float32)
        for oh, gate, pos in zip(slot_onehots, slot_gates, slot_pos):
            sel = oh[..., None] * jax.nn.one_hot(
                jnp.minimum(pos, cap - 1).astype(jnp.int32), cap,
                dtype=jnp.float32)[..., None, :]
            dispatch = dispatch + sel
            combine = combine + sel * (gate / gnorm)[..., None, None]

        # --- expert compute: three batched MXU matmuls ---
        w_in = self.param("w_in", nn.initializers.lecun_normal(),
                          (e_num, f, hid), self.param_dtype)
        b_in = self.param("b_in", nn.initializers.zeros,
                          (e_num, hid), self.param_dtype)
        w_out = self.param("w_out", nn.initializers.lecun_normal(),
                           (e_num, hid, f), self.param_dtype)
        b_out = self.param("b_out", nn.initializers.zeros,
                           (e_num, f), self.param_dtype)
        from ..models.encoders import get_activation
        act = get_activation(self.activation)

        ein = jnp.einsum("gsec,gsf->egcf", dispatch.astype(self.dtype),
                         xg.astype(self.dtype))              # [E, g, C, F]
        h = jnp.einsum("egcf,efh->egch", ein, w_in.astype(self.dtype))
        h = act(h + b_in[:, None, None, :].astype(self.dtype))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        eout = jnp.einsum("egch,ehf->egcf", h, w_out.astype(self.dtype))
        eout = eout + b_out[:, None, None, :].astype(self.dtype)
        out = jnp.einsum("egcf,gsec->gsf", eout,
                         combine.astype(self.dtype))         # [g, G, F]

        # --- Switch load-balance loss over REAL tokens, first choice,
        #     per group then averaged over groups ---
        n_real = jnp.maximum(jnp.sum(mask, axis=1), 1.0)              # [g]
        frac_tokens = jnp.sum(first_choice, axis=1) / n_real[:, None]  # f_e
        mean_prob = (jnp.sum(probs * mask[..., None], axis=1)
                     / n_real[:, None])                                # P_e
        # groups that are pure padding (filler graphs) carry zero weight
        has_real = (jnp.sum(mask, axis=1) > 0).astype(jnp.float32)
        per_group = e_num * jnp.sum(frac_tokens * mean_prob, axis=-1)
        aux = (jnp.sum(per_group * has_real)
               / jnp.maximum(jnp.sum(has_real), 1.0))

        out = out * mask[..., None].astype(out.dtype)
        return out.reshape(lead + (f,)), aux.astype(jnp.float32)


__all__ = ["MoEFFN"]
