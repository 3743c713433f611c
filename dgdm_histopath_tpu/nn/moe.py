"""Mixture-of-Experts FFN with static-shape, MXU-friendly dispatch.

The reference has no MoE anywhere (its capacity story is "cap the patch
count", SURVEY §5.7) — this is beyond-parity width scaling for the DGDM
family: a residual expert FFN after the message-passing stack whose
parameter count grows with ``num_experts`` while per-token FLOPs stay
constant. Usable stand-alone or via ``DGDMModel(moe_experts=E)``.

TPU-native design (Switch/GShard dispatch, not a torch translation):

* routing, position assignment and capacity drop are computed with masked
  one-hot cumsums — every shape is static, nothing is ragged;
* dispatch and combine are dense ``[T, E, C]`` einsums that contract on the
  MXU (the classic dispatch/combine formulation), so the expert compute is
  three batched matmuls ``[E, C, F]·[E, F, H]``;
* expert parameters carry a leading ``[E]`` axis — shard it over an
  ``expert`` mesh axis with ``parallel/ep.py`` and GSPMD turns the
  dispatch/combine einsums into the expert all-to-alls while the expert
  matmuls stay fully local;
* padded graph nodes are mask-correct: they claim no capacity, receive
  zero output, and do not contribute to the load-balance loss.

Router math runs in f32; the load-balance auxiliary loss is the Switch
``E · Σ_e f_e · P_e`` over real tokens (≈ 1.0 when perfectly balanced).
"""

from __future__ import annotations

from typing import Optional, Tuple

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
    capacity_factor: float = 1.5  # C = ceil(cf · T_padded · top_k / E)
    activation: str = "gelu"
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
        lead = x.shape[:-1]
        xf = x.reshape(-1, f)                               # [T, F]
        mask = token_mask.reshape(-1).astype(jnp.float32)   # [T]
        t_tok = xf.shape[0]
        cap = int(-(-self.capacity_factor * t_tok * self.top_k // e_num))
        cap = max(1, min(cap, t_tok))

        # --- routing (f32 end to end) ---
        logits = nn.Dense(e_num, name="router", dtype=jnp.float32,
                          param_dtype=jnp.float32)(
            xf.astype(jnp.float32))                          # [T, E]
        probs = jax.nn.softmax(logits, axis=-1)

        remaining = probs
        count_e = jnp.zeros((e_num,), jnp.float32)           # used capacity
        slot_onehots, slot_gates, slot_pos = [], [], []
        first_choice = None
        for _ in range(self.top_k):
            eidx = jnp.argmax(remaining, axis=-1)            # [T]
            oh_raw = jax.nn.one_hot(eidx, e_num,
                                    dtype=jnp.float32) * mask[:, None]
            gate = jnp.sum(remaining * oh_raw, axis=-1)      # [T]
            if first_choice is None:
                first_choice = oh_raw
            # position of each token within its expert's capacity buffer:
            # tokens already assigned in earlier slots + earlier tokens in
            # this slot (exclusive cumsum)
            pos_e = count_e[None, :] + jnp.cumsum(oh_raw, axis=0) - oh_raw
            pos = jnp.sum(pos_e * oh_raw, axis=-1)           # [T]
            keep = (pos < cap).astype(jnp.float32) * mask
            oh = oh_raw * keep[:, None]
            count_e = count_e + jnp.sum(oh, axis=0)
            slot_onehots.append(oh)
            slot_gates.append(gate * keep)
            slot_pos.append(pos)
            # zero the CHOSEN expert even if capacity-dropped, so the next
            # slot picks a different one
            remaining = remaining * (1.0 - oh_raw)
        # normalize the selected gates to sum to 1 per token (GShard);
        # a dropped slot keeps its zero gate so drops lose their share
        gsum = sum(slot_gates)
        gnorm = jnp.maximum(gsum, 1e-9)
        dispatch = jnp.zeros((t_tok, e_num, cap), jnp.float32)
        combine = jnp.zeros((t_tok, e_num, cap), jnp.float32)
        for oh, gate, pos in zip(slot_onehots, slot_gates, slot_pos):
            sel = oh[:, :, None] * jax.nn.one_hot(
                jnp.minimum(pos, cap - 1).astype(jnp.int32), cap,
                dtype=jnp.float32)[:, None, :]
            dispatch = dispatch + sel
            combine = combine + sel * (gate / gnorm)[:, None, None]

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

        ein = jnp.einsum("tec,tf->ecf", dispatch.astype(self.dtype),
                         xf.astype(self.dtype))              # [E, C, F]
        h = jnp.einsum("ecf,efh->ech", ein, w_in.astype(self.dtype))
        h = act(h + b_in[:, None, :].astype(self.dtype))
        eout = jnp.einsum("ech,ehf->ecf", h, w_out.astype(self.dtype))
        eout = eout + b_out[:, None, :].astype(self.dtype)
        out = jnp.einsum("ecf,tec->tf", eout, combine.astype(self.dtype))

        # --- Switch load-balance loss over REAL tokens, first choice ---
        n_real = jnp.maximum(jnp.sum(mask), 1.0)
        frac_tokens = jnp.sum(first_choice, axis=0) / n_real          # f_e
        mean_prob = jnp.sum(probs * mask[:, None], axis=0) / n_real   # P_e
        aux = e_num * jnp.sum(frac_tokens * mean_prob)

        out = out * mask[:, None].astype(out.dtype)
        return out.reshape(lead + (f,)), aux.astype(jnp.float32)


__all__ = ["MoEFFN"]
