"""GPipe-style pipeline parallelism for the GraphEncoder layer stack.

The reference has no pipeline parallelism anywhere (SURVEY §2.7: Lightning
DDP is its only distribution strategy) — this is TPU-native headroom, the
fourth sharding tier next to DP (`mesh.py`), TP (`tp.py`) and node-sharding
SP (`sp.py`/`halo.py`). It targets deep GraphEncoder stacks (``graph_layers``
≥ 8, XL-config territory) where holding every layer's activations on one
chip bounds the bucket size.

Design (the scaling-book pipelining recipe, not a torch translation):

* the ``num_layers`` homogeneous ``DynamicGraphLayer`` blocks are stacked
  leaf-wise into one pytree with a leading ``[L]`` axis and sharded over a
  ``pipe`` mesh axis — each stage holds ``L / pipe`` consecutive layers;
* inside one ``shard_map``, a ``lax.scan`` runs the classic GPipe schedule:
  at tick ``t`` every stage applies its local layers (an inner ``lax.scan``
  over the stacked params) to the microbatch that reached it, then rotates
  activations to the next stage with a single ``lax.ppermute`` — the only
  collective in the steady state, riding ICI neighbour links;
* microbatch ``m`` sits at stage ``s`` at tick ``t = m + s``; ticks outside
  ``[0, M)`` process zero-padding whose outputs never land in the result;
* the last stage's collected outputs are broadcast back with one masked
  ``psum`` so the (replicated-over-pipe) model tail can consume them.

Bubble fraction is ``(S-1)/(M+S-1)`` for ``S`` stages and ``M``
microbatches — pick ``num_micro ≥ 2·pipe`` to keep it under a third.
Backward pipelines automatically: AD reverses the ``ppermute`` ring.

Composable with DP: build the mesh as ``('data', 'pipe')`` and the batch
axis stays sharded over ``data`` while params shard over ``pipe``.
Exact-parity and gradient-parity tests: ``tests/test_pp.py``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..nn.graph_layers import DynamicGraphLayer
from ..utils.logging import get_logger

PIPE_AXIS = "pipe"

logger = get_logger("parallel.pp")


def pipe_size(mesh: Mesh) -> int:
    """Size of the ``pipe`` axis (1 when the mesh has none)."""
    try:
        return int(mesh.shape[PIPE_AXIS])
    except KeyError:
        return 1


def stack_layer_params(encoder_params: Any, num_layers: int) -> Any:
    """Stack ``layer0..layer{L-1}`` param subtrees into one ``[L, ...]`` tree.

    The GraphEncoder's layers are shape-homogeneous (input_proj lifts x to
    ``hidden_dim`` before layer 0, so no layer owns an ``in_proj``), which is
    what makes the leading stacking axis — and sharding it over ``pipe`` —
    well-defined.
    """
    subtrees = []
    for i in range(num_layers):
        key = f"layer{i}"
        if key not in encoder_params:
            raise ValueError(f"encoder params missing '{key}' "
                             f"(has {sorted(encoder_params.keys())})")
        subtrees.append(encoder_params[key])
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *subtrees)


def unstack_layer_params(stacked: Any, num_layers: int) -> dict:
    """Inverse of :func:`stack_layer_params` (checkpoint interop)."""
    return {f"layer{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
            for i in range(num_layers)}


def _shard_map_compat(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax uses check_rep
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def make_pp_layers_fn(
    mesh: Mesh,
    layer_module: nn.Module,
    activation,
    num_layers: int,
    num_micro: int,
    *,
    data_axis: Optional[str] = None,
    has_edges: bool = True,
):
    """Build the pipelined equivalent of the GraphEncoder's layer loop.

    Returns ``fn(stacked_params, h, nbr_idx, nbr_mask[, e]) -> h_out`` that
    matches ``for i in range(L): h = act(layer_i(h, ...))`` exactly
    (deterministic mode), jitted over ``mesh``. ``stacked_params`` must come
    from :func:`stack_layer_params` and carry a leading ``[L]`` axis; it is
    sharded over ``pipe``; the batch axes shard over ``data_axis`` if given.
    """
    n_stages = pipe_size(mesh)
    if n_stages < 1 or num_layers % n_stages != 0:
        raise ValueError(
            f"num_layers ({num_layers}) must be divisible by the pipe axis "
            f"({n_stages})")
    layers_per_stage = num_layers // n_stages
    if num_micro < 1:
        raise ValueError("num_micro must be >= 1")
    m_micro = num_micro
    batch_spec = P(data_axis) if data_axis else P()
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def device_fn(stacked_local, h, nbr_idx, nbr_mask, e):
        # stacked_local: [L/S, ...]; h: [b_loc, N, F] (per data-shard view)
        b_loc = h.shape[0]
        if b_loc % m_micro != 0:
            raise ValueError(
                f"per-shard batch {b_loc} not divisible by num_micro "
                f"{m_micro}")
        mb = b_loc // m_micro

        def split(a):
            return a.reshape((m_micro, mb) + a.shape[1:])

        h_m = split(h)
        idx_m = split(nbr_idx)
        mask_m = split(nbr_mask)
        e_m = split(e) if has_edges else None
        stage = jax.lax.axis_index(PIPE_AXIS)

        def apply_stage(x, idx, msk, ev):
            def layer_body(hh, p):
                hh = layer_module.apply({"params": p}, hh, idx, msk, ev, True)
                return activation(hh), None
            x, _ = jax.lax.scan(layer_body, x, stacked_local)
            return x

        def tick(carry, t):
            state, out = carry
            # stage 0 ingests microbatch t (clamped past the end; those
            # outputs drain through the pipe but never reach a valid slot)
            feed = jax.lax.dynamic_index_in_dim(
                h_m, jnp.clip(t, 0, m_micro - 1), 0, keepdims=False)
            x = jnp.where(stage == 0, feed, state)
            # the microbatch currently AT this stage is m = t - stage; its
            # per-sample neighbour structure must travel with it
            m_here = jnp.clip(t - stage, 0, m_micro - 1)
            idx = jax.lax.dynamic_index_in_dim(idx_m, m_here, 0, keepdims=False)
            msk = jax.lax.dynamic_index_in_dim(mask_m, m_here, 0, keepdims=False)
            ev = (jax.lax.dynamic_index_in_dim(e_m, m_here, 0, keepdims=False)
                  if has_edges else None)
            y = apply_stage(x, idx, msk, ev)
            # last stage finishes microbatch t-(S-1) at tick t; earlier junk
            # writes to slot 0 are overwritten by the real microbatch 0 at
            # tick S-1 (each valid slot's write is the final one)
            slot = jnp.clip(t - (n_stages - 1), 0, m_micro - 1)
            out = jax.lax.dynamic_update_index_in_dim(out, y, slot, 0)
            # THE collective: rotate activations one stage forward
            state = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return (state, out), None

        state0 = jnp.zeros_like(h_m[0])
        out0 = jnp.zeros_like(h_m)
        (_, out), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(m_micro + n_stages - 1))
        # only the last stage holds real outputs; masked psum broadcasts them
        out = out * (stage == n_stages - 1).astype(out.dtype)
        out = jax.lax.psum(out, PIPE_AXIS)
        return out.reshape((b_loc,) + h.shape[1:])

    if has_edges:
        fn = device_fn
        in_specs = (P(PIPE_AXIS), batch_spec, batch_spec, batch_spec,
                    batch_spec)
    else:
        def fn(stacked_local, h, nbr_idx, nbr_mask):  # noqa: ANN001
            return device_fn(stacked_local, h, nbr_idx, nbr_mask, None)
        in_specs = (P(PIPE_AXIS), batch_spec, batch_spec, batch_spec)

    smapped = _shard_map_compat(fn, mesh, in_specs, batch_spec)
    return jax.jit(smapped)


def pp_graph_encoder_apply(
    encoder: nn.Module,
    params: Any,
    mesh: Mesh,
    x: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    nbr_mask: jnp.ndarray,
    node_mask: jnp.ndarray,
    edge_attr: Optional[jnp.ndarray] = None,
    *,
    num_micro: Optional[int] = None,
    data_axis: Optional[str] = None,
    stacked_params: Any = None,
) -> jnp.ndarray:
    """Full GraphEncoder forward with the layer stack pipelined over ``pipe``.

    Numerically identical (deterministic mode) to
    ``encoder.apply({'params': params}, ...)['embeddings']``: the thin
    input/edge/output projections run replicated over ``pipe`` (sharded over
    ``data_axis``), only the L-layer message-passing stack is staged.
    ``stacked_params`` may be passed directly (training keeps the stacked
    layout as the canonical one); otherwise it is derived from ``params``.

    Convenience entry point: it builds (and retraces) the pipelined fn per
    call. Hot loops should call :func:`make_pp_layers_fn` once and reuse the
    returned jitted function.
    """
    from ..models.encoders import get_activation

    act = get_activation(encoder.activation)
    dtype = encoder.dtype
    pdtype = encoder.param_dtype
    dense_in = nn.Dense(encoder.hidden_dim, dtype=dtype, param_dtype=pdtype)
    h = dense_in.apply({"params": params["input_proj"]}, x)
    e = None
    if edge_attr is not None:
        dense_e = nn.Dense(encoder.hidden_dim // encoder.num_heads,
                           dtype=dtype, param_dtype=pdtype)
        e = dense_e.apply({"params": params["edge_proj"]},
                          edge_attr.astype(h.dtype))
    masked_nbr = nbr_mask & node_mask[..., None]
    if stacked_params is None:
        stacked_params = stack_layer_params(params, encoder.num_layers)
    layer_mod = DynamicGraphLayer(
        encoder.hidden_dim, encoder.num_heads, dropout=0.0,
        gather_impl=encoder.gather_impl, band_window=encoder.band_window,
        dtype=dtype, param_dtype=pdtype)
    if num_micro is None:
        num_micro = max(1, min(2 * pipe_size(mesh), int(x.shape[0])))
    fn = make_pp_layers_fn(
        mesh, layer_mod, act, encoder.num_layers, num_micro,
        data_axis=data_axis, has_edges=e is not None)
    h = fn(stacked_params, h, nbr_idx, masked_nbr, e) if e is not None \
        else fn(stacked_params, h, nbr_idx, masked_nbr)
    dense_out = nn.Dense(encoder.hidden_dim, dtype=dtype, param_dtype=pdtype)
    out = dense_out.apply({"params": params["output_proj"]}, h)
    return out * node_mask[..., None].astype(out.dtype)


def pp_bubble_fraction(n_stages: int, num_micro: int) -> float:
    """Idle fraction of the GPipe schedule: ``(S-1)/(M+S-1)``."""
    return (n_stages - 1) / (num_micro + n_stages - 1)


__all__ = ["PIPE_AXIS", "pipe_size", "stack_layer_params",
           "unstack_layer_params", "make_pp_layers_fn",
           "pp_graph_encoder_apply", "pp_bubble_fraction"]
