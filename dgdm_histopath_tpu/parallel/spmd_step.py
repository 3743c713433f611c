"""Explicit-collective SPMD train step via ``shard_map`` + ``psum``.

The default trainer path relies on GSPMD: ``jit`` over sharded inputs, XLA
chooses the gradient all-reduce. This module provides the hand-written
equivalent — per-device loss/grad computation inside ``shard_map`` with an
explicit ``jax.lax.pmean`` over the ``data`` axis — for two reasons:

  1. it pins the communication pattern (one pmean per step over ICI),
     immune to partitioner regressions;
  2. it is the extension point for hierarchical collectives (per-slice
     pmean → cross-slice psum over DCN) when running multi-slice.

Numerical parity with the GSPMD path is tested on the 8-device CPU mesh
(tests/test_spmd.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .mesh import DATA_AXIS


def make_spmd_train_step(
    loss_fn: Callable,       # (params, batch, rngs) -> (loss, metrics)
    tx: optax.GradientTransformation,
    mesh: Mesh,
    rng_fold: Callable = None,
) -> Callable:
    """Build an explicit-psum train step.

    ``loss_fn`` computes the LOCAL (per-shard) mean loss; gradients are
    pmean'd across ``data`` so the update equals the global-batch gradient.
    Returned step: ``step(state, batch) -> (state, metrics)`` where ``state``
    is a ``training.trainer.TrainState``.
    """

    def per_device_step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        # same rng on every shard (params are replicated; masking/diffusion
        # noise should differ per shard → fold in the device index)
        axis_idx = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(rng, axis_idx)
        rngs = {"diffusion": jax.random.fold_in(rng, 0),
                "masking": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2)}

        def scalar_loss(params):
            loss, metrics = loss_fn(params, batch, rngs)
            return loss.astype(jnp.float32), metrics

        (loss, metrics), grads = jax.value_and_grad(scalar_loss,
                                                    has_aux=True)(state.params)
        # THE collective: average gradients and metrics across data shards
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        return new_state, metrics

    # state replicated; batch sharded on leading axis
    state_spec = P()
    batch_spec = P(DATA_AXIS)

    try:
        smapped = shard_map(
            per_device_step, mesh=mesh,
            in_specs=(state_spec, batch_spec),
            out_specs=(state_spec, state_spec),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax uses check_rep
        smapped = shard_map(
            per_device_step, mesh=mesh,
            in_specs=(state_spec, batch_spec),
            out_specs=(state_spec, state_spec),
            check_rep=False,
        )
    return jax.jit(smapped, donate_argnums=(0,))


def hierarchical_pmean(tree: Any, intra_axis: str, inter_axis: str = None):
    """Two-stage reduction for multi-slice meshes: pmean within a slice
    (ICI), then across slices (DCN). With one axis it is a plain pmean."""
    out = jax.lax.pmean(tree, intra_axis)
    if inter_axis is not None:
        out = jax.lax.pmean(out, inter_axis)
    return out
