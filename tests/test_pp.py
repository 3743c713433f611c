"""Pipeline parallelism (parallel/pp.py): exact parity with the sequential
GraphEncoder layer loop, gradient parity through the ppermute ring, and
composition with the data axis. Runs on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.models.encoders import GraphEncoder, get_activation
from dgdm_histopath_tpu.nn.graph_layers import DynamicGraphLayer
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.parallel.mesh import make_mesh
from dgdm_histopath_tpu.parallel.pp import (
    make_pp_layers_fn, pipe_size, pp_bubble_fraction, pp_graph_encoder_apply,
    stack_layer_params, unstack_layer_params,
)

from conftest import make_synthetic_graph

HID, HEADS, LAYERS = 32, 4, 4


def make_encoder(**kw):
    return GraphEncoder(hidden_dim=HID, num_layers=LAYERS, num_heads=HEADS,
                        dropout=0.0, dtype=jnp.float32,
                        param_dtype=jnp.float32, **kw)


def make_batch(b=8, feat=16):
    gs = [make_synthetic_graph(seed=i, n_nodes=32, n_real=28, feat_dim=feat)
          for i in range(b)]
    return batch_graphs(gs)


def init_encoder(enc, g):
    return enc.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask,
                    g.node_mask, edge_attr=g.edge_attr,
                    deterministic=True)["params"]


class TestStacking:
    def test_stack_roundtrip(self):
        enc = make_encoder()
        g = make_batch(2)
        params = init_encoder(enc, g)
        stacked = stack_layer_params(params, LAYERS)
        # every leaf gained a leading [L] axis
        for leaf in jax.tree_util.tree_leaves(stacked):
            assert leaf.shape[0] == LAYERS
        back = unstack_layer_params(stacked, LAYERS)
        for i in range(LAYERS):
            a = jax.tree_util.tree_leaves(back[f"layer{i}"])
            b = jax.tree_util.tree_leaves(params[f"layer{i}"])
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_missing_layer_raises(self):
        with pytest.raises(ValueError, match="missing"):
            stack_layer_params({"layer0": {}}, 2)


class TestPipelineParity:
    def test_matches_sequential_encoder(self):
        """pipe=4 mesh, 1 layer/stage: bitwise-comparable to the dense run."""
        mesh = make_mesh(n_devices=4, axes=("pipe",))
        assert pipe_size(mesh) == 4
        enc = make_encoder()
        g = make_batch(8)
        params = init_encoder(enc, g)

        ref = enc.apply({"params": params}, g.x, g.nbr_idx, g.nbr_mask,
                        g.node_mask, edge_attr=g.edge_attr,
                        deterministic=True)["embeddings"]
        out = pp_graph_encoder_apply(enc, params, mesh, g.x, g.nbr_idx,
                                     g.nbr_mask, g.node_mask,
                                     edge_attr=g.edge_attr, num_micro=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_two_layers_per_stage(self):
        mesh = make_mesh(n_devices=2, axes=("pipe",))
        enc = make_encoder()
        g = make_batch(4)
        params = init_encoder(enc, g)
        ref = enc.apply({"params": params}, g.x, g.nbr_idx, g.nbr_mask,
                        g.node_mask, edge_attr=g.edge_attr,
                        deterministic=True)["embeddings"]
        out = pp_graph_encoder_apply(enc, params, mesh, g.x, g.nbr_idx,
                                     g.nbr_mask, g.node_mask,
                                     edge_attr=g.edge_attr, num_micro=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_data_pipe_composition(self):
        """2-D ('data','pipe') mesh: batch stays DP-sharded around the pipe."""
        mesh = make_mesh(axes=("data", "pipe"), shape=(2, 4))
        enc = make_encoder()
        g = make_batch(8)
        params = init_encoder(enc, g)
        ref = enc.apply({"params": params}, g.x, g.nbr_idx, g.nbr_mask,
                        g.node_mask, edge_attr=g.edge_attr,
                        deterministic=True)["embeddings"]
        out = pp_graph_encoder_apply(enc, params, mesh, g.x, g.nbr_idx,
                                     g.nbr_mask, g.node_mask,
                                     edge_attr=g.edge_attr, num_micro=2,
                                     data_axis="data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_no_edges_variant(self):
        mesh = make_mesh(n_devices=4, axes=("pipe",))
        enc = make_encoder()
        g = make_batch(4)
        params = init_encoder(enc, g)
        ref = enc.apply({"params": params}, g.x, g.nbr_idx, g.nbr_mask,
                        g.node_mask, edge_attr=None,
                        deterministic=True)["embeddings"]
        params_noedge = {k: v for k, v in params.items() if k != "edge_proj"}
        out = pp_graph_encoder_apply(enc, params_noedge, mesh, g.x, g.nbr_idx,
                                     g.nbr_mask, g.node_mask, edge_attr=None,
                                     num_micro=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_banded_layers_pipeline(self):
        """graph_window composes with pp (band formulation inside stages)."""
        mesh = make_mesh(n_devices=4, axes=("pipe",))
        enc = make_encoder(band_window=8)
        g = make_batch(4)
        params = init_encoder(enc, g)
        ref = enc.apply({"params": params}, g.x, g.nbr_idx, g.nbr_mask,
                        g.node_mask, edge_attr=g.edge_attr,
                        deterministic=True)["embeddings"]
        out = pp_graph_encoder_apply(enc, params, mesh, g.x, g.nbr_idx,
                                     g.nbr_mask, g.node_mask,
                                     edge_attr=g.edge_attr, num_micro=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestPipelineGradients:
    @pytest.mark.slow
    def test_grad_parity_with_sequential(self):
        """AD through the ppermute ring == per-layer grads of the plain loop."""
        mesh = make_mesh(n_devices=4, axes=("pipe",))
        enc = make_encoder()
        g = make_batch(4)
        params = init_encoder(enc, g)
        act = get_activation(enc.activation)
        layer_mod = DynamicGraphLayer(HID, HEADS, dropout=0.0,
                                      dtype=jnp.float32,
                                      param_dtype=jnp.float32)
        # inputs to the layer stack: post-input_proj activations
        import flax.linen as nn
        dense_in = nn.Dense(HID, dtype=jnp.float32, param_dtype=jnp.float32)
        h = dense_in.apply({"params": params["input_proj"]}, g.x)
        dense_e = nn.Dense(HID // HEADS, dtype=jnp.float32,
                           param_dtype=jnp.float32)
        e = dense_e.apply({"params": params["edge_proj"]}, g.edge_attr)
        masked_nbr = g.nbr_mask & g.node_mask[..., None]
        stacked = stack_layer_params(params, LAYERS)

        fn = make_pp_layers_fn(mesh, layer_mod, act, LAYERS, num_micro=2,
                               has_edges=True)

        def loss_pp(sp):
            return jnp.sum(fn(sp, h, g.nbr_idx, masked_nbr, e) ** 2)

        def loss_seq(sp):
            hh = h
            for i in range(LAYERS):
                p = jax.tree_util.tree_map(lambda x, i=i: x[i], sp)
                hh = act(layer_mod.apply({"params": p}, hh, g.nbr_idx,
                                         masked_nbr, e, True))
            return jnp.sum(hh ** 2)

        g_pp = jax.grad(loss_pp)(stacked)
        g_seq = jax.grad(loss_seq)(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                        jax.tree_util.tree_leaves(g_seq)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestValidation:
    def test_indivisible_layers_raise(self):
        mesh = make_mesh(n_devices=4, axes=("pipe",))
        layer_mod = DynamicGraphLayer(HID, HEADS)
        with pytest.raises(ValueError, match="divisible"):
            make_pp_layers_fn(mesh, layer_mod, jax.nn.gelu, num_layers=3,
                              num_micro=2)

    def test_bad_micro_raises(self):
        mesh = make_mesh(n_devices=4, axes=("pipe",))
        layer_mod = DynamicGraphLayer(HID, HEADS)
        with pytest.raises(ValueError, match="num_micro"):
            make_pp_layers_fn(mesh, layer_mod, jax.nn.gelu, num_layers=4,
                              num_micro=0)

    def test_bubble_fraction(self):
        assert pp_bubble_fraction(1, 4) == 0.0
        assert pp_bubble_fraction(4, 4) == pytest.approx(3 / 7)
        assert pp_bubble_fraction(4, 12) == pytest.approx(3 / 15)
