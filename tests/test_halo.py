"""Halo-exchange node sharding: Morton sort, exchange plan, shard_map gather.

Covers `parallel/halo.py` — the locality-aware SP path (no reference
analogue; SURVEY §5.7 documents the reference's node-cap workaround).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.ops.graph import (
    PaddedGraph, batch_graphs, gather_neighbors, masked_neighbor_sum,
)
from dgdm_histopath_tpu.parallel.halo import (
    build_halo_plan, halo_fraction, halo_gather, permute_graph,
    spatial_permutation, spatial_sort,
)
from dgdm_histopath_tpu.parallel.mesh import make_mesh

from conftest import make_synthetic_graph


def sorted_batch(b=4, n_nodes=64, n_real=None, feat_dim=16, seed0=0):
    gs = []
    for i in range(b):
        g = make_synthetic_graph(seed=seed0 + i, n_nodes=n_nodes,
                                 n_real=n_real or n_nodes - 8,
                                 feat_dim=feat_dim)
        gs.append(spatial_sort(g))
    return batch_graphs(gs)


class TestSpatialSort:
    def test_permutation_is_semantic_noop(self):
        """Row-permuted graph gathers = permuted rows of original gathers."""
        g = make_synthetic_graph(seed=3, n_nodes=48, n_real=40, feat_dim=8)
        perm = spatial_permutation(np.asarray(g.pos), np.asarray(g.node_mask))
        gp = permute_graph(g, perm)

        orig = np.asarray(gather_neighbors(g.x, g.nbr_idx, impl="take"))
        msgs = orig * np.asarray(g.nbr_mask)[..., None]
        new = np.asarray(gather_neighbors(gp.x, gp.nbr_idx, impl="take"))
        new_msgs = new * np.asarray(gp.nbr_mask)[..., None]
        # neighbor SET per node is preserved; slot order is permuted, so
        # compare the aggregated (order-invariant) messages
        agg_o = msgs.sum(axis=1)
        agg_n = new_msgs.sum(axis=1)
        np.testing.assert_allclose(agg_n, agg_o[perm], rtol=1e-6)
        # masks/real-node count preserved
        assert np.asarray(gp.node_mask).sum() == np.asarray(g.node_mask).sum()
        assert np.asarray(gp.nbr_mask).sum() == np.asarray(g.nbr_mask).sum()

    def test_padding_sorts_last(self):
        g = make_synthetic_graph(seed=1, n_nodes=32, n_real=20, feat_dim=4)
        gs = spatial_sort(g)
        mask = np.asarray(gs.node_mask)
        assert mask[:20].all() and not mask[20:].any()

    def test_morton_cuts_cross_shard_edges(self):
        """On a kNN graph, Morton order needs a far smaller halo than the
        arrival order (the entire point of the locality sort)."""
        g = make_synthetic_graph(seed=7, n_nodes=256, n_real=250, feat_dim=4,
                                 k=8)
        tp = 4
        # random-ish baseline: shuffle real nodes
        rs = np.random.RandomState(0)
        ids = np.arange(256)
        real = ids[np.asarray(g.node_mask)]
        rs.shuffle(real)
        shuffled = np.concatenate([real, ids[~np.asarray(g.node_mask)]])
        g_shuf = permute_graph(g, shuffled)
        g_sort = spatial_sort(g)
        f_shuf = halo_fraction(g_shuf.nbr_idx, g_shuf.nbr_mask, tp)
        f_sort = halo_fraction(g_sort.nbr_idx, g_sort.nbr_mask, tp)
        assert f_sort < 0.5 * f_shuf, (f_sort, f_shuf)


class TestBuilderIntegration:
    def test_graph_builder_spatial_sort(self):
        """TissueGraphBuilder(spatial_sort=True) yields Morton-ordered nodes
        with identical aggregate structure to the unsorted build."""
        from dgdm_histopath_tpu.preprocessing import (
            SlideProcessor, TissueGraphBuilder, synthetic_slide,
        )
        from dgdm_histopath_tpu.parallel.halo import morton_keys

        backend, _ = synthetic_slide(1024, 1024, num_levels=3, seed=3)
        proc = SlideProcessor(patch_size=32, tissue_threshold=0.3,
                              max_patches=40, stain_normalize=False)
        data = proc.process_slide(backend, slide_id="halo")
        plain = TissueGraphBuilder(feature_extractor="none",
                                   node_buckets=[64]).build_graph(data)
        sorted_g = TissueGraphBuilder(feature_extractor="none",
                                      node_buckets=[64],
                                      spatial_sort=True).build_graph(data)
        # same real-node/edge counts, keys nondecreasing over real nodes
        assert int(sorted_g.n_real_nodes) == int(plain.n_real_nodes)
        assert np.asarray(sorted_g.nbr_mask).sum() == np.asarray(plain.nbr_mask).sum()
        keys = morton_keys(np.asarray(sorted_g.pos),
                           np.asarray(sorted_g.node_mask))
        real = keys[np.asarray(sorted_g.node_mask)]
        assert (np.diff(real) >= 0).all()


class TestHaloPlan:
    def test_plan_shapes_and_bounds(self):
        batch = sorted_batch(b=3, n_nodes=64)
        plan = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4)
        assert plan.send_idx.shape == (3, 4, 4, plan.halo_size)
        assert plan.nbr_idx_local.shape == batch.nbr_idx.shape
        assert plan.n_local == 16
        assert (plan.send_idx >= 0).all() and (plan.send_idx < 16).all()
        assert (plan.nbr_idx_local >= 0).all()
        assert (plan.nbr_idx_local < 16 + 4 * plan.halo_size).all()

    def test_fixed_halo_size_validates(self):
        batch = sorted_batch(b=2, n_nodes=64)
        auto = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4)
        fixed = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4,
                                halo_size=auto.halo_size + 3)
        assert fixed.halo_size == auto.halo_size + 3
        with pytest.raises(ValueError):
            build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4, halo_size=0)

    def test_plan_reconstructs_gather(self):
        """Host-side replay: local+halo coordinates reproduce the global
        gather exactly (mask-correct, per batch element)."""
        batch = sorted_batch(b=2, n_nodes=64, feat_dim=8)
        tp = 4
        plan = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=tp)
        x = np.asarray(batch.x)
        n_loc, h = plan.n_local, plan.halo_size
        want = np.asarray(gather_neighbors(batch.x, batch.nbr_idx, impl="take"))
        for b in range(x.shape[0]):
            for i in range(tp):  # dst shard
                x_l = x[b, i * n_loc:(i + 1) * n_loc]
                halo = np.zeros((tp, h, x.shape[-1]), x.dtype)
                for j in range(tp):  # src shard
                    rows = plan.send_idx[b, j, i]
                    halo[j] = x[b, j * n_loc:(j + 1) * n_loc][rows]
                full = np.concatenate([x_l, halo.reshape(tp * h, -1)], axis=0)
                got = full[plan.nbr_idx_local[b, i * n_loc:(i + 1) * n_loc]]
                w = want[b, i * n_loc:(i + 1) * n_loc]
                m = np.asarray(batch.nbr_mask)[b, i * n_loc:(i + 1) * n_loc]
                np.testing.assert_array_equal(got[m], w[m])


class TestHaloGather:
    @pytest.fixture(scope="class")
    def mesh(self):
        return make_mesh(n_devices=8, axes=("data", "model"), shape=(2, 4))

    def test_matches_dense_gather(self, mesh):
        batch = sorted_batch(b=4, n_nodes=64, feat_dim=16)
        plan = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4)
        dense = np.asarray(gather_neighbors(batch.x, batch.nbr_idx,
                                            impl="take"))
        halo = np.asarray(halo_gather(batch.x, plan, mesh))
        m = np.asarray(batch.nbr_mask)[..., None]
        np.testing.assert_allclose(halo * m, dense * m, rtol=1e-6)

    def test_message_passing_parity(self, mesh):
        """A full masked message aggregation (the GCN hot loop) through the
        halo path equals the dense formulation."""
        batch = sorted_batch(b=4, n_nodes=64, feat_dim=16)
        plan = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4)
        w = np.random.RandomState(0).randn(16, 16).astype(np.float32)

        h_dense = jnp.einsum("bnf,fg->bng", batch.x, w)
        msgs = gather_neighbors(h_dense, batch.nbr_idx, impl="take")
        agg_dense = masked_neighbor_sum(msgs, batch.nbr_mask)

        msgs_halo = halo_gather(h_dense, plan, mesh)
        agg_halo = masked_neighbor_sum(msgs_halo, batch.nbr_mask)
        np.testing.assert_allclose(np.asarray(agg_halo),
                                   np.asarray(agg_dense), rtol=2e-5,
                                   atol=1e-5)

    def test_unbatched_path(self, mesh):
        g = spatial_sort(make_synthetic_graph(seed=5, n_nodes=64,
                                              n_real=56, feat_dim=8))
        plan = build_halo_plan(g.nbr_idx, g.nbr_mask, tp=4)
        dense = np.asarray(gather_neighbors(g.x, g.nbr_idx, impl="take"))
        halo = np.asarray(halo_gather(g.x, plan, mesh, batch_sharded=False))
        m = np.asarray(g.nbr_mask)[..., None]
        np.testing.assert_allclose(halo * m, dense * m, rtol=1e-6)

    def test_sp_graph_conv_parity(self, mesh):
        """The node-sharded GraphConvolution forward (sp_graph_conv) applies
        a trained flax layer's params over the halo plan and matches the
        dense layer exactly (real nodes; nn/graph_layers.py:86-122)."""
        from dgdm_histopath_tpu.nn.graph_layers import GraphConvolution
        from dgdm_histopath_tpu.parallel.halo import sp_graph_conv
        from dgdm_histopath_tpu.parallel.sp import shard_graph_nodes

        batch = sorted_batch(b=4, n_nodes=64, feat_dim=16)
        layer = GraphConvolution(features=24, gather_impl="xla",
                                 dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), batch.x, batch.nbr_idx,
                            batch.nbr_mask, batch.edge_attr)
        dense = layer.apply(params, batch.x, batch.nbr_idx, batch.nbr_mask,
                            batch.edge_attr)

        plan = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4)
        sharded = shard_graph_nodes(batch, mesh)
        sp_out = sp_graph_conv(params["params"], sharded.x, sharded.nbr_idx,
                               sharded.nbr_mask, plan, mesh,
                               edge_attr=sharded.edge_attr)
        m = np.asarray(batch.node_mask)[..., None]
        np.testing.assert_allclose(np.asarray(sp_out) * m,
                                   np.asarray(dense) * m,
                                   rtol=2e-5, atol=2e-5)

    def test_collective_bytes_beat_gspmd(self, mesh):
        """The compiled halo gather moves fewer collective bytes than the
        GSPMD lowering of the same node-sharded gather (the motivating
        claim; ADR-0005 addendum)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = sorted_batch(b=4, n_nodes=256, feat_dim=32)
        plan = build_halo_plan(batch.nbr_idx, batch.nbr_mask, tp=4)

        node_shard = NamedSharding(mesh, P("data", "model", None))
        x = jax.device_put(batch.x, node_shard)
        idx = jax.device_put(batch.nbr_idx, node_shard)

        halo_hlo = (
            jax.jit(lambda a: halo_gather(a, plan, mesh))
            .lower(x).compile().as_text())
        gspmd_hlo = (
            jax.jit(lambda a, i: gather_neighbors(a, i, impl="take"),
                    out_shardings=NamedSharding(mesh,
                                                P("data", "model", None, None)))
            .lower(x, idx).compile().as_text())

        def collective_bytes(hlo):
            total = 0
            for m in re.finditer(
                    r"= ((?:\([^)]*\))|(?:\S+)) (?:all-gather|all-to-all|"
                    r"all-reduce|collective-permute)(?:-start)?\(", hlo):
                for t in re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)):
                    bytes_per = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4,
                                 "f64": 8, "s64": 8, "pred": 1}.get(t.group(1))
                    if bytes_per is None:
                        continue
                    numel = 1
                    for d in t.group(2).split(","):
                        if d:
                            numel *= int(d)
                    total += bytes_per * numel
            return total

        b_halo = collective_bytes(halo_hlo)
        b_gspmd = collective_bytes(gspmd_hlo)
        assert b_halo > 0, "halo path must contain its all_to_all"
        assert b_halo < 0.5 * b_gspmd, (b_halo, b_gspmd)
