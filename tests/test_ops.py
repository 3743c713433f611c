"""Unit tests for ops: padded graphs, kNN, diffusion schedules.

Modeled on the reference's shape-level unit suite
(reference tests/test_basic.py:19-121).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgdm_histopath_tpu.ops.diffusion import add_noise, make_schedule
from dgdm_histopath_tpu.ops.graph import (
    batch_graphs, from_edge_index, gather_neighbors, masked_global_mean,
    masked_softmax, pick_bucket, symmetric_norm,
)
from dgdm_histopath_tpu.ops.knn import build_dual_knn, knn_cosine, knn_euclidean

from conftest import make_synthetic_graph


class TestSchedules:
    @pytest.mark.parametrize("kind", ["linear", "cosine", "sigmoid"])
    def test_beta_bounds(self, kind):
        # mirrors reference tests/test_basic.py:22-29 (schedule sanity)
        sched = make_schedule(20, kind)
        betas = np.asarray(sched.betas)
        assert betas.shape == (20,)
        assert np.all(betas > 0.0) and np.all(betas < 1.0)
        assert np.all(np.asarray(sched.alphas_cumprod) > 0.0)
        assert np.all(np.diff(np.asarray(sched.alphas_cumprod)) < 0.0)

    def test_sigmoid_schedule_valid_betas(self):
        # regression test for reference bug SURVEY §8.4
        sched = make_schedule(10, "sigmoid", beta_start=1e-4, beta_end=0.02)
        betas = np.asarray(sched.betas)
        assert betas.min() >= 1e-4 - 1e-9
        assert betas.max() <= 0.02 + 1e-9

    def test_add_noise_returns_true_noise(self):
        sched = make_schedule(10, "cosine")
        x0 = jnp.ones((2, 16, 8))
        t = jnp.array([0, 9])
        x_t, noise = add_noise(sched, x0, t, jax.random.PRNGKey(0))
        assert x_t.shape == x0.shape and noise.shape == x0.shape
        # reconstruct x0 from (x_t, noise): x0 = (x_t - sb*noise)/sa
        sa = sched.sqrt_alphas_cumprod[t][:, None, None]
        sb = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        np.testing.assert_allclose(np.asarray((x_t - sb * noise) / sa), 1.0, atol=1e-4)


class TestKNN:
    def test_knn_euclidean_shapes_and_masking(self):
        pts = jnp.asarray(np.random.RandomState(0).rand(32, 2), jnp.float32)
        mask = jnp.asarray([True] * 20 + [False] * 12)
        idx, dist, valid = knn_euclidean(pts, mask, k=4)
        assert idx.shape == (32, 4)
        # padded rows produce no valid neighbors
        assert not bool(jnp.any(valid[20:]))
        # neighbors of real rows are real nodes
        assert bool(jnp.all(idx[valid] < 20))
        # no self loops
        rows = jnp.broadcast_to(jnp.arange(32)[:, None], (32, 4))
        assert not bool(jnp.any((idx == rows) & valid))

    def test_knn_matches_sklearn(self):
        from sklearn.neighbors import NearestNeighbors
        rs = np.random.RandomState(1)
        pts = rs.rand(50, 2).astype(np.float32)
        mask = jnp.ones((50,), bool)
        idx, dist, valid = knn_euclidean(jnp.asarray(pts), mask, k=5)
        nn = NearestNeighbors(n_neighbors=6).fit(pts)
        d_ref, i_ref = nn.kneighbors(pts)
        # drop self (first column)
        np.testing.assert_allclose(np.sort(np.asarray(dist), axis=1),
                                   np.sort(d_ref[:, 1:], axis=1), atol=1e-5)

    def test_knn_cosine(self):
        rs = np.random.RandomState(2)
        feats = jnp.asarray(rs.randn(24, 16), jnp.float32)
        mask = jnp.ones((24,), bool)
        idx, sim, valid = knn_cosine(feats, mask, k=3)
        assert bool(jnp.all(sim[valid] <= 1.0 + 1e-5))
        assert bool(jnp.all(valid))

    def test_build_dual_knn(self):
        rs = np.random.RandomState(3)
        pos = jnp.asarray(rs.rand(40, 2), jnp.float32)
        feats = jnp.asarray(rs.randn(40, 32), jnp.float32)
        mask = jnp.asarray([True] * 30 + [False] * 10)
        g = build_dual_knn(pos, feats, mask, k_spatial=8, k_morph=16)
        assert g["nbr_idx"].shape == (40, 24)
        assert g["edge_attr"].shape == (40, 24, 3)
        assert g["edge_type"].shape == (40, 24)
        assert not bool(jnp.any(g["nbr_mask"][30:]))


class TestPaddedGraph:
    def test_gather_neighbors_batched(self):
        x = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
        idx = jnp.zeros((2, 4, 2), jnp.int32).at[:, :, 1].set(1)
        g = gather_neighbors(x, idx)
        assert g.shape == (2, 4, 2, 3)
        np.testing.assert_array_equal(np.asarray(g[0, 0, 0]), np.asarray(x[0, 0]))
        np.testing.assert_array_equal(np.asarray(g[1, 3, 1]), np.asarray(x[1, 1]))

    def test_symmetric_norm_masked(self):
        idx = jnp.asarray([[1, 2], [0, 0], [0, 0]], jnp.int32)
        mask = jnp.asarray([[True, True], [True, False], [False, False]])
        norm, self_norm = symmetric_norm(idx, mask)
        assert norm.shape == (3, 2)
        assert float(norm[2].sum()) == 0.0
        assert float(self_norm[0]) > 0.0

    def test_masked_softmax_fully_masked_rows(self):
        logits = jnp.zeros((2, 3))
        mask = jnp.asarray([[True, True, False], [False, False, False]])
        w = masked_softmax(logits, mask)
        np.testing.assert_allclose(np.asarray(w[0]), [0.5, 0.5, 0.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(w[1]), 0.0, atol=1e-6)

    def test_from_edge_index_roundtrip(self):
        x = np.random.RandomState(0).randn(5, 4).astype(np.float32)
        edge_index = np.array([[1, 2, 3, 0], [0, 0, 1, 2]])
        g = from_edge_index(x, edge_index, max_neighbors=3, bucket=8)
        assert g.num_nodes == 8
        assert int(g.n_real_nodes) == 5
        # node 0 has incoming from 1 and 2
        nbrs = set(np.asarray(g.nbr_idx[0])[np.asarray(g.nbr_mask[0])])
        assert nbrs == {1, 2}

    def test_pick_bucket(self):
        assert pick_bucket(100, [128, 256]) == 128
        assert pick_bucket(128, [128, 256]) == 128
        assert pick_bucket(200, [128, 256]) == 256
        assert pick_bucket(500, [128, 256]) == 256  # caller subsamples

    def test_batch_graphs(self):
        gs = [make_synthetic_graph(seed=i, n_nodes=32, n_real=20, feat_dim=16)
              for i in range(3)]
        b = batch_graphs(gs)
        assert b.x.shape == (3, 32, 16)
        assert b.node_mask.shape == (3, 32)
        pooled = masked_global_mean(b.x, b.node_mask)
        assert pooled.shape == (3, 16)


class TestBandedOps:
    """Banded (Morton-window) message-passing helpers: exact equivalence to
    the dense formulation on the band-pruned graph."""

    def _sorted_graph(self, seed=0, n=64, real=56, w=16):
        from dgdm_histopath_tpu.parallel.halo import spatial_sort
        g = spatial_sort(make_synthetic_graph(seed=seed, n_nodes=n,
                                              n_real=real, feat_dim=8))
        return g, w

    def test_relative_indices_roundtrip(self):
        from dgdm_histopath_tpu.ops.graph import banded_relative_neighbors
        g, w = self._sorted_graph()
        rel, ok = banded_relative_neighbors(g.nbr_idx, g.nbr_mask, w)
        # every in-band slot reconstructs its absolute index
        base = (np.arange(g.num_nodes) // w - 1) * w
        back = np.asarray(rel) + base[:, None]
        okn = np.asarray(ok)
        np.testing.assert_array_equal(back[okn], np.asarray(g.nbr_idx)[okn])
        # in_band is a subset of nbr_mask and rel stays in [0, 3w)
        assert not np.any(okn & ~np.asarray(g.nbr_mask))
        assert np.asarray(rel).min() >= 0 and np.asarray(rel).max() < 3 * w

    def test_banded_gather_matches_take(self):
        from dgdm_histopath_tpu.ops.graph import (
            banded_gather_neighbors, banded_relative_neighbors)
        g, w = self._sorted_graph(seed=1)
        x = jnp.asarray(np.random.RandomState(0).randn(
            g.num_nodes, 8).astype(np.float32))
        rel, ok = banded_relative_neighbors(g.nbr_idx, g.nbr_mask, w)
        got = np.asarray(banded_gather_neighbors(x, rel, w))
        want = np.asarray(gather_neighbors(x, g.nbr_idx, impl="take"))
        okn = np.asarray(ok)
        np.testing.assert_allclose(got[okn], want[okn], atol=1e-6)

    def test_banded_adjacency_agg_matches_dense(self):
        from dgdm_histopath_tpu.ops.graph import (
            banded_conv_agg, banded_relative_neighbors,
            banded_weighted_adjacency, weighted_adjacency)
        g, w = self._sorted_graph(seed=2)
        n = g.num_nodes
        rs = np.random.RandomState(1)
        h = jnp.asarray(rs.randn(n, 8).astype(np.float32))
        rel, ok = banded_relative_neighbors(g.nbr_idx, g.nbr_mask, w)
        wt = jnp.asarray(rs.rand(n, g.max_neighbors).astype(np.float32))
        wt = wt * ok.astype(jnp.float32)      # band-pruned weights
        dense = weighted_adjacency(g.nbr_idx, wt, n, jnp.float32)
        want = np.asarray(jnp.einsum("nm,mf->nf", dense, h))
        band = banded_weighted_adjacency(rel, wt, w, jnp.float32)
        got = np.asarray(banded_conv_agg(band, h, w))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_band_eligibility(self):
        from dgdm_histopath_tpu.ops.graph import band_eligible
        assert band_eligible(64, 16)
        assert not band_eligible(64, 24)   # not divisible
        assert not band_eligible(64, 32)   # < 3 blocks
        assert not band_eligible(64, None)
