"""Cross-formulation semantic parity: padded-graph layers vs an independent
numpy scatter-COO implementation of the reference's message passing.

The reference computes GCN propagation as PyG scatter-adds over a COO
``edge_index`` with self-loops and symmetric degree normalization
(``/root/reference/dgdm_histopath/core/graph_layers.py:68-110``). Our
layers run on the padded neighbor-list layout instead — these tests pin
the two formulations to each other end to end (COO ingestion via
``from_edge_index`` + ``GraphConvolution``), so a regression in either the
converter's slot layout or the layer's masked math shows up as a semantic
diff against reference-style scatter, not just a shape error.

The numpy model below is written from the MATH (message = norm * (W x_j +
W_e e_ij), self-loop message = (1/deg_i) * W x_i, aggr = add), not from
the reference's code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.nn.graph_layers import GraphConvolution
from dgdm_histopath_tpu.ops.graph import from_edge_index


def coo_scatter_gcn(x, edge_index, edge_attr, w, we, b):
    """Reference-semantics GCN forward in pure numpy (scatter over COO).

    ``edge_index`` is [2, E] rows (src j, dst i); messages flow j -> i.
    deg_i counts incoming edges plus the self-loop; norm(j->i) =
    1/sqrt(deg_j * deg_i); the self-loop message carries no edge term.
    """
    n = x.shape[0]
    src, dst = edge_index
    deg = np.bincount(dst, minlength=n).astype(np.float64) + 1.0
    inv_sqrt = 1.0 / np.sqrt(deg)
    h = x.astype(np.float64) @ w.astype(np.float64)
    out = h * (inv_sqrt * inv_sqrt)[:, None]          # self-loop term
    msg = h[src] * (inv_sqrt[src] * inv_sqrt[dst])[:, None]
    if edge_attr is not None and we is not None:
        e = edge_attr.astype(np.float64) @ we.astype(np.float64)
        msg = msg + e * (inv_sqrt[src] * inv_sqrt[dst])[:, None]
    np.add.at(out, dst, msg)
    return out + b.astype(np.float64)


def knn_like_coo(n, k, e_dim, seed):
    """A COO graph where every node has exactly k distinct in-edges (so the
    padded conversion never truncates) plus random edge features."""
    rs = np.random.RandomState(seed)
    src_rows = np.stack([rs.permutation(n)[:k] for _ in range(n)])
    dst = np.repeat(np.arange(n), k)
    src = src_rows.reshape(-1)
    edge_index = np.stack([src, dst]).astype(np.int64)
    edge_attr = rs.randn(n * k, e_dim).astype(np.float32)
    x = rs.randn(n, 12).astype(np.float32)
    return x, edge_index, edge_attr


class TestGraphConvCOOSemantics:
    @pytest.mark.parametrize("use_edges", [True, False])
    def test_matches_scatter_formulation(self, use_edges):
        n, k, e_dim, f_out = 24, 5, 3, 16
        x, edge_index, edge_attr = knn_like_coo(n, k, e_dim, seed=0)
        g = from_edge_index(x, edge_index,
                            edge_attr=edge_attr if use_edges else None,
                            max_neighbors=k, bucket=n)

        layer = GraphConvolution(features=f_out,
                                 use_edge_features=use_edges,
                                 dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(1), g.x, g.nbr_idx,
                            g.nbr_mask, g.edge_attr if use_edges else None)
        ours = layer.apply(params, g.x, g.nbr_idx, g.nbr_mask,
                           g.edge_attr if use_edges else None)

        p = params["params"]
        w = np.asarray(p["lin"]["kernel"])
        b = np.asarray(p["bias"])
        we = np.asarray(p["edge_lin"]["kernel"]) if use_edges else None
        # from_edge_index re-orders each node's incoming edges by descending
        # last-attr column — recover the slot-ordered edge_attr the layer
        # saw so the numpy model consumes identical per-edge features
        if use_edges:
            ea_slots = np.asarray(g.edge_attr)        # [N, K, E]
            src_slots = np.asarray(g.nbr_idx)         # [N, K]
            dst2 = np.repeat(np.arange(n), k)
            src2 = src_slots.reshape(-1)
            ei = np.stack([src2, dst2])
            golden = coo_scatter_gcn(x, ei, ea_slots.reshape(n * k, e_dim),
                                     w, we, b)
        else:
            golden = coo_scatter_gcn(x, edge_index, None, w, None, b)
        np.testing.assert_allclose(np.asarray(ours, np.float64), golden,
                                   atol=2e-5, rtol=2e-5)

    def test_truncation_keeps_strongest_incoming(self):
        """When a node has more in-edges than max_neighbors, the converter
        must keep the highest-weight ones (last attr column) — semantics
        the reference gets implicitly by never truncating."""
        n = 6
        # node 0 receives edges from 1..5 with weights 1..5
        src = np.arange(1, n)
        dst = np.zeros(n - 1, np.int64)
        ei = np.stack([src, dst])
        ea = np.stack([np.zeros(n - 1), np.arange(1.0, n)], 1).astype(np.float32)
        x = np.eye(n, 4, dtype=np.float32)
        g = from_edge_index(x, ei, edge_attr=ea, max_neighbors=3, bucket=n)
        kept = set(np.asarray(g.nbr_idx)[0][np.asarray(g.nbr_mask)[0]])
        assert kept == {3, 4, 5}

    def test_isolated_nodes_self_only(self):
        """Zero-degree nodes reduce to the pure self-loop term (deg=1),
        matching the reference's deg_inv_sqrt[inf -> 0] handling plus
        self-loops."""
        n, f_out = 5, 8
        x = np.random.RandomState(3).randn(n, 7).astype(np.float32)
        g = from_edge_index(x, np.zeros((2, 0), np.int64),
                            max_neighbors=4, bucket=n)
        layer = GraphConvolution(features=f_out, use_edge_features=False,
                                 dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), g.x, g.nbr_idx, g.nbr_mask)
        out = layer.apply(params, g.x, g.nbr_idx, g.nbr_mask)
        p = params["params"]
        golden = (x @ np.asarray(p["lin"]["kernel"])
                  + np.asarray(p["bias"]))
        np.testing.assert_allclose(np.asarray(out), golden, atol=2e-5,
                                   rtol=2e-5)
