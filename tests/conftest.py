"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests run against
``--xla_force_host_platform_device_count=8`` CPU devices, matching the
driver's multichip dry-run environment.

NOTE: this image's sitecustomize registers an ``axon`` TPU backend and
overrides ``jax_platforms`` programmatically, so the env var alone is not
enough — we must call ``jax.config.update`` before any backend touch.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound on CPU; backend opt level 0 cuts cold-compile
# CPU ~28% (measured on test_moe.py: 36.2s -> 25.9s user, all green) at the
# cost of slower generated code — a net win for compile-dominated tests.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

# The suite is dominated by CPU jit compiles (~20-45 s tests are one-compile
# tests). The persistent compilation cache keys on the optimized HLO hash, so
# re-runs and unrelated-code iterations hit the cache instead of recompiling.
_CACHE_DIR = os.environ.get(
    "DGDM_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def make_synthetic_graph(n_nodes=64, n_real=50, feat_dim=768, k=8, seed=0, num_classes=None):
    """Synthetic PaddedGraph mirroring the reference's test pattern
    (reference tests/test_basic.py:127-133: random features + kNN edges)."""
    import jax.numpy as jnp
    from dgdm_histopath_tpu.ops.graph import PaddedGraph
    from dgdm_histopath_tpu.ops.knn import knn_euclidean

    rs = np.random.RandomState(seed)
    x = np.zeros((n_nodes, feat_dim), np.float32)
    x[:n_real] = rs.randn(n_real, feat_dim).astype(np.float32)
    pos = np.zeros((n_nodes, 2), np.float32)
    pos[:n_real] = rs.rand(n_real, 2).astype(np.float32)
    node_mask = np.zeros((n_nodes,), bool)
    node_mask[:n_real] = True

    idx, dist, mask = knn_euclidean(jnp.asarray(pos), jnp.asarray(node_mask), k)
    edge_attr = jnp.stack([dist, jnp.exp(-10.0 * dist), jnp.zeros_like(dist)], axis=-1)
    y = None
    if num_classes is not None:
        y = jnp.asarray(rs.randint(0, num_classes), jnp.int32)
    return PaddedGraph(
        x=jnp.asarray(x), pos=jnp.asarray(pos), nbr_idx=idx, nbr_mask=mask,
        edge_attr=edge_attr, node_mask=jnp.asarray(node_mask), y=y,
    )


@pytest.fixture
def synthetic_graph():
    return make_synthetic_graph()
