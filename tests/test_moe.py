"""MoE expert FFN (nn/moe.py) + expert-parallel layout (parallel/ep.py):
routing correctness, mask/padding invariance, capacity semantics, EP-sharded
numerics parity, and DGDMModel/trainer integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.nn.moe import MoEFFN
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.parallel.ep import (
    EXPERT_AXIS, count_expert_sharded, ep_param_specs, ep_size,
)
from dgdm_histopath_tpu.parallel.mesh import make_mesh
from dgdm_histopath_tpu.parallel.tp import shard_tree_like

from conftest import make_synthetic_graph

F, H, E = 16, 32, 4


def make_moe(**kw):
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("param_dtype", jnp.float32)
    return MoEFFN(features=F, hidden_dim=H, num_experts=E, **kw)


def init_inputs(b=2, n=24, n_real=20, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, n, F).astype(np.float32))
    mask = np.zeros((b, n), bool)
    mask[:, :n_real] = True
    return x, jnp.asarray(mask)


class TestMoEFFN:
    def test_shapes_and_finite(self):
        moe = make_moe()
        x, mask = init_inputs()
        params = moe.init(jax.random.PRNGKey(0), x, mask)
        out, aux = moe.apply(params, x, mask)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        assert np.isfinite(float(aux))

    def test_padding_invariance(self):
        """Padded-node features must not affect real outputs, capacity, or
        the aux loss (CLAUDE.md mask-correctness rule)."""
        moe = make_moe()
        x, mask = init_inputs()
        params = moe.init(jax.random.PRNGKey(0), x, mask)
        out1, aux1 = moe.apply(params, x, mask)
        # scribble over the padded region
        x2 = jnp.where(mask[..., None], x, 1e3)
        out2, aux2 = moe.apply(params, x2, mask)
        m = np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(out1) * m, np.asarray(out2) * m,
                                   rtol=1e-6)
        assert float(aux1) == pytest.approx(float(aux2), rel=1e-6)
        # padded rows get exact zeros
        assert np.all(np.asarray(out1)[~np.asarray(mask)] == 0.0)

    def test_every_real_token_routed_with_ample_capacity(self):
        """capacity_factor covering all tokens ⇒ per-token combine weights
        sum to 1 (no drops) for top-1 and top-2."""
        for k in (1, 2):
            moe = make_moe(top_k=k, capacity_factor=float(E))
            x, mask = init_inputs(seed=k)
            params = moe.init(jax.random.PRNGKey(k), x, mask)
            # reach into the dispatch by recomputing combine weight sums:
            # combine columns sum to the normalized gate total (1.0) per
            # kept token; with ample capacity every real token is kept.
            out, _ = moe.apply(params, x, mask)
            # a routed token receives a non-trivial expert output
            norms = np.linalg.norm(np.asarray(out), axis=-1)
            assert (norms[np.asarray(mask)] > 0).all()

    def test_capacity_drop_is_graceful(self):
        """Tiny capacity drops tokens (zero output) but never NaNs."""
        moe = make_moe(capacity_factor=0.05)
        x, mask = init_inputs()
        params = moe.init(jax.random.PRNGKey(0), x, mask)
        out, aux = moe.apply(params, x, mask)
        assert np.isfinite(np.asarray(out)).all()
        assert np.isfinite(float(aux))
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        n_served = int((norms[np.asarray(mask)] > 0).sum())
        # capacity 0.05·48/4 ⇒ at most ceil = few tokens per expert served
        assert 0 < n_served < int(np.asarray(mask).sum())

    def test_top2_distinct_experts(self):
        """With top_k=2 and ample capacity a token's two slots hit two
        different experts — output differs from doubling one expert."""
        moe = make_moe(top_k=2, capacity_factor=float(E))
        x, mask = init_inputs()
        params = moe.init(jax.random.PRNGKey(3), x, mask)
        out2, _ = moe.apply(params, x, mask)
        moe1 = make_moe(top_k=1, capacity_factor=float(E))
        out1, _ = moe1.apply(params, x, mask)
        assert not np.allclose(np.asarray(out2), np.asarray(out1))

    def test_grouping_invariant_with_ample_capacity(self):
        """Routing is per-token and capacity per group — with capacity
        ample the group partition must not change the output (GShard
        grouping is a memory layout, not a semantic change)."""
        x, mask = init_inputs(b=4)  # t = 96 tokens
        moe_one = make_moe(group_size=96, capacity_factor=float(E))
        params = moe_one.init(jax.random.PRNGKey(0), x, mask)
        out1, aux1 = moe_one.apply(params, x, mask)
        moe_grp = make_moe(group_size=24, capacity_factor=float(E))
        out4, aux4 = moe_grp.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(out4), np.asarray(out1),
                                   rtol=1e-5, atol=1e-5)
        assert float(aux4) == pytest.approx(float(aux1), rel=0.2)
        # non-dividing group size falls back to the token-axis length
        moe_odd = make_moe(group_size=13, capacity_factor=float(E))
        out_odd, _ = moe_odd.apply(params, x, mask)
        assert np.isfinite(np.asarray(out_odd)).all()

    def test_aux_loss_near_one_when_balanced(self):
        """Random init routes ~uniformly ⇒ Switch aux ≈ 1 (within slack)."""
        moe = make_moe()
        x, mask = init_inputs(b=8, n=64, n_real=64, seed=7)
        params = moe.init(jax.random.PRNGKey(11), x, mask)
        _, aux = moe.apply(params, x, mask)
        assert 0.9 < float(aux) < 1.6


class TestExpertParallel:
    def test_param_specs_shard_expert_leaves(self):
        mesh = make_mesh(axes=("data", EXPERT_AXIS), shape=(2, 4))
        assert ep_size(mesh) == 4
        moe = make_moe()
        x, mask = init_inputs()
        params = moe.init(jax.random.PRNGKey(0), x, mask)["params"]
        specs = ep_param_specs(params, mesh)
        assert count_expert_sharded(specs) == 4  # w_in b_in w_out b_out
        placed = shard_tree_like(params, specs, mesh)
        spec = placed["w_in"].sharding.spec
        assert spec and spec[0] == EXPERT_AXIS

    def test_ep_sharded_numerics_match_replicated(self):
        """jit over EP-sharded params == single-device reference."""
        mesh = make_mesh(axes=("data", EXPERT_AXIS), shape=(2, 4))
        moe = make_moe()
        x, mask = init_inputs(b=4)
        variables = moe.init(jax.random.PRNGKey(0), x, mask)
        ref_out, ref_aux = moe.apply(variables, x, mask)

        params = variables["params"]
        specs = ep_param_specs(params, mesh)
        placed = {"params": shard_tree_like(params, specs, mesh)}

        @jax.jit
        def fwd(v, x, mask):
            return moe.apply(v, x, mask)

        out, aux = fwd(placed, x, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=2e-5, atol=2e-5)
        assert float(aux) == pytest.approx(float(ref_aux), rel=1e-5)

    def test_ep1_mesh_replicates(self):
        mesh = make_mesh(axes=("data",))
        moe = make_moe()
        x, mask = init_inputs()
        params = moe.init(jax.random.PRNGKey(0), x, mask)["params"]
        specs = ep_param_specs(params, mesh)
        assert count_expert_sharded(specs) == 0


class TestModelIntegration:
    def _model(self, **kw):
        return DGDMModel(node_features=16, hidden_dims=(32, 16),
                         num_diffusion_steps=3, attention_heads=4,
                         graph_layers=1, num_classes=2,
                         use_hierarchical=False, use_spatial_attention=False,
                         compute_dtype="float32", dropout=0.0,
                         moe_experts=E, **kw)

    @pytest.mark.slow
    def test_forward_has_aux(self):
        model = self._model()
        g = batch_graphs([make_synthetic_graph(seed=i, n_nodes=24, n_real=20,
                                               feat_dim=16) for i in range(2)])
        rngs = {"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1),
                "masking": jax.random.PRNGKey(2),
                "dropout": jax.random.PRNGKey(3)}
        variables = model.init(rngs, g, mode="pretrain", deterministic=True)
        out = model.apply(variables, g, mode="pretrain", deterministic=True,
                          rngs={"diffusion": jax.random.PRNGKey(5)})
        assert "moe_aux_loss" in out
        assert np.isfinite(float(out["moe_aux_loss"]))
        assert np.isfinite(np.asarray(out["classification_logits"])).all()

    def test_invalid_topk_raises(self):
        from dgdm_histopath_tpu.utils.exceptions import ConfigurationError
        model = self._model(moe_top_k=3)
        g = batch_graphs([make_synthetic_graph(seed=0, n_nodes=24, n_real=20,
                                               feat_dim=16)])
        with pytest.raises(ConfigurationError):
            model.init({"params": jax.random.PRNGKey(0)}, g,
                       mode="inference", deterministic=True)

    @pytest.mark.slow
    def test_train_step_with_moe(self):
        from dgdm_histopath_tpu.training import DGDMTrainer, TrainerConfig
        model = self._model()
        gs = [make_synthetic_graph(seed=i, n_nodes=24, n_real=20, feat_dim=16)
              for i in range(4)]
        gs = [g.replace(y=jnp.asarray(i % 2, jnp.int32))
              for i, g in enumerate(gs)]
        batch = batch_graphs(gs)
        trainer = DGDMTrainer(model, TrainerConfig(
            learning_rate=1e-3, warmup_steps=1, pretrain_epochs=1,
            steps_per_epoch=4, scheduler_type="none"))
        trainer.init_state(jax.random.PRNGKey(0), batch)
        m_pre = trainer.training_step(batch, epoch=0)
        assert np.isfinite(m_pre["loss"])
        assert "moe_aux_loss" in m_pre
        m_fin = trainer.training_step(batch, epoch=1)
        assert np.isfinite(m_fin["loss"])
        assert "moe_aux_loss" in m_fin
