"""Tests for federated learning, clinical, enterprise, and deployment layers."""

import json
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_histopath_tpu.clinical import (
    ClinicalCohort, ClinicalDataManager, ClinicalPerformanceAnalyzer,
    DICOMHandler, EHRConnector, FDASubmissionManager,
)
from dgdm_histopath_tpu.deployment import (
    AutoScaler, EdgeConfig, EdgeDeploymentManager, EdgeInferenceEngine,
    EdgeModelOptimizer, K8sConfig, KubernetesOrchestrator,
    ProductionHealthChecker, ProductionOrchestrator, dequantize_params,
    quantize_params_int8,
)
from dgdm_histopath_tpu.enterprise import (
    MultiTenantManager, TenantQuota,
)
from dgdm_histopath_tpu.models import DGDMModel
from dgdm_histopath_tpu.ops.graph import batch_graphs
from dgdm_histopath_tpu.quantum.federated_learning import (
    DPConfig, FederatedClient, FederatedServer, FederatedStrategy,
    tree_global_norm, tree_sub,
)
from dgdm_histopath_tpu.utils.exceptions import ResourceError, SecurityError

from conftest import make_synthetic_graph


def tiny_model_setup(num_classes=2, feat_dim=8):
    model = DGDMModel(node_features=feat_dim, hidden_dims=(16, 8),
                      num_diffusion_steps=2, attention_heads=4, graph_layers=1,
                      num_classes=num_classes, use_hierarchical=False,
                      use_spatial_attention=False, compute_dtype="float32")
    g = batch_graphs([make_synthetic_graph(seed=i, n_nodes=16, n_real=12,
                                           feat_dim=feat_dim) for i in range(2)])
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "masking": jax.random.PRNGKey(2)}
    params = model.init(rngs, g, mode="pretrain", deterministic=True)
    return model, params, g


class TestFederated:
    def _params(self):
        return {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    def test_fedavg_weighted_average(self):
        server = FederatedServer(self._params(), strategy="fedavg")
        # client A pushes +1 everywhere (100 samples), B pushes -1 (50 samples)
        server.register_client(FederatedClient(
            "a", lambda p, r: jax.tree_util.tree_map(lambda x: x + 1.0, p), 100))
        server.register_client(FederatedClient(
            "b", lambda p, r: jax.tree_util.tree_map(lambda x: x - 1.0, p), 50))
        server.run_round(0)
        expected_delta = (100 * 1.0 + 50 * -1.0) / 150
        np.testing.assert_allclose(np.asarray(server.global_params["w"]),
                                   1.0 + expected_delta, atol=1e-6)

    def test_dp_clipping(self):
        dp = DPConfig(clip_norm=0.5, noise_multiplier=0.0)
        client = FederatedClient(
            "a", lambda p, r: jax.tree_util.tree_map(lambda x: x + 10.0, p),
            10, dp=dp)
        update = client.compute_update(self._params(), 0, jax.random.PRNGKey(0))
        assert float(tree_global_norm(update)) <= 0.5 + 1e-5

    def test_scaffold_and_fedprox_run(self):
        for strategy in ("scaffold", "fedprox", "quantum_fed"):
            server = FederatedServer(self._params(), strategy=strategy)
            for cid in ("a", "b", "c"):
                server.register_client(FederatedClient(
                    cid, lambda p, r: jax.tree_util.tree_map(
                        lambda x: x + 0.1, p), 10))
            hist = server.run(3)
            assert len(hist) == 3
            assert np.isfinite(hist[-1]["update_norm"])

    def test_client_selection(self):
        server = FederatedServer(self._params(), clients_per_round=2)
        for cid in "abcde":
            server.register_client(FederatedClient(
                cid, lambda p, r: p, 10))
        assert len(server.select_clients(0)) == 2


class TestClinical:
    def test_cohort_phi_redaction(self):
        mgr = ClinicalDataManager()
        cohort = ClinicalCohort("c1", site="site-A",
                                metadata={"note": "patient SSN 123-45-6789"})
        mgr.register_cohort(cohort)
        assert "123-45-6789" not in mgr.cohorts["c1"].metadata["note"]
        assert any(e["event"] == "phi_redacted" for e in mgr.audit)

    def test_performance_analysis(self):
        rs = np.random.RandomState(0)
        labels = rs.randint(0, 2, 200)
        # strong classifier
        probs = np.clip(labels * 0.8 + rs.rand(200) * 0.2, 0, 1)
        preds = (probs > 0.5).astype(int)
        mgr = ClinicalDataManager()
        mgr.register_cohort(ClinicalCohort("c1"))
        mgr.add_results("c1", labels, preds, np.stack([1 - probs, probs], 1))
        analyzer = ClinicalPerformanceAnalyzer()
        report = analyzer.analyze_all(mgr)
        c1 = report["cohorts"]["c1"]
        assert c1["sensitivity"] > 0.9
        assert "auc_ci" in c1
        assert isinstance(c1["meets_criteria"], bool)

    def test_fda_dossier(self, tmp_path):
        mgr = FDASubmissionManager()
        dossier = mgr.build_dossier({"auc": 0.95})
        assert "RESEARCH USE ONLY" in dossier["submission_type"]
        p = mgr.export(dossier, tmp_path / "dossier.json")
        assert json.loads(p.read_text())["performance_summary"]["auc"] == 0.95

    def test_dicom_anonymization(self):
        handler = DICOMHandler()
        meta = handler.extract_metadata({
            "SOPInstanceUID": "1.2.3", "PatientName": "DOE^JANE",
            "PatientID": "MRN 1234567", "Modality": "SM",
            "StudyDescription": "contact jane@example.com"})
        anon = handler.anonymize(meta)
        assert anon.attributes["PatientName"] != "DOE^JANE"
        assert "jane@example.com" not in anon.attributes["StudyDescription"]
        assert handler.verify_anonymized(anon)
        # pseudonyms are stable
        anon2 = handler.anonymize(meta)
        assert anon2.attributes["PatientName"] == anon.attributes["PatientName"]

    def test_ehr_observation(self):
        ehr = EHRConnector()
        obs = ehr.build_observation(
            {"predicted_class": 1, "confidence": 0.87,
             "uncertainty": {"entropy": 0.3}},
            subject_ref="Patient/x", class_names=["benign", "tumor"])
        assert obs["valueCodeableConcept"]["text"] == "tumor"
        resp = ehr.send_observation(obs)
        assert resp["status"] == "recorded"
        assert len(ehr.outbox) == 1


class TestEnterprise:
    def test_tenant_lifecycle_and_quota(self, tmp_path):
        mgr = MultiTenantManager(tmp_path)
        t = mgr.create_tenant("hospital-a",
                              TenantQuota(max_slides_per_day=2,
                                          max_concurrent_jobs=1))
        mgr.resources.charge_slide(t, 2)
        with pytest.raises(ResourceError):
            mgr.resources.charge_slide(t)

    def test_job_slots(self, tmp_path):
        mgr = MultiTenantManager(tmp_path)
        t = mgr.create_tenant("a", TenantQuota(max_concurrent_jobs=1))
        with mgr.resources.acquire_job_slot(t):
            with pytest.raises(ResourceError):
                mgr.resources.acquire_job_slot(t)
        # released after context
        with mgr.resources.acquire_job_slot(t):
            pass

    def test_isolation(self, tmp_path):
        mgr = MultiTenantManager(tmp_path)
        t = mgr.create_tenant("a")
        p = mgr.isolation.resolve(t.tenant_id, "graphs/x.npz")
        assert str(p).startswith(str(tmp_path))
        with pytest.raises(SecurityError):
            mgr.isolation.resolve(t.tenant_id, "../other/secret")

    def test_auth_and_run_job(self, tmp_path):
        mgr = MultiTenantManager(tmp_path)
        t = mgr.create_tenant("a")
        key = mgr.auth.issue_key(t.tenant_id, role="analyst")
        assert mgr.run_job(key, lambda: 42) == 42
        viewer_key = mgr.auth.issue_key(t.tenant_id, role="viewer")
        with pytest.raises(SecurityError):
            mgr.run_job(viewer_key, lambda: 1)
        with pytest.raises(SecurityError):
            mgr.auth.authenticate("bogus")


class TestDeployment:
    @pytest.mark.slow
    def test_int8_quantization_roundtrip(self):
        model, params, g = tiny_model_setup()
        q = quantize_params_int8(params)
        restored = dequantize_params(q)
        out1 = model.apply(params, g, mode="inference")["classification_logits"]
        out2 = model.apply(restored, g, mode="inference")["classification_logits"]
        # int8 quantization keeps predictions close
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=0.2)

    def test_edge_bundle_roundtrip(self, tmp_path):
        model, params, g = tiny_model_setup()
        cfg = dict(node_features=8, hidden_dims=(16, 8), num_diffusion_steps=2,
                   attention_heads=4, graph_layers=1, num_classes=2,
                   use_hierarchical=False, use_spatial_attention=False,
                   compute_dtype="float32")
        mgr = EdgeDeploymentManager(tmp_path)
        bundle = mgr.package(model, params, cfg, EdgeConfig(quantization="int8"))
        assert bundle.exists()
        assert (tmp_path / "manifest.json").exists()
        engine = EdgeDeploymentManager.load(bundle)
        result = engine.predict(g)
        assert result["probabilities"].shape == (2, 2)
        assert engine.mean_latency_s > 0

    def test_edge_bundle_roundtrip_moe(self, tmp_path):
        """Cross-feature: an MoE model (grouped expert dispatch, nn/moe.py)
        packages, loads, and predicts through the edge path — the expert
        einsums are plain XLA ops, so quantize/cast must round-trip them."""
        model = DGDMModel(node_features=8, hidden_dims=(16, 8),
                          num_diffusion_steps=2, attention_heads=4,
                          graph_layers=1, num_classes=2,
                          use_hierarchical=False, use_spatial_attention=False,
                          compute_dtype="float32", moe_experts=2)
        g = batch_graphs([make_synthetic_graph(seed=i, n_nodes=16, n_real=12,
                                               feat_dim=8) for i in range(2)])
        rngs = {"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1),
                "masking": jax.random.PRNGKey(2)}
        params = model.init(rngs, g, mode="pretrain", deterministic=True)
        cfg = dict(node_features=8, hidden_dims=(16, 8),
                   num_diffusion_steps=2, attention_heads=4, graph_layers=1,
                   num_classes=2, use_hierarchical=False,
                   use_spatial_attention=False, compute_dtype="float32",
                   moe_experts=2)
        mgr = EdgeDeploymentManager(tmp_path)
        bundle = mgr.package(model, params, cfg,
                             EdgeConfig(quantization="bfloat16"))
        engine = EdgeDeploymentManager.load(bundle)
        result = engine.predict(g)
        assert result["probabilities"].shape == (2, 2)
        assert np.isfinite(result["probabilities"]).all()

    def test_k8s_manifests(self, tmp_path):
        orch = KubernetesOrchestrator(K8sConfig(replicas=3))
        files = orch.write_manifests(tmp_path)
        assert len(files) == 3
        import yaml
        dep = yaml.safe_load((tmp_path / "deployment.yaml").read_text())
        assert dep["spec"]["replicas"] == 3
        assert dep["spec"]["template"]["spec"]["securityContext"]["runAsNonRoot"]
        hpa = yaml.safe_load((tmp_path / "hpa.yaml").read_text())
        assert hpa["spec"]["maxReplicas"] == 8

    def test_autoscaler_hysteresis(self):
        sc = AutoScaler(min_replicas=1, max_replicas=8, cooldown_s=10)
        assert sc.decide(0.9, now=0.0) == 2      # scale up
        assert sc.decide(0.9, now=5.0) == 2      # cooldown holds
        assert sc.decide(0.9, now=11.0) == 4     # scale up again
        assert sc.decide(0.1, now=30.0) == 3     # scale down by one

    def test_production_orchestrator_rollback(self):
        orch = ProductionOrchestrator()
        events = []
        orch.add_stage("build", lambda: events.append("build") or True,
                       rollback=lambda: events.append("rollback_build"))
        orch.add_stage("verify", lambda: False)
        result = orch.deploy_to_production()
        assert not result["success"]
        assert result["failed_stage"] == "verify"
        assert "rollback_build" in events

    def test_health_checker(self):
        report = ProductionHealthChecker().check()
        assert report["healthy"]
        assert report["checks"]["dependencies"]


class TestServing:
    def test_http_predict_roundtrip(self):
        import http.client
        import json as _json
        from dgdm_histopath_tpu.deployment import InferenceServer
        from dgdm_histopath_tpu.evaluation import DGDMPredictor

        model, params, g = tiny_model_setup()
        predictor = DGDMPredictor(model=model, params=params,
                                  feature_extractor="none")
        server = InferenceServer(predictor, port=18099)
        thread = server.start(background=True)
        try:
            conn = http.client.HTTPConnection("localhost", 18099, timeout=10)
            # health
            conn.request("GET", "/healthz")
            r = conn.getresponse()
            assert r.status == 200
            health = _json.loads(r.read())
            assert health["healthy"]
            # info
            conn.request("GET", "/info")
            info = _json.loads(conn.getresponse().read())
            assert info["model_type"] == "DGDMModel"
            # predict with an inline single graph (unbatched fields)
            single = {k: np.asarray(v).tolist() for k, v in {
                "x": g.x[0], "pos": g.pos[0], "nbr_idx": g.nbr_idx[0],
                "nbr_mask": g.nbr_mask[0], "edge_attr": g.edge_attr[0],
                "node_mask": g.node_mask[0]}.items()}
            body = _json.dumps({"graph": single})
            conn.request("POST", "/predict", body=body,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            out = _json.loads(resp.read())
            assert "probabilities" in out and "latency_s" in out
            # batched predict: two copies of the same graph in one call
            body = _json.dumps({"graphs": [single, single]})
            conn.request("POST", "/predict_batch", body=body,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            out = _json.loads(resp.read())
            assert out["count"] == 2 and len(out["results"]) == 2
            assert "probabilities" in out["results"][0]
            # prometheus metrics text
            conn.request("GET", "/metrics")
            resp = conn.getresponse()
            assert resp.status == 200
            text = resp.read().decode()
            assert "dgdm_requests_total 2" in text
            assert "dgdm_errors_total 0" in text
            # malformed payload -> 400
            conn.request("POST", "/predict", body="{}",
                         headers={"Content-Type": "application/json"})
            assert conn.getresponse().status == 400
            conn.request("GET", "/metrics")
            assert "dgdm_errors_total 1" in conn.getresponse().read().decode()
        finally:
            server.stop()


class TestServingPathConfinement:
    """Client-supplied graph_path must stay under data_root (ADVICE r2)."""

    def test_path_loading_disabled_without_data_root(self):
        from dgdm_histopath_tpu.deployment import InferenceServer
        from dgdm_histopath_tpu.evaluation import DGDMPredictor
        model, params, g = tiny_model_setup()
        predictor = DGDMPredictor(model=model, params=params,
                                  feature_extractor="none")
        server = InferenceServer(predictor, port=18100)
        with pytest.raises(PermissionError, match="disabled"):
            server.handle_predict({"graph_path": "/etc/passwd"})

    def test_escaping_path_rejected_and_confined_path_served(self, tmp_path):
        from dgdm_histopath_tpu.deployment import InferenceServer
        from dgdm_histopath_tpu.evaluation import DGDMPredictor
        from dgdm_histopath_tpu.data.graph_io import save_graph
        model, params, g = tiny_model_setup()
        predictor = DGDMPredictor(model=model, params=params,
                                  feature_extractor="none")
        server = InferenceServer(predictor, port=18101,
                                 data_root=str(tmp_path))
        for bad in ("../../etc/passwd", "/etc/passwd"):
            with pytest.raises(PermissionError):
                server.handle_predict({"graph_path": bad})
        single = make_synthetic_graph(seed=0, n_nodes=16, n_real=12,
                                      feat_dim=8)
        save_graph(single, tmp_path / "ok.npz")
        out = server.handle_predict({"graph_path": "ok.npz"})
        assert "probabilities" in out

class TestDynamicBatching:
    """Dynamic request batching (deployment/batching.py): concurrent
    /predict requests coalesce into single predict_batch device calls."""

    def test_batcher_coalesces_and_preserves_order(self):
        import threading
        from dgdm_histopath_tpu.deployment import DynamicBatcher
        calls = []
        gate = threading.Event()

        def batch_fn(items):
            gate.wait(5.0)  # hold the first batch so followers pile up
            calls.append(list(items))
            return [i * 10 for i in items]

        b = DynamicBatcher(batch_fn, max_batch=8, max_wait_ms=30)
        futs = [b.submit(i) for i in range(6)]
        gate.set()
        results = [f.result(timeout=10) for f in futs]
        assert results == [i * 10 for i in range(6)]
        b.close()
        # the tail coalesced: fewer batches than items, order preserved
        assert 1 <= len(calls) <= 6
        assert [x for c in calls for x in c] == list(range(6))
        assert b.stats["items"] == 6
        assert b.stats["max_batch_seen"] >= 2

    def test_batcher_propagates_errors_to_all_waiters(self):
        from dgdm_histopath_tpu.deployment import DynamicBatcher

        def bad(items):
            raise RuntimeError("boom")

        b = DynamicBatcher(bad, max_batch=4, max_wait_ms=5)
        fut = b.submit(1)
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)
        b.close()
        with pytest.raises(RuntimeError, match="closed"):
            b.submit(2)

    def test_batcher_length_mismatch_fails_loudly(self):
        from dgdm_histopath_tpu.deployment import DynamicBatcher
        # empty return can never satisfy any batch size, including the
        # individual retries — every waiter must see the mismatch error
        b = DynamicBatcher(lambda items: [], max_batch=4, max_wait_ms=30)
        f1, f2 = b.submit("a"), b.submit("b")
        errs = 0
        for f in (f1, f2):
            try:
                f.result(timeout=10)
            except RuntimeError:
                errs += 1
        assert errs == 2
        b.close()

    def test_bad_item_does_not_fail_cobatched_neighbors(self):
        # ADVICE r3: a batch poisoned by one malformed item retries its
        # items individually — only the offender's future errors
        import threading
        from dgdm_histopath_tpu.deployment import DynamicBatcher
        gate = threading.Event()

        def batch_fn(items):
            gate.wait(5.0)
            if any(i == "poison" for i in items):
                raise ValueError("malformed graph")
            return [f"ok:{i}" for i in items]

        b = DynamicBatcher(batch_fn, max_batch=8, max_wait_ms=50)
        futs = [b.submit(i) for i in (0, "poison", 2, 3)]
        gate.set()
        assert futs[0].result(timeout=10) == "ok:0"
        assert futs[2].result(timeout=10) == "ok:2"
        assert futs[3].result(timeout=10) == "ok:3"
        with pytest.raises(ValueError, match="malformed"):
            futs[1].result(timeout=10)
        b.close()

    def test_close_drains_items_behind_stop_marker(self):
        # ADVICE r3: an item that races close() and lands behind the stop
        # marker must fail fast, not strand its waiter until the timeout
        import threading
        from concurrent.futures import Future
        from dgdm_histopath_tpu.deployment import DynamicBatcher
        gate = threading.Event()

        def batch_fn(items):
            gate.wait(5.0)
            return list(items)

        b = DynamicBatcher(batch_fn, max_batch=1, max_wait_ms=1)
        first = b.submit("a")                    # occupies the loop at gate
        time.sleep(0.05)
        stranded: Future = Future()
        b._q.put(None)                           # simulated close() marker
        b._q.put(("late", stranded))             # racing submit
        gate.set()
        assert first.result(timeout=10) == "a"
        with pytest.raises(RuntimeError, match="closed"):
            stranded.result(timeout=10)
        b._closed = True
        b._thread.join(timeout=10)

    def test_mixed_bucket_batches_pad_per_shape_group(self):
        # ADVICE r3: the batcher's device fn must pad each SHAPE GROUP to
        # a power of two (predict_batch regroups by bucket, so padding the
        # total count alone leaves per-bucket sizes arbitrary and XLA
        # compiles one program per arrival count per bucket)
        from dgdm_histopath_tpu.deployment import InferenceServer
        from dgdm_histopath_tpu.evaluation import DGDMPredictor
        model, params, _ = tiny_model_setup()
        predictor = DGDMPredictor(model=model, params=params,
                                  feature_extractor="none")
        server = InferenceServer(predictor, port=18103, dynamic_batch=8)
        seen_group_sizes = []
        real_predict_batch = predictor.predict_batch

        def spy(graphs):
            sizes = {}
            for g in graphs:
                key = (g.num_nodes, g.max_neighbors, g.feature_dim)
                sizes[key] = sizes.get(key, 0) + 1
            seen_group_sizes.append(sorted(sizes.values()))
            return real_predict_batch(graphs)

        predictor.predict_batch = spy
        try:
            # 3 small-bucket + 1 large-bucket graphs in one coalesced batch
            gs = [make_synthetic_graph(seed=i, n_nodes=16, n_real=12,
                                       feat_dim=8) for i in range(3)]
            gs.append(make_synthetic_graph(seed=9, n_nodes=32, n_real=20,
                                           feat_dim=8))
            results = server.batcher.batch_fn(gs)
        finally:
            predictor.predict_batch = real_predict_batch
            server.batcher.close()
        assert len(results) == 4
        assert all("probabilities" in r for r in results)
        # each shape group padded to a power of two: 3 -> 4, 1 -> 1
        assert seen_group_sizes == [[1, 4]]
        # results map back to their own graphs, not the filler: distinct
        # inputs in the same group must give distinct embeddings
        e0 = np.asarray(results[0]["graph_embedding"])
        e1 = np.asarray(results[1]["graph_embedding"])
        assert not np.allclose(e0, e1)

    def test_http_concurrent_predicts_coalesce(self):
        import http.client
        import json as _json
        import threading
        from dgdm_histopath_tpu.deployment import InferenceServer
        from dgdm_histopath_tpu.evaluation import DGDMPredictor

        model, params, g = tiny_model_setup()
        predictor = DGDMPredictor(model=model, params=params,
                                  feature_extractor="none")
        server = InferenceServer(predictor, port=18102, dynamic_batch=8,
                                 batch_wait_ms=50, rate_limit_per_s=500)
        server.start(background=True)
        single = {k: np.asarray(v).tolist() for k, v in {
            "x": g.x[0], "pos": g.pos[0], "nbr_idx": g.nbr_idx[0],
            "nbr_mask": g.nbr_mask[0], "edge_attr": g.edge_attr[0],
            "node_mask": g.node_mask[0]}.items()}
        body = _json.dumps({"graph": single})
        outs = [None] * 6
        def call(i):
            conn = http.client.HTTPConnection("localhost", 18102, timeout=30)
            conn.request("POST", "/predict", body=body,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            outs[i] = (r.status, _json.loads(r.read()))
            conn.close()
        try:
            # warm the compile so the timed burst coalesces, not compiles
            call(0)
            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            assert all(o is not None and o[0] == 200 for o in outs), outs
            p0 = outs[0][1]["probabilities"]
            for st, o in outs[1:]:
                np.testing.assert_allclose(o["probabilities"], p0, atol=1e-5)
            # metrics expose the batching tier
            conn = http.client.HTTPConnection("localhost", 18102, timeout=10)
            conn.request("GET", "/metrics")
            text = conn.getresponse().read().decode()
            assert "dgdm_batches_total" in text
            assert "dgdm_batch_size_mean" in text
            stats = server.batcher.stats
            assert stats["items"] == 7
            # the concurrent burst produced at least one multi-item batch
            assert stats["max_batch_seen"] >= 2
        finally:
            server.stop()

class TestPredictSlideEndpoint:
    """POST /predict_slide runs the full WSI pipeline, confined to data_root."""

    def test_slide_path_confinement_and_roundtrip(self, tmp_path):
        from dgdm_histopath_tpu.deployment import InferenceServer
        from dgdm_histopath_tpu.evaluation import DGDMPredictor
        from dgdm_histopath_tpu.preprocessing import write_synthetic_tiff

        write_synthetic_tiff(tmp_path / "case.tiff", 384, 384, num_levels=3,
                             seed=0)
        model, params, g = tiny_model_setup(feat_dim=5)
        predictor = DGDMPredictor(model=model, params=params,
                                  feature_extractor="none", patch_size=32,
                                  max_patches=12, tissue_threshold=0.3,
                                  node_buckets=(16, 32))
        server = InferenceServer(predictor, port=18103,
                                 data_root=str(tmp_path))
        with pytest.raises(PermissionError):
            server.handle_predict_slide({"slide_path": "../../etc/passwd"})
        with pytest.raises(ValueError, match="slide_path"):
            server.handle_predict_slide({})
        out = server.handle_predict_slide({"slide_path": "case.tiff"})
        assert out["slide_id"] == "case"
        assert out["num_patches"] >= 1
        assert "probabilities" in out and len(out["probabilities"]) == 2
        # everything JSON-serializable (nested patch_info dicts included)
        json.dumps(out)
