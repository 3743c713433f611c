"""``dgdm-serve``: production inference server CLI.

Beyond-parity surface: the reference ships k8s manifests that assume an
HTTP inference service but provides no server entry point (its
``deployment/healthcheck.py:19-30`` is probe-only). This launches
``deployment.serving.InferenceServer`` over a trained model bundle, with
optional dynamic request batching (deployment/batching.py) and int8
inference, and shuts down gracefully on SIGTERM (k8s pod termination).
"""

from __future__ import annotations

import argparse
import signal

from ..utils.logging import get_logger, setup_logging

logger = get_logger("cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dgdm-serve")
    p.add_argument("--model", required=True, help="model bundle (.npz)")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--data-root", default=None,
                   help="enable graph_path loading confined to this dir")
    p.add_argument("--rate-limit", type=float, default=50.0,
                   help="requests/sec per client IP")
    p.add_argument("--dynamic-batch", type=int, default=0,
                   help="coalesce up to N concurrent /predict requests "
                        "into one device call (0 = serialize requests)")
    p.add_argument("--batch-wait-ms", type=float, default=5.0,
                   help="max queueing delay while a dynamic batch fills")
    p.add_argument("--batch-timeout-s", type=float, default=60.0,
                   help="per-request Future timeout inside the dynamic "
                        "batcher; raise on cold remote-compile backends "
                        "or use --warmup-nodes")
    p.add_argument("--warmup-nodes", default=None,
                   help="comma-separated node-bucket sizes to warm at "
                        "startup (compiles each power-of-two batch program "
                        "before accepting traffic), e.g. '1024,2048'")
    p.add_argument("--quant", choices=["int8"], default=None,
                   help="w8a8 int8 inference for the graph model")
    p.add_argument("--feature-extractor", default="none",
                   help="patch featurizer for slide-path requests")
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(args.log_level)
    from ..deployment import InferenceServer
    from ..evaluation import DGDMPredictor

    predictor = DGDMPredictor(model_path=args.model,
                              feature_extractor=args.feature_extractor,
                              quant=args.quant)
    server = InferenceServer(predictor, port=args.port,
                             rate_limit_per_s=args.rate_limit,
                             data_root=args.data_root,
                             dynamic_batch=args.dynamic_batch,
                             batch_wait_ms=args.batch_wait_ms,
                             batch_timeout_s=args.batch_timeout_s)
    if args.warmup_nodes:
        for n in str(args.warmup_nodes).split(","):
            server.warmup(num_nodes=int(n))

    def _term(signum, frame):
        # HTTPServer.shutdown() joins the serve_forever loop — calling it
        # from a signal handler on the serving thread deadlocks; stop from
        # a helper thread so serve_forever can actually return
        logger.info("SIGTERM: draining and stopping server")
        import threading
        threading.Thread(target=server.stop, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)
    try:
        server.start(background=False)  # returns after stop()
    except KeyboardInterrupt:
        server.stop()
    logger.info("server stopped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
