"""Serving entry point: caption + explanation as a batched JSON-over-HTTP
service on one TPU (or CPU for development).

The reference has no serving surface (its entry points are offline scripts);
this CLI stands up the TPU-native deployment path: dynamic request batching
(`lrp_imagecaptioning_tpu/serving/`) into the SAME cached fixed-shape
compiled programs the benchmark measures (bench.py headline: the full
caption + per-word LRP pipeline as one XLA program per batch).

Example:

    python serve.py --preset smoke --port 8080 &
    curl -s localhost:8080/healthz
    python - <<'EOF'
    import base64, json, urllib.request, numpy as np
    img = np.random.rand(64, 64, 3).astype(np.float32)
    req = {"image": {"b64": base64.b64encode(img.tobytes()).decode(),
                     "shape": list(img.shape)}}
    r = urllib.request.urlopen(urllib.request.Request(
        "http://localhost:8080/explain", json.dumps(req).encode(),
        {"Content-Type": "application/json"}))
    print(json.load(r)["caption"])
    EOF
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--preset", default="full", choices=["smoke", "full"])
    ap.add_argument("--model", default="gridtd",
                    choices=["gridtd", "aoa", "adaptive"])
    ap.add_argument("--encoder", default="vgg16",
                    choices=["vgg16", "resnet50", "resnet101", "bu"])
    ap.add_argument("--explainer", default="lrp",
                    help="explainer type for /explain (lrp, gradient, "
                         "guided_gradient, grad_cam, guided_grad_cam, "
                         "lrp_all_heads for aoa)")
    ap.add_argument("--batch", type=int, default=0,
                    help="compiled batch size (default: 8, or 2 for smoke)")
    ap.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="max time the batcher waits to coalesce a batch")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="max dispatched batches in flight (overlaps the "
                         "device round trip with readback; 1 = synchronous)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel serving over an N-device mesh: each "
                         "batch shards its rows across the devices "
                         "(collective-free shard_map; batch must divide N)")
    ap.add_argument("--payload", default="auto",
                    choices=["auto", "summary", "full"],
                    help="explain response mode: 'summary' reduces per-word "
                         "relevance stats ON DEVICE (full maps never leave "
                         "HBM; include_relevance unavailable), 'full' "
                         "transfers the maps; 'auto' = summary where the "
                         "explainer family supports it")
    ap.add_argument("--max-words", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--decode", default="beam", choices=["beam", "greedy"])
    ap.add_argument("--beam-size", type=int, default=3)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--no-caption", action="store_true")
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--params-checkpoint", default="",
                    help="params-only Orbax checkpoint (see bench.py)")
    ap.add_argument("--wordmap", default="",
                    help="word-map JSON matching --params-checkpoint")
    ap.add_argument("--foreground-warmup", action="store_true",
                    help="compile before binding the port (default: bind "
                         "first, warm in the background; /healthz reports "
                         "warm state)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (development; the "
                         "JAX_PLATFORMS env var alone is overridden by the "
                         "axon site file)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import WordMap, build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner
    from lrp_imagecaptioning_tpu.serving import (
        CaptionService, ExplainService, make_http_server)
    from lrp_imagecaptioning_tpu.serving.http_api import warm_services

    smoke = args.preset == "smoke"
    batch = args.batch or (2 if smoke else 8)
    hw = args.height or (64 if smoke else 224)
    max_words = args.max_words or (6 if smoke else 16)

    if args.wordmap:
        word_map = WordMap.load(args.wordmap)
    else:
        word_map = build_word_map(
            [[f"w{i}"] for i in range(60 if smoke else 9582)],
            min_word_freq=1)
    if args.encoder == "bu":
        cfg = ModelConfig(
            model_type=args.model, encoder="bu",
            embed_dim=64 if smoke else 1024,
            hidden_dim=64 if smoke else 1024,
            vocab_size=len(word_map), vocab_pad_multiple=128)
    else:
        cfg = ModelConfig(
            model_type=args.model, encoder=args.encoder,
            embed_dim=64 if smoke else 512,
            hidden_dim=64 if smoke else 512,
            vocab_size=len(word_map), height=hw, width=hw,
            vocab_pad_multiple=128)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    if args.params_checkpoint:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(
                os.path.abspath(args.params_checkpoint), params)

    delay = args.max_delay_ms / 1e3
    mesh = None
    if args.dp:
        from lrp_imagecaptioning_tpu.config import MeshConfig
        from lrp_imagecaptioning_tpu.parallel import build_mesh
        mesh = build_mesh(MeshConfig(data_parallel=args.dp))
    services = {}
    if not args.no_caption:
        services["caption"] = CaptionService(
            cap, params, word_map, batch_size=batch, decode=args.decode,
            beam_size=args.beam_size, max_cap_length=max_words,
            max_delay_s=delay, pipeline_depth=args.pipeline_depth,
            mesh=mesh).start()
    if not args.no_explain:
        explainer = build_explainer(args.explainer, cap, params, word_map,
                                    max_words=max_words)
        payload = args.payload
        if payload == "auto":
            payload = ("summary" if args.explainer in
                       ("lrp", "gradient", "guided_gradient", "grad_cam")
                       else "full")
        services["explain"] = ExplainService(
            explainer, batch_size=batch, max_delay_s=delay,
            payload=payload, pipeline_depth=args.pipeline_depth,
            mesh=mesh).start()

    server = make_http_server(services, args.host, args.port)
    warm_services(server, services,
                  background=not args.foreground_warmup)
    print(json.dumps({
        "serving": sorted(services), "host": args.host,
        "port": server.server_address[1], "batch": batch,
        "model": args.model, "encoder": args.encoder,
        "explainer": args.explainer,
        "payload": getattr(services.get("explain"), "payload", None),
        "backend": jax.default_backend(),
        "weights": ("trained" if args.params_checkpoint else "random"),
    }), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        for svc in services.values():
            svc.stop()
        server.server_close()


if __name__ == "__main__":
    main()
