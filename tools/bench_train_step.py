"""Pure device-side train-step benchmark (XE / LRP-XE).

Separates the jitted step's execution time from the host input feed.  The
README's full-step numbers (1330 -> 1065 ms/step f32 -> bf16, GridTD+VGG16
batch 32, 224^2, finetune) were measured through the epoch loop on the axon
remote-tunnel backend, where every batch upload ships ~19 MB (batch-32 f32
224^2 images) over the network — so they bound the INPUT PIPELINE, not the
TPU program.  This tool times

  1. the step itself with all inputs device-resident (state chained through
     donated buffers, sync on the scalar loss leaf only), and
  2. the host->device upload of one image+caption batch,

and reports an MFU estimate from the compiled program's own cost analysis so
"is the step near roofline?" is a recorded number, not an inference.

Replaces nothing in the reference (it has no profiling at all, SURVEY §5);
this is the TPU build's train-path analogue of tools/roofline_cnn_walk.py.

Usage:
  python tools/bench_train_step.py --batch 32 --height 224 --finetune \
      --compute-dtype bfloat16 [--mode xe|lrp] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gridtd",
                    choices=["gridtd", "aoa", "adaptive"])
    ap.add_argument("--encoder", default="vgg16",
                    choices=["vgg16", "resnet50", "resnet101", "bu"])
    ap.add_argument("--mode", default="xe",
                    choices=["xe", "lrp", "scst", "lrp_scst"],
                    help="scst/lrp_scst measure the per-phase split of one "
                         "(LRP-)SCST step: frozen-CNN encode fused with the "
                         "rollout program, token device->host transfer, host "
                         "CIDEr reward (native C++ scorer), policy-gradient "
                         "update")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--cap-len", type=int, default=22,
                    help="padded caption length incl. <start>/<end>")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--vocab", type=int, default=9582)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--upload-dtype", default="float32",
                    choices=["float32", "bfloat16", "uint8"],
                    help="host->device image transfer dtype: bfloat16 halves "
                         "the bytes (TrainConfig.upload_dtype), uint8 "
                         "quarters them (CaptionDataset(uint8_images=True)); "
                         "the step normalizes/upcasts on device "
                         "(prepare_visual)")
    ap.add_argument("--finetune", action="store_true",
                    help="encoder gradients on (reference train.py:95-109)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU backend (smoke)")
    ap.add_argument("--feed-depth-sweep", action="store_true",
                    help="measure aggregate host->device upload bandwidth "
                         "with 1/2/4 concurrent in-flight device_puts "
                         "(VERDICT r3 #6: can pipeline depth beat the "
                         "280 ms/batch uint8 feed floor the way it did for "
                         "serving dispatch?) and exit")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak for MFU (v5e ~197; this backend runs "
                         "f32 matmuls as one bf16 MXU pass, see CLAUDE.md)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=1")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig, ModelConfig, TrainConfig)
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.parallel import batch_sharding, replicated

    word_map = build_word_map([[f"w{i}"] for i in range(args.vocab)],
                              min_word_freq=1)
    bu = args.encoder == "bu"
    cfg = ModelConfig(
        model_type=args.model, encoder=args.encoder,
        embed_dim=1024 if bu else 512, hidden_dim=1024 if bu else 512,
        vocab_size=len(word_map), height=args.height, width=args.height,
        vocab_pad_multiple=128, compute_dtype=args.compute_dtype,
    )
    exp = ExperimentConfig(
        model=cfg,
        train=TrainConfig(batch_size=args.batch,
                          finetune_encoder=args.finetune,
                          lrp_tune=args.mode == "lrp"),
    )
    trainer = Trainer(exp, word_map)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng0 = np.random.default_rng(0)

    def sync0(x):
        return np.asarray(x)

    if args.feed_depth_sweep:
        from concurrent.futures import ThreadPoolExecutor

        shape = ((args.batch, 36, cfg.bu_feat_dim) if bu
                 else (args.batch, args.height, args.height, 3))
        n_batches = 12
        # distinct payloads per upload (the helper does not memoize, but a
        # shared buffer could alias host-side)
        if args.upload_dtype == "uint8" and not bu:
            host = [rng0.integers(0, 256, size=shape, dtype=np.uint8)
                    for _ in range(n_batches)]
        else:
            host = [rng0.normal(size=shape).astype(
                        jnp.bfloat16 if args.upload_dtype == "bfloat16"
                        else np.float32)
                    for _ in range(n_batches)]

        def upload_one(x):
            d = jax.device_put(jnp.asarray(x))
            sync0(d.ravel()[0])  # confirm arrival; scalar pull only
            return d

        upload_one(host[0])  # warm the transfer path + any layout program
        results = {}
        for depth in (1, 2, 4):
            with ThreadPoolExecutor(max_workers=depth) as ex:
                t0 = time.perf_counter()
                futs = [ex.submit(upload_one, x) for x in host]
                for f in futs:
                    f.result()
                dt = time.perf_counter() - t0
            ms = 1e3 * dt / n_batches
            results[f"depth_{depth}"] = {
                "ms_per_batch": round(ms, 1),
                "images_per_sec": round(args.batch / (ms / 1e3), 1),
            }
            print(f"depth {depth}: {ms:.1f} ms/batch "
                  f"({args.batch / (ms / 1e3):.1f} img/s)", flush=True)
        print(json.dumps({
            "metric": "feed_depth_sweep", "batches": n_batches,
            "upload_mb_per_batch": round(host[0].nbytes / 1e6, 2),
            "upload_dtype": args.upload_dtype, "batch": args.batch,
            "height": args.height, "results": results,
            "platform": jax.devices()[0].platform,
        }))
        return

    if args.mode in ("scst", "lrp_scst"):
        import types

        from lrp_imagecaptioning_tpu.engine.scst import (
            get_self_critical_reward)

        lrp = args.mode == "lrp_scst"
        if lrp and args.model == "adaptive":
            ap.error("lrp_scst: the adaptive family has no LRP-inference "
                     "weighting (config.py:42)")

        shape0 = ((args.batch, 36, cfg.bu_feat_dim) if bu
                  else (args.batch, args.height, args.height, 3))
        img_d = jax.device_put(jnp.asarray(
            rng0.normal(size=shape0).astype(np.float32)))
        all_caps = np.zeros((args.batch, 5, args.cap_len), np.int32)
        all_caps[:, :, 0] = word_map.start
        all_caps[:, :, 1:-1] = rng0.integers(
            1, args.vocab, (args.batch, 5, args.cap_len - 2))
        all_caps[:, :, -1] = word_map.end
        step_rng = jax.device_put(jax.random.PRNGKey(1))
        num_steps = args.cap_len - 1

        def sync_out(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            sync0(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)

        def timed(fn, n=args.iters):
            # warmup MUST sync: dispatch is async, so an unsynced compile
            # would leak into the timed window (observed: a 150 s encode
            # compile read as "15 s/call")
            sync_out(fn())
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync_out(out)
            return 1e3 * (time.perf_counter() - t0) / n

        ro = (trainer._jit("lrp_scst_encode_rollout",
                           trainer.lrp_scst_encode_rollout,
                           static_argnums=(2,)) if lrp else
              trainer._jit("scst_encode_rollout", trainer.scst_encode_rollout,
                           static_argnums=(2,)))
        ro_ms = timed(lambda: ro(state, img_d, num_steps, step_rng))
        raw, avg, greedy_d, sampled_d = ro(state, img_d, num_steps, step_rng)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            greedy_h = np.asarray(greedy_d)
            sampled_h = np.asarray(sampled_d)
        xfer_ms = 1e3 * (time.perf_counter() - t0) / args.iters
        t0 = time.perf_counter()
        for _ in range(args.iters):
            reward = get_self_critical_reward(
                greedy_h, all_caps, sampled_h, word_map,
                cider_reward_weight=1.0, bleu_reward_weight=0.0)
        reward_ms = 1e3 * (time.perf_counter() - t0) / args.iters
        reward_d = jnp.asarray(reward)
        if lrp:
            upd = trainer._jit("lrp_scst_update", trainer.lrp_scst_update)
            upd_ms = timed(
                lambda: upd(state, raw, avg, img_d, sampled_d, reward_d)[1])
            step_fn = trainer.lrp_scst_batch
        else:
            upd = trainer._jit("scst_update", trainer.scst_update)
            upd_ms = timed(
                lambda: upd(state, raw, avg, img_d, sampled_d, reward_d,
                            None)[1])
            step_fn = trainer.scst_batch
        batch_obj = types.SimpleNamespace(
            images=np.asarray(img_d), all_captions=all_caps, captions=None)
        full_ms = timed(
            lambda: step_fn(state, batch_obj, step_rng, num_steps)[1],
            n=max(4, args.iters // 4))
        # epoch-loop form: the prefetch thread uploads, the step sees a
        # device-resident batch
        batch_dev = types.SimpleNamespace(
            images=img_d, all_captions=all_caps, captions=None)
        full_dev_ms = timed(
            lambda: step_fn(state, batch_dev, step_rng, num_steps)[1],
            n=max(4, args.iters // 4))
        print(json.dumps({
            "metric": f"{args.mode}_train_step", "value": round(full_ms, 2),
            "unit": "ms/step_end_to_end",
            "images_per_sec": round(args.batch / (full_ms / 1e3), 2),
            "step_ms_device_resident_batch": round(full_dev_ms, 2),
            "images_per_sec_prefetched": round(
                args.batch / (full_dev_ms / 1e3), 2),
            "phases_ms": {
                "encode_rollout_program": round(ro_ms, 2),
                "tokens_to_host": round(xfer_ms, 2),
                "host_reward_cider": round(reward_ms, 2),
                "update_program": round(upd_ms, 2),
            },
            "model": args.model, "encoder": args.encoder,
            "batch": args.batch, "height": args.height,
            "finetune_encoder": args.finetune,
            "platform": jax.devices()[0].platform,
        }))
        return

    if args.mode == "xe":
        step = trainer.compiled_xe_step()
    else:
        bs = batch_sharding(trainer.mesh, exp.mesh)
        step = trainer._jit(
            "lrp_xe", trainer.lrp_xe_step,
            in_shardings=(None, bs, bs, replicated(trainer.mesh)),
            donate_argnums=(0,),
        )

    rng = np.random.default_rng(0)
    shape = ((args.batch, 36, cfg.bu_feat_dim) if bu
             else (args.batch, args.height, args.height, 3))
    images_h = rng.normal(size=shape).astype(np.float32)
    if not bu and args.upload_dtype == "uint8":
        images_h = rng.integers(0, 256, size=shape, dtype=np.uint8)
    elif not bu and args.upload_dtype == "bfloat16":
        images_h = images_h.astype(jnp.bfloat16)
    caps_h = np.zeros((args.batch, args.cap_len), np.int32)
    caps_h[:, 0] = word_map.start
    caps_h[:, 1:-1] = rng.integers(1, args.vocab, (args.batch, args.cap_len - 2))
    caps_h[:, -1] = word_map.end

    def sync(x):
        # device->host transfer forces completion (block_until_ready does
        # not synchronize on the remote-tunnel backend)
        return np.asarray(x)

    # -- input-feed cost: host->device upload of one batch ----------------
    up_times = []
    for _ in range(4):
        t0 = time.perf_counter()
        img_d = jax.device_put(jnp.asarray(images_h))
        cap_d = jax.device_put(jnp.asarray(caps_h))
        sync(img_d.ravel()[0])
        up_times.append(time.perf_counter() - t0)
    upload_ms = 1e3 * min(up_times)
    step_rng = jax.device_put(jax.random.PRNGKey(1))

    # -- step time: warmup (compile) then chained steady-state ------------
    state, loss, _ = step(state, img_d, cap_d, step_rng)
    sync(loss)
    state, loss, _ = step(state, img_d, cap_d, step_rng)
    sync(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, loss, acc = step(state, img_d, cap_d, step_rng)
    sync(loss)
    dt = time.perf_counter() - t0
    step_ms = 1e3 * dt / args.iters

    # -- compiled cost analysis -> MFU ------------------------------------
    flops = None
    try:
        # same jit object -> the lowering hits the compile cache
        ca = step.lower(state, img_d, cap_d, step_rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    mfu = (flops / (dt / args.iters) / (args.peak_tflops * 1e12)
           if flops else None)

    print(json.dumps({
        "metric": f"{args.mode}_train_step",
        "value": round(step_ms, 2),
        "unit": "ms/step_device_resident",
        "images_per_sec": round(args.batch / (dt / args.iters), 2),
        "upload_ms_per_batch": round(upload_ms, 2),
        "upload_mb": round((images_h.nbytes + caps_h.nbytes) / 1e6, 2),
        "flops_per_step": flops,
        "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
        "model": args.model, "encoder": args.encoder,
        "batch": args.batch, "height": args.height,
        "compute_dtype": args.compute_dtype,
        "upload_dtype": args.upload_dtype,
        "finetune_encoder": args.finetune,
        "platform": jax.devices()[0].platform,
        "final_loss": float(sync(loss)),
    }))


if __name__ == "__main__":
    main()
