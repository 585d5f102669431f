"""Stage-level timing of the explanation program's CNN relevance backward.

The headline bench (bench.py) runs encode -> beam decode -> decoder walk ->
CNN LRP backward as one program; CLAUDE.md records the CNN stage at ~90% of
the time.  This tool times the CNN stage ALONE at the production operating
point (batch 8, 16 words, chunk 8, 224x224 VGG16) under three pool-backward
variants, to locate where those milliseconds actually go:

- ``vjp``    — reference-faithful gradient trick (SelectAndScatter per word)
- ``fast``   — precomputed winner map, per-word backward is elementwise

Usage: python tools/bench_cnn_stages.py [--batch 8] [--words 16] [--iters 3]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--words", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--r-dtype", default="bfloat16",
                    help="relevance storage dtype for the depth sweep "
                         "(production TPU default bfloat16)")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.explain import cnn_lrp
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    rng = np.random.default_rng(0)
    params = init_vgg16(jax.random.PRNGKey(0))
    B, T, hw, chunk = args.batch, args.words, args.hw, args.chunk
    images = jnp.asarray(rng.normal(size=(B, hw, hw, 3)).astype(np.float32))
    seeds = jnp.asarray(
        rng.normal(size=(B, T, hw // 16, hw // 16, 512)).astype(np.float32))

    def make_core(pool_mode, precision="BF16_BF16_F32_X3"):
        def per_image(image, seed_block):
            backward, _ = cnn_lrp.make_vgg_lrp_backward(
                params, image[None], pool_mode=pool_mode)
            seeds_r = seed_block.reshape(T // chunk, chunk,
                                         *seed_block.shape[1:])
            out = jax.lax.map(
                lambda s: jax.vmap(lambda r: backward(r[None])[0])(s), seeds_r)
            return out.reshape(T, *out.shape[2:])

        @jax.jit
        def core(images, seeds):
            if precision is None:
                return jax.vmap(per_image)(images, seeds)
            with jax.default_matmul_precision(precision):
                return jax.vmap(per_image)(images, seeds)

        return core

    results = {}
    ref_out = None
    for mode, prec in (("vjp", "BF16_BF16_F32_X3"),
                       ("fast", "BF16_BF16_F32_X3"),
                       ("fast_bf16_1pass", None),
                       ("fast_f32_x6", "BF16_BF16_F32_X6"),
                       ("fast_f32", "F32_F32_F32")):
        core = make_core("vjp" if mode == "vjp" else "fast",
                         precision=prec)
        out = core(images, seeds)
        np.asarray(out[0, 0, 0, 0])  # sync (block_until_ready no-ops on axon)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(images, seeds)
        np.asarray(out[0, 0, 0, 0])  # scalar sync — do NOT pull the 77MB
        dt = time.perf_counter() - t0  # output through the tunnel in-loop
        img_s = B * args.iters / dt
        results[mode] = {"images_per_sec": round(img_s, 2),
                         "ms_per_image": round(1000 * dt / (B * args.iters), 3)}
        got = np.asarray(out)  # full transfer outside the timed window
        if mode == "vjp":
            ref_out = got
        else:
            results[mode]["mae_vs_vjp"] = float(np.abs(got - ref_out).mean())
        print(json.dumps({mode: results[mode]}), flush=True)

    # depth sweep: truncate the backward at each pool boundary to attribute
    # cost per resolution block (records: conv/relu/pool sequence of
    # VGG16_SPEC; down_to=k walks only records[k:])
    from lrp_imagecaptioning_tpu.models.encoders import VGG16_SPEC

    idx = {}
    pools_seen = 0
    for i, layer in enumerate(VGG16_SPEC):
        if layer.kind == "maxpool":
            pools_seen += 1
            idx[f"below_pool{pools_seen}"] = i  # records index == spec index
    depth_points = {"full": 0, **{k: v for k, v in idx.items()}}
    r_dtype = jnp.dtype(args.r_dtype)
    for name, down_to in sorted(depth_points.items(), key=lambda kv: -kv[1]):
        def per_image(image, seed_block, down_to=down_to):
            backward, _ = cnn_lrp.make_vgg_lrp_backward(
                params, image[None], pool_mode="fast", r_dtype=r_dtype)
            seeds_r = seed_block.reshape(T // chunk, chunk,
                                         *seed_block.shape[1:])
            # reduce each word's map to a scalar so every depth point has
            # the same (tiny) output — otherwise shallow truncations write
            # up to 1.6 GB of diagnostics and the deltas are contaminated
            out = jax.lax.map(
                lambda s: jax.vmap(
                    lambda r: backward(r[None], down_to=down_to)[0].sum())(s),
                seeds_r)
            return out.reshape(T)

        core = jax.jit(lambda images, seeds, f=per_image: jax.vmap(f)(
            images, seeds))
        out = core(images, seeds)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(images, seeds)
        np.asarray(out.ravel()[0])
        dt = time.perf_counter() - t0
        results[f"depth_{name}"] = {
            "ms_per_image": round(1000 * dt / (B * args.iters), 3)}
        print(json.dumps({f"depth_{name}":
                          results[f"depth_{name}"]}), flush=True)

    # full-core split: production explainer vs the same core with the CNN
    # stage stubbed out (decoder walk + beam decode + encode only)
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    word_map = build_word_map([[f"w{i}"] for i in range(9582)],
                              min_word_freq=1)
    cfg = ModelConfig(
        model_type="gridtd", encoder="vgg16", embed_dim=512, hidden_dim=512,
        vocab_size=len(word_map), num_pixels=(hw // 16) ** 2,
        vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    cparams = cap.init(jax.random.PRNGKey(0))
    for name, stub in (("core_full", False), ("core_no_cnn", True)):
        ex = build_explainer("lrp", cap, cparams, word_map, max_words=T,
                             cnn_word_chunk=chunk)
        if stub:
            ex._cnn_stage = lambda params, image, word_exp: (
                ex._grid_seeds(word_exp))
        core = ex.batched_core()
        np.asarray(core(cparams, images)[1][0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(cparams, images)
        np.asarray(out[1][0])
        dt = time.perf_counter() - t0
        results[name] = {
            "images_per_sec": round(B * args.iters / dt, 2),
            "ms_per_image": round(1000 * dt / (B * args.iters), 3)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
