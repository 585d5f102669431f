#!/usr/bin/env python
"""Roofline closure for the CNN relevance walk (VERDICT r2 #7/#8).

The depth profile shows blocks 1-2 of the VGG backward walk are half the
program; this tool replaces the "XLA saturates this" inference with numbers:

1. ANALYTIC per-word HBM traffic and FLOPs per resolution block, from the
   walk's actual data movement (bf16 relevance storage between layers, f32
   stashed reciprocals/inputs shared per caption but READ per word, conv
   data-grad weights);
2. MEASURED ms/img per block (depth-sweep deltas at the production operating
   point, batch 8 x 16 words x chunk 8);
3. achieved GB/s and TFLOP/s per block vs the v5e roofline
   (819 GB/s HBM, 197 bf16 TFLOP/s), printed as % of whichever bound binds.

Weights traffic is reported as a [0, 1]-amortization interval: one weight
read per word-chunk invocation (optimistic, XLA reuses across the vmapped
chunk) to one per word (pessimistic).

Usage (real TPU chip): python tools/roofline_cnn_walk.py [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s
V5E_BF16_TFLOPS = 197.0


def analytic_blocks(hw: int):
    """Per-word bytes/flops per resolution block of the VGG16 backward walk."""
    from lrp_imagecaptioning_tpu.models.encoders import VGG16_CFG

    # forward shape tracking (cfg-D minus the last pool, features[:-1])
    res, cin = hw, 3
    layers = []  # (kind, res_in, C_in, C_out) in forward order
    for v in VGG16_CFG:
        if v == "M":
            layers.append(("maxpool", res, cin, cin))
            res //= 2
        else:
            layers.append(("conv", res, cin, int(v)))
            cin = int(v)
    # walk is reversed; block index = pools crossed so far (block5 first)
    blocks = {}
    pools_left = sum(1 for k, *_ in layers if k == "maxpool")
    block_id = pools_left + 1  # start in block 5 (walk begins at 14^2)
    for kind, r, ci, co in reversed(layers):
        b = blocks.setdefault(f"block{block_id}", dict(
            bytes_maps=0.0, bytes_weights=0.0, flops=0.0))
        if kind == "conv":
            h_out = r  # VGG convs are SAME padding, stride 1
            # production storage after round 3: r_in bf16 + zinv bf16 at
            # (h_out, co); x_in bf16 read and r_out bf16 write at (r, ci)
            b["bytes_maps"] += h_out * h_out * co * (2 + 2) \
                + r * r * ci * (2 + 2)
            b["bytes_weights"] += 3 * 3 * ci * co * 4
            b["flops"] += 2.0 * h_out * h_out * co * 9 * ci
        elif kind == "maxpool":
            # read winner BOOL at input res (r, ci) + read r bf16 at output
            # res + write r bf16 at input res
            b["bytes_maps"] += r * r * ci * (1 + 2) + (r // 2) ** 2 * ci * 2
            block_id -= 1
    return blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--words", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--out", default="output/roofline_cnn_walk.json")
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
    from lrp_imagecaptioning_tpu.models.encoders import VGG16_SPEC, init_vgg16

    analytic = analytic_blocks(args.hw)
    print(json.dumps({k: {kk: round(vv / 1e6, 2) for kk, vv in v.items()}
                      for k, v in analytic.items()}), flush=True)

    rng = np.random.default_rng(0)
    params = init_vgg16(jax.random.PRNGKey(0))
    B, T, hw, chunk = args.batch, args.words, args.hw, args.chunk
    images = jnp.asarray(rng.normal(size=(B, hw, hw, 3)).astype(np.float32))
    seeds = jnp.asarray(
        rng.normal(size=(B, T, hw // 16, hw // 16, 512)).astype(np.float32))

    # measured depth sweep (ms/img walking records[k:] only)
    idx = {}
    pools_seen = 0
    for i, layer in enumerate(VGG16_SPEC):
        if layer.kind == "maxpool":
            pools_seen += 1
            idx[f"below_pool{pools_seen}"] = i
    depth_points = {"full": 0, **idx}
    times = {}
    for name, down_to in sorted(depth_points.items(), key=lambda kv: -kv[1]):
        def per_image(image, seed_block, down_to=down_to):
            backward, _ = cnn_lrp.make_vgg_lrp_backward(
                params, image[None], pool_mode="fast",
                r_dtype=jnp.bfloat16)
            seeds_r = seed_block.reshape(T // chunk, chunk,
                                         *seed_block.shape[1:])
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
        times[name] = 1000 * dt / (B * args.iters)
        print(json.dumps({name: round(times[name], 3)}), flush=True)

    # block deltas: walking below_pool{k} includes blocks k+1..5; so
    # block k cost = t(below_pool{k}) - t(below_pool{k+1}) ... with
    # t(full) = all 5 blocks and below_pool1 = blocks 2..5
    block_ms = {}
    order = ["full"] + [f"below_pool{k}" for k in range(1, 5)]
    for bi, (lo, hi) in enumerate(zip(order, order[1:] + [None]), start=1):
        t_lo = times[lo]
        t_hi = times[hi] if hi else 0.0
        block_ms[f"block{bi}"] = t_lo - t_hi
    # the walk has 4 pools (features[:-1]); below_pool4 = block 5 alone
    report = {"config": vars(args), "measured_ms_per_image": times,
              "blocks": {}}
    for name, ms in block_ms.items():
        a = analytic.get(name, None)
        if a is None or ms <= 0:
            report["blocks"][name] = {"ms_per_image": round(ms, 3)}
            continue
        per_word_s = ms / 1000.0 / T
        gbs_opt = a["bytes_maps"] / per_word_s / 1e9
        gbs_pes = (a["bytes_maps"] + a["bytes_weights"]) / per_word_s / 1e9
        tflops = a["flops"] / per_word_s / 1e12
        report["blocks"][name] = {
            "ms_per_image": round(ms, 3),
            "analytic_MB_per_word_maps": round(a["bytes_maps"] / 1e6, 2),
            "analytic_MB_per_word_weights": round(a["bytes_weights"] / 1e6, 2),
            "achieved_GBs": [round(gbs_opt, 1), round(gbs_pes, 1)],
            "pct_hbm_roofline": [round(100 * gbs_opt / V5E_HBM_GBS, 1),
                                 round(100 * gbs_pes / V5E_HBM_GBS, 1)],
            "achieved_TFLOPs": round(tflops, 2),
            "pct_mxu_roofline": round(100 * tflops / V5E_BF16_TFLOPS, 1),
        }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["blocks"], indent=2))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
