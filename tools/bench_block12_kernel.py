"""On-chip benchmark of the fused block-1+2 LRP backward Pallas kernel
(pool2 -> conv2_2 -> conv2_1 -> pool1 -> conv1_2 -> conv1_1) vs the XLA
record walk for the same six stages, at the production operating point.

Unlike the block-1-only kernel, the input here is the pool-2 relevance at
(H/4)^2 x 128 — native 128-lane minor, so there is NO channel-padding HBM
overhead on the per-word input.
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--imgs", type=int, default=8)
    ap.add_argument("--words", type=int, default=8)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--rows", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import (
        ConvParams, VGGLayer, VGGParams, conv2d, maxpool2x2)
    from lrp_imagecaptioning_tpu.ops.pallas_block1 import block12_lrp_backward

    I, T, H = args.imgs, args.words, args.hw
    C1, C2, Cin = 64, 128, 3
    rng = np.random.default_rng(0)
    mk = lambda s, sc: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
    w1, w2 = mk((3, 3, Cin, C1), .2), mk((3, 3, C1, C1), .05)
    w21, w22 = mk((3, 3, C1, C2), .05), mk((3, 3, C2, C2), .03)
    img = mk((I, H, H, Cin), 1.0)
    r_pool2 = mk((I, T, H // 4, H // 4, C2), 1.0)

    @jax.jit
    def stash(img):
        w1p = ConvParams(jnp.maximum(w1, 0.), None)
        w1n = ConvParams(jnp.minimum(w1, 0.), None)
        z1c = (conv2d(w1p, jnp.maximum(img, 0.))
               + conv2d(w1n, jnp.minimum(img, 0.)))
        a1 = jax.nn.relu(conv2d(ConvParams(w1, None), img))
        z2 = conv2d(ConvParams(jnp.maximum(w2, 0.), None), a1)
        a2 = jax.nn.relu(conv2d(ConvParams(w2, None), a1))
        p1 = maxpool2x2(a2)
        winner1 = ((a2 == jnp.repeat(jnp.repeat(p1, 2, 1), 2, 2))
                   & (a2 > 0)).astype(jnp.float32)
        z21 = conv2d(ConvParams(jnp.maximum(w21, 0.), None), p1)
        a21 = jax.nn.relu(conv2d(ConvParams(w21, None), p1))
        z22 = conv2d(ConvParams(jnp.maximum(w22, 0.), None), a21)
        a22 = jax.nn.relu(conv2d(ConvParams(w22, None), a21))
        p2 = maxpool2x2(a22)
        winner2 = ((a22 == jnp.repeat(jnp.repeat(p2, 2, 1), 2, 2))
                   & (a22 > 0)).astype(jnp.float32)
        return z1c, a1, z2, winner1, p1, z21, a21, z22, winner2

    z1c, a1, z2, winner1, x21, z21, a21, z22, winner2 = stash(img)

    def timeit(core, *xs):
        out = core(*xs)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(*xs)
        np.asarray(out.ravel()[0])
        return 1000 * (time.perf_counter() - t0) / (I * args.iters), out

    # XLA baseline: the production record walk over the 10-layer spec, with
    # the production bf16 storage and fast pools
    params = VGGParams(convs=(ConvParams(w1, None), ConvParams(w2, None),
                              ConvParams(w21, None), ConvParams(w22, None)))
    spec = (VGGLayer("conv", 0), VGGLayer("relu", None),
            VGGLayer("conv", 1), VGGLayer("relu", None),
            VGGLayer("maxpool", None),
            VGGLayer("conv", 2), VGGLayer("relu", None),
            VGGLayer("conv", 3), VGGLayer("relu", None),
            VGGLayer("maxpool", None))

    @jax.jit
    def xla_core(img, r_pool2):
        def per_image(im, rp_all):
            backward, _ = make_vgg_lrp_backward(
                params, im[None], spec=spec, pool_mode="fast",
                r_dtype=jnp.bfloat16)
            return jax.vmap(lambda r: backward(r[None])[0])(rp_all)
        return jax.vmap(per_image)(img, r_pool2)

    results = {}
    ms, ref = timeit(xla_core, img, r_pool2)
    results["xla_walk_ms_per_image"] = round(ms, 3)
    print(json.dumps({"xla": ms}), flush=True)
    ref = np.asarray(ref)
    scale = np.abs(ref).max()

    for mode in ("bf16", "f32", "bf16x3"):
        @jax.jit
        def k_core(r_pool2, winner2, z22, a21, z21, x21, winner1, z2, a1,
                   z1c, img, mode=mode):
            return block12_lrp_backward(
                r_pool2, winner2, z22, a21, z21, x21, winner1, z2, a1, z1c,
                img, w22, w21, w2, w1, rows_per_tile=args.rows,
                dot_mode=mode)

        ms, out = timeit(k_core, r_pool2, winner2, z22, a21, z21, x21,
                         winner1, z2, a1, z1c, img)
        got = np.asarray(out)
        results[f"pallas_{mode}"] = {
            "ms_per_image": round(ms, 3),
            "max_rel_err_vs_xla": float(np.abs(got - ref).max() / scale),
        }
        print(json.dumps({mode: results[f"pallas_{mode}"]}), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
