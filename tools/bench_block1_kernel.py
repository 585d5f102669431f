"""On-chip benchmark of the fused block-1 LRP backward Pallas kernel vs the
XLA record-walk it replaces, at the production operating point (8 images x
8-word chunks, 224^2, C1=64).

Prints ms/image for: XLA bottom stage (pool1+conv1_2+conv1_1 backward via the
fast-pool records), the Pallas kernel (bf16x3 and f32 dot modes), and the
numeric deltas between them.
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

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.models.encoders import (
        ConvParams, conv2d, maxpool2x2)
    from lrp_imagecaptioning_tpu.ops.pallas_block1 import block1_lrp_backward

    I, T, H = args.imgs, args.words, args.hw
    C1, Cin = 64, 3
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(3, 3, Cin, C1)).astype(np.float32) * .2)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C1, C1)).astype(np.float32) * .05)
    img = jnp.asarray(rng.normal(size=(I, H, H, Cin)).astype(np.float32))
    r_pool = jnp.asarray(
        rng.normal(size=(I, T, H // 2, H // 2, C1)).astype(np.float32))

    w1p = ConvParams(jnp.maximum(w1, 0.), None)
    w1n = ConvParams(jnp.minimum(w1, 0.), None)
    w2p = ConvParams(jnp.maximum(w2, 0.), None)

    @jax.jit
    def stash(img):
        def one(im):
            z1c = (conv2d(w1p, jnp.maximum(im, 0.)[None])[0]
                   + conv2d(w1n, jnp.minimum(im, 0.)[None])[0])
            a1 = jax.nn.relu(conv2d(ConvParams(w1, None), im[None])[0])
            z2 = conv2d(w2p, a1[None])[0]
            a2 = jax.nn.relu(conv2d(ConvParams(w2, None), a1[None])[0])
            p = maxpool2x2(a2[None])[0]
            winner = ((a2 == jnp.repeat(jnp.repeat(p, 2, 0), 2, 1))
                      & (a2 > 0)).astype(jnp.float32)
            return winner, z2, a1, z1c
        return jax.vmap(one)(img)

    winner, z2, a1, z1c = stash(img)

    def timeit(core, *xs):
        out = core(*xs)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(*xs)
        np.asarray(out.ravel()[0])
        return 1000 * (time.perf_counter() - t0) / (I * args.iters), out

    # XLA bottom stage (records walk, fast pool)
    z_eps = 1e-7

    @jax.jit
    def xla_core(r_pool, winner, z2, a1, z1c, img):
        def per_image(rp_all, wn, z2x, a1x, z1x, im):
            def per_word(rp):
                r_a2 = wn * jnp.repeat(jnp.repeat(rp, 2, 0), 2, 1)
                t2 = r_a2 / (z2x + z_eps * (z2x == 0))
                _, vjp2 = jax.vjp(lambda xx: conv2d(w2p, xx[None])[0], a1x)
                (g2,) = vjp2(t2)
                t1 = (a1x * g2) / (z1x + z_eps * (z1x == 0))

                def clamped(xx):
                    return (conv2d(w1p, jnp.maximum(xx, 0.)[None])[0]
                            + conv2d(w1n, jnp.minimum(xx, 0.)[None])[0])

                _, vjp1 = jax.vjp(clamped, im)
                (g1,) = vjp1(t1)
                return im * g1
            return jax.vmap(per_word)(rp_all)
        return jax.vmap(per_image)(r_pool, winner, z2, a1, z1c, img)

    results = {}
    ms, ref = timeit(xla_core, r_pool, winner, z2, a1, z1c, img)
    results["xla_bottom_stage_ms_per_image"] = round(ms, 3)
    print(json.dumps({"xla": results["xla_bottom_stage_ms_per_image"]}),
          flush=True)
    ref = np.asarray(ref)
    scale = np.abs(ref).max()

    for mode in ("bf16x3", "f32", "bf16"):
        @jax.jit
        def pallas_core(r_pool, winner, z2, a1, z1c, img, mode=mode):
            return block1_lrp_backward(
                r_pool, winner, z2, a1, z1c, img, w2, w1,
                rows_per_tile=args.rows, dot_mode=mode)

        ms, out = timeit(pallas_core, r_pool, winner, z2, a1, z1c, img)
        got = np.asarray(out)
        results[f"pallas_{mode}"] = {
            "ms_per_image": round(ms, 3),
            "max_rel_err_vs_xla": float(np.abs(got - ref).max() / scale),
        }
        print(json.dumps({mode: results[f"pallas_{mode}"]}), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
