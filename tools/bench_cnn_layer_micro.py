"""Micro-timing of individual CNN-backward records at the production shapes
(batch 8 images x 8-word chunks), to explain the depth-sweep anomaly:
block2 (112^2 x 128ch) costs ~5 ms/image while block1 (224^2) costs 1.2 and
block3 (56^2 x 256, more FLOPs) costs 1.5.

Each case times  r_in = x * vjp(conv_w+)(r / z)  for one conv layer, or the
fast-pool elementwise backward, standalone.
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
    ap.add_argument("--words", type=int, default=8)  # one chunk
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.explain.rules import safe_divide
    from lrp_imagecaptioning_tpu.models.encoders import ConvParams, conv2d

    I, W = args.imgs, args.words
    rng = np.random.default_rng(0)

    cases = {
        # name: (H, C_in, C_out)
        "conv1_1_3to64@224": (224, 3, 64),
        "conv1_2_64to64@224": (224, 64, 64),
        "conv2_1_64to128@112": (112, 64, 128),
        "conv2_2_128to128@112": (112, 128, 128),
        "conv3_256to256@56": (56, 256, 256),
        "conv4_512to512@28": (28, 512, 512),
    }
    results = {}

    def timeit(core, *xs):
        out = core(*xs)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(*xs)
        np.asarray(out.ravel()[0])
        dt = time.perf_counter() - t0
        return 1000 * dt / (I * args.iters)  # ms per image (one 8-word chunk)

    for name, (H, cin, cout) in cases.items():
        w = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05)
        p = ConvParams(jnp.maximum(w, 0.0), None)
        x = jnp.asarray(
            np.abs(rng.normal(size=(I, 1, H, H, cin))).astype(np.float32))
        r = jnp.asarray(
            rng.normal(size=(I, W, 1, H, H, cout)).astype(np.float32))

        @jax.jit
        def core(x, r, p=p):
            def per_image(x1, r1):
                z, vjp = jax.vjp(lambda xx: conv2d(p, xx), x1)

                def per_word(rw):
                    (g,) = vjp(safe_divide(rw, z))
                    return x1 * g

                return jax.vmap(per_word)(r1)

            return jax.vmap(per_image)(x, r)

        results[name] = round(timeit(core, x, r), 3)
        print(json.dumps({name: results[name]}), flush=True)

    # fast-pool backward at pool1 shapes: W(224,64) * up(r(112,64))
    Wm = jnp.asarray(
        (rng.random(size=(I, 1, 224, 224, 64)) > 0.75).astype(np.float32))
    rp = jnp.asarray(
        rng.normal(size=(I, W, 1, 112, 112, 64)).astype(np.float32))

    @jax.jit
    def pool_core(Wm, rp):
        def per_image(w1, r1):
            def per_word(rw):
                return w1 * jnp.repeat(jnp.repeat(rw, 2, axis=1), 2, axis=2)
            return jax.vmap(per_word)(r1)
        return jax.vmap(per_image)(Wm, rp)

    results["pool1_fast@224x64"] = round(timeit(pool_core, Wm, rp), 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
