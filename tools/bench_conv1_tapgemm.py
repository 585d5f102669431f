#!/usr/bin/env python
"""Probe: reformulating the conv1_1 clamped backward as ONE tap-unrolled GEMM.

Motivation (roofline artifact, output/roofline_cnn_walk.json): block1 is half
the CNN LRP walk at only 8% MXU / 20% HBM.  Its conv1_1 stage backward is two
64->3-channel transposed convolutions (the clamped two-branch vjp,
explain/cnn_lrp.py:conv records for spec[0]); with N=3 output channels the
MXU pads lanes 3->128, executing ~42x the useful FLOPs per branch.

The reformulation: a 3x3 transposed conv is 9 shifted 1x1 convs.  Packing all
9 taps AND both +/- weight branches into the GEMM's N dimension gives ONE
[M,64]@[64,54] dot (54 <= one 128-lane MXU tile, so the padding waste drops
from ~42x per branch to ~2.4x total), followed by 9 spatially-shifted adds
(cheap) and the elementwise image gating.

Three forms measured per word-chunk at production shapes/dtypes (8 images x
8-word chunks, 224^2, bf16 storage as in the TPU walk):

  current  — jax.vjp of the clamped two-branch forward (two conv_transposes)
  tap_nhwc — contrib (H,W,54) channels-last, lane-block slices per tap
  tap_planar — contrib (54,H,W) channel-planar: tap/channel slices are on the
               leading (free) axis, shifts ride full lanes

All forms compute  r_in = max(img,0)*g+ + min(img,0)*g-  from the SAME
(r, z1inv, img) inputs and are MAE-checked against each other.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tap_weights(w):
    """w: (3,3,Cin=3,Cout=64) forward kernel -> Wt (64, 54) with
    Wt[k, 6t+c] = max(w,0)[dy,dx,c,k] (c<3) / min(w,0)[dy,dx,c-3,k] (c>=3),
    taps t = 3*dy+dx."""
    import jax.numpy as jnp

    wpos = jnp.maximum(w, 0.0)
    wneg = jnp.minimum(w, 0.0)
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(wpos[dy, dx].T)  # (64, 3)
            cols.append(wneg[dy, dx].T)
    return jnp.concatenate(cols, axis=1).astype(jnp.float32)  # (64, 54)


TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--imgs", type=int, default=8)
    ap.add_argument("--words", type=int, default=8)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--f32", action="store_true",
                    help="f32 storage instead of the production bf16")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.explain.rules import Z_EPSILON
    from lrp_imagecaptioning_tpu.models.encoders import ConvParams, conv2d

    I, Wd, H = args.imgs, args.words, args.hw
    sdt = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)

    w = jnp.asarray(rng.normal(size=(3, 3, 3, 64)).astype(np.float32) * 0.05)
    wpos = ConvParams(jnp.maximum(w, 0.0), None)
    wneg = ConvParams(jnp.minimum(w, 0.0), None)
    Wt = build_tap_weights(w)

    img = jnp.asarray(rng.normal(size=(I, 1, H, H, 3)).astype(np.float32))
    # per-image stash: z1inv from the clamped forward (as the records stash)
    def clamped_fwd(xx):
        return conv2d(wpos, jnp.maximum(xx, 0.0)) + conv2d(
            wneg, jnp.minimum(xx, 0.0))

    z = jax.jit(jax.vmap(clamped_fwd))(img)
    z1inv = (1.0 / (z + Z_EPSILON * (z == 0))).astype(sdt)
    img_s = img.astype(sdt)
    r = jnp.asarray(
        rng.normal(size=(I, Wd, 1, H, H, 64)).astype(np.float32)).astype(sdt)

    def s_of(rw, zi):
        return rw.astype(jnp.float32) * zi.astype(jnp.float32)

    @jax.jit
    def current(r, z1inv, img_s):
        def per_image(r1, zi, im):
            imf = im.astype(jnp.float32)
            _, vjp = jax.vjp(clamped_fwd, imf)

            def per_word(rw):
                (g,) = vjp(s_of(rw, zi))
                return imf * g

            return jax.vmap(per_word)(r1)

        return jax.vmap(per_image)(r, z1inv, img_s)

    @jax.jit
    def tap_nhwc(r, z1inv, img_s):
        def per_image(r1, zi, im):
            imf = im.astype(jnp.float32)
            imp, imn = jnp.maximum(imf, 0.0), jnp.minimum(imf, 0.0)

            def per_word(rw):
                s = s_of(rw, zi)[0]  # (H, W, 64)
                contrib = jnp.einsum(
                    "hwk,kn->hwn", s, Wt,
                    preferred_element_type=jnp.float32)  # (H, W, 54)
                cp = jnp.pad(contrib, ((1, 1), (1, 1), (0, 0)))
                gp = 0.0
                gn = 0.0
                for t, (dy, dx) in enumerate(TAPS):
                    sl = cp[2 - dy:2 - dy + H, 2 - dx:2 - dx + H]
                    gp = gp + sl[:, :, 6 * t:6 * t + 3]
                    gn = gn + sl[:, :, 6 * t + 3:6 * t + 6]
                return (imp[0] * gp + imn[0] * gn)[None]

            return jax.vmap(per_word)(r1)

        return jax.vmap(per_image)(r, z1inv, img_s)

    @jax.jit
    def tap_planar(r, z1inv, img_s):
        def per_image(r1, zi, im):
            imf = im.astype(jnp.float32)
            # (3, H, W) planar gates
            imp = jnp.maximum(imf, 0.0)[0].transpose(2, 0, 1)
            imn = jnp.minimum(imf, 0.0)[0].transpose(2, 0, 1)

            def per_word(rw):
                s = s_of(rw, zi)[0]  # (H, W, 64)
                contrib = jnp.einsum(
                    "hwk,kn->nhw", s, Wt,
                    preferred_element_type=jnp.float32)  # (54, H, W)
                cp = jnp.pad(contrib, ((0, 0), (1, 1), (1, 1)))
                gp = 0.0
                gn = 0.0
                for t, (dy, dx) in enumerate(TAPS):
                    blk = cp[6 * t:6 * t + 6,
                             2 - dy:2 - dy + H, 2 - dx:2 - dx + H]
                    gp = gp + blk[:3]
                    gn = gn + blk[3:]
                out = imp * gp + imn * gn  # (3, H, W)
                return out.transpose(1, 2, 0)[None]

            return jax.vmap(per_word)(r1)

        return jax.vmap(per_image)(r, z1inv, img_s)

    def timeit(core):
        out = core(r, z1inv, img_s)
        np.asarray(out.ravel()[0])  # compile + sync (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(r, z1inv, img_s)
        np.asarray(out.ravel()[0])
        dt = time.perf_counter() - t0
        return 1000 * dt / (I * args.iters), out

    results = {}
    ref_out = None
    for name, core in [("current", current), ("tap_nhwc", tap_nhwc),
                       ("tap_planar", tap_planar)]:
        ms, out = timeit(core)
        if ref_out is None:
            ref_out = np.asarray(out, np.float32)
            mae = 0.0
        else:
            o = np.asarray(out, np.float32)
            mae = float(np.abs(o - ref_out).mean())
        results[name] = {"ms_per_image_chunk": round(ms, 3),
                         "mae_vs_current": mae}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
