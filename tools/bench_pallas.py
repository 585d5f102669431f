#!/usr/bin/env python
"""Decide the Pallas epsilon-rule kernel's fate with data (VERDICT r1 #8).

Times ``ops.pallas_kernels.lrp_linear_eps_pallas`` against the XLA-fused
``ops.relevance.lrp_linear_eps`` on the real fc-seed shapes of the per-word
decoder relevance walk:

- fc seed, one image:   B = max_words (16),        OUT = padded vocab 9728, IN = 512
- fc seed, full batch:  B = batch(8) x words(16),  OUT = 9728,              IN = 512
- LSTM gate block:      B = 128,                   OUT = 512,               IN = 1536

Prints one JSON line per shape with both times and the speedup.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.ops.pallas_kernels import lrp_linear_eps_pallas
    from lrp_imagecaptioning_tpu.ops.relevance import lrp_linear_eps

    # batched XLA path: vmap the row-rule over B
    @jax.jit
    def xla_batched(r, x, z, w):
        return jax.vmap(lambda rr, xx, zz: lrp_linear_eps(rr, xx, zz, w))(
            r, x, z)

    shapes = [
        ("fc_seed_1img", 16, 9728, 512),
        ("fc_seed_batch8", 128, 9728, 512),
        ("lstm_gate_block", 128, 512, 1536),
    ]
    rng = np.random.default_rng(0)
    for name, B, OUT, IN in shapes:
        r = jnp.asarray(rng.normal(size=(B, OUT)).astype(np.float32))
        z = jnp.asarray(rng.normal(size=(B, OUT)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(B, IN)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(OUT, IN)).astype(np.float32))

        def timed(fn, iters=50):
            out = fn(r, x, z, w)
            np.asarray(out)  # sync (block_until_ready no-op on axon)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(r, x, z, w)
            np.asarray(out)
            return (time.perf_counter() - t0) / iters

        t_xla = timed(xla_batched)
        t_pl = timed(lrp_linear_eps_pallas)
        # numerics cross-check
        a = np.asarray(xla_batched(r, x, z, w))
        b = np.asarray(lrp_linear_eps_pallas(r, x, z, w))
        mae = float(np.abs(a - b).mean())
        print(json.dumps({
            "shape": name, "B": B, "OUT": OUT, "IN": IN,
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pl * 1e6, 1),
            "speedup_pallas_over_xla": round(t_xla / t_pl, 3),
            "mae": mae,
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
