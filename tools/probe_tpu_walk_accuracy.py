"""Measure the REAL accuracy of the TPU CNN relevance walk against the CPU
f32 walk (same code, same inputs, both backends in one process).

Motivation: this backend's f32 convs execute as a single bf16 MXU pass
(proved by the block-1 Pallas kernel — a plain-bf16 dot reproduces XLA conv
results bit-exactly), so the TPU walk does NOT satisfy the CPU-side
MAE<=1e-4 parity guarantee regardless of any precision knob.  This tool
quantifies it, for both f32 and bfloat16 relevance-map storage.

Measured on 1xv5e (224^2, random weights/seed, CPU scale ~0.15):
  f32 storage:  mae 1.5e-05, max-rel 7.1e-03
  bf16 storage: adds error of the same order (max-rel ~9e-4 vs the TPU f32
  walk) — see CLAUDE.md performance notes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    rng = np.random.default_rng(0)
    params = init_vgg16(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(1, 14, 14, 512)).astype(np.float32))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_c = jax.device_put(params, cpu)
        cpu_out = np.asarray(jax.jit(
            lambda i, s: make_vgg_lrp_backward(params_c, i)[0](s)
        )(jax.device_put(img, cpu), jax.device_put(seed, cpu)))
    scale = float(np.abs(cpu_out).max())

    results = {"backend": jax.default_backend(), "cpu_scale": scale}
    for name, dt in (("f32_storage", jnp.float32),
                     ("bf16_storage", jnp.bfloat16)):
        out = np.asarray(jax.jit(
            lambda i, s, dt=dt: make_vgg_lrp_backward(
                params, i, r_dtype=dt)[0](s))(img, seed))
        diff = np.abs(out - cpu_out)
        results[name] = {"mae": float(diff.mean()),
                         "max_rel": float(diff.max() / scale)}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
