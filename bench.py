"""Benchmark harness — prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Headline metric (BASELINE.md north star): captions + full per-word LRP
explanations per second.  Target: >= 50/s on a TPU v5e-8, i.e. 6.25/s/chip;
``vs_baseline`` is measured-throughput / per-chip share of the target.

The measured program is the complete pipeline as ONE XLA computation per
image batch: VGG16 encode -> beam-2 caption decode -> teacher-forced stash
forward -> per-word decoder relevance walk (reverse scan, vmapped over words)
-> CNN alpha-beta/epsilon relevance walk to input pixels.

Usage: python bench.py [--preset smoke|full] [--batch N] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=["smoke", "full"])
    ap.add_argument("--model", default="gridtd", choices=["gridtd", "aoa"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--max-words", type=int, default=0)
    args = ap.parse_args()

    import os

    import jax

    # persistent compilation cache: the full-size program takes ~10 min to
    # compile through the remote helper; cache hits make reruns start in
    # seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    smoke = args.preset == "smoke"
    batch = args.batch or (2 if smoke else 8)
    iters = args.iters or (2 if smoke else 5)
    hw = 64 if smoke else 224
    max_words = args.max_words or (6 if smoke else 16)

    vocab_words = 60 if smoke else 9582
    word_map = build_word_map(
        [[f"w{i}"] for i in range(vocab_words)], min_word_freq=1
    )
    cfg = ModelConfig(
        model_type=args.model, encoder="vgg16",
        embed_dim=64 if smoke else 512, hidden_dim=64 if smoke else 512,
        vocab_size=len(word_map), num_pixels=(hw // 16) ** 2,
        vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    explainer = build_explainer("lrp", cap, params, word_map,
                                max_words=max_words)
    core = explainer.batched_core()

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, hw, hw, 3)).astype(np.float32))

    def sync(out):
        # device->host transfer forces completion (block_until_ready does not
        # synchronize on the remote-tunnel TPU backend)
        return np.asarray(out[1])

    out = core(params, images)  # compile + warmup
    sync(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = core(params, images)
    sync(out)
    dt = time.perf_counter() - t0

    per_sec = batch * iters / dt
    target_per_chip = 50.0 / 8.0  # north-star 50/s on v5e-8
    print(json.dumps({
        "metric": "captions_plus_full_lrp_explanations_per_sec_per_chip",
        "value": round(per_sec, 3),
        "unit": "images/s",
        "vs_baseline": round(per_sec / target_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
