"""Benchmark harness — prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Headline metric (BASELINE.md north star): captions + full per-word LRP
explanations per second on TPU, target >= 50/s on a v5e-8 (i.e. 6.25/s/chip).
Until the LRP engine lands (build plan SURVEY.md §7.6) this measures greedy
caption decoding throughput on the flagship GridTD+VGG16 model; the metric
name states exactly what was measured.

Usage: python bench.py [--preset smoke|full] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="full", choices=["smoke", "full"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--max-cap-length", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    smoke = args.preset == "smoke"
    batch = args.batch or (8 if smoke else 64)
    iters = args.iters or (2 if smoke else 10)
    hw = 64 if smoke else 224

    vocab_words = 200 if smoke else 9582
    word_map = build_word_map(
        [[f"w{i}"] for i in range(vocab_words)], min_word_freq=1
    )
    cfg = ModelConfig(
        model_type="gridtd", encoder="vgg16",
        embed_dim=64 if smoke else 512, hidden_dim=64 if smoke else 512,
        vocab_size=len(word_map), num_pixels=(hw // 16) ** 2,
        vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, hw, hw, 3)).astype(np.float32))

    @jax.jit
    def caption_batch(params, images):
        feats = cap.encode(params, images)
        return cap.greedy(params, feats, word_map,
                          max_cap_length=args.max_cap_length)

    def sync(x):
        # NOTE: on the remote-tunnel TPU backend block_until_ready does not
        # actually synchronize; a device->host transfer does.
        return np.asarray(x)

    # warmup/compile
    res = caption_batch(params, images)
    sync(res.tokens)

    t0 = time.perf_counter()
    for _ in range(iters):
        res = caption_batch(params, images)
    sync(res.tokens)
    dt = time.perf_counter() - t0

    captions_per_sec = batch * iters / dt
    target_per_chip = 50.0 / 8.0  # north-star 50/s on v5e-8
    print(json.dumps({
        "metric": "greedy_captions_per_sec_per_chip_gridtd_vgg16",
        "value": round(captions_per_sec, 3),
        "unit": "captions/s",
        "vs_baseline": round(captions_per_sec / target_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
