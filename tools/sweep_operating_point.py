"""Sweep the headline bench operating point (batch, cnn_word_chunk) on the
real chip.  The round-2 sweep (CLAUDE.md) found batch 8 / chunk 8 optimal
with the vjp pool backward; the fast-pool path changes the balance, so
re-tune whenever the CNN walk changes.

Usage: python tools/sweep_operating_point.py [--points "8:8,8:16,16:8,..."]
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
    ap.add_argument("--points", default="8:8,8:16,16:8,16:16,12:8,8:4")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--max-words", type=int, default=16)
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    hw = 224
    word_map = build_word_map([[f"w{i}"] for i in range(9582)],
                              min_word_freq=1)
    cfg = ModelConfig(
        model_type="gridtd", encoder="vgg16", embed_dim=512, hidden_dim=512,
        vocab_size=len(word_map), num_pixels=(hw // 16) ** 2,
        vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    results = {}
    for pt in args.points.split(","):
        batch, chunk = (int(v) for v in pt.split(":"))
        explainer = build_explainer(
            "lrp", cap, params, word_map, max_words=args.max_words,
            cnn_word_chunk=chunk)
        core = explainer.batched_core()
        images = jnp.asarray(
            rng.normal(size=(batch, hw, hw, 3)).astype(np.float32))
        np.asarray(core(params, images)[1][0])  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = core(params, images)
        np.asarray(out[1][0])
        rate = batch * args.iters / (time.perf_counter() - t0)
        results[pt] = round(rate, 2)
        print(json.dumps({pt: results[pt]}), flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"best": best, "images_per_sec": results[best],
                      "all": results}))


if __name__ == "__main__":
    main()
