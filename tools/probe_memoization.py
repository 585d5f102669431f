"""Probe whether the axon remote helper memoizes repeated identical
executions (same program + same inputs), which would inflate any benchmark
that re-times the same call.

Times the production explanation core two ways:
- ``same``: N calls with ONE input batch (the bench.py pattern)
- ``distinct``: N calls cycling over N pre-uploaded distinct input batches

Both sync by transferring one scalar leaf after the loop.  A large gap
(same >> distinct) proves memoization; near-equal rates validate bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    batch, iters, hw, max_words = 8, 5, 224, 16
    word_map = build_word_map([[f"w{i}"] for i in range(9582)],
                              min_word_freq=1)
    cfg = ModelConfig(
        model_type="gridtd", encoder="vgg16", embed_dim=512, hidden_dim=512,
        vocab_size=len(word_map), num_pixels=(hw // 16) ** 2,
        vocab_pad_multiple=128,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    explainer = build_explainer("lrp", cap, params, word_map,
                                max_words=max_words)
    core = explainer.batched_core()

    rng = np.random.default_rng(0)

    def scalar_sync(out):
        return np.asarray(out[1][0])  # one int32 leaf

    batches = [
        jnp.asarray(rng.normal(size=(batch, hw, hw, 3)).astype(np.float32))
        for _ in range(iters)
    ]
    for b in batches:
        np.asarray(b[0, 0, 0, 0])  # force uploads before timing

    scalar_sync(core(params, batches[0]))  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        out = core(params, batches[0])
    scalar_sync(out)
    t_same = time.perf_counter() - t0

    scalar_sync(core(params, batches[1]))  # ensure no first-call skew
    t0 = time.perf_counter()
    for b in batches:
        out = core(params, b)
    scalar_sync(out)
    t_distinct = time.perf_counter() - t0

    n = batch * iters
    print(json.dumps({
        "same_inputs_images_per_sec": round(n / t_same, 2),
        "distinct_inputs_images_per_sec": round(n / t_distinct, 2),
        "ratio_same_over_distinct": round(t_distinct / t_same, 2),
    }))


if __name__ == "__main__":
    main()
