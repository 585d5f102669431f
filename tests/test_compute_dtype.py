"""ModelConfig.compute_dtype: bfloat16 CNN forward (training-path speed knob).

float32 (default) must be bit-identical to the old behavior; bfloat16 runs
the conv stack at MXU rate and returns float32 features close to the f32
reference. Relevance paths are unaffected (they build their own f32 stash).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.models.captioner import Captioner


def _setup(compute_dtype):
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, vocab_size=30, num_pixels=16,
                      compute_dtype=compute_dtype)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    return cap, params


def test_bfloat16_encode_close_to_f32():
    cap32, params = _setup("float32")
    cap16, _ = _setup("bfloat16")
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    f32 = cap32.encode(params, images)
    bf16 = cap16.encode(params, images)
    for a, b in zip(jax.tree_util.tree_leaves(f32),
                    jax.tree_util.tree_leaves(bf16)):
        assert a.dtype == b.dtype == jnp.float32  # outputs stay f32
        denom = np.abs(np.asarray(a)).mean() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).mean() / denom < 0.05


def test_bfloat16_xe_step_trains():
    from lrp_imagecaptioning_tpu.config import ExperimentConfig, TrainConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.engine.train import Trainer

    wm = build_word_map([[f"w{i}"] for i in range(10)], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=8,
                      hidden_dim=12, vocab_size=len(wm), num_pixels=16,
                      compute_dtype="bfloat16")
    tr = Trainer(ExperimentConfig(model=cfg, train=TrainConfig(batch_size=8)),
                 wm)
    state = tr.init_state(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
    caps = jnp.tile(jnp.asarray([[wm.start, 1, 2, 3, wm.end, 0]], jnp.int32),
                    (8, 1))
    state2, loss, acc = tr.compiled_xe_step()(
        state, images, caps, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(loss))
