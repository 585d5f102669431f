"""Data-parallel explanation over the 8-device mesh == single-device."""

import jax
import numpy as np

from lrp_imagecaptioning_tpu.config import MeshConfig, ModelConfig
from lrp_imagecaptioning_tpu.data.vocab import build_word_map
from lrp_imagecaptioning_tpu.explain.explainer import GridTDLrpExplainer
from lrp_imagecaptioning_tpu.models.captioner import Captioner
from lrp_imagecaptioning_tpu.parallel import build_mesh


def test_sharded_explanation_matches_single(eight_devices):
    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, vocab_size=len(wm), num_pixels=16)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    expl = GridTDLrpExplainer(cap, params, wm, max_words=6, cnn_word_chunk=0)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)

    single = expl.batched_core()(params, images)
    mesh = build_mesh(MeshConfig(data_parallel=8), eight_devices)
    sharded = expl.batched_core_sharded(mesh)(params, images)

    for s, g in zip(jax.tree_util.tree_leaves(single),
                    jax.tree_util.tree_leaves(sharded)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(g),
                                   rtol=1e-4, atol=1e-5)
