"""End-to-end LRP explainer: one jitted program per caption on a small
GridTD+VGG model."""

import jax
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.data.vocab import build_word_map
from lrp_imagecaptioning_tpu.explain.explainer import GridTDLrpExplainer
from lrp_imagecaptioning_tpu.models.captioner import Captioner


@pytest.fixture(scope="module")
def setup():
    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(
        model_type="gridtd", encoder="vgg16", embed_dim=16, hidden_dim=24,
        vocab_size=len(wm), num_pixels=16,  # 64x64 input -> 4x4 grid
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    return cap, params, wm


def test_explain_caption_arrays(setup):
    cap, params, wm = setup
    explainer = GridTDLrpExplainer(cap, params, wm, max_words=8)
    rng = np.random.default_rng(0)
    image = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    exp = explainer.explain_caption_arrays(image)
    t = len(exp.caption)
    assert t >= 1
    assert exp.relevance_images.shape == (t, 64, 64, 3)
    assert exp.relevance_words.shape[0] == t
    assert np.isfinite(exp.relevance_images).all()
    assert np.abs(exp.relevance_images).sum() > 0
    # each explained word's linguistic relevance is max-abs-normalized
    for i in range(t):
        assert np.max(np.abs(exp.relevance_words[i])) <= 1.0 + 1e-5


def test_bu_explainer_no_cnn(setup):
    _, _, wm = setup
    cfg = ModelConfig(
        model_type="gridtd", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, vocab_size=len(wm),
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(1))
    explainer = GridTDLrpExplainer(cap, params, wm, max_words=6)
    rng = np.random.default_rng(1)
    regions = rng.normal(size=(1, 8, 12)).astype(np.float32)
    exp = explainer.explain_caption_arrays(regions)
    t = len(exp.caption)
    assert exp.relevance_images.shape == (t, 8, 12)  # region relevance
    assert np.isfinite(exp.relevance_images).all()
