"""All four gradient-family explainer drivers end-to-end on a small model."""

import jax
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.data.vocab import build_word_map
from lrp_imagecaptioning_tpu.explain.explainer import (
    GridTDGradCamExplainer,
    GridTDGradientExplainer,
    GridTDGuidedGradCamExplainer,
    GridTDGuidedGradientExplainer,
    GridTDLrpExplainer,
)
from lrp_imagecaptioning_tpu.models.captioner import Captioner


@pytest.fixture(scope="module")
def setup():
    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(
        model_type="gridtd", encoder="vgg16", embed_dim=16, hidden_dim=24,
        vocab_size=len(wm), num_pixels=16,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    image = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    return cap, params, wm, image


@pytest.mark.parametrize("cls,img_shape", [
    (GridTDGradientExplainer, (64, 64, 3)),
    (GridTDGuidedGradientExplainer, (64, 64, 3)),
    (GridTDGradCamExplainer, (16,)),  # CAM over the 4x4 grid
    (GridTDGuidedGradCamExplainer, (64, 64, 3)),
])
def test_explainer_family(setup, cls, img_shape):
    cap, params, wm, image = setup
    exp = cls(cap, params, wm, max_words=6).explain_caption_arrays(image)
    t = len(exp.caption)
    assert t >= 1
    assert exp.relevance_images.shape == (t,) + img_shape
    assert np.isfinite(exp.relevance_images).all()
    assert np.abs(exp.relevance_images).sum() > 0
    assert exp.relevance_words.shape[0] == t


def test_families_differ(setup):
    cap, params, wm, image = setup
    lrp = GridTDLrpExplainer(cap, params, wm, max_words=6)
    grad = GridTDGradientExplainer(cap, params, wm, max_words=6)
    a = lrp.explain_caption_arrays(image)
    b = grad.explain_caption_arrays(image)
    assert a.caption == b.caption  # same beam decode
    assert not np.allclose(a.relevance_images, b.relevance_images)
