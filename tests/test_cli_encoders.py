"""Per-encoder CLI regression suite (round-2 verdict Weak #1).

The AdaptiveAttention pixel projection is sized by ``cfg.num_pixels``
(models/core.py); the grid geometry differs per encoder (vgg16 stride 16,
resnet50/101 stride 32 — reference ``gridTDmodel.py:33-35`` vs
``resnet.py:232-236`` — and 36 regions for bottom-up).  Round 2 derived it
correctly only in bench.py; these tests pin the single-source derivation
(``config.derive_num_pixels``) and drive every CLI entry point end-to-end at
toy scale for each encoder family.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo-root CLIs

from lrp_imagecaptioning_tpu.config import (  # noqa: E402
    ModelConfig,
    derive_num_pixels,
)


# -- unit: the derivation itself --------------------------------------------

@pytest.mark.parametrize("encoder,h,w,expect", [
    ("vgg16", 224, 224, 196),
    ("vgg16", 64, 64, 16),
    ("resnet50", 224, 224, 49),
    ("resnet101", 224, 224, 49),
    ("resnet50", 64, 64, 4),
    ("bu", 224, 224, 36),
    ("bu", 64, 64, 36),
])
def test_derive_num_pixels(encoder, h, w, expect):
    assert derive_num_pixels(encoder, h, w) == expect


def test_modelconfig_autoderives():
    assert ModelConfig().num_pixels == 196
    assert ModelConfig(encoder="resnet50").num_pixels == 49
    assert ModelConfig(encoder="resnet101", height=448,
                       width=448).num_pixels == 196
    assert ModelConfig(encoder="bu").num_pixels == 36
    # explicit override (toy feature grids) is honored
    assert ModelConfig(num_pixels=16).num_pixels == 16
    with pytest.raises(ValueError):
        ModelConfig(encoder="vgg19")


def test_replace_rederives():
    import dataclasses

    m = ModelConfig(encoder="resnet50")
    assert dataclasses.replace(m, height=64, width=64,
                               num_pixels=None).num_pixels == 4


# -- end-to-end: every CLI x encoder at toy scale ----------------------------

@pytest.mark.parametrize("encoder", ["vgg16", "resnet50", "bu"])
def test_train_cli_toy(encoder, eight_devices, tmp_path):
    import train

    history = train.main([
        "--toy", "--encoder", encoder, "--epochs", "1",
        "--batch-size", "8", "--save-path", str(tmp_path),
    ])
    assert history and np.isfinite(history[-1]["loss"])


@pytest.mark.parametrize("encoder", ["vgg16", "bu"])
def test_test_cli_toy(encoder, eight_devices, tmp_path):
    import test as test_cli

    metrics = test_cli.main([
        "--toy", "--encoder", encoder, "--decode", "greedy",
        "--max-cap-length", "5", "--eval-batch", "4",
        "--save-path", str(tmp_path),
    ])
    assert "cider" in metrics and np.isfinite(metrics["cider"])


@pytest.fixture(scope="module")
def toy_artifacts(tmp_path_factory):
    """A tiny wordmap JSON + 64px JPG for the explain/evaluation CLIs."""
    from PIL import Image

    from lrp_imagecaptioning_tpu.data.vocab import build_word_map

    d = tmp_path_factory.mktemp("cli_toy")
    words = ["dog", "cat", "a", "sits"] + [f"w{i}" for i in range(8)]
    wm = build_word_map([words], min_word_freq=1)
    wm_path = d / "wordmap.json"
    wm.save(str(wm_path))
    rng = np.random.default_rng(0)
    img_path = d / "toy0.jpg"
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_path)
    return str(wm_path), str(img_path), wm


@pytest.mark.parametrize("encoder", ["vgg16", "resnet50"])
def test_explain_cli(encoder, eight_devices, toy_artifacts, tmp_path):
    import explain

    wm_path, img_path, _ = toy_artifacts
    explain.main([
        "--image", img_path, "--wordmap", wm_path,
        "--model-type", "gridtd", "--encoder", encoder,
        "--embed-dim", "16", "--hidden-dim", "24",
        "--height", "64", "--width", "64", "--max-words", "4",
        "--explainers", "lrp", "--save-path", str(tmp_path),
    ])
    out = tmp_path / "toy0"
    assert (out / "lrp_linguistic_explanation.yaml").exists()


@pytest.mark.parametrize("encoder", ["vgg16", "resnet50"])
def test_evaluation_cli(encoder, eight_devices, toy_artifacts, tmp_path):
    import evaluation

    wm_path, img_path, wm = toy_artifacts
    cap = [wm.start, wm["dog"], wm["sits"], wm.end, 0]
    items = [{"image_path": img_path, "encoded_all_caps": [cap]}]
    test_json = tmp_path / "items.json"
    test_json.write_text(json.dumps(items))
    entities = {"toy0.jpg": {
        "categories": {"dog": "7"}, "bbox": {"7": [[0, 0, 32, 32]]},
        "shape": (64, 64), "resize_ratio": (1.0, 1.0),
    }}
    ent_json = tmp_path / "entities.json"
    ent_json.write_text(json.dumps(entities))
    evaluation.main([
        "--wordmap", wm_path, "--test-json", str(test_json),
        "--entities", str(ent_json),
        "--model-type", "gridtd", "--encoder", encoder,
        "--embed-dim", "16", "--hidden-dim", "24",
        "--height", "64", "--width", "64", "--max-words", "4",
        "--explainer", "lrp", "--experiments", "bbox",
        "--save-path", str(tmp_path / "out"),
    ])
    out = tmp_path / "out" / "bbox" / "lrp"
    assert list(out.iterdir())


def test_evaluation_cli_bu(eight_devices, toy_artifacts, tmp_path):
    """--encoder bu at the evaluation CLI (round-2 verdict: the hardcoded
    num_pixels=196 also broke the bu flag, which needs 36).  BU items carry
    region-feature arrays; the tpfp experiment needs no image geometry."""
    import evaluation

    wm_path, _, wm = toy_artifacts
    rng = np.random.default_rng(0)
    cap = [wm.start, wm["dog"], wm["sits"], wm.end, 0]
    items = [{"image_path": "bu0.jpg",
              "image_array": rng.normal(size=(36, 2048)).astype(
                  np.float32).tolist(),
              "encoded_all_caps": [cap]}]
    test_json = tmp_path / "items.json"
    test_json.write_text(json.dumps(items))
    evaluation.main([
        "--wordmap", wm_path, "--test-json", str(test_json),
        "--model-type", "gridtd", "--encoder", "bu",
        "--embed-dim", "16", "--hidden-dim", "24", "--max-words", "4",
        "--explainer", "lrp", "--experiments", "tpfp",
        "--save-path", str(tmp_path / "out"),
    ])
    out = tmp_path / "out" / "tpfp" / "lrp"
    assert list(out.iterdir())
