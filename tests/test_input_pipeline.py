"""Quantized host->device input pipeline: uint8 images normalized on device
(CaptionDataset(uint8_images=True) + models.captioner.prepare_visual) and the
bfloat16 upload dtype (TrainConfig.upload_dtype) must reproduce the default
float32 host-normalized path.

Motivation (measured, tools/bench_train_step.py on 1x v5e through the axon
tunnel): a batch-32 224^2 f32 image upload is 19.3 MB / ~1.0 s while the
device-resident XE step is 46 ms — the epoch loop is input-feed-bound 20:1,
and uint8 (4x) / bf16 (2x) transfer cuts are the lever.  The reference
normalizes on host inside torchvision transforms (train.py:21-22)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import (
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from lrp_imagecaptioning_tpu.data.dataset import (
    CaptionDataset,
    load_image,
    normalize_image,
    toy_dataset,
)
from lrp_imagecaptioning_tpu.engine.train import Trainer
from lrp_imagecaptioning_tpu.models.captioner import Captioner, prepare_visual
from lrp_imagecaptioning_tpu.parallel import build_mesh


def _single_device_trainer(exp, wm):
    mesh = build_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    return Trainer(exp, wm, mesh=mesh)


def test_prepare_visual_uint8_matches_host_normalize():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    dev = np.asarray(jax.jit(prepare_visual)(jnp.asarray(u8)))
    host = normalize_image(u8)
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_prepare_visual_passthrough_and_bf16_upcast():
    f32 = np.random.default_rng(1).normal(size=(1, 8, 8, 3)).astype(np.float32)
    out = prepare_visual(jnp.asarray(f32))
    np.testing.assert_array_equal(np.asarray(out), f32)
    bf = jnp.asarray(f32.astype(jnp.bfloat16))
    up = prepare_visual(bf)
    assert up.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(up), f32, atol=2e-2, rtol=2e-2)


def test_load_image_uint8_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    raw = load_image(p, 10, 12, normalize=False)
    assert raw.dtype == np.uint8
    np.testing.assert_allclose(load_image(p, 10, 12), normalize_image(raw),
                               atol=0)


def test_caption_dataset_uint8_mode(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    items = []
    for i in range(4):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(arr).save(p)
        items.append({
            "image_path": p,
            "encoded_cap": [2, 1, 3] + [0] * 5,
            "encoded_all_caps": [[2, 1, 3] + [0] * 5],
            "caption_len": 3,
        })
    ds_u8 = CaptionDataset(items, "train", height=16, width=16,
                           uint8_images=True)
    ds_f32 = CaptionDataset(items, "train", height=16, width=16)
    b_u8 = next(ds_u8.train_batches(4, shuffle=False))
    b_f32 = next(ds_f32.train_batches(4, shuffle=False))
    assert b_u8.images.dtype == np.uint8
    np.testing.assert_allclose(normalize_image(b_u8.images), b_f32.images,
                               atol=0)


def test_explainer_uint8_matches_f32():
    """The explain core accepts uint8 and reproduces the f32 path exactly
    (device normalization == host normalization on CPU)."""
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain.explainer import GridTDLrpExplainer

    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, vocab_size=len(wm), num_pixels=16)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    explainer = GridTDLrpExplainer(cap, params, wm, max_words=6)
    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    exp_u8 = explainer.explain_caption_arrays(u8)
    exp_f32 = explainer.explain_caption_arrays(normalize_image(u8))
    assert exp_u8.caption == exp_f32.caption
    np.testing.assert_allclose(exp_u8.relevance_images,
                               exp_f32.relevance_images, atol=1e-5)


def _cnn_exp(word_map, **train_kw):
    model = ModelConfig(
        model_type="gridtd", encoder="vgg16", embed_dim=16, hidden_dim=24,
        height=32, width=32, vocab_size=len(word_map), vocab_pad_multiple=8,
    )
    return ExperimentConfig(model=model,
                            train=TrainConfig(batch_size=4, ss_prob=None,
                                              **train_kw),
                            mesh=MeshConfig(data_parallel=1))


def test_xe_step_uint8_matches_f32(eight_devices):
    """One XE step on uint8 device-normalized images == the same step on
    host-normalized f32 images (CPU: identical f32 arithmetic)."""
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    f32 = normalize_image(u8)
    caps = np.zeros((4, 8), np.int32)
    caps[:, 0] = 30
    caps[:, 1:4] = rng.integers(1, 20, (4, 3))
    caps[:, 4] = 31

    words = [[f"w{i}"] for i in range(29)]
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map

    wm = build_word_map(words, min_word_freq=1)
    exp = _cnn_exp(wm)
    losses = {}
    for name, imgs in [("u8", u8), ("f32", f32)]:
        trainer = _single_device_trainer(exp, wm)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.compiled_xe_step()
        _, loss, _ = step(state, jnp.asarray(imgs), jnp.asarray(caps),
                          jax.random.PRNGKey(1))
        losses[name] = float(loss)
    assert losses["u8"] == pytest.approx(losses["f32"], abs=1e-5), losses


def test_epoch_bf16_upload_close_to_f32(eight_devices):
    """A full toy XE epoch with upload_dtype=bfloat16 tracks the f32 run
    (only the input quantization differs)."""
    train_ds, _, wm = toy_dataset(num_images=8, captions_per_image=2,
                                  max_len=8, height=32, width=32, seed=5)
    ref = None
    for dtype in ("float32", "bfloat16"):
        exp = _cnn_exp(wm, upload_dtype=dtype)
        trainer = _single_device_trainer(exp, wm)
        state = trainer.init_state(jax.random.PRNGKey(0))
        _, loss, _ = trainer.train_epoch_xe(state, train_ds, 0,
                                            jax.random.PRNGKey(2))
        if ref is None:
            ref = loss
        else:
            assert loss == pytest.approx(ref, rel=2e-2), (dtype, loss, ref)


def test_prefetched_workers_preserve_order_and_results():
    """workers>1 runs transforms concurrently but must deliver batches in the
    same order with the same contents as the serial producer (epoch
    semantics unchanged — only upload overlap differs)."""
    import time

    train_ds, _, _ = toy_dataset(num_images=16, captions_per_image=1,
                                 max_len=8, height=16, width=16, seed=7)

    def transform(batch):
        time.sleep(0.01 * (batch.captions[0, 1] % 3))  # jitter completion
        return (batch.images.sum(), batch.captions.copy())

    serial = list(train_ds.train_batches_prefetched(
        4, transform=transform, shuffle=False))
    train_ds2, _, _ = toy_dataset(num_images=16, captions_per_image=1,
                                  max_len=8, height=16, width=16, seed=7)
    concurrent = list(train_ds2.train_batches_prefetched(
        4, transform=transform, workers=4, shuffle=False))
    assert len(serial) == len(concurrent) == 4
    for (s_sum, s_caps), (c_sum, c_caps) in zip(serial, concurrent):
        assert s_sum == c_sum
        np.testing.assert_array_equal(s_caps, c_caps)


def test_prefetched_workers_propagate_errors():
    train_ds, _, _ = toy_dataset(num_images=8, captions_per_image=1,
                                 max_len=8, height=16, width=16, seed=7)

    def bad(batch):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(train_ds.train_batches_prefetched(4, transform=bad, workers=2))
