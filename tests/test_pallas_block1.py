"""Fused block-1 LRP backward kernel (ops/pallas_block1.py) vs its jnp
transcription and vs the production record walk (cnn_lrp), interpret mode on
CPU.  Errors are asserted RELATIVE to the output scale — the chain divides by
stabilized pre-activations, so adversarial z's legitimately produce large
outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.models.encoders import (
    ConvParams,
    conv2d,
    maxpool2x2,
)
from lrp_imagecaptioning_tpu.ops.pallas_block1 import (
    block1_lrp_backward,
    block1_lrp_backward_ref,
)


def _real_stash(rng, H, W, C1, Cin, B=1):
    """Consistent forward pieces from an actual conv/relu/conv/relu/pool,
    batched over B images."""
    w1 = jnp.asarray(rng.normal(size=(3, 3, Cin, C1)).astype(np.float32) * .2)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C1, C1)).astype(np.float32) * .05)
    img = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    w1p = ConvParams(jnp.maximum(w1, 0.), None)
    w1n = ConvParams(jnp.minimum(w1, 0.), None)
    z1c = (conv2d(w1p, jnp.maximum(img, 0.))
           + conv2d(w1n, jnp.minimum(img, 0.)))
    a1 = jax.nn.relu(conv2d(ConvParams(w1, None), img))
    z2 = conv2d(ConvParams(jnp.maximum(w2, 0.), None), a1)
    a2 = jax.nn.relu(conv2d(ConvParams(w2, None), a1))
    p = maxpool2x2(a2)
    winner = ((a2 == jnp.repeat(jnp.repeat(p, 2, 1), 2, 2))
              & (a2 > 0)).astype(jnp.float32)
    return img, w1, w2, winner, z2, a1, z1c


@pytest.mark.parametrize("rows", [2, 4])
def test_kernel_matches_ref_real_stash(rows):
    rng = np.random.default_rng(0)
    H = W = 16
    img, w1, w2, winner, z2, a1, z1c = _real_stash(rng, H, W, 64, 3)
    r_pool = jnp.asarray(
        rng.normal(size=(1, 3, H // 2, W // 2, 64)).astype(np.float32))
    ref = np.asarray(block1_lrp_backward_ref(
        r_pool, winner, z2, a1, z1c, img, w2, w1))
    scale = np.abs(ref).max()
    for mode, tol in (("f32", 1e-6), ("bf16x3", 1e-5)):
        got = np.asarray(block1_lrp_backward(
            r_pool, winner, z2, a1, z1c, img, w2, w1,
            rows_per_tile=rows, dot_mode=mode))
        assert np.abs(got - ref).max() / scale < tol, mode


def test_kernel_matches_production_record_walk():
    """The kernel must equal make_vgg_lrp_backward's bottom five records:
    feed a pool-level seed through a 5-layer spec both ways."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import VGGLayer, VGGParams

    rng = np.random.default_rng(1)
    H = W = 16
    img, w1, w2, winner, z2, a1, z1c = _real_stash(rng, H, W, 64, 3)
    params = VGGParams(convs=(
        ConvParams(w1, None), ConvParams(w2, None)))
    spec = (
        VGGLayer("conv", 0), VGGLayer("relu", None),
        VGGLayer("conv", 1), VGGLayer("relu", None),
        VGGLayer("maxpool", None),
    )
    backward, _ = make_vgg_lrp_backward(
        params, img, spec=spec, pool_mode="fast")
    r_pool = jnp.asarray(
        rng.normal(size=(2, H // 2, W // 2, 64)).astype(np.float32))
    walk = np.asarray(jax.vmap(lambda r: backward(r[None])[0])(r_pool))
    got = np.asarray(block1_lrp_backward(
        r_pool[None], winner, z2, a1, z1c, img, w2, w1,
        rows_per_tile=4, dot_mode="f32"))[0]
    scale = np.abs(walk).max()
    assert np.abs(got - walk).max() / scale < 1e-6


def test_kernel_batches_over_images():
    """The image batch is a kernel-grid axis; every image must match its own
    single-image reference."""
    rng = np.random.default_rng(2)
    H = W = 16
    B, T = 3, 2
    img, w1, w2, winner, z2, a1, z1c = _real_stash(rng, H, W, 64, 3, B=B)
    r_pool = jnp.asarray(
        rng.normal(size=(B, T, H // 2, W // 2, 64)).astype(np.float32))
    got = np.asarray(block1_lrp_backward(
        r_pool, winner, z2, a1, z1c, img, w2, w1,
        rows_per_tile=4, dot_mode="f32"))
    ref = np.asarray(block1_lrp_backward_ref(
        r_pool, winner, z2, a1, z1c, img, w2, w1))
    assert got.shape == (B, T, H, W, 3)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-6


def test_single_word_single_image():
    rng = np.random.default_rng(3)
    H = W = 8
    img, w1, w2, winner, z2, a1, z1c = _real_stash(rng, H, W, 64, 3)
    r_pool = jnp.asarray(
        rng.normal(size=(1, 1, H // 2, W // 2, 64)).astype(np.float32))
    ref = np.asarray(block1_lrp_backward_ref(
        r_pool, winner, z2, a1, z1c, img, w2, w1))
    got = np.asarray(block1_lrp_backward(
        r_pool, winner, z2, a1, z1c, img, w2, w1,
        rows_per_tile=2, dot_mode="f32"))
    assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9) < 1e-6


def _real_stash12(rng, H, W, C1, C2, Cin, B=1):
    """Consistent forward pieces for the block-1+2 chain."""
    mk = lambda s, sc: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * sc)
    w1 = mk((3, 3, Cin, C1), .2)
    w2 = mk((3, 3, C1, C1), .05)
    w21 = mk((3, 3, C1, C2), .05)
    w22 = mk((3, 3, C2, C2), .03)
    img = mk((B, H, W, Cin), 1.0)
    w1p = ConvParams(jnp.maximum(w1, 0.), None)
    w1n = ConvParams(jnp.minimum(w1, 0.), None)
    z1c = (conv2d(w1p, jnp.maximum(img, 0.))
           + conv2d(w1n, jnp.minimum(img, 0.)))
    a1 = jax.nn.relu(conv2d(ConvParams(w1, None), img))
    z2 = conv2d(ConvParams(jnp.maximum(w2, 0.), None), a1)
    a2 = jax.nn.relu(conv2d(ConvParams(w2, None), a1))
    p1 = maxpool2x2(a2)
    winner1 = ((a2 == jnp.repeat(jnp.repeat(p1, 2, 1), 2, 2))
               & (a2 > 0)).astype(jnp.float32)
    z21 = conv2d(ConvParams(jnp.maximum(w21, 0.), None), p1)
    a21 = jax.nn.relu(conv2d(ConvParams(w21, None), p1))
    z22 = conv2d(ConvParams(jnp.maximum(w22, 0.), None), a21)
    a22 = jax.nn.relu(conv2d(ConvParams(w22, None), a21))
    p2 = maxpool2x2(a22)
    winner2 = ((a22 == jnp.repeat(jnp.repeat(p2, 2, 1), 2, 2))
               & (a22 > 0)).astype(jnp.float32)
    return dict(img=img, w1=w1, w2=w2, w21=w21, w22=w22, z1c=z1c, a1=a1,
                z2=z2, winner1=winner1, x21=p1, z21=z21, a21=a21, z22=z22,
                winner2=winner2)


def test_block12_kernel_matches_ref():
    from lrp_imagecaptioning_tpu.ops.pallas_block1 import (
        block12_lrp_backward,
        block12_lrp_backward_ref,
    )

    rng = np.random.default_rng(0)
    H = W = 16
    B, T = 2, 3
    st = _real_stash12(rng, H, W, 64, 128, 3, B=B)
    r_pool2 = jnp.asarray(
        rng.normal(size=(B, T, H // 4, W // 4, 128)).astype(np.float32))
    args = (r_pool2, st["winner2"], st["z22"], st["a21"], st["z21"],
            st["x21"], st["winner1"], st["z2"], st["a1"], st["z1c"],
            st["img"], st["w22"], st["w21"], st["w2"], st["w1"])
    ref = np.asarray(block12_lrp_backward_ref(*args))
    scale = np.abs(ref).max()
    for mode, tol in (("f32", 1e-6), ("bf16x3", 1e-5)):
        got = np.asarray(block12_lrp_backward(
            *args, rows_per_tile=4, dot_mode=mode))
        assert got.shape == (B, T, H, W, 3)
        assert np.abs(got - ref).max() / scale < tol, (
            mode, np.abs(got - ref).max() / scale)


def test_block12_matches_production_walk():
    """The extended kernel must equal the record walk over a 10-layer spec
    (conv relu conv relu pool, conv relu conv relu pool)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import VGGLayer, VGGParams
    from lrp_imagecaptioning_tpu.ops.pallas_block1 import (
        block12_lrp_backward,
    )

    rng = np.random.default_rng(1)
    H = W = 16
    st = _real_stash12(rng, H, W, 64, 128, 3, B=1)
    params = VGGParams(convs=(
        ConvParams(st["w1"], None), ConvParams(st["w2"], None),
        ConvParams(st["w21"], None), ConvParams(st["w22"], None)))
    spec = (
        VGGLayer("conv", 0), VGGLayer("relu", None),
        VGGLayer("conv", 1), VGGLayer("relu", None),
        VGGLayer("maxpool", None),
        VGGLayer("conv", 2), VGGLayer("relu", None),
        VGGLayer("conv", 3), VGGLayer("relu", None),
        VGGLayer("maxpool", None),
    )
    backward, _ = make_vgg_lrp_backward(
        params, st["img"], spec=spec, pool_mode="fast")
    r_pool2 = jnp.asarray(
        rng.normal(size=(2, H // 4, W // 4, 128)).astype(np.float32))
    walk = np.asarray(jax.vmap(lambda r: backward(r[None])[0])(r_pool2))
    got = np.asarray(block12_lrp_backward(
        r_pool2[None], st["winner2"], st["z22"], st["a21"], st["z21"],
        st["x21"], st["winner1"], st["z2"], st["a1"], st["z1c"], st["img"],
        st["w22"], st["w21"], st["w2"], st["w1"],
        rows_per_tile=4, dot_mode="f32"))[0]
    scale = np.abs(walk).max()
    assert np.abs(got - walk).max() / scale < 1e-6
