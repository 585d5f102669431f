"""Space-to-depth block-1 walk (cnn_lrp.s2d_block1): the phase-kernel
decomposition must be exactly the same conv (and therefore the same LRP
chain via jax.vjp) in the s2d layout, up to float reassociation.

The production rationale lives in make_vgg_lrp_backward's s2d note: the
224^2 x 64ch conv1_2 data-grad runs at ~8% MXU / ~20% HBM roofline on v5e
(output/roofline_cnn_walk.json) while every 112^2 x >=128ch conv achieves
42-89%; s2d moves the segment onto the efficient shape class.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
    depth_to_space,
    make_vgg_lrp_backward,
    s2d_conv_forward,
    s2d_dense_kernel,
    s2d_phase_kernels,
    space_to_depth,
)
from lrp_imagecaptioning_tpu.models.encoders import (
    ConvParams,
    init_vgg16,
    conv2d,
)


def test_s2d_roundtrip_and_layout():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 3)).astype(np.float32))
    xs = space_to_depth(x)
    assert xs.shape == (2, 3, 4, 12)
    # phase-major layout: out[..., p*C + c] = x[2i+di, 2j+dj, c], p = 2di+dj
    for di in range(2):
        for dj in range(2):
            p = 2 * di + dj
            np.testing.assert_array_equal(
                np.asarray(xs[:, :, :, p * 3:(p + 1) * 3]),
                np.asarray(x[:, di::2, dj::2, :]),
            )
    np.testing.assert_array_equal(np.asarray(depth_to_space(xs)),
                                  np.asarray(x))


@pytest.mark.parametrize("seed,h,w,cin,cout",
                         [(0, 8, 10, 3, 5), (1, 6, 6, 4, 4), (2, 12, 8, 2, 7)])
def test_s2d_phase_conv_equals_same_conv(seed, h, w, cin, cout):
    """concat_po conv(s2d(x), V_po) == s2d(conv(x, w, SAME)) — the anchor
    that makes the walk's jax.vjp correct by construction."""
    rng = np.random.default_rng(seed)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, h, w, cin)).astype(np.float32))
    want = space_to_depth(conv2d(ConvParams(wgt, None), x))
    got = s2d_conv_forward(s2d_phase_kernels(wgt), space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed,h,w,cin,cout",
                         [(0, 8, 10, 3, 5), (3, 6, 12, 4, 6)])
def test_s2d_dense_kernel_equals_same_conv(seed, h, w, cin, cout):
    """conv(s2d(x), s2d_dense_kernel(w), SAME) == s2d(conv(x, w, SAME))."""
    rng = np.random.default_rng(seed)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, h, w, cin)).astype(np.float32))
    want = space_to_depth(conv2d(ConvParams(wgt, None), x))
    got = conv2d(ConvParams(s2d_dense_kernel(wgt), None), space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s2d_clamped_forward_equals_plain():
    """The conv1_1 input-layer rule uses the clamped two-conv forward; its
    s2d form (elementwise clamps commute with the layout permutation) must
    match."""
    rng = np.random.default_rng(7)
    wgt = jnp.asarray(rng.normal(size=(3, 3, 3, 6)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 10, 8, 3)).astype(np.float32))
    wp = ConvParams(jnp.maximum(wgt, 0.0), None)
    wn = ConvParams(jnp.minimum(wgt, 0.0), None)
    want = space_to_depth(conv2d(wp, jnp.maximum(x, 0.0))
                          + conv2d(wn, jnp.minimum(x, 0.0)))
    kp = s2d_phase_kernels(jnp.maximum(wgt, 0.0))
    kn = s2d_phase_kernels(jnp.minimum(wgt, 0.0))
    xs = space_to_depth(x)
    got = (s2d_conv_forward(kp, jnp.maximum(xs, 0.0))
           + s2d_conv_forward(kn, jnp.minimum(xs, 0.0)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("mode", [True, "dense"])
def test_s2d_block1_walk_matches_plain(seed, mode):
    """Full VGG16 walk with s2d_block1 (phase or dense form) equals the
    plain walk (f32, CPU) up to conv reassociation."""
    params = init_vgg16(jax.random.PRNGKey(seed))
    img = jax.random.normal(jax.random.PRNGKey(seed + 10), (1, 32, 32, 3))
    seeds = jax.random.normal(jax.random.PRNGKey(seed + 20), (3, 1, 1, 512))

    out = {}
    for s2d in (False, mode):
        backward, _ = make_vgg_lrp_backward(params, img, s2d_block1=s2d)
        out[s2d] = np.asarray(jax.vmap(lambda r: backward(r[None])[0])(seeds))
    assert out[mode].shape == out[False].shape == (3, 32, 32, 3)
    scale = np.abs(out[False]).max()
    np.testing.assert_allclose(out[mode], out[False],
                               rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_s2d_block1_survives_bf16_storage_and_jit():
    """The TPU production form (bf16 stash/relevance storage) stays close to
    the f32 s2d walk, and the whole factory traces under jit."""
    params = init_vgg16(jax.random.PRNGKey(3))
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    seed_r = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 1, 512))

    def run(r_dtype):
        def f(img, seed_r):
            backward, _ = make_vgg_lrp_backward(
                params, img, s2d_block1=True, r_dtype=r_dtype)
            return backward(seed_r)

        return np.asarray(jax.jit(f)(img, seed_r))

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    assert np.isfinite(f32).all() and np.isfinite(bf16).all()
    denom = np.abs(f32).max()
    assert denom > 0
    assert np.abs(bf16 - f32).max() / denom < 0.05
