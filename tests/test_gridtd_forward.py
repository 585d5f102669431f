"""GridTD model forward: shapes, scan-vs-loop equivalence, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.models import gridtd
from lrp_imagecaptioning_tpu.models.encoders import (
    encode_image_grid,
    init_vgg16,
    vgg_forward,
)

CFG = ModelConfig(
    model_type="gridtd", embed_dim=16, hidden_dim=24, vocab_size=30, num_pixels=9
)


@pytest.fixture(scope="module")
def params():
    return gridtd.init_gridtd(jax.random.PRNGKey(0), CFG, raw_dim=12)


@pytest.fixture(scope="module")
def feats(params):
    rng = jax.random.PRNGKey(1)
    raw = jax.random.normal(rng, (2, 9, 12))
    avg = raw.mean(axis=1)
    return gridtd.encode_features(params, raw, avg)


def test_step_shapes(params, feats):
    state = gridtd.init_state(2, CFG.hidden_dim)
    token = jnp.array([1, 2], jnp.int32)
    logits, aux, new_state = gridtd.step(params, feats, state, token)
    assert logits.shape == (2, 30)
    assert aux.alpha.shape == (2, 9)
    assert aux.beta.shape == (2, 1)
    assert new_state.h1.shape == (2, 24)
    np.testing.assert_allclose(np.sum(aux.alpha, -1), 1.0, rtol=1e-5)
    assert np.all(aux.beta >= 0) and np.all(aux.beta <= 1)


def test_forward_scan_matches_python_loop(params, feats):
    """The lax.scan teacher-forced forward must equal a hand-rolled step loop."""
    caps = jnp.array([[5, 1, 2, 3, 6, 0], [5, 2, 2, 6, 0, 0]], jnp.int32)
    T = 5
    logits, alphas, betas = gridtd.forward(
        params, feats, caps, num_steps=T, train=False
    )
    state = gridtd.init_state(2, CFG.hidden_dim)
    for t in range(T):
        lt, aux, state = gridtd.step(params, feats, state, caps[:, t])
        np.testing.assert_allclose(logits[:, t], lt, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(alphas[:, t], aux.alpha, rtol=2e-5, atol=1e-6)


def test_forward_jits(params, feats):
    caps = jnp.zeros((2, 6), jnp.int32)
    f = jax.jit(
        lambda p, fe, c: gridtd.forward(p, fe, c, num_steps=5, train=False)
    )
    logits, _, _ = f(params, feats, caps)
    assert logits.shape == (2, 5, 30)


def test_vgg_grid_shape():
    p = init_vgg16(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 64, 64, 3))
    fm = vgg_forward(p, img)
    assert fm.shape == (1, 4, 4, 512)  # 64 / 2^4
    grid, avg = encode_image_grid(p, img)
    assert grid.shape == (1, 16, 512) and avg.shape == (1, 512)


def test_scheduled_sampling_changes_output(params, feats):
    caps = jnp.array([[5, 1, 2, 3, 4, 6, 0, 0]] * 2, jnp.int32)
    rng = jax.random.PRNGKey(3)
    a, _, _ = gridtd.forward(
        params, feats, caps, num_steps=7, ss_prob=1.0, rng=rng, train=False
    )
    b, _, _ = gridtd.forward(params, feats, caps, num_steps=7, train=False)
    # first 3 steps identical (ss only kicks in at t>2), later steps differ
    np.testing.assert_allclose(a[:, :3], b[:, :3], rtol=1e-5, atol=1e-6)
    assert not np.allclose(a[:, 3:], b[:, 3:])
