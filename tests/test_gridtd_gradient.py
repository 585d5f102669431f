"""Gradient-family walks vs NumPy oracle (literal reference transcription,
gridTDmodel.py:1424-1508) + guided CNN backward vs torch hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.explain.cnn_gradient import (
    vgg_gradient,
    vgg_guided_gradient,
)
from lrp_imagecaptioning_tpu.explain.gridtd_gradient import (
    grad_cam,
    gradient_word,
)
from lrp_imagecaptioning_tpu.explain.gridtd_lrp import stash_forward
from lrp_imagecaptioning_tpu.models import gridtd
from lrp_imagecaptioning_tpu.models.encoders import (
    ConvParams,
    VGGParams,
    vgg_spec,
)

E, H, P, V, RAW = 6, 10, 5, 14, 7
CFG = ModelConfig(embed_dim=E, hidden_dim=H, vocab_size=V, num_pixels=P)


@pytest.fixture(scope="module")
def setup():
    params = gridtd.init_gridtd(jax.random.PRNGKey(0), CFG, raw_dim=RAW)
    raw = jax.random.normal(jax.random.PRNGKey(1), (1, P, RAW))
    feats = gridtd.encode_features(params, raw, raw.mean(1))
    tokens = jnp.array([12, 3, 5, 1, 7], jnp.int32)
    stash = stash_forward(params, feats, tokens, language_double_bias_i=True)
    return params, feats, tokens, stash


def oracle_gradient(params, feats, stash, t, target, guided=False):
    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    st = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), stash)
    raw = np.asarray(feats.raw[0], np.float64)
    v_proj = np.asarray(feats.v_proj[0], np.float64)
    glob = np.asarray(feats.global_feat[0], np.float64)

    d_h2t = np.zeros((t + 2, H))
    d_c2t = np.zeros((t + 2, H))
    d_h1t = np.zeros((t + 2, H))
    d_c1t = np.zeros((t + 2, H))
    d_ctx_hat = np.zeros((t + 1, H))
    d_glob = np.zeros(E)
    d_wemb = np.zeros((t + 1, E))
    d_vp = np.zeros((P, H))

    seed = p.fc.weight[target]
    d_ctx_hat[t] = seed
    d_h2t[t + 1] = seed
    for i in range(t + 1)[::-1]:
        tanh_c2 = np.tanh(st.c2[i + 1])
        g2a = np.tanh(st.g2[i])
        d_o2a = d_h2t[i + 1] * tanh_c2
        d_c2t[i + 1] = d_c2t[i + 1] + d_h2t[i + 1] * st.o2[i] * (1 - tanh_c2**2)
        d_f2a = d_c2t[i + 1] * st.c2[i]
        d_c2t[i] = d_c2t[i + 1] * st.f2[i]
        d_i2a = d_c2t[i + 1] * g2a
        d_g2a = d_c2t[i + 1] * st.i2[i]
        d_gates2 = np.concatenate([
            d_i2a * st.i2[i] * (1 - st.i2[i]),
            d_f2a * st.f2[i] * (1 - st.f2[i]),
            d_g2a * (1 - g2a**2),
            d_o2a * st.o2[i] * (1 - st.o2[i]),
        ])
        d_h2t[i] = d_gates2 @ p.language_lstm.w_hh
        d_x2 = d_gates2 @ p.language_lstm.w_ih
        d_ctx_hat[i] += d_x2[:H]
        d_context = d_ctx_hat[i] * (1 - st.beta[i])
        for k in range(P):
            d_vp[k] += d_context * st.alpha[i][k]
        d_s = d_ctx_hat[i] * st.beta[i]
        tanh_c1 = np.tanh(st.c1[i + 1])
        g1a = np.tanh(st.g1[i])
        d_c1t[i + 1] += d_s * st.sen_gate[i] * (1 - tanh_c1**2)
        d_h1t[i + 1] = d_x2[H:]
        d_o1a = d_h1t[i + 1] * tanh_c1
        d_c1t[i + 1] = d_c1t[i + 1] + d_h1t[i + 1] * st.o1[i] * (1 - tanh_c1**2)
        d_f1a = d_c1t[i + 1] * st.c1[i]
        d_c1t[i] = d_c1t[i + 1] * st.f1[i]
        d_i1a = d_c1t[i + 1] * g1a
        d_g1a = d_c1t[i + 1] * st.i1[i]
        d_gates1 = np.concatenate([
            d_i1a * st.i1[i] * (1 - st.i1[i]),
            d_f1a * st.f1[i] * (1 - st.f1[i]),
            d_g1a * (1 - g1a**2),
            d_o1a * st.o1[i] * (1 - st.o1[i]),
        ])
        d_h1t[i] = d_gates1 @ p.ada_lstm.lstm.w_hh
        d_x1 = d_gates1 @ p.ada_lstm.lstm.w_ih
        d_glob = d_glob + d_x1[H : H + E]
        d_wemb[i] = d_x1[H + E :]
        d_h2t[i] += d_x1[:H]
    if guided:
        d_glob[glob < 0] = 0
        d_vp[v_proj < 0] = 0
    d_avg = d_glob @ p.global_img_feature_proj.weight
    d_img = np.zeros((P, RAW))
    for k in range(P):
        d_img[k] = d_avg / P + d_vp[k] @ p.img_projector.weight
    if guided:
        d_img[raw <= 0] = 0
    r_words = d_wemb.sum(-1)
    m = np.max(np.abs(r_words))
    if m > 0:
        r_words = r_words / m
    full = np.zeros(len(stash.g1))
    full[: t + 1] = r_words
    return d_img, full, d_vp


@pytest.mark.parametrize("t,target,guided", [(0, 3, False), (2, 5, False),
                                             (4, 1, False), (3, 2, True)])
def test_gradient_walk_matches_oracle(setup, t, target, guided):
    params, feats, tokens, stash = setup
    got = jax.jit(
        lambda tt, tg: gradient_word(
            params, feats, stash, tt, target=tg, guided=guided
        )
    )(jnp.asarray(t), jnp.asarray(target))
    want_img, want_words, want_vp = oracle_gradient(
        params, feats, stash, t, target, guided=guided
    )
    np.testing.assert_allclose(got.r_img_feature, want_img, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.r_words, want_words, rtol=1e-4, atol=1e-5)


def test_vgg_gradient_matches_torch():
    rng = np.random.default_rng(0)
    cfg = [4, "M", 6]
    spec = vgg_spec(cfg)
    w1 = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    w2 = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
    b1 = rng.normal(size=(4,)).astype(np.float32)
    b2 = rng.normal(size=(6,)).astype(np.float32)
    params = VGGParams((
        ConvParams(jnp.asarray(w1.transpose(2, 3, 1, 0)), jnp.asarray(b1)),
        ConvParams(jnp.asarray(w2.transpose(2, 3, 1, 0)), jnp.asarray(b2)),
    ))
    img = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    d_feat = rng.normal(size=(1, 6, 4, 4)).astype(np.float32)

    # torch truth
    x = torch.tensor(img, requires_grad=True)
    h = F.relu(F.conv2d(x, torch.tensor(w1), torch.tensor(b1), padding=1))
    h = F.max_pool2d(h, 2, 2)
    out = F.relu(F.conv2d(h, torch.tensor(w2), torch.tensor(b2), padding=1))
    out.backward(torch.tensor(d_feat))
    want = x.grad.numpy()

    got = np.asarray(vgg_gradient(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(d_feat.transpose(0, 2, 3, 1)), spec=spec,
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vgg_guided_matches_torch_hooks():
    rng = np.random.default_rng(1)
    cfg = [4, "M", 6]
    spec = vgg_spec(cfg)
    w1 = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    w2 = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
    params = VGGParams((
        ConvParams(jnp.asarray(w1.transpose(2, 3, 1, 0)), jnp.zeros(4)),
        ConvParams(jnp.asarray(w2.transpose(2, 3, 1, 0)), jnp.zeros(6)),
    ))
    img = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    d_feat = rng.normal(size=(1, 6, 4, 4)).astype(np.float32)

    # torch truth with guided relu hooks (gridTDmodel.py:1677-1691)
    model = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(4, 6, 3, padding=1), torch.nn.ReLU(),
    )
    with torch.no_grad():
        model[0].weight.copy_(torch.tensor(w1)); model[0].bias.zero_()
        model[3].weight.copy_(torch.tensor(w2)); model[3].bias.zero_()

    def fw_hook(m, i, o):
        m.output_ = o

    def bw_hook(m, gi, go):
        mask = (m.output_ > 0).float()
        return (torch.clamp(go[0], min=0.0) * mask,)

    for m in model:
        if isinstance(m, torch.nn.ReLU):
            m.register_forward_hook(fw_hook)
            m.register_full_backward_hook(bw_hook)
    x = torch.tensor(img, requires_grad=True)
    out = model(x)
    out.backward(torch.tensor(d_feat))
    want = x.grad.numpy()

    got = np.asarray(vgg_guided_gradient(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(d_feat.transpose(0, 2, 3, 1)), spec=spec,
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grad_cam_properties():
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.normal(size=(P, RAW)).astype(np.float32))
    grads = jnp.asarray(rng.normal(size=(P, RAW)).astype(np.float32))
    cam = np.asarray(grad_cam(grid, grads))
    assert cam.shape == (P,)
    assert (cam >= 0).all() and cam.max() <= 1.0 + 1e-5
