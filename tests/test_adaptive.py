"""Adaptive-attention family: walk-vs-oracle, trainer, explainers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from lrp_imagecaptioning_tpu.data.vocab import build_word_map
from lrp_imagecaptioning_tpu.explain.adaptive_lrp import (
    explain_word,
    gradient_word,
    stash_forward,
)
from lrp_imagecaptioning_tpu.models import adaptive, gridtd
from lrp_imagecaptioning_tpu.models.captioner import Captioner

E, H, P, V, RAW = 6, 10, 5, 14, 7
CFG = ModelConfig(
    model_type="adaptive", embed_dim=E, hidden_dim=H, vocab_size=V, num_pixels=P
)


@pytest.fixture(scope="module")
def setup():
    params = adaptive.init_adaptive(jax.random.PRNGKey(0), CFG, raw_dim=RAW)
    raw = jax.random.normal(jax.random.PRNGKey(1), (1, P, RAW))
    feats = gridtd.encode_features(params, raw, raw.mean(1))
    tokens = jnp.array([12, 3, 5, 1, 7], jnp.int32)
    stash = stash_forward(params, feats, tokens)
    return params, feats, tokens, stash


def test_stash_matches_step(setup):
    params, feats, tokens, stash = setup
    state = adaptive.init_state(1, H)
    for t in range(len(tokens)):
        logits, aux, state = adaptive.step(params, feats, state, tokens[t : t + 1])
        np.testing.assert_allclose(stash.predictions[t], logits[0], rtol=2e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(stash.h[t + 1], state.h[0], rtol=2e-5, atol=1e-6)


def _stab(z):
    out = z + 0.01 * np.sign(z)
    out[out == 0] = 0.01
    return out


def _lin(r_out, x, z, w):
    return np.sum((w * x[None, :]).T / _stab(np.array(z)) * r_out, axis=1)


def oracle_adaptive_lrp(params, feats, stash, t, target):
    """Literal transcription of adaptiveattention.py:679-771."""
    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    st = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), stash)
    T = st.g.shape[0]
    raw = np.asarray(feats.raw[0], np.float64)
    avg = np.asarray(feats.avg[0], np.float64)
    v_proj = np.asarray(feats.v_proj[0], np.float64)

    def g_chunk(w):
        return w[2 * (w.shape[0] // 4) : 3 * (w.shape[0] // 4)]

    lstm = p.ada_lstm.lstm
    w_g = np.concatenate([g_chunk(lstm.w_ih), g_chunk(lstm.w_hh)], 1)
    eye = np.eye(H)
    word_rel = np.zeros(st.predictions.shape[1])
    word_rel[target] = st.predictions[t][target]
    mix = st.h[t + 1] + st.context_hat[t]
    r_mix = _lin(word_rel, mix, st.predictions[t], p.fc.weight)
    r_ht = np.zeros((T + 2, H))
    r_ct = np.zeros((T + 2, H))
    r_ht[t + 1] = _lin(r_mix, st.h[t + 1], mix, eye)
    r_ctx_hat = _lin(r_mix, st.context_hat[t], mix, eye)
    r_context = _lin(r_ctx_hat, (1 - st.beta[t]) * st.context[t],
                     st.context_hat[t], eye)
    r_s = _lin(r_ctx_hat, st.beta[t] * st.s[t], st.context_hat[t], eye)
    r_ct[t + 1] = r_s
    r_glob = np.zeros(E)
    r_wemb = np.zeros((T, E))
    for i in range(t + 1)[::-1]:
        r_ct[i + 1] = r_ct[i + 1] + r_ht[i + 1]
        r_g = _lin(r_ct[i + 1], st.i[i] * np.tanh(st.g[i]), st.c[i + 1], eye)
        r_ct[i] = _lin(r_ct[i + 1], st.f[i] * st.c[i], st.c[i + 1], eye)
        xh = np.concatenate([st.x[i], st.h[i]])
        r_xh = _lin(r_g, xh, np.tanh(st.g[i]), w_g)  # tanh(g) denominator!
        r_ht[i] = r_xh[2 * E :]
        if i == t:
            r_glob = r_glob + r_xh[E : 2 * E]
        r_wemb[i] = r_xh[:E]
    z_glob = avg @ p.global_img_feature_proj.weight.T  # bias-free
    r_avg = _lin(r_glob, avg, z_glob, p.global_img_feature_proj.weight)
    r_img = np.zeros((P, RAW))
    eye_raw = np.eye(RAW)
    for i in range(P):
        r_img[i] = _lin(r_avg, raw[i] / P, avg, eye_raw)
        r_vp_i = _lin(r_context, v_proj[i] * st.alpha[t][i], st.context[t], eye)
        z_proj = raw[i] @ p.img_projector.weight.T  # bias-free
        r_img[i] += _lin(r_vp_i, raw[i], z_proj, p.img_projector.weight)
    r_words = r_wemb.sum(-1)
    m = np.abs(r_words).max()
    full = np.zeros(T)
    full[: t + 1] = r_words[: t + 1] / (m if m > 0 else 1.0)
    return r_img, full


@pytest.mark.parametrize("t,target", [(0, 3), (2, 5), (4, 1)])
def test_adaptive_lrp_matches_oracle(setup, t, target):
    params, feats, tokens, stash = setup
    got = jax.jit(
        lambda tt, tg: explain_word(params, feats, stash, tt, target=tg)
    )(jnp.asarray(t), jnp.asarray(target))
    want_img, want_words = oracle_adaptive_lrp(params, feats, stash, t, target)
    np.testing.assert_allclose(got.r_img_feature, want_img, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.r_words, want_words, rtol=1e-4, atol=1e-5)


def test_adaptive_gradient_runs(setup):
    params, feats, tokens, stash = setup
    out = gradient_word(params, feats, stash, jnp.asarray(2),
                        target=jnp.asarray(3))
    assert np.isfinite(np.asarray(out.r_img_feature)).all()
    assert np.abs(np.asarray(out.r_img_feature)).sum() > 0


def test_adaptive_trainer_and_explainers():
    from lrp_imagecaptioning_tpu.data import toy_dataset
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.explain import build_explainer

    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(
        model_type="adaptive", encoder="vgg16", embed_dim=16, hidden_dim=24,
        vocab_size=len(wm), num_pixels=16,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    image = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    for name in ["lrp", "gradient", "guided_gradient", "grad_cam"]:
        e = build_explainer(name, cap, params, wm, max_words=6)
        out = e.explain_caption_arrays(image)
        assert np.isfinite(out.relevance_images).all()
        assert np.abs(out.relevance_images).sum() > 0

    train_ds, val_ds, wm2 = toy_dataset(num_images=8, captions_per_image=1,
                                        max_len=6, height=32, width=32, seed=1)
    model = ModelConfig(model_type="adaptive", encoder="vgg16", embed_dim=8,
                        hidden_dim=12, vocab_size=len(wm2), num_pixels=4)
    trainer = Trainer(
        ExperimentConfig(model=model, train=TrainConfig(batch_size=8)), wm2
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, loss, _ = trainer.train_epoch_xe(state, train_ds, 0, jax.random.PRNGKey(1))
    assert np.isfinite(loss)
