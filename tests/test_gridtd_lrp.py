"""GridTD decoder LRP: stash-forward consistency + reverse-walk vs a NumPy
oracle that transcribes the reference loop literally (gridTDmodel.py:1014-1135,
dynamic Python loops, per-pixel identity-LRP calls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.explain.gridtd_lrp import (
    explain_all_words,
    explain_word,
    stash_forward,
)
from lrp_imagecaptioning_tpu.models import gridtd

E, H, P, V, RAW = 6, 10, 5, 14, 7
CFG = ModelConfig(embed_dim=E, hidden_dim=H, vocab_size=V, num_pixels=P)
EPS = 0.01


@pytest.fixture(scope="module")
def setup():
    params = gridtd.init_gridtd(jax.random.PRNGKey(0), CFG, raw_dim=RAW)
    raw = jax.random.normal(jax.random.PRNGKey(1), (1, P, RAW))
    feats = gridtd.encode_features(params, raw, raw.mean(1))
    tokens = jnp.array([12, 3, 5, 1, 7], jnp.int32)  # <start>-ish + words
    stash = stash_forward(params, feats, tokens, language_double_bias_i=False)
    return params, feats, tokens, stash


def test_stash_matches_model_step(setup):
    """With the double-bias quirk off, the stash forward must reproduce the
    model's own step function exactly (no dropout)."""
    params, feats, tokens, stash = setup
    state = gridtd.init_state(1, H)
    for t in range(len(tokens)):
        logits, aux, state = gridtd.step(params, feats, state, tokens[t : t + 1])
        np.testing.assert_allclose(stash.predictions[t], logits[0], rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(stash.h2[t + 1], state.h2[0], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(stash.alpha[t], aux.alpha[0], rtol=2e-5, atol=1e-6)


def _stab(z):
    out = z + EPS * np.sign(z)
    out[out == 0] = EPS
    return out


def _lin(r_out, x, z, w):
    # reference lrp_linear_eps (gridTDmodel.py:744-765)
    attribution = w * x[None, :]
    norm = attribution.T / _stab(z.copy())
    return np.sum(norm * r_out, axis=1)


def oracle_walk(params, feats, stash, t, target):
    """Literal NumPy transcription of explain_caption_wordt."""
    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    st = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), stash)
    T = st.g1.shape[0]

    def g_chunk(w):
        h4 = w.shape[0] // 4
        return w[2 * h4 : 3 * h4]

    w_g1 = np.concatenate([g_chunk(p.ada_lstm.lstm.w_ih), g_chunk(p.ada_lstm.lstm.w_hh)], 1)
    w_g2 = np.concatenate([g_chunk(p.language_lstm.w_ih), g_chunk(p.language_lstm.w_hh)], 1)

    raw = np.asarray(feats.raw[0], np.float64)
    avg = np.asarray(feats.avg[0], np.float64)
    v_proj = np.asarray(feats.v_proj[0], np.float64)
    v_proj_pre = np.asarray(feats.v_proj_pre[0], np.float64)
    glob_pre = np.asarray(feats.global_feat_pre[0], np.float64)

    xh1 = np.concatenate([st.x1, st.h1[:T]], 1)
    xh2 = np.concatenate([st.x2, st.h2[:T]], 1)

    r_h1t = np.zeros((T + 1, H))
    r_c1t = np.zeros((T + 1, H))
    r_h2t = np.zeros((T + 1, H))
    r_c2t = np.zeros((T + 1, H))
    r_ctx_hat = np.zeros((T, H))
    r_ctx = np.zeros((T, H))
    r_vp = np.zeros((P, H))
    r_glob = np.zeros(E)
    r_wemb = np.zeros((T, E))

    word_rel = np.zeros(st.predictions.shape[1])
    word_rel[target] = st.predictions[t][target]
    mix = st.h2[t + 1] + st.context_hat[t]
    r_mix = _lin(word_rel, mix, st.predictions[t].copy(), p.fc.weight)
    eye = np.eye(H)
    r_h2t[t + 1] = _lin(r_mix, st.h2[t + 1], mix, eye)
    r_ctx_hat[t] = _lin(r_mix, st.context_hat[t], mix, eye)

    for i in range(t + 1)[::-1]:
        r_c2t[i + 1] = r_c2t[i + 1] + r_h2t[i + 1]
        r_g2 = _lin(r_c2t[i + 1], st.i2[i] * np.tanh(st.g2[i]), st.c2[i + 1], eye)
        r_c2t[i] = _lin(r_c2t[i + 1], st.f2[i] * st.c2[i], st.c2[i + 1], eye)
        r_xh2 = _lin(r_g2, xh2[i], st.g2[i], w_g2)
        r_h2t[i] = r_xh2[2 * H :]
        r_h1t[i + 1] = r_xh2[H : 2 * H]  # overwrite quirk
        r_ctx_hat[i] = r_ctx_hat[i] + r_xh2[:H]
        r_s = _lin(r_ctx_hat[i], st.beta[i] * st.s[i], st.context_hat[i], eye)
        r_ctx[i] = _lin(r_ctx_hat[i], st.context[i] * (1 - st.beta[i]),
                        st.context_hat[i], eye)
        for k in range(P):
            r_vp[k] += _lin(r_ctx[i], v_proj[k] * st.alpha[i][k],
                            st.context[i], eye)
        r_c1t[i + 1] += r_s
        r_c1t[i + 1] += r_h1t[i + 1]
        r_g1 = _lin(r_c1t[i + 1], st.i1[i] * np.tanh(st.g1[i]), st.c1[i + 1], eye)
        r_c1t[i] = _lin(r_c1t[i + 1], st.f1[i] * st.c1[i], st.c1[i + 1], eye)
        r_xh1 = _lin(r_g1, xh1[i], st.g1[i], w_g1)
        r_h1t[i] = r_xh1[2 * E + H :]
        r_h2t[i] += r_xh1[:H]
        r_glob = r_glob + r_xh1[H : E + H]
        r_wemb[i] = r_xh1[H + E : 2 * E + H]

    r_avg = _lin(r_glob, avg, glob_pre, p.global_img_feature_proj.weight)
    r_img = np.zeros((P, RAW))
    eye_raw = np.eye(RAW)
    for k in range(P):
        r_img[k] = _lin(r_avg, raw[k] / P, avg, eye_raw)
        r_img[k] += _lin(r_vp[k], raw[k], v_proj_pre[k], p.img_projector.weight)
    r_words = r_wemb.sum(-1)
    m = np.max(np.abs(r_words))
    if m > 0:
        r_words = r_words / m
    return r_img, r_words, r_vp


@pytest.mark.parametrize("t,target", [(0, 3), (2, 5), (4, 1)])
def test_walk_matches_oracle(setup, t, target):
    params, feats, tokens, stash = setup
    got = jax.jit(
        lambda tt, tg: explain_word(params, feats, stash, tt, target=tg)
    )(jnp.asarray(t), jnp.asarray(target))
    want_img, want_words, want_vp = oracle_walk(params, feats, stash, t, target)
    np.testing.assert_allclose(got.r_img_feature, want_img, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.r_words, want_words, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.r_v_proj, want_vp, rtol=1e-4, atol=1e-5)


def test_vmapped_all_words(setup):
    params, feats, tokens, stash = setup
    T = len(tokens)
    targets = jnp.array([3, 5, 1, 7, 2], jnp.int32)
    res = jax.jit(lambda: explain_all_words(params, feats, stash, targets=targets))()
    assert res.r_img_feature.shape == (T, P, RAW)
    assert res.r_words.shape == (T, T)
    # r_words strictly masked beyond each t
    rw = np.asarray(res.r_words)
    for t in range(T):
        assert np.all(rw[t, t + 1 :] == 0)
        assert np.max(np.abs(rw[t, : t + 1])) <= 1.0 + 1e-6
    # each row matches the single-word call
    one = explain_word(params, feats, stash, jnp.asarray(2), target=jnp.asarray(1))
    np.testing.assert_allclose(res.r_img_feature[2], one.r_img_feature, rtol=1e-5)


def test_relevance_is_finite_and_nonzero(setup):
    params, feats, tokens, stash = setup
    res = explain_word(params, feats, stash, jnp.asarray(3), target=jnp.asarray(2))
    assert np.isfinite(np.asarray(res.r_img_feature)).all()
    assert np.abs(np.asarray(res.r_img_feature)).sum() > 0
