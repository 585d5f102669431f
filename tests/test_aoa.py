"""AoA model family: forward/step consistency, MHA vs torch, LRP walk vs
NumPy oracle, trainer modes, explainer end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from lrp_imagecaptioning_tpu.data import toy_dataset
from lrp_imagecaptioning_tpu.data.vocab import build_word_map
from lrp_imagecaptioning_tpu.engine.train import Trainer
from lrp_imagecaptioning_tpu.explain.aoa_lrp import (
    explain_word,
    stash_forward,
)
from lrp_imagecaptioning_tpu.models import aoa
from lrp_imagecaptioning_tpu.models.captioner import Captioner

E, H, P, V, RAW, NH = 6, 12, 5, 14, 7, 4
CFG = ModelConfig(
    model_type="aoa", embed_dim=E, hidden_dim=H, vocab_size=V,
    num_pixels=P, num_head=NH,
)


@pytest.fixture(scope="module")
def setup():
    params = aoa.init_aoa(jax.random.PRNGKey(0), CFG, raw_dim=RAW)
    raw = jax.random.normal(jax.random.PRNGKey(1), (1, P, RAW))
    feats = aoa.encode_features(params, raw)
    tokens = jnp.array([12, 3, 5, 1, 7], jnp.int32)
    stash = stash_forward(params, feats, tokens, num_head=NH,
                          language_double_bias_i=False)
    return params, feats, tokens, stash


def test_mha_matches_torch():
    rng = np.random.default_rng(0)
    b, p, h, nh = 2, 5, 12, 4
    q = rng.normal(size=(b, h)).astype(np.float32)
    k = rng.normal(size=(b, p, h)).astype(np.float32)
    v = rng.normal(size=(b, p, h)).astype(np.float32)
    ctx, alpha = aoa.multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), nh
    )
    # torch oracle mirroring MultiHeadedDotAttention.attention semantics
    d_k = h // nh
    qt = torch.tensor(q).view(b, 1, nh, d_k).transpose(1, 2)
    kt = torch.tensor(k).view(b, p, nh, d_k).transpose(1, 2)
    vt = torch.tensor(v).view(b, p, nh, d_k).transpose(1, 2)
    scores = qt @ kt.transpose(-2, -1) / np.sqrt(d_k)
    p_attn = torch.softmax(scores, dim=-1)
    want = (p_attn @ vt).transpose(1, 2).reshape(b, 1, h).squeeze(1)
    np.testing.assert_allclose(np.asarray(ctx), want.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(alpha), p_attn.squeeze(2).numpy(), rtol=1e-5, atol=1e-6
    )


def test_stash_matches_step(setup):
    params, feats, tokens, stash = setup
    state = aoa.init_state(1, H)
    for t in range(len(tokens)):
        logits, aux, state = aoa.step(
            params, feats, state, tokens[t : t + 1], num_head=NH
        )
        np.testing.assert_allclose(
            stash.predictions[t], logits[0], rtol=2e-5, atol=1e-5
        )
        np.testing.assert_allclose(stash.h[t + 1], state.h[0], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            stash.alpha[t], aux.alpha[0], rtol=2e-5, atol=1e-6
        )


def _stab(z):
    out = z + 0.01 * np.sign(z)
    out[out == 0] = 0.01
    return out


def _lin(r_out, x, z, w):
    return np.sum((w * x[None, :]).T / _stab(z.copy()) * r_out, axis=1)


def oracle_aoa_walk(params, feats, stash, t, target, head_idx):
    p = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    st = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), stash)
    T = st.g.shape[0]
    raw = np.asarray(feats.raw[0], np.float64)
    v_proj = np.asarray(feats.v_proj[0], np.float64)
    v_proj_pre = np.asarray(feats.v_proj_pre[0], np.float64)
    glob = np.asarray(feats.global_feat[0], np.float64)
    value = np.asarray(feats.value[0], np.float64)

    def g_chunk(w):
        return w[2 * (w.shape[0] // 4) : 3 * (w.shape[0] // 4)]

    w_g = np.concatenate(
        [g_chunk(p.language_lstm.w_ih), g_chunk(p.language_lstm.w_hh)], 1
    )
    eye = np.eye(H)
    word_rel = np.zeros(st.predictions.shape[1])
    word_rel[target] = st.predictions[t][target]
    mix = st.h[t + 1] + st.context_aoa[t]
    r_mix = _lin(word_rel, mix, st.predictions[t].copy(), p.fc.weight)
    r_ht = np.zeros((T + 2, H))
    r_ht[t + 1] = _lin(r_mix, st.h[t + 1], mix, eye)
    r_ctx_aoa = _lin(r_mix, st.context_aoa[t], mix, eye)
    r_context = _lin(r_ctx_aoa, st.context[t], st.context_aoa_linear[t],
                     p.aoa_linear.weight)
    # spread single head
    d_k = H // NH
    r_ctx_h = r_context.reshape(NH, d_k)
    ctx_h = st.context[t].reshape(NH, d_k)
    val_h = value.reshape(P, NH, d_k).transpose(1, 0, 2)
    r_value = np.zeros((NH, P, d_k))
    for i in range(P):
        r_value[head_idx, i] = _lin(
            r_ctx_h[head_idx], val_h[head_idx, i] * st.alpha[t][head_idx, i],
            ctx_h[head_idx], np.eye(d_k),
        )
    r_value = r_value.transpose(1, 0, 2).reshape(P, H)

    xh = np.concatenate([st.x, st.h[:T]], 1)
    r_glob = np.zeros(H)
    r_wemb = np.zeros((T, E))
    for i in range(t + 1)[::-1]:
        rc = r_ht[i + 1]
        r_g = _lin(rc, st.i[i] * np.tanh(st.g[i]), st.c[i + 1], eye)
        r_xh = _lin(r_g, xh[i], st.g[i], w_g)
        r_ht[i] = r_xh[H + E :]
        r_wemb[i] = r_xh[:E]
        r_glob += r_xh[E : E + H]

    r_vp = np.zeros((P, H))
    r_img = np.zeros((P, RAW))
    for i in range(P):
        r_vp[i] = _lin(r_glob, v_proj[i] / P, glob, eye)
        r_vp[i] += _lin(r_value[i], v_proj[i], value[i], p.decoder_v_proj.weight)
        r_img[i] = _lin(r_vp[i], raw[i], v_proj_pre[i], p.img_projector.weight)
    r_words = r_wemb.sum(-1)
    m = np.abs(r_words).max()
    full = np.zeros(T)
    full[: t + 1] = r_words[: t + 1] / (m if m > 0 else 1.0)
    return r_img, full


@pytest.mark.parametrize("t,target,head", [(0, 3, 0), (2, 5, 2), (4, 1, 3)])
def test_aoa_walk_matches_oracle(setup, t, target, head):
    params, feats, tokens, stash = setup
    got = jax.jit(
        lambda tt, tg, hh: explain_word(
            params, feats, stash, tt, target=tg, head_idx=hh, num_head=NH
        )
    )(jnp.asarray(t), jnp.asarray(target), jnp.asarray(head))
    want_img, want_words = oracle_aoa_walk(params, feats, stash, t, target, head)
    np.testing.assert_allclose(got.r_img_feature, want_img, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.r_words, want_words, rtol=1e-4, atol=1e-5)


def test_aoa_trainer_modes():
    train_ds, val_ds, wm = toy_dataset(
        num_images=8, captions_per_image=2, max_len=8,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
    )
    model = ModelConfig(
        model_type="aoa", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, num_head=4, vocab_size=len(wm),
        vocab_pad_multiple=8,
    )
    for kw in [{}, {"lrp_tune": True}]:
        trainer = Trainer(
            ExperimentConfig(model=model, train=TrainConfig(batch_size=8, **kw)),
            wm,
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        fn = (trainer.train_epoch_lrp if kw else trainer.train_epoch_xe)
        state, loss, _ = fn(state, train_ds, 0, jax.random.PRNGKey(1))
        assert np.isfinite(loss)
    bleu, cider = trainer.validate(state, val_ds, beam_size=2, eval_batch=4,
                                   max_cap_length=8)
    assert cider >= 0


def test_aoa_explainer_end_to_end():
    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(
        model_type="aoa", encoder="vgg16", embed_dim=16, hidden_dim=24,
        num_head=4, vocab_size=len(wm), num_pixels=16,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    from lrp_imagecaptioning_tpu.explain.explainer import AOALrpExplainer

    rng = np.random.default_rng(0)
    image = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    exp = AOALrpExplainer(cap, params, wm, head_idx=1, max_words=6)
    out = exp.explain_caption_arrays(image)
    t = len(out.caption)
    assert t >= 1
    assert out.relevance_images.shape == (t, 64, 64, 3)
    assert np.isfinite(out.relevance_images).all()
    assert np.abs(out.relevance_images).sum() > 0


def test_all_heads_explainer_matches_per_head():
    """AOAAllHeadsLrpExplainer (one compiled program, shared beam/stash)
    must reproduce each per-head AOALrpExplainer output exactly."""
    import numpy as np

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(model_type="aoa", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, num_head=2, vocab_size=len(wm),
                      num_pixels=16)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    image = np.random.default_rng(0).normal(
        size=(1, 64, 64, 3)).astype(np.float32)

    all_exp = build_explainer("lrp_all_heads", cap, params, wm, max_words=4,
                              cnn_word_chunk=2).explain_caption_arrays(image)
    assert len(all_exp) == 2
    for h in range(2):
        one = build_explainer("lrp", cap, params, wm, max_words=4,
                              head_idx=h,
                              cnn_word_chunk=2).explain_caption_arrays(image)
        assert all_exp[h].caption == one.caption
        np.testing.assert_allclose(all_exp[h].relevance_images,
                                   one.relevance_images, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(all_exp[h].relevance_words,
                                   one.relevance_words, rtol=1e-5,
                                   atol=1e-6)
