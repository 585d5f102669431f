"""Adaptive-attention model LRP + gradient walks.

Rebuild of ``ExplainAdaptiveAttention`` / ``ExplainAdaptiveGradient``
(adaptiveattention.py:491-848, 851-1097).  Structural differences from the
GridTD walks, preserved exactly:

LRP (adaptiveattention.py:679-771):
- the attention mix (beta split) and the per-pixel context attribution use
  ONLY step t's alpha/context — relevance entering earlier steps flows purely
  through the LSTM recurrence,
- the sentinel relevance seeds ``r_ct[t+1]`` before the time walk,
- inside the walk the epsilon denominator for the gate is ``tanh(g_t)``
  (post-activation!  adaptiveattention.py:739 — GridTD uses the
  pre-activation g_t),
- the global-image relevance is taken only from step t
  (``if i == t`` is live here, adaptiveattention.py:743-744),
- the final projector/global attributions pass ``forward_output=False`` so
  the denominator is the bias-FREE re-computation ``x @ W.T``
  (adaptiveattention.py:745-749, 764-768),
- proper r_h/r_c carries (no clobber quirks — x contains no h feedback).

Gradient (adaptiveattention.py:965-1022): same one-step attention treatment,
sentinel-c path at t only, d_glob accumulated over all steps, full h/c carry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.adaptive import AdaptiveParams
from ..models.core import adaptive_attention, linear
from ..models.gridtd import Features
from .gridtd_lrp import WordExplanation
from .rules import (
    lrp_elem_eps,
    lrp_linear_eps,
    lrp_linear_eps_onehot,
    stabilize,
)


class AdaptiveStash(NamedTuple):
    x: jax.Array  # (T, 2E)
    h: jax.Array  # (T+1, H)
    c: jax.Array  # (T+1, H)
    g: jax.Array  # (T, H) pre-activation
    i: jax.Array  # (T, H)
    f: jax.Array  # (T, H)
    o: jax.Array  # (T, H)
    sen_gate: jax.Array  # (T, H)
    s: jax.Array  # (T, H)
    alpha: jax.Array  # (T, P)
    beta: jax.Array  # (T,)
    context: jax.Array  # (T, H)
    context_hat: jax.Array  # (T, H)
    predictions: jax.Array  # (T, V)


def stash_forward(
    params: AdaptiveParams, feats: Features, tokens: jax.Array
) -> AdaptiveStash:
    """get_hidden_parameters (adaptiveattention.py:618-676).  The adaptive
    explainer's manual LSTM adds ``bias_h + bias_i`` (sum — no quirk)."""
    p = params
    V = feats.v_proj[0].astype(jnp.float32)
    glob = feats.global_feat[0].astype(jnp.float32)
    hidden = p.ada_lstm.lstm.w_hh.shape[1]

    def body(carry, tok):
        h, c = carry
        emb = p.embedding[tok].astype(jnp.float32)
        x = jnp.concatenate([emb, glob])
        lstm = p.ada_lstm.lstm
        z = x @ lstm.w_ih.T + h @ lstm.w_hh.T + lstm.b_ih + lstm.b_hh
        zi, zf, zg, zo = jnp.split(z, 4)
        i = jax.nn.sigmoid(zi)
        f = jax.nn.sigmoid(zf)
        o = jax.nn.sigmoid(zo)
        c_new = f * c + i * jnp.tanh(zg)
        h_new = o * jnp.tanh(c_new)
        sen = jax.nn.sigmoid(
            linear(p.ada_lstm.x_gate, x) + linear(p.ada_lstm.h_gate, h)
        )
        s = sen * jnp.tanh(c_new)
        att = adaptive_attention(p.ada_attention, V[None], h_new[None], s[None])
        logits = linear(p.fc, att.c_hat[0] + h_new)
        out = (x, h, c, zg, i, f, o, sen, s, att.alpha[0], att.beta[0, 0],
               att.context[0], att.c_hat[0], logits)
        return (h_new, c_new), out

    z0 = jnp.zeros((hidden,), jnp.float32)
    (hT, cT), outs = jax.lax.scan(body, (z0, z0), tokens)
    (x, hp, cp, g, i, f, o, sen, s, alpha, beta, ctx, ctx_hat, logits) = outs
    return AdaptiveStash(
        x=x, h=jnp.concatenate([hp, hT[None]]), c=jnp.concatenate([cp, cT[None]]),
        g=g, i=i, f=f, o=o, sen_gate=sen, s=s, alpha=alpha, beta=beta,
        context=ctx, context_hat=ctx_hat, predictions=logits,
    )


def explain_word(
    params: AdaptiveParams, feats: Features, stash: AdaptiveStash,
    t: jax.Array, *, target: jax.Array,
) -> WordExplanation:
    p = params
    T, hidden = stash.g.shape
    embed = p.global_img_feature_proj.weight.shape[0]
    P = stash.alpha.shape[1]

    raw = feats.raw[0].astype(jnp.float32)
    avg = feats.avg[0].astype(jnp.float32)
    v_proj = feats.v_proj[0].astype(jnp.float32)

    def g_chunk(w):
        return w[2 * (w.shape[0] // 4) : 3 * (w.shape[0] // 4)]

    lstm = p.ada_lstm.lstm
    w_g = jnp.concatenate([g_chunk(lstm.w_ih), g_chunk(lstm.w_hh)], axis=1)
    fc_w = p.fc.weight.astype(jnp.float32)

    preds_t = stash.predictions[t]
    mix = stash.h[t + 1] + stash.context_hat[t]
    # one-hot fc seed in closed form (adaptiveattention.py:679-690) — exact
    r_mix = lrp_linear_eps_onehot(
        preds_t[target], mix, preds_t[target], fc_w[target])
    seed_h = lrp_elem_eps(r_mix, stash.h[t + 1], mix)
    r_ctx_hat = lrp_elem_eps(r_mix, stash.context_hat[t], mix)
    r_context = lrp_elem_eps(
        r_ctx_hat, (1.0 - stash.beta[t]) * stash.context[t], stash.context_hat[t]
    )
    r_s = lrp_elem_eps(r_ctx_hat, stash.beta[t] * stash.s[t], stash.context_hat[t])

    xh = jnp.concatenate([stash.x, stash.h[:T]], axis=1)  # (T, 2E+H)

    def body(carry, i):
        rh_next, rc_next, r_glob = carry
        is_t = (i == t).astype(jnp.float32)
        rh = rh_next + is_t * seed_h
        rc = rc_next + is_t * r_s + rh
        # denominator quirk: tanh(g) not g (adaptiveattention.py:739)
        r_g = lrp_elem_eps(rc, stash.i[i] * jnp.tanh(stash.g[i]), stash.c[i + 1])
        rc_prev = lrp_elem_eps(rc, stash.f[i] * stash.c[i], stash.c[i + 1])
        r_xh = jnp.asarray(xh[i]) * (
            (r_g / stabilize(jnp.tanh(stash.g[i]))) @ w_g
        )
        rh_prev = r_xh[2 * embed :]
        r_glob = r_glob + is_t * r_xh[embed : 2 * embed]  # only step t
        return (rh_prev, rc_prev, r_glob), jnp.sum(r_xh[:embed])

    zeros_h = jnp.zeros((hidden,), jnp.float32)
    (_, _, r_glob), r_words_rev = jax.lax.scan(
        body, (zeros_h, zeros_h, jnp.zeros((embed,), jnp.float32)),
        jnp.arange(T - 1, -1, -1),
    )
    r_words = r_words_rev[::-1]

    # forward_output=False -> bias-free denominators (adaptiveattention.py:745)
    w_glob = p.global_img_feature_proj.weight.astype(jnp.float32)
    z_glob = avg @ w_glob.T
    r_avg = avg * ((r_glob / stabilize(z_glob)) @ w_glob)
    r_img_a = (raw / P) / stabilize(avg)[None, :] * r_avg[None, :]
    # per-pixel: context attribution only from step t
    r_vp = (v_proj * stash.alpha[t][:, None]) / stabilize(
        stash.context[t]
    )[None, :] * r_context[None, :]
    w_proj = p.img_projector.weight.astype(jnp.float32)
    z_proj = raw @ w_proj.T  # bias-free
    r_img_b = raw * ((r_vp / stabilize(z_proj)) @ w_proj)
    r_img = r_img_a + r_img_b

    valid = jnp.arange(T) <= t
    r_words = jnp.where(valid, r_words, 0.0)
    m = jnp.max(jnp.abs(r_words))
    r_words = jnp.where(m > 0, r_words / m, r_words)
    return WordExplanation(r_img, r_words, r_vp)


def gradient_word(
    params: AdaptiveParams, feats: Features, stash: AdaptiveStash,
    t: jax.Array, *, target: jax.Array, guided: bool = False,
) -> WordExplanation:
    """ExplainAdaptiveGradient.explain_caption_wordt
    (adaptiveattention.py:965-1022)."""
    p = params
    T, hidden = stash.g.shape
    embed = p.global_img_feature_proj.weight.shape[0]
    P = stash.alpha.shape[1]
    lstm = p.ada_lstm.lstm
    fc_w = p.fc.weight.astype(jnp.float32)

    seed = fc_w[target]
    d_context = seed * (1 - stash.beta[t])
    d_s = seed * stash.beta[t]
    d_vp = stash.alpha[t][:, None] * d_context[None, :]  # (P, H)
    seed_c = d_s * stash.sen_gate[t] * (1 - jnp.tanh(stash.c[t + 1]) ** 2)

    def body(carry, i):
        d_h_next, d_c_next, d_glob = carry
        is_t = (i == t).astype(jnp.float32)
        d_h = d_h_next + is_t * seed
        d_c_in = d_c_next + is_t * seed_c
        tanh_c = jnp.tanh(stash.c[i + 1])
        g_act = jnp.tanh(stash.g[i])
        d_o_act = d_h * tanh_c
        d_c = d_c_in + d_h * stash.o[i] * (1 - tanh_c**2)
        d_f_act = d_c * stash.c[i]
        d_c_prev = d_c * stash.f[i]
        d_i_act = d_c * g_act
        d_g_act = d_c * stash.i[i]
        d_gates = jnp.concatenate([
            d_i_act * stash.i[i] * (1 - stash.i[i]),
            d_f_act * stash.f[i] * (1 - stash.f[i]),
            d_g_act * (1 - g_act**2),
            d_o_act * stash.o[i] * (1 - stash.o[i]),
        ])
        d_h_prev = d_gates @ lstm.w_hh.astype(jnp.float32)
        d_x = d_gates @ lstm.w_ih.astype(jnp.float32)
        d_glob = d_glob + d_x[embed:]
        return (d_h_prev, d_c_prev, d_glob), jnp.sum(d_x[:embed])

    zeros_h = jnp.zeros((hidden,), jnp.float32)
    (_, _, d_glob), d_words_rev = jax.lax.scan(
        body, (zeros_h, zeros_h, jnp.zeros((embed,), jnp.float32)),
        jnp.arange(T - 1, -1, -1),
    )
    d_words = d_words_rev[::-1]

    raw = feats.raw[0].astype(jnp.float32)
    w_glob = p.global_img_feature_proj.weight.astype(jnp.float32)
    w_proj = p.img_projector.weight.astype(jnp.float32)
    d_img = (d_glob @ w_glob)[None, :] / P + d_vp @ w_proj
    if guided:
        d_img = jnp.where(raw <= 0, 0.0, d_img)

    valid = jnp.arange(T) <= t
    d_words = jnp.where(valid, d_words, 0.0)
    m = jnp.max(jnp.abs(d_words))
    d_words = jnp.where(m > 0, d_words / m, d_words)
    return WordExplanation(d_img, d_words, d_vp)


def explain_all_words(params, feats, stash, *, targets) -> WordExplanation:
    T = stash.g.shape[0]
    return jax.vmap(
        lambda t, tg: explain_word(params, feats, stash, t, target=tg)
    )(jnp.arange(T), targets)


def gradient_all_words(params, feats, stash, *, targets, guided=False):
    T = stash.g.shape[0]
    return jax.vmap(
        lambda t, tg: gradient_word(params, feats, stash, t, target=tg,
                                    guided=guided)
    )(jnp.arange(T), targets)
