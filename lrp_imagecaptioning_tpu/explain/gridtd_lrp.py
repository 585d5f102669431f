"""GridTD decoder LRP: stash forward + reverse-scan relevance walk.

TPU-native rebuild of ``ExplainGridTDAttention`` (gridTDmodel.py:705-1211):

- the teacher-forced stash forward (``get_hidden_parameters``,
  gridTDmodel.py:933-1012) becomes a ``lax.scan`` that stacks every
  intermediate (x1, x2, h/c of both LSTMs, gate pre-activations i/f/g,
  sentinel s, alpha, beta, context, c_hat, logits),
- ``explain_caption_wordt`` (gridTDmodel.py:1014-1135) becomes a *reverse*
  ``lax.scan``; its per-pixel / per-channel identity-LRP loops (196 iterations,
  gridTDmodel.py:1091-1095,1120-1128) collapse into broadcast ops,
- explaining every word of the caption is a ``vmap`` over the seed position t:
  iterations i > t contribute exactly zero (the walk is linear in relevance
  and the carry is zero until the seed injects at i == t), so one fixed-length
  scan serves all words.

Quirk parity (SURVEY.md §7 "behavioral quirks"):

- the explainer's manual language-LSTM forward adds ``bias_ih`` twice instead
  of ``bias_ih + bias_hh`` (gridTDmodel.py:789).  ``language_double_bias_i``
  (default True) reproduces this so relevance maps match the reference to
  MAE <= 1e-4; set False for the mathematically-correct forward,
- the recurrent h1 relevance assigned at iteration i+1 is overwritten at
  iteration i (``r_h1t[i+1] = r_xh2t[i][H:2H]``, gridTDmodel.py:1075 clobbers
  gridTDmodel.py:1110) — the walk therefore needs no h1 carry at all,
- word relevance is normalized by its max-abs (gridTDmodel.py:1129-1132).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.core import linear
from ..models.gridtd import Features, GridTDParams
from .rules import (
    lrp_elem_eps,
    lrp_linear_eps,
    lrp_linear_eps_onehot,
    stabilize,
)


class GridTDStash(NamedTuple):
    """Per-timestep intermediates, time-major with length T (+1 for states).
    Index conventions follow the reference arrays (gridTDmodel.py:953-970):
    state arrays hold the value *entering* step i at index i."""

    x1: jax.Array  # (T, 2E+H)
    x2: jax.Array  # (T, 2H)
    h1: jax.Array  # (T+1, H)
    c1: jax.Array  # (T+1, H)
    h2: jax.Array  # (T+1, H)
    c2: jax.Array  # (T+1, H)
    g1: jax.Array  # (T, H) pre-activation cell candidate
    i1: jax.Array  # (T, H) sigmoid input gate
    f1: jax.Array  # (T, H) sigmoid forget gate
    g2: jax.Array  # (T, H)
    i2: jax.Array  # (T, H)
    f2: jax.Array  # (T, H)
    s: jax.Array  # (T, H) sentinel
    alpha: jax.Array  # (T, P)
    beta: jax.Array  # (T,)
    context: jax.Array  # (T, H)
    context_hat: jax.Array  # (T, H)
    predictions: jax.Array  # (T, V) raw logits (no dropout)
    o1: jax.Array  # (T, H) sigmoid output gate, AdaLSTM
    o2: jax.Array  # (T, H) sigmoid output gate, language LSTM
    sen_gate: jax.Array  # (T, H) sentinel gate (pre-tanh multiplier)


def _manual_lstm(x, h, c, w_ih, w_hh, b1, b2):
    z = x @ w_ih.T + h @ w_hh.T + b1 + b2
    zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    o = jax.nn.sigmoid(zo)
    c_new = f * c + i * jnp.tanh(zg)
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, zg, i, f, o


def stash_forward(
    params: GridTDParams,
    feats: Features,
    tokens: jax.Array,  # (T,) int32 — <start> + decoded words, input side
    *,
    language_double_bias_i: bool = True,
) -> GridTDStash:
    """Single-image teacher-forced forward stashing everything
    (``get_hidden_parameters``, gridTDmodel.py:971-1012).  ``feats`` must have
    batch dim 1; arrays are squeezed to unbatched fp32."""
    p = params
    V = feats.v_proj[0].astype(jnp.float32)  # (P, H)
    glob = feats.global_feat[0].astype(jnp.float32)  # (E,)
    hidden = p.language_lstm.w_hh.shape[1]

    lb2 = p.language_lstm.b_ih if language_double_bias_i else p.language_lstm.b_hh

    def body(carry, tok):
        h1, c1, h2, c2 = carry
        emb = p.embedding[tok].astype(jnp.float32)
        x1 = jnp.concatenate([h2, glob, emb])
        h1n, c1n, g1, i1, f1, o1 = _manual_lstm(
            x1, h1, c1, p.ada_lstm.lstm.w_ih, p.ada_lstm.lstm.w_hh,
            p.ada_lstm.lstm.b_hh, p.ada_lstm.lstm.b_ih,
        )
        sen_gate = jax.nn.sigmoid(
            linear(p.ada_lstm.x_gate, x1) + linear(p.ada_lstm.h_gate, h1)
        )
        s = sen_gate * jnp.tanh(c1n)
        # adaptive attention (batched module applied to batch-1)
        from ..models.core import adaptive_attention

        att = adaptive_attention(p.ada_attention, V[None], h1n[None], s[None])
        ctx_hat, ctx = att.c_hat[0], att.context[0]
        alpha, beta = att.alpha[0], att.beta[0, 0]
        x2 = jnp.concatenate([ctx_hat, h1n])
        h2n, c2n, g2, i2, f2, o2 = _manual_lstm(
            x2, h2, c2, p.language_lstm.w_ih, p.language_lstm.w_hh,
            p.language_lstm.b_ih, lb2,
        )
        logits = linear(p.fc, ctx_hat + h2n)
        out = (x1, x2, h1, c1, h2, c2, g1, i1, f1, g2, i2, f2, s,
               alpha, beta, ctx, ctx_hat, logits, o1, o2, sen_gate)
        return (h1n, c1n, h2n, c2n), out

    z = jnp.zeros((hidden,), jnp.float32)
    (h1T, c1T, h2T, c2T), outs = jax.lax.scan(body, (z, z, z, z), tokens)
    (x1, x2, h1p, c1p, h2p, c2p, g1, i1, f1, g2, i2, f2, s,
     alpha, beta, ctx, ctx_hat, logits, o1, o2, sen_gate) = outs

    def states(prevs, last):
        return jnp.concatenate([prevs, last[None]], axis=0)

    return GridTDStash(
        x1=x1, x2=x2,
        h1=states(h1p, h1T), c1=states(c1p, c1T),
        h2=states(h2p, h2T), c2=states(c2p, c2T),
        g1=g1, i1=i1, f1=f1, g2=g2, i2=i2, f2=f2,
        s=s, alpha=alpha, beta=beta,
        context=ctx, context_hat=ctx_hat, predictions=logits,
        o1=o1, o2=o2, sen_gate=sen_gate,
    )


class WordExplanation(NamedTuple):
    r_img_feature: jax.Array  # (P, C_raw) relevance on the raw encoder grid
    r_words: jax.Array  # (T,) relevance of each preceding input word
    r_v_proj: jax.Array  # (P, H) relevance on projected features (aux)


def explain_word(
    params: GridTDParams,
    feats: Features,
    stash: GridTDStash,
    t: jax.Array,  # () int32 — explain the word predicted at step t
    *,
    target: jax.Array | None = None,  # () int32 — defaults to argmax
    bu: bool = False,  # bottom-up feature path (see final attribution note)
) -> WordExplanation:
    """Relevance walk for one explained word (gridTDmodel.py:1014-1135),
    vectorized; jit/vmap over ``t`` for whole-caption explanations."""
    p = params
    T, hidden = stash.g1.shape
    embed = p.global_img_feature_proj.weight.shape[0]
    P = stash.alpha.shape[1]

    raw = feats.raw[0].astype(jnp.float32)  # (P, C)
    avg = feats.avg[0].astype(jnp.float32)  # (C,)
    v_proj = feats.v_proj[0].astype(jnp.float32)  # (P, H)
    v_proj_pre = feats.v_proj_pre[0].astype(jnp.float32)  # (P, H)
    glob_pre = feats.global_feat_pre[0].astype(jnp.float32)  # (E,)

    # gate-g weight blocks (gridTDmodel.py:1019-1024); torch gate order i,f,g,o
    def g_chunk(w):
        h4 = w.shape[0] // 4
        return w[2 * h4 : 3 * h4]

    w_g1 = jnp.concatenate(
        [g_chunk(p.ada_lstm.lstm.w_ih), g_chunk(p.ada_lstm.lstm.w_hh)], axis=1
    ).astype(jnp.float32)  # (H, 2E+2H)
    w_g2 = jnp.concatenate(
        [g_chunk(p.language_lstm.w_ih), g_chunk(p.language_lstm.w_hh)], axis=1
    ).astype(jnp.float32)  # (H, 3H)
    fc_w = p.fc.weight.astype(jnp.float32)

    # ---- seeds at step t (gridTDmodel.py:1033-1059) ----------------------
    preds_t = stash.predictions[t]
    tgt = jnp.argmax(preds_t) if target is None else target
    mix_t = stash.h2[t + 1] + stash.context_hat[t]
    # one-hot fc seed (R[word] = logit, gridTDmodel.py:1033-1034) in closed
    # form — skips the padded_vocab x hidden matmul, exactly
    r_mix = lrp_linear_eps_onehot(preds_t[tgt], mix_t, preds_t[tgt], fc_w[tgt])
    seed_h2 = lrp_elem_eps(r_mix, stash.h2[t + 1], mix_t)
    seed_ctx_hat = lrp_elem_eps(r_mix, stash.context_hat[t], mix_t)

    xh1 = jnp.concatenate([stash.x1, stash.h1[:T]], axis=1)  # (T, 2E+2H)
    xh2 = jnp.concatenate([stash.x2, stash.h2[:T]], axis=1)  # (T, 3H)

    def body(carry, i):
        rc1_next, rc2_next, rh2_next, r_vp, r_glob = carry
        is_t = (i == t).astype(jnp.float32)
        rh2_use = rh2_next + is_t * seed_h2

        # language LSTM cell decomposition (gridTDmodel.py:1060-1076)
        rc2 = rc2_next + rh2_use
        r_g2 = lrp_elem_eps(rc2, stash.i2[i] * jnp.tanh(stash.g2[i]), stash.c2[i + 1])
        rc2_prev = lrp_elem_eps(rc2, stash.f2[i] * stash.c2[i], stash.c2[i + 1])
        r_xh2 = lrp_linear_eps(r_g2, xh2[i], stash.g2[i], w_g2)
        r_ctx_hat = is_t * seed_ctx_hat + r_xh2[:hidden]
        r_h1_i = r_xh2[hidden : 2 * hidden]
        rh2_prev_a = r_xh2[2 * hidden :]

        # attention mix c_hat = beta*s + (1-beta)*ctx (gridTDmodel.py:1077-1084)
        r_s = lrp_elem_eps(r_ctx_hat, stash.beta[i] * stash.s[i], stash.context_hat[i])
        r_ctx = lrp_elem_eps(
            r_ctx_hat, (1.0 - stash.beta[i]) * stash.context[i], stash.context_hat[i]
        )
        # per-pixel context attribution — the reference's 196-call loop
        # (gridTDmodel.py:1091-1095) as one broadcast
        r_vp = r_vp + (v_proj * stash.alpha[i][:, None]) / stabilize(
            stash.context[i]
        )[None, :] * r_ctx[None, :]

        # AdaLSTM cell (gridTDmodel.py:1096-1109)
        rc1 = rc1_next + r_s + r_h1_i
        r_g1 = lrp_elem_eps(rc1, stash.i1[i] * jnp.tanh(stash.g1[i]), stash.c1[i + 1])
        rc1_prev = lrp_elem_eps(rc1, stash.f1[i] * stash.c1[i], stash.c1[i + 1])
        r_xh1 = lrp_linear_eps(r_g1, xh1[i], stash.g1[i], w_g1)

        rh2_prev_b = r_xh1[:hidden]
        r_glob = r_glob + r_xh1[hidden : hidden + embed]
        r_wemb_i = r_xh1[hidden + embed : hidden + 2 * embed]

        new_carry = (
            rc1_prev, rc2_prev, rh2_prev_a + rh2_prev_b, r_vp, r_glob,
        )
        return new_carry, jnp.sum(r_wemb_i)

    zeros_h = jnp.zeros((hidden,), jnp.float32)
    carry0 = (
        zeros_h, zeros_h, zeros_h,
        jnp.zeros((P, hidden), jnp.float32),
        jnp.zeros((embed,), jnp.float32),
    )
    idx = jnp.arange(T - 1, -1, -1)
    (_, _, _, r_vp, r_glob), r_words_rev = jax.lax.scan(body, carry0, idx)
    r_words = r_words_rev[::-1]  # back to time order

    # ---- final attribution to the raw encoder features -------------------
    w_glob = p.global_img_feature_proj.weight.astype(jnp.float32)
    w_proj = p.img_projector.weight.astype(jnp.float32)
    num_pixels = jnp.asarray(P, jnp.float32)
    r_avg = lrp_linear_eps(r_glob, avg, glob_pre, w_glob)
    if not bu:
        # CNN path (gridTDmodel.py:1116-1128): global relevance through the
        # average pool to each pixel + projected relevance through the 1x1 conv
        r_img_a = (raw / num_pixels) / stabilize(avg)[None, :] * r_avg[None, :]
        r_img_b = raw * ((r_vp / stabilize(v_proj_pre)) @ w_proj)
        r_img = r_img_a + r_img_b
    else:
        # Bottom-up path — the reference ships NO BU image explainer (its
        # Explain* classes exist only for the CNN models); this follows the
        # same rules through the BU feature graph (GridTDModelBU.forward,
        # gridTDmodel.py:1913-1917): global = relu(W_g(mean(v_proj))), so the
        # global relevance splits over the projected-region mean and joins
        # r_vp before the per-region Linear projector attribution.
        r_vp = r_vp + (v_proj / num_pixels) / stabilize(avg)[None, :] * r_avg[None, :]
        r_img = raw * ((r_vp / stabilize(v_proj_pre)) @ w_proj)

    # mask word relevance beyond the explained position and normalize by
    # max-abs (gridTDmodel.py:1129-1132)
    valid = jnp.arange(T) <= t
    r_words = jnp.where(valid, r_words, 0.0)
    m = jnp.max(jnp.abs(r_words))
    r_words = jnp.where(m > 0, r_words / m, r_words)
    return WordExplanation(r_img, r_words, r_vp)


def explain_all_words(
    params: GridTDParams,
    feats: Features,
    stash: GridTDStash,
    *,
    targets: jax.Array | None = None,  # (T,) explained word per step
    bu: bool = False,
) -> WordExplanation:
    """vmap of :func:`explain_word` over every step — per-caption explanation
    as one XLA program (the reference loops Python-level per word,
    gridTDmodel.py:1147-1152)."""
    T = stash.g1.shape[0]
    ts = jnp.arange(T)
    if targets is None:
        return jax.vmap(lambda t: explain_word(params, feats, stash, t, bu=bu))(ts)
    return jax.vmap(
        lambda t, tg: explain_word(params, feats, stash, t, target=tg, bu=bu)
    )(ts, targets)
