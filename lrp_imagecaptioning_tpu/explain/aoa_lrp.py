"""AoA decoder LRP: stash forward + per-head relevance walk.

Rebuild of ``ExplainAOAAttention`` (aoamodel.py:748-1255):

- stash forward = get_hidden_parameters (aoamodel.py:992-1065) as lax.scan,
  including the explainer's double-``bias_ih`` language-LSTM quirk
  (aoamodel.py:873),
- ``lrp_mha`` uses the chosen "spread single head" variant
  (aoamodel.py:847-860): only ``head_idx``'s d_k block receives relevance,
  attributed per pixel by alpha-weighted identity LRP against the head's
  context,
- the AoA gate is handled by routing all context_aoa relevance through the
  *linear* branch with ``z = context_aoa_linear`` (sigmoid gate ignored,
  aoamodel.py:1107-1111),
- the time walk carries only r_h: the reference *overwrites* ``r_ct[i+1]``
  with ``r_ht[i+1]`` at each step (aoamodel.py:1121), discarding the cell-path
  relevance assigned by the previous iteration's f-gate split — quirk kept,
- per-pixel final attribution: mean-pool split + value-projection + projector
  epsilon rules (aoamodel.py:1137-1152), vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.aoa import AOAFeatures, AOAParams, multi_head_attention
from ..models.core import linear
from .rules import (
    lrp_elem_eps,
    lrp_linear_eps,
    lrp_linear_eps_onehot,
    stabilize,
)


class AOAStash(NamedTuple):
    x: jax.Array  # (T, E+H)
    h: jax.Array  # (T+1, H)
    c: jax.Array  # (T+1, H)
    g: jax.Array  # (T, H)
    i: jax.Array  # (T, H)
    f: jax.Array  # (T, H)
    o: jax.Array  # (T, H)
    alpha: jax.Array  # (T, nh, P)
    context: jax.Array  # (T, H)
    context_aoa: jax.Array  # (T, H)
    context_aoa_gate: jax.Array  # (T, H)
    context_aoa_linear: jax.Array  # (T, H)
    predictions: jax.Array  # (T, V)


def stash_forward(
    params: AOAParams,
    feats: AOAFeatures,
    tokens: jax.Array,  # (T,)
    *,
    num_head: int,
    language_double_bias_i: bool = True,
) -> AOAStash:
    p = params
    glob = feats.global_feat[0].astype(jnp.float32)
    key = feats.key[0].astype(jnp.float32)
    value = feats.value[0].astype(jnp.float32)
    hidden = p.language_lstm.w_hh.shape[1]
    b2 = p.language_lstm.b_ih if language_double_bias_i else p.language_lstm.b_hh

    def body(carry, tok):
        h, c = carry
        emb = p.embedding[tok].astype(jnp.float32)
        x = jnp.concatenate([emb, glob])
        z = x @ p.language_lstm.w_ih.T + h @ p.language_lstm.w_hh.T
        z = z + p.language_lstm.b_ih + b2
        zi, zf, zg, zo = jnp.split(z, 4)
        i = jax.nn.sigmoid(zi)
        f = jax.nn.sigmoid(zf)
        o = jax.nn.sigmoid(zo)
        c_new = f * c + i * jnp.tanh(zg)
        h_new = o * jnp.tanh(c_new)
        q = linear(p.q_proj, h_new)
        ctx, alpha = multi_head_attention(
            q[None], key[None], value[None], num_head, train=False
        )
        ctx, alpha = ctx[0], alpha[0]
        gate = linear(p.aoa_linear_gate, h_new)
        lin = linear(p.aoa_linear, ctx)
        ctx_aoa = jax.nn.sigmoid(gate) * lin
        logits = linear(p.fc, ctx_aoa + h_new)
        out = (x, h, c, zg, i, f, o, alpha, ctx, ctx_aoa, gate, lin, logits,
               h_new, c_new)
        return (h_new, c_new), out

    z0 = jnp.zeros((hidden,), jnp.float32)
    (hT, cT), outs = jax.lax.scan(body, (z0, z0), tokens)
    (x, hp, cp, g, i, f, o, alpha, ctx, ctx_aoa, gate, lin, logits,
     hn, cn) = outs
    return AOAStash(
        x=x,
        h=jnp.concatenate([hp, hT[None]]),
        c=jnp.concatenate([cp, cT[None]]),
        g=g, i=i, f=f, o=o, alpha=alpha,
        context=ctx, context_aoa=ctx_aoa,
        context_aoa_gate=gate, context_aoa_linear=lin,
        predictions=logits,
    )


class AOAWordExplanation(NamedTuple):
    r_img_feature: jax.Array  # (P, C_raw)
    r_words: jax.Array  # (T,)
    r_v_proj: jax.Array  # (P, H)


def lrp_mha_single_head(
    alpha: jax.Array,  # (nh, P)
    value: jax.Array,  # (P, H)
    r_context: jax.Array,  # (H,)
    context: jax.Array,  # (H,)
    head_idx: jax.Array,
    num_head: int,
) -> jax.Array:
    """"Spread single head" MHA relevance (aoamodel.py:847-860): (P, H)."""
    P, H = value.shape
    d_k = H // num_head
    v_h = value.reshape(P, num_head, d_k)  # per-head blocks
    r_ctx_h = r_context.reshape(num_head, d_k)
    ctx_h = context.reshape(num_head, d_k)
    # r_value[h, i, :] = (v[h,i]*alpha[h,i]) / stab(ctx[h]) * r_ctx[h]
    r_all = (
        v_h.transpose(1, 0, 2) * alpha[:, :, None]
    ) / stabilize(ctx_h)[:, None, :] * r_ctx_h[:, None, :]  # (nh, P, dk)
    head_mask = (jnp.arange(num_head) == head_idx)[:, None, None]
    r_sel = jnp.where(head_mask, r_all, 0.0)
    return r_sel.transpose(1, 0, 2).reshape(P, H)


def explain_word(
    params: AOAParams,
    feats: AOAFeatures,
    stash: AOAStash,
    t: jax.Array,
    *,
    target: jax.Array,
    head_idx: jax.Array,
    num_head: int,
    bu: bool = False,
) -> AOAWordExplanation:
    """Relevance walk for one word / one attention head
    (explain_caption_wordt, aoamodel.py:1067-1160)."""
    p = params
    T, hidden = stash.g.shape
    embed = p.embedding.shape[1]
    P = feats.raw.shape[1]

    raw = feats.raw[0].astype(jnp.float32)
    v_proj = feats.v_proj[0].astype(jnp.float32)
    v_proj_pre = feats.v_proj_pre[0].astype(jnp.float32)
    glob = feats.global_feat[0].astype(jnp.float32)
    value = feats.value[0].astype(jnp.float32)

    def g_chunk(w):
        h4 = w.shape[0] // 4
        return w[2 * h4 : 3 * h4]

    w_g = jnp.concatenate(
        [g_chunk(p.language_lstm.w_ih), g_chunk(p.language_lstm.w_hh)], axis=1
    ).astype(jnp.float32)  # (H, E+2H)
    fc_w = p.fc.weight.astype(jnp.float32)

    # seeds (aoamodel.py:1092-1111)
    preds_t = stash.predictions[t]
    mix = stash.h[t + 1] + stash.context_aoa[t]
    # one-hot fc seed in closed form (aoamodel.py:1092-1097) — exact
    r_mix = lrp_linear_eps_onehot(
        preds_t[target], mix, preds_t[target], fc_w[target])
    seed_h = lrp_elem_eps(r_mix, stash.h[t + 1], mix)
    r_ctx_aoa = lrp_elem_eps(r_mix, stash.context_aoa[t], mix)
    r_context = lrp_linear_eps(
        r_ctx_aoa, stash.context[t], stash.context_aoa_linear[t],
        p.aoa_linear.weight.astype(jnp.float32),
    )
    r_value = lrp_mha_single_head(
        stash.alpha[t], value, r_context, stash.context[t], head_idx, num_head
    )

    xh = jnp.concatenate([stash.x, stash.h[:T]], axis=1)  # (T, E+2H)

    def body(carry, i):
        rh_next, r_glob = carry
        is_t = (i == t).astype(jnp.float32)
        rh = rh_next + is_t * seed_h
        # quirk: r_ct[i+1] = r_ht[i+1] (assignment — cell relevance dropped)
        rc = rh
        r_g = lrp_elem_eps(rc, stash.i[i] * jnp.tanh(stash.g[i]), stash.c[i + 1])
        r_xh = lrp_linear_eps(r_g, xh[i], stash.g[i], w_g)
        rh_prev = r_xh[hidden + embed :]
        r_glob = r_glob + r_xh[embed : embed + hidden]
        return (rh_prev, r_glob), jnp.sum(r_xh[:embed])

    zeros_h = jnp.zeros((hidden,), jnp.float32)
    (rh_last, r_glob), r_words_rev = jax.lax.scan(
        body, (zeros_h, jnp.zeros((hidden,), jnp.float32)),
        jnp.arange(T - 1, -1, -1),
    )
    r_words = r_words_rev[::-1]

    # per-pixel final attribution (aoamodel.py:1137-1152)
    r_vp = (v_proj / P) / stabilize(glob)[None, :] * r_glob[None, :]
    r_vp = r_vp + raw_dot_value(r_value, v_proj, value, p)
    w_proj = p.img_projector.weight.astype(jnp.float32)
    r_img = raw * ((r_vp / stabilize(v_proj_pre)) @ w_proj)

    valid = jnp.arange(T) <= t
    r_words = jnp.where(valid, r_words, 0.0)
    m = jnp.max(jnp.abs(r_words))
    r_words = jnp.where(m > 0, r_words / m, r_words)
    return AOAWordExplanation(r_img, r_words, r_vp)


def raw_dot_value(r_value, v_proj, value, p: AOAParams):
    """epsilon rule through decoder_v_proj per pixel (aoamodel.py:1143-1147)."""
    w_v = p.decoder_v_proj.weight.astype(jnp.float32)
    return v_proj * ((r_value / stabilize(value)) @ w_v)


def explain_all_words(
    params: AOAParams,
    feats: AOAFeatures,
    stash: AOAStash,
    *,
    targets: jax.Array,
    head_idx: jax.Array,
    num_head: int,
    bu: bool = False,
) -> AOAWordExplanation:
    T = stash.g.shape[0]
    return jax.vmap(
        lambda t, tg: explain_word(
            params, feats, stash, t, target=tg, head_idx=head_idx,
            num_head=num_head, bu=bu,
        )
    )(jnp.arange(T), targets)
