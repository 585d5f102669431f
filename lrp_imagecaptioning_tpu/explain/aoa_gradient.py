"""AoA gradient-family decoder walk (ExplainAOAGradient.explain_caption_wordt,
aoamodel.py:1435-1501), faithful to its hand-rolled chain rule:

- the AoA gate IS differentiated here (both branches,
  aoamodel.py:1466-1471) unlike the attention weights (alphas constant),
- ``gradient_mha``: d_value[head, j] = d_context_head * alpha[head, j] for the
  selected head only (aoamodel.py:1426-1433); the query path gets no gradient,
- quirk: ``d_global_img_feature = d_xt[i][E:]`` is an *assignment* inside the
  reverse loop (aoamodel.py:1489) — only the i=0 iteration's value survives,
- no ReLU gating on the projected features (plain gradient variant); the
  guided variant's extra mask ``d_img_feature[image_features < 0] = 0``
  (aoamodel.py:1623) is a no-op on post-relu features and kept for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.aoa import AOAFeatures, AOAParams
from .aoa_lrp import AOAStash, AOAWordExplanation


def gradient_word(
    params: AOAParams,
    feats: AOAFeatures,
    stash: AOAStash,
    t: jax.Array,
    *,
    target: jax.Array,
    head_idx: jax.Array,
    num_head: int,
    guided: bool = False,
) -> AOAWordExplanation:
    p = params
    T, hidden = stash.g.shape
    embed = p.embedding.shape[1]
    P = feats.raw.shape[1]
    d_k = hidden // num_head

    fc_w = p.fc.weight.astype(jnp.float32)
    w_ih = p.language_lstm.w_ih.astype(jnp.float32)
    w_hh = p.language_lstm.w_hh.astype(jnp.float32)

    seed = fc_w[target]
    # AoA gate backward (aoamodel.py:1466-1471)
    sig_gate = jax.nn.sigmoid(stash.context_aoa_gate[t])
    d_A = seed * sig_gate
    d_B = seed * stash.context_aoa_linear[t] * (1 - sig_gate) * sig_gate
    d_context = d_A @ p.aoa_linear.weight.astype(jnp.float32)
    seed_h_extra = d_B @ p.aoa_linear_gate.weight.astype(jnp.float32)

    # gradient_mha for the selected head (aoamodel.py:1426-1433)
    d_ctx_h = d_context.reshape(num_head, d_k)
    d_val_all = d_ctx_h[:, None, :] * stash.alpha[t][:, :, None]  # (nh, P, dk)
    mask = (jnp.arange(num_head) == head_idx)[:, None, None]
    d_value = jnp.where(mask, d_val_all, 0.0).transpose(1, 0, 2).reshape(P, hidden)

    def body(carry, i):
        d_h_next, d_c_next, d_glob = carry
        is_t = (i == t).astype(jnp.float32)
        d_h = d_h_next + is_t * (seed + seed_h_extra)
        tanh_c = jnp.tanh(stash.c[i + 1])
        g_act = jnp.tanh(stash.g[i])
        d_o_act = d_h * tanh_c
        d_c = d_c_next + d_h * stash.o[i] * (1 - tanh_c**2)
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
        d_h_prev = d_gates @ w_hh
        d_x = d_gates @ w_ih
        # assignment quirk: final value is iteration i=0's (aoamodel.py:1489)
        d_glob = jnp.where(i == 0, d_x[embed:], d_glob)
        return (d_h_prev, d_c_prev, d_glob), jnp.sum(d_x[:embed])

    zeros_h = jnp.zeros((hidden,), jnp.float32)
    (_, _, d_glob), d_words_rev = jax.lax.scan(
        body, (zeros_h, zeros_h, zeros_h), jnp.arange(T - 1, -1, -1)
    )
    d_words = d_words_rev[::-1]

    raw = feats.raw[0].astype(jnp.float32)
    w_v = p.decoder_v_proj.weight.astype(jnp.float32)
    w_proj = p.img_projector.weight.astype(jnp.float32)
    d_vp = d_value @ w_v + d_glob[None, :] / P
    d_img = d_vp @ w_proj
    if guided:
        d_img = jnp.where(raw < 0, 0.0, d_img)  # no-op post-relu; parity

    valid = jnp.arange(T) <= t
    d_words = jnp.where(valid, d_words, 0.0)
    m = jnp.max(jnp.abs(d_words))
    d_words = jnp.where(m > 0, d_words / m, d_words)
    return AOAWordExplanation(d_img, d_words, d_vp)


def gradient_all_words(
    params, feats, stash, *, targets, head_idx, num_head, guided=False
) -> AOAWordExplanation:
    T = stash.g.shape[0]
    return jax.vmap(
        lambda t, tg: gradient_word(
            params, feats, stash, t, target=tg, head_idx=head_idx,
            num_head=num_head, guided=guided,
        )
    )(jnp.arange(T), targets)
