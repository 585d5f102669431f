"""Gradient-family decoder walks for GridTD: Gradient / GuidedBackprop /
Grad-CAM seeds.

Faithful re-implementation of the reference's *hand-rolled* backward
(``ExplainGridTDGradient.explain_caption_wordt``, gridTDmodel.py:1424-1508) as
a reverse ``lax.scan``.  This is deliberately NOT ``jax.grad`` of the forward:
the reference's manual chain rule makes specific approximations that autodiff
would not reproduce, and parity requires them:

- the attention weights alpha, beta and the sentinel gate are treated as
  constants (no gradient through the attention score network),
- the sentinel path only differentiates ``s = sen_gate * tanh(c1)`` w.r.t.
  ``c1`` (gridTDmodel.py:1481),
- the recurrent h1 gradient computed at step i+1 is overwritten at step i
  (``d_h1t[i+1] = d_x2t[i][H:]``, gridTDmodel.py:1482 clobbers 1494) — same
  clobber as the LRP walk,
- the ReLUs on the projected features are NOT gated in the plain Gradient
  variant; the Guided variant masks them (gridTDmodel.py:1663-1674) — note
  those masks are mostly no-ops because the activations are post-ReLU,
  except ``d_img_feature[image_features <= 0] = 0`` which zeroes gradients at
  exactly-zero features,
- the seed is the one-hot vector (1.0), not the logit value
  (gridTDmodel.py:1428-1429).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.gridtd import Features, GridTDParams
from .gridtd_lrp import GridTDStash, WordExplanation


def gradient_word(
    params: GridTDParams,
    feats: Features,
    stash: GridTDStash,
    t: jax.Array,
    *,
    target: jax.Array,
    guided: bool = False,
    bu: bool = False,
) -> WordExplanation:
    """One explained word's manual gradient walk.  Returns gradients w.r.t.
    the raw feature grid (P, C), word-embedding relevance (T,), and the
    projected-feature gradients (P, H)."""
    p = params
    T, hidden = stash.g1.shape
    embed = p.global_img_feature_proj.weight.shape[0]
    P = stash.alpha.shape[1]

    w_ih1 = p.ada_lstm.lstm.w_ih.astype(jnp.float32)
    w_hh1 = p.ada_lstm.lstm.w_hh.astype(jnp.float32)
    w_ih2 = p.language_lstm.w_ih.astype(jnp.float32)
    w_hh2 = p.language_lstm.w_hh.astype(jnp.float32)
    fc_w = p.fc.weight.astype(jnp.float32)

    seed = fc_w[target]  # one-hot @ fc.weight (gridTDmodel.py:1459)

    def body(carry, i):
        d_c1_next, d_c2_next, d_h2_next, d_vp, d_glob = carry
        is_t = (i == t).astype(jnp.float32)
        d_h2 = d_h2_next + is_t * seed

        tanh_c2 = jnp.tanh(stash.c2[i + 1])
        g2_act = jnp.tanh(stash.g2[i])
        d_o2_act = d_h2 * tanh_c2
        d_c2 = d_c2_next + d_h2 * stash.o2[i] * (1 - tanh_c2**2)
        d_f2_act = d_c2 * stash.c2[i]
        d_c2_prev = d_c2 * stash.f2[i]
        d_i2_act = d_c2 * g2_act
        d_g2_act = d_c2 * stash.i2[i]
        d_gates2 = jnp.concatenate([
            d_i2_act * stash.i2[i] * (1 - stash.i2[i]),
            d_f2_act * stash.f2[i] * (1 - stash.f2[i]),
            d_g2_act * (1 - g2_act**2),
            d_o2_act * stash.o2[i] * (1 - stash.o2[i]),
        ])
        d_h2_prev_a = d_gates2 @ w_hh2
        d_x2 = d_gates2 @ w_ih2
        d_ctx_hat = is_t * seed + d_x2[:hidden]
        d_context = d_ctx_hat * (1 - stash.beta[i])
        d_vp = d_vp + stash.alpha[i][:, None] * d_context[None, :]
        d_s = d_ctx_hat * stash.beta[i]

        tanh_c1 = jnp.tanh(stash.c1[i + 1])
        g1_act = jnp.tanh(stash.g1[i])
        d_c1_mid = d_c1_next + d_s * stash.sen_gate[i] * (1 - tanh_c1**2)
        d_h1_i = d_x2[hidden:]
        d_o1_act = d_h1_i * tanh_c1
        d_c1 = d_c1_mid + d_h1_i * stash.o1[i] * (1 - tanh_c1**2)
        d_f1_act = d_c1 * stash.c1[i]
        d_c1_prev = d_c1 * stash.f1[i]
        d_i1_act = d_c1 * g1_act
        d_g1_act = d_c1 * stash.i1[i]
        d_gates1 = jnp.concatenate([
            d_i1_act * stash.i1[i] * (1 - stash.i1[i]),
            d_f1_act * stash.f1[i] * (1 - stash.f1[i]),
            d_g1_act * (1 - g1_act**2),
            d_o1_act * stash.o1[i] * (1 - stash.o1[i]),
        ])
        d_x1 = d_gates1 @ w_ih1
        d_glob = d_glob + d_x1[hidden : hidden + embed]
        d_wemb_i = d_x1[hidden + embed :]
        d_h2_prev_b = d_x1[:hidden]
        carry = (
            d_c1_prev, d_c2_prev, d_h2_prev_a + d_h2_prev_b, d_vp, d_glob,
        )
        return carry, jnp.sum(d_wemb_i)

    zeros_h = jnp.zeros((hidden,), jnp.float32)
    carry0 = (zeros_h, zeros_h, zeros_h,
              jnp.zeros((P, hidden), jnp.float32),
              jnp.zeros((embed,), jnp.float32))
    idx = jnp.arange(T - 1, -1, -1)
    (_, _, _, d_vp, d_glob), d_words_rev = jax.lax.scan(body, carry0, idx)
    d_words = d_words_rev[::-1]

    raw = feats.raw[0].astype(jnp.float32)
    v_proj = feats.v_proj[0].astype(jnp.float32)
    glob = feats.global_feat[0].astype(jnp.float32)
    if guided:
        # guided masks (gridTDmodel.py:1663-1665) — no-ops post-relu but kept
        # for literal parity
        d_glob = jnp.where(glob < 0, 0.0, d_glob)
        d_vp = jnp.where(v_proj < 0, 0.0, d_vp)

    w_glob = p.global_img_feature_proj.weight.astype(jnp.float32)
    w_proj = p.img_projector.weight.astype(jnp.float32)
    if not bu:
        d_avg = d_glob @ w_glob  # (C,)
        d_img = d_avg[None, :] / P + d_vp @ w_proj
        if guided:
            # gridTDmodel.py:1674: zero where raw features <= 0 (meaningful —
            # VGG features are post-relu so this kills exact zeros)
            d_img = jnp.where(raw <= 0, 0.0, d_img)
    else:
        # BU graph: glob = relu(W_g(mean(v_proj))) — propagate through the
        # mean like the reference's avg-pool split, then the region projector.
        d_avg_h = d_glob @ w_glob  # (H,)
        d_vp = d_vp + d_avg_h[None, :] / P
        d_img = d_vp @ w_proj
        if guided:
            d_img = jnp.where(raw <= 0, 0.0, d_img)

    m = jnp.max(jnp.abs(jnp.where(jnp.arange(T) <= t, d_words, 0.0)))
    d_words = jnp.where(jnp.arange(T) <= t, d_words, 0.0)
    d_words = jnp.where(m > 0, d_words / m, d_words)
    return WordExplanation(d_img, d_words, d_vp)


def gradient_all_words(
    params: GridTDParams, feats: Features, stash: GridTDStash, *,
    targets: jax.Array, guided: bool = False, bu: bool = False,
) -> WordExplanation:
    T = stash.g1.shape[0]
    return jax.vmap(
        lambda t, tg: gradient_word(
            params, feats, stash, t, target=tg, guided=guided, bu=bu
        )
    )(jnp.arange(T), targets)


def grad_cam(feature_grid: jax.Array, grads: jax.Array) -> jax.Array:
    """Grad-CAM over the feature grid (gridTDmodel.py:1760-1771).
    feature_grid/grads: (P, C).  Returns (P,) normalized CAM."""
    weights = jnp.mean(grads, axis=0, keepdims=True)  # spatial mean per channel
    cam = jnp.sum(feature_grid * weights, axis=-1)  # (P,)
    cam = jnp.maximum(cam, 0.0)
    return cam / (jnp.max(jnp.abs(cam)) + 1e-6)
