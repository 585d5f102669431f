"""AoA (Attention-on-Attention) captioning model.

TPU-native re-design of the reference ``AOAModel`` / ``AOAModelBU``
(aoamodel.py:111-745, 1779-2396): LanguageLSTM over ``[w_emb, global]`` ->
multi-head scaled-dot attention (q = W_q h_t, k/v = per-image projections of
the grid) -> AoA gate ``sigmoid(W_g h_t) * (W_l context)`` -> logits
``fc(dropout(ctx_aoa + h_t))`` (aoamodel.py:147-163).

TPU-first differences with identical numerics:

- the k/v projections depend only on the image, so they are computed ONCE at
  encode time (the reference recomputes them every decoder step,
  aoamodel.py:157-158; its own explainer precomputes like we do,
  aoamodel.py:1010-1011),
- the per-step Python loop is a ``lax.scan``; decoding flows through the
  shared fixed-shape suite via the same step-function protocol as GridTD.

The general ``MultiHeadedDotAttention`` options (BatchNorm1d on q, k/v
projections, GLU AoA refiner, aoamodel.py:54-108) exist in
:func:`multi_head_attention` for completeness; ``AOAModel`` instantiates the
decoder variant with all three off (aoamodel.py:135).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from .core import (
    LinearParams,
    LSTMCellParams,
    dropout,
    init_embedding,
    init_linear,
    init_lstm_cell,
    linear,
    lstm_step,
)


@struct.dataclass
class AOAParams:
    embedding: jax.Array  # (V, E)
    img_projector: LinearParams  # (H, C_raw) 1x1 conv == per-pixel linear
    language_lstm: LSTMCellParams  # input E + H
    decoder_k_proj: LinearParams  # (H, H)
    decoder_v_proj: LinearParams  # (H, H)
    q_proj: LinearParams  # (H, H) — decoder_multihead_attention.q_proj
    aoa_linear_gate: LinearParams  # (H, H)
    aoa_linear: LinearParams  # (H, H)
    fc: LinearParams  # (V, H)


class AOAState(NamedTuple):
    h: jax.Array
    c: jax.Array


class AOAFeatures(NamedTuple):
    v_proj: jax.Array  # (B, P, H) relu'd projected grid
    global_feat: jax.Array  # (B, H) mean of projected grid
    raw: jax.Array  # (B, P, C_raw)
    v_proj_pre: jax.Array  # (B, P, H)
    key: jax.Array  # (B, P, H)
    value: jax.Array  # (B, P, H)


class AOAStepAux(NamedTuple):
    alpha: jax.Array  # (B, num_head, P)
    context: jax.Array  # (B, H)


def init_aoa(rng: jax.Array, cfg: ModelConfig, raw_dim: int) -> AOAParams:
    e, h = cfg.embed_dim, cfg.hidden_dim
    if h % cfg.num_head != 0:
        raise ValueError("hidden_dim must be divisible by num_head")
    r = jax.random.split(rng, 9)
    return AOAParams(
        embedding=init_embedding(r[0], cfg.padded_vocab, e),
        img_projector=init_linear(r[1], raw_dim, h),
        language_lstm=init_lstm_cell(r[2], e + h, h),
        decoder_k_proj=init_linear(r[3], h, h),
        decoder_v_proj=init_linear(r[4], h, h),
        q_proj=init_linear(r[5], h, h),
        aoa_linear_gate=init_linear(r[6], h, h),
        aoa_linear=init_linear(r[7], h, h),
        fc=init_linear(r[8], h, cfg.padded_vocab),
    )


def encode_features(params: AOAParams, raw: jax.Array) -> AOAFeatures:
    """raw grid (B, P, C) -> features with precomputed k/v.  Used for both the
    CNN path (raw = VGG grid) and the BU path (raw = region features) —
    identical structure per aoamodel.py:204-209 and :1840-1845."""
    v_pre = linear(params.img_projector, raw)
    v = jax.nn.relu(v_pre)
    return AOAFeatures(
        v_proj=v,
        global_feat=v.mean(axis=1),
        raw=raw,
        v_proj_pre=v_pre,
        key=linear(params.decoder_k_proj, v),
        value=linear(params.decoder_v_proj, v),
    )


def init_state(batch_size: int, hidden_dim: int, dtype=jnp.float32) -> AOAState:
    z = jnp.zeros((batch_size, hidden_dim), dtype)
    return AOAState(z, z)


def multi_head_attention(
    q: jax.Array,  # (B, H) single query
    key: jax.Array,  # (B, P, H)
    value: jax.Array,  # (B, P, H)
    num_head: int,
    *,
    attn_rng: jax.Array | None = None,
    attn_dropout: float = 0.1,
    train: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Scaled-dot MHA core (MultiHeadedDotAttention.attention,
    aoamodel.py:77-84).  Returns (context (B, H), alpha (B, heads, P))."""
    b, p, h = key.shape
    d_k = h // num_head
    qh = q.reshape(b, num_head, d_k)  # (B, nh, dk)
    kh = key.reshape(b, p, num_head, d_k).transpose(0, 2, 1, 3)  # (B, nh, P, dk)
    vh = value.reshape(b, p, num_head, d_k).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bnd,bnpd->bnp", qh, kh) / jnp.sqrt(
        jnp.asarray(d_k, jnp.float32)
    )
    alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    p_attn = alpha
    if train and attn_rng is not None and attn_dropout > 0:
        p_attn = dropout(attn_rng, p_attn, attn_dropout, True)
    ctx = jnp.einsum("bnp,bnpd->bnd", p_attn.astype(vh.dtype), vh)
    return ctx.reshape(b, h), alpha


@struct.dataclass
class BatchNorm1dParams:
    """Inference-mode BatchNorm1d as scale/shift (track_running_stats)."""

    scale: jax.Array  # gamma / sqrt(var + eps)
    shift: jax.Array  # beta - mean * scale


@struct.dataclass
class FullMHAParams:
    """The complete MultiHeadedDotAttention option set (aoamodel.py:54-108):
    optional BatchNorm1d on the query, optional k/v projections, optional GLU
    AoA refiner layer.  ``AOAModel`` itself instantiates the reduced variant
    (all three off, aoamodel.py:135); this exists for parity with the module's
    full surface (e.g. an encoder refiner)."""

    q_proj: LinearParams
    k_proj: LinearParams | None
    v_proj: LinearParams | None
    norm_q: BatchNorm1dParams | None
    aoa_layer: LinearParams | None  # (2H, 2H) before the GLU split


def full_mha(
    p: FullMHAParams,
    query: jax.Array,  # (B, H) single query
    key: jax.Array,  # (B, P, H)
    value: jax.Array,  # (B, P, H)
    num_head: int,
) -> tuple[jax.Array, jax.Array]:
    """MultiHeadedDotAttention.forward (aoamodel.py:86-108), inference mode.
    Returns (x (B, H), alpha (B, nh, P))."""
    q = query
    if p.norm_q is not None:
        q = q * p.norm_q.scale + p.norm_q.shift
    q_p = linear(p.q_proj, q)
    k = key if p.k_proj is None else linear(p.k_proj, key)
    v = value if p.v_proj is None else linear(p.v_proj, value)
    ctx, alpha = multi_head_attention(q_p, k, v, num_head)
    if p.aoa_layer is not None:
        # GLU over Linear(2H -> 2H) of [ctx, q], then residual add
        # (aoamodel.py:73-74, 'aoa_layer' Sequential(Linear, GLU) + Add)
        z = linear(p.aoa_layer, jnp.concatenate([ctx, q], axis=-1))
        a, b = jnp.split(z, 2, axis=-1)
        ctx = a * jax.nn.sigmoid(b) + q
    return ctx, alpha


def step(
    params: AOAParams,
    feats: AOAFeatures,
    state: AOAState,
    token: jax.Array,
    *,
    num_head: int,
    rng: jax.Array | None = None,
    train: bool = False,
    dropout_rate: float = 0.3,
) -> tuple[jax.Array, AOAStepAux, AOAState]:
    """One decoder step (AOAModel.predict_next_word, aoamodel.py:147-163)."""
    emb = params.embedding[token]
    x = jnp.concatenate([emb, feats.global_feat], axis=-1)
    h, c, _ = lstm_step(params.language_lstm, x, state.h, state.c)
    q = linear(params.q_proj, h)
    if rng is not None:
        rng, attn_rng = jax.random.split(rng)
    else:
        attn_rng = None
    ctx, alpha = multi_head_attention(
        q, feats.key, feats.value, num_head,
        attn_rng=attn_rng, train=train,
    )
    ctx_aoa = jax.nn.sigmoid(linear(params.aoa_linear_gate, h)) * linear(
        params.aoa_linear, ctx
    )
    logits = linear(params.fc, dropout(rng, ctx_aoa + h, dropout_rate, train))
    return logits, AOAStepAux(alpha, ctx), AOAState(h, c)


def forward(
    params: AOAParams,
    feats: AOAFeatures,
    captions: jax.Array,
    *,
    num_head: int,
    num_steps: int,
    ss_prob: float | None = None,
    rng: jax.Array | None = None,
    train: bool = True,
    dropout_rate: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced forward as lax.scan (AOAModel.forward,
    aoamodel.py:165-228).  Returns (logits (B,T,V), alphas (B,T,nh,P))."""
    b = captions.shape[0]
    hidden = params.language_lstm.w_hh.shape[1]
    state0 = init_state(b, hidden, feats.v_proj.dtype)

    if ss_prob is not None and rng is not None:
        rng, ss_rng = jax.random.split(rng)
        ss_mask = jax.random.uniform(ss_rng, (b,)) < ss_prob
    else:
        ss_mask = jnp.zeros((b,), bool)
    step_rngs = (
        jax.random.split(rng, num_steps) if rng is not None
        else jnp.zeros((num_steps, 2), jnp.uint32)
    )

    def body(carry, inp):
        state, last_label = carry
        t, token_gold, srng = inp
        use_model = ss_mask & (t > 2)
        token = jnp.where(use_model, last_label, token_gold)
        logits, aux, state = step(
            params, feats, state, token, num_head=num_head,
            rng=srng if rng is not None else None,
            train=train, dropout_rate=dropout_rate,
        )
        last_label = jnp.argmax(jax.nn.log_softmax(logits, -1), -1)
        return (state, last_label), (logits, aux.alpha)

    ts = jnp.arange(num_steps)
    tokens = captions[:, :num_steps].T
    (_, _), (logits, alphas) = jax.lax.scan(
        body, (state0, jnp.zeros((b,), jnp.int32)), (ts, tokens, step_rngs)
    )
    return jnp.moveaxis(logits, 0, 1), jnp.moveaxis(alphas, 0, 1)
