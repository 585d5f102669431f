"""GridTD captioning model: top-down two-LSTM decoder with adaptive attention.

TPU-native re-design of the reference ``GridTDModel`` (gridTDmodel.py:106-702):
AdaLSTM (input ``[h2_{t-1}, global_img, w_emb]``) -> AdaptiveAttention over P
pixels with visual sentinel -> LanguageLSTM over ``[c_hat_t, h1_t]`` -> logits
``fc(dropout(c_hat_t + h2_t))`` (gridTDmodel.py:137-144).

The per-token Python loop of the reference (``forward``, gridTDmodel.py:181-197)
becomes a single ``lax.scan``; the same ``step`` function drives training,
greedy/beam/diverse-beam decoding and the LRP stash-forward.

Both the CNN path (P=196 grid pixels through a 1x1-conv projector,
gridTDmodel.py:123) and the bottom-up path (P=36 region features through a
Linear projector, ``GridTDModelBU`` gridTDmodel.py:1879-1883) share this module:
a 1x1 conv over a pixel grid *is* a per-pixel Linear, so ``img_projector`` is a
single LinearParams applied to (B, P, C) features in both cases.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from .core import (
    AdaptiveAttentionParams,
    AdaptiveLSTMCellParams,
    LinearParams,
    LSTMCellParams,
    adaptive_attention,
    adaptive_lstm_step,
    dropout,
    init_adaptive_attention,
    init_adaptive_lstm_cell,
    init_embedding,
    init_linear,
    init_lstm_cell,
    linear,
    lstm_step,
)


@struct.dataclass
class GridTDParams:
    embedding: jax.Array  # (num_embeddings, E)
    img_projector: LinearParams  # (H, C_raw): 1x1 conv == per-pixel linear
    global_img_feature_proj: LinearParams  # (E, C_raw)
    ada_lstm: AdaptiveLSTMCellParams  # input 2E + H
    language_lstm: LSTMCellParams  # input 2H
    ada_attention: AdaptiveAttentionParams
    fc: LinearParams  # (V, H)


class GridTDState(NamedTuple):
    h1: jax.Array
    c1: jax.Array
    h2: jax.Array
    c2: jax.Array


class Features(NamedTuple):
    """Encoded visual features consumed by the decoder step.

    v_proj: (B, P, H) relu'd projected grid; global_feat: (B, E) relu'd global.
    The *_pre fields are pre-activation values stashed for LRP
    (gridTDmodel.py:944-947); raw/avg are the encoder outputs."""

    v_proj: jax.Array
    global_feat: jax.Array
    raw: jax.Array  # (B, P, C_raw)
    avg: jax.Array  # (B, C_raw)
    v_proj_pre: jax.Array
    global_feat_pre: jax.Array


class StepAux(NamedTuple):
    alpha: jax.Array  # (B, P)
    beta: jax.Array  # (B, 1)


def mask_padded_logits(logits: jax.Array, vocab_size: int) -> jax.Array:
    """Pin padded vocab columns to -1e9 so decode/CE never select them."""
    if logits.shape[-1] == vocab_size:
        return logits
    ids = jnp.arange(logits.shape[-1])
    return jnp.where(ids < vocab_size, logits, -1e9)


def init_gridtd(rng: jax.Array, cfg: ModelConfig, raw_dim: int) -> GridTDParams:
    e, h = cfg.embed_dim, cfg.hidden_dim
    r = jax.random.split(rng, 6)
    num_emb = cfg.padded_vocab
    # BU variant projects the *mean of projected regions* (H) to E
    # (gridTDmodel.py:1880-1881); the CNN path projects the raw avg feature.
    global_in = h if cfg.is_bu else raw_dim
    return GridTDParams(
        embedding=init_embedding(r[0], num_emb, e),
        img_projector=init_linear(r[1], raw_dim, h),
        global_img_feature_proj=init_linear(r[2], global_in, e),
        ada_lstm=init_adaptive_lstm_cell(r[3], 2 * e + h, h),
        language_lstm=init_lstm_cell(r[4], 2 * h, h),
        ada_attention=init_adaptive_attention(r[5], h, cfg.num_pixels),
        fc=init_linear(jax.random.fold_in(rng, 7), h, num_emb),
    )


def encode_features(params: GridTDParams, raw: jax.Array, avg: jax.Array) -> Features:
    """Project encoder outputs (raw grid (B, P, C), avg (B, C)) into decoder
    features (gridTDmodel.py:157-162)."""
    v_pre = linear(params.img_projector, raw)  # (B, P, H)
    g_pre = linear(params.global_img_feature_proj, avg)  # (B, E)
    return Features(
        v_proj=jax.nn.relu(v_pre),
        global_feat=jax.nn.relu(g_pre),
        raw=raw,
        avg=avg,
        v_proj_pre=v_pre,
        global_feat_pre=g_pre,
    )


def encode_features_bu(params: GridTDParams, regions: jax.Array) -> Features:
    """Bottom-up path (GridTDModelBU.forward, gridTDmodel.py:1913-1917):
    project 36 region features with a Linear; the global feature is
    ``relu(W_g(mean of the relu'd projected regions))`` with W_g: H -> E."""
    v_pre = linear(params.img_projector, regions)  # (B, 36, H)
    v = jax.nn.relu(v_pre)
    avg = v.mean(axis=1)  # (B, H)
    g_pre = linear(params.global_img_feature_proj, avg)  # (B, E)
    return Features(
        v_proj=v,
        global_feat=jax.nn.relu(g_pre),
        raw=regions,
        avg=avg,
        v_proj_pre=v_pre,
        global_feat_pre=g_pre,
    )


def init_state(batch_size: int, hidden_dim: int, dtype=jnp.float32) -> GridTDState:
    z = jnp.zeros((batch_size, hidden_dim), dtype)
    return GridTDState(z, z, z, z)


def step(
    params: GridTDParams,
    feats: Features,
    state: GridTDState,
    token: jax.Array,  # (B,) int32
    *,
    rng: jax.Array | None = None,
    train: bool = False,
    dropout_rate: float = 0.5,
) -> tuple[jax.Array, StepAux, GridTDState]:
    """One decoder step (predict_next_word, gridTDmodel.py:137-144, with the
    x_t construction of gridTDmodel.py:189)."""
    emb = params.embedding[token]  # (B, E)
    x1 = jnp.concatenate([state.h2, feats.global_feat, emb], axis=-1)
    h1, c1, s, _ = adaptive_lstm_step(params.ada_lstm, x1, state.h1, state.c1)
    att = adaptive_attention(params.ada_attention, feats.v_proj, h1, s)
    x2 = jnp.concatenate([att.c_hat, h1], axis=-1)
    h2, c2, _ = lstm_step(params.language_lstm, x2, state.h2, state.c2)
    logits = linear(params.fc, dropout(rng, att.c_hat + h2, dropout_rate, train))
    return logits, StepAux(att.alpha, att.beta), GridTDState(h1, c1, h2, c2)


def forward(
    params: GridTDParams,
    feats: Features,
    captions: jax.Array,  # (B, L) int32 teacher-forcing inputs
    *,
    num_steps: int,
    ss_prob: float | None = None,
    rng: jax.Array | None = None,
    train: bool = True,
    dropout_rate: float = 0.5,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Teacher-forced forward as one ``lax.scan`` (replaces the Python loop at
    gridTDmodel.py:181-197).  Returns (logits (B,T,V), alphas (B,T,P),
    betas (B,T,1)) with T = num_steps.

    Scheduled sampling (gridTDmodel.py:171-197): a per-batch-element mask is
    drawn once; for t > 2, masked elements feed the argmax of the previous
    step's logits instead of the gold token."""
    b = captions.shape[0]
    hidden = params.language_lstm.w_hh.shape[1]
    state0 = init_state(b, hidden, feats.v_proj.dtype)

    if ss_prob is not None and rng is not None:
        rng, ss_rng = jax.random.split(rng)
        ss_mask = jax.random.uniform(ss_rng, (b,)) < ss_prob  # (B,) bool
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
            params, feats, state, token,
            rng=srng if rng is not None else None,
            train=train, dropout_rate=dropout_rate,
        )
        last_label = jnp.argmax(jax.nn.log_softmax(logits, -1), -1)
        return (state, last_label), (logits, aux.alpha, aux.beta)

    ts = jnp.arange(num_steps)
    tokens = captions[:, :num_steps].T  # (T, B)
    (_, _), (logits, alphas, betas) = jax.lax.scan(
        body, (state0, jnp.zeros((b,), jnp.int32)), (ts, tokens, step_rngs)
    )
    # scan stacks on axis 0 (time) — move batch first.
    return (
        jnp.moveaxis(logits, 0, 1),
        jnp.moveaxis(alphas, 0, 1),
        jnp.moveaxis(betas, 0, 1),
    )
