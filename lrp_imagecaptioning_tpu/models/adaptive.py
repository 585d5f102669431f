"""Adaptive-attention captioning model (Lu et al.) — single-LSTM decoder.

Rebuild of ``AdaptiveAttentionCaptioningModel`` (adaptiveattention.py:101-489):
AdaLSTM (input ``[w_emb, global_img]``, width 2E) -> AdaptiveAttention with
visual sentinel -> logits ``fc(dropout(c_hat + h))``
(adaptiveattention.py:128-136).  Shares the GridTD feature encoding
(conv-projected grid + relu'd Linear global, adaptiveattention.py:147-156) and
the core AdaptiveLSTMCell/AdaptiveAttention modules.

The reference's adaptive config exposes only ``cider_tune``
(config.py:42 — no lrp flags), so this family has no LRP-tuning hooks.
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
    adaptive_attention,
    adaptive_lstm_step,
    dropout,
    init_adaptive_attention,
    init_adaptive_lstm_cell,
    init_embedding,
    init_linear,
    linear,
)
from .gridtd import Features, StepAux, encode_features  # shared encoding


@struct.dataclass
class AdaptiveParams:
    embedding: jax.Array
    img_projector: LinearParams  # (H, C_raw)
    global_img_feature_proj: LinearParams  # (E, C_raw)
    ada_lstm: AdaptiveLSTMCellParams  # input 2E
    ada_attention: AdaptiveAttentionParams
    fc: LinearParams


class AdaptiveState(NamedTuple):
    h: jax.Array
    c: jax.Array


def init_adaptive(rng: jax.Array, cfg: ModelConfig, raw_dim: int) -> AdaptiveParams:
    e, h = cfg.embed_dim, cfg.hidden_dim
    r = jax.random.split(rng, 6)
    return AdaptiveParams(
        embedding=init_embedding(r[0], cfg.padded_vocab, e),
        img_projector=init_linear(r[1], raw_dim, h),
        global_img_feature_proj=init_linear(r[2], raw_dim, e),
        ada_lstm=init_adaptive_lstm_cell(r[3], 2 * e, h),
        ada_attention=init_adaptive_attention(r[4], h, cfg.num_pixels),
        fc=init_linear(r[5], h, cfg.padded_vocab),
    )


def init_state(batch_size: int, hidden_dim: int, dtype=jnp.float32) -> AdaptiveState:
    z = jnp.zeros((batch_size, hidden_dim), dtype)
    return AdaptiveState(z, z)


def step(
    params: AdaptiveParams,
    feats: Features,
    state: AdaptiveState,
    token: jax.Array,
    *,
    rng: jax.Array | None = None,
    train: bool = False,
    dropout_rate: float = 0.5,
) -> tuple[jax.Array, StepAux, AdaptiveState]:
    """predict_next_word (adaptiveattention.py:128-136)."""
    emb = params.embedding[token]
    x = jnp.concatenate([emb, feats.global_feat], axis=-1)
    h, c, s, _ = adaptive_lstm_step(params.ada_lstm, x, state.h, state.c)
    att = adaptive_attention(params.ada_attention, feats.v_proj, h, s)
    logits = linear(params.fc, dropout(rng, att.c_hat + h, dropout_rate, train))
    return logits, StepAux(att.alpha, att.beta), AdaptiveState(h, c)


def forward(
    params: AdaptiveParams,
    feats: Features,
    captions: jax.Array,
    *,
    num_steps: int,
    ss_prob: float | None = None,
    rng: jax.Array | None = None,
    train: bool = True,
    dropout_rate: float = 0.5,
):
    """Teacher-forced forward as lax.scan (adaptiveattention.py:137-192)."""
    b = captions.shape[0]
    hidden = params.ada_lstm.lstm.w_hh.shape[1]
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
        token = jnp.where(ss_mask & (t > 2), last_label, token_gold)
        logits, aux, state = step(
            params, feats, state, token,
            rng=srng if rng is not None else None,
            train=train, dropout_rate=dropout_rate,
        )
        last_label = jnp.argmax(jax.nn.log_softmax(logits, -1), -1)
        return (state, last_label), (logits, aux.alpha, aux.beta)

    (_, _), (logits, alphas, betas) = jax.lax.scan(
        body, (state0, jnp.zeros((b,), jnp.int32)),
        (jnp.arange(num_steps), captions[:, :num_steps].T, step_rngs),
    )
    return (
        jnp.moveaxis(logits, 0, 1),
        jnp.moveaxis(alphas, 0, 1),
        jnp.moveaxis(betas, 0, 1),
    )
