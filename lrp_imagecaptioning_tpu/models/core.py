"""Core functional layers shared by all captioning models.

Pure functions over explicit pytree params (``flax.struct`` dataclasses).  The
torch weight conventions of the reference are kept deliberately so the LRP
relevance formulas transcribe 1:1:

- ``Linear.weight`` is ``(out, in)`` and ``y = x @ W.T + b``
  (reference ``lrp_linear_eps`` expects this layout, gridTDmodel.py:522-547),
- LSTM cells store ``w_ih (4H, in)``, ``w_hh (4H, H)``, ``b_ih``, ``b_hh`` with
  torch's gate order ``(i, f, g, o)`` (gridTDmodel.py:581-592 chunks z into
  z0..z3 = i, f, g, o).

Everything is written to trace cleanly under ``jax.jit`` — no data-dependent
Python control flow, static shapes only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LinearParams:
    weight: jax.Array  # (out, in)
    bias: jax.Array | None = None  # (out,)


def linear(p: LinearParams, x: jax.Array) -> jax.Array:
    y = x @ p.weight.T
    if p.bias is not None:
        y = y + p.bias
    return y


def init_linear(
    rng: jax.Array, in_dim: int, out_dim: int, *, bias: bool = True,
    dtype=jnp.float32,
) -> LinearParams:
    """torch nn.Linear default init: U(-k, k) with k = 1/sqrt(in_dim)."""
    k = 1.0 / jnp.sqrt(in_dim)
    wk, bk = jax.random.split(rng)
    weight = jax.random.uniform(wk, (out_dim, in_dim), dtype, -k, k)
    b = jax.random.uniform(bk, (out_dim,), dtype, -k, k) if bias else None
    return LinearParams(weight, b)


@struct.dataclass
class LSTMCellParams:
    w_ih: jax.Array  # (4H, in)
    w_hh: jax.Array  # (4H, H)
    b_ih: jax.Array  # (4H,)
    b_hh: jax.Array  # (4H,)


class LSTMStash(NamedTuple):
    """Per-step intermediates stashed for the LRP relevance walk
    (the quantities the reference saves at gridTDmodel.py:994-1012)."""

    g_pre: jax.Array  # pre-activation cell candidate z2 (B, H)
    i_act: jax.Array  # input gate after sigmoid (B, H)
    f_act: jax.Array  # forget gate after sigmoid (B, H)


def lstm_step(
    p: LSTMCellParams, x: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, LSTMStash]:
    """One LSTM cell step, returning (h', c', stash)."""
    z = x @ p.w_ih.T + h @ p.w_hh.T + p.b_ih + p.b_hh
    zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    o = jax.nn.sigmoid(zo)
    c_new = f * c + i * jnp.tanh(zg)
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, LSTMStash(zg, i, f)


def init_lstm_cell(
    rng: jax.Array, in_dim: int, hidden_dim: int, dtype=jnp.float32
) -> LSTMCellParams:
    """torch nn.LSTMCell default init: all params U(-k, k), k = 1/sqrt(H)."""
    k = 1.0 / jnp.sqrt(hidden_dim)
    r = jax.random.split(rng, 4)
    return LSTMCellParams(
        w_ih=jax.random.uniform(r[0], (4 * hidden_dim, in_dim), dtype, -k, k),
        w_hh=jax.random.uniform(r[1], (4 * hidden_dim, hidden_dim), dtype, -k, k),
        b_ih=jax.random.uniform(r[2], (4 * hidden_dim,), dtype, -k, k),
        b_hh=jax.random.uniform(r[3], (4 * hidden_dim,), dtype, -k, k),
    )


@struct.dataclass
class AdaptiveLSTMCellParams:
    """LSTM cell + sentinel gate (reference AdaptiveLSTMCell,
    gridTDmodel.py:46-58): ``s_t = sigmoid(Wx x + Wh h_old) * tanh(c_t)``."""

    lstm: LSTMCellParams
    x_gate: LinearParams  # (H, in)
    h_gate: LinearParams  # (H, H)


def adaptive_lstm_step(
    p: AdaptiveLSTMCellParams, x: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, LSTMStash]:
    """Returns (h', c', sentinel s_t, stash).  Note the sentinel gate uses the
    *old* hidden state (gridTDmodel.py:56)."""
    h_new, c_new, stash = lstm_step(p.lstm, x, h, c)
    sen_gate = jax.nn.sigmoid(linear(p.x_gate, x) + linear(p.h_gate, h))
    s = sen_gate * jnp.tanh(c_new)
    return h_new, c_new, s, stash


def init_adaptive_lstm_cell(
    rng: jax.Array, in_dim: int, hidden_dim: int, dtype=jnp.float32
) -> AdaptiveLSTMCellParams:
    r = jax.random.split(rng, 3)
    return AdaptiveLSTMCellParams(
        lstm=init_lstm_cell(r[0], in_dim, hidden_dim, dtype),
        x_gate=init_linear(r[1], in_dim, hidden_dim, dtype=dtype),
        h_gate=init_linear(r[2], hidden_dim, hidden_dim, dtype=dtype),
    )


@struct.dataclass
class AdaptiveAttentionParams:
    """Lu et al. adaptive attention with visual sentinel
    (reference AdaptiveAttention, gridTDmodel.py:61-103)."""

    w_v_proj: LinearParams  # (P, H)
    w_s_proj: LinearParams  # (P, H)
    w_g_proj: LinearParams  # (P, H), no bias
    w_h: LinearParams  # (1, P), no bias


class AttentionOut(NamedTuple):
    c_hat: jax.Array  # (B, H) sentinel-mixed context
    context: jax.Array  # (B, H) pure visual context
    alpha: jax.Array  # (B, P) attention over pixels
    beta: jax.Array  # (B, 1) sentinel gate


def adaptive_attention(
    p: AdaptiveAttentionParams, V: jax.Array, ht: jax.Array, st: jax.Array
) -> AttentionOut:
    """V: (B, P, H) spatial features (pixel-major — the reference carries
    (B, H, P) and transposes, gridTDmodel.py:77; we keep pixels on the
    sublane-friendly axis)."""
    img_proj = linear(p.w_v_proj, V)  # (B, P, P)
    ht_proj = linear(p.w_g_proj, ht)  # (B, P)
    # z[b, i] = w_h . tanh(img_proj[b, i, :] + ht_proj[b, i])
    z = linear(p.w_h, jnp.tanh(img_proj + ht_proj[:, :, None]))[..., 0]  # (B, P)
    alpha = jax.nn.softmax(z, axis=-1)  # (B, P)
    context = jnp.einsum("bp,bph->bh", alpha, V)
    # sentinel logit (B, 1)
    z_s = linear(p.w_h, jnp.tanh(linear(p.w_s_proj, st) + ht_proj))
    # joint softmax over (P pixels + sentinel); beta is the sentinel mass
    alpha_hat = jax.nn.softmax(jnp.concatenate([z, z_s], axis=-1), axis=-1)
    beta = alpha_hat[:, -1:]  # (B, 1)
    c_hat = beta * st + (1.0 - beta) * context
    return AttentionOut(c_hat, context, alpha, beta)


def init_adaptive_attention(
    rng: jax.Array, hidden_dim: int, num_pixels: int, dtype=jnp.float32
) -> AdaptiveAttentionParams:
    r = jax.random.split(rng, 4)
    return AdaptiveAttentionParams(
        w_v_proj=init_linear(r[0], hidden_dim, num_pixels, dtype=dtype),
        w_s_proj=init_linear(r[1], hidden_dim, num_pixels, dtype=dtype),
        w_g_proj=init_linear(r[2], hidden_dim, num_pixels, bias=False, dtype=dtype),
        w_h=init_linear(r[3], num_pixels, 1, bias=False, dtype=dtype),
    )


def init_embedding(
    rng: jax.Array, num_embeddings: int, embed_dim: int, dtype=jnp.float32
) -> jax.Array:
    """torch nn.Embedding default init: N(0, 1)."""
    return jax.random.normal(rng, (num_embeddings, embed_dim), dtype)


def dropout(rng: jax.Array | None, x: jax.Array, rate: float, train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
