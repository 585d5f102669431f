"""LRP-inference weighting for training (the heart of the ``lrp_tune`` and
``lrp_cider_tune`` modes).

Re-implements GridTDModel.get_lrp_weight_step / forwardlrp_context /
sample_lrp (gridTDmodel.py:549-702) vectorized over the batch:

- per step, the predicted word's relevance is split between ``h2_t`` and
  ``c_hat_t`` with the epsilon rule through fc + the identity-sum split,
- rows whose predicted word is a stop word (or special) keep zero relevance —
  ``normalize_relevance`` then maps them to all-ones weights
  (LRPtools/utils.py:58-64 zero -> 1 behavior, noted in SURVEY.md §2),
- weights are [0, 2]-normalized and **detached** (the reference computes them
  under ``torch.no_grad()``, gridTDmodel.py:551) — ``stop_gradient`` here,
- the re-prediction is ``fc(c_hat * w_ctx + w_h2 * h2)``
  (gridTDmodel.py:631,686),
- ``forwardlrp_context`` teacher-forces with the *correct* LSTM biases and no
  dropout (gridTDmodel.py:580-633 — unlike the explainer path there is no
  double-bias quirk here).

The stop-word list is the standard NLTK English list + specials
(gridTDmodel.py:19-20); embedded because this image has no nltk corpus data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import WordMap
from ..ops.relevance import (
    lrp_elem_eps,
    lrp_linear_eps,
    lrp_linear_eps_onehot,
    normalize_relevance,
)
from .core import linear, lstm_step, adaptive_lstm_step, adaptive_attention
from .gridtd import Features, GridTDParams, GridTDState, init_state

# Standard NLTK English stop words (public-domain list; nltk.corpus.stopwords
# 'english'), as used at gridTDmodel.py:19.
NLTK_STOPWORDS = """a about above after again against ain all am an and any are aren
aren't as at be because been before being below between both but by can couldn
couldn't d did didn didn't do does doesn doesn't doing don don't down during
each few for from further had hadn hadn't has hasn hasn't have haven haven't
having he her here hers herself him himself his how i if in into is isn isn't
it it's its itself just ll m ma me mightn mightn't more most mustn mustn't my
myself needn needn't no nor not now o of off on once only or other our ours
ourselves out over own re s same shan shan't she she's should should've
shouldn shouldn't so some such t than that that'll the their theirs them
themselves then there these they this those through to too under until up ve
very was wasn wasn't we were weren weren't what when where which while who
whom why will with won won't wouldn wouldn't y you you'd you'll you're you've
your yours yourself yourselves""".split()

STOP_WORDS = NLTK_STOPWORDS + ["<start>", "<end>", "<pad>", "<unk>"]


def stop_word_mask(word_map: WordMap, padded_vocab: int) -> jnp.ndarray:
    """Boolean (padded_vocab,) — True where the id is a stop word / special /
    padding row."""
    mask = np.ones(padded_vocab, bool)  # padded rows count as stop
    stop = set(STOP_WORDS)
    for w, i in word_map.word_to_id.items():
        mask[i] = w in stop
    # NumPy on purpose: callers may first touch this inside a jit trace, and a
    # cached DeviceArray created there would leak a tracer.
    return mask


def _weight_split(
    fc_weight: jax.Array,
    logits: jax.Array,  # (B, V) raw step logits
    h_part: jax.Array,  # (B, H)
    ctx_part: jax.Array,  # (B, H)
    stop_mask: jax.Array,  # (V,) bool
) -> tuple[jax.Array, jax.Array]:
    """Generic weight split shared by GridTD (h2, c_hat) and AoA
    (h, context_aoa).  Returns (weight_ctx, weight_h), each (B, H) in [0, 2]."""
    logits = logits.astype(jnp.float32)
    labels = jnp.argmax(logits, axis=-1)  # (B,)
    is_stop = jnp.asarray(stop_mask)[labels]  # (B,)
    peak = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]  # (B,)
    mix = (h_part + ctx_part).astype(jnp.float32)
    fc_w = fc_weight.astype(jnp.float32)
    # one-hot fc seed (R[predicted] = logit, gridTDmodel.py:563-566) in
    # closed form — one weight-row gather instead of the (B, V) @ (V, H)
    # matmul, exactly
    r_mix = lrp_linear_eps_onehot(peak, mix, peak, fc_w[labels])  # (B, H)
    r_h = lrp_elem_eps(r_mix, h_part.astype(jnp.float32), mix)
    r_ctx = lrp_elem_eps(r_mix, ctx_part.astype(jnp.float32), mix)
    zero = jnp.zeros_like(r_h)
    r_h = jnp.where(is_stop[:, None], zero, r_h)
    r_ctx = jnp.where(is_stop[:, None], zero, r_ctx)
    w_ctx = normalize_relevance(r_ctx, axis=-1)
    w_h = normalize_relevance(r_h, axis=-1)
    return jax.lax.stop_gradient(w_ctx), jax.lax.stop_gradient(w_h)


def lrp_weight_step(
    params: GridTDParams,
    logits: jax.Array,
    h2: jax.Array,
    ctx_hat: jax.Array,
    stop_mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Batched get_lrp_weight_step (gridTDmodel.py:549-578)."""
    return _weight_split(params.fc.weight, logits, h2, ctx_hat, stop_mask)


class LrpStepOut(NamedTuple):
    logits: jax.Array  # (B, V) standard prediction
    weighted_logits: jax.Array  # (B, V) LRP-weighted re-prediction
    state: GridTDState


def lrp_step(
    params: GridTDParams,
    feats: Features,
    state: GridTDState,
    token: jax.Array,
    stop_mask: jax.Array,
) -> LrpStepOut:
    """One decoder step producing both standard and LRP-weighted logits
    (the loop body of forwardlrp_context / sample_lrp,
    gridTDmodel.py:609-632,666-687).  No dropout."""
    emb = params.embedding[token]
    x1 = jnp.concatenate([state.h2, feats.global_feat, emb], axis=-1)
    h1, c1, s, _ = adaptive_lstm_step(params.ada_lstm, x1, state.h1, state.c1)
    att = adaptive_attention(params.ada_attention, feats.v_proj, h1, s)
    x2 = jnp.concatenate([att.c_hat, h1], axis=-1)
    h2, c2, _ = lstm_step(params.language_lstm, x2, state.h2, state.c2)
    logits = linear(params.fc, att.c_hat + h2)
    w_ctx, w_h2 = lrp_weight_step(params, logits, h2, att.c_hat, stop_mask)
    weighted = linear(params.fc, att.c_hat * w_ctx + w_h2 * h2)
    return LrpStepOut(logits, weighted, GridTDState(h1, c1, h2, c2))


def forward_lrp_context(
    params: GridTDParams,
    feats: Features,
    captions: jax.Array,  # (B, L)
    stop_mask: jax.Array,
    *,
    num_steps: int,
) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced (predictions, weighted_predictions), each (B, T, V)
    (forwardlrp_context, gridTDmodel.py:580-633)."""
    b = captions.shape[0]
    hidden = params.language_lstm.w_hh.shape[1]

    def body(state, tok):
        out = lrp_step(params, feats, state, tok, stop_mask)
        return out.state, (out.logits, out.weighted_logits)

    tokens = captions[:, :num_steps].T
    _, (logits, weighted) = jax.lax.scan(
        body, init_state(b, hidden, feats.v_proj.dtype), tokens
    )
    return jnp.moveaxis(logits, 0, 1), jnp.moveaxis(weighted, 0, 1)


def sample_lrp(
    params: GridTDParams,
    feats: Features,
    stop_mask: jax.Array,
    rng: jax.Array,
    *,
    start_token: int,
    end_token: int,
    num_steps: int,
    sample_method: str = "sample",
    temperature: float = 1.0,
    vocab_size: int | None = None,
):
    """Free-running rollout sampling from the *weighted* distribution
    (sample_lrp, gridTDmodel.py:635-702).  Returns (tokens, logprobs)."""
    from ..decoding.greedy import _sample_next

    b = feats.v_proj.shape[0]
    hidden = params.language_lstm.w_hh.shape[1]

    def body(carry, srng):
        state, token, unfinished = carry
        out = lrp_step(params, feats, state, token, stop_mask)
        wl = out.weighted_logits.astype(jnp.float32)
        if vocab_size is not None and wl.shape[-1] != vocab_size:
            wl = jnp.where(jnp.arange(wl.shape[-1]) < vocab_size, wl, -1e9)
        logprobs = jax.nn.log_softmax(wl, -1)
        it, lp = _sample_next(srng, logprobs, sample_method, temperature)
        unfinished = unfinished & (it != end_token)
        it = it * unfinished
        return (out.state, it, unfinished), (it, lp)

    start = jnp.full((b,), start_token, jnp.int32)
    unfin = jnp.ones((b,), bool)
    _, (tokens, lps) = jax.lax.scan(
        body,
        (init_state(b, hidden, feats.v_proj.dtype), start, unfin),
        jax.random.split(rng, num_steps),
    )
    return tokens.T, lps.T


# ---------------------------------------------------------------------------
# AoA variants (AOAModel.get_lrp_weight_step / forwardlrp_context / sample_lrp,
# aoamodel.py:597-745): identical weight-split math with (h_t, context_aoa).
# ---------------------------------------------------------------------------

def aoa_lrp_step(params, feats, state, token, stop_mask, *, num_head: int):
    from .aoa import AOAState, multi_head_attention

    emb = params.embedding[token]
    x = jnp.concatenate([emb, feats.global_feat], axis=-1)
    h, c, _ = lstm_step(params.language_lstm, x, state.h, state.c)
    q = linear(params.q_proj, h)
    ctx, _ = multi_head_attention(q, feats.key, feats.value, num_head)
    ctx_aoa = jax.nn.sigmoid(linear(params.aoa_linear_gate, h)) * linear(
        params.aoa_linear, ctx
    )
    logits = linear(params.fc, ctx_aoa + h)
    w_ctx, w_h = _weight_split(params.fc.weight, logits, h, ctx_aoa, stop_mask)
    weighted = linear(params.fc, ctx_aoa * w_ctx + w_h * h)
    return logits, weighted, AOAState(h, c)


def aoa_forward_lrp_context(params, feats, captions, stop_mask, *,
                            num_steps: int, num_head: int):
    from .aoa import init_state as aoa_init_state

    b = captions.shape[0]
    hidden = params.language_lstm.w_hh.shape[1]

    def body(state, tok):
        logits, weighted, state = aoa_lrp_step(
            params, feats, state, tok, stop_mask, num_head=num_head
        )
        return state, (logits, weighted)

    _, (logits, weighted) = jax.lax.scan(
        body, aoa_init_state(b, hidden, feats.v_proj.dtype),
        captions[:, :num_steps].T,
    )
    return jnp.moveaxis(logits, 0, 1), jnp.moveaxis(weighted, 0, 1)


def aoa_sample_lrp(params, feats, stop_mask, rng, *, start_token, end_token,
                   num_steps, num_head, sample_method="sample",
                   temperature=1.0, vocab_size=None):
    from ..decoding.greedy import _sample_next
    from .aoa import init_state as aoa_init_state

    b = feats.v_proj.shape[0]
    hidden = params.language_lstm.w_hh.shape[1]

    def body(carry, srng):
        state, token, unfinished = carry
        _, weighted, state = aoa_lrp_step(
            params, feats, state, token, stop_mask, num_head=num_head
        )
        wl = weighted.astype(jnp.float32)
        if vocab_size is not None and wl.shape[-1] != vocab_size:
            wl = jnp.where(jnp.arange(wl.shape[-1]) < vocab_size, wl, -1e9)
        logprobs = jax.nn.log_softmax(wl, -1)
        it, lp = _sample_next(srng, logprobs, sample_method, temperature)
        unfinished = unfinished & (it != end_token)
        it = it * unfinished
        return (state, it, unfinished), (it, lp)

    start = jnp.full((b,), start_token, jnp.int32)
    unfin = jnp.ones((b,), bool)
    _, (tokens, lps) = jax.lax.scan(
        body,
        (aoa_init_state(b, hidden, feats.v_proj.dtype), start, unfin),
        jax.random.split(rng, num_steps),
    )
    return tokens.T, lps.T
