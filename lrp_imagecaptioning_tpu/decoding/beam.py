"""Fixed-shape, jittable beam search.

The reference beam search (gridTDmodel.py:400-478) shrinks its tensors as beams
complete — dynamic shapes that cannot compile on TPU.  This re-formulation keeps
``beam_size`` lanes alive with masks and provably selects the same sequences:

- lane order mirrors the reference's compacted tensors (stable pack of the
  incomplete selections, ``incomplete_inds`` is increasing),
- each step selects the top ``u`` (current unfinished count) flat expansions;
  with dead lanes pinned to -inf the top-``u`` of our fixed top-``k`` equal the
  reference's ``scores.view(-1).topk(unfinished_num)``,
- completed selections are archived into a ``k``-slot buffer (``u`` only ever
  decreases, so total completions <= k),
- the reference's ``top_words / vocab_size`` float division (gridTDmodel.py:444)
  was integer division under torch 1.4 (`LongTensor / int` floor-divides), so
  ``//`` is the faithful semantics (SURVEY.md §7 quirk resolved, no divergence).

Works for any model via ``step_fn(state, tokens(k,)) -> (logits (k, V), state)``
with a state pytree whose leaves have leading dim ``k``.  Batch=1 per call like
the reference; vmap over images for batched eval.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e18


class BeamResult(NamedTuple):
    tokens: jax.Array  # (L,) best sequence including <start>, <pad>-filled
    length: jax.Array  # () int32 — number of valid tokens in `tokens`
    score: jax.Array  # () float32 — accumulated logprob (not length-normalized)


def init_beam_carry(state0, *, beam_size: int, start_token: int, seq_len: int):
    k = beam_size
    seqs0 = jnp.full((k, seq_len), 0, jnp.int32).at[:, 0].set(start_token)
    return dict(
        state=state0,
        seqs=seqs0,
        seq_pos=jnp.ones((), jnp.int32),  # next write position
        prev_words=jnp.full((k,), start_token, jnp.int32),
        scores=jnp.zeros((k,), jnp.float32),
        u=jnp.asarray(k, jnp.int32),  # unfinished lane count
        comp_seqs=jnp.zeros((k, seq_len), jnp.int32),
        comp_lens=jnp.zeros((k,), jnp.int32),
        comp_scores=jnp.full((k,), NEG_INF, jnp.float32),
        n_comp=jnp.zeros((), jnp.int32),
        is_first=jnp.ones((), bool),
    )


def beam_step_core(c, logprobs, state, *, beam_size: int, vocab_size: int,
                   end_token: int):
    """One beam-search expansion given this step's logprobs (k, V) and the
    post-step model state (lanes still in pre-pack order)."""
    k = beam_size
    seq_len = c["seqs"].shape[1]
    lane_ids = jnp.arange(k)

    alive = lane_ids < c["u"]  # lanes are always packed to the front
    scores = jnp.where(alive[:, None], c["scores"][:, None] + logprobs, NEG_INF)
    # step 0: only lane 0 participates (reference uses scores[0],
    # gridTDmodel.py:440-441)
    scores = jnp.where(c["is_first"] & (lane_ids[:, None] > 0), NEG_INF, scores)
    top_scores, top_flat = jax.lax.top_k(scores.reshape(-1), k)
    beam_idx = top_flat // vocab_size
    word_idx = (top_flat % vocab_size).astype(jnp.int32)

    valid = lane_ids < c["u"]  # selection ranks beyond u are garbage
    is_end = valid & (word_idx == end_token)
    is_cont = valid & (word_idx != end_token)

    # candidate sequences for each selection
    cand_seqs = c["seqs"][beam_idx].at[:, c["seq_pos"]].set(word_idx)

    # --- archive completed selections --------------------------------
    comp_rank = jnp.cumsum(is_end.astype(jnp.int32)) - 1
    slot = jnp.where(is_end, c["n_comp"] + comp_rank, k)  # k = scratch row
    comp_seqs = jnp.concatenate([c["comp_seqs"], jnp.zeros((1, seq_len), jnp.int32)])
    comp_seqs = comp_seqs.at[slot].set(cand_seqs)[:k]
    comp_scores = jnp.concatenate([c["comp_scores"], jnp.zeros((1,))])
    comp_scores = comp_scores.at[slot].set(top_scores)[:k]
    comp_lens = jnp.concatenate([c["comp_lens"], jnp.zeros((1,), jnp.int32)])
    comp_lens = comp_lens.at[slot].set(c["seq_pos"] + 1)[:k]
    n_comp = c["n_comp"] + jnp.sum(is_end.astype(jnp.int32))

    # --- pack continuing selections to the front ---------------------
    order = jnp.argsort(~is_cont, stable=True)  # continuing first, stable
    new_u = jnp.sum(is_cont.astype(jnp.int32))
    sel_beam = beam_idx[order]
    new_state = jax.tree_util.tree_map(lambda x: x[sel_beam], state)
    new_seqs = cand_seqs[order]
    new_scores = jnp.where(lane_ids < new_u, top_scores[order], NEG_INF)
    new_prev = word_idx[order]

    return dict(
        state=new_state,
        seqs=new_seqs,
        seq_pos=c["seq_pos"] + 1,
        prev_words=new_prev,
        scores=new_scores,
        u=new_u,
        comp_seqs=comp_seqs,
        comp_lens=comp_lens,
        comp_scores=comp_scores,
        n_comp=n_comp,
        is_first=jnp.zeros((), bool),
    )


def finalize_beam(final, *, fallback_len: int) -> BeamResult:
    """Best completed sequence, else alive lane 0 truncated to fallback_len
    (gridTDmodel.py:469-474)."""
    seq_len = final["seqs"].shape[1]
    has_comp = final["n_comp"] > 0
    best = jnp.argmax(final["comp_scores"])
    fb_len = jnp.minimum(jnp.asarray(fallback_len, jnp.int32), final["seq_pos"])
    tokens = jnp.where(has_comp, final["comp_seqs"][best], final["seqs"][0])
    length = jnp.where(has_comp, final["comp_lens"][best], fb_len)
    pos = jnp.arange(seq_len)
    tokens = jnp.where(pos < length, tokens, 0)
    score = jnp.where(has_comp, final["comp_scores"][best], final["scores"][0])
    return BeamResult(tokens, length, score)


def beam_search(
    step_fn: Callable,
    state0,
    *,
    start_token: int,
    end_token: int,
    beam_size: int,
    vocab_size: int,
    max_steps: int,
    fallback_len: int = 20,
) -> BeamResult:
    """Single-image beam search. ``state0`` leaves must have leading dim
    ``beam_size`` (features pre-expanded by the caller)."""
    init = init_beam_carry(
        state0, beam_size=beam_size, start_token=start_token,
        seq_len=max_steps + 1,
    )

    def body(c, _):
        logits, state = step_fn(c["state"], c["prev_words"])
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return beam_step_core(
            c, logprobs, state,
            beam_size=beam_size, vocab_size=vocab_size, end_token=end_token,
        ), None

    final, _ = jax.lax.scan(body, init, length=max_steps)
    return finalize_beam(final, fallback_len=fallback_len)


def expand_to_beam(tree, beam_size: int):
    """Broadcast batch-1 features/state to ``beam_size`` lanes
    (gridTDmodel.py:429-430)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (beam_size,) + x.shape[1:]), tree
    )
