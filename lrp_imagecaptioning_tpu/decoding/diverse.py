"""Fixed-shape diverse beam search (Vijayakumar et al.).

Replicates the reference's group-penalty semantics exactly
(``diverse_beam_search``, gridTDmodel.py:304-398), including its quirks:

- ``num_group == beam_size`` groups, each running its own width-``beam_size``
  beam search,
- only groups 0 and 1 contribute their *input* words of the current step to the
  penalty set (``if g < 2``, gridTDmodel.py:377-380); every later group
  subtracts ``diversity_prob`` once per penalized token,
- a group that hits 0 unfinished beams mid-step *breaks the group loop* for
  that step (gridTDmodel.py:365-366), freezing later groups for one step; on
  subsequent steps it is skipped via ``continue`` (gridTDmodel.py:340-341),
- a finished (or frozen) group contributes no penalties that step.

The dynamic control flow becomes masked updates: each group's carry is
overwritten only when ``do_update`` holds, and the ``halted`` flag reproduces
the mid-step break.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .beam import BeamResult, beam_step_core, finalize_beam, init_beam_carry


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(jnp.reshape(pred, (1,) * x.ndim), x, y), a, b
    )


def diverse_beam_search(
    step_fn: Callable,
    make_state0: Callable[[], object],
    *,
    start_token: int,
    end_token: int,
    beam_size: int,
    vocab_size: int,
    max_steps: int = 50,
    diversity_prob: float = 0.5,
    fallback_len: int = 20,
) -> list[BeamResult]:
    """Returns one BeamResult per group (reference returns one sentence per
    group, gridTDmodel.py:383-398)."""
    num_group = beam_size
    k = beam_size
    seq_len = max_steps + 1

    carries = [
        init_beam_carry(
            make_state0(), beam_size=k, start_token=start_token, seq_len=seq_len
        )
        for _ in range(num_group)
    ]
    lane_ids = jnp.arange(k)

    def body(carries, _):
        new_carries = []
        # penalty membership over the vocab; scratch slot V for masked writes
        penal = jnp.zeros((vocab_size + 1,), jnp.float32)
        halted = jnp.zeros((), bool)
        for g in range(num_group):
            c = carries[g]
            do_update = (c["u"] > 0) & ~halted
            logits, state = step_fn(c["state"], c["prev_words"])
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logprobs = logprobs - penal[None, :vocab_size]
            nc = beam_step_core(
                c, logprobs, state,
                beam_size=k, vocab_size=vocab_size, end_token=end_token,
            )
            nc = _tree_where(do_update, nc, c)
            new_carries.append(nc)
            # a group finishing mid-step freezes all later groups this step
            halted = halted | (do_update & (nc["u"] == 0))
            if g < 2:
                # contribute this group's *input* words (alive lanes only,
                # and only if the group ran and did not finish this step)
                contribute = do_update & (nc["u"] > 0)
                words = jnp.where(
                    contribute & (lane_ids < c["u"]), c["prev_words"], vocab_size
                )
                penal = penal.at[words].set(diversity_prob)
        return new_carries, None

    finals, _ = jax.lax.scan(body, carries, length=max_steps)
    # Quirk parity: a group with no completed sequence falls back to *group
    # 0's* first alive beam (`seqs[0][0][:20]`, gridTDmodel.py:389), not its
    # own.  finalize_beam only reads seqs/scores/seq_pos on the fallback path,
    # so substituting group 0's values reproduces this exactly.
    results = []
    for f in finals:
        f_fb = {**f, "seqs": finals[0]["seqs"], "scores": finals[0]["scores"],
                "seq_pos": finals[0]["seq_pos"]}
        results.append(finalize_beam(f_fb, fallback_len=fallback_len))
    return results
