"""SCST (self-critical sequence training) reward — host side.

Re-implements ``get_self_critical_reward`` (modelutils.py:200-238) on top of
our pure-Python CIDEr/BLEU.  Exact-parity notes:

- ``array_to_str`` keeps every token except <start>/<pad> — including <end>
  and <unk>; its ``if end_encode in out`` break is dead code (it compares an
  int id against word strings, modelutils.py:193) so nothing truncates, and
  rollouts are already zeroed after <end>,
- the CIDEr document frequencies are computed over the *2B-entry* corpus
  (sampled + greedy, references duplicated), matching the reference building
  one scorer over ``2 * batch_size`` items (modelutils.py:216-223),
- reward = score(sample) - score(greedy), broadcast over timesteps.

The reward runs on host between two jitted device programs; token ids go
straight into the native C++ scorers (``native/cider_scorer.cpp``,
``native/bleu_scorer.cpp``) — no string round trip — with pure-Python
fallbacks when no toolchain exists.
"""

from __future__ import annotations

import numpy as np

from ..data.vocab import WordMap


def array_to_str(arr, word_map: WordMap) -> str:
    rev = word_map.id_to_word
    skip = {word_map.start, word_map.pad}
    return " ".join(rev[int(t)] for t in arr if int(t) not in skip)


def get_self_critical_reward(
    greedy_res: np.ndarray,  # (B, Tg)
    all_caps: np.ndarray,  # (B, C, L) reference captions (encoded)
    gen_result: np.ndarray,  # (B, Ts) sampled rollout
    word_map: WordMap,
    cider_reward_weight: float = 1.0,
    bleu_reward_weight: float = 0.0,
) -> np.ndarray:
    """Returns (B, Ts) per-timestep advantage."""
    b = gen_result.shape[0]

    scores = np.zeros(2 * b)
    # hot path: token ids straight into the native scorers (no strings);
    # array_to_str semantics in id space = drop <start>/<pad>, keep the rest
    skip = {word_map.start, word_map.pad}

    def ids(row):
        return np.asarray([int(t) for t in row if int(t) not in skip],
                          np.int32)

    hyp_ids = ref_ids = None
    if cider_reward_weight > 0 or bleu_reward_weight > 0:
        hyp_ids = [ids(gen_result[i]) for i in range(b)]
        hyp_ids += [ids(greedy_res[i]) for i in range(b)]
        ref_ids = [[ids(c) for c in all_caps[i]] for i in range(b)]
    if cider_reward_weight > 0:
        from ..metrics.native import cider_score_ids

        cider = cider_score_ids(hyp_ids, ref_ids + ref_ids)
        scores = scores + cider_reward_weight * cider
    if bleu_reward_weight > 0:
        # BLEU-4 per item, matching Bleu_scorer().compute_score(...)[1][3]
        # (modelutils.py:227-229); native ids scorer w/ pure-Python fallback
        from ..metrics.native import bleu_score_ids

        _, per = bleu_score_ids(hyp_ids, ref_ids + ref_ids, n=4)
        scores = scores + bleu_reward_weight * per[:, 3]
    adv = scores[:b] - scores[b:]
    return np.repeat(adv[:, None], gen_result.shape[1], axis=1).astype(np.float32)
