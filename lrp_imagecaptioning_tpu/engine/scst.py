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

The reward runs on host between two jitted device programs; pre-tokenized
strings keep it O(batch * len).  A C++ scorer drop-in lives in ``native/``.
"""

from __future__ import annotations

import numpy as np

from ..data.vocab import WordMap
from ..metrics.bleu import corpus_bleu


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
    if cider_reward_weight > 0:
        # hot path: token ids straight into the native scorer (no strings);
        # array_to_str semantics in id space = drop <start>/<pad>, keep the rest
        skip = {word_map.start, word_map.pad}

        def ids(row):
            return np.asarray([int(t) for t in row if int(t) not in skip],
                              np.int32)

        hyp_ids = [ids(gen_result[i]) for i in range(b)]
        hyp_ids += [ids(greedy_res[i]) for i in range(b)]
        ref_ids = [[ids(c) for c in all_caps[i]] for i in range(b)]
        from ..metrics.native import cider_score_ids

        cider = cider_score_ids(hyp_ids, ref_ids + ref_ids)
        scores = scores + cider_reward_weight * cider
    if bleu_reward_weight > 0:
        hyps = [array_to_str(gen_result[i], word_map) for i in range(b)]
        hyps += [array_to_str(greedy_res[i], word_map) for i in range(b)]
        refs = [
            [array_to_str(all_caps[i][j], word_map)
             for j in range(len(all_caps[i]))]
            for i in range(b)
        ]
        _, per = corpus_bleu(hyps, refs + refs)
        scores = scores + bleu_reward_weight * np.asarray(per[3])
    adv = scores[:b] - scores[b:]
    return np.repeat(adv[:, None], gen_result.shape[1], axis=1).astype(np.float32)
