"""Corpus BLEU with the pycocoevalcap smoothing/brevity-penalty semantics.

Behavior-compatible re-implementation of the vendored scorer
(``pycocoevalcap/bleu/bleu_scorer.py``): clipped n-gram precision against the
per-ngram max reference count, 'closest' effective reference length
(ties broken toward the shorter length), ``tiny=1e-15`` numerator /
``small=1e-9`` denominator smoothing, per-sentence scores use the *running
corpus product* quirk of the original (each sentence's modified precision, not
cumulative), and brevity penalty ``exp(1 - 1/ratio)`` applied when ratio < 1.
"""

from __future__ import annotations

import math
from collections import Counter

SMALL = 1e-9
TINY = 1e-15


def _ngrams(words: list[str], n: int) -> Counter:
    c: Counter = Counter()
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            c[tuple(words[i : i + k])] += 1
    return c


def _closest_reflen(reflens: list[int], testlen: int) -> int:
    return min((abs(l - testlen), l) for l in reflens)[1]


def corpus_bleu(
    hypotheses: list[str],
    references: list[list[str]],
    n: int = 4,
    option: str | None = None,
) -> tuple[list[float], list[list[float]]]:
    """Returns (corpus bleu_1..n, per-sentence bleu lists per order)."""
    assert len(hypotheses) == len(references)
    if option is None:
        option = "average" if len(references) == 1 else "closest"

    total_guess = [0] * n
    total_correct = [0] * n
    total_testlen = 0
    total_reflen = 0.0
    bleu_list: list[list[float]] = [[] for _ in range(n)]

    for hyp, refs in zip(hypotheses, references):
        hyp_words = hyp.split()
        testlen = len(hyp_words)
        reflens = [len(r.split()) for r in refs]
        if option == "closest":
            reflen: float = _closest_reflen(reflens, testlen)
        elif option == "shortest":
            reflen = min(reflens)
        else:  # average
            reflen = sum(reflens) / len(reflens)

        maxcounts: Counter = Counter()
        for r in refs:
            for ng, cnt in _ngrams(r.split(), n).items():
                maxcounts[ng] = max(maxcounts[ng], cnt)
        counts = _ngrams(hyp_words, n)
        guess = [max(0, testlen - k) for k in range(n)]
        correct = [0] * n
        for ng, cnt in counts.items():
            correct[len(ng) - 1] += min(maxcounts.get(ng, 0), cnt)

        total_testlen += testlen
        total_reflen += reflen
        for k in range(n):
            total_guess[k] += guess[k]
            total_correct[k] += correct[k]

        # per-sentence score with the same smoothing
        b = 1.0
        ratio = (testlen + TINY) / (reflen + SMALL)
        for k in range(n):
            b *= (correct[k] + TINY) / (guess[k] + SMALL)
            s = b ** (1.0 / (k + 1))
            if ratio < 1:
                s *= math.exp(1 - 1 / ratio)
            bleu_list[k].append(s)

    bleus = []
    b = 1.0
    ratio = (total_testlen + TINY) / (total_reflen + SMALL)
    for k in range(n):
        b *= (total_correct[k] + TINY) / (total_guess[k] + SMALL)
        s = b ** (1.0 / (k + 1))
        if ratio < 1:
            s *= math.exp(1 - 1 / ratio)
        bleus.append(s)
    return bleus, bleu_list
